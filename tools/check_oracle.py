#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
For each query dir under verifyOutDir: load the Spark parquet result,
run the oracle SQL in DuckDB over the sf parquet tables, sort columns by
name, sort rows, compare values cell-by-cell (round doubles to 6dp).
"""
import sys, os, json, math
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]
for t in TABLES:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    spark_rel = con.execute(
        f"SELECT * FROM read_parquet('{d}/*.parquet')").fetch_arrow_table()
    if name not in oracle:
        skips.append(f"{name} (no oracle, rows={spark_rel.num_rows})")
        continue
    try:
        duck_rel = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        fails.append(f"{name}: ORACLE SQL ERROR: {e}")
        continue
    def norm(tbl):
        # EXACT values — the driver hash-compares bit-exact, so no
        # rounding here either (NaN normalized to None only).
        cols = sorted(tbl.column_names)
        rows = []
        for i in range(tbl.num_rows):
            row = []
            for c in cols:
                v = tbl.column(c)[i].as_py()
                if isinstance(v, float) and math.isnan(v):
                    v = None
                row.append(v)
            rows.append(tuple(row))
        return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))
    sc, sr = norm(spark_rel)
    dc, dr = norm(duck_rel)
    # Arrow dtype compare — the driver hash-compares bit-exact, so a
    # value-equal result with a different physical type (e.g. DuckDB
    # sum(BIGINT) -> decimal128(38,0) HUGEINT vs Spark int64) still
    # fails there. Catch that class here, not in the driver's scoreboard.
    stypes = {f.name: str(f.type) for f in spark_rel.schema}
    dtypes = {f.name: str(f.type) for f in duck_rel.schema}
    # Only columns present on BOTH sides — a missing/extra column is a
    # SCHEMA mismatch (reported below), not a dtype one.
    dtype_diff = {c: (stypes[c], dtypes[c])
                  for c in set(stypes) & set(dtypes)
                  if stypes[c] != dtypes[c]}
    if dtype_diff:
        fails.append(f"{name}: DTYPE {dtype_diff}")
    elif sc != dc:
        fails.append(f"{name}: SCHEMA spark={sc} duck={dc}")
    elif len(sr) != len(dr):
        fails.append(f"{name}: ROWS spark={len(sr)} duck={len(dr)}")
    elif sr != dr:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
        fails.append(f"{name}: VALUES first diff at row {diff[0]}: spark={diff[1]} duck={diff[2]}")
    else:
        passes.append(name)

print(f"PASS ({len(passes)}):", *passes, sep="\n  ")
if skips:
    print(f"SKIP no-oracle ({len(skips)}):", *skips, sep="\n  ")
if fails:
    print(f"FAIL ({len(fails)}):", *fails, sep="\n  ")
    sys.exit(1)
print("ALL GREEN")
