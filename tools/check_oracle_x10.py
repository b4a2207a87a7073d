#!/usr/bin/env python3
"""DuckDB oracle compare for the x10-replica correctness slice
(round 18): same compare as check_oracle.py, but emits a driver-style
per-key JSON artifact so the scale-decade correctness claim is a
committed, machine-readable record rather than a log line.

Usage: check_oracle_x10.py <x10Dir> <verifyOutDir> <artifactJson>
"""
import sys, os, json, math
import duckdb

sf, out, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        # Replica tables are Spark-written DIRECTORIES of part files.
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    row = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None}
    results[name] = row
    try:
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").fetch_arrow_table()
        row["spark_rows"] = spark_rel.num_rows
        if name not in oracle:
            row["err"] = "no_oracle"
            continue
        duck_rel = con.execute(oracle[name]).fetch_arrow_table()
        row["oracle_rows"] = duck_rel.num_rows

        def norm(tbl):
            cols = sorted(tbl.column_names)
            rows = []
            for i in range(tbl.num_rows):
                r = []
                for c in cols:
                    v = tbl.column(c)[i].as_py()
                    if isinstance(v, float) and math.isnan(v):
                        v = None
                    r.append(v)
                rows.append(tuple(r))
            return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))

        sc, sr = norm(spark_rel)
        dc, dr = norm(duck_rel)
        stypes = {f.name: str(f.type) for f in spark_rel.schema}
        dtypes = {f.name: str(f.type) for f in duck_rel.schema}
        dtype_diff = {c: (stypes[c], dtypes[c])
                      for c in set(stypes) & set(dtypes)
                      if stypes[c] != dtypes[c]}
        row["schema_match"] = sc == dc and not dtype_diff
        row["rows_match"] = len(sr) == len(dr)
        row["hash_match"] = row["schema_match"] and row["rows_match"] and sr == dr
    except Exception as e:
        row["err"] = str(e)[:300]

with open(artifact, "w") as f:
    json.dump(results, f, indent=2)
ok = [k for k, v in results.items() if v["hash_match"]]
bad = [k for k, v in results.items() if not v["hash_match"]]
print(f"x10 slice: {len(ok)} green, {len(bad)} not green: {bad}")
sys.exit(0 if not bad else 1)
