#!/usr/bin/env python3
"""DuckDB oracle compare for the x10-replica correctness slice
(round 18): same compare as check_oracle.py, but emits a driver-style
per-key JSON artifact so the scale-decade correctness claim is a
committed, machine-readable record rather than a log line.

Per-key watchdog: an oracle whose DuckDB replay exceeds the budget is
interrupted and recorded as err=oracle_timeout_<N>s — the slice stays
feasible (some oracles replay quadratic pair pipelines that are fine
at sf0.1 but not at x10 in a single-node SQL engine; the ENGINE side
already produced its parquet, so the timeout is purely an oracle-cost
statement, not an engine failure). The artifact is written after
EVERY key, so a killed run still leaves a usable record.

Usage: check_oracle_x10.py <x10Dir> <verifyOutDir> <artifactJson> [perKeySec]
"""
import sys, os, json, math, threading, time
import duckdb

sf, out, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
budget = int(sys.argv[4]) if len(sys.argv) > 4 else 300
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


def fresh_con():
    """One connection PER KEY: a watchdog interrupt that fires just as
    its query completes would otherwise linger on the shared connection
    and abort the NEXT key's query (a wrong row in the committed
    artifact that doesn't reproduce)."""
    c = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return c


def run_with_budget(c, sql):
    done = threading.Event()

    def watchdog():
        if not done.wait(budget):
            c.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    try:
        return c.execute(sql).fetch_arrow_table()
    finally:
        done.set()
        w.join()


for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    row = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None,
           "oracle_sec": None}
    results[name] = row
    t0 = time.time()
    kcon = None
    try:
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").fetch_arrow_table()
        row["spark_rows"] = spark_rel.num_rows
        if name not in oracle:
            row["err"] = "no_oracle"
            continue
        kcon = fresh_con()
        try:
            duck_rel = run_with_budget(kcon, oracle[name])
        except duckdb.InterruptException:
            row["err"] = f"oracle_timeout_{budget}s"
            continue
        row["oracle_sec"] = round(time.time() - t0, 1)
        row["oracle_rows"] = duck_rel.num_rows
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
    finally:
        if kcon is not None:
            kcon.close()
        print(f"[x10] {name}: {json.dumps(results[name])}", flush=True)
        with open(artifact, "w") as f:
            json.dump(results, f, indent=2)

ok = [k for k, v in results.items() if v["hash_match"]]
to = [k for k, v in results.items() if v["err"] and "timeout" in v["err"]]
# no_oracle keys SKIP, exactly like check_oracle.py — nothing to compare
# is not a failure.
sk = [k for k, v in results.items() if v["err"] == "no_oracle"]
bad = [k for k, v in results.items()
       if not v["hash_match"]
       and not (v["err"] and ("timeout" in v["err"] or v["err"] == "no_oracle"))]
print(f"x10 slice: {len(ok)} green, {len(to)} oracle-timeout {to}, "
      f"{len(sk)} no-oracle skip, {len(bad)} not green: {bad}")
sys.exit(0 if not bad else 1)
