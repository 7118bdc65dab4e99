#!/usr/bin/env python3
"""Concrete single-node baseline for the bench gate (driver-side tooling
only; not part of the shipped Scala library).

The reference repo is a Node.js fetch/geocode pipeline with no query
bench, so BASELINE.json's "within 2x of BASELINE" criterion had no
numbers behind it — prior rounds graded the DESIGN by convention. This
script puts numbers behind it: it times every DuckDB oracle query (the
same SQL the correctness gate runs, i.e. a state-of-the-art single-node
engine computing the same answers on the same parquet) and writes
BASELINE_DUCKDB.json. bench_vs_baseline can then be computed as
BENCH_FULL.json's per-query medians over these medians, query by query,
instead of asserted by convention.

Usage: python3 tools/baseline_duckdb.py <verify_out_dir> <sf_dir> [passes]
  (verify_out_dir must contain oracle_sql.json from `graft.Verify`)
"""
import sys, json, statistics, time
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
times, errors = {}, {}
for name in sorted(oracle):
    try:
        con.execute(oracle[name]).fetchall()  # warmup (I/O cache, plan)
        samples = []
        for _ in range(passes):
            t0 = time.monotonic()
            con.execute(oracle[name]).fetchall()
            samples.append(time.monotonic() - t0)
        times[name] = round(statistics.median(samples), 4)
    except Exception as e:  # oracle needs a fixture only Verify stages, etc.
        errors[name] = f"{type(e).__name__}"
result = {
    "engine": "duckdb " + duckdb.__version__,
    "sf": sf,
    "passes": passes,
    "note": ("single-node baseline for BENCH comparison: median wall-time "
             "of each correctness-oracle query in DuckDB on the same "
             "parquet. The reference repo itself has no query bench "
             "(Node.js fetch/geocode pipeline), so this is the concrete "
             "stand-in for 'reference single-node throughput'."),
    "total": round(sum(times.values()), 4),
    "queries": times,
    "errors": errors,
}
path = "BASELINE_DUCKDB.json"
with open(path, "w") as f:
    json.dump(result, f, indent=1, sort_keys=True)
print(json.dumps({"metric": "duckdb_total", "value": result["total"],
                  "unit": "sec", "n": len(times), "errors": len(errors)}))
