#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (driver-side tooling only;
not part of the shipped Scala library). Runs after `graft.Verify` has
dumped query results + oracle_sql.json: executes each oracle in DuckDB on
the same parquet tables and compares values column-sorted / row-sorted."""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    got = pd.concat([pq.read_table(f).to_pandas() for f in sorted(files)])
    gw, ww = (got.reindex(sorted(got.columns), axis=1),
              want.reindex(sorted(want.columns), axis=1))
    if list(gw.columns) != list(ww.columns):
        print(f"FAIL {name}: columns {list(gw.columns)} vs {list(ww.columns)}"); fails += 1; continue
    if len(gw) != len(ww):
        print(f"FAIL {name}: rows {len(gw)} vs {len(ww)}"); fails += 1; continue
    gw = gw.sort_values(by=list(gw.columns), kind="mergesort").reset_index(drop=True)
    ww = ww.sort_values(by=list(ww.columns), kind="mergesort").reset_index(drop=True)
    ok = True
    for c in gw.columns:
        a, b = gw[c], ww[c]
        try:
            same = (a.astype(str).values == b.astype(str).values)
        except Exception:
            same = a.values == b.values
        if not same.all():
            i = int((~same).argmax())
            print(f"FAIL {name}: col {c} row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r} "
                  f"(dtype spark={a.dtype} duck={b.dtype})")
            ok = False; fails += 1
            break
    if ok:
        # dtype drift warning (driver may compare schemas)
        drift = [f"{c}:{gw[c].dtype}/{ww[c].dtype}" for c in gw.columns if str(gw[c].dtype) != str(ww[c].dtype)]
        extra = f"  [dtype drift: {', '.join(drift)}]" if drift else ""
        print(f"OK   {name} ({len(gw)} rows){extra}")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
