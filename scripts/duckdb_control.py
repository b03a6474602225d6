#!/usr/bin/env python3
"""DuckDB control run (SURVEY §6 discipline): execute every oracle SQL
sequentially on the same parquet the bench reads, and report the total —
the cross-round denominator that survives box drift.

Usage: duckdb_control.py <verify_outdir_with_oracle_sql.json> <sfDir> [out.json]

The verify outdir supplies oracle_sql.json RENDERED ON THE TIMED CORPUS
(model-as-literal oracles train at render time), so run
`graft.Verify <sfDir> <outdir>` against the SAME sfDir first.
"""
import json
import os
import sys
import time

import duckdb


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    dest = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    times, failed = {}, []
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            failed.append(name)
            print(f"{name}: FAILED {str(e)[:120]}", file=sys.stderr)
    total = round(sum(times.values()), 3)
    rec = {"metric": "duckdb_control", "value": total, "unit": "sec",
           "n_queries": len(times), "failed": failed, "sf": sfdir,
           "queries": times}
    print(json.dumps({k: rec[k] for k in rec if k != "queries"}))
    if dest:
        with open(dest, "w") as f:
            json.dump(rec, f)
        print(f"record -> {dest}", file=sys.stderr)


if __name__ == "__main__":
    main()
