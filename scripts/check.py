#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs
DuckDB oracle on the same sf dir. Usage: check.py <outDir> <sfDir>."""
import sys, json, glob, os
import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
if os.environ.get("DUCKDB_THREADS"):
    con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    # driver testdata tables are single files; ScaleGen corpora (sf1) are
    # Spark-written directories — glob those
    path = f"{sfdir}/{t}.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# optional 3rd arg: comma-separated key filter (lets a wrapper fan the
# long-tail oracles out across processes)
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
fails = 0
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    if only is not None and name not in only:
        continue
    got = con.execute(f"SELECT * FROM '{path}/*.parquet'").fetchdf()
    if name not in oracle:
        print(f"{name}: rows-only ({len(got)} rows)")
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    # driver compare: sort columns by name, then hash values
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"{name}: SCHEMA MISMATCH {list(got.columns)} vs {list(exp.columns)}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"{name}: ROWCOUNT {len(got)} vs {len(exp)}")
        fails += 1
        continue
    import pandas as pd
    g = got.reset_index(drop=True)
    e = exp.reset_index(drop=True)
    ok = True
    for c in g.columns:
        gc, ec = g[c], e[c]
        try:
            eq = (gc.astype(str) == ec.astype(str)).all()
        except Exception:
            eq = False
        if not eq:
            diffmask = gc.astype(str) != ec.astype(str)
            idx = diffmask[diffmask].index[:3]
            print(f"{name}: COL {c} differs at rows {list(idx)}: "
                  f"got={list(gc[idx])} exp={list(ec[idx])}")
            ok = False
    if ok:
        print(f"{name}: OK ({len(got)} rows)")
    else:
        fails += 1
sys.exit(1 if fails else 0)
