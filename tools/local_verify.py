#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet under OUTDIR, run the matching oracle SQL from oracle_sql.json in
DuckDB over the same testdata parquet tables, then compare rows / schema /
value-hash (columns sorted by name, rows sorted by all values).

Usage: python3 tools/local_verify.py /tmp/verify_r2 /root/testdata/sf0.01
"""
import duckdb, json, os, sys, hashlib

outdir, sfdir = sys.argv[1], sys.argv[2]
# --skip=a,b,c : names whose DuckDB oracle is quadratic and intractable at
# large SF (they stay gated at sf0.01); reported as SKIP, not counted ok.
skip_names = set()
for arg in sys.argv[3:]:
    if arg.startswith("--skip="):
        skip_names |= {s for s in arg[len("--skip="):].split(",") if s}
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(df):
    # sort columns by name, round floats, stringify, sort rows.
    # Column-major with identical per-value semantics to the original
    # row-major loop — itertuples dominated sf1 compare time (million-row
    # frames) and successes print nothing, so the run looked hung.
    cols = sorted(df.columns)
    fmt_cols = [
        [f"{v:.6g}" if isinstance(v, float) else str(v) for v in df[c].tolist()]
        for c in cols
    ]
    rows = ["\x01".join(t) for t in zip(*fmt_cols)] if cols else []
    rows.sort()
    return cols, rows

fails, ok, skipped = [], 0, 0
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    if name in skip_names:
        skipped += 1
        print(f"  {name}: SKIP (quadratic oracle, gated at sf0.01)")
        continue
    spark_df = con.sql(f"SELECT * FROM '{path}/*.parquet'").df()
    if name not in oracle:
        skipped += 1
        print(f"  {name}: NO ORACLE ({len(spark_df)} rows)")
        continue
    try:
        oracle_df = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append(name)
        print(f"✗ {name}: oracle SQL error: {e}")
        continue
    sc, sr = canon(spark_df)
    oc, or_ = canon(oracle_df)
    if sc != oc:
        fails.append(name)
        print(f"✗ {name}: schema mismatch spark={sc} oracle={oc}")
    elif len(sr) != len(or_):
        fails.append(name)
        print(f"✗ {name}: rows spark={len(sr)} oracle={len(or_)}")
    elif sr != or_:
        fails.append(name)
        diff = [(a, b) for a, b in zip(sr, or_) if a != b][:3]
        print(f"✗ {name}: hash mismatch ({len(sr)} rows); first diffs: {diff}")
    else:
        ok += 1
print(f"\n{ok} ok, {len(fails)} failed, {skipped} rows-only")
sys.exit(1 if fails else 0)
