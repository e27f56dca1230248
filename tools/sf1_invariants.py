#!/usr/bin/env python3
"""Independent sf1 checks for the 9 quadratic-oracle queries that skip
the full DuckDB compare at scale (their oracles are all-pairs joins —
tractable at sf0.01, combinatorial at sf1). Each check below is the
invariant the round records publish:

  - q_dedup_minhash / _salted: identical pair SETS on both code paths,
    and the pair count is 10x the sf0.1 planted structure (2,560).
  - q_dedup_cluster / _distributed: identical label maps, 4,770 ids.
  - q_embed_dedup: 20,000 pairs, each exactly (v, v+100000).
  - q_spatial_join: 10,253,463 rows (deterministic data -> fixed count).
  - q_knn_spatial: 450,000 rows = 3 x |customer|; a deterministic
    customer sample (c_custkey % 997 = 0) EXACT-matches the DuckDB
    replay (customer view filtered to the sample; suppliers full — the
    neighbor set of a customer is independent of other customers).
  - q_dbscan: every cluster id == min member id among its CORE members;
    at sf1 density the space collapses to one all-core cluster.
  - q_fuzzy_join: 100x the sf0.1 pair count (88,434,000 — names repeat
    across the 10 replicas, so each base pair lifts 10x10-fold:
    quadratic in the DATA, not the plan); a deterministic left slice
    (p_partkey % 1996 = 0) EXACT-matches the DuckDB replay.

Usage: python3 tools/sf1_invariants.py /tmp/verify_sf1_r13 /tmp/graft-sf1
"""
import duckdb, json, os, sys
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["customer", "supplier", "part"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def pq(name):
    return pd.read_parquet(os.path.join(outdir, name))

ok = 0
def check(name, cond, detail):
    global ok
    assert cond, f"{name}: FAILED ({detail})"
    print(f"  ok {name}: {detail}")
    ok += 1

# --- minhash pair-set identity across code paths -----------------------
mh = pq("q_dedup_minhash"); ms = pq("q_dedup_minhash_salted")
def idcols(df):
    cs = sorted(c for c in df.columns
                if pd.api.types.is_integer_dtype(df[c]))
    assert len(cs) == 2, f"expected 2 id columns, got {cs}"
    return cs
pairs = lambda df: set(map(tuple, df[idcols(df)].to_numpy()))
check("minhash==salted pair sets", pairs(mh) == pairs(ms),
      f"{len(mh)} pairs on both paths")
check("minhash count", len(mh) == 2560, f"{len(mh)} == 2560 (10x sf0.1)")

# --- cluster label maps across code paths ------------------------------
cl = pq("q_dedup_cluster"); cd = pq("q_dedup_cluster_distributed")
lm = lambda df: dict(zip(df[df.columns[0]], df[df.columns[1]]))
check("cluster==distributed label maps", lm(cl) == lm(cd), f"{len(cl)} ids")
check("cluster id count", len(cl) == 4770, f"{len(cl)} == 4770 (10x sf0.1)")

# --- embedding near-dup planted structure ------------------------------
ed = pq("q_embed_dedup")
cols = idcols(ed)
a, b = ed[cols[0]].to_numpy(), ed[cols[1]].to_numpy()
lo, hi = pd.DataFrame({"lo": a, "hi": b}).min(axis=1), pd.DataFrame({"lo": a, "hi": b}).max(axis=1)
check("embed_dedup planted pairs", len(ed) == 20000 and bool(((hi - lo) == 100000).all()),
      f"{len(ed)} pairs, every pair (v, v+100000)")

# --- spatial join fixed count ------------------------------------------
sj = pq("q_spatial_join")
check("spatial_join count", len(sj) == 10253463,
      f"{len(sj)} == 10,253,463 (DuckDB-cross-join-verified constant)")

# --- knn: structure + sampled exact replay ------------------------------
kn = pq("q_knn_spatial")
ncust = con.sql("SELECT count(*) FROM customer").fetchone()[0]
check("knn row count", len(kn) == 3 * ncust, f"{len(kn)} == 3x{ncust}")
per = kn.groupby("c_custkey")["knn_rank"].agg(["count", "min", "max"])
check("knn ranks", bool((per["count"] == 3).all() and (per["min"] == 1).all()
      and (per["max"] == 3).all()), "every customer has ranks {1,2,3}")
con.sql("CREATE VIEW customer_s AS SELECT * FROM customer WHERE c_custkey % 997 = 0")
knn_sql = oracle["q_knn_spatial"].replace("FROM customer,", "FROM customer_s,")
got = con.sql(knn_sql).df()
want = kn[kn.c_custkey % 997 == 0]
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)
gotc, wantc = canon(got), canon(want)
pd.testing.assert_frame_equal(gotc, wantc, check_dtype=False, check_exact=True)
check("knn sampled replay", True,
      f"{len(want)} rows ({want.c_custkey.nunique()} customers) exact vs DuckDB")

# --- dbscan: labeling contract at sf1 density ---------------------------
db = pq("q_dbscan")
idc = [c for c in db.columns if c not in ("cluster", "role")][0]
core = db[db.role == "core"]
cmins = core.groupby("cluster")[idc].min()
check("dbscan cluster ids are min core members",
      bool((cmins.index.to_numpy() == cmins.to_numpy()).all()),
      f"{db.cluster.nunique()} cluster(s), {len(core)}/{len(db)} core")
check("dbscan sf1 density collapse",
      db.cluster.nunique() == 1 and (db.role == "core").all(),
      "one all-core cluster at sf1 density")

# --- fuzzy join: count + sampled exact replay ---------------------------
fz = pq("q_fuzzy_join")
check("fuzzy_join count", len(fz) == 88434000,
      f"{len(fz):,} == 100x the sf0.1 count")
fz_sql = oracle["q_fuzzy_join"].replace(
    "FROM base b CROSS JOIN right_ r",
    "FROM (SELECT * FROM base WHERE p_partkey % 1996 = 0) b CROSS JOIN right_ r")
assert fz_sql != oracle["q_fuzzy_join"], "fuzzy oracle text changed; fix the splice"
gotf = canon(con.sql(fz_sql).df())
wantf = canon(fz[fz.p_partkey % 1996 == 0])
pd.testing.assert_frame_equal(gotf, wantf, check_dtype=False, check_exact=True)
check("fuzzy sampled replay", True, f"{len(wantf):,} rows exact vs DuckDB")

print(f"{ok} invariants ok")
