#!/usr/bin/env python3
"""Derive an sf1-scale copy of the driver's sf0.1 test tables (10x rows)
for scale benchmarking, WITHOUT touching /root/testdata (read-only).

Replication preserves join structure (all foreign keys shift together per
replica) and keeps the near-duplicate/ANN workloads LINEAR:
  - documents: each replica applies a distinct Caesar cipher to every
    letter (see the comment above the cipher loop for why substitution
    beats salt-token insertion on this ~30-word vocabulary), so
    cross-replica texts share no shingles and the near-dup pair set
    scales ~10x, not ~100x as naive text replication would. Distinct
    shifts exist only for replicas <= 26 (25 non-identity rotations +
    the original), asserted below;
  - embeddings: replicas 1..9 get deterministic hash-generated vectors
    (near-orthogonal in 64-d), so only replica 0 carries the planted
    cosine structure.

Usage: python3 tools/make_sf1.py [outdir=/tmp/graft-sf1] [replicas=10]
"""
import sys

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SRC = "/root/testdata/sf0.1"

con = duckdb.connect()
import os
os.makedirs(OUT, exist_ok=True)

def write(name, sql):
    con.sql(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

def replicate(parts):
    return " UNION ALL ".join(parts)

# dimension tables: unchanged
for t in ("region", "nation"):
    write(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

write("customer", replicate(
    f"SELECT c_custkey + {i*10_000_000} AS c_custkey, * EXCLUDE (c_custkey) "
    f"FROM '{SRC}/customer.parquet'" for i in range(R)))

write("supplier", replicate(
    f"SELECT s_suppkey + {i*10_000_000} AS s_suppkey, * EXCLUDE (s_suppkey) "
    f"FROM '{SRC}/supplier.parquet'" for i in range(R)))

write("part", replicate(
    f"SELECT p_partkey + {i*10_000_000} AS p_partkey, * EXCLUDE (p_partkey) "
    f"FROM '{SRC}/part.parquet'" for i in range(R)))

write("orders", replicate(
    f"SELECT o_orderkey + {i*1_000_000_000} AS o_orderkey, "
    f"o_custkey + {i*10_000_000} AS o_custkey, "
    f"* EXCLUDE (o_orderkey, o_custkey) FROM '{SRC}/orders.parquet'"
    for i in range(R)))

write("lineitem", replicate(
    f"SELECT l_orderkey + {i*1_000_000_000} AS l_orderkey, "
    f"l_partkey + {i*10_000_000} AS l_partkey, "
    f"l_suppkey + {i*10_000_000} AS l_suppkey, "
    f"* EXCLUDE (l_orderkey, l_partkey, l_suppkey) FROM '{SRC}/lineitem.parquet'"
    for i in range(R)))

write("events", replicate(
    f"SELECT event_id + {i*10_000_000} AS event_id, "
    f"user_id + {i*10_000_000} AS user_id, "
    f"* EXCLUDE (event_id, user_id) FROM '{SRC}/events.parquet'"
    for i in range(R)))

# documents: per-replica CAESAR CIPHER on letters (shift i over a-z) —
# replica 0 is the untouched original carrying the planted near-dup
# structure.
#
# Why a cipher and not salt tokens: the corpus vocabulary is ~30 short
# words, so 5-char shingles are dominated by gap-crossing types that
# couple adjacent words. Any scheme that INSERTS material (per-doc gap
# salts, per-word suffixes) either leaves same-replica docs sharing
# most gap types (measured: ~4.6M doc pairs at j >= 0.5, an ~18,000x
# blowup of the 256-pair sf0.1 structure) or destroys the adjacency
# coupling that makes docs distinct (suffixes push the 5-char window
# off the word boundary, so ALL same-replica docs collapse toward
# vocabulary-overlap similarity ~0.8). A letter-substitution cipher
# instead maps each replica's shingle set EXACTLY isomorphically:
# within-replica Jaccard is bit-identical to the base corpus (near-dup
# pairs scale exactly 10x), while every cross-replica shingle differs
# in all letter positions (shift != 0), so cross-replica j ~ 0. Text
# length is unchanged, so corpus bytes also scale exactly 10x.
LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()

assert R <= 26, (
    "only 25 distinct non-identity Caesar shifts exist; replicas > 26 "
    "would repeat a cipher and create exact cross-replica duplicate texts")
doc_parts = [f"SELECT * FROM '{SRC}/documents.parquet'"]
for i in range(1, R):
    shift = (i - 1) % 25 + 1  # shifts 1..25, never 0: every letter must change
    rot = LOWER[shift:] + LOWER[:shift] + UPPER[shift:] + UPPER[:shift]
    doc_parts.append(
        f"SELECT doc_id + {i*1_000_000} AS doc_id, "
        f"translate(text, '{LOWER + UPPER}', '{rot}') AS text, "
        f"lang, source, n_chars FROM '{SRC}/documents.parquet'")
write("documents", replicate(doc_parts))

# embeddings: replica 0 original; replicas 1..9 hash-generated vectors
emb_parts = [f"SELECT * FROM '{SRC}/embeddings.parquet'"]
for i in range(1, R):
    emb_parts.append(
        f"SELECT vec_id + {i*1_000_000} AS vec_id, "
        f"list_transform(range(64), d -> "
        f"  CAST((CAST(hash(vec_id * 64 + d + {i*7_777_777}) % 2001 AS DOUBLE) - 1000.0) / 1000.0 AS FLOAT)"
        f")::FLOAT[] AS embedding, label "
        f"FROM '{SRC}/embeddings.parquet'")
write("embeddings", replicate(emb_parts))

print("done ->", OUT)
