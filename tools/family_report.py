#!/usr/bin/env python3
"""Groups BENCH_FULL.json per-query times into the SURVEY §5 families and
prints the per-family scaling table across multiple runs.

Usage: python3 tools/family_report.py sf0.01=BENCH1.json sf0.1=BENCH2.json sf1=BENCH3.json
"""
import json, sys, re

FAMILIES = [
    ("relational", r"^q_(select|filter|groupby|join_inner|join_left|join_full|subquery|mod_filter|date_filter|orderby|distinct|expr|like|having|union|intersect|except|exists|window|rollup|pivot|moving_avg|grouping_sets|cube|recursive_cte|string_funcs)"),
    ("spatial scalar", r"^q_(st_|wkt_|geojson_io|gml|kml)"),
    ("spatial agg/join", r"^q_(spatial_join|knn_spatial|dbscan)"),
    ("document sources", r"^q_(xml|geojson_dsv2|geojson_export|geojson_v2write|geojson_topn|geojson_couch|geojson_mongo|warc)"),
    ("dedup", r"^q_(dedup_|embed_dedup|containment_join|fuzzy_join|semdedup|dup_spans|paragraph_dedup|decontaminate|ngram_jaccard)"),
    ("ANN/vectors", r"^q_(ann_|knn_join|embed_quantize|ivf_pq|ivf_opq)"),
    ("text kernels", r"^q_(lang_id|text_|quality_|lm_score|repetition|redact|html|url_|bpe|token_|bigrams|tfidf|fingerprint|dsir|ccnet)"),
    ("sampling/stats", r"^q_(sample|docmix|split|stratified|weighted|quantile|hist|profile|row_ids|pack|chunk|stats_)"),
    ("sketches", r"^q_(heavy_hitters|distinct_sketch|cms|hll|sketch_rollup)"),
    ("joins/layout", r"^q_(asof|range_join|interval_join|skew_join|topk_per_group|snapshot_diff|zorder|bucketed_join|merge_upsert|gap_fill|scd2|upsert_stream_parity|upsert_time_travel|compact)"),
    ("graphs/retrieval", r"^q_(pagerank|triangles|bm25|rrf|graph_bfs|label_prop|shortest_paths)"),
    ("multimodal", r"^q_(multimodal|video_meta)"),
    ("events/streaming", r"^q_(events|funnel|sessionize|retention)"),
]

def family(q):
    for name, pat in FAMILIES:
        if re.match(pat, q):
            return name
    return "other"

runs = []
for arg in sys.argv[1:]:
    label, path = arg.split("=", 1)
    runs.append((label, json.load(open(path))))

fams = {}
for label, data in runs:
    for q, t in data["queries"].items():
        fams.setdefault(family(q), {}).setdefault(label, []).append(t)

labels = [l for l, _ in runs]
print("| family | queries | " + " | ".join(f"{l} (s)" for l in labels) + " |")
print("|---|---|" + "|".join(["---"] * len(labels)) + "|")
tot = {l: 0.0 for l in labels}
order = [f for f, _ in FAMILIES] + ["other"]
for f in order:
    if f not in fams:
        continue
    row = fams[f]
    n = max(len(v) for v in row.values())
    cells = []
    for l in labels:
        s = sum(row.get(l, []))
        tot[l] += s
        cells.append(f"{s:.2f}")
    print(f"| {f} | {n} | " + " | ".join(cells) + " |")
unassigned = fams.get("other", {})
print("| **total** | " + str(sum(max(len(v) for v in fam.values()) for fam in fams.values())) +
      " | " + " | ".join(f"**{tot[l]:.1f}**" for l in labels) + " |")
for label, data in runs:
    lf = data.get("load_factor")
    print(f"# {label}: load_factor={lf} value={data.get('value'):.1f}s "
          f"n={len(data['queries'])} failed={data.get('failed', [])}")
if unassigned:
    print("# unassigned queries:", sorted(set(q for l, d in runs for q in d['queries'] if family(q) == 'other'))[:40])
