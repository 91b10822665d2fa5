#!/usr/bin/env python
"""Empirical scale-curve for the dedup/ANN family (r9 verdict item #4).

Builds a factor-N corpus in a SCRATCH dir (never touching the read-only
/root/testdata) by unioning N perturbed copies of the base fixture:

- documents, copy k: ``doc_id += k * OFFSET`` and every whitespace token
  suffixed with ``~k`` — shingles/minhashes become copy-unique, so the
  result is statistically N INDEPENDENT corpora of the base's shape.
  That is the honest linear-scaling experiment: the df-cap design
  predicts bucket count ~ N with per-bucket sizes unchanged, hence
  candidate pairs and wall time ~ N (a same-text replication would
  instead measure the cap saturating on N-times-hotter buckets).
- embeddings, copy k: ``vec_id += k * OFFSET`` and the vector circularly
  rolled by k — norms and component distribution preserved, sign-band
  patterns decorrelated across copies.

Usage::

    python tools/scale_curve.py [base_sf_dir] [factor] [dedup|flow|all]

Runs each dedup-family query at 1x and Nx (noop sink, full computation),
prints per-query wall times plus the LSH candidate-pair stats
(``dedup.lsh_candidate_stats``). Results are recorded in SCALE.md
("Dedup-family scale curve"); the regression-proof version of the
candidate-volume claim lives in tests/test_scale_curve.py.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OFFSET = 10_000_000  # id shift per copy; far above any fixture id

QUERIES = [
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_error_report",
    "dedup_keep_best",
    "embedding_neardup",
    "vband_geometry_report",
    "streaming_neardup",
]

# movement-flow family (r10): the events replication adds FRESH vehicle
# cohorts on the SAME cells/timestamps, so per-(cell, window) density
# grows with the factor — the honest N-times-fleet experiment. Linear
# expected for the per-vehicle window ops (od/stay/gap: keys xN, same
# per-key work); encounter/co-dwell pair volume grows ~N^2 in-bucket
# UNTIL their caps bite (that saturation is the measurement).
FLOW_QUERIES = [
    "od_matrix",
    "stay_points",
    "ping_gap_report",
    "encounter_pairs",
    "co_dwell_pairs",
    "convoy_clusters",
    "tile_anomaly_report",
    "tile_gap_fill",
    "kring_smooth",
]

# science/mlprep family (r10 verdict item #5): rg/entropy ride the
# events replication (vehicle keys xN, per-key work unchanged — linear
# expected); feature_hashing rides documents (its (doc_id, slot)
# shuffle is the one corpus-sized exchange added in r10 and must pin
# linear); target_encoding rides orders (rows xN but the shuffled
# relation is |priority| x |folds| — map-side combine should hold wall
# time near-flat).
SCIENCE_QUERIES = [
    "radius_of_gyration",
    "location_entropy",
    "feature_hashing",
    "target_encoding",
    # r11-restructured shapes: densified CUSUM (per-provider day->count
    # map) and the factored grouped-OLS trend
    "cusum_anomaly_report",
    "cell_speed_trend",
]


def build_scaled_corpus(base_sf_dir: str, out_dir: str, factor: int) -> None:
    """Write factor-N documents.parquet + embeddings.parquet into out_dir."""
    os.makedirs(out_dir, exist_ok=True)

    docs = pq.read_table(os.path.join(base_sf_dir, "documents.parquet"))
    texts = docs.column("text").to_pylist()
    parts = []
    for k in range(factor):
        if k == 0:
            t = docs
        else:
            suffixed = pa.array(
                [" ".join(f"{w}~{k}" for w in s.split()) for s in texts],
                pa.string(),
            )
            t = pa.table(
                {
                    "doc_id": pa.compute.add(docs.column("doc_id"), k * OFFSET),
                    "text": suffixed,
                    "lang": docs.column("lang"),
                    "source": docs.column("source"),
                    "n_chars": pa.array(
                        [len(s) for s in suffixed.to_pylist()], pa.int64()
                    ),
                }
            )
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, "documents.parquet"))

    ev = pq.read_table(os.path.join(base_sf_dir, "events.parquet"))
    parts = []
    for k in range(factor):
        if k == 0:
            t = ev
        else:
            # copy k = a fresh cohort of vehicles/users emitting the same
            # traffic pattern: ids shifted, timestamps untouched (state
            # cardinality grows with keys, windows stay aligned)
            cols = {}
            for name in ev.column_names:
                col = ev.column(name)
                if name in ("event_id", "user_id"):
                    cols[name] = pa.compute.add(col, k * OFFSET)
                else:
                    cols[name] = col
            t = pa.table(cols)
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, "events.parquet"))

    orders = pq.read_table(os.path.join(base_sf_dir, "orders.parquet"))
    parts = []
    for k in range(factor):
        if k == 0:
            t = orders
        else:
            # copy k = a fresh order book with the same category/price
            # distribution: keys shifted so hash folds re-randomize,
            # category cardinality unchanged
            cols = {}
            for name in orders.column_names:
                col = orders.column(name)
                if name in ("o_orderkey", "o_custkey"):
                    cols[name] = pa.compute.add(col, k * OFFSET)
                else:
                    cols[name] = col
            t = pa.table(cols)
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, "orders.parquet"))

    emb = pq.read_table(os.path.join(base_sf_dir, "embeddings.parquet"))
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    parts = []
    for k in range(factor):
        rolled = np.roll(vecs, k, axis=1)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.compute.add(emb.column("vec_id"), k * OFFSET),
                    "embedding": pa.array(
                        [row.tolist() for row in rolled], pa.list_(pa.float32())
                    ),
                    "label": emb.column("label"),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, "embeddings.parquet"))


def main() -> None:
    import __spark_entry__ as entry_mod
    from real_time_mobility_heatmap_spark.operators.dedup import lsh_candidate_stats
    from real_time_mobility_heatmap_spark.session import get_spark
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    family = sys.argv[3] if len(sys.argv) > 3 else "dedup"
    families = {
        "dedup": QUERIES,
        "flow": FLOW_QUERIES,
        "flows": FLOW_QUERIES,  # common alias
        "science": SCIENCE_QUERIES,
        "all": QUERIES + FLOW_QUERIES + SCIENCE_QUERIES,
    }
    if family not in families:
        sys.exit(f"unknown family {family!r}; choose from {sorted(families)}")
    run_queries = families[family]

    import tempfile

    scratch = tempfile.mkdtemp(prefix="scale-curve-")
    print(f"building {factor}x corpus from {base} in {scratch} ...")
    build_scaled_corpus(base, scratch, factor)

    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    for sf_dir, tag in ((base, "1x"), (scratch, f"{factor}x")):
        stats = lsh_candidate_stats(load_table(spark, sf_dir, "documents")).collect()[0]
        print(
            f"[{tag}] lsh buckets={stats['n_buckets']} "
            f"candidates={stats['n_candidates']} "
            f"max_bucket={stats['max_bucket']} df_cap={stats['df_cap']}"
        )

    results: dict[str, dict[str, float]] = {}
    for name in run_queries:
        results[name] = {}
        for sf_dir, tag in ((base, "1x"), (scratch, f"{factor}x")):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            results[name][tag] = round(time.perf_counter() - t0, 2)
        r = results[name]
        ratio = round(r[f"{factor}x"] / max(r["1x"], 1e-9), 1)
        print(f"{name:24s} 1x={r['1x']:7.2f}s  {factor}x={r[f'{factor}x']:7.2f}s  ratio={ratio}")


if __name__ == "__main__":
    main()
