#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), CPU count
from $SPARK_GRAFT_CPUS. Each query is forced end-to-end with a noop sink
(full computation, no driver collect). One warm-up of the flagship query
amortizes JVM/codegen startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from real_time_mobility_heatmap_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    runs = int(os.getenv("SPARK_GRAFT_BENCH_RUNS", "2"))

    def run(fn) -> float:
        # min over N runs: steady-state throughput, robust to shared-host
        # noise (single runs here vary by 2x run-to-run)
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        return min(times)

    # Warm-ups amortize one-time session costs out of the per-query numbers:
    # JVM/codegen startup (mobility_tiles), the Arrow Python-worker pool
    # (media_features), and the shingle-pipeline plan compile
    # (minhash_signatures) — all at the tiny sf0.001 fixture so the warm-up
    # itself is ~free. Steady-state throughput is what the numbers measure.
    warm_dir = "/root/testdata/sf0.001"
    for warm in ("mobility_tiles", "media_features", "minhash_signatures", "streaming_tiles"):
        try:
            qs[warm](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        timings[name] = round(run(fn), 3)

    total = round(sum(timings.values()), 3)
    regressions = _regressions(timings)
    if regressions:
        for name, r in regressions.items():
            print(
                f"BENCH REGRESSION: {name} {r['now']:.3f}s vs baseline "
                f"{r['baseline']:.3f}s (> 1.5x + 0.3s slack)",
                file=sys.stderr,
            )
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs": runs,
        "agg": "min",
        "regressions": regressions,
    }))
    spark.stop()
    if regressions and os.getenv("SPARK_GRAFT_BENCH_STRICT"):
        sys.exit(1)


def _regressions(timings: dict[str, float]) -> dict[str, dict[str, float]]:
    """Per-query guard against the recorded baseline (the newest
    BENCH_r{N}.json in the repo by default, so the bar ratchets forward
    each round): flag anything >1.5x its baseline with >0.3s absolute
    slack so additions can't silently regress established numbers. Exit
    code stays 0 unless SPARK_GRAFT_BENCH_STRICT is set (the driver
    records rc)."""
    recorded = sorted(REPO.glob("BENCH_r*.json"))
    default = str(recorded[-1]) if recorded else str(REPO / "BENCH_r01.json")
    baseline_path = os.getenv("SPARK_GRAFT_BENCH_BASELINE", default)
    try:
        raw = json.loads(Path(baseline_path).read_text())
        base_q = (raw.get("parsed") or raw).get("queries", {})
    except (OSError, ValueError):
        return {}
    out = {}
    for name, now in timings.items():
        base = base_q.get(name)
        if base and now > base * 1.5 and now - base > 0.3:
            out[name] = {"baseline": base, "now": now}
    return out


if __name__ == "__main__":
    main()
