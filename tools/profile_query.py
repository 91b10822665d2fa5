#!/usr/bin/env python
"""Isolated per-query profiler for optimization work (guide §1).

Runs the named queries in ONE fresh session (bench-identical warm-ups),
times each with the noop sink over N reps, and optionally dumps
``explain("formatted")`` to a file per query.

Usage:
    python tools/profile_query.py [--sf DIR] [--reps N] [--plans OUTDIR] \
        [--suffix TAG] query [query ...]

Prints one line per rep plus min/median. The rep protocol matches the
bench (same noop sink, same session shape) so numbers are comparable to
BENCH_DETAIL entries measured on the same host window; a noop-probe
calibration sample brackets the run so host drift is visible.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from real_time_mobility_heatmap_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    bad = [q for q in args.queries if q not in qs]
    if bad:
        sys.exit(f"unknown queries: {bad}")

    warm_dir = "/root/testdata/sf0.001"
    for warm in ("mobility_tiles", "media_features", "minhash_signatures", "streaming_tiles"):
        try:
            qs[warm](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    def probe() -> float:
        t0 = time.perf_counter()
        spark.range(1).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    print(f"calib pre: {probe():.3f}")
    for name in args.queries:
        fn = qs[name]
        if args.plans:
            out = Path(args.plans)
            out.mkdir(parents=True, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (out / f"{name}{args.suffix}.txt").write_text(plan)
        times = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        reps = " ".join(f"{t:.3f}" for t in times)
        print(
            f"{name}: reps [{reps}] min {min(times):.3f} "
            f"median {statistics.median(times):.3f}"
        )
    print(f"calib post: {probe():.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
