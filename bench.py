#!/usr/bin/env python
"""Benchmark harness: runs the headline (bench-tagged) queries at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a noop-format write (full plan
execution, no driver collect, no sink I/O) — the closest local proxy
for cluster throughput. Everything except the final JSON goes to
stderr.

Each query runs $SPARK_GRAFT_BENCH_ITERS times (default 2) and
reports the MINIMUM: single-iteration timings in a shared 32-query
JVM conflate GC pauses and compilation with plan cost (round 2's
phantom 1.6x "regression" on curate_corpus was exactly this), and
the min is the standard steady-state estimator for that setup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from bigdata_elephant_spark.registry import all_specs
from bigdata_elephant_spark.session import get_spark, release_caches

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


WARMUP_DIR = os.environ.get(
    "SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001"
)


def warmup(spark, specs) -> None:
    """Run every benchmarked query once at the smallest SF so one-time
    session costs (codegen compilation, exchange init, JIT) are paid
    outside the timed loop. Different input paths => different plans,
    so nothing the timed run uses gets pre-cached."""
    if not os.path.isdir(WARMUP_DIR) or WARMUP_DIR == SF_DIR:
        return
    for spec in specs:
        materialize(spec.fn(spark, WARMUP_DIR))
        release_caches()


def main() -> None:
    spark = get_spark("elephant-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = [s for s in all_specs() if s.bench]
    t0 = time.perf_counter()
    warmup(spark, specs)
    print(f"  warmup: {time.perf_counter() - t0:.3f}s", file=sys.stderr)
    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2")))
    timings: dict[str, float] = {}
    for spec in specs:
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            materialize(spec.fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
            # caches an operator registered (LSH signatures, vocab)
            # are scoped to its own timed run; release so iterations
            # and queries don't inherit each other's cached blocks
            release_caches()
        timings[spec.name] = round(best, 3)
        print(f"  {spec.name}: {best:.3f}s", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
