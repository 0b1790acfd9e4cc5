#!/usr/bin/env python
"""Isolated best-of-N timing for pagerank_dupgraph at sf0.1 —
the r6 verdict's drift bisect (3.61 s r4 -> 4.32 s r6 in the bench).

Run ONE variant per process (fresh JVM, no suite-order effects):

    PR_VARIANT=current python tools/pagerank_bisect.py
    PR_VARIANT=r4      python tools/pagerank_bisect.py

``r4`` replays the round-4 checkpoint cadence (EAGER localCheckpoint
every other round) by patching the eager flag; ``current`` is HEAD
(lazy every other round). Prints min/median of N full executions.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from pyspark.sql import DataFrame

from bigdata_elephant_spark.session import get_spark, release_caches

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PR_ITERS", "5"))
VARIANT = os.environ.get("PR_VARIANT", "current")


def main() -> None:
    if VARIANT == "r4":
        # round-4 cadence: eager checkpoint; force eager regardless
        # of the eager=False call sites in graph.pagerank
        orig = DataFrame.localCheckpoint

        def eager_cp(self, eager=True):
            return orig(self, eager=True)

        DataFrame.localCheckpoint = eager_cp

    from bigdata_elephant_spark.plans.llm_queries import (
        q_pagerank_dupgraph,
    )

    spark = get_spark("pr-bisect")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM/codegen/parquet-footer caches
    q_pagerank_dupgraph(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    release_caches()
    times = []
    for _ in range(N):
        t0 = time.perf_counter()
        q_pagerank_dupgraph(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        times.append(time.perf_counter() - t0)
        release_caches()
    print(
        f"{VARIANT}: min {min(times):.3f}s "
        f"median {statistics.median(times):.3f}s "
        f"all {[round(t, 3) for t in times]}"
    )


if __name__ == "__main__":
    main()
