#!/usr/bin/env python
"""Measure how each bench-tagged query's runtime scales with data
size: run at sf0.001 / sf0.01 / sf0.1 (10x steps), fit the log-log
slope, and write SCALING.md.

A slope near 1.0 = linear scaling (what a scan/agg/broadcast-join
pipeline should show); well below 1 = fixed overhead dominates at
these sizes; well above 1 = superlinear work (quadratic pair
blowup, unbounded window, collect) — the thing to catch BEFORE a
100 TB run. Local timings at these sizes are overhead-heavy, so the
slope is a smoke signal, not a forecast; the per-operator scale
arguments live in SCALE.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from bigdata_elephant_spark.registry import all_specs
from bigdata_elephant_spark.session import get_spark, release_caches

SFS = [
    ("/root/testdata/sf0.001", 0.001),
    ("/root/testdata/sf0.01", 0.01),
    ("/root/testdata/sf0.1", 0.1),
]
ITERS = int(os.environ.get("SCALING_ITERS", "2"))


def main() -> None:
    spark = get_spark("elephant-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    specs = [s for s in all_specs() if s.bench]
    # warm: one pass over everything at the smallest SF
    for spec in specs:
        spec.fn(spark, SFS[0][0]).write.format("noop").mode(
            "overwrite"
        ).save()
        release_caches()
    rows = []
    for spec in specs:
        times = []
        for sf_dir, _sf in SFS:
            best = float("inf")
            for _ in range(ITERS):
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
                release_caches()
            times.append(best)
        # log-log OLS slope over the three (size, time) points
        xs = [math.log10(sf) for _, sf in SFS]
        ys = [math.log10(t) for t in times]
        n = len(xs)
        mx = sum(xs) / n
        my = sum(ys) / n
        slope = sum(
            (x - mx) * (y - my) for x, y in zip(xs, ys)
        ) / sum((x - mx) ** 2 for x in xs)
        rows.append((spec.name, times, slope))
        print(
            f"  {spec.name}: "
            + " ".join(f"{t:.3f}s" for t in times)
            + f"  slope={slope:.2f}",
            file=sys.stderr,
        )
    rows.sort(key=lambda r: -r[2])
    md_path = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "SCALING.md"
    )
    # preserve the sf1 spot-check section (tools/sf1_spotcheck.py
    # owns it) across full-table rewrites — a plain "w" rewrite
    # silently dropped it once
    sf1_section = ""
    try:
        prev = open(md_path).read()
        marker = "\n## sf1 spot-check"
        if marker in prev:
            sf1_section = prev[prev.index(marker):]
    except OSError:
        pass
    with open(md_path, "w") as f:
        f.write(
            "# SCALING — measured runtime vs data size\n\n"
            "Per bench-tagged query: best-of-"
            f"{ITERS} runtime at sf0.001 / sf0.01 / sf0.1 and the "
            "log-log slope (1.0 = linear in data size; low = fixed "
            "overhead dominates at these sizes; >1 sustained = "
            "superlinear work — investigate before scale-up). "
            "Regenerate with `python tools/scaling_check.py`.\n\n"
            "| query | sf0.001 | sf0.01 | sf0.1 | slope |\n"
            "|---|---|---|---|---|\n"
        )
        for name, times, slope in rows:
            f.write(
                f"| {name} | {times[0]:.3f}s | {times[1]:.3f}s "
                f"| {times[2]:.3f}s | {slope:.2f} |\n"
            )
        if sf1_section:
            f.write(sf1_section)
    print("wrote SCALING.md", file=sys.stderr)


if __name__ == "__main__":
    main()
