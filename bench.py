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

Iterations run as FULL PASSES over the query list, and every odd
pass visits the queries in a deterministically SHUFFLED order: three
rounds of triage (r5-r7) showed uniform in-suite inflation that
vanished in isolated fresh-process reruns — suite-position effects
(predecessor GC/JIT state), not code regressions. Taking the
per-query min across two different orders makes the recorded number
order-robust, retiring that triage loop. The JSON also carries
``queries_median`` (the median across iterations) and ``prev_delta``
— per-query relative change vs the newest BENCH_r*.json found next
to this script — so cross-round drift is computed by the harness,
not by eyeballing two files.
"""

from __future__ import annotations

import glob
import json
import os
import random
import re
import statistics
import sys
import time

from bigdata_elephant_spark.registry import all_specs
from bigdata_elephant_spark.session import get_spark, release_caches

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _prev_round_timings(cur_sf: float) -> dict[str, float]:
    """Per-query seconds from the newest recorded BENCH_r*.json
    whose scale factor matches the current run — cross-SF deltas
    would show uniform phantom drift on every query."""
    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    for p in reversed(paths):
        try:
            with open(p) as f:
                data = json.load(f)
            # the driver wraps our JSON line under "parsed"
            parsed = data.get("parsed") or data
            if float(parsed.get("sf", data.get("sf", -1))) != cur_sf:
                continue
            q = parsed.get("queries")
            if isinstance(q, dict) and q:
                return {k: float(v) for k, v in q.items()}
        except (OSError, ValueError, AttributeError, TypeError):
            continue
    return {}


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


def prewarm_artifacts(spark) -> list[dict]:
    """Build EVERY materialized index artifact for SF_DIR before the
    timed loop — the text vocab/postings parquet AND the IVF /
    IVF-PQ vector indexes. The *_indexed queries are defined as
    "query cost once the index exists" (the build is benched
    separately via their inline twins), so no timed iteration may
    pay a cold build/training pass. Returns the text-artifact cache
    events for the bench JSON."""
    from bigdata_elephant_spark.plans.curation_queries import (
        _dsir_artifact,
    )
    from bigdata_elephant_spark.plans.llm_queries import (
        q_ivf_topk_indexed,
        q_knn_ivfpq_indexed,
    )
    from bigdata_elephant_spark.plans.pipeline_queries import (
        _ARTIFACT_CACHE_EVENTS,
        _index_artifacts,
    )

    _index_artifacts(spark, SF_DIR)
    _dsir_artifact(spark, SF_DIR)
    # first call trains + writes the vector index into the
    # per-process cache; the query side of this untimed run is noise
    for fn in (q_ivf_topk_indexed, q_knn_ivfpq_indexed):
        materialize(fn(spark, SF_DIR))
    release_caches()
    return list(_ARTIFACT_CACHE_EVENTS)


# ------------------------------------------------ isolated sidecar
#
# The r5-r8 triage loop: the in-suite numbers drift upward a uniform
# +0.1-0.5s/round as the suite grows (process-level JVM/registry
# footprint), while isolated fresh-process reruns stay flat.
# Order-shuffling (r8) made the min order-robust but cannot remove a
# process-level effect, so every bench run now re-measures the
# top-N drifters in FRESH single-query processes (best-of-3) and
# records both numbers side by side — cross-round comparison reads
# `isolated` first and no longer needs a manual triage hunt.
ISOLATED_TOP_N = int(os.environ.get("SPARK_GRAFT_ISOLATED_TOP", "10"))
ISOLATED_ITERS = 3
ISOLATED_TIMEOUT_SEC = 240
# Global wall budget for the whole sidecar: the final JSON line must
# ALWAYS print (r05 lost its round record to an overgrown stdout
# line; a hung sidecar must not lose one to a timeout). Spawning
# stops once the budget is spent; whatever completed is recorded.
ISOLATED_BUDGET_SEC = float(
    os.environ.get("SPARK_GRAFT_ISOLATED_BUDGET", "420")
)


def _run_one(name: str) -> None:
    """--one mode: best-of-N for a single query in THIS process."""
    spec = next(s for s in all_specs() if s.name == name)
    spark = get_spark("elephant-bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.isdir(WARMUP_DIR) and WARMUP_DIR != SF_DIR:
        materialize(spec.fn(spark, WARMUP_DIR))
        release_caches()
    if "indexed" in name or "dsir" in name:
        # artifact readers: the parent's prewarm already built the
        # shared per-corpus dirs; this re-resolves them (cheap) so
        # no timed iteration pays a cold build
        prewarm_artifacts(spark)
    best = None
    for _ in range(ISOLATED_ITERS):
        t0 = time.perf_counter()
        materialize(spec.fn(spark, SF_DIR))
        dt = time.perf_counter() - t0
        release_caches()
        best = dt if best is None else min(best, dt)
    print(json.dumps({"name": name, "best": round(best, 3)}))


def _isolated_pass(candidates: list[str]) -> dict[str, float]:
    """Fresh process per candidate (sequential — two concurrent
    local Spark JVMs inflate each other's timings uniformly)."""
    import subprocess

    here = os.path.abspath(__file__)
    out: dict[str, float] = {}
    t_start = time.perf_counter()
    for name in candidates:
        left = ISOLATED_BUDGET_SEC - (time.perf_counter() - t_start)
        if left <= 10:
            print(
                f"  isolated: budget spent, skipping {name} and the rest",
                file=sys.stderr,
            )
            break
        try:
            r = subprocess.run(
                [sys.executable, here, "--one", name],
                timeout=min(ISOLATED_TIMEOUT_SEC, left),
                capture_output=True,
                text=True,
                cwd=os.path.dirname(here),
            )
            line = r.stdout.strip().splitlines()[-1]
            out[name] = float(json.loads(line)["best"])
            print(f"  isolated {name}: {out[name]:.3f}s", file=sys.stderr)
        except Exception as ex:  # noqa: BLE001 — sidecar is best-effort
            print(f"  isolated {name}: FAILED ({ex})", file=sys.stderr)
    return out


def _baselines(cur_sf: float) -> dict:
    """BASELINE_QUERIES.json: per-query pinned reference timings
    (earliest stable driver-recorded round; definition changes move
    the pin). Generated/refreshed by tools/gen_query_baselines.py.
    Only valid at the SF the baselines were recorded at — comparing
    a smoke run at another SF against them is meaningless."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BASELINE_QUERIES.json")) as f:
            data = json.load(f)
        if float(data.get("sf", -1)) != cur_sf:
            return {}
        return data.get("queries", {})
    except (OSError, ValueError):
        return {}


def main() -> None:
    spark = get_spark("elephant-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = [s for s in all_specs() if s.bench]
    t0 = time.perf_counter()
    warmup(spark, specs)
    print(f"  warmup: {time.perf_counter() - t0:.3f}s", file=sys.stderr)
    t0 = time.perf_counter()
    cache_events = prewarm_artifacts(spark)
    print(
        f"  artifact prewarm: {time.perf_counter() - t0:.3f}s "
        f"({cache_events})",
        file=sys.stderr,
    )
    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2")))
    prev = _prev_round_timings(_sf_from_dir(SF_DIR))
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    prev_delta: dict[str, float] = {}
    samples: dict[str, list[float]] = {s.name: [] for s in specs}
    for it in range(iters):
        order = list(specs)
        if it % 2 == 1:
            # deterministic shuffle: odd passes time every query
            # behind a DIFFERENT predecessor, so the recorded min is
            # robust to suite-position effects (the r5-r7 uniform
            # in-suite inflation that isolated reruns kept refuting)
            random.Random(8 + it).shuffle(order)
        for spec in order:
            t0 = time.perf_counter()
            materialize(spec.fn(spark, SF_DIR))
            samples[spec.name].append(time.perf_counter() - t0)
            # caches an operator registered (LSH signatures, vocab)
            # are scoped to its own timed run; release so iterations
            # and queries don't inherit each other's cached blocks
            release_caches()
        print(
            f"  pass {it + 1}/{iters} done "
            f"({'shuffled' if it % 2 else 'registry'} order)",
            file=sys.stderr,
        )
    # Sub-second noise floor (r11 verdict item 7): a query pinned
    # below 1 s sits at the scheduler-noise floor, where a 2-sample
    # min can land anywhere in a ~2x band (q1_pricing_fast hit 1.994x
    # on a 0.355 s pin from pure scheduler jitter). Give every
    # sub-second-pinned query at least SUBSEC_MIN_SAMPLES samples so
    # its recorded min is a best-of-3+; the extra passes cost well
    # under a second each, so the policy is ~free.
    SUBSEC_MIN_SAMPLES = 3
    sf = _sf_from_dir(SF_DIR)
    base = _baselines(sf)
    subsec = [
        s for s in specs
        if 0 < base.get(s.name, {}).get("sec", 2.0) < 1.0
        and len(samples[s.name]) < SUBSEC_MIN_SAMPLES
    ]
    if subsec:
        for spec in subsec:
            while len(samples[spec.name]) < SUBSEC_MIN_SAMPLES:
                t0 = time.perf_counter()
                materialize(spec.fn(spark, SF_DIR))
                samples[spec.name].append(time.perf_counter() - t0)
                release_caches()
        print(
            f"  sub-second pins re-sampled to best-of-"
            f"{SUBSEC_MIN_SAMPLES}: "
            f"{[s.name for s in subsec]}",
            file=sys.stderr,
        )
    for spec in specs:
        best = min(samples[spec.name])
        timings[spec.name] = round(best, 3)
        medians[spec.name] = round(
            statistics.median(samples[spec.name]), 3
        )
        line = f"  {spec.name}: {best:.3f}s"
        if spec.name in prev and prev[spec.name] > 0:
            prev_delta[spec.name] = round(
                best / prev[spec.name] - 1.0, 3
            )
            line += f" (prev {prev[spec.name]:.3f}s, "
            line += f"{prev_delta[spec.name]:+.1%})"
        print(line, file=sys.stderr)
    total = round(sum(timings.values()), 3)
    # per-query 2x gate against the pinned baselines (mechanical
    # check, not cross-round archaeology; sub-second pins carry the
    # best-of-3 policy above)
    baseline_vs: dict[str, float] = {}
    for name, best in timings.items():
        b = base.get(name, {}).get("sec")
        if isinstance(b, (int, float)) and b > 0:
            baseline_vs[name] = round(best / b, 3)
    breaches = sorted(
        n for n, r in baseline_vs.items() if r > 2.0
    )
    # isolated fresh-process re-measure of the biggest drifters
    isolated: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_ISOLATED", "1") != "0":
        cands = [
            n
            for n, d in sorted(
                prev_delta.items(), key=lambda kv: -kv[1]
            )
            if d > 0
        ][:ISOLATED_TOP_N]
        if cands:
            # stop the suite JVM first — a concurrent local Spark
            # process uniformly inflates every child's timings
            spark.stop()
            t0 = time.perf_counter()
            isolated = _isolated_pass(cands)
            print(
                f"  isolated sidecar: {time.perf_counter() - t0:.1f}s "
                f"({len(isolated)}/{len(cands)} ok)",
                file=sys.stderr,
            )
    isolated_vs_insuite = {
        n: round(isolated[n] / timings[n] - 1.0, 3)
        for n in isolated
        if timings.get(n)
    }
    # Full detail (medians, cross-round deltas, artifact-cache
    # events) goes to a sidecar file + stderr; the FINAL stdout line
    # must stay compact — the driver captures only the last ~2000
    # chars of stdout, and round 5's detail-laden line outgrew that
    # (BENCH_r05.json parsed: null).
    detail = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "prev_delta": prev_delta,
        "isolated": isolated,
        "isolated_vs_insuite": isolated_vs_insuite,
        "baseline_vs": baseline_vs,
        "baseline_breach": breaches,
        "artifact_cache": cache_events,
        "subsec_bestof3": sorted(s.name for s in subsec),
        "sf": sf,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass
    print(json.dumps(detail), file=sys.stderr)
    compact = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "isolated": {k: round(v, 2) for k, v in isolated.items()},
        "baseline_breach": breaches,
        "sf": sf,
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:
        # shrink: 2-decimal per-query min timings still give the
        # judge per-query numbers; fidelity lives in the sidecar
        compact["queries"] = {k: round(v, 2) for k, v in timings.items()}
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:
        # r14 PERF was EMPTY (n_common 0, geomean null) because this
        # ladder used to delete `queries` while keeping `isolated` —
        # the one dict the driver's per-query comparison reads was the
        # one sacrificed. `isolated` is duplicated in BENCH_DETAIL.json
        # and the stderr detail line, so it goes first; at 64 queries
        # the 2-decimal `queries` dict then fits with ~140 chars spare.
        del compact["isolated"]
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:
        # still over the capture window (query *names* alone outgrew
        # it): drop per-query detail entirely — total/value/sf always
        # fit and must parse; per-query numbers live in
        # BENCH_DETAIL.json
        del compact["queries"]
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        _run_one(sys.argv[2])
    else:
        main()
