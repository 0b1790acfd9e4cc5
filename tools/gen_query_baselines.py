#!/usr/bin/env python
"""Generate BASELINE_QUERIES.json: a per-query pinned reference
timing, so "within 2x of baseline" is a mechanical per-query check
in bench.py instead of cross-round archaeology.

Rule: a query's baseline is its timing from the EARLIEST
driver-recorded round at the benchmark SF — except when the query's
DEFINITION changed after it first shipped (oracle rework, scoring
semantics change), in which case the pin moves to the round the
current definition landed (DEFINITION_ROUNDS below, maintained by
hand; one line per definition change, with the reason).

Re-run after each round to pick up queries that shipped since; the
pin of an already-listed query never moves unless DEFINITION_ROUNDS
says so, so baselines are stable across regenerations.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_SF = 0.1


def _round_detail(rnd: str) -> dict[str, float] | None:
    """Fallback per-query seconds for a round whose BENCH_rN.json
    compact line dropped the ``queries`` dict (the line outgrew the
    driver's ~2000-char stdout capture — first seen r11 at 64
    queries): the driver's round-marker commit ("round N: verdict/")
    snapshots ITS OWN BENCH_DETAIL.json run, so ``git show`` of that
    blob recovers the same driver-recorded timings the compact line
    lost."""
    out = subprocess.run(
        ["git", "log", "--format=%H %s"],
        capture_output=True, text=True, cwd=HERE, check=True,
    ).stdout
    sha = None
    for line in out.splitlines():
        # round-marker commits use the UNPADDED round number ("round
        # 5: verdict/..."), while rnd arrives zero-padded from the
        # BENCH_r05.json filename — match on int(...) or the fallback
        # silently skips every single-digit round (r12 ADVICE: r05
        # and r09 were sf0.1 with truncated queries dicts yet absent
        # from rounds_seen, pinning their queries to later rounds)
        m = re.match(rf"(\w+) round {int(rnd[1:])}: verdict/", line)
        if m:
            sha = m.group(1)  # newest marker for the round wins
            break
    if sha is None:
        return None
    blob = subprocess.run(
        ["git", "show", f"{sha}:BENCH_DETAIL.json"],
        capture_output=True, text=True, cwd=HERE,
    ).stdout
    try:
        detail = json.loads(blob)
    except ValueError:
        return None
    if float(detail.get("sf", -1)) != BENCH_SF:
        return None
    q = detail.get("queries")
    if isinstance(q, dict) and q:
        return {k: float(v) for k, v in q.items()}
    return None

# query -> (round, why the pin moved off the earliest record)
DEFINITION_ROUNDS = {
    # r02 oracle-parity rework changed the query's definition
    # (exact-decimal sums + rounded outputs); the r01 0.598s timing
    # measured a different computation. Flat 1.19-1.66s ever since.
    "q1_pricing_summary": ("r02", "oracle-parity rework in r02"),
    # The r14 build wired the document ingest gate into the pipeline
    # and the r14 optimization round restructured its dedup closure —
    # both definition changes vs the r03 pin (5.028s). r14 carried a
    # hand-measured interim repin (6.367s) because no driver BENCH_r14
    # record existed yet; now one does (the round-marker commit's
    # BENCH_DETAIL snapshot), so the pin is re-grounded on it, per the
    # r14 verdict. (BENCH_r14's compact line dropped `queries`; the
    # _round_detail fallback recovers the driver's own run.)
    "llm_pipeline_e2e": ("r14", (
        "r14 ingest-gate wiring + dedup-closure restructure changed "
        "the definition; pin = driver-recorded r14 value, replacing "
        "the interim hand-measured 6.367s repin"
    )),
    # Definition byte-identical since r4 — this is a measurement
    # re-grounding, not a definition change: the r04 pin (1.193s) is
    # no longer reproducible by ANY measurement on this machine
    # (three rounds of monotone drift on an unchanged plan; isolated
    # quiet-box best-of-3 1.708s). r14 carried a hand-measured repin
    # (1.596s); the driver's own r14 record (1.695s) replaces it, per
    # the r14 verdict ("no hand-measured repins left pointing at "
    # "builder-measured values that a driver record now covers").
    "eval_contamination": ("r14", (
        "r04 pin predates cumulative environment drift; pin = "
        "driver-recorded r14 value, replacing the interim "
        "hand-measured 1.596s repin (definition unchanged since r4)"
    )),
}

# query -> (sec, why): pins re-measured BY HAND under the current
# measurement policy, overriding the earliest-round record. Used when
# the original pin predates a policy change (the r12 sub-second
# best-of-3) and is therefore a single lucky-fast sample that makes
# the 2x gate jitter-bound — the pin is a measurement artifact, not a
# regression reference. Value = the best-of-3 from a load<1 run, with
# the provenance recorded so the override is auditable.
MEASURED_REPINS = {
    # r03 pin 0.355s (BENCH_r03.json) was a pre-policy single sample
    # on a 0.3-0.6s query; driver runs read 1.77x-1.99x against it
    # two rounds running while the builder and isolated ratios sat
    # at ~1.3x.
    "q1_pricing_fast": (0.496, (
        "pre-best-of-3 r03 pin (0.355s) made the 2x gate "
        "jitter-bound; re-measured r13 2026-08-16, load 0.24, "
        "in-suite best-of-3 over a shuffled 2-pass run"
    )),
    # (The r14 interim hand-measured repins of eval_contamination
    # and llm_pipeline_e2e were retired in r15: both now pin to the
    # driver's own r14 record via DEFINITION_ROUNDS above.)
}


def load_rounds() -> list[tuple[str, dict[str, float]]]:
    out = []
    for p in sorted(glob.glob(os.path.join(HERE, "BENCH_r*.json"))):
        m = re.search(r"(r\d+)", os.path.basename(p))
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = data.get("parsed") or data
        if float(parsed.get("sf", -1)) != BENCH_SF:
            continue
        q = parsed.get("queries")
        if isinstance(q, dict) and q:
            out.append((m.group(1), {k: float(v) for k, v in q.items()}))
        else:
            detail = _round_detail(m.group(1))
            if detail:
                out.append((m.group(1), detail))
    return out


def main() -> None:
    rounds = load_rounds()
    queries: dict[str, dict] = {}
    for rnd, timings in rounds:  # ascending round order
        for name, sec in timings.items():
            if name not in queries:
                queries[name] = {"sec": sec, "round": rnd}
    for name, (rnd, why) in DEFINITION_ROUNDS.items():
        timing = dict(rounds).get(rnd, {}).get(name)
        if timing is not None:
            queries[name] = {
                "sec": timing,
                "round": rnd,
                "definition_change": why,
            }
    for name, (sec, why) in MEASURED_REPINS.items():
        queries[name] = {
            "sec": sec,
            "round": "repin",
            "measured_repin": why,
        }
    out = {
        "sf": BENCH_SF,
        "rule": (
            "earliest driver-recorded round at sf0.1; pins move only "
            "via DEFINITION_ROUNDS or MEASURED_REPINS in "
            "tools/gen_query_baselines.py"
        ),
        "rounds_seen": [r for r, _ in rounds],
        "queries": dict(sorted(queries.items())),
    }
    path = os.path.join(HERE, "BASELINE_QUERIES.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {len(queries)} queries from {len(rounds)} rounds")


if __name__ == "__main__":
    main()
