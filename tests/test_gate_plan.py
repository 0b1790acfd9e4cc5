"""Pin tools/gate_coverage.py's window-proposal algorithm.

The drain machinery is on the critical path every round (the r12
verdict's schedule arithmetic depends on it proposing exactly the
oldest-first window with family coverage repaired). The unit tests
pin its invariants on synthetic inputs where the expected window is
computable by hand (no git, no registry, no Spark); the final
integration test deliberately runs against the REAL registry and the
repo's correctness history (imports the registry, reads git-tracked
CORRECTNESS files) to prove the committed 50-slot proposal covers
every required family.
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from gate_coverage import propose_window  # noqa: E402


@dataclass
class Spec:
    name: str
    tags: tuple


def row(name, rnd, touched=False, oracled=True):
    return {
        "name": name,
        "last_gated_round": rnd,
        "code_touched_since_gate": touched,
        "oracled": oracled,
    }


def names(rows):
    return [r["name"] for r in rows]


def test_oldest_first_drain_and_mandatory_never_gated():
    specs = [Spec(f"q{i}", ()) for i in range(6)] + [Spec("new", ())]
    rows = [row(f"q{i}", rnd) for i, rnd in enumerate([3, 5, 4, 9, 2, 7])]
    rows.append(row("new", None))
    window, never, uncovered = propose_window(specs, rows, 4, frozenset())
    # the never-gated query takes a mandatory slot, leaving 3 drain
    # slots for the 3 oldest (r2, r3, r4)
    assert names(never) == ["new"]
    assert set(names(window)) == {"q4", "q0", "q2"}
    assert uncovered == frozenset()


def test_unoracled_rows_never_proposed():
    specs = [Spec("a", ()), Spec("b", ())]
    rows = [row("a", 1), row("b", 1, oracled=False)]
    window, never, _ = propose_window(specs, rows, 2, frozenset())
    assert names(window) == ["a"] and never == []


def test_family_repair_swaps_youngest_evictable():
    req = frozenset({"x", "y"})
    specs = [
        Spec("old_x1", ("x",)),
        Spec("old_x2", ("x",)),
        Spec("young_y", ("y",)),
    ]
    rows = [row("old_x1", 2), row("old_x2", 3), row("young_y", 9)]
    window, never, uncovered = propose_window(specs, rows, 2, req)
    # the pure age drain would take (old_x1, old_x2) and miss family
    # y; the repair must evict the YOUNGEST x-carrier (old_x2 — x
    # stays covered by old_x1) for the y carrier
    assert set(names(window)) == {"old_x1", "young_y"}
    assert uncovered == frozenset()


def test_family_repair_never_uncovers_a_family():
    # the only y-carrier in the window also carries x; evicting it
    # for a z-carrier would lose y, so the repair must pick the other
    # member (whose x is still covered by the y-carrier)
    req = frozenset({"x", "y", "z"})
    specs = [
        Spec("xy", ("x", "y")),
        Spec("x2", ("x",)),
        Spec("z1", ("z",)),
    ]
    rows = [row("xy", 2), row("x2", 3), row("z1", 9)]
    window, never, uncovered = propose_window(specs, rows, 2, req)
    assert set(names(window)) == {"xy", "z1"}
    assert uncovered == frozenset()


def test_uncovered_family_reported_when_no_carrier_exists():
    req = frozenset({"ghost"})
    specs = [Spec("a", ("x",))]
    rows = [row("a", 1)]
    window, never, uncovered = propose_window(specs, rows, 1, req)
    assert names(window) == ["a"] and uncovered == {"ghost"}


def test_never_gated_rows_count_toward_coverage():
    # the never-gated query carries family y, so no swap is needed —
    # the drain keeps the two oldest even though neither carries y
    req = frozenset({"y"})
    specs = [Spec("a", ()), Spec("b", ()), Spec("new_y", ("y",))]
    rows = [row("a", 1), row("b", 2), row("new_y", None)]
    window, never, uncovered = propose_window(specs, rows, 3, req)
    assert set(names(window)) == {"a", "b"}
    assert names(never) == ["new_y"]
    assert uncovered == frozenset()


def test_code_touched_breaks_age_ties_first():
    specs = [Spec("a", ()), Spec("b", ())]
    rows = [row("a", 5, touched=False), row("b", 5, touched=True)]
    window, _, _ = propose_window(specs, rows, 1, frozenset())
    # same age: the code-touched row is the staler verification and
    # drains first
    assert names(window) == ["b"]


def test_current_registry_proposal_covers_all_families():
    """Integration: on the real registry + real correctness history,
    the proposal must cover every REQUIRED_TAGS family (this is the
    invariant the committed GATE_PRIORITY is built from)."""
    import gate_coverage as gc
    from bigdata_elephant_spark.registry import (
        REQUIRED_TAGS,
        all_specs,
    )

    specs = all_specs()
    gated = gc._last_gated()
    rows = [
        {
            "name": s.name,
            "last_gated_round": gated.get(s.name),
            "code_touched_since_gate": False,
            "oracled": True,
        }
        for s in specs
    ]
    window, never, uncovered = propose_window(
        specs, rows, 50, REQUIRED_TAGS
    )
    assert len(window) + len(never) == 50
    assert uncovered == frozenset()


def test_committed_window_respects_age_bound():
    """r14 ADVICE: displaced queries' next-round drain was enforced
    only by a registry comment. Generalized pin: simulate the NEXT
    round's view (the committed 50-entry window counts as gated this
    round) and assert no oracled query's age exceeds the 6-round
    bound — exactly `tools/gate_coverage.py --assume-gated
    --max-age 6` exiting 0, so a future window edit that silently
    orphans a query past the bound fails here, not at the driver."""
    import gate_coverage as gc
    from bigdata_elephant_spark.registry import all_specs

    specs = all_specs()
    gated = gc._last_gated()
    cur_round = max(gated.values(), default=0) + 1
    worst = 0
    for pos, s in enumerate(specs):
        if s.oracle is None:
            continue
        last = cur_round if pos < 50 else gated.get(s.name, 0)
        if last == 0:
            # never gated and outside the window: unbounded age
            worst = max(worst, 7)
            continue
        worst = max(worst, cur_round + 1 - last)
    assert worst <= 6, (
        f"committed window leaves an oracled query {worst} rounds "
        "ungated at the next round's view"
    )


def _simulate_drain(n_queries, slots, production, horizon):
    """Round-by-round drain simulation (r13 verdict item 4): a
    registry of ``n_queries`` oracled queries, a ``slots``-slot
    window, and ``production`` must-gate slots consumed each round
    by freshly-changed queries. Must-gates are chosen ADVERSARIALLY
    as the just-gated youngest rows (pure slot waste — a changed
    query that was already fresh), so the drain sees only
    ``slots - production`` useful slots. Returns the worst
    (next-round view) age observed across the horizon."""
    last = {f"q{i}": 1 + (i % 6) for i in range(n_queries)}
    specs = [Spec(n, ()) for n in last]
    worst = 0
    for rnd in range(7, 7 + horizon):
        by_age = sorted(last, key=lambda n: (-last[n], n))
        changed = by_age[:production]  # youngest = most wasteful
        rows = [
            row(n, last[n]) for n in last if n not in changed
        ]
        window, never, _ = propose_window(
            specs, rows, slots - production, frozenset()
        )
        assert never == []
        for n in names(window) + changed:
            last[n] = rnd
        worst = max(worst, rnd + 1 - min(last.values()))
    return worst


def test_drain_cycle_sustains_max_age_6():
    """The steady-state gate-cycle arithmetic pinned as a property
    (registry.py GATE_PRIORITY comment): a 268-query registry with a
    50-slot window sustains a <=6-round revisit cycle as long as
    new-query/changed-query production stays <= 5/round — even when
    every production slot is pure waste (268 / (50-5) = 5.96 <= 6).
    This is the invariant the whole r12-r14 drain schedule was built
    on; if the registry outgrows 6 * (window - production), the
    bound breaks and the window (or production cap) must change."""
    assert _simulate_drain(268, 50, production=5, horizon=40) <= 6


def test_drain_cycle_bound_is_tight():
    """The complement: one extra production slot per round (6) sinks
    the useful drain rate below the 6-round requirement
    (268 / 44 = 6.09), so the property must FAIL — proving the <=5
    cap in the schedule comment is load-bearing, not slack."""
    assert _simulate_drain(268, 50, production=6, horizon=40) > 6
