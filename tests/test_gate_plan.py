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
