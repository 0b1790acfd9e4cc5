"""Gate-window rotation report — choose each round's 50-query driver
window from DATA instead of prose (r9 verdict item 5).

The driver's correctness gate records only the first 50 registry
entries (``registry.GATE_PRIORITY`` pins that window). With 260+
queries and ~5-10 new per round, a full re-verification cycle is ~6
rounds, so the rotation has to be budgeted: this report shows, per
query, the last round a driver row gated it, how many rounds ago that
was, and whether the file DEFINING it changed since — the three
inputs the window choice needs.

Usage:  python tools/gate_coverage.py [--stale-only] [--max-age N]

Exit status 1 if any oracled query's age exceeds ``--max-age``
(default 6) — the "oldest-ungated query age bounded" invariant.

The bound is a STEADY-STATE invariant: 266 queries over ~45 drain
slots per round is a 5.9-round cycle, so 6 is achievable only with
disciplined rotation. The r1-r4 windows did not rotate (the backlog
the r10 verdict flagged), so a transitional drain schedule is
committed in ``registry.GATE_PRIORITY``'s comment: r11 drains the
r1+r2 cohorts plus 13 of the r3 cohort, r12 the r3 remainder plus
most of the r4 cohort, r13 the rest plus the r6 cohort — after the
r13 rotation the tool exits 0 at --max-age 6 and must stay 0. Until
then, expect exit 1 with a shrinking worst age (10 -> 9 -> 9 -> 6);
every stale query remains DuckDB-verified locally each round by
tests/test_oracle_parity.py.

The code-touched signal is per DEFINING MODULE (the plans/ file of
the query's callable), deliberately approximate: a query's operator
modules can change without its plans file changing — which is why the
registry's window comments still re-gate FAMILY REPRESENTATIVES for
operator-level refactors; this report budgets the rotation, it does
not replace judgment about what a diff touches.
"""

from __future__ import annotations

import argparse
import glob
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_commits() -> dict[int, int]:
    """round number -> unix time of the driver's round-marker commit
    (the moment that round's CORRECTNESS file was recorded)."""
    out = subprocess.run(
        ["git", "log", "--format=%ct %s"],
        capture_output=True, text=True, cwd=REPO, check=True,
    ).stdout
    rounds: dict[int, int] = {}
    for line in out.splitlines():
        m = re.match(r"(\d+) round (\d+): verdict/", line)
        if m:
            rounds.setdefault(int(m.group(2)), int(m.group(1)))
    return rounds


def _last_gated() -> dict[str, int]:
    """query name -> latest round with a GREEN driver correctness
    row. A failing row (hash/rows/schema mismatch, or a hard err)
    does NOT count as gated — counting it would rotate a defective
    query out of the window with its fix unverified. The one
    declared rows-only query (err == 'no_oracle') counts when its
    rows check passed."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            for name, row in json.load(f).items():
                err = row.get("err")
                if err == "no_oracle":
                    # rows-only check: the driver records a count iff
                    # the query ran (a crash records its exception in
                    # err instead); guard the None case so a null
                    # count reads as not-gated rather than crashing
                    n = row.get("spark_rows")
                    green = isinstance(n, int) and n >= 0
                else:
                    green = (
                        err is None
                        and row.get("rows_match")
                        and row.get("schema_match")
                        and row.get("hash_match")
                    )
                if green:
                    last[name] = max(last.get(name, 0), rnd)
    return last


def _file_mtime_git(path: str) -> int:
    """Last commit time touching ``path`` (0 if untracked)."""
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--", path],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.strip()
    return int(out) if out else 0


def propose_window(specs, rows, n_slots: int, required_tags=None):
    """Propose the next rotation mechanically: the ``n_slots``
    oldest-gated oracled queries, then repair ``required_tags``
    family coverage by swapping the youngest removable members for
    the oldest carrier of each missing family. Returns
    ``(window, never, uncovered)`` — ``never`` rows (never-gated
    oracled queries; new queries gate the round they ship) are
    MANDATORY members on top of ``window``'s drain slots. The result
    is a STARTING POINT — the operator still owes slots to queries
    shipping or changing this round (which this tool cannot know);
    every slot spent on those should come out of the youngest
    proposed drains. Pure function of its inputs (no git/registry
    access) so tests/test_gate_plan.py can pin the swap algorithm."""
    if required_tags is None:
        from bigdata_elephant_spark.registry import REQUIRED_TAGS
        required_tags = REQUIRED_TAGS

    tags_of = {s.name: set(s.tags) for s in specs}
    cand = [r for r in rows if r["oracled"]]
    never = [r for r in cand if r["last_gated_round"] is None]
    aged = [r for r in cand if r["last_gated_round"] is not None]
    drain_slots = max(0, n_slots - len(never))

    def _age_key(r):
        return (
            r["last_gated_round"] or 0,
            not r["code_touched_since_gate"],
            r["name"],
        )

    aged.sort(key=_age_key)
    window = aged[:drain_slots]
    rest = aged[drain_slots:]

    def covered(win):
        got = set()
        for r in win + never:
            got |= tags_of[r["name"]]
        return got

    missing = required_tags - covered(window)
    for tag in sorted(missing):
        # keep rest age-ordered: evictions below append to its tail,
        # which would otherwise let a later family pick a younger
        # carrier than the just-evicted member (r11 ADVICE)
        rest.sort(key=_age_key)
        carrier = next(
            (r for r in rest if tag in tags_of[r["name"]]), None
        )
        if carrier is None:
            continue
        # evict the youngest member whose required tags stay covered
        # by the remainder + carrier: each swap adds the missing
        # family and provably loses none, so the loop converges on
        # full coverage whenever the candidate set allows it
        for i in range(len(window) - 1, -1, -1):
            others = window[:i] + window[i + 1:] + [carrier]
            if (tags_of[window[i]["name"]] & required_tags) <= covered(
                others
            ):
                rest.append(window.pop(i))
                window.append(carrier)
                rest.remove(carrier)
                break
    window.sort(key=lambda r: (r["last_gated_round"] or 0, r["name"]))
    uncovered = required_tags - covered(window)
    return window, never, uncovered


def _print_plan(specs, rows, n_slots: int) -> int:
    from bigdata_elephant_spark.registry import REQUIRED_TAGS

    tags_of = {s.name: set(s.tags) for s in specs}
    window, never, uncovered = propose_window(
        specs, rows, n_slots, REQUIRED_TAGS
    )
    drain_slots = max(0, n_slots - len(never))
    print(f"# proposed next {n_slots}-slot window "
          f"(oldest-first drain, families repaired)")
    if never:
        print(f"# {len(never)} never-gated queries take mandatory "
              f"slots first:")
        for r in never:
            fams = ",".join(sorted(tags_of[r["name"]] & REQUIRED_TAGS))
            print(f'    "{r["name"]}",  # never gated'
                  f"{' [' + fams + ']' if fams else ''}")
        print(f"# then the {drain_slots}-slot age-ranked drain:")
    for r in window:
        fams = ",".join(sorted(tags_of[r["name"]] & REQUIRED_TAGS))
        print(f'    "{r["name"]}",  # gated r{r["last_gated_round"]}'
              f"{' [' + fams + ']' if fams else ''}")
    # `uncovered` already accounts for the mandatory never-gated rows
    # inside propose_window — one source of truth (r12 ADVICE: the
    # old `window = window + never` reassignment double-counted them)
    print(f"# families uncovered by proposal: "
          f"{sorted(uncovered) or 'none'}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stale-only", action="store_true",
                    help="only rows needing attention")
    ap.add_argument("--max-age", type=int, default=6,
                    help="max rounds-since-gated before exit 1")
    ap.add_argument("--plan", type=int, nargs="?", const=50,
                    default=None, metavar="N",
                    help="propose the next N-slot drain window "
                         "(oldest-first, family-coverage repaired) "
                         "instead of the report")
    ap.add_argument("--assume-gated", action="store_true",
                    help="simulate the NEXT round's view: treat the "
                         "committed 50-entry window as gated this "
                         "round, then report ages as the round after "
                         "will see them — the mechanical check that "
                         "a composed window actually reaches the "
                         "age bound before the driver runs it")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from bigdata_elephant_spark.registry import all_specs

    specs = all_specs()
    gated = _last_gated()
    rounds = _round_commits()
    cur_round = max(gated.values(), default=0) + 1

    mtime_cache: dict[str, int] = {}
    rows = []
    for pos, s in enumerate(specs):
        mod = inspect.getmodule(s.fn)
        mod_file = os.path.relpath(
            inspect.getsourcefile(s.fn) or "?", REPO
        )
        del mod
        if mod_file not in mtime_cache:
            mtime_cache[mod_file] = _file_mtime_git(mod_file)
        last = gated.get(s.name, 0)
        age = cur_round - last if last else None  # None = never gated
        gate_time = rounds.get(last, 0)
        touched = mtime_cache[mod_file] > gate_time if last else True
        rows.append({
            "name": s.name,
            "pos": pos,
            "in_window": pos < 50,
            "oracled": s.oracle is not None,
            "last_gated_round": last or None,
            "rounds_since": age,
            "module": mod_file,
            "code_touched_since_gate": touched,
        })

    if args.assume_gated:
        # the what-if view: the committed window gates at cur_round,
        # and we report from (cur_round + 1) exactly as this tool
        # will compute it once CORRECTNESS_r{cur_round} lands
        for r in rows:
            if r["in_window"]:
                r["last_gated_round"] = cur_round
                r["code_touched_since_gate"] = False
        cur_round += 1
        for r in rows:
            if r["last_gated_round"] is not None:
                r["rounds_since"] = cur_round - r["last_gated_round"]

    def _key(r):
        return (
            r["last_gated_round"] or 0,
            not r["code_touched_since_gate"],
            r["name"],
        )

    rows.sort(key=_key)

    if args.plan is not None:
        return _print_plan(specs, rows, args.plan)
    # the age-bound invariant: a never-gated oracled query OUTSIDE
    # the current window is an unbounded-age violation (a new query
    # inside the window is the expected state before the driver's
    # next run); "exceeds" is strict (> max_age), matching the
    # docstring.
    worst_age = 0
    for r in rows:
        if not r["oracled"]:
            continue
        if r["rounds_since"] is None and not r["in_window"]:
            worst_age = max(worst_age, args.max_age + 1)
    print(f"# gate coverage at round {cur_round} "
          f"({len(rows)} queries, window=50)")
    print(f"{'query':34} {'gated':>5} {'age':>4} {'win':>3} "
          f"{'touched':>7}  module")
    for r in rows:
        if r["oracled"] and r["rounds_since"] is not None:
            worst_age = max(worst_age, r["rounds_since"])
        stale = (
            r["last_gated_round"] is None
            or r["code_touched_since_gate"]
            or (r["rounds_since"] or 0) >= args.max_age
        )
        if args.stale_only and not stale:
            continue
        print(
            f"{r['name']:34} {str(r['last_gated_round'] or '-'):>5} "
            f"{str(r['rounds_since'] if r['rounds_since'] is not None else '-'):>4} "
            f"{'*' if r['in_window'] else ' ':>3} "
            f"{'Y' if r['code_touched_since_gate'] else '':>7}  "
            f"{r['module']}"
        )
    never = [r["name"] for r in rows if r["last_gated_round"] is None]
    print(f"\nnever gated: {len(never)} {never[:10]}")
    print(f"worst oracled age: {worst_age} rounds (max {args.max_age})")
    return 1 if worst_age > args.max_age else 0


if __name__ == "__main__":
    sys.exit(main())
