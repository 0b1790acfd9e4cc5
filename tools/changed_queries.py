#!/usr/bin/env python
"""Compute the MUST-GATE set mechanically: which registry queries'
definition changed vs a base git rev (default: the current round's
start — the newest ``round N: verdict/...`` marker commit).

The repo rule is "changed queries gate the round they ship", and a
query counts as changed when its *definition* differs: the query fn's
source (``inspect.getsource``) or its resolved DuckDB oracle SQL.
Round 12 computed this by hand (git worktree + import the registry
twice) for the 37-query zero-norm contract sweep; this tool is that
procedure, repeatable:

    python tools/changed_queries.py            # vs round start
    python tools/changed_queries.py --rev HEAD~3

Prints changed/added/removed query names, each flagged with whether it
already holds a slot in the current GATE_PRIORITY window. Exit 1 if
any changed/added query is NOT in the window (the gate debt the rule
forbids), 0 otherwise.

Caveat (by construction, same as the r12 manual procedure): fn-source
diffing sees the registry fn only, not transitive helpers — a helper
rewrite that reshapes a plan without touching fn source or oracle SQL
is invisible here. For those, regenerate PLANS.md and diff the
per-query summaries order-independently (the r13 procedure for
proving plan-neutrality of refactors).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# runs inside a `python - <<dump>` subprocess with cwd = the tree to
# fingerprint; emits {name: {"fn": sha, "oracle": sha|null}} on stdout
_DUMP = r"""
import hashlib, inspect, json, sys
sys.path.insert(0, ".")
from bigdata_elephant_spark.registry import all_specs
try:
    from bigdata_elephant_spark.registry import resolve_oracle
except ImportError:
    # pre-r6 registries have no lazy-oracle resolver; oracles were
    # plain strings (or early callables) on the spec
    def resolve_oracle(s):
        o = s.oracle
        return o() if callable(o) else o

def sha(s):
    return hashlib.sha256(s.encode()).hexdigest()[:16]

out = {}
for s in all_specs():
    try:
        src = inspect.getsource(s.fn)
    except OSError:
        # address-free fallback: repr() embeds the function's memory
        # address, which differs between the two fingerprint
        # subprocesses and would report the query as changed forever
        src = f"{s.fn.__module__}.{getattr(s.fn, '__qualname__', s.fn)}"
    sql = resolve_oracle(s)
    out[s.name] = {
        "fn": sha(src),
        "oracle": sha(sql) if sql is not None else None,
    }
print(json.dumps(out))
"""


def _round_start_rev() -> str:
    out = subprocess.run(
        ["git", "log", "--format=%H %s"],
        capture_output=True, text=True, cwd=REPO, check=True,
    ).stdout
    for line in out.splitlines():
        if re.match(r"\w+ round \d+: verdict/", line):
            return line.split()[0]
    return "HEAD"


def _fingerprints(tree: str) -> dict:
    env = dict(os.environ, PYTHONPATH=tree)
    res = subprocess.run(
        [sys.executable, "-"], input=_DUMP, capture_output=True,
        text=True, cwd=tree, env=env,
    )
    if res.returncode != 0:
        raise RuntimeError(
            f"fingerprint import failed in {tree}:\n{res.stderr[-2000:]}"
        )
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--rev", default=None,
        help="base rev (default: newest 'round N: verdict/' commit)",
    )
    args = ap.parse_args()
    rev = args.rev or _round_start_rev()

    cur = _fingerprints(REPO)
    with tempfile.TemporaryDirectory() as tmp:
        wt = os.path.join(tmp, "base")
        subprocess.run(
            ["git", "worktree", "add", "--detach", "-f", wt, rev],
            cwd=REPO, check=True, capture_output=True,
        )
        try:
            base = _fingerprints(wt)
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, capture_output=True,
            )

    sys.path.insert(0, REPO)
    from bigdata_elephant_spark.registry import GATE_PRIORITY

    win = set(GATE_PRIORITY)
    changed = sorted(
        n for n in cur
        if n in base and cur[n] != base[n]
    )
    added = sorted(n for n in cur if n not in base)
    removed = sorted(n for n in base if n not in cur)

    short = rev[:12]
    print(f"# definition diff vs {short} "
          f"({len(changed)} changed, {len(added)} added, "
          f"{len(removed)} removed)")
    debt = []
    for label, names in (("changed", changed), ("added", added)):
        for n in names:
            inwin = n in win
            if not inwin:
                debt.append(n)
            what = ""
            if label == "changed":
                parts = [
                    k for k in ("fn", "oracle")
                    if cur[n][k] != base[n][k]
                ]
                what = f" [{'+'.join(parts)}]"
            print(f"  {label}: {n}{what}"
                  f"{' (in window)' if inwin else ' ** NOT IN WINDOW **'}")
    for n in removed:
        print(f"  removed: {n}")
    if debt:
        print(f"# {len(debt)} changed/added queries lack a window "
              f"slot — the gate rule requires them this round")
        return 1
    print("# every changed/added query holds a window slot")
    return 0


if __name__ == "__main__":
    sys.exit(main())
