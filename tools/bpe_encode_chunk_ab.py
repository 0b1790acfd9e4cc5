#!/usr/bin/env python
"""A/B the chunked bpe_encode rule folding at production-ish rule
counts.

The trainer got its batching in r8; the ENCODER folds each merge
rule as one nested higher-order expression, so a 32k-rule production
vocabulary would stack a 32k-deep expression tree — Catalyst
analysis/codegen breaks (or crawls) long before data size matters.
bpe_encode now folds at most BPE_ENCODE_FOLD_CHUNK (64) rules per
expression tree and localCheckpoints between segments.

This script measures, at --rules synthetic rules over the sf
documents table:
  - monolithic (chunk >= rules): one expression tree
  - chunked   (chunk = 64):      segmented folds

Both paths produce identical output (pinned by
tests/test_bpe.py::test_encode_chunked_equals_monolithic); this
measures analysis + execution wall time, with a per-variant timeout.

Usage: python tools/bpe_encode_chunk_ab.py [--rules 1000]
       [--sf-dir /root/testdata/sf0.01] [--docs 200]

Measured 2026-08-15 (1000 rules, 200 sf0.01 docs, local[8]):
  chunked_64:  analyze 67.2s (includes the 15 eager segment jobs),
               exec 0.65s, 10455 rows
  monolithic:  StackOverflowError in analysis (DeduplicateRelations)
               after 122.8s — a 1000-Project stack never reaches
               execution
Two earlier variants measured worse and shaped the current design:
  - folding rules NESTED into one Column: the ColumnNode->Expression
    conversion walks ~5^n paths (_merge_fold references its input
    5x) — OOM at depth 64;
  - folding over token OCCURRENCES instead of distinct words:
    every rule pass costs corpus size — minutes at sf0.01, hence the
    dictionary-encode join-back shape;
  - lazy segment checkpoints: all segments pend until the consumer
    runs, then compute inside ONE task — ~16 x 64 interpreted
    higher-order Projects overflow the task stack, hence eager.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_rules(n: int) -> list[tuple[str, str, str]]:
    """Deterministic well-formed merge rules: all 2-char merges of
    [a-z] (676), then 3-char extensions until n."""
    rules = []
    for c1, c2 in itertools.product(string.ascii_lowercase, repeat=2):
        rules.append((c1, c2, c1 + c2))
        if len(rules) >= n:
            return rules
    for (c1, c2), c3 in itertools.product(
        itertools.product(string.ascii_lowercase, repeat=2),
        string.ascii_lowercase,
    ):
        rules.append((c1 + c2, c3, c1 + c2 + c3))
        if len(rules) >= n:
            return rules
    return rules


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rules", type=int, default=1000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--docs", type=int, default=200)
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()

    from bigdata_elephant_spark.operators.bpe import bpe_encode
    from bigdata_elephant_spark.session import get_spark

    spark = get_spark("bpe-encode-ab", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(args.docs)
    )
    rules = synth_rules(args.rules)
    out = {"rules": len(rules), "docs": args.docs}

    for label, chunk in (("chunked_64", 64), ("monolithic", len(rules))):
        t0 = time.perf_counter()
        try:
            df = bpe_encode(docs, rules, chunk=chunk)
            _ = df.schema  # analysis
            t_analyze = time.perf_counter() - t0
            t1 = time.perf_counter()
            n = df.count()
            t_exec = time.perf_counter() - t1
            out[label] = {
                "analyze_sec": round(t_analyze, 2),
                "exec_sec": round(t_exec, 2),
                "rows": n,
            }
        except Exception as ex:  # noqa: BLE001 — the failure IS the result
            out[label] = {
                "failed": f"{type(ex).__name__}: {str(ex)[:200]}",
                "after_sec": round(time.perf_counter() - t0, 2),
            }
        print(f"  {label}: {out[label]}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
