"""Measured A/B of the LSH mega-bucket guard on a SKEWED corpus —
text side AND embedding side.

tests/test_skewed_corpus.py pins the asymptotics as exact COUNTS
(399 star edges vs 79,800 all-pairs rows on a 400-copy cluster);
this tool adds the wall-clock evidence at a configurable cluster
size, because the quadratic term is invisible on the uniform
driver testdata and the sf1 spot-check's salted copies.

The embedding section (r10 verdict item 6) plants a bit-identical
vector cluster — what exact-duplicate documents produce — and runs
the same A/B through SemDeDup's within-cell pairing
(``semantic_dedup_pairs`` vs ``semantic_dedup_edges``): rows, wall,
and component equality, matching the text-side evidence standard.

Usage: python tools/lsh_skew_ab.py [copies] [n_unique]
       (default 3000 copies — all-pairs materializes ~4.5M candidate
       rows from ONE bucket per band; star emits 2,999 edges)

Prints one line per miner: rows emitted + wall seconds, then the
groups-equality check (both graphs must close to identical
components — the correctness half of the claim).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from pyspark.sql import functions as F

from bigdata_elephant_spark.operators import dedup
from bigdata_elephant_spark.session import get_spark, release_caches

COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
N_UNIQUE = int(sys.argv[2]) if len(sys.argv) > 2 else 200

DUP_TEXT = (
    "breaking news wire syndicated boilerplate copyright notice all "
    "rights reserved subscribe to our newsletter for daily updates"
)


def _word(i: int) -> str:
    return (
        "w" + "abcdefghij"[i % 10] + "klmnopqrst"[(i // 10) % 10]
        + "uvwxy"[(i // 100) % 5]
    )


def main() -> None:
    spark = get_spark("lsh-skew-ab", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    rows = [(i, DUP_TEXT) for i in range(COPIES)]
    for i in range(N_UNIQUE):
        rows.append(
            (10_000_000 + i,
             "document " + " ".join(_word(7 * i + j) for j in range(12)))
        )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(32)
    sigs = dedup.minhash_signatures(docs).localCheckpoint()

    results = {}
    for name, fn in (
        ("all_pairs", dedup.lsh_candidate_pairs),
        ("star_edges", dedup.lsh_candidate_edges),
    ):
        release_caches()
        t0 = time.time()
        n = fn(sigs).count()
        dt = time.time() - t0
        results[name] = (n, dt)
        print(f"{name:11} rows={n:>10,}  wall={dt:6.2f}s "
              f"(cluster={COPIES:,}, unique={N_UNIQUE})")

    g_star = {
        (r.doc_id, r.group_id)
        for r in dedup.duplicate_groups(
            dedup.lsh_candidate_edges(sigs).filter(
                F.col("est_sim") >= 0.5
            )
        ).collect()
    }
    g_pairs = {
        (r.doc_id, r.group_id)
        for r in dedup.duplicate_groups(
            dedup.lsh_candidate_pairs(sigs).filter(
                F.col("est_sim") >= 0.5
            )
        ).collect()
    }
    assert g_star == g_pairs, "component mismatch — guard is WRONG"
    print(f"groups identical: {len(g_star):,} membership rows; "
          f"all-pairs/star row ratio = "
          f"{results['all_pairs'][0] / results['star_edges'][0]:,.0f}x")

    emb_ab(spark)


def emb_ab(spark) -> None:
    """Embedding-space twin: COPIES bit-identical vectors through
    SemDeDup cell pairing, pairs vs star-collapsed edges."""
    import math

    from bigdata_elephant_spark.operators import similarity

    dim, thr, n_cells = 16, 0.9, 8
    hot = [1.0] * dim
    rows = [(i, hot) for i in range(COPIES)]
    for i in range(N_UNIQUE):
        rows.append(
            (10_000_000 + i,
             [math.sin(0.7 * i + j) for j in range(dim)])
        )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(32).localCheckpoint()

    results = {}
    for name, fn in (
        ("sem_pairs", similarity.semantic_dedup_pairs),
        ("sem_edges", similarity.semantic_dedup_edges),
    ):
        release_caches()
        t0 = time.time()
        n = fn(emb, thr, n_cells=n_cells).count()
        dt = time.time() - t0
        results[name] = (n, dt)
        print(f"{name:11} rows={n:>10,}  wall={dt:6.2f}s "
              f"(cluster={COPIES:,}, unique={N_UNIQUE})")

    def comps(df):
        return {
            (r.doc_id, r.group_id)
            for r in dedup.duplicate_groups(
                df.select("id_a", "id_b"), "id_a", "id_b"
            ).collect()
        }

    c_edges = comps(similarity.semantic_dedup_edges(
        emb, thr, n_cells=n_cells))
    c_pairs = comps(similarity.semantic_dedup_pairs(
        emb, thr, n_cells=n_cells))
    assert c_edges == c_pairs, "component mismatch — guard is WRONG"
    print(f"emb groups identical: {len(c_edges):,} membership rows; "
          f"pairs/edges row ratio = "
          f"{results['sem_pairs'][0] / results['sem_edges'][0]:,.0f}x")


if __name__ == "__main__":
    main()
