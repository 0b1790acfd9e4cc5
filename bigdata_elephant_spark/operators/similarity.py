"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k: one scan, the dot
  product and norms computed with higher-order array functions
  (``zip_with`` + ``aggregate``, JVM-side, left-fold order — which
  keeps results bit-identical across engines), then
  ``TakeOrderedAndProject``. O(n·d) per query; the correct baseline
  and the verifier for approximate variants.
- :func:`lsh_bucket_assignments` / :func:`cosine_topk_lsh` — the
  scale path: random-hyperplane LSH. Each vector gets a small integer
  bucket from the sign pattern of dot products with fixed
  pseudo-random hyperplanes (derived from seeded PRNG driver-side, so
  any engine can replay them). A query probes only its own bucket —
  at 100 TB with the table *partitioned by bucket*, that is partition
  pruning: only 1/2^planes of the data is scanned. Recall is tunable
  by multi-probing neighboring buckets.

All floats are cast to double before any arithmetic (float32 ->
float64 is exact) so cross-engine comparison is deterministic.
"""

from __future__ import annotations

import math
import random
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity with deterministic fold order."""
    return _dot(a, b) / (F.sqrt(_norm2(a)) * F.sqrt(_norm2(b)))


# Vector-validity classes, most-broken-first (first match wins).
# Every similarity operator in this module assumes finite floats —
# the norm>0 filter contract (r12) drops zero vectors, but NaN/Inf
# sail through it (NaN > 0 is TRUE under Spark's NaN-greatest
# ordering) and silently poison cosine ranks. This is the ingest
# gate that makes the "finite floats only" contract enforceable
# instead of assumed (r12 verdict item 4).
EMB_VALIDITY_CLASSES = ("null", "wrong_dim", "nonfinite", "zero", "ok")


def embedding_validity(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    expected_dim: int | None = None,
) -> DataFrame:
    """Adds a ``validity`` column classifying each vector:

    - ``null``: the vector column itself is NULL;
    - ``wrong_dim``: ``expected_dim`` given and ``size != expected``
      (skipped when ``expected_dim`` is None);
    - ``nonfinite``: any element is NULL, NaN or ±Inf — the class the
      norm>0 filter contract CANNOT catch (NaN norms pass ``> 0``
      under Spark's NaN-greatest comparison semantics);
    - ``zero``: every element is exactly 0 (norm 0 — undefined
      cosine; the class the norm>0 filters drop). The empty vector
      lands here too when no ``expected_dim`` flags it first;
    - ``ok``: a finite, nonzero vector — in contract for every
      operator in this module.

    Pure column expressions (one ``exists`` pass per predicate, no
    shuffle, no UDF): at 100 TB this pipelines into the ingest scan
    and costs nothing beyond the element sweep. Element predicates
    test NULL first, so the ``exists`` lambda never returns NULL.
    """
    vec = F.col(vec_col)
    nonfinite = F.exists(
        vec,
        lambda x: x.isNull()
        | F.isnan(x.cast("double"))
        | (F.abs(x.cast("double")) == F.lit(float("inf"))),
    )
    validity = F.when(vec.isNull(), F.lit("null"))
    if expected_dim is not None:
        validity = validity.when(
            F.size(vec) != F.lit(int(expected_dim)), F.lit("wrong_dim")
        )
    validity = (
        validity.when(nonfinite, F.lit("nonfinite"))
        .when(~F.exists(vec, lambda x: x != F.lit(0.0)), F.lit("zero"))
        .otherwise(F.lit("ok"))
    )
    return embeddings.withColumn("validity", validity)


def quarantine_embeddings(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    expected_dim: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split on :func:`embedding_validity`:
    ``(clean, quarantined)``. ``clean`` drops the helper column and
    carries only in-contract vectors (finite, nonzero, right-sized)
    — safe input for every operator in this module. ``quarantined``
    keeps the ``validity`` column as the dead-letter reason, the
    same lane shape as the CSV bad-record sink in ``sources/``."""
    classified = embedding_validity(embeddings, vec_col, expected_dim)
    clean = classified.filter(F.col("validity") == "ok").drop("validity")
    quarantined = classified.filter(F.col("validity") != "ok")
    return clean, quarantined


def _exact_rerank(
    candidates: DataFrame,
    q: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Shared exact-cosine tail used by every top-k variant: compute
    each candidate's norm, broadcast-cross the one-row query frame
    (``_qvec``, ``_qnrm``), round the cosine to 6 decimals, order
    desc with the id tie-break, limit k (TakeOrderedAndProject).
    One definition so the scoring/rounding/tie-break contract cannot
    drift between the retrieval paths.

    Zero-norm vectors are dropped on BOTH sides before the division
    (the :func:`mmr_topk` contract, applied engine-wide in r12): a
    zero-norm vector has no cosine — unrankable — and under ANSI
    mode the division would RAISE rather than null out; one dead-doc
    embedding must not abort a corpus-scale retrieval. A zero-norm
    query yields the empty result, not an error; the oracles carry
    the same norm>0 predicate."""
    return (
        candidates.select(
            id_col, vec_col, F.sqrt(_norm2(F.col(vec_col))).alias("_nrm")
        )
        .filter(F.col("_nrm") > 0)
        .crossJoin(F.broadcast(q.filter(F.col("_qnrm") > 0)))
        .select(
            id_col,
            F.round(
                _dot(F.col(vec_col), F.col("_qvec"))
                / (F.col("_nrm") * F.col("_qnrm")),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _query_frame(
    embeddings: DataFrame,
    query_vec_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row broadcastable ``(_qvec, _qnrm)`` frame for a stored
    query vector."""
    return embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qvec"),
        F.sqrt(_norm2(F.col(vec_col))).alias("_qnrm"),
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors of ``query_vec_id`` by cosine.

    The single query row is broadcast (a 1-row cross join); Spark
    plans the sort+limit as TakeOrderedAndProject — per-partition
    heaps, no global sort shuffle.
    """
    q = _query_frame(embeddings, query_vec_id, id_col, vec_col)
    return _exact_rerank(
        embeddings.filter(F.col(id_col) != query_vec_id),
        q, k, id_col, vec_col,
    )


def mmr_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 5,
    lam: float = 0.5,
    shortlist: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein, SIGIR'98): greedily pick the candidate maximizing
    ``λ·rel − (1−λ)·max_{s∈selected} sim(c, s)`` — the standard
    answer to near-duplicate-saturated neighbor lists in retrieval
    and training-data curation (a plain top-k returns ten copies of
    the same document; MMR trades relevance for coverage).

    Two stages, scale-split like every reranker: (1) the DISTRIBUTED
    part — one exact relevance scan for the top-``shortlist``
    candidates (rounded cosine, id tie-break,
    ``TakeOrderedAndProject``) — is the only corpus-scale work; (2)
    the greedy selection runs on the collected shortlist (≤
    ``shortlist`` rows + a ``shortlist²`` pair-similarity table —
    the FAISS/reranker window, index-metadata scale like probe-cell
    collection, NOT a corpus collect). Pair similarities are
    computed JVM-side with the same fold order as every other cosine
    here, so the greedy transcript is engine-replayable: selection
    compares unrounded doubles derived from rounded-to-6 inputs by
    identical IEEE ops (one multiply each, a subtract, a max over
    the same set), ties broken by id; only the output rounds.
    Returns ``(rank, id, mmr_score)``; ``mmr_score`` of the first
    pick is ``λ·rel`` (empty-selection penalty = 0). ``lam=1``
    degenerates to plain relevance top-k (unit-tested)."""
    spark = embeddings.sparkSession
    q = _query_frame(embeddings, query_vec_id, id_col, vec_col)
    cand = (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .select(
            id_col,
            vec_col,
            F.sqrt(_norm2(F.col(vec_col))).alias("_nrm"),
        )
        # a zero-norm (or null) vector has no cosine — unrankable,
        # and under ANSI mode the division would RAISE rather than
        # null out; guard both sides of the divisor before dividing
        # (a zero-norm query yields the empty result, not an error)
        .filter(F.col("_nrm") > 0)
        .crossJoin(F.broadcast(q.filter(F.col("_qnrm") > 0)))
        .select(
            id_col,
            vec_col,
            F.round(
                _dot(F.col(vec_col), F.col("_qvec"))
                / (F.col("_nrm") * F.col("_qnrm")),
                6,
            ).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc(id_col))
        .limit(shortlist)
    )
    rows = cand.collect()  # shortlist-sized: the reranker window
    schema = f"rank long, {id_col} long, mmr_score double"
    if not rows:
        return spark.createDataFrame([], schema)
    # pair similarities over the collected window — a tiny local
    # relation, but scored JVM-side so the fold order (and therefore
    # every bit of the greedy transcript) matches the corpus scan's.
    # repartition(1) is load-bearing: without the exchange, Catalyst
    # constant-folds the Project over the LocalRelation at OPTIMIZER
    # time — interpreted, per-row, no codegen — and the shortlist²
    # higher-order cosine expressions take seconds instead of ms
    cdf = spark.createDataFrame(rows, cand.schema).repartition(1)
    sims = {
        (r["ia"], r["ib"]): r["s"]
        for r in (
            cdf.select(
                F.col(id_col).alias("ia"), F.col(vec_col).alias("va")
            )
            .crossJoin(
                cdf.select(
                    F.col(id_col).alias("ib"),
                    F.col(vec_col).alias("vb"),
                )
            )
            .filter(F.col("ia") != F.col("ib"))
            .select(
                "ia",
                "ib",
                F.round(
                    cosine_expr(F.col("va"), F.col("vb")), 6
                ).alias("s"),
            )
            .collect()
        )
    }
    rel = {r[id_col]: r["rel"] for r in rows}
    oml = 1.0 - lam
    chosen: list = []
    selected: list[tuple[int, int, float]] = []
    remaining = sorted(rel)  # id asc: first strict max wins ties
    for rank in range(1, min(k, len(rel)) + 1):
        best = None
        for vid in remaining:
            if chosen:
                score = lam * rel[vid] - oml * max(
                    sims[(vid, s)] for s in chosen
                )
            else:
                score = lam * rel[vid]
            if best is None or score > best[1]:
                best = (vid, score)
        vid, score = best
        selected.append((rank, vid, score))
        chosen.append(vid)
        remaining.remove(vid)
    return (
        spark.createDataFrame(selected, schema)
        # output rounding JVM-side: Spark round is HALF_UP (ties away
        # from zero), same as the oracle engine's round — Python's
        # round() is half-even and must not touch these values
        .select(
            "rank", id_col, F.round("mmr_score", 6).alias("mmr_score")
        )
        .orderBy("rank")
    )


def hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Fixed pseudo-random hyperplanes (reproducible in any engine)."""
    rng = random.Random(seed)
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)]
        for _ in range(n_planes)
    ]


def bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id of ``vec`` against ``planes``."""
    bucket = F.lit(0)
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in p])
        bucket = bucket + F.when(
            _dot(vec, plane) > 0, F.lit(2**j)
        ).otherwise(F.lit(0))
    return bucket.cast("long")


def lsh_bucket_assignments(
    embeddings: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, bucket)`` assignment — the write-side of the index."""
    return embeddings.select(
        id_col, bucket_expr(F.col(vec_col), planes).alias("bucket")
    )


def near_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    planes: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ``(id_a, id_b, cos_sim)``.

    With ``planes`` (the scale path) candidates are restricted to
    vectors sharing an LSH bucket: an equi-join on the bucket id — a
    co-locating shuffle join whose per-bucket work is quadratic only
    in the bucket size (2^planes buckets cut pairs ~4^planes-fold).
    Without ``planes`` every pair is scored (exact; a nested-loop
    join) — the verifier for the bucketed variant, viable only at
    small n.

    Mega-cluster exposure: bit-identical embeddings share a bucket,
    so a 10^6-copy exact-dup cluster emits O(cluster²) rows from
    one bucket key — the same hazard as the text side's
    lsh_candidate_pairs. On corpora that may contain exact
    duplicates, pre-collapse identical vectors first (the window-min
    pattern in :func:`semantic_dedup_edges`) or run downstream of
    ``exact_dedup_map`` representatives; this function stays the
    pair-level report API.

    Zero-norm vectors are EXCLUDED before the pair fan-out (the
    engine-wide filter contract, r12): their cosine is undefined
    against everything, so they can never clear any threshold — and
    under ANSI mode the unguarded division would abort the whole
    dedup job on one dead-doc/encoder-failure embedding. The oracles
    carry the same norm>0 predicate.
    """
    # Per-vector norms are computed ONCE before the pair fan-out (the
    # value is identical to an inline recompute — same left fold — so
    # oracles are unaffected); per pair only the dot product remains.
    base = embeddings.select(
        id_col, vec_col, F.sqrt(_norm2(F.col(vec_col))).alias("_nrm")
    ).filter(F.col("_nrm") > 0)
    if planes is not None:
        base = lsh_bucket_assignments(embeddings, planes, id_col, vec_col).join(
            base, id_col
        )
    a = base.select(
        *[F.col(c).alias(f"{c}_a") for c in base.columns]
    )
    b = base.select(
        *[F.col(c).alias(f"{c}_b") for c in base.columns]
    )
    cond = F.col(f"{id_col}_a") < F.col(f"{id_col}_b")
    if planes is not None:
        pairs = a.join(b, F.col("bucket_a") == F.col("bucket_b")).filter(cond)
    else:
        pairs = a.join(b, cond)
    return (
        pairs.select(
            F.col(f"{id_col}_a").alias("id_a"),
            F.col(f"{id_col}_b").alias("id_b"),
            F.round(
                _dot(F.col(f"{vec_col}_a"), F.col(f"{vec_col}_b"))
                / (F.col("_nrm_a") * F.col("_nrm_b")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_dedup_pairs(
    embeddings: DataFrame,
    threshold: float,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al.
    2023): cluster embeddings into cells, then score cosine pairs
    only WITHIN each cell — the learned-partition counterpart of the
    random-hyperplane bucketing in :func:`near_dup_pairs`.

    Why it scales: the pair fan-out is an equi-join on ``cell_id``
    (co-locating shuffle), so quadratic work is confined to cell
    populations — with balanced cells, n^2 drops to n^2/n_cells. At
    100 TB the cell assignment is one broadcast-argmin scan
    (:func:`ivf_assign`), cells come from
    :func:`kmeans_parallel_seeds`-seeded training, and near-dups
    that land in different cells are the recall trade the paper
    accepts (they are, by construction, near a cell boundary).

    Output: ``(cell_id, id_a, id_b, cos_sim)``, id_a < id_b, one row
    per same-cell pair at/above ``threshold``. Deterministic: the
    default centroids are the lowest-id vectors (engine-replayable),
    distances and similarities round to 6 decimals. ``cents``
    overrides the centroid table (used by
    :func:`semantic_dedup_edges` so the collapsed variant scores
    against the SAME cell geometry as the full-table form).

    Mega-cluster exposure (same class as the text side's
    lsh_candidate_pairs): identical embeddings — which exact-dup
    documents produce — share a cell and score pairwise, so a
    10^6-copy cluster emits O(cluster²) rows from one cell. This is
    the pair-level verifier/report API; pipelines that only need
    components use :func:`semantic_dedup_edges`.

    Zero-norm vectors are EXCLUDED before the within-cell fan-out
    (the engine-wide filter contract, r12): cosine is undefined for
    them, so no pair they join can clear a threshold, and under ANSI
    the unguarded division would abort the job on one degenerate
    embedding. They still receive a cell assignment (L2 argmin needs
    no division) — only the pair scoring drops them; the oracles
    carry the same norm>0 predicate.
    """
    if cents is None:
        cents = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    if assigned is None:
        assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    base = (
        embeddings.join(assigned, id_col)
        .select(
            id_col,
            "cell_id",
            vec_col,
            F.sqrt(_norm2(F.col(vec_col))).alias("_nrm"),
        )
        .filter(F.col("_nrm") > 0)
    )
    a = base.select(
        F.col("cell_id"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        F.col("_nrm").alias("_na"),
    )
    b = base.select(
        F.col("cell_id"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_nrm").alias("_nb"),
    )
    return (
        a.join(b, "cell_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "cell_id",
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _identical_vector_collapse(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    materialize: bool,
) -> tuple[DataFrame, DataFrame]:
    """Shared star-collapse front of the embedding-side dedup
    miners → ``(keyed, reps)``: ``keyed`` maps every vector to its
    identical-vector representative (min id; window over the raw
    vector — float equality is bit equality on a parquet
    round-trip), except that ZERO-NORM vectors map to THEMSELVES —
    they get no star edges and flow into ``reps`` individually,
    where the pair miners' norm>0 filter drops them, so they sit
    pairless exactly as in the all-pairs form (which excludes them
    the same way — the engine-wide filter contract); star-edging two
    all-zero vectors at 1.0 would invent a group the pair API never
    produces. (NaN/Inf embeddings are out of contract corpus-wide —
    finite floats only, as for every similarity operator here.)

    One window pass over one corpus scan: the self-map ``otherwise``
    keeps degenerate rows inside ``keyed`` instead of a second
    full-table scan per downstream branch.
    """
    w = Window.partitionBy(vec_col)
    keyed = embeddings.select(id_col, vec_col).withColumn(
        "__rep",
        F.when(
            _norm2(F.col(vec_col)) > 0, F.min(id_col).over(w)
        ).otherwise(F.col(id_col)),
    )
    if materialize:
        from bigdata_elephant_spark.session import persist_tracked

        keyed = persist_tracked(keyed)
    reps = keyed.filter(F.col(id_col) == F.col("__rep")).select(
        id_col, vec_col
    )
    return keyed, reps


def near_dup_edges(
    embeddings: DataFrame,
    threshold: float,
    planes: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = True,
) -> DataFrame:
    """:func:`near_dup_pairs` with the identical-vector mega-cluster
    guard — the hyperplane-LSH-bucketed (or exact) miner behind the
    same star-collapse as :func:`semantic_dedup_edges`: bit-identical
    embeddings share every bucket, so the within-bucket self-join is
    quadratic in exact-dup cluster size; here a cluster costs
    cluster−1 star edges (cos_sim literal 1.0) and the bucket join
    runs over distinct-vector representatives. Connected components
    equal the all-pairs form under any threshold ≤ 1 (bucket
    membership and cos_sim are pure functions of the two vectors).
    Output matches the pair API: ``(id_a, id_b, cos_sim)``.
    """
    keyed, reps = _identical_vector_collapse(
        embeddings, id_col, vec_col, materialize
    )
    rep_pairs = near_dup_pairs(
        reps, threshold, planes, id_col, vec_col
    )
    star = keyed.filter(F.col(id_col) != F.col("__rep")).select(
        F.col("__rep").alias("id_a"),
        F.col(id_col).alias("id_b"),
        F.lit(1.0).alias("cos_sim"),
    )
    return star.unionByName(rep_pairs)


def semantic_dedup_edges(
    embeddings: DataFrame,
    threshold: float,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = True,
) -> DataFrame:
    """:func:`semantic_dedup_pairs` with the identical-vector
    mega-cluster guard — the embedding-space twin of the text side's
    ``lsh_candidate_edges``: exact-duplicate documents produce
    bit-identical embeddings, which land in one cell and would emit
    O(cluster²) pair rows from the within-cell self-join. Instead:

    1. collapse bit-identical vectors (window-min over the raw
       ``vec_col`` — float equality is bit equality on a parquet
       round-trip, the same on every engine) to STAR edges
       ``(rep, member, cos_sim = 1.0)``, and
    2. run the within-cell pair scoring over the distinct-vector
       representatives only, against the FULL table's centroid
       geometry (identical vectors share a cell, so cell membership
       and ``cos_sim`` are pure functions of the two vectors — the
       union has the same connected components as the all-pairs
       form under any threshold ≤ 1, the lsh_candidate_edges
       argument verbatim).

    Star edges carry the representative's ``cell_id``; their
    ``cos_sim`` is the literal 1.0 the rounded identical-vector
    cosine evaluates to. Output schema matches the pair API:
    ``(cell_id, id_a, id_b, cos_sim)``.

    Zero-norm vectors are excluded from the collapse: their cosine
    is undefined, so star-edging two identical all-zero vectors at
    1.0 would invent a group the all-pairs form never produces —
    :func:`semantic_dedup_pairs` drops zero-norm vectors before the
    within-cell fan-out (the engine-wide norm>0 filter contract), so
    this variant must leave them edgeless the same way. The collapse
    keeps equivalence exact: degenerate vectors flow into the
    rep-pair side as their own representatives, where the pair
    miner's filter drops them — pairless in both formulations,
    identical connected components (property-tested with the zero
    vector pinned as an ``@example``). (NaN embeddings are out of
    contract corpus-wide, as for every similarity operator here —
    finite floats only.)
    """
    keyed, reps = _identical_vector_collapse(
        embeddings, id_col, vec_col, materialize
    )
    cents = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    assigned = ivf_assign(reps, cents, id_col, vec_col)
    rep_pairs = semantic_dedup_pairs(
        reps, threshold, n_cells, id_col, vec_col,
        cents=cents, assigned=assigned,
    )
    star_members = keyed.filter(
        F.col(id_col) != F.col("__rep")
    ).select(
        F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b")
    )
    rep_cells = assigned.select(
        F.col(id_col).alias("id_a"), "cell_id"
    )
    star = star_members.join(rep_cells, "id_a").select(
        "cell_id", "id_a", "id_b", F.lit(1.0).alias("cos_sim")
    )
    return star.unionByName(rep_pairs)


def ivf_centroids(
    embeddings: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse centroids: the ``n_cells`` lowest-id
    vectors. A production index swaps in k-means|| centroids; every
    downstream shape (assignment, probing) is unchanged, and this
    choice is replayable by any engine (no RNG, no iteration).

    "Lowest-id" is literal — ``orderBy(id).limit(n)`` (a
    TakeOrderedAndProject, one pass, k rows), NOT ``id < n``: the
    ids of a filtered subset or any non-synthetic table are sparse,
    and the filter form would silently return fewer (or zero)
    centroids there. Cell ids keep the raw vector id (cell ids need
    not be dense; on dense 0-based ids the two forms coincide)."""
    return (
        embeddings.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(
            F.col(id_col).alias("cell_id"),
            F.col(vec_col).alias("cvec"),
        )
    )


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance, deterministic left-fold order."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, cell_id)``: nearest centroid by (rounded) squared L2,
    ties to the lowest cell id. The centroid table is broadcast; the
    argmin is a ``min(struct(dist, cell_id))`` — one partial-aggregated
    groupBy, no window, no shuffle of the vectors beyond the id."""
    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        id_col,
        F.struct(
            F.round(_l2sq(F.col(vec_col), F.col("cvec")), 6).alias("d"),
            F.col("cell_id").alias("c"),
        ).alias("dc"),
    )
    return scored.groupBy(id_col).agg(
        F.min("dc").getField("c").alias("cell_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: score only vectors in the ``n_probe``
    cells nearest the query.

    At 100 TB the embedding table is *partitioned by cell_id* so the
    probe is partition pruning — the scan touches n_probe/n_cells of
    the data; the per-cell lists are the inverted file. Here the cell
    assignment is computed inline (the testdata is unpartitioned) but
    the plan below the scan is identical.
    """
    cents = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    q = _query_frame(embeddings, query_vec_id, id_col, vec_col)
    probe_cells = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cell_id",
            F.round(_l2sq(F.col("cvec"), F.col("_qvec")), 6).alias("d"),
        )
        .orderBy("d", "cell_id")
        .limit(n_probe)
        .select("cell_id")
    )
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    candidates = embeddings.join(assigned, id_col).join(
        F.broadcast(probe_cells), "cell_id"
    )
    return _exact_rerank(
        candidates.filter(F.col(id_col) != query_vec_id),
        q, k, id_col, vec_col,
    )


def _allowed_ids(allowed: DataFrame, id_col: str) -> DataFrame:
    """Normalize a metadata-side filter result (any single-column
    frame of ids) to a distinct ``id_col`` long column."""
    return allowed.select(
        allowed[allowed.columns[0]].cast("long").alias(id_col)
    ).distinct()


def ivf_topk_filtered(
    embeddings: DataFrame,
    query_vec_id: int,
    allowed: DataFrame,
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FILTERED ANN — a metadata predicate composed with vector
    search (the vector-DB "filtered search" / FAISS ``IDSelector``
    shape, and the curation question "nearest neighbors among docs
    WHERE lang='en' AND quality > q"). ``allowed`` is a
    single-column frame of ids satisfying the predicate, evaluated
    on the METADATA side (e.g. ``documents.filter(...).select
    ("doc_id")``) — keeping the operator modality-agnostic and the
    predicate pushed down to the metadata scan, which prunes its
    own columns/partitions independently of the vector layout.

    Semantics follow FAISS: the filter restricts CANDIDATES, never
    the quantizer — probe-cell geometry is computed on the full
    table, then the probed candidates semi-join the allowed set (a
    broadcast map-side filter when the predicate is selective,
    which is the common case). The standard recall caveat applies
    and is the caller's dial: a fixed ``n_probe`` yields fewer than
    ``k`` results when the filter thins the probed cells — escalate
    ``n_probe`` (or pre-partition the index by the hot predicate
    column) exactly as the vector-DB filtered-search playbook says.
    """
    cents = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    q = _query_frame(embeddings, query_vec_id, id_col, vec_col)
    probe_cells = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cell_id",
            F.round(_l2sq(F.col("cvec"), F.col("_qvec")), 6).alias("d"),
        )
        .orderBy("d", "cell_id")
        .limit(n_probe)
        .select("cell_id")
    )
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    candidates = (
        embeddings.join(assigned, id_col)
        .join(F.broadcast(probe_cells), "cell_id")
        .join(
            F.broadcast(_allowed_ids(allowed, id_col)),
            id_col,
            "left_semi",
        )
    )
    return _exact_rerank(
        candidates.filter(F.col(id_col) != query_vec_id),
        q, k, id_col, vec_col,
    )


def write_index_manifest(path: str, **fields) -> None:
    """Persist a tiny ``manifest.json`` next to the index parquet
    dirs (dimension, cell/codebook geometry). Callers (the CLI's
    ``ann-query --vec`` dimension check) read it with a plain file
    open — no Spark job, no parquet footer scan. Written
    best-effort: on a non-posix ``path`` (an object-store URI on a
    real cluster) the local write fails and readers simply fall back
    to the parquet footer."""
    import json as _json
    import os as _os

    try:
        _os.makedirs(path, exist_ok=True)
        tmp = _os.path.join(path, "manifest.json.tmp")
        with open(tmp, "w") as f:
            _json.dump(fields, f)
        # Atomic pointer flip (POSIX rename semantics): readers see
        # either the old manifest or the new one, never a torn file.
        # This is what makes the versioned-table swap in
        # :func:`compact_index` snapshot-safe.
        _os.replace(tmp, _os.path.join(path, "manifest.json"))
    except OSError:
        pass


def read_index_manifest(path: str) -> dict | None:
    """The manifest written by :func:`write_index_manifest`, or
    ``None`` when absent/unreadable (pre-manifest index dirs,
    object-store paths)."""
    import json as _json
    import os as _os

    try:
        with open(_os.path.join(path, "manifest.json")) as f:
            out = _json.load(f)
        return out if isinstance(out, dict) else None
    except (OSError, ValueError):
        return None


def _table_path(path: str, sub: str) -> str:
    """Resolve an index's logical table (``vectors`` / ``codes``) to
    its CURRENT physical dir through the manifest's ``tables``
    pointer map — the Iceberg-snapshot idea at its smallest: writers
    publish a new physical dir (``vectors_v2``) and atomically flip
    the pointer; a reader plans from whatever version the manifest
    named when it looked, never from a dir being swapped underneath
    it. Indexes without a manifest (or without a ``tables`` entry —
    everything built before compaction ran) resolve to the plain
    ``{path}/{sub}`` layout unchanged."""
    import os as _os

    man = read_index_manifest(path) or {}
    tables = man.get("tables")
    cur = tables.get(sub) if isinstance(tables, dict) else None
    return _os.path.join(path, cur if isinstance(cur, str) else sub)


def _expire_versions(path: str, sub: str, keep=()) -> None:
    """Best-effort removal of stale ``{sub}_v*`` generation dirs
    (and the unversioned ``{sub}`` when not kept). Builds call this
    after rewriting an index in place — their fresh manifest no
    longer points at any versioned dir, so the old generations are
    unreachable and only waste disk."""
    import os as _os
    import shutil as _shutil

    try:
        entries = _os.listdir(path)
    except OSError:
        return
    for d in entries:
        full = _os.path.join(path, d)
        if d in keep or not _os.path.isdir(full):
            continue
        if d == sub or (
            d.startswith(f"{sub}_v")
            and d.rsplit("_v", 1)[1].isdigit()
        ):
            _shutil.rmtree(full, ignore_errors=True)


def _parquet_files_exist(d: str) -> bool:
    import os as _os

    return any(
        f.endswith(".parquet")
        for _, _, fs in _os.walk(d)
        for f in fs
    )


def _index_rows(spark, path: str, sub: str) -> DataFrame | None:
    """The index's current ``sub`` generation, or ``None`` when it
    holds no parquet files — the legitimate EMPTY-INDEX state a
    compaction leaves behind when every row was tombstoned (a
    partitioned write of zero rows emits no schema-bearing file, so
    a blind ``read.parquet`` would die with UNABLE_TO_INFER_SCHEMA).
    Readers translate ``None`` into an empty, correctly-typed
    result; appends into the empty generation work unchanged (the
    partitioned layout is re-established by the first delta)."""
    d = _table_path(path, sub)
    if not _parquet_files_exist(d):
        return None
    return spark.read.parquet(d)


def _tombstones(spark, path: str) -> DataFrame | None:
    """The index's PENDING tombstone set — ids deleted by
    :func:`delete_from_index` since the last compaction — or ``None``
    when no deletes are pending. Resolved through the manifest's
    ``tables`` pointer like every other index table, so the
    compaction that physically applied the tombstones atomically
    retires them for new readers (the flipped pointer names a fresh,
    still-empty generation) in the same manifest commit that
    publishes the rewritten vectors; an in-flight reader keeps the
    matched (vectors, tombstones) pair it planned with."""
    import os as _os

    d = _table_path(path, "tombstones")
    # The only legitimate "no deletes pending" states are no dir and
    # a dir with no parquet files (interrupted write). Anything else
    # must READ — a swallowed read error here would silently
    # resurface deleted rows (and let update_* re-append tombstoned
    # ids), so genuine faults (permissions, corrupt footer) must
    # propagate loudly instead of degrading to "no tombstones".
    if not _parquet_files_exist(d):
        return None
    return spark.read.parquet(d)


def _live_rows(
    spark, path: str, df: DataFrame, id_col: str
) -> DataFrame:
    """Hide tombstoned ids from an indexed read. The tombstone set is
    bounded by deletes-since-last-compaction — index METADATA under
    the maintenance contract (compact when it grows), hence the
    explicit broadcast: the anti-join is a map-side filter on the
    corpus scan, never a shuffle of it."""
    tomb = _tombstones(spark, path)
    if tomb is None:
        return df
    tcol = tomb.columns[0]
    return df.join(
        F.broadcast(tomb.select(F.col(tcol).alias(id_col)).distinct()),
        id_col,
        "left_anti",
    )


def delete_from_index(
    spark, path: str, ids, id_col: str = "vec_id"
) -> None:
    """LSM-style DELETE for a saved ANN index (the FAISS
    ``remove_ids`` contract at Lucene cost): append the ids to a
    tombstone table next to the index instead of rewriting any
    corpus-sized file. Visibility is immediate — every indexed read
    (:func:`ivf_topk_indexed`, :func:`ivf_topk_batch_indexed`,
    :func:`ivfpq_topk_indexed`) anti-joins the broadcast tombstone
    set — and the next :func:`compact_index` applies the deletes
    physically and retires the tombstones in the same atomic
    manifest commit. Delta-cost, not corpus-cost: the write is
    tombstone-sized; the read-side tax is a broadcast map-side
    filter.

    ``ids`` is a list of ids or a single-column DataFrame (the scale
    shape — e.g. the losing side of a dedup pass). Ids already
    tombstoned are not re-appended (the dedup anti-join below is
    tombstone-sized); ids absent from the index are harmless no-ops,
    exactly like FAISS ``remove_ids``.

    Re-adding a tombstoned id is refused by
    :func:`update_ivf_index` / :func:`update_ivfpq_index` until a
    compaction has applied the delete — with one append-only
    tombstone table there is no ordering between a delete and a
    later re-add, so the anti-join would silently hide the new row
    (the reason Lucene orders them with per-segment docvalue
    generations)."""
    if isinstance(ids, DataFrame):
        tomb = _allowed_ids(ids, id_col)
    else:
        if not ids:
            return  # nothing to delete; don't flip into
            # "deletes pending" (every read would pay the anti-join)
        tomb = spark.createDataFrame(
            [(int(i),) for i in ids], f"{id_col} long"
        ).distinct()
    existing = _tombstones(spark, path)
    if existing is not None:
        tcol = existing.columns[0]
        tomb = tomb.join(
            F.broadcast(
                existing.select(F.col(tcol).alias(id_col))
            ),
            id_col,
            "left_anti",
        )
    if tomb.first() is None:
        return  # empty delta (all already tombstoned / empty frame):
        # a 0-row append would still write a schema-bearing file and
        # permanently flip the index into the deletes-pending state
    tomb.coalesce(1).write.mode("append").parquet(
        _table_path(path, "tombstones")
    )


def _reject_tombstoned_delta(
    spark, path: str, delta: DataFrame, id_col: str, op: str
) -> None:
    """Refuse an append whose ids intersect the pending tombstones
    (see :func:`delete_from_index`). One delta-sized semi-join
    against the broadcast tombstone set, and only when deletes are
    actually pending — the common no-tombstone append pays a single
    ``isdir``."""
    tomb = _tombstones(spark, path)
    if tomb is None:
        return
    tcol = tomb.columns[0]
    hit = (
        delta.join(
            F.broadcast(tomb.select(F.col(tcol).alias(id_col))),
            id_col,
            "left_semi",
        )
        .select(id_col)
        .first()
    )
    if hit is not None:
        raise ValueError(
            f"{op}: delta id={hit[id_col]} is tombstoned by a "
            f"pending delete_from_index at {path!r}; run "
            "compact_index first to apply the delete, then re-add "
            "(an append-only tombstone table cannot order a delete "
            "against a later re-add of the same id)"
        )


def _verify_pointer_reset(path: str, sub: str, op: str) -> None:
    """A REBUILD writes the plain ``{path}/{sub}`` layout and resets
    the manifest (no ``tables`` pointer). ``write_index_manifest``
    is deliberately best-effort (object-store paths have no posix
    manifest at all — readers there fall back to the plain layout,
    which is exactly what the rebuild wrote). The one dangerous
    state is a manifest that EXISTS but could not be overwritten: a
    surviving stale pointer still names an old versioned generation,
    and expiring that generation would leave every reader resolving
    a deleted dir — a fully populated index silently serving empty
    results. Verify before the caller expires; compact_index guards
    its flip the same way."""
    import os as _os

    man = read_index_manifest(path)
    cur = ((man or {}).get("tables") or {}).get(sub)
    if isinstance(cur, str) and cur != sub:
        raise OSError(
            f"{op}: could not reset the manifest pointer at "
            f"{path!r} (it still names {cur!r}); the rebuilt "
            f"{_os.path.join(path, sub)} is on disk but readers "
            "keep resolving the previous generation — fix the "
            "manifest (permissions/disk) and rebuild"
        )


def index_kind(path: str) -> str:
    """'ivf', 'ivfpq' or 'ivfsq8', from the manifest when present,
    else from the layout (plain IVF has ``vectors/``; both quantized
    layouts have ``codes/``, disambiguated by IVF,SQ8's
    ``sq8_stats/`` table) — the ONE dispatch rule shared by
    maintenance and query entry points (``ann-add``, ``ann-query``,
    ``compact_index``). The layout fallback matters: the manifest
    write is best-effort, and a mis-guess here would route an SQ8
    index into the IVF reader, which finds no ``vectors/`` and
    silently serves empty results from a populated index."""
    import os as _os

    kind = (read_index_manifest(path) or {}).get("kind")
    if kind is not None:
        return kind
    if _os.path.isdir(_os.path.join(path, "codes")):
        return (
            "ivfsq8"
            if _os.path.isdir(_os.path.join(path, "sq8_stats"))
            else "ivfpq"
        )
    return "ivf"


def _vec_dim(embeddings: DataFrame, vec_col: str) -> int | None:
    row = embeddings.select(F.size(vec_col).alias("dim")).first()
    return None if row is None else int(row["dim"])


def _gate_build_input(
    embeddings: DataFrame, vec_col: str
) -> tuple[DataFrame, int | None]:
    """Enforce the finite-floats ingest contract at every artifact
    builder's entry (the r13 quarantine lane, production-default
    since r14): returns ``(clean, dim)`` where ``dim`` is the first
    row's vector length (what the manifest records — wrong_dim is
    judged against it) and ``clean`` carries only in-contract
    vectors. The validity predicate is pure column expressions that
    fuse into the build's existing corpus scan (no extra shuffle, no
    extra pass); out-of-contract rows are dropped here, silently —
    a caller that wants the dead-letter lane runs
    :func:`quarantine_embeddings` first (the gate is idempotent on
    its clean side). Without this, one NaN vector at 100 TB poisons
    the centroid means for its whole cell (NaN propagates through
    every distance), and the norm>0 read-side filters can't catch it
    (NaN > 0 is TRUE under Spark's NaN-greatest ordering).

    The dim the manifest records is ELECTED, not probed (r14 review
    finding): reading any single row — even one that passed the
    dim-free classes — lets a corrupt LEADING row invert the gate
    (a wrong-dim first row pins expected_dim to the corrupt value
    and quarantines the whole in-contract corpus; a NULL first
    vector crashes the int() cast). So: drop null/nonfinite/zero
    first, then take the MAJORITY vector length among the survivors
    (count-desc, dim-asc tie-break — deterministic). The election
    is one partial-aggregated count over the handful of distinct
    sizes (metadata-sized result; the build already makes multiple
    corpus passes to train its quantizers). An input with NO rows
    surviving the dim-free classes yields ``dim=None`` + an empty
    clean side, which ``build_ivfsq8_index`` turns into its loud
    empty-corpus error."""
    prefiltered, _ = quarantine_embeddings(
        embeddings, vec_col, expected_dim=None
    )
    row = (
        prefiltered.groupBy(F.size(vec_col).alias("dim"))
        .count()
        .orderBy(F.desc("count"), F.asc("dim"))
        .first()
    )
    dim = None if row is None else int(row["dim"])
    clean, _ = quarantine_embeddings(
        prefiltered, vec_col, expected_dim=dim
    )
    return clean, dim


def _gate_delta_input(delta: DataFrame, vec_col: str) -> DataFrame:
    """Day-2 twin of :func:`_gate_build_input` for the append paths
    (``update_ivf_index`` / ``update_ivfsq8_index`` /
    ``update_ivfpq_index``): drop NULL / nonfinite / zero delta
    vectors — the classes that would silently poison the frozen
    layout (a NaN vector NaN-sinks into some cell and then passes
    every read-side ``norm > 0`` guard). Wrong-dim is deliberately
    NOT dead-lettered here: each update keeps its explicit in-plan
    raise guard, because an id-targeted delta with the wrong
    dimensionality is a caller bug worth failing loudly (the FAISS
    ``add()`` d-assertion), not a corpus-quality row to drop.
    Delta-sized column predicate, no extra pass."""
    clean, _ = quarantine_embeddings(delta, vec_col, expected_dim=None)
    return clean


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Write-side IVF materialization: assign every vector to its
    nearest centroid ONCE and persist the table *partitioned by
    cell_id* (plus the centroid table next to it).

    This is the piece :func:`ivf_topk` computes inline for the
    unpartitioned testdata — at 100 TB the inline recompute is a full
    O(n·n_cells) scan per query, which defeats the n_probe pruning.
    With this layout a probe is static partition pruning: the scan
    touches n_probe/n_cells of the files (asserted in
    tests/test_similarity.py against ``inputFiles()``).

    Input is gated through the finite-floats ingest contract
    (:func:`_gate_build_input`): only finite, nonzero,
    manifest-dim vectors reach the quantizer or the persisted
    layout.
    """
    embeddings, dim = _gate_build_input(embeddings, vec_col)
    cents = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    (
        embeddings.join(assigned, id_col)
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(f"{path}/vectors")
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    write_index_manifest(path, kind="ivf", dim=dim, n_cells=n_cells)
    _verify_pointer_reset(path, "vectors", "build_ivf_index")
    _expire_versions(path, "vectors", keep=("vectors",))
    # A rebuild resets the index's whole lifetime, including pending
    # deletes — stale tombstones surviving into the new life would
    # silently hide freshly indexed rows that happen to reuse an id.
    _expire_versions(path, "tombstones")


def update_ivf_index(
    spark,
    path: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append-only IVF maintenance — the ANN index's day-2
    operation (the FAISS ``add()`` contract): assign ONLY the delta
    batch to the FROZEN centroid geometry and append its rows to the
    cell_id-partitioned vectors. Delta-cost, not corpus-cost: the
    base segment's files are untouched bytes, the centroid table is
    read (metadata-sized) but never retrained — drift bad enough to
    warrant new geometry is a rebuild, exactly as in FAISS. With
    append-only id growth (delta ids above the base's — the normal
    ingest shape) the base's seed set equals the union's, so queries
    over the updated layout return precisely what a fresh
    :func:`build_ivf_index` over base+delta returns
    (equivalence-tested); with interleaved ids the geometry differs
    from a rebuild's but stays a valid frozen quantization, exactly
    like FAISS after add()."""
    man = read_index_manifest(path) or {}
    kind = man.get("kind")
    if kind is not None and kind != "ivf":
        raise ValueError(
            f"index at {path!r} is kind={kind!r}: update_ivf_index "
            "appends to the plain IVF vectors layout only — an "
            "IVFPQ add needs the delta PQ-encoded into codes/, "
            "which is a rebuild"
        )
    delta = _gate_delta_input(delta, vec_col)
    cents = spark.read.parquet(f"{path}/centroids")
    dim = man.get("dim")
    if dim is None:
        row = cents.select(F.size("cvec").alias("d")).first()
        dim = None if row is None else int(row["d"])
    if dim is not None:
        # In-plan dimension guard, validated in the same pass that
        # assigns cells (no extra delta scan): a wrong-length vector
        # would otherwise null-pad through zip_with, get a null L2
        # to every centroid, and silently sink into one cell with
        # null scores forever. FAISS add() asserts d; so do we.
        delta = delta.withColumn(
            vec_col,
            F.when(
                F.size(vec_col) == dim, F.col(vec_col)
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("update_ivf_index: delta vector id="),
                        F.col(id_col).cast("string"),
                        F.lit(" has "),
                        F.size(vec_col).cast("string"),
                        F.lit(
                            f" components but the index stores "
                            f"{dim}-dimensional vectors"
                        ),
                    )
                )
            ),
        )
    _reject_tombstoned_delta(
        spark, path, delta, id_col, "update_ivf_index"
    )
    assigned = ivf_assign(delta, cents, id_col, vec_col)
    (
        delta.join(assigned, id_col)
        .write.mode("append")
        .partitionBy("cell_id")
        .parquet(_table_path(path, "vectors"))
    )


def compact_index(spark, path: str) -> None:
    """Rewrite an index's corpus-sized table (``vectors/`` for IVF,
    ``codes/`` for IVF-PQ and IVF,SQ8 — dispatched from the
    manifest) so each
    cell holds ONE file again. Every :func:`update_ivf_index` /
    :func:`update_ivfpq_index` append adds a file per touched cell;
    after many small deltas a probe pays per-file open/footer costs
    that dwarf the data — the classic small-files tax, and the same
    compaction cycle every LSM-ish layout (Iceberg/Delta OPTIMIZE,
    Lucene segment merges) runs. One shuffle keyed on ``cell_id``
    co-locates each cell, so the rewrite emits exactly one file per
    cell; live rows/values are untouched (query-equivalence is
    tested), and any tombstones pending from
    :func:`delete_from_index` are applied physically during the
    rewrite and retired in the same commit.

    The swap is a SNAPSHOT COMMIT, not an in-place rename: the
    compacted rows land in a fresh versioned dir (``vectors_v1``,
    ``vectors_v2``, ...), then the manifest's ``tables`` pointer
    flips to it atomically (:func:`write_index_manifest`
    writes-aside + ``os.replace``). Readers resolve the physical dir
    through :func:`_table_path` at plan time, so a query planned
    before the flip keeps scanning the old — still intact — version
    while new queries pick up the new one: no maintenance window,
    the Iceberg/Delta commit protocol in miniature (an object-store
    deployment flips the pointer via its catalog instead of a posix
    rename). Exactly one previous generation is retained for those
    in-flight readers; generations older than that are expired
    (Iceberg ``expire_snapshots``), bounding disk at ~2x one copy.

    Requires a manifest-writable ``path``: if the pointer flip
    cannot be persisted the new version would be invisible to every
    reader, so the new dir is removed, the old layout left
    untouched, and ``OSError`` raised rather than silently doubling
    storage.

    Single-maintenance-writer assumption: an append racing the
    compaction can land in the retiring generation after its rows
    were already copied forward, and the flip would drop it.
    Serialize :func:`update_ivf_index`/:func:`update_ivfpq_index`
    with compaction (a full Iceberg/Delta deployment rejects the
    losing commit via optimistic concurrency on the catalog; a
    json-file manifest has no compare-and-swap to build that on)."""
    import os
    import shutil

    man = read_index_manifest(path) or {}
    kind = index_kind(path)
    sub = "codes" if kind in ("ivfpq", "ivfsq8") else "vectors"
    tables = man.get("tables")
    cur = tables.get(sub, sub) if isinstance(tables, dict) else sub
    ver = int(cur.rsplit("_v", 1)[1]) if "_v" in cur else 0
    nxt = f"{sub}_v{ver + 1}"
    if not _parquet_files_exist(os.path.join(path, cur)):
        # Already-empty generation (a previous compaction applied a
        # delete-everything tombstone set): nothing to rewrite. But
        # pending tombstones must STILL retire — they hide nothing,
        # yet while pending they tax every read with the anti-join
        # and permanently refuse re-adding those ids (the ValueError
        # in update_* prescribes "run compact_index first", which
        # must therefore work here).
        if _tombstones(spark, path) is not None:
            tcur = (
                tables.get("tombstones", "tombstones")
                if isinstance(tables, dict)
                else "tombstones"
            )
            tver = (
                int(tcur.rsplit("_v", 1)[1]) if "_v" in tcur else 0
            )
            tnxt = f"tombstones_v{tver + 1}"
            man.setdefault("tables", {})["tombstones"] = tnxt
            man["kind"] = kind
            write_index_manifest(path, **man)
            flipped = (
                (read_index_manifest(path) or {}).get("tables") or {}
            )
            if flipped.get("tombstones") != tnxt:
                raise OSError(
                    "compact_index: could not persist the tombstone "
                    f"pointer flip at {path!r}"
                )
            _expire_versions(path, "tombstones", keep=(tcur,))
        return
    df = spark.read.parquet(os.path.join(path, cur))
    # Apply pending deletes physically while the rows are being
    # rewritten anyway (Lucene applies docvalue deletes on merge for
    # the same reason): the compacted generation holds live rows
    # only, and the SAME manifest commit that publishes it flips the
    # tombstone pointer to a fresh — still-empty — generation, so
    # new readers never pair the rewritten rows with already-applied
    # tombstones (which would be harmless but wasteful) and never
    # see a half-applied state. In-flight readers keep their
    # matched (rows, tombstones) pair; both retiring dirs are
    # retained one generation.
    tomb = _tombstones(spark, path)
    tcur = (
        tables.get("tombstones", "tombstones")
        if isinstance(tables, dict)
        else "tombstones"
    )
    if tomb is not None:
        tcol = tomb.columns[0]
        df = df.join(F.broadcast(tomb.distinct()), tcol, "left_anti")
        tver = int(tcur.rsplit("_v", 1)[1]) if "_v" in tcur else 0
        man.setdefault("tables", {})["tombstones"] = (
            f"tombstones_v{tver + 1}"
        )
    (
        df.repartition("cell_id")
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(os.path.join(path, nxt))
    )
    man.setdefault("tables", {})[sub] = nxt
    man["kind"] = kind
    write_index_manifest(path, **man)
    flipped = (read_index_manifest(path) or {}).get("tables") or {}
    if flipped.get(sub) != nxt:
        shutil.rmtree(os.path.join(path, nxt), ignore_errors=True)
        raise OSError(
            f"compact_index: could not persist the manifest pointer "
            f"flip at {path!r}; old layout left untouched"
        )
    # Expire everything older than the generation just replaced —
    # `cur` itself stays for readers that planned before the flip.
    _expire_versions(path, sub, keep=(cur, nxt))
    if tomb is not None:
        # The applied tombstones retire on the same schedule: keep
        # the generation in-flight readers of `cur` planned with;
        # the new pointer names a dir that does not exist yet (the
        # empty tombstone set) and is created only by a future
        # delete_from_index.
        _expire_versions(path, "tombstones", keep=(tcur,))


def _probe_cell_ids(
    cents: DataFrame, q: DataFrame, n_probe: int
) -> list:
    """The ``n_probe`` cell ids nearest the query — index METADATA
    (ints collected off the broadcast centroid table) so the
    candidate scan can filter ``cell_id IN (...)`` as STATIC
    partition pruning. ONE definition pins the probe contract
    (rounded L2, cell_id tie-break) across every indexed layout;
    a tie-break fix applied here cannot diverge the layouts from
    their shared oracles. ``q`` is a 1-row frame with ``_qvec``."""
    return [
        r["cell_id"]
        for r in (
            cents.crossJoin(F.broadcast(q))
            .select(
                "cell_id",
                F.round(
                    _l2sq(F.col("cvec"), F.col("_qvec")), 6
                ).alias("d"),
            )
            .orderBy("d", "cell_id")
            .limit(n_probe)
            .collect()
        )
    ]


def _pruned_candidates(
    rows: DataFrame,
    probe_ids: list,
    query_vec_id: int,
    id_col: str,
    allowed: DataFrame | None,
) -> DataFrame:
    """Shared candidate restriction for the indexed layouts: prune to
    the probed cells, drop the query row, compose the optional
    filtered-search id set as a broadcast semi-join ON the pruned
    scan."""
    cand = rows.filter(F.col("cell_id").isin(probe_ids)).filter(
        F.col(id_col) != query_vec_id
    )
    if allowed is not None:
        cand = cand.join(
            F.broadcast(_allowed_ids(allowed, id_col)),
            id_col,
            "left_semi",
        )
    return cand


def ivf_topk_indexed(
    spark,
    index_path: str,
    query_vec_id: int,
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    source: DataFrame | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Read-side IVF top-k over a :func:`build_ivf_index` layout.

    ``allowed`` (optional) composes a metadata predicate with the
    probe — :func:`ivf_topk_filtered` semantics on the materialized
    layout: the semi-join lands ON the statically pruned scan, so
    filtered search still touches only the probed partitions.

    The query vector comes from ``source`` (the base table — at scale
    a point lookup / the caller's own vector), never from a scan of
    the index. Probe-cell selection collects exactly ``n_probe`` cell
    ids (index *metadata*, same scale class as the broadcast centroid
    table); the candidate scan then filters ``cell_id IN probe`` —
    static partition pruning on the index layout.

    Scoring is identical to :func:`ivf_topk`, so results match the
    inline variant row-for-row (equivalence-tested).
    """
    # centroids first: a bogus/missing index path must surface as
    # the read error, not be mistaken for the (legitimate) empty
    # generation a delete-everything compaction leaves behind
    cents = spark.read.parquet(f"{index_path}/centroids")
    raw = _index_rows(spark, index_path, "vectors")
    if raw is None:  # every row tombstoned + compacted: empty index
        return spark.createDataFrame(
            [], f"{id_col} long, cos_sim double"
        )
    vecs = _live_rows(spark, index_path, raw, id_col)
    src = source if source is not None else vecs
    q = src.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qvec"),
        F.sqrt(_norm2(F.col(vec_col))).alias("_qnrm"),
    )
    probe = _probe_cell_ids(cents, q, n_probe)
    candidates = _pruned_candidates(
        vecs, probe, query_vec_id, id_col, allowed
    )
    return _exact_rerank(candidates, q, k, id_col, vec_col)


def ivf_topk_batch_indexed(
    spark,
    index_path: str,
    query_ids: list[int],
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    source: DataFrame | None = None,
) -> DataFrame:
    """Batch IVF top-k over a :func:`build_ivf_index` layout — the
    high-QPS shape (:func:`ivf_topk_batch`: one plan for the whole
    probe set) on the amortized layout (:func:`ivf_topk_indexed`:
    cell assignment persisted, probes prune partitions).

    Probe selection mirrors the inline batch form (per-query rank
    window over the |Q| x n_cells distance table — metadata-sized,
    broadcast); the UNION of every query's probe cells is collected
    driver-side (<= n_cells ids, index metadata) and becomes one
    static partition filter on the cell_id-partitioned vectors, so
    the whole batch costs a single pruned scan. Each candidate is
    then scored only for the queries probing its cell (broadcast
    equi-join), per-query top-k via the ``row_number() <= k`` window
    (plans as ``WindowGroupLimit``). Results match
    :func:`ivf_topk_batch` row-for-row when the index was built with
    the same ``n_cells`` (equivalence-tested; shares its oracle)."""
    from pyspark.sql import Window

    # centroids first: see ivf_topk_indexed (missing path must raise)
    cents = spark.read.parquet(f"{index_path}/centroids")
    raw = _index_rows(spark, index_path, "vectors")
    if raw is None:  # every row tombstoned + compacted: empty index
        return spark.createDataFrame(
            [], f"q_id long, {id_col} long, cos_sim double"
        )
    vecs = _live_rows(spark, index_path, raw, id_col)
    src = source if source is not None else vecs
    q = src.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("_qvec"),
        F.sqrt(_norm2(F.col(vec_col))).alias("_qnrm"),
    ).filter(F.col("_qnrm") > 0)
    w_p = Window.partitionBy("q_id").orderBy(
        F.col("d").asc(), F.col("cell_id").asc()
    )
    probes = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "q_id",
            "cell_id",
            F.round(_l2sq(F.col("cvec"), F.col("_qvec")), 6).alias(
                "d"
            ),
        )
        .withColumn("_rn", F.row_number().over(w_p))
        .filter(F.col("_rn") <= n_probe)
        .select("q_id", "cell_id")
    )
    cell_union = [
        r["cell_id"]
        for r in probes.select("cell_id").distinct().collect()
    ]
    candidates = (
        vecs.filter(F.col("cell_id").isin(cell_union))
        .withColumn("_nrm", F.sqrt(_norm2(F.col(vec_col))))
        # zero-norm guard on the data side (_exact_rerank contract);
        # norm projected once, reused by the score
        .filter(F.col("_nrm") > 0)
        .join(F.broadcast(probes), "cell_id")
        .join(F.broadcast(q), "q_id")
        .filter(F.col(id_col) != F.col("q_id"))
    )
    scored = candidates.select(
        "q_id",
        id_col,
        F.round(
            _dot(F.col(vec_col), F.col("_qvec"))
            / (F.col("_nrm") * F.col("_qnrm")),
            6,
        ).alias("cos_sim"),
    )
    w_k = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w_k))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def cell_mean_centroids(
    embeddings: DataFrame,
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The k-means *update* step: per-cell elementwise mean of member
    vectors, long format ``(cell_id, d, c)`` (long format keeps the
    output oracle-hashable; ``array_agg`` re-assembles when feeding
    the next :func:`ivf_assign` round).

    posexplode fans each vector into dim rows, then one partial-
    aggregated groupBy on (cell, dim) — the standard distributed
    mean: shuffle volume is cells x dims partials per map partition,
    not vectors. Composed with :func:`ivf_assign` this is one full
    Lloyd iteration; loop it (localCheckpoint per round, like
    dedup.duplicate_groups) for k-means proper.
    """
    joined = embeddings.join(assigned, id_col)
    return (
        joined.select(
            "cell_id", F.posexplode(F.col(vec_col)).alias("d", "x")
        )
        .groupBy("cell_id", F.col("d").cast("long").alias("d"))
        .agg(
            F.round(
                F.sum(F.col("x").cast("double")) / F.count("x"), 6
            ).alias("c")
        )
    )


def _centroids_from_long(cents_long: DataFrame) -> DataFrame:
    """(cell_id, d, c) long format -> (cell_id, cvec array) for the
    next assignment round (array rebuilt in dimension order)."""
    return cents_long.groupBy("cell_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "c"))),
            lambda s: s.getField("c"),
        ).alias("cvec")
    )


def kmeans(
    embeddings: DataFrame,
    n_cells: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed k-means (Lloyd): seed with the deterministic
    lowest-id centroids, then ``iterations`` rounds of broadcast
    argmin assignment + per-cell elementwise means. Centroids are
    rounded to 6 decimals every round so the trajectory replays
    identically in any engine (the oracle unrolls the same rounds);
    ``localCheckpoint`` truncates the growing lineage like the other
    iterative operators. Per round: one broadcast of n_cells vectors
    + one (cell, dim)-keyed aggregation — no shuffle of the vector
    table itself. Output: final centroids, long format
    ``(cell_id, d, c)``.

    Empty cells keep no rows (their centroid drops out) — same
    convention as the SQL oracle's inner join.
    """
    cents = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    out = None
    for _ in range(iterations):
        assigned = ivf_assign(embeddings, cents, id_col, vec_col)
        out = cell_mean_centroids(
            embeddings, assigned, id_col, vec_col
        ).localCheckpoint()
        cents = _centroids_from_long(out)
    return out


def kmeanspp_seeds(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic farthest-point (k-means++-style) seeding:
    seed 0 is the lowest-id vector; each next seed is the vector
    maximizing its (rounded) squared L2 distance to the nearest
    already-chosen seed, ties to the lowest id — the greedy 2-approx
    of the k-center objective, with the ++ D² sampling made
    deterministic so any engine replays the identical trajectory.

    Cost: k-1 rounds x (one broadcast of <= k seed vectors + one
    scan with a running least() over seed distances + one
    max(struct) argmax agg). Collecting one (id, vector) row per
    round is index *metadata*, like the IVF probe list. At very
    large k, use :func:`kmeans_parallel_seeds` (k-means||
    oversampling, O(rounds) passes independent of k); every
    downstream consumer (ivf_centroids -> assign -> kmeans) takes
    either function's seeds unchanged."""
    rows = embeddings.orderBy(id_col).limit(1).collect()
    if not rows:
        return embeddings.sparkSession.createDataFrame(
            [], f"seed_rank long, {id_col} long"
        )
    seeds = [(0, rows[0][id_col], rows[0][vec_col])]
    best = None  # running min distance column, rebuilt per round
    for r in range(1, k):
        dists = [
            F.round(
                _l2sq(F.col(vec_col), F.array(*[F.lit(float(x))
                                                for x in vec])),
                6,
            )
            for _, _, vec in seeds
        ]
        d = dists[0] if len(dists) == 1 else F.least(*dists)
        cand = (
            embeddings.filter(
                ~F.col(id_col).isin([sid for _, sid, _ in seeds])
            )
            .select(
                id_col,
                vec_col,
                F.struct(
                    d.alias("d"), (-F.col(id_col)).alias("negid")
                ).alias("dn"),
            )
            .orderBy(F.desc("dn"))
            .limit(1)
            .collect()[0]
        )
        seeds.append((r, cand[id_col], cand[vec_col]))
    return embeddings.sparkSession.createDataFrame(
        [(r, sid) for r, sid, _ in seeds],
        f"seed_rank long, {id_col} long",
    )


def kmeans_parallel_seeds(
    embeddings: DataFrame,
    k: int,
    rounds: int = 3,
    oversample: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-means|| seeding (Bahmani et al., VLDB 2012): the scale path
    :func:`kmeanspp_seeds` names — O(``rounds``) full passes instead
    of k-1, so seeding k=10^4 centers costs the same scans as k=10.

    Per round, every point is sampled independently with probability
    ``min(1, l * d2(x, C) / phi)`` (``l`` = ``oversample``, default
    2k; ``phi`` = total cost vs the current seed set) — expected ~l
    new candidates per round, each round one scan for phi + one
    filtered scan for the sample. The coin flip is derandomized as
    ``xxhash64(id, round) / 2^64`` so any retry or replay draws the
    identical candidate set (same hazard class as the salted-join
    rand() fix). Candidates (~``rounds * l`` rows) are metadata-sized;
    they are weighted by how many points each attracts (one more
    scan), then the final k are chosen locally by the deterministic
    weighted farthest-point greedy (ties to the lowest id) —
    exactly the reduction the paper prescribes.

    Output matches :func:`kmeanspp_seeds`: ``(seed_rank, id)`` rows,
    seeds are dataset members. If sampling under-fills (tiny inputs),
    the shortfall is topped up with the lowest-id non-candidates —
    deterministic, and only reachable when n is comparable to k.
    """
    l = oversample if oversample is not None else 2 * k
    first = embeddings.orderBy(id_col).limit(1).collect()
    if not first:
        return embeddings.sparkSession.createDataFrame(
            [], f"seed_rank long, {id_col} long"
        )
    cand: dict[int, list[float]] = {
        int(first[0][id_col]): [float(x) for x in first[0][vec_col]]
    }

    def _d2_to(seed_vecs: list[list[float]]) -> Column:
        ds = [
            F.round(
                _l2sq(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in v]),
                ),
                6,
            )
            for v in seed_vecs
        ]
        return ds[0] if len(ds) == 1 else F.least(*ds)

    for r in range(rounds):
        d2 = _d2_to(list(cand.values()))
        # phi summed as exact DECIMAL over the already-6-decimal
        # d2 values (the repo's decimal-sum discipline): a plain
        # double sum is partial-aggregation-order nondeterministic,
        # and a last-ulp wobble in phi could flip a row whose
        # sampling coin u sits exactly at the l*d2/phi threshold —
        # breaking the docstring's replay-identical guarantee.
        phi_dec = embeddings.agg(
            F.sum(d2.cast("decimal(30,6)")).alias("phi")
        ).first()["phi"]
        phi = float(phi_dec) if phi_dec is not None else 0.0
        if not phi:  # all points coincide with seeds — done sampling
            break
        # u in [0, 1): signed xxhash64 scaled from [-2^63, 2^63) —
        # double precision is plenty for a sampling coin flip.
        u = (
            F.xxhash64(F.col(id_col), F.lit(r)).cast("double")
            / F.lit(float(2 ** 64))
            + F.lit(0.5)
        )
        picked = (
            embeddings.filter(u < F.lit(float(l)) * d2 / F.lit(float(phi)))
            .select(id_col, vec_col)
            .collect()
        )
        for row in picked:
            cand.setdefault(
                int(row[id_col]), [float(x) for x in row[vec_col]]
            )
    if len(cand) < k:  # tiny-input top-up, deterministic
        extra = (
            embeddings.filter(~F.col(id_col).isin(list(cand)))
            .orderBy(id_col)
            .limit(k - len(cand))
            .collect()
        )
        for row in extra:
            cand[int(row[id_col])] = [float(x) for x in row[vec_col]]

    # weight candidates by attraction: nearest candidate per point,
    # ties to the lowest candidate id (broadcast argmin, one scan).
    spark = embeddings.sparkSession
    cand_df = spark.createDataFrame(
        [(cid, vec) for cid, vec in cand.items()],
        f"cell_id long, cvec array<double>",
    )
    weights = {
        int(row["cell_id"]): int(row["n"])
        for row in ivf_assign(embeddings, cand_df, id_col, vec_col)
        .groupBy("cell_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    # local weighted farthest-point greedy over the candidate set.
    import numpy as np

    ids = sorted(cand)
    mat = np.array([cand[i] for i in ids], dtype=np.float64)
    w = np.array([weights.get(i, 0) for i in ids], dtype=np.float64)
    first_id = int(first[0][id_col])
    chosen = [ids.index(first_id)]
    d2min = np.round(
        ((mat - mat[chosen[0]]) ** 2).sum(axis=1), 6
    )
    while len(chosen) < min(k, len(ids)):
        score = w * d2min
        # argmax with ties to the lowest id: ids is sorted, argmax
        # returns the first (lowest-id) maximal entry.
        nxt = int(np.argmax(score))
        if score[nxt] <= 0.0:
            # remaining candidates coincide with chosen seeds or
            # attract nothing; fall back to unweighted distance,
            # then lowest id.
            nxt = int(np.argmax(d2min))
            if d2min[nxt] <= 0.0:
                nxt = next(
                    i for i in range(len(ids)) if i not in set(chosen)
                )
        chosen.append(nxt)
        d2min = np.minimum(
            d2min, np.round(((mat - mat[nxt]) ** 2).sum(axis=1), 6)
        )
    return spark.createDataFrame(
        [(rank, ids[i]) for rank, i in enumerate(chosen)],
        f"seed_rank long, {id_col} long",
    )


# -------------------------------------------- product quantization
#
# PQ completes the ANN quartet (brute force / LSH / IVF / PQ): each
# vector is compressed to n_sub small codes (here 4 bytes for a
# 64-dim float vector — a 64x memory cut), queries score candidates
# through a tiny per-query lookup table (ADC), and only a short list
# survives to exact re-ranking. At 100 TB the codes table is the only
# thing the ADC scan touches — the full vectors are read for just
# ~C rows at re-rank time (a point-lookup join), which is what makes
# billion-vector search tractable.
#
# Determinism contract (same as IVF): codebooks are the lowest-id
# vectors' slices (no RNG, engine-replayable), encode distances are
# rounded to 6 decimals with ties to the lowest code id, and the ADC
# sum runs in exact decimal so addend order can never flip the
# shortlist cut.


def pq_codebooks(
    embeddings: DataFrame,
    n_sub: int = 4,
    sub_dim: int = 16,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic per-subspace codebooks ``(sub, code_id, cvec)``:
    the ``n_codes`` lowest-id vectors (orderBy+limit — correct on
    sparse id spaces too, see :func:`ivf_centroids`), sliced into
    ``n_sub`` contiguous ``sub_dim``-wide pieces (a production index
    swaps in per-subspace k-means — every downstream shape is
    unchanged)."""
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim).alias(
                    "cvec"
                ),
            )
            for s in range(n_sub)
        ]
    )
    return (
        embeddings.orderBy(F.col(id_col).asc())
        .limit(n_codes)
        .select(F.col(id_col).alias("code_id"), F.explode(slices).alias("s"))
        .select("s.sub", "code_id", "s.cvec")
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    n_sub: int = 4,
    sub_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, sub, code)``: nearest codebook entry per subspace
    by (rounded) squared L2, ties to the lowest code id. One
    broadcast of the codebooks + one partial-aggregated argmin — the
    vectors shuffle only their ids, exactly like :func:`ivf_assign`.
    This is the write-side compression pass; its output is the codes
    table a production system persists (and re-scores queries from)
    instead of the raw vectors."""
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim).alias(
                    "svec"
                ),
            )
            for s in range(n_sub)
        ]
    )
    vec_slices = embeddings.select(
        id_col, F.explode(slices).alias("s")
    ).select(id_col, "s.sub", "s.svec")
    scored = vec_slices.join(F.broadcast(codebooks), "sub").select(
        id_col,
        "sub",
        F.struct(
            F.round(_l2sq(F.col("svec"), F.col("cvec")), 6).alias("d"),
            F.col("code_id").alias("c"),
        ).alias("dc"),
    )
    return scored.groupBy(id_col, "sub").agg(
        F.min("dc").getField("c").alias("code")
    )


def pq_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    n_sub: int = 4,
    sub_dim: int = 16,
    n_codes: int = 16,
    shortlist: int = 50,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ADC top-k with exact re-ranking.

    1. Build the per-query lookup table: the query's slice dotted
       with every codebook entry — ``n_sub * n_codes`` doubles, tiny,
       broadcast (asymmetric distance computation: the query stays
       exact, only the database side is quantized).
    2. Approximate score per vector = sum of its codes' LUT entries;
       the sum runs in exact ``decimal(18,6)`` (addend order can
       never flip the shortlist boundary across engines/partitions).
    3. Shortlist the top ``shortlist`` by (adc desc, id) — a
       TakeOrderedAndProject over the codes table only.
    4. Exact cosine re-rank of the shortlist against the raw vectors
       (a point-lookup join at scale), final top-k.
    """
    cbooks = pq_codebooks(
        embeddings, n_sub, sub_dim, n_codes, id_col, vec_col
    )
    codes = pq_encode(
        embeddings, cbooks, n_sub, sub_dim, id_col, vec_col
    )
    q_slices = (
        embeddings.filter(F.col(id_col) == query_vec_id)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("sub"),
                            F.slice(
                                F.col(vec_col), s * sub_dim + 1, sub_dim
                            ).alias("qvec"),
                        )
                        for s in range(n_sub)
                    ]
                )
            ).alias("s")
        )
        .select("s.sub", "s.qvec")
    )
    lut = cbooks.join(F.broadcast(q_slices), "sub").select(
        "sub",
        "code_id",
        F.round(_dot(F.col("cvec"), F.col("qvec")), 6)
        .cast("decimal(18,6)")
        .alias("pd"),
    )
    short = (
        codes.filter(F.col(id_col) != query_vec_id)
        .join(
            F.broadcast(lut),
            (codes["sub"] == lut["sub"]) & (codes["code"] == lut["code_id"]),
        )
        .groupBy(id_col)
        .agg(F.sum("pd").alias("adc"))
        .orderBy(F.desc("adc"), F.asc(id_col))
        .limit(shortlist)
        .select(id_col)
    )
    q = _query_frame(embeddings, query_vec_id, id_col, vec_col)
    return _exact_rerank(
        embeddings.join(short, id_col), q, k, id_col, vec_col
    )


# ------------------------------------------------- SQ8 scalar quantizer


def sq8_stats(
    embeddings: DataFrame, dim: int, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension quantization range as ONE 1-row broadcastable
    frame: ``vmin`` (array<double>), ``vstep = (max-min)/255``
    (0.0 for a constant dimension — its codes collapse to 0 and
    decode back to the constant), and ``vmax`` (array<double> — the
    exact trained maxima, carried so the append-time range check in
    :func:`update_ivfsq8_index` compares against the TRAINED bound,
    not the 1-ulp-drifting ``vmin + 255*vstep`` reconstruction). The
    FAISS ``ScalarQuantizer QT_8bit`` train step: one corpus scan,
    ``2*dim`` min/max aggregates, all map-side partial — the result
    is metadata-sized however large the corpus."""
    el = lambda d: F.element_at(F.col(vec_col), d + 1).cast(  # noqa: E731
        "double"
    )
    row = embeddings.agg(
        *[F.min(el(d)).alias(f"_mn{d}") for d in range(dim)],
        *[F.max(el(d)).alias(f"_mx{d}") for d in range(dim)],
    )
    return row.select(
        F.array(*[F.col(f"_mn{d}") for d in range(dim)]).alias("vmin"),
        F.array(
            *[
                ((F.col(f"_mx{d}") - F.col(f"_mn{d}")) / F.lit(255.0))
                for d in range(dim)
            ]
        ).alias("vstep"),
        F.array(*[F.col(f"_mx{d}") for d in range(dim)]).alias("vmax"),
    )


def _sq8_code(x: Column, mn: Column, step: Column) -> Column:
    """One dimension's code: ``clamp(floor((x-mn)/step + .5), 0, 255)``.
    ``floor(v + 0.5)`` instead of ``round`` — engines disagree on
    half-way ties (Spark HALF_UP, DuckDB half-away, Python
    half-even); floor+0.5 is one IEEE add and one floor on both.
    The step==0 guard keeps ANSI mode from raising on constant
    dimensions (Spark 4 raises on divide-by-zero, it does not null)."""
    return (
        F.when(step == 0.0, F.lit(0))
        .otherwise(
            F.least(
                F.greatest(
                    F.floor((x.cast("double") - mn) / step + F.lit(0.5)),
                    F.lit(0),
                ),
                F.lit(255),
            )
        )
        .cast("int")
    )


def sq8_encode(
    embeddings: DataFrame,
    stats: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, codes: array<int>)`` — 4x smaller than float32 (the
    arrays would pack to 1 byte/dim in a binary sink; int keeps them
    oracle-comparable). One scan, expression-only: the stats frame is
    a 1-row broadcast cross join, the per-dim encode runs inside
    codegen via a zip over the pre-zipped (min, step) pairs."""
    st = F.arrays_zip(F.col("vmin"), F.col("vstep"))
    return embeddings.crossJoin(F.broadcast(stats)).select(
        id_col,
        F.zip_with(
            F.col(vec_col),
            st,
            lambda x, s: _sq8_code(
                x, s.getField("vmin"), s.getField("vstep")
            ),
        ).alias("codes"),
    )


def _sq8_recon(codes: Column, stats_zip: Column) -> Column:
    """Decode: ``vmin + code*step`` per dimension (exactly two IEEE
    ops, same shape both engines)."""
    return F.zip_with(
        codes,
        stats_zip,
        lambda c, s: s.getField("vmin")
        + c.cast("double") * s.getField("vstep"),
    )


def _sq8_score_tail(
    codes: DataFrame, stats: DataFrame, q: DataFrame, k: int, id_col: str
) -> DataFrame:
    """Shared asymmetric-scan tail: decode every candidate's codes,
    score against the exact query, top-k by (rounded sim, id). One
    definition so the SQ8 scoring contract cannot drift between the
    flat and IVF-pruned paths (the same role :func:`_exact_rerank`
    plays for the exact retrievers).

    Zero-norm reconstructions are dropped BEFORE the division — a
    NONZERO vector whose every component lies within half a step of
    the grid zero reconstructs to exactly [0,...,0], and Spark 4's
    ANSI mode raises on the divide (the mmr_topk crash class; the
    oracles carry the same norm>0 predicate). Such a vector has no
    defined cosine against anything — excluding it is the ranking
    the exact scorer would give the true zero vector."""
    st = F.arrays_zip(F.col("vmin"), F.col("vstep"))
    return (
        codes.crossJoin(F.broadcast(stats))
        .select(id_col, _sq8_recon(F.col("codes"), st).alias("_recon"))
        .withColumn("_nrm", F.sqrt(_norm2(F.col("_recon"))))
        .filter(F.col("_nrm") > 0)
        .crossJoin(F.broadcast(q.filter(F.col("_qnrm") > 0)))
        .select(
            id_col,
            F.round(
                _dot(F.col("_recon"), F.col("_qvec"))
                / (F.col("_nrm") * F.col("_qnrm")),
                6,
            ).alias("sq8_sim"),
        )
        .orderBy(F.desc("sq8_sim"), F.asc(id_col))
        .limit(k)
    )


def sq8_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric SQ8 top-k: the query stays exact float, every
    database vector is scored from its decoded 8-bit reconstruction
    (the FAISS ``SQ8,Flat`` scan). Scoring, rounding (6), ordering
    and the id tie-break match :func:`_exact_rerank`'s contract, but
    over ``recon`` — the result is the honest compressed-domain
    ranking, quantization error included, which is what
    ``sq8_reconstruction_report`` then bounds."""
    dim = _vec_dim(embeddings, vec_col)
    if dim is None:  # empty input: typed-empty result, like the
        return embeddings.limit(0).select(  # exact/indexed paths
            id_col, F.lit(0.0).alias("sq8_sim")
        )
    stats = sq8_stats(embeddings, dim, vec_col)
    codes = sq8_encode(embeddings, stats, id_col, vec_col)
    q = _query_frame(embeddings, query_vec_id, id_col, vec_col)
    return _sq8_score_tail(
        codes.filter(F.col(id_col) != query_vec_id), stats, q, k, id_col
    )


def ivf_sq8_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The ``IVF{n},SQ8`` factory composition: coarse-quantizer cell
    pruning (:func:`ivf_topk`'s probe — at scale, static partition
    pruning over a cell_id layout) + the SQ8 asymmetric scan of
    :func:`sq8_topk` over only the probed candidates. Both halves
    train on the FULL table (FAISS semantics: pruning restricts
    candidates, never the quantizers); the code table is 4x smaller
    than the vectors, so the probed read is n_probe/n_cells of a
    quarter of the raw bytes."""
    dim = _vec_dim(embeddings, vec_col)
    if dim is None:
        return embeddings.limit(0).select(
            id_col, F.lit(0.0).alias("sq8_sim")
        )
    cents = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    q = _query_frame(embeddings, query_vec_id, id_col, vec_col)
    probe_cells = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cell_id",
            F.round(_l2sq(F.col("cvec"), F.col("_qvec")), 6).alias("d"),
        )
        .orderBy("d", "cell_id")
        .limit(n_probe)
        .select("cell_id")
    )
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    stats = sq8_stats(embeddings, dim, vec_col)
    codes = sq8_encode(embeddings, stats, id_col, vec_col)
    candidates = (
        codes.join(assigned, id_col)
        .join(F.broadcast(probe_cells), "cell_id")
        .filter(F.col(id_col) != query_vec_id)
    )
    return _sq8_score_tail(candidates, stats, q, k, id_col)


def sq8_topk_batch(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batched flat-SQ8 search → ``(q_id, vec_id, sq8_sim)`` top-k
    per query. The decode is QUERY-INDEPENDENT, so one
    encode+reconstruct pass over the codes serves the whole probe
    set (the SQ8 member of the batch matrix); per-query scoring and
    top-k are the :func:`cosine_topk_batch` rank-window shape
    (``WindowGroupLimit`` heaps), with the shared zero-norm
    reconstruction guard (ANSI divide) and exact queries — the same
    asymmetric contract as :func:`sq8_topk` per query."""
    from pyspark.sql import Window

    dim = _vec_dim(embeddings, vec_col)
    if dim is None:
        return embeddings.sparkSession.createDataFrame(
            [], f"q_id long, {id_col} long, sq8_sim double"
        )
    stats = sq8_stats(embeddings, dim, vec_col)
    codes = sq8_encode(embeddings, stats, id_col, vec_col)
    st = F.arrays_zip(F.col("vmin"), F.col("vstep"))
    recon = (
        codes.crossJoin(F.broadcast(stats))
        .select(
            id_col, _sq8_recon(F.col("codes"), st).alias("_rv")
        )
        .withColumn("_nrm", F.sqrt(_norm2(F.col("_rv"))))
        .filter(F.col("_nrm") > 0)
    )
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("_qvec"),
        F.sqrt(_norm2(F.col(vec_col))).alias("_qnrm"),
    ).filter(F.col("_qnrm") > 0)
    wtop = Window.partitionBy("q_id").orderBy(
        F.desc("sq8_sim"), F.asc(id_col)
    )
    return (
        recon.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            id_col,
            F.round(
                _dot(F.col("_rv"), F.col("_qvec"))
                / (F.col("_nrm") * F.col("_qnrm")),
                6,
            ).alias("sq8_sim"),
        )
        .withColumn("_r", F.row_number().over(wtop))
        .filter(F.col("_r") <= k)
        .select("q_id", id_col, "sq8_sim")
    )


def sq8_reconstruction_report(
    embeddings: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label quantization-error audit ``(label, n_vecs, avg_err2,
    max_err2)``: the post-build trust gate for the SQ8 codes (the
    same role ``ann_recall_report`` plays for the LSH index). Per-row
    squared reconstruction error is one fixed-order fold rounded to
    6; the group average runs over exact decimal sums so partition
    order can't move a digit."""
    dim = _vec_dim(embeddings, vec_col)
    if dim is None:
        return embeddings.limit(0).select(
            label_col,
            F.lit(0).cast("long").alias("n_vecs"),
            F.lit(0.0).alias("avg_err2"),
            F.lit(0.0).alias("max_err2"),
        )
    stats = sq8_stats(embeddings, dim, vec_col)
    codes = sq8_encode(embeddings, stats, id_col, vec_col)
    st = F.arrays_zip(F.col("vmin"), F.col("vstep"))
    err2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                _sq8_recon(F.col("codes"), st),
                lambda x, r: (x.cast("double") - r)
                * (x.cast("double") - r),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    per_row = (
        embeddings.join(codes, id_col)
        .crossJoin(F.broadcast(stats))
        .select(label_col, err2.alias("_err2"))
    )
    return (
        per_row.groupBy(label_col)
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.col("_err2").cast("decimal(38,6)")).alias("_s"),
            F.max("_err2").alias("max_err2"),
        )
        .select(
            label_col,
            "n_vecs",
            F.round(
                F.col("_s").cast("double") / F.col("n_vecs"), 6
            ).alias("avg_err2"),
            "max_err2",
        )
        .orderBy(label_col)
    )


def build_ivfsq8_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Write-side ``IVF{n},SQ8`` materialization — the FAISS
    index-file shape for this factory string:

    - ``{path}/centroids`` — ``(cell_id, cvec)`` (coarse quantizer),
    - ``{path}/sq8_stats`` — the ONE-row per-dim (vmin, vstep) frame,
    - ``{path}/codes`` — ``(vec_id, codes)`` partitioned by
      ``cell_id``: a probe is static partition pruning over a table
      4x smaller than the raw vectors.

    Both quantizers train on the full table, exactly as
    :func:`ivf_sq8_topk` does inline, so a query over this layout
    returns identical rows (equivalence-tested). Input is gated
    through the finite-floats ingest contract
    (:func:`_gate_build_input`) — one ±Inf component would
    otherwise blow the trained per-dim (vmin, vstep) range so wide
    every finite value quantizes to the same code."""
    embeddings, dim = _gate_build_input(embeddings, vec_col)
    if dim is None:
        raise ValueError(
            "build_ivfsq8_index: embeddings input is empty — an SQ8 "
            "range cannot be trained on zero rows"
        )
    cents = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    assign = ivf_assign(embeddings, cents, id_col, vec_col)
    stats = sq8_stats(embeddings, dim, vec_col)
    codes = sq8_encode(embeddings, stats, id_col, vec_col)
    (
        codes.join(assign, id_col)
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(f"{path}/codes")
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    stats.write.mode("overwrite").parquet(f"{path}/sq8_stats")
    write_index_manifest(
        path, kind="ivfsq8", dim=dim, n_cells=n_cells
    )
    _verify_pointer_reset(path, "codes", "build_ivfsq8_index")
    _expire_versions(path, "codes", keep=("codes",))
    _expire_versions(path, "tombstones")


def update_ivfsq8_index(
    spark,
    path: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append-only ``IVF,SQ8`` maintenance — the FAISS-faithful
    middle ground between "always rebuild" and "silently clamp":
    the delta is re-encoded with the FROZEN per-dimension range
    stats **only when every delta component lies inside the trained
    range** ``[vmin_d, vmax_d]``; any out-of-range component refuses
    the append (a clamped code would mis-encode silently — FAISS
    retrains the scalar quantizer on rebuild for exactly this
    reason). Inside the range the frozen encode is LOSSLESS relative
    to a rebuild: a fresh ``sq8_stats`` over base+delta attains the
    same per-dim min/max (the delta extends no range), so codes,
    centroids (lowest-id seeds, all in base under append-only id
    growth) and therefore query results match a full
    :func:`build_ivfsq8_index` byte-for-byte (equivalence under the
    shared ``knn_ivf_sq8`` oracle).

    Cost shape: one delta-sized pass for the range check (the stats
    frame is a 1-row broadcast; the probe short-circuits at the
    first violation) and one delta-sized encode+assign+append —
    base code files are untouched bytes, nothing corpus-sized runs.
    """
    man = read_index_manifest(path) or {}
    kind = man.get("kind")
    if kind is not None and kind != "ivfsq8":
        raise ValueError(
            f"index at {path!r} is kind={kind!r}: "
            "update_ivfsq8_index appends SQ8 codes — use "
            "update_ivf_index / update_ivfpq_index for those layouts"
        )
    delta = _gate_delta_input(delta, vec_col)
    cents = spark.read.parquet(f"{path}/centroids")
    stats = spark.read.parquet(f"{path}/sq8_stats")
    if "vmax" not in stats.columns:
        # pre-vmax stats artifact: reconstruct the trained maxima.
        # The two IEEE roundings (multiply, add) can drift ~1 ulp in
        # EITHER direction, so a component up to ~1 ulp past the
        # trained max may be spuriously accepted — harmless, because
        # _sq8_code clamps to 255, giving the same code the true max
        # would; a ~1-ulp spurious refusal is likewise safe.
        stats = stats.withColumn(
            "vmax",
            F.zip_with(
                F.col("vmin"),
                F.col("vstep"),
                lambda mn, st: mn + st * F.lit(255.0),
            ),
        )
    dim = man.get("dim")
    if dim is None:
        row = cents.select(F.size("cvec").alias("d")).first()
        dim = None if row is None else int(row["d"])
    if dim is not None:
        # same in-plan dimension guard as update_ivf_index
        delta = delta.withColumn(
            vec_col,
            F.when(
                F.size(vec_col) == dim, F.col(vec_col)
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "update_ivfsq8_index: delta vector id="
                        ),
                        F.col(id_col).cast("string"),
                        F.lit(" has "),
                        F.size(vec_col).cast("string"),
                        F.lit(
                            f" components but the index stores "
                            f"{dim}-dimensional vectors"
                        ),
                    )
                )
            ),
        )
    _reject_tombstoned_delta(
        spark, path, delta, id_col, "update_ivfsq8_index"
    )
    bounds = F.arrays_zip(F.col("vmin"), F.col("vmax"))
    viol = (
        delta.crossJoin(F.broadcast(stats))
        .filter(
            F.exists(
                F.zip_with(
                    F.col(vec_col),
                    bounds,
                    lambda x, b: (
                        x.cast("double") < b.getField("vmin")
                    ) | (x.cast("double") > b.getField("vmax")),
                ),
                lambda bad: bad,
            )
        )
        .select(id_col)
        .first()
    )
    if viol is not None:
        raise ValueError(
            f"update_ivfsq8_index: delta id={viol[id_col]} has a "
            f"component outside the SQ8 range trained at build time "
            f"for {path!r} — encoding it with the frozen stats would "
            "clamp (silent mis-encode). Rebuild with "
            "build_ivfsq8_index over base+delta (FAISS retrains the "
            "scalar quantizer on rebuild for the same reason)."
        )
    assign = ivf_assign(delta, cents, id_col, vec_col)
    codes = sq8_encode(delta, stats, id_col, vec_col)
    (
        codes.join(assign, id_col)
        .write.mode("append")
        .partitionBy("cell_id")
        .parquet(_table_path(path, "codes"))
    )


def ivfsq8_topk_indexed(
    spark,
    index_path: str,
    query_vec_id: int,
    source: DataFrame,
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """``IVF,SQ8`` top-k over a :func:`build_ivfsq8_index` layout:
    probe the ``n_probe`` nearest cells (centroid table is index
    metadata), statically partition-prune the codes scan to the
    probed cells, decode + score via the shared SQ8 tail. The query
    vector comes exact from ``source``; only quantized codes are
    read corpus-side. Scoring is identical to :func:`ivf_sq8_topk`,
    row-for-row (equivalence-tested); ``allowed`` composes filtered
    search on the pruned scan exactly like the IVF/IVF-PQ layouts."""
    cents = spark.read.parquet(f"{index_path}/centroids")
    stats = spark.read.parquet(f"{index_path}/sq8_stats")
    raw = _index_rows(spark, index_path, "codes")
    if raw is None:  # every row tombstoned + compacted: empty index
        return spark.createDataFrame(
            [], f"{id_col} long, sq8_sim double"
        )
    codes = _live_rows(spark, index_path, raw, id_col)
    q = _query_frame(source, query_vec_id, id_col, vec_col)
    probe_ids = _probe_cell_ids(cents, q, n_probe)
    cand = _pruned_candidates(
        codes, probe_ids, query_vec_id, id_col, allowed
    )
    return _sq8_score_tail(
        cand.select(id_col, "codes"), stats, q, k, id_col
    )


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_vec_id: int,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k: brute force *within the query's LSH bucket*.

    Deterministic (bucket assignment and scoring replay identically
    in the oracle), so approximate != unverifiable: the oracle
    recomputes the same bucketed search.

    ``probe_hamming`` is the recall knob — multi-probe widens the
    candidate set to buckets whose sign pattern differs from the
    query's in at most that many planes (popcount of the XOR,
    JVM-side). h=0 scans ~1/2^planes of the data; h=1 adds the
    ``n_planes`` adjacent buckets (the ones a borderline vector most
    likely fell into); at the partitioned-by-bucket 100 TB layout
    each probed bucket is still just one pruned partition.
    """
    with_bucket = embeddings.select(
        id_col,
        vec_col,
        bucket_expr(F.col(vec_col), planes).alias("bucket"),
        F.sqrt(_norm2(F.col(vec_col))).alias("_nrm"),
    )
    q = with_bucket.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qvec"),
        F.col("bucket").alias("_qbucket"),
        F.col("_nrm").alias("_qnrm"),
    )
    # zero-norm guard on both divisor sides (_exact_rerank contract)
    return (
        with_bucket.filter(F.col("_nrm") > 0)
        .crossJoin(F.broadcast(q.filter(F.col("_qnrm") > 0)))
        .filter(
            (
                F.bit_count(
                    F.col("bucket").bitwiseXOR(F.col("_qbucket"))
                )
                <= probe_hamming
            )
            & (F.col(id_col) != query_vec_id)
        )
        .select(
            id_col,
            F.round(
                _dot(F.col(vec_col), F.col("_qvec"))
                / (F.col("_nrm") * F.col("_qnrm")),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_batch(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for a BATCH of query vectors in one
    pass → ``(q_id, vec_id, cos_sim)``.

    The kNN-join shape (each query of a small probe set against the
    full corpus) that single-query :func:`cosine_topk` can't batch:
    the query rows broadcast, every corpus partition scores all
    queries locally, then one rank window per ``q_id`` takes the
    top-k. A rank window bounded by a ``row_number() <= k`` filter
    is planned as ``WindowGroupLimit`` (Partial before the exchange,
    Final after — verified in PLANS.md), i.e. each map-side
    partition keeps only its local top-k per query before the
    shuffle, so the per-query reducer sees at most
    ``#partitions × k`` rows — the same partial-heap behavior as
    TakeOrderedAndProject, generalized per key. Ranks order on the
    ROUNDED score (6 decimals) with ``vec_id`` tie-break, so results
    are deterministic and engine-portable.
    """
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("_qvec"),
        F.sqrt(_norm2(F.col(vec_col))).alias("_qnrm"),
    ).filter(F.col("_qnrm") > 0)
    scored = (
        embeddings.select(
            id_col,
            vec_col,
            F.sqrt(_norm2(F.col(vec_col))).alias("_nrm"),
        )
        # zero-norm guard on both divisor sides (_exact_rerank contract)
        .filter(F.col("_nrm") > 0)
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            id_col,
            F.round(
                _dot(F.col(vec_col), F.col("_qvec"))
                / (F.col("_nrm") * F.col("_qnrm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w_final = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("_r", F.row_number().over(w_final))
        .filter(F.col("_r") <= k)
        .select("q_id", id_col, "cos_sim")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    n_cells: int = 16,
    n_probe: int = 4,
    n_sub: int = 4,
    sub_dim: int = 16,
    n_codes: int = 16,
    shortlist: int = 50,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ top-k: coarse quantizer + product quantization of the
    RESIDUALS + ADC probe + exact re-rank — the full FAISS
    ``IVFx,PQy`` architecture, the standard shape for billion-vector
    ANN. Composes the audited pieces:

    1. coarse: :func:`ivf_centroids` + :func:`ivf_assign` (broadcast
       argmin; vectors never shuffle),
    2. compress: residual ``v − centroid(cell)`` per vector, then
       :func:`pq_codebooks` / :func:`pq_encode` ON THE RESIDUALS —
       residuals are far more compressible than raw vectors, which
       is why IVFPQ quantizes them (Jégou et al., PQ for nearest
       neighbor search),
    3. probe: the ``n_probe`` nearest cells to the query; one LUT
       per probed cell against the QUERY's residual in that cell
       (``n_probe × n_sub × n_codes`` doubles — broadcast),
    4. ADC shortlist in exact decimal, then exact cosine re-rank.

    At scale the codes table is the only corpus-sized state touched
    per query (cell-partitioned → partition-pruned to the probed
    cells, as in :func:`ivf_topk_indexed`); raw vectors are read
    only for the ``shortlist`` point lookups.
    """
    cents = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    assign = ivf_assign(embeddings, cents, id_col, vec_col)
    resid = (
        embeddings.join(assign, id_col)
        .join(F.broadcast(cents), "cell_id")
        .select(
            id_col,
            "cell_id",
            F.zip_with(
                F.col(vec_col),
                F.col("cvec"),
                lambda a, b: a.cast("double") - b.cast("double"),
            ).alias("resid"),
        )
    )
    from bigdata_elephant_spark.session import persist_tracked

    resid = persist_tracked(resid)
    cbooks = pq_codebooks(
        resid, n_sub, sub_dim, n_codes, id_col, "resid"
    )
    codes = pq_encode(
        resid, cbooks, n_sub, sub_dim, id_col, "resid"
    )
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qv")
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cell_id",
            "cvec",
            "qv",
            F.round(_l2sq(F.col("cvec"), F.col("qv")), 6).alias(
                "d"
            ),
        )
        .orderBy("d", "cell_id")
        .limit(n_probe)
    )
    qres = probe.select(
        "cell_id",
        F.zip_with(
            F.col("qv"),
            F.col("cvec"),
            lambda a, b: a.cast("double") - b.cast("double"),
        ).alias("qres"),
    )
    qslices = qres.select(
        "cell_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice(
                            F.col("qres"), s * sub_dim + 1, sub_dim
                        ).alias("qvec"),
                    )
                    for s in range(n_sub)
                ]
            )
        ).alias("s"),
    ).select("cell_id", "s.sub", "s.qvec")
    # `code_id` renamed to `code` so the shortlist probe is a THREE-
    # key equi-join: the old two-key join + post-join code filter
    # made every broadcast hash lookup match all n_codes LUT rows
    # and discard n_codes-1 — pure per-row fan-out (guide §3.1:
    # put every equality in the join key)
    lut = cbooks.join(F.broadcast(qslices), "sub").select(
        "cell_id",
        "sub",
        F.col("code_id").alias("code"),
        F.round(_dot(F.col("cvec"), F.col("qvec")), 6)
        .cast("decimal(18,6)")
        .alias("pd"),
    )
    short = (
        # cell_id read off the PERSISTED resid cache (resid's inner
        # joins preserve the assignment row-for-row) instead of
        # recomputing the argmin pass through a second assign lineage
        codes.join(resid.select(id_col, "cell_id"), id_col)
        .filter(F.col(id_col) != query_vec_id)
        .join(
            F.broadcast(lut),
            ["cell_id", "sub", "code"],
        )
        .groupBy(id_col)
        .agg(F.sum("pd").alias("adc"))
        .orderBy(F.desc("adc"), F.asc(id_col))
        .limit(shortlist)
        .select(id_col)
    )
    qx = _query_frame(embeddings, query_vec_id, id_col, vec_col)
    return _exact_rerank(
        embeddings.join(short, id_col), qx, k, id_col, vec_col
    )


def ivfpq_topk_batch(
    embeddings: DataFrame,
    query_ids: list[int],
    n_cells: int = 16,
    n_probe: int = 4,
    n_sub: int = 4,
    sub_dim: int = 16,
    n_codes: int = 16,
    shortlist: int = 50,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batched IVF-PQ — the full FAISS ``IVFx,PQy`` retrieval for a
    probe SET in one pass → ``(q_id, vec_id, cos_sim)``, completing
    the batch matrix (exact / IVF / PQ / IVF-PQ all have batched
    twins). Corpus-sized work (assignment, residuals, PQ encode) is
    query-independent and paid once for the whole batch; each query
    adds only its per-probed-cell residual LUTs
    (``n_probe x n_sub x n_codes`` rows per query — broadcast) and
    its rank windows (``WindowGroupLimit`` map-side heaps). Scoring
    and tie-breaks are identical to :func:`ivfpq_topk` per query.
    """
    from pyspark.sql import Window

    cents = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    assign = ivf_assign(embeddings, cents, id_col, vec_col)
    resid = (
        embeddings.join(assign, id_col)
        .join(F.broadcast(cents), "cell_id")
        .select(
            id_col,
            "cell_id",
            F.zip_with(
                F.col(vec_col),
                F.col("cvec"),
                lambda a, b: a.cast("double") - b.cast("double"),
            ).alias("resid"),
        )
    )
    from bigdata_elephant_spark.session import persist_tracked

    resid = persist_tracked(resid)
    cbooks = pq_codebooks(
        resid, n_sub, sub_dim, n_codes, id_col, "resid"
    )
    codes = pq_encode(
        resid, cbooks, n_sub, sub_dim, id_col, "resid"
    )
    qf = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    wprobe = Window.partitionBy("q_id").orderBy("d", "cell_id")
    probe = (
        cents.crossJoin(F.broadcast(qf))
        .select(
            "q_id",
            "cell_id",
            "cvec",
            "qv",
            F.round(_l2sq(F.col("cvec"), F.col("qv")), 6).alias("d"),
        )
        .withColumn("_r", F.row_number().over(wprobe))
        .filter(F.col("_r") <= n_probe)
    )
    qslices = (
        probe.select(
            "q_id",
            "cell_id",
            F.zip_with(
                F.col("qv"),
                F.col("cvec"),
                lambda a, b: a.cast("double") - b.cast("double"),
            ).alias("qres"),
        )
        .select(
            "q_id",
            "cell_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(sub).alias("sub"),
                            F.slice(
                                F.col("qres"),
                                sub * sub_dim + 1,
                                sub_dim,
                            ).alias("qvec"),
                        )
                        for sub in range(n_sub)
                    ]
                )
            ).alias("s"),
        )
        .select("q_id", "cell_id", "s.sub", "s.qvec")
    )
    # NOTE r15: ivfpq_topk/ivfpq_topk_indexed switched their LUT
    # probe to a three-key equi-join (no n_codes match fan-out); the
    # same fix applies here but is deliberately NOT taken this round
    # — knn_ivfpq_batch is unbenched and the r15 gate window had no
    # slot left for its changed definition after the mandatory r9
    # drain (changed queries must gate the round they ship).
    lut = cbooks.join(F.broadcast(qslices), "sub").select(
        "q_id",
        "cell_id",
        "sub",
        "code_id",
        F.round(_dot(F.col("cvec"), F.col("qvec")), 6)
        .cast("decimal(18,6)")
        .alias("pd"),
    )
    wadc = Window.partitionBy("q_id").orderBy(
        F.desc("adc"), F.asc(id_col)
    )
    short = (
        # cell_id from the persisted resid cache (see ivfpq_topk)
        codes.join(resid.select(id_col, "cell_id"), id_col)
        .join(F.broadcast(lut), ["cell_id", "sub"])
        .filter(F.col("code") == F.col("code_id"))
        .filter(F.col(id_col) != F.col("q_id"))
        .groupBy("q_id", id_col)
        .agg(F.sum("pd").alias("adc"))
        .withColumn("_r", F.row_number().over(wadc))
        .filter(F.col("_r") <= shortlist)
        .select("q_id", F.col(id_col).alias("_sid"))
    )
    return _exact_rerank_batch(
        embeddings, short, query_ids, k, id_col, vec_col
    )


def build_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    n_sub: int = 4,
    sub_dim: int = 16,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Write-side IVF-PQ materialization: train the coarse quantizer
    and the residual PQ codebooks ONCE, then persist

    - ``{path}/centroids`` — ``(cell_id, cvec)``,
    - ``{path}/codebooks`` — ``(sub, code_id, cvec)``,
    - ``{path}/codes`` — ``(vec_id, sub, code)`` partitioned by
      ``cell_id``, so an ADC probe is static partition pruning,

    i.e. everything :func:`ivfpq_topk` trains inline per call (the
    dominant cost at bench SF — codebook k-means over the corpus).
    At 100 TB the codes table is the only corpus-sized artifact a
    query scans; raw vectors are touched just for the shortlist
    re-rank point lookups. Same training pipeline as the inline
    form, so a query over this layout returns identical rows.
    Input is gated through the finite-floats ingest contract
    (:func:`_gate_build_input`) before any quantizer trains."""
    from bigdata_elephant_spark.session import persist_tracked

    embeddings, dim = _gate_build_input(embeddings, vec_col)
    cents = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    assign = ivf_assign(embeddings, cents, id_col, vec_col)
    resid = persist_tracked(
        embeddings.join(assign, id_col)
        .join(F.broadcast(cents), "cell_id")
        .select(
            id_col,
            "cell_id",
            F.zip_with(
                F.col(vec_col),
                F.col("cvec"),
                lambda a, b: a.cast("double") - b.cast("double"),
            ).alias("resid"),
        )
    )
    cbooks = pq_codebooks(
        resid, n_sub, sub_dim, n_codes, id_col, "resid"
    )
    codes = pq_encode(resid, cbooks, n_sub, sub_dim, id_col, "resid")
    (
        codes.join(resid.select(id_col, "cell_id"), id_col)
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(f"{path}/codes")
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    cbooks.write.mode("overwrite").parquet(f"{path}/codebooks")
    write_index_manifest(
        path, kind="ivfpq", dim=dim, n_cells=n_cells, n_sub=n_sub,
        sub_dim=sub_dim, n_codes=n_codes,
    )
    _verify_pointer_reset(path, "codes", "build_ivfpq_index")
    _expire_versions(path, "codes", keep=("codes",))
    # rebuild resets pending deletes (see build_ivf_index)
    _expire_versions(path, "tombstones")


def update_ivfpq_index(
    spark,
    path: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append-only IVF-PQ maintenance — FAISS ``IndexIVFPQ.add()``:
    assign the delta batch to the FROZEN coarse centroids, compute
    residuals, PQ-encode them against the FROZEN codebooks, and
    append the new codes to the cell-partitioned codes table. Both
    quantizers are read (metadata-sized broadcasts) and never
    retrained; the base codes files are untouched bytes. With
    append-only id growth both seed sets (centroids AND residual
    codebooks — residuals of the lowest-id vectors are unchanged
    when the geometry is) lie in the base batch, so the updated
    layout answers :func:`ivfpq_topk_indexed` queries exactly like a
    fresh :func:`build_ivfpq_index` over base+delta
    (equivalence-tested)."""
    man = read_index_manifest(path) or {}
    kind = man.get("kind")
    if kind is not None and kind != "ivfpq":
        raise ValueError(
            f"index at {path!r} is kind={kind!r}: "
            "update_ivfpq_index appends PQ codes — use "
            "update_ivf_index for a plain IVF layout"
        )
    delta = _gate_delta_input(delta, vec_col)
    cents = spark.read.parquet(f"{path}/centroids")
    cbooks = spark.read.parquet(f"{path}/codebooks")
    # PQ geometry from the manifest; pre-manifest dirs infer it from
    # the codebook table itself (n_sub distinct subspaces, each
    # cvec slice sub_dim wide)
    n_sub = man.get("n_sub")
    sub_dim = man.get("sub_dim")
    if n_sub is None or sub_dim is None:
        row = (
            cbooks.agg(
                (F.max("sub") + 1).alias("ns"),
                F.max(F.size("cvec")).alias("sd"),
            ).first()
        )
        n_sub = int(row["ns"])
        sub_dim = int(row["sd"])
    dim = man.get("dim")
    if dim is None:
        row = cents.select(F.size("cvec").alias("d")).first()
        dim = None if row is None else int(row["d"])
    if dim is not None:
        # same in-plan dimension guard as update_ivf_index
        delta = delta.withColumn(
            vec_col,
            F.when(
                F.size(vec_col) == dim, F.col(vec_col)
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "update_ivfpq_index: delta vector id="
                        ),
                        F.col(id_col).cast("string"),
                        F.lit(" has "),
                        F.size(vec_col).cast("string"),
                        F.lit(
                            f" components but the index stores "
                            f"{dim}-dimensional vectors"
                        ),
                    )
                )
            ),
        )
    from bigdata_elephant_spark.session import persist_tracked

    _reject_tombstoned_delta(
        spark, path, delta, id_col, "update_ivfpq_index"
    )
    assign = ivf_assign(delta, cents, id_col, vec_col)
    resid = persist_tracked(
        delta.join(assign, id_col)
        .join(F.broadcast(cents), "cell_id")
        .select(
            id_col,
            "cell_id",
            F.zip_with(
                F.col(vec_col),
                F.col("cvec"),
                lambda a, b: a.cast("double") - b.cast("double"),
            ).alias("resid"),
        )
    )
    codes = pq_encode(resid, cbooks, n_sub, sub_dim, id_col, "resid")
    (
        codes.join(resid.select(id_col, "cell_id"), id_col)
        .write.mode("append")
        .partitionBy("cell_id")
        .parquet(_table_path(path, "codes"))
    )


def ivfpq_topk_indexed(
    spark,
    index_path: str,
    query_vec_id: int,
    source: DataFrame,
    n_probe: int = 4,
    shortlist: int = 50,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ top-k over a :func:`build_ivfpq_index` layout: probe
    the ``n_probe`` nearest cells, build the per-cell ADC lookup
    tables for the QUERY's residuals (``n_probe × n_sub × n_codes``
    doubles — broadcast), scan only the probed partitions of the
    codes table, exact-re-rank the decimal-ADC shortlist against
    ``source`` (the raw vector table; point lookups at scale).
    ``n_sub``/``sub_dim`` come off the codebooks artifact, so the
    query needs no training parameters. Scoring is identical to
    :func:`ivfpq_topk`, row-for-row (equivalence-tested)."""
    cents = spark.read.parquet(f"{index_path}/centroids")
    cbooks = spark.read.parquet(f"{index_path}/codebooks")
    raw = _index_rows(spark, index_path, "codes")
    if raw is None:  # every row tombstoned + compacted: empty index
        return spark.createDataFrame(
            [], f"{id_col} long, cos_sim double"
        )
    codes = _live_rows(spark, index_path, raw, id_col)
    # PQ geometry is index METADATA: build_ivfpq_index writes n_sub/
    # sub_dim into the manifest, so reading them back is a file read,
    # not a Spark job — the old codebooks aggregate+collect cost one
    # extra job + codebooks scan per query (r15; guide §1.2 job
    # count). The aggregate stays as the fallback for a manifest-less
    # (pre-manifest) layout.
    man = read_index_manifest(index_path) or {}
    if "n_sub" in man and "sub_dim" in man:
        n_sub, sub_dim = int(man["n_sub"]), int(man["sub_dim"])
    else:  # pragma: no cover — legacy layout without a manifest
        meta = (
            cbooks.agg(
                (F.max("sub") + 1).alias("n_sub"),
                F.max(F.size("cvec")).alias("sub_dim"),
            ).collect()[0]
        )
        n_sub, sub_dim = int(meta["n_sub"]), int(meta["sub_dim"])
    q = source.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qv")
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cell_id",
            "cvec",
            "qv",
            F.round(_l2sq(F.col("cvec"), F.col("qv")), 6).alias("d"),
        )
        .orderBy("d", "cell_id")
        .limit(n_probe)
    )
    qres = probe.select(
        "cell_id",
        F.zip_with(
            F.col("qv"),
            F.col("cvec"),
            lambda a, b: a.cast("double") - b.cast("double"),
        ).alias("qres"),
    )
    qslices = qres.select(
        "cell_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice(
                            F.col("qres"), s * sub_dim + 1, sub_dim
                        ).alias("qvec"),
                    )
                    for s in range(n_sub)
                ]
            )
        ).alias("s"),
    ).select("cell_id", "s.sub", "s.qvec")
    # three-key equi-join (see ivfpq_topk): no per-row n_codes
    # match fan-out + discard
    lut = cbooks.join(F.broadcast(qslices), "sub").select(
        "cell_id",
        "sub",
        F.col("code_id").alias("code"),
        F.round(_dot(F.col("cvec"), F.col("qvec")), 6)
        .cast("decimal(18,6)")
        .alias("pd"),
    )
    # Probe-cell ids are index METADATA (n_probe ints) — collect
    # them so the codes scan is STATIC partition pruning on the
    # cell_id layout, not a join the planner may or may not prune.
    probe_ids = [r["cell_id"] for r in probe.select("cell_id").collect()]
    cand_codes = codes.filter(F.col("cell_id").isin(probe_ids)).filter(
        F.col(id_col) != query_vec_id
    )
    if allowed is not None:
        # filtered search (see ivf_topk_filtered): the predicate's id
        # set excludes candidates on the pruned codes scan; the ADC
        # shortlist then forms over allowed ids only
        cand_codes = cand_codes.join(
            F.broadcast(_allowed_ids(allowed, id_col)),
            id_col,
            "left_semi",
        )
    short = (
        cand_codes
        .join(F.broadcast(lut), ["cell_id", "sub", "code"])
        .groupBy(id_col)
        .agg(F.sum("pd").alias("adc"))
        .orderBy(F.desc("adc"), F.asc(id_col))
        .limit(shortlist)
        .select(id_col)
    )
    qx = _query_frame(source, query_vec_id, id_col, vec_col)
    return _exact_rerank(
        source.join(short, id_col), qx, k, id_col, vec_col
    )


def ivf_topk_batch(
    embeddings: DataFrame,
    query_ids: list[int],
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k for a BATCH of query vectors in one
    plan → ``(q_id, vec_id, cos_sim)`` — the production high-QPS ANN
    shape: amortize the corpus scan across the whole probe set while
    still scoring only each query's ``n_probe`` nearest cells.

    Probe selection is a per-query rank window over the
    (query × centroid) distance table (``|Q| × n_cells`` rows —
    metadata-sized, broadcast); a vector is scored for exactly the
    queries probing its cell via the broadcast ``(q_id, cell_id)``
    equi-join, so fan-out per vector is bounded by
    queries-per-cell, not batch size. The per-query top-k is the
    ``row_number() <= k`` rank window Spark plans as
    ``WindowGroupLimit`` (map-side per-query heaps). At 100 TB the
    table is cell_id-partitioned and the union of probed cells
    prunes the scan, exactly as in :func:`ivf_topk_indexed`. Scoring
    and ordering per query are identical to single-query
    :func:`ivf_topk` (rounded cosine, id tie-break).

    r15 restructure (same rows, one less corpus pass): the candidate
    lineage carries the vector and its norm THROUGH the assignment
    aggregate (``min(dc).c`` plus ``first`` over the single-source-row
    group — every crossJoin row of a group holds the identical
    vector, so ``first`` is deterministic) instead of joining the
    corpus back to itself on id. At scale that replaces two
    corpus-sized Exchange inputs plus a sort-merge join with ONE
    partial-aggregated Exchange; locally it removes the join and one
    embeddings scan (warm A/B 1.53 → 1.44 s min at sf0.1, rows
    bit-identical). Relies on ``id_col`` being unique (the embeddings
    table's contract, as everywhere in this module): a duplicated id
    would collapse to one group here where the old id-join multiplied
    it. A driver-collected LocalRelation variant for the bounded
    centroid/query slices was measured SLOWER (2.03 s — two eager
    collect round-trips per invocation) and rejected."""
    from pyspark.sql import Window

    cents = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("_qvec"),
        F.sqrt(_norm2(F.col(vec_col))).alias("_qnrm"),
    ).filter(F.col("_qnrm") > 0)
    w_p = Window.partitionBy("q_id").orderBy(
        F.col("d").asc(), F.col("cell_id").asc()
    )
    probes = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "q_id",
            "cell_id",
            F.round(_l2sq(F.col("cvec"), F.col("_qvec")), 6).alias(
                "d"
            ),
        )
        .withColumn("_rn", F.row_number().over(w_p))
        .filter(F.col("_rn") <= n_probe)
        .select("q_id", "cell_id")
    )
    dists = (
        embeddings.select(
            id_col,
            vec_col,
            F.sqrt(_norm2(F.col(vec_col))).alias("_nrm"),
        )
        # zero-norm guard on the data side (_exact_rerank contract);
        # the norm is projected ONCE and reused by the score below —
        # filtering on a re-derived _norm2 would pay the array fold
        # twice per row. Filtering BEFORE the assignment crossJoin
        # is equivalent: the old embeddings-side filter intersected
        # the same ids out of the inner join on id.
        .filter(F.col("_nrm") > 0)
        .crossJoin(F.broadcast(cents))
        .select(
            id_col,
            vec_col,
            "_nrm",
            F.struct(
                F.round(
                    _l2sq(F.col(vec_col), F.col("cvec")), 6
                ).alias("d"),
                F.col("cell_id").alias("c"),
            ).alias("dc"),
        )
    )
    assigned = dists.groupBy(id_col).agg(
        F.min("dc").getField("c").alias("cell_id"),
        F.first(vec_col).alias(vec_col),
        F.first("_nrm").alias("_nrm"),
    )
    candidates = (
        assigned
        .join(F.broadcast(probes), "cell_id")
        .join(F.broadcast(q), "q_id")
        .filter(F.col(id_col) != F.col("q_id"))
    )
    scored = candidates.select(
        "q_id",
        id_col,
        F.round(
            _dot(F.col(vec_col), F.col("_qvec"))
            / (F.col("_nrm") * F.col("_qnrm")),
            6,
        ).alias("cos_sim"),
    )
    w_k = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w_k))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _exact_rerank_batch(
    embeddings: DataFrame,
    short: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Shared batched exact-cosine tail: re-rank each query's
    ``(q_id, _sid)`` shortlist against the raw vectors →
    ``(q_id, vec_id, cos_sim)`` top-k per query. One definition so
    the batch retrievers' scoring/rounding/tie-break contract cannot
    drift from :func:`cosine_topk_batch` (same rank-window shape —
    ``WindowGroupLimit`` map-side heaps)."""
    from pyspark.sql import Window

    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("_qvec"),
        F.sqrt(_norm2(F.col(vec_col))).alias("_qnrm"),
    ).filter(F.col("_qnrm") > 0)
    wtop = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        embeddings.join(short, F.col(id_col) == F.col("_sid"))
        .select(
            "q_id",
            id_col,
            vec_col,
            F.sqrt(_norm2(F.col(vec_col))).alias("_nrm"),
        )
        # zero-norm guard on the data side (_exact_rerank contract);
        # norm projected once, reused by the score
        .filter(F.col("_nrm") > 0)
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id",
            id_col,
            F.round(
                _dot(F.col(vec_col), F.col("_qvec"))
                / (F.col("_nrm") * F.col("_qnrm")),
                6,
            ).alias("cos_sim"),
        )
        .withColumn("_r", F.row_number().over(wtop))
        .filter(F.col("_r") <= k)
        .select("q_id", id_col, "cos_sim")
    )


def pq_topk_batch(
    embeddings: DataFrame,
    query_ids: list[int],
    n_sub: int = 4,
    sub_dim: int = 16,
    n_codes: int = 16,
    shortlist: int = 50,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ADC + exact rerank for a BATCH of queries in one pass →
    ``(q_id, vec_id, cos_sim)`` top-k per query — the batched twin
    of :func:`pq_topk`, shaped like :func:`cosine_topk_batch`:

    ONE codes table serves every query (PQ encoding is
    query-independent — the corpus-sized work is paid once per
    batch, not per query); each query contributes only its
    ``n_sub x n_codes`` LUT (broadcast, metadata-sized); the
    per-query ADC shortlist and the final exact-reranked top-k are
    rank windows Spark plans as ``WindowGroupLimit`` (map-side
    per-group heaps before the exchange). The ADC sum runs in exact
    ``decimal(18,6)`` so the shortlist boundary is engine- and
    partitioning-deterministic; rerank scoring/tie-breaks match
    :func:`cosine_topk_batch` exactly."""
    from pyspark.sql import Window

    cbooks = pq_codebooks(
        embeddings, n_sub, sub_dim, n_codes, id_col, vec_col
    )
    codes = pq_encode(
        embeddings, cbooks, n_sub, sub_dim, id_col, vec_col
    )
    q_slices = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("q_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(sub).alias("sub"),
                            F.slice(
                                F.col(vec_col),
                                sub * sub_dim + 1,
                                sub_dim,
                            ).alias("qvec"),
                        )
                        for sub in range(n_sub)
                    ]
                )
            ).alias("s"),
        )
        .select("q_id", "s.sub", "s.qvec")
    )
    lut = cbooks.join(F.broadcast(q_slices), "sub").select(
        "q_id",
        "sub",
        "code_id",
        F.round(_dot(F.col("cvec"), F.col("qvec")), 6)
        .cast("decimal(18,6)")
        .alias("pd"),
    )
    wadc = Window.partitionBy("q_id").orderBy(
        F.desc("adc"), F.asc(id_col)
    )
    short = (
        codes.join(
            F.broadcast(lut),
            (codes["sub"] == lut["sub"])
            & (codes["code"] == lut["code_id"]),
        )
        .filter(F.col(id_col) != F.col("q_id"))
        .groupBy("q_id", id_col)
        .agg(F.sum("pd").alias("adc"))
        .withColumn("_r", F.row_number().over(wadc))
        .filter(F.col("_r") <= shortlist)
        .select("q_id", F.col(id_col).alias("_sid"))
    )
    return _exact_rerank_batch(
        embeddings, short, query_ids, k, id_col, vec_col
    )


def ivf_probe_recall_sweep(
    embeddings: DataFrame,
    query_ids: list[int],
    n_cells: int = 16,
    max_probe: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF tuning frontier: recall@k vs ``n_probe`` for every
    probe level 1..``max_probe`` in ONE pass →
    ``(n_probe, n_hits, recall)`` (hits/recall pooled over the query
    batch; recall is monotone in n_probe by construction since probe
    sets are nested). This is the sweep every ANN deployment runs to
    pick its latency/recall operating point (FAISS `nprobe`
    benchmarking), expressed without re-scanning per level:

    1. rank every cell per query (``n_cells x |Q|`` rows, window);
    2. score each candidate ONCE against its queries — a candidate
       reached at cell rank r belongs to every probe level >= r, so
       one ``explode(sequence(r, max_probe))`` replicates its
       (already computed) score per level instead of re-scoring;
    3. per-(query, level) top-k via a rank window Spark plans as
       ``WindowGroupLimit`` (map-side heaps);
    4. hits against the exact cosine top-k (one corpus pass via
       :func:`cosine_topk_batch`'s construction), pooled per level.

    Corpus-sized work: one assignment pass + one scored candidate
    pass + the exact baseline — independent of ``max_probe``; the
    replication factor applies only to candidate SCORES (a k-free
    column slice), not to vectors.
    """
    from pyspark.sql import Window

    cents = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("_qvec"),
        F.sqrt(_norm2(F.col(vec_col))).alias("_qnrm"),
    ).filter(F.col("_qnrm") > 0)
    wcell = Window.partitionBy("q_id").orderBy("d", "cell_id")
    cell_rank = (
        cents.crossJoin(F.broadcast(q.select("q_id", "_qvec")))
        .select(
            "q_id",
            "cell_id",
            F.round(_l2sq(F.col("cvec"), F.col("_qvec")), 6).alias(
                "d"
            ),
        )
        .withColumn("crank", F.row_number().over(wcell))
        .filter(F.col("crank") <= max_probe)
        .select("q_id", "cell_id", "crank")
    )
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    scored = (
        embeddings.withColumn(
            "_nrm", F.sqrt(_norm2(F.col(vec_col)))
        )
        # zero-norm guard on the data side (_exact_rerank contract);
        # norm projected once, reused by the score
        .filter(F.col("_nrm") > 0)
        .join(assigned, id_col)
        .join(F.broadcast(cell_rank), "cell_id")
        .join(F.broadcast(q), "q_id")
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            id_col,
            "crank",
            F.round(
                _dot(F.col(vec_col), F.col("_qvec"))
                / (F.col("_nrm") * F.col("_qnrm")),
                6,
            ).alias("cos_sim"),
        )
    )
    per_level = scored.select(
        "q_id",
        id_col,
        "cos_sim",
        F.explode(
            F.sequence(F.col("crank"), F.lit(max_probe))
        ).alias("n_probe"),
    )
    wtop = Window.partitionBy("q_id", "n_probe").orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    approx = (
        per_level.withColumn("_r", F.row_number().over(wtop))
        .filter(F.col("_r") <= k)
        .select("q_id", "n_probe", id_col)
    )
    exact = cosine_topk_batch(embeddings, query_ids, k=k).select(
        "q_id", id_col
    )
    levels = embeddings.sparkSession.range(
        1, max_probe + 1
    ).select(F.col("id").cast("int").alias("n_probe"))
    hits = (
        approx.join(exact, ["q_id", id_col])
        .groupBy("n_probe")
        .agg(F.count("*").alias("n_hits"))
    )
    # Denominator = the exact baseline's ACTUAL row count, not
    # len(query_ids)*k: a query id absent from the corpus (or
    # zero-norm, or a corpus with < k+1 vectors) must not silently
    # cap recall below 1 and read as pruning loss. 1-row aggregate,
    # broadcast-crossJoined (no driver collect).
    denom = exact.agg(F.count("*").alias("_denom"))
    return (
        levels.join(hits, "n_probe", "left")
        .na.fill({"n_hits": 0})
        .crossJoin(F.broadcast(denom))
        .select(
            "n_probe",
            F.col("n_hits").cast("long").alias("n_hits"),
            F.when(
                F.col("_denom") > 0,
                F.round(F.col("n_hits") / F.col("_denom"), 6),
            ).alias("recall"),
        )
        .orderBy("n_probe")
    )


def embedding_novelty_admission(
    base: DataFrame,
    delta: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cap_bytes: int | None = None,
) -> DataFrame:
    """Ingest-time near-duplicate admission →
    ``(vec_id, nn_sim, admit)``: each incoming vector's max exact
    cosine against the BASE corpus; ``admit`` iff it stays below
    ``threshold`` — the semantic-dedup gate a training pipeline runs
    BEFORE ingesting an embedding batch (don't index what you
    already have; the embedding-space twin of the text side's
    frozen-λ DSIR admission and delete-then-append reingest).

    Cost shape: the ingest batch is the intended build side, but the
    hint is SIZE-GATED (``maybe_broadcast`` on the delta scan) — a
    caller-supplied "batch" can be arbitrarily large, and a forced
    hint past Spark's 8 GB cap fails outright rather than degrading.
    When the gate declines (unknown or large stats), AQE picks the
    strategy from runtime sizes. The base is scanned ONCE for the
    whole batch and the per-vector max is a map-side-partial
    aggregate — no base shuffle, no pairwise materialization beyond
    the scan. Zero-norm vectors drop on both sides (cosine
    undefined; ANSI division guard, mirrored in the oracle).

    Every surviving (non-zero-norm) delta vector gets a verdict: the
    scored maxima are LEFT-joined back onto the delta ids, and a
    missing neighbor (empty base, or base entirely zero-norm) means
    maximal novelty — ``nn_sim`` null, ``admit`` true — so a
    bootstrap ingest against an empty index admits everything
    instead of silently emitting no rows. At production scale the
    exact scan swaps for a probe of the maintained IVF layout —
    :func:`embedding_novelty_indexed`, same admission contract with
    a statically pruned candidate read; the recall/threshold trade
    is measured by ``ivf_recall_report``.
    """
    from bigdata_elephant_spark.session import (
        BROADCAST_HINT_CAP_BYTES,
        maybe_broadcast,
    )

    cap = BROADCAST_HINT_CAP_BYTES if cap_bytes is None else cap_bytes
    q = delta.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("_qvec"),
        F.sqrt(_norm2(F.col(vec_col))).alias("_qnrm"),
    ).filter(F.col("_qnrm") > 0)
    scored = (
        base.select(
            id_col,
            vec_col,
            F.sqrt(_norm2(F.col(vec_col))).alias("_nrm"),
        )
        .filter(F.col("_nrm") > 0)
        .crossJoin(maybe_broadcast(q, size_of=delta, cap_bytes=cap))
        .select(
            "q_id",
            F.round(
                _dot(F.col(vec_col), F.col("_qvec"))
                / (F.col("_nrm") * F.col("_qnrm")),
                6,
            ).alias("sim"),
        )
    )
    nn = scored.groupBy("q_id").agg(F.max("sim").alias("nn_sim"))
    # Alias the aggregated side's key before the self-derived join
    # (both frames descend from `delta`; an unaliased equi-join
    # raises AMBIGUOUS_SELF_JOIN).
    nn = nn.select(F.col("q_id").alias("_nnid"), "nn_sim")
    return (
        q.select("q_id")
        .join(nn, F.col("q_id") == F.col("_nnid"), "left")
        .select(
            F.col("q_id").alias(id_col),
            "nn_sim",
            F.coalesce(
                F.col("nn_sim") < F.lit(threshold), F.lit(True)
            ).alias("admit"),
        )
    )


def embedding_novelty_indexed(
    spark,
    index_path: str,
    delta: DataFrame,
    threshold: float = 0.4,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`embedding_novelty_admission` against the MAINTAINED IVF
    layout instead of an exact base scan → ``(vec_id, nn_sim,
    admit)`` — the production shape of the ingest gate (the swap the
    exact operator's docstring promises): ``nn_sim`` is the max
    cosine among LIVE index vectors in the ``n_probe`` cells nearest
    each incoming vector, so admitting a daily batch costs a
    statically PRUNED scan of the cell-partitioned index
    (n_probe/n_cells of the files) plus metadata — the 100 TB of
    indexed vectors outside the probed cells are never read. The
    ``dsir_select``/``dsir_select_indexed`` pairing, for the novelty
    family.

    Probe semantics are the index family's shared contract (rounded
    L2, cell_id tie-break, per-query rank window — the batch form of
    ``ivf_topk_batch_indexed``), and the oracle REPLAYS the probe, so
    the driver hash pins the pruned search exactly; the
    recall-vs-threshold trade of probing is measured separately
    (``ivf_probe_recall_sweep``), same as every indexed retriever
    here. Verdicts mirror the exact operator: zero-norm delta
    vectors drop (cosine undefined), zero-norm INDEX rows are
    excluded from scoring, and every surviving delta id gets a row —
    no candidates in the probed cells (empty index, empty probed
    cells) means maximal novelty: ``nn_sim`` null, ``admit`` true.
    Unlike the kNN retrievers there is NO self-id exclusion: novelty
    queries are not drawn from the index, and a delta vector
    RE-INGESTED under an id already indexed must score against its
    own index row (``nn_sim`` 1.0 → reject) exactly as the exact
    ``embedding_novelty_admission`` gate and the replayed oracle
    score it (r10 ADVICE).
    """
    from bigdata_elephant_spark.session import maybe_broadcast

    q = delta.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("_qvec"),
        F.sqrt(_norm2(F.col(vec_col))).alias("_qnrm"),
    ).filter(F.col("_qnrm") > 0)
    verdict = lambda nn: (  # noqa: E731 — shared verdict projection
        q.select("q_id")
        .join(nn, F.col("q_id") == F.col("_nnid"), "left")
        .select(
            F.col("q_id").alias(id_col),
            "nn_sim",
            F.coalesce(
                F.col("nn_sim") < F.lit(threshold), F.lit(True)
            ).alias("admit"),
        )
    )
    # centroids first: a bogus index path must raise, not read as
    # the legitimately-empty compacted index (ivf_topk_indexed rule)
    cents = spark.read.parquet(f"{index_path}/centroids")
    raw = _index_rows(spark, index_path, "vectors")
    if raw is None:  # every row tombstoned + compacted: empty index
        empty_nn = spark.createDataFrame(
            [], "_nnid long, nn_sim double"
        )
        return verdict(empty_nn)
    vecs = _live_rows(spark, index_path, raw, id_col)
    w_p = Window.partitionBy("q_id").orderBy(
        F.col("d").asc(), F.col("cell_id").asc()
    )
    probes = (
        cents.crossJoin(maybe_broadcast(q, size_of=delta))
        .select(
            "q_id",
            "cell_id",
            F.round(_l2sq(F.col("cvec"), F.col("_qvec")), 6).alias(
                "d"
            ),
        )
        .withColumn("_rn", F.row_number().over(w_p))
        .filter(F.col("_rn") <= n_probe)
        .select("q_id", "cell_id")
    )
    # NOTE r15: the probe table (<= |delta| x n_probe id pairs) is
    # already collected below for the cell union, so it could re-
    # enter the plan as a LocalRelation and spare the second run of
    # the cents-crossJoin-window lineage under the scored join — an
    # identified optimization deliberately NOT taken this round: it
    # changes this query's executed definition and the r15 gate
    # window had no slot left after the mandatory r9 drain (changed
    # queries must gate the round they ship).
    #
    # union of probed cells: index METADATA (<= n_cells ints) —
    # becomes the static partition filter on the cell-partitioned
    # layout, exactly the ivf_topk_batch_indexed pruning
    cell_union = [
        r["cell_id"]
        for r in probes.select("cell_id").distinct().collect()
    ]
    scored = (
        vecs.filter(F.col("cell_id").isin(cell_union))
        .filter(_norm2(F.col(vec_col)) > 0)
        .join(maybe_broadcast(probes, size_of=delta), "cell_id")
        .join(maybe_broadcast(q, size_of=delta), "q_id")
        .select(
            "q_id",
            F.round(
                _dot(F.col(vec_col), F.col("_qvec"))
                / (F.sqrt(_norm2(F.col(vec_col))) * F.col("_qnrm")),
                6,
            ).alias("sim"),
        )
    )
    nn = (
        scored.groupBy("q_id")
        .agg(F.max("sim").alias("nn_sim"))
        .select(F.col("q_id").alias("_nnid"), "nn_sim")
    )
    return verdict(nn)


def power_iteration_top_eigvec(
    gram: DataFrame,
    dim: int,
    iters: int = 8,
) -> DataFrame:
    """Top principal direction of a (corpus-computed) Gram matrix by
    fixed-iteration power method → ``(i, v, eigval)`` — the PCA
    building block: one corpus scan produces the dim x dim Gram
    table (see ``embedding_gram_matrix``); everything after it is
    dim²-row METADATA, so the iteration runs DRIVER-SIDE (the house
    kmeans-seed pattern): the Gram is collected once — a few MB for
    any sane embedding dim, at any corpus size — and the ``iters``
    matvec/normalize rounds are pure Python, replacing an
    8-sequential-Spark-job chain whose per-job overhead dwarfed the
    4096-row arithmetic (measured ~10 s → ~2 s at sf0.1; the r9
    verdict's "the iteration belongs driver-side").

    Determinism discipline is UNCHANGED and the oracle's unrolled
    CTE chain still reproduces every iterate bit-for-bit: the matvec
    ``w = G v`` sums exact 1e-12-scaled integers (the decimal
    products, exactly), each iterate rounds HALF_UP to 6 decimals
    before the next round, and sqrt/divide/final-round run in IEEE
    double with Spark's round-on-double semantics (HALF_UP on the
    shortest decimal repr — ``BigDecimal.valueOf``). Starts from the
    uniform unit vector; ``eigval`` is the final ``||G v||``
    (Rayleigh estimate for a unit ``v``).
    """
    spark = gram.sparkSession
    G = _collect_sym(gram, dim)
    x = _power_iterate_py(G, dim, iters)
    eig = _eigval_py(G, x)
    rows = [
        (i, float(Decimal(xi).scaleb(-6)), eig)
        for i, xi in enumerate(x)
    ]
    return spark.createDataFrame(
        rows, "i int, v double, eigval double"
    ).orderBy("i")


_Q6 = Decimal("0.000001")


def _round6_double(d: float) -> float:
    """Spark's ``round(double, 6)``: HALF_UP on the shortest decimal
    repr (``BigDecimal.valueOf(d).setScale(6, HALF_UP)``). Python's
    ``repr`` is the same shortest-round-trip decimal, so quantizing
    it reproduces the JVM result."""
    return float(
        Decimal(repr(float(d))).quantize(_Q6, rounding=ROUND_HALF_UP)
    )


def _int6(d) -> int:
    """A value with ≤6 decimal places → exact 1e-6-scaled int."""
    src = d if isinstance(d, Decimal) else Decimal(repr(float(d)))
    return int(src.quantize(_Q6, rounding=ROUND_HALF_UP).scaleb(6))


def _collect_sym(gram: DataFrame, dim: int) -> list[list[int]]:
    """Upper-triangle ``(i, j, gram)`` collected ONCE into a dense
    symmetric dim×dim matrix of exact 1e-6-scaled ints. The collect
    is the deliberate driver-side escape hatch: the Gram is dim²/2
    rows (metadata-sized at any corpus scale); its lineage — the one
    corpus scan — runs exactly once, here. Missing entries are 0 and
    NULL entries are skipped, mirroring the join+SUM semantics of
    the Spark/DuckDB formulations."""
    rows = gram.select(
        "i", "j", F.col("gram").cast("decimal(18,6)").alias("g")
    ).collect()
    G = [[0] * dim for _ in range(dim)]
    for r in rows:
        if r.g is None:
            continue
        gi = int(Decimal(r.g).scaleb(6))
        G[r.i][r.j] = gi
        G[r.j][r.i] = gi
    return G


def _matvec_py(G: list[list[int]], x: list[int]) -> list[int]:
    """Exact-decimal ``w = G v`` on 1e-6-scaled ints: each product
    is an exact 1e-12-scaled int (Python ints are unbounded — no
    2^63 headroom analysis needed), the sum is exact, and the
    HALF_UP round to 6 decimals is the same ``round(sum(g*x), 6)``
    the oracle CTE runs."""
    out = []
    for row in G:
        s = sum(g * xj for g, xj in zip(row, x))
        out.append(
            int(
                Decimal(s)
                .scaleb(-12)
                .quantize(_Q6, rounding=ROUND_HALF_UP)
                .scaleb(6)
            )
        )
    return out


def _power_iterate_py(
    G: list[list[int]], dim: int, iters: int
) -> list[int]:
    """``iters`` power-method rounds from the uniform unit vector →
    1e-6-scaled int components (the decimal(12,6) iterate)."""
    x0 = round(1.0 / math.sqrt(dim), 6)
    x = [_int6(x0)] * dim
    for _ in range(iters):
        w = _matvec_py(G, x)
        n2 = sum(wi * wi for wi in w)  # exact, 1e-12-scaled
        if n2 > 0:
            # decimal→double cast is correctly rounded on both
            # runtimes; sqrt/divide are IEEE; the 6-dp round is
            # Spark's round-on-double (see _round6_double)
            n = math.sqrt(float(Decimal(n2).scaleb(-12)))
            x = [
                _int6(
                    _round6_double(float(Decimal(wi).scaleb(-6)) / n)
                )
                for wi in w
            ]
        else:
            x = [0] * dim
    return x


def _eigval_py(G: list[list[int]], x: list[int]) -> float:
    """``round(||G v||, 6)`` — the Rayleigh estimate for unit v."""
    w = _matvec_py(G, x)
    n2 = sum(wi * wi for wi in w)
    return _round6_double(math.sqrt(float(Decimal(n2).scaleb(-12))))


def pca2_projection(
    gram: DataFrame,
    embeddings: DataFrame,
    dim: int,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every embedding onto the top TWO principal directions
    → ``(vec_id, pc1, pc2)`` — the 2-D PCA map (visualization /
    whitening front-end / cheap semantic bucketing) computed
    entirely from the one-pass Gram table: v1 by power iteration,
    v2 by the same iteration on the DEFLATED matrix
    ``G2 = G − λ1 v1 v1ᵀ`` (Hotelling deflation), then one corpus
    pass dotting each vector against the dim-row broadcast
    components. Iteration cost is dim²-row metadata at any corpus
    size; the projection is the only corpus-sized stage.

    Determinism: deflation runs in IEEE double with a fixed
    left-assoc product chain and per-entry rounding (mirrored in the
    oracle); projections are exact decimal sums per vector, so
    output hashes are partitioning-stable. Components are rounded
    iterates — at these iteration counts v2 is the mathematical
    second direction only insofar as the eigengap allows (the numpy
    cross-check pins it on converged input); the CONTRACT is the
    fixed arithmetic, same as every iterative oracle here.

    Like :func:`power_iteration_top_eigvec`, the Gram is collected
    once and v1 / deflation / v2 run driver-side (dim² ints —
    metadata at any corpus size; replaces a ~25-Spark-job chain of
    64-row metadata jobs). The components return to the cluster as
    two dim-row broadcast frames for the single corpus-sized stage.
    """
    spark = gram.sparkSession
    G = _collect_sym(gram, dim)
    x1 = _power_iterate_py(G, dim, iters)
    eig = _eigval_py(G, x1)
    v1f = [float(Decimal(xi).scaleb(-6)) for xi in x1]
    # Hotelling deflation — the exact expression the oracle runs:
    # round(double(g) - round(eigval * v_i * v_j, 6), 6), with the
    # products in IEEE double, left-associated.
    G2 = [[0] * dim for _ in range(dim)]
    for i in range(dim):
        gi = G[i]
        for j in range(dim):
            inner = _round6_double(eig * v1f[i] * v1f[j])
            gd = float(Decimal(gi[j]).scaleb(-6))
            G2[i][j] = _int6(_round6_double(gd - inner))
    x2 = _power_iterate_py(G2, dim, iters)
    c1 = spark.createDataFrame(
        [(i, Decimal(xi).scaleb(-6)) for i, xi in enumerate(x1)],
        "d int, _c1 decimal(12,6)",
    )
    c2 = spark.createDataFrame(
        [(i, Decimal(xi).scaleb(-6)) for i, xi in enumerate(x2)],
        "d int, _c2 decimal(12,6)",
    )

    elems = embeddings.where(F.size(vec_col) > 0).select(
        id_col,
        F.posexplode(
            F.transform(
                vec_col, lambda x: F.round(x.cast("double"), 7)
            )
        ).alias("d", "_xd"),
    ).select(
        id_col, "d", F.col("_xd").cast("decimal(20,7)").alias("_xd")
    )
    return (
        elems.join(F.broadcast(c1), "d")
        .join(F.broadcast(c2), "d")
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("_xd") * F.col("_c1")).cast("double"), 6
            ).alias("pc1"),
            F.round(
                F.sum(F.col("_xd") * F.col("_c2")).cast("double"), 6
            ).alias("pc2"),
        )
        .orderBy(id_col)
    )


def novelty_threshold_sweep(
    base: DataFrame,
    delta: DataFrame,
    max_thr_x10: int = 9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The admission-gate tuning frontier: admit rate vs threshold
    for every threshold 0.1..``max_thr_x10``/10 in ONE pass →
    ``(thr_x10, n_admit, n_total, admit_rate)``.

    The companion to :func:`embedding_novelty_admission` the way
    :func:`ivf_probe_recall_sweep` companions the IVF retriever:
    before picking the dedup threshold for an ingest pipeline, sweep
    the operating points. The corpus-sized work — one base scan and
    the per-vector max — runs ONCE (the nn_sim table from the
    admission operator); the sweep is a threshold-level fan-out of
    the (id, nn_sim) column slice, never of vectors. Missing
    neighbors (empty base) count as admitted at every threshold,
    matching the admission operator's bootstrap semantics.
    ``thr_x10`` is an integer so threshold levels carry no float
    identity; the compare uses ``nn_sim < thr_x10/10.0`` — the same
    IEEE division in both engines.
    """
    nn = embedding_novelty_admission(base, delta, id_col=id_col,
                                     vec_col=vec_col)
    levels = base.sparkSession.range(1, max_thr_x10 + 1).select(
        F.col("id").cast("int").alias("thr_x10")
    )
    return (
        nn.select("nn_sim")
        .crossJoin(levels)
        .groupBy("thr_x10")
        .agg(
            F.sum(
                F.when(
                    F.col("nn_sim").isNull()
                    | (F.col("nn_sim") < F.col("thr_x10") / F.lit(10.0)),
                    1,
                ).otherwise(0)
            ).alias("n_admit"),
            F.count("*").alias("n_total"),
        )
        .select(
            "thr_x10",
            F.col("n_admit").cast("long").alias("n_admit"),
            "n_total",
            F.when(
                F.col("n_total") > 0,
                F.round(F.col("n_admit") / F.col("n_total"), 6),
            ).alias("admit_rate"),
        )
        .orderBy("thr_x10")
    )


def hard_negative_topk(
    embeddings: DataFrame,
    anchors: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor, the ``k``
    highest-cosine vectors with a DIFFERENT label →
    ``(q_id, vec_id, label, cos_sim)`` — the negatives that sit
    closest to the decision boundary, which is what embedding-model
    training wants in its contrastive batches (the public
    in-batch-negatives / ANCE recipe).

    Same kNN-join shape as :func:`cosine_topk_batch`: the anchor set
    broadcasts, every corpus partition scores all anchors locally
    with the label inequality applied ON the scan (a hard negative
    never materializes same-label pairs), and the per-anchor top-k
    plans as ``WindowGroupLimit`` (map-side heaps before the
    shuffle). Zero-norm vectors are filtered on BOTH sides before
    any division (Spark 4 ANSI raises on divide-by-zero; the oracle
    mirrors the predicate so row sets stay parity-exact).
    """
    q = anchors.select(
        F.col(id_col).alias("q_id"),
        F.col(label_col).alias("q_label"),
        F.col(vec_col).alias("_qvec"),
        F.sqrt(_norm2(F.col(vec_col))).alias("_qnrm"),
    ).filter(F.col("_qnrm") > 0)
    scored = (
        embeddings.select(
            id_col,
            label_col,
            vec_col,
            F.sqrt(_norm2(F.col(vec_col))).alias("_nrm"),
        )
        .filter(F.col("_nrm") > 0)
        .crossJoin(F.broadcast(q))
        .filter(F.col(label_col) != F.col("q_label"))
        .select(
            "q_id",
            id_col,
            label_col,
            F.round(
                _dot(F.col(vec_col), F.col("_qvec"))
                / (F.col("_nrm") * F.col("_qnrm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select("q_id", id_col, label_col, "cos_sim")
    )
