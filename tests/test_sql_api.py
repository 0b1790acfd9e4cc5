"""The whole engine is reachable through plain spark.sql."""

from __future__ import annotations

from bigdata_elephant_spark.sql_api import register_views


def test_sql_over_derived_views(spark, sf_dir):
    names = register_views(spark, sf_dir)
    assert {"lineitem", "vocabulary", "postings", "doc_meta"} <= set(names)
    row = spark.sql("""
        SELECT count(*) AS n
        FROM postings p JOIN vocabulary v USING (word_id)
        WHERE v.df > 1
    """).collect()[0]
    assert row["n"] > 0


def test_view_filter_reaches_scan(spark, sf_dir):
    """Catalyst optimizes through the view: a filter typed in SQL on
    the raw table view lands in the parquet scan as a pushed filter."""
    register_views(spark, sf_dir, derived=False)
    df = spark.sql(
        "SELECT o_orderkey FROM orders WHERE o_totalprice > 100000"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan


def test_register_llm_views_queryable(spark, sf_dir):
    from bigdata_elephant_spark.sql_api import register_views

    names = register_views(spark, sf_dir, derived=False, llm=True)
    assert {"quality_scores", "doc_vectors", "doc_stats"} <= set(names)
    # dup_groups is opt-in: connected components is iterative so its
    # view is an eagerly-computed snapshot, not a lazy plan.
    assert "dup_groups" not in names
    # a SQL user can join the curation surface directly
    row = spark.sql(
        """
        SELECT count(*) AS n
        FROM quality_scores q JOIN doc_stats s USING (doc_id)
        WHERE q.keep
        """
    ).first()
    assert row.n > 0
    assert spark.sql(
        "SELECT count(*) AS n FROM doc_vectors"
    ).first().n > 0


def test_register_dup_groups_snapshot(spark, sf_dir):
    names = register_views(
        spark, sf_dir, derived=False, dup_groups=True
    )
    assert "dup_groups" in names
    assert spark.sql(
        "SELECT count(*) AS n FROM dup_groups"
    ).first().n >= 0
