"""Corpus source: schema'd JSON-lines read + glob pruning (O1/O2)."""

from __future__ import annotations

import json

from bigdata_elephant_spark.sources.corpus import read_corpus


def _write_shard(path, docs):
    with open(path, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def test_read_corpus_schema_and_cast(spark, tmp_path):
    _write_shard(
        tmp_path / "AA_wiki_00",
        [
            {"id": "12", "url": "u", "title": "t", "text": "hello"},
            {"id": 13, "url": "u2", "title": "t2", "text": "world"},
        ],
    )
    df = read_corpus(spark, str(tmp_path))
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "url", "title", "text",
    ]
    assert df.schema["doc_id"].dataType.simpleString() == "bigint"
    rows = {r["doc_id"]: r["text"] for r in df.collect()}
    # id arrives quoted in one shard and bare in another — both land
    # as long (the reference parsed it 3 different ways; SURVEY §1.2)
    assert rows == {12: "hello", 13: "world"}


def test_read_corpus_glob_pruning(spark, tmp_path):
    _write_shard(tmp_path / "AA_wiki_00", [
        {"id": 1, "url": "u", "title": "t", "text": "kept"}])
    _write_shard(tmp_path / "AB_wiki_00", [
        {"id": 2, "url": "u", "title": "t", "text": "pruned"}])
    df = read_corpus(spark, str(tmp_path), glob="AA*")
    assert [r["doc_id"] for r in df.collect()] == [1]


def test_read_corpus_permissive_drops_malformed(spark, tmp_path):
    p = tmp_path / "AA_bad"
    p.write_text(
        '{"id": 1, "url": "u", "title": "t", "text": "good"}\n'
        "this is not json at all\n"
        '{"id": "not_a_number", "url": "u", "title": "t", "text": "x"}\n'
        '{"id": 2, "url": "u", "title": "t", "text": "also good"}\n'
    )
    df = read_corpus(spark, str(tmp_path))
    assert sorted(r["doc_id"] for r in df.collect()) == [1, 2]


def test_read_corpus_failfast_raises(spark, tmp_path):
    import pytest as _pytest

    p = tmp_path / "AA_bad"
    p.write_text(
        '{"id": 1, "url": "u", "title": "t", "text": "good"}\n'
        "garbage\n"
    )
    with _pytest.raises(Exception):
        read_corpus(spark, str(tmp_path), mode="FAILFAST").collect()


def test_read_corpus_csv_quarantine(spark, tmp_path):
    """One scan, two lanes: good rows get the standard corpus frame;
    short lines and unparsable ids land in the quarantine with a
    reason instead of vanishing (plain PERMISSIVE) or killing the
    job (FAILFAST)."""
    from bigdata_elephant_spark.sources.corpus import read_corpus_csv

    p = tmp_path / "shard.csv"
    p.write_text(
        "id,url,title,text\n"
        "1,u1,t1,hello world\n"
        "oops-not-an-id,u2,t2,text\n"
        "2,u3,t3,more text\n"
        "3,only-two-fields\n"
    )
    good, quarantined = read_corpus_csv(spark, str(p))
    rows = {r["doc_id"]: r["text"] for r in good.collect()}
    assert rows == {1: "hello world", 2: "more text"}
    qrows = quarantined.collect()
    q = {r["reason"] for r in qrows}
    # the header line is captured in the quarantine lane (reason
    # "header_line"), never silently dropped — so a data row that
    # happens to equal the header string is auditable, not lost.
    assert quarantined.count() == 3
    assert q == {"header_line", "bad_id", "malformed_line"}
    # header-identical lines ANYWHERE in the file (e.g. concatenated
    # shards) are also captured, and never contaminate the good lane
    p2 = tmp_path / "concat.csv"
    p2.write_text(
        "id,url,title,text\n"
        "1,u1,t1,hello\n"
        "id,url,title,text\n"
        "2,u2,t2,world\n"
    )
    good2, quarantined2 = read_corpus_csv(spark, str(p2))
    assert good2.count() == 2
    hdrs = quarantined2.filter("reason = 'header_line'").count()
    assert hdrs == 2
    # same downstream contract as the JSON reader
    assert [f.name for f in good.schema.fields] == [
        "doc_id", "url", "title", "text",
    ]


def test_read_parquet_evolved_merges_generations(spark, tmp_path):
    """Old files null-fill later-added columns; the union schema
    covers every generation; filters still push down."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.sources.corpus import read_parquet_evolved

    gen1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    gen2 = spark.createDataFrame(
        [(3, "c", "en"), (4, "d", "fr")],
        "doc_id long, text string, lang string",
    )
    gen1.write.parquet(str(tmp_path / "t"), mode="append")
    gen2.write.parquet(str(tmp_path / "t"), mode="append")

    df = read_parquet_evolved(spark, str(tmp_path / "t"))
    assert set(df.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r["lang"] for r in df.collect()}
    assert rows == {1: None, 2: None, 3: "en", 4: "fr"}
    # pruning/pushdown still reach the scan across generations
    plan = df.filter(F.col("doc_id") == 3).select("lang")._jdf \
        .queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,3)]" in plan
