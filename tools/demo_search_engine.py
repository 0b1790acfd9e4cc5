#!/usr/bin/env python
"""Executable documentation: the reference's full workflow on this
engine, end to end, from the reference's own input format.

The reference user runs 5 MapReduce jobs over a WikiExtractor
JSON-lines dump:
    hadoop jar ... Vocabulary  corpus/ vocab/ docmeta/
    hadoop jar ... Indexer     vocab/ corpus/ index/
    hadoop jar ... Query       vocab/ index/ out/ docmeta/ 10 "query"
Here that is three function calls on one lazy DAG.

Usage: python tools/demo_search_engine.py [corpus_dir] [query]
(with no args, builds a tiny demo corpus in /tmp first)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_elephant_spark.operators.index import build_index, parse_documents
from bigdata_elephant_spark.operators.search import search
from bigdata_elephant_spark.operators.vocab import build_vocabulary
from bigdata_elephant_spark.session import get_spark
from bigdata_elephant_spark.sources.corpus import read_corpus

DEMO_DOCS = [
    {"id": 1, "url": "https://x/1", "title": "Hash joins",
     "text": "The hash join builds a table and probes it."},
    {"id": 2, "url": "https://x/2", "title": "Sort merge",
     "text": "A sort merge join sorts both sides then merges."},
    {"id": 3, "url": "https://x/3", "title": "Broadcast",
     "text": "Broadcast the small side; probe with the big side."},
    {"id": 4, "url": "https://x/4", "title": "Good person",
     "text": "The good person reads the query plan."},
]


def make_demo_corpus() -> str:
    d = tempfile.mkdtemp(prefix="elephant_demo_")
    with open(f"{d}/AA_wiki_00", "w") as f:
        for doc in DEMO_DOCS:
            f.write(json.dumps(doc) + "\n")
    return d


def main() -> None:
    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else make_demo_corpus()
    query = sys.argv[2] if len(sys.argv) > 2 else "the good person"

    spark = get_spark("elephant-demo", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = read_corpus(spark, corpus_dir, glob="AA*")
    vocab = build_vocabulary(corpus).persist()
    postings = build_index(corpus, vocab)
    doc_meta = parse_documents(corpus)

    print(f"\ncorpus: {corpus.count()} docs | "
          f"vocabulary: {vocab.count()} words | "
          f"postings: {postings.count()} entries", file=sys.stderr)

    for mode in ("reference", "smooth"):
        result = search(
            spark, query, vocab, postings, doc_meta=doc_meta,
            k=10, scoring=mode, n_docs=corpus.count(),
        )
        print(f"\n== top-10 for {query!r} (scoring={mode}) ==",
              file=sys.stderr)
        for r in result.collect():
            print(f"  {r['score']:<12} {r['title']:<16} {r['url']}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
