"""Artifact-cache lifetime (see pipeline_queries._index_artifacts):
resolving artifacts touches the cache dir's mtime — parquet reads
alone don't — and a cold build's sweep removes only siblings
untouched for >7 days, never a just-used dir. Together these make a
resolve-then-sweep sequence safe for every concurrent reader inside
the window."""

from __future__ import annotations

import os
import shutil
import time

from bigdata_elephant_spark.plans.pipeline_queries import (
    _artifact_base,
    _index_artifacts,
)


def test_resolve_touches_and_sweep_spares_fresh(spark, sf_dir, tmp_path):
    # Warm up: ensure artifacts exist for the shared test corpus.
    _index_artifacts(spark, sf_dir)
    base = _artifact_base(sf_dir)
    assert os.path.exists(base)

    # Backdate the dir, resolve again (warm): the RESOLVE alone must
    # refresh the mtime.
    old = time.time() - 3 * 86400
    os.utime(base, (old, old))
    _index_artifacts(spark, sf_dir)
    assert os.path.getmtime(base) > time.time() - 3600

    # Stage two siblings in the shared cache parent: one stale
    # (>7 days untouched) and one fresh.
    parent = os.path.dirname(base)
    stale = os.path.join(parent, "test_sib_stale")
    fresh = os.path.join(parent, "test_sib_fresh")
    for d in (stale, fresh):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    very_old = time.time() - 8 * 86400
    os.utime(stale, (very_old, very_old))

    # Trigger a COLD build under a different cache key: a scratch
    # corpus dir holding a copy of the documents table.
    scratch = tmp_path / "corpus"
    scratch.mkdir()
    src = os.path.join(sf_dir, "documents.parquet")
    dst = str(scratch / "documents.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    try:
        _index_artifacts(spark, str(scratch))
        # just-used dirs survive the sweep; only the stale one goes
        assert os.path.exists(base)
        assert os.path.exists(fresh)
        assert not os.path.exists(stale)
    finally:
        shutil.rmtree(
            _artifact_base(str(scratch)), ignore_errors=True
        )
        shutil.rmtree(fresh, ignore_errors=True)
        shutil.rmtree(stale, ignore_errors=True)
