"""The shared memo eviction rule (operators/memo.py, r15 review):
pure-dict tests so the invariant both memos rely on is pinned without
a SparkSession."""

from __future__ import annotations

from data_engineering_rag_spark.operators.memo import reuse_enabled, scoped_put


def test_reuse_flag_default_off(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_TFIDF_REUSE", raising=False)
    assert not reuse_enabled()
    monkeypatch.setenv("SPARK_GRAFT_TFIDF_REUSE", "1")
    assert reuse_enabled()
    monkeypatch.setenv("SPARK_GRAFT_TFIDF_REUSE", "0")
    assert not reuse_enabled()


def test_same_scope_entries_coexist_without_exclusive():
    """The rag.py shape: docs + chunks models share one (session,
    sf_dir) scope and must coexist."""
    memo, dropped = {}, []
    scoped_put(memo, ("s1", "sf", "docs"), "m1", dropped.append)
    scoped_put(memo, ("s1", "sf", "chunks"), "m2", dropped.append)
    assert memo == {("s1", "sf", "docs"): "m1", ("s1", "sf", "chunks"): "m2"}
    assert dropped == []


def test_other_scope_evicted_and_unpersisted():
    memo, dropped = {}, []
    scoped_put(memo, ("s1", "sf_a", "docs"), "m1", dropped.append)
    scoped_put(memo, ("s1", "sf_b", "docs"), "m2", dropped.append)
    assert memo == {("s1", "sf_b", "docs"): "m2"}
    assert dropped == ["m1"]


def test_exclusive_scope_supersedes_same_scope_params():
    """The lsh_ml shape (r15 review finding): each value pins its own
    persisted table, so a same-corpus param sweep must supersede the
    prior entry, not accumulate persisted copies."""
    memo, dropped = {}, []
    scoped_put(memo, ("s1", "corp", 8), "v8", dropped.append, exclusive_scope=True)
    scoped_put(memo, ("s1", "corp", 16), "v16", dropped.append, exclusive_scope=True)
    assert memo == {("s1", "corp", 16): "v16"}
    assert dropped == ["v8"]
    # re-putting the SAME key replaces without self-unpersist
    scoped_put(memo, ("s1", "corp", 16), "v16b", dropped.append, exclusive_scope=True)
    assert memo == {("s1", "corp", 16): "v16b"}
    assert dropped == ["v8"]


def test_unpersist_failure_is_swallowed():
    memo = {}

    def boom(_v):
        raise RuntimeError("stopped session")

    scoped_put(memo, ("s1", "a", 0), "m1", boom)
    scoped_put(memo, ("s1", "b", 0), "m2", boom)  # eviction must not raise
    assert memo == {("s1", "b", 0): "m2"}
