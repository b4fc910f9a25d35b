"""Shared fitted-artifact memo plumbing (r15 review cleanup).

Two memos reuse expensive fitted artifacts across calls in one process
under the SAME opt-in flag: ``plans/rag.py`` (TF-IDF doc/chunk models,
r13) and ``operators/lsh_ml.py`` (ML CountVectorizer+MinHashLSH fits,
r15). The flag check and the bounded-memory eviction rule live here —
one definition each, so the flag's semantics and the eviction policy
cannot drift between the two (the r14/r15 VERDICTs' "two idioms, one
rule" lesson applied to memos).

Memo keys are tuples whose first two elements are the SCOPE:
``(SparkSession, corpus identity)``. The eviction invariant: inserting
an entry drops (and unpersists) every entry from any OTHER scope — a
process that switches sf_dirs or restarts sessions holds only the
current scope's artifacts. ``exclusive_scope=True`` additionally drops
same-scope entries under different full keys (different fit params),
for memos whose values each pin their own persisted table — otherwise
a param sweep would accumulate one persisted copy per combination.

Lifecycle contract for long-lived hosts (r16, VERDICT item 6 +
ADVICE): eviction happens ON INSERT, so the LAST scope's entries — a
strong SparkSession reference in the key, persisted DataFrames/fitted
models in the value — live until the next ``scoped_put`` in a
different scope or an explicit clear. A host that (a) stops or
restarts its SparkSession, or (b) finishes a bench/soak leg and will
not memo-fit again, must call BOTH clears first::

    from data_engineering_rag_spark.plans.rag import clear_tfidf_memo
    from data_engineering_rag_spark.operators.lsh_ml import clear_ml_lsh_memo
    clear_tfidf_memo(); clear_ml_lsh_memo()

Stopping a session WITHOUT clearing leaks the session object and its
persisted handles for the process lifetime (mitigated by the
default-OFF flag: memo-free runs hold nothing).
``scripts/soak_registry.py`` calls both on exit — the reference
teardown. Switching sf_dirs mid-process needs no manual clear (the
scope eviction covers it) but keeps the final sf_dir's tables pinned
until cleared.
"""

from __future__ import annotations


def reuse_enabled() -> bool:
    """The process-wide fitted-artifact reuse switch (default OFF →
    every caller's behavior is byte-identical to the memo-free path)."""
    import os

    return os.environ.get("SPARK_GRAFT_TFIDF_REUSE", "") == "1"


def scoped_put(memo: dict, key: tuple, value, unpersist, exclusive_scope: bool = False) -> None:
    """Insert ``memo[key] = value``, evicting stale entries per the
    module invariant. ``unpersist(stale_value)`` releases a dropped
    entry's cached tables; its failures are swallowed (a stopped
    SparkSession makes unpersist moot)."""
    scope = key[:2]
    stale_keys = [
        k for k in memo
        if k[:2] != scope or (exclusive_scope and k != key)
    ]
    for stale in stale_keys:
        try:
            unpersist(memo[stale])
        except Exception:
            pass
        del memo[stale]
    memo[key] = value
