"""Scoped persist/release for composed operators.

Composed plans (LSH banding, near-dup verification, curation) persist
intermediate relations that several downstream joins consume — without
materialization Spark recomputes the whole upstream subtree once per
consumer. A bare ``df.persist()`` leaks executor memory in a long-lived
session, so every persist those operators take is routed through a
:class:`CacheScope` the CALLER owns: release is deterministic
(``with cache_scope() as scope: ... action ...`` → unpersist on exit),
and a one-shot job that never releases simply lets session teardown do
it — the same contract as before, now opt-out instead of unavoidable.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


class CacheScope:
    """Registry of DataFrames persisted on behalf of a composed operator.

    ``scope.persist(df)`` persists and tracks ``df``; ``scope.release()``
    unpersists everything tracked (idempotent). Use via
    :func:`cache_scope` so release runs even on error. Release only
    AFTER the consuming action has executed — the returned DataFrames
    are lazy and an early unpersist silently degrades to recompute.
    """

    def __init__(self) -> None:
        self._dfs: list[DataFrame] = []

    def persist(self, df: DataFrame) -> DataFrame:
        df = df.persist()
        self._dfs.append(df)
        return df

    def release(self) -> None:
        while self._dfs:
            self._dfs.pop().unpersist()


class _SessionScope(CacheScope):
    """Fallback when the caller passes ``scope=None``: persists are real
    but tracked nowhere — they live until ``spark.catalog.clearCache()``
    or session stop. Right for one-shot jobs; long-lived sessions should
    pass an explicit scope."""

    def persist(self, df: DataFrame) -> DataFrame:
        return df.persist()


SESSION_SCOPE = _SessionScope()


@contextmanager
def cache_scope():
    scope = CacheScope()
    try:
        yield scope
    finally:
        scope.release()


def resolve(scope: CacheScope | None) -> CacheScope:
    return scope if scope is not None else SESSION_SCOPE
