"""Persist lifecycle for catalog query builders.

Several builders persist per-round intermediates (BPE merge rounds,
PageRank iterations, the triangle-count edge list): the cache bounds
recompute while the SAME invocation's final action runs, but the frames
are dead weight the moment that action finishes. The builders return
lazy DataFrames, so they cannot unpersist at the right moment
themselves — Spark has no "child materialized" callback — and relying
on the bench harness's ``catalog.clearCache()`` leaks cached corpora in
any *composed* use (several builders called in one long-lived session).

``scoped_persist(df, scope)`` makes the leak bounded instead: each frame
registers under its builder's scope, and ``begin_scope(scope)`` — called
on entry to the builder — releases every frame the same builder
registered on its PREVIOUS invocation. Unpersisting a frame a
still-uncollected older result depends on only costs recompute, never
correctness (lineage is intact), so the worst case of interleaved use is
a cache miss. Net contract: at most one invocation's worth of cached
state per builder per session, regardless of how many times the catalog
runs; ``release_all()`` drops even that (the bench harness equivalent of
``clearCache`` scoped to what this package created).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: dict[str, list[DataFrame]] = {}


def scoped_persist(df: DataFrame, scope: str, keep: int | None = None) -> DataFrame:
    """Persist ``df`` and register it under ``scope`` for later release.

    ``keep`` bounds the scope to its newest N frames — the form for
    shared operator HELPERS, which may legitimately hold several live
    frames within one composed plan (e.g. incremental dedup builds the
    corpus index and the batch index from the same helper), so a
    begin_scope() on entry would evict a frame the pending plan still
    wants cached. N is chosen per helper as (frames per call) x (a small
    number of concurrently-pending plans); overflow eviction only costs
    recompute, never correctness.
    """
    df = df.persist()
    frames = _TRACKED.setdefault(scope, [])
    frames.append(df)
    if keep is not None:
        while len(frames) > keep:
            try:
                frames.pop(0).unpersist(blocking=False)
            except Exception:
                pass
    return df


def release_scope(scope: str) -> None:
    """Unpersist every frame registered under ``scope`` (non-blocking)."""
    for df in _TRACKED.pop(scope, []):
        try:
            df.unpersist(blocking=False)
        except Exception:
            # the owning SparkSession may already be stopped (test
            # teardown) — nothing left to release
            pass


def begin_scope(scope: str) -> None:
    """Builder entry hook: supersede the previous invocation's frames."""
    release_scope(scope)


def release_all() -> None:
    """Release every scope this package registered."""
    for scope in list(_TRACKED):
        release_scope(scope)
