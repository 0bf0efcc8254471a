"""Cache-lifecycle plumbing for operators that persist intermediates.

Several operators persist a frame that feeds multiple plan branches
(LSH bands, shingle tables, classified spans).  The persist is the right
default — without it Catalyst re-runs the expensive upstream per branch —
but a long-lived session calling such operators in a loop would
accumulate cached partitions forever.  Convention:

  * an operator that persists attaches the handles to its RESULT via
    ``attach_cached_deps`` (composing operators also fold in their
    inputs' handles, so the top of a composition sees every cache below);
  * callers release everything after materializing with
    ``release_cached(result)`` — idempotent, no-op when nothing is
    attached.

The attribute does not survive further DataFrame transformations (Spark
returns new objects), so compositions must propagate handles explicitly —
which the in-package compositions (curate_corpus, decontaminate,
full_description) do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_cached_deps"


def attach_cached_deps(df: DataFrame, *deps) -> DataFrame:
    """Record persisted ``deps`` (DataFrames, or frames carrying their own
    ``_cached_deps``) on ``df`` so ``release_cached(df)`` can free them.
    Folds in handles already attached to both ``df`` and each dep."""
    handles = list(getattr(df, _ATTR, []))
    for d in deps:
        handles.extend(getattr(d, _ATTR, []))
        if isinstance(d, DataFrame):
            sl = d.storageLevel
            if sl.useMemory or sl.useDisk or sl.useOffHeap:
                handles.append(d)  # only actually-persisted frames
    if handles:
        setattr(df, _ATTR, handles)
    return df


def release_cached(df: DataFrame) -> None:
    """Unpersist every cached intermediate attached to ``df``.  Call AFTER
    the result is materialized; idempotent; no-op without handles."""
    for h in getattr(df, _ATTR, []):
        try:
            h.unpersist()
        except Exception:
            pass
    setattr(df, _ATTR, [])
