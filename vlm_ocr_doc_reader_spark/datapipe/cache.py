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
full_description) do.  Because a caller can silently lose the attribute
(``curate_corpus(...).filter(...)``), every attached handle is ALSO
tracked in a module-level registry: ``release_all_cached()`` frees
everything still outstanding, and ``outstanding_cached()`` reports leaks
(both useful at the end of a batch job or in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_cached_deps"

# every handle ever attached, STRONGLY referenced — the JVM CacheManager
# holds the persisted data regardless of the Python wrapper's lifetime, so
# a weak registry would lose the handle in exactly the lost-attribute
# scenario it exists for (result frame garbage-collected right after an
# action); entries leave the registry when released or observed
# unpersisted
_REGISTRY: set = set()


def _is_persisted(h) -> bool:
    try:
        sl = h.storageLevel
        return bool(sl.useMemory or sl.useDisk or sl.useOffHeap)
    except Exception:
        return False


def attach_cached_deps(df: DataFrame, *deps) -> DataFrame:
    """Record persisted ``deps`` (DataFrames, or frames carrying their own
    ``_cached_deps``) on ``df`` so ``release_cached(df)`` can free them.
    Folds in handles already attached to both ``df`` and each dep."""
    handles = list(getattr(df, _ATTR, []))
    for d in deps:
        handles.extend(getattr(d, _ATTR, []))
        if isinstance(d, DataFrame) and _is_persisted(d):
            handles.append(d)  # only actually-persisted frames
    if handles:
        setattr(df, _ATTR, handles)
        _REGISTRY.update(handles)
        # bound registry growth: drop anything already unpersisted by
        # other paths (their JVM cache entries are gone)
        for h in [h for h in _REGISTRY if not _is_persisted(h)]:
            _REGISTRY.discard(h)
    return df


def outstanding_cached() -> list[DataFrame]:
    """Handles attached by package operators that are still persisted —
    a non-empty result after a batch completes means some caller dropped
    the handle convention (e.g. transformed the result frame before
    releasing)."""
    return [h for h in _REGISTRY if _is_persisted(h)]


def release_all_cached() -> int:
    """Unpersist every outstanding registered handle (safety net for
    callers who lost the per-frame attribute); returns how many were
    released."""
    n = 0
    for h in outstanding_cached():
        try:
            h.unpersist()
            n += 1
        except Exception:
            pass
        _REGISTRY.discard(h)
    return n


def release_cached(df: DataFrame) -> None:
    """Unpersist every cached intermediate attached to ``df``.  Call AFTER
    the result is materialized; idempotent; no-op without handles."""
    for h in getattr(df, _ATTR, []):
        try:
            h.unpersist()
        except Exception:
            pass
        _REGISTRY.discard(h)
    setattr(df, _ATTR, [])
