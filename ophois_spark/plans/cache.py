"""Named cache slots for operators that persist intermediate lineage.

Operators like ``shingle_jaccard_pairs`` / ``near_dup_pairs`` persist a
small intermediate (shingle rows, band buckets) that several branches of
the returned plan read. A returned lazy DataFrame can't self-unpersist,
so without bookkeeping every re-invocation in one session leaks a cache
block (and the only global remedy, ``spark.catalog.clearCache()``, also
evicts unrelated caches such as the session component-label cache).

``swap_cached(slot, df)`` keeps at most ONE live block per named slot:
re-invoking the operator unpersists the previous block before persisting
the new one. Unpersisting is always safe — a previously returned lazy
result that still references the old block simply recomputes its
lineage (Spark semantics), it never breaks. ``release(slot)`` frees a
slot explicitly (e.g. after the last action on the result).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_SLOTS: dict[str, DataFrame] = {}


def swap_cached(
    slot: str,
    df: DataFrame,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` under ``slot``, unpersisting the slot's previous
    occupant (lazy: no job runs here; the first action materializes)."""
    release(slot)
    out = df.persist(storage_level)
    _SLOTS[slot] = out
    return out


def release(slot: str) -> None:
    """Unpersist and forget the slot's cached block, if any."""
    prev = _SLOTS.pop(slot, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass  # session already stopped — nothing to free


def live_slots() -> list[str]:
    return sorted(_SLOTS)
