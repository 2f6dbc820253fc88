"""Bounded per-operator persist registry.

Operators that persist an intermediate (LSH bands, cell-keyed pages) return
lazy DataFrames whose plans reference the cached data, so they cannot
unpersist before the caller's action. Left alone, every call in a
long-lived session pins another copy in executor storage (ADVICE r01).
`swap_cache` bounds that to ONE cached lineage per operator key: each call
unpersists the previous call's cache before persisting its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LAST: dict[str, DataFrame] = {}


def swap_cache(key: str, df: DataFrame) -> DataFrame:
    prev = _LAST.get(key)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass  # session may be gone; nothing to release
    _LAST[key] = df.persist()
    return _LAST[key]


def release(key: str) -> None:
    prev = _LAST.pop(key, None)
    if prev is not None:
        prev.unpersist()
