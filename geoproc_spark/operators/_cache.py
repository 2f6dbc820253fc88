"""Bounded per-operator persist registry.

Operators that persist an intermediate (LSH bands, cell-keyed pages) return
lazy DataFrames whose plans reference the cached data, so they cannot
unpersist before the caller's action. Left alone, every call in a
long-lived session pins another copy in executor storage (ADVICE r01).
`swap_cache` bounds that to ONE cached lineage per operator key: each call
unpersists the previous call's cache before persisting its own.

Thread safety (ADVICE r02): bench.py and real pipelines run jobs on
threads, so the registry swap is guarded by a lock — without it two
concurrent callers could both persist and leak one lineage, or one could
unpersist the other's cache mid-swap. Note the semantic contract is
unchanged and caller-visible: interleaved calls under the SAME key with
different inputs still evict each other (results stay correct — eviction
only drops the cache, never the data); callers that need two live caches
use distinct keys.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LAST: dict[str, DataFrame] = {}
_LOCK = threading.Lock()


def swap_cache(key: str, df: DataFrame) -> DataFrame:
    cached = df.persist()
    with _LOCK:
        prev = _LAST.get(key)
        _LAST[key] = cached
    if prev is not None and prev is not cached:
        try:
            prev.unpersist()
        except Exception:
            pass  # session may be gone; nothing to release
    return cached


def release(key: str) -> None:
    with _LOCK:
        prev = _LAST.pop(key, None)
    if prev is not None:
        prev.unpersist()
