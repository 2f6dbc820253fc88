"""As-of join — a time-series operator Spark's built-ins lack (task brief:
"as-of join, range join, ..."), expressed as a composition of existing
DataFrame ops (union + window), per the custom-operator ladder: built-in
composition first, pandas UDF only when semantics demand it.

Semantics (pinned): for each left row, the right row of the same key with
the greatest (ts, right-tie-break-id) such that right.ts <= left.ts; left
rows with no prior right match get NULLs.

Plan shape: union both sides tagged, ONE shuffle+sort on (key, ts,
side-order, id), then `last(..., ignorenulls=True)` over the unbounded
preceding frame carries the latest right attributes forward into each left
row. No join node at all — the classic sort-merge as-of, and the shuffle
is on the key, so a key-bucketed table layout makes it exchange-free
(sources/bucketed.py). Skewed hot keys take the same salting/AQE story as
the spatial join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_id_col: str,
    right_value_cols: list[str],
    left_id_col: str,
) -> DataFrame:
    """Returns left's (key, ts, left_id) plus, per right_value_cols and the
    right id, the as-of matched values (NULL when no right row precedes).

    Ordering at equal timestamps: right rows sort BEFORE left rows (a right
    row at exactly left.ts matches, i.e. <= semantics), and among equal-ts
    right rows the largest right_id wins (deterministic tie-break).
    """
    carried = [right_id_col] + right_value_cols
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_side"),  # rights first at equal ts
        F.col(right_id_col).alias("_ord_id"),
        F.lit(None).cast("bigint").alias("_left_id"),
        *[F.col(c).alias(f"_r_{c}") for c in carried],
    )
    l = left.select(  # noqa: E741
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.col(left_id_col).alias("_ord_id"),
        F.col(left_id_col).cast("bigint").alias("_left_id"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in carried],
    )
    u = r.unionByName(l)
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_side", "_ord_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.select(
        key_col,
        ts_col,
        "_side",
        "_left_id",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in carried
        ],
    )
    return matched.filter(F.col("_side") == 1).select(
        F.col("_left_id").alias(left_id_col),
        key_col,
        ts_col,
        *[F.col(f"asof_{c}") for c in carried],
    )
