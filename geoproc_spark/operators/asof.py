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

    NULL contract (pinned to SQL comparison semantics, ADVICE r02): a left
    row with NULL ts or NULL key gets NULL matches (no `right.ts <= NULL`
    is satisfiable; NULL keys never join-equal anything), and NULL-key /
    NULL-ts right rows can never match. Both are routed explicitly below —
    NEVER left to engine-specific NULL ordering, which diverges between
    Spark (ascending NULLS FIRST) and the SQL oracle (NULLS LAST).
    """
    from pyspark.sql import types as T

    carried = [right_id_col] + right_value_cols
    rtypes = dict(zip(right.schema.names, [f.dataType for f in right.schema.fields]))
    ltypes = dict(zip(left.schema.names, [f.dataType for f in left.schema.fields]))
    # ALL carried right columns travel as ONE nullable struct, so the id and
    # its values are carried ATOMICALLY — per-column last(ignorenulls) would
    # tear rows when a right value is genuinely NULL (id from one row, value
    # from an earlier one)
    carry_type = T.StructType([T.StructField(c, rtypes[c]) for c in carried])
    # side-specific ordering columns: right and left ids may have different
    # types (a shared _ord_id column would union-coerce and corrupt order)
    # left rows that can never match (NULL ts / NULL key) bypass the window
    # entirely and come back as explicit NULL-match rows at the end
    matchable = F.col(ts_col).isNotNull() & F.col(key_col).isNotNull()
    left_null = left.filter(~matchable).select(
        F.col(left_id_col),
        F.col(key_col),
        F.col(ts_col),
        *[F.lit(None).cast(rtypes[c]).alias(f"asof_{c}") for c in carried],
    )
    left = left.filter(matchable)
    r = right.filter(
        # a NULL-ts or NULL-key right can never satisfy the match predicate;
        # unfiltered, NULL ts would sort NULLS FIRST and pollute every left
        # row, and NULL keys would partition together and "match" NULL lefts
        matchable
    ).select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_side"),  # rights first at equal ts
        F.col(right_id_col).alias("_r_ord"),
        F.lit(None).cast(ltypes[left_id_col]).alias("_l_ord"),
        F.lit(None).cast(ltypes[left_id_col]).alias("_left_id"),
        F.struct(*[F.col(c) for c in carried]).alias("_r"),
    )
    l = left.select(  # noqa: E741
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtypes[right_id_col]).alias("_r_ord"),
        F.col(left_id_col).alias("_l_ord"),
        F.col(left_id_col).alias("_left_id"),
        F.lit(None).cast(carry_type).alias("_r"),
    )
    u = r.unionByName(l)
    # within one (ts, side) run only that side's ord column is non-null, so
    # each side orders by its own id; the other column is constant NULL
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_side", "_r_ord", "_l_ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.select(
        key_col,
        ts_col,
        "_side",
        "_left_id",
        F.last("_r", ignorenulls=True).over(w).alias("_m"),
    )
    out = matched.filter(F.col("_side") == 1).select(
        F.col("_left_id").alias(left_id_col),
        key_col,
        ts_col,
        *[F.col("_m").getField(c).alias(f"asof_{c}") for c in carried],
    )
    return out.unionByName(left_null)
