"""Bucketed (cell-prefix co-located) table layout — the shuffle-free join.

SURVEY §4.2 / north_rule: the pages table is partitioned by cell prefix so
joins and aggregations keyed on the cell need no Exchange. Plain Hive-style
directory partitioning gives partition PRUNING but no co-location guarantee
Catalyst can exploit; Spark's bucketed tables (`bucketBy` + saveAsTable) do:
a scan of a table bucketed on `cell_p` reports HashPartitioning(cell_p), so
a groupBy(cell_p) or a join with an equally-bucketed table plans with ZERO
Exchange on that side. This is the single-box stand-in for Iceberg's
`bucket(N, cell_p)` partition transform + storage-partitioned joins — the
call sites are identical shape (write with a bucket spec, read by name).

At 100 TB: bucket count is cluster-width-sized (e.g. 4096), the cell prefix
is coarse enough that every polygon covering-cell set maps into few
buckets, and the expensive pages side never moves — only the small polygon
side shuffles into place (or broadcasts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize `df` as a bucketed managed table (overwrites).

    Re-run safe across sessions: a managed table whose warehouse directory
    survived a previous session (catalog entry gone, files present) makes
    saveAsTable fail with LOCATION_ALREADY_EXISTS — drop the catalog entry
    AND clear a derelict location first. The derelict cleanup is guarded:
    unqualified default-catalog names only (a qualified 'db.tbl' would make
    the <warehouse>/<name> guess wrong), and the directory is deleted only
    if every entry in it looks Spark-written (part-*/bucket files,
    _SUCCESS, _temporary, dotfiles) — anything else raises instead of
    silently destroying a path the warehouse conf happens to point at."""
    import os
    import re
    import shutil

    if "." in table:
        raise ValueError(
            f"write_bucketed takes an unqualified default-database table "
            f"name, got {table!r} (the derelict-location cleanup cannot "
            f"guess a qualified table's directory)"
        )
    spark = df.sparkSession
    # managed-table DROP removes both catalog entry and files
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.exists(loc):
        spark_made = re.compile(r"^(part-|_SUCCESS|_temporary|_committed|_started|\.)")
        stray = [e for e in os.listdir(loc) if not spark_made.match(e)]
        if stray:
            raise ValueError(
                f"refusing to clear derelict table location {loc}: contains "
                f"non-Spark entries {stray[:5]} — remove it manually"
            )
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
