"""Bucketed tables: shuffle-free co-located joins for the resume path.

At 10^12 documents the resume anti-join (pages ⟂ lineage on url) is a
recurring full-corpus join. Hash-bucketing BOTH tables on the join key
at write time makes every subsequent join/anti-join co-located: Spark
aligns bucket i of one table with bucket i of the other and performs a
zero-Exchange SortMergeJoin — the shuffle is paid ONCE at write time
and amortized over every later attempt/audit/join against the table.

tests/test_plans.py pins the plan shape: with broadcast disabled, the
bucketed anti-join contains no Exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "url",
    buckets: int = 64,
    sorted_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed (and sorted) by
    the join key. Bucket count must match across tables that will join
    co-located; at corpus scale pick buckets ~ corpus_bytes / 1 GB."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, key)
        .sortBy(sorted_by or key)
    )
    writer.saveAsTable(table)


def resume_anti_join(
    spark: SparkSession,
    pages_table: str,
    lineage_table: str,
    key: str = "url",
    terminal_statuses: tuple[str, ...] = ("success",),
) -> DataFrame:
    """Pages not yet terminal in lineage — the bucketed twin of
    lineage.resume_filter. With both tables bucketed on ``key`` this
    plans as a co-located SortMergeJoin(LeftAnti) with no Exchange.

    Only 'success' is terminal by default, matching resume_filter:
    previously-skipped documents (e.g. over a since-raised size limit)
    must be re-gated on each attempt, not permanently excluded. Pass a
    wider ``terminal_statuses`` explicitly if skips should stick."""
    pages = spark.table(pages_table)
    quoted = ", ".join("'%s'" % s.replace("'", "''") for s in terminal_statuses)
    done = (
        spark.table(lineage_table)
        .filter("status in (%s)" % quoted)
        .select(key)
    )
    return pages.join(done, on=key, how="left_anti")
