"""Skew guards: salted aggregation for hot keys.

A crawl corpus is host-skewed (a handful of hosts own a large fraction
of urls). ``groupBy(hot_key).agg(count_distinct(x))`` routes every row
of a hot key through one reducer; salting splits each key into
``n_salts`` sub-keys derived from the DISTINCT column (so each distinct
value lands in exactly one sub-key — partial distinct counts add up
exactly), aggregates the sub-keys in parallel, then sums the partials
in a second, tiny aggregation.

Two shuffles, both balanced, instead of one melted reducer: the 100 TB
shape for distinct-count rollups over skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_distinct_count(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    n_salts: int = 16,
    alias: str | None = None,
) -> DataFrame:
    """Exact count(distinct distinct_col) per group_col, salted.

    Salt = hash(distinct_col) % n_salts, so every distinct value maps
    to exactly one (group, salt) cell and the per-cell distinct counts
    sum to the true total — unlike salting on a random number, which
    would double-count values across salts.
    """
    out_name = alias or f"n_{distinct_col}"
    cells = (
        df.select(group_col, distinct_col)
        .withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts))
        )
        .groupBy(group_col, "_salt")
        .agg(F.count_distinct(F.col(distinct_col)).alias("_part"))
    )
    return (
        cells.groupBy(group_col)
        .agg(F.sum("_part").cast("long").alias(out_name))
        .orderBy(group_col)
    )
