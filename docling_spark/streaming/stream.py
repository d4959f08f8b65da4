"""Structured Streaming front-end for the extraction engine.

The reference is strictly batch (an iterator pipeline,
/root/reference/docling/document_converter.py:309-345); the north rule
is batch + resumable. This module adds the Spark-native incremental
mode on top of the SAME kernels: a file-source stream over the pages
table, `mapInPandas` extraction (stateless, so it runs unchanged on a
streaming DataFrame), and a parquet sink with checkpointed progress —
Structured Streaming's checkpoint IS the lineage/resume story at the
micro-batch granularity (new WARC drops land as new files and only new
files are processed).

``Trigger.AvailableNow`` drains everything currently available and
stops — the idiomatic "incremental batch" for a crawl pipeline cron.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def read_pages_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
):
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def extract_stream(pages_stream, num_partitions: int = 8):
    """Same kernel, streaming plan. The url-hash repartition is a
    stateless shuffle and is legal inside a streaming query."""
    from docling_spark.operators.extract import extract_pages

    return extract_pages(pages_stream, num_partitions=num_partitions)


def run_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    num_partitions: int = 8,
    timeout_sec: int = 300,
) -> bool:
    """Drain all currently-available input files, then stop. Re-running
    with the same checkpoint processes only files added since the last
    run (streaming resume semantics)."""
    pages = read_pages_stream(spark, input_dir)
    results = extract_stream(pages, num_partitions=num_partitions)
    query = (
        results.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query.awaitTermination(timeout_sec)
