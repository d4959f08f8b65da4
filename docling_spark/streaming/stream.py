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


def convert_stream(pages_stream, num_partitions: int = 8):
    """Streaming twin of operators.convert.convert_any: the unified
    multi-format router (S4) under Structured Streaming — an
    incremental crawl drop of mixed html/pdf/office/... bytes converts
    exactly like the batch path (same kernels, same errors-as-data
    rows), with checkpointed exactly-once file progress."""
    from docling_spark.operators.convert import convert_any

    return convert_any(pages_stream, num_partitions=num_partitions)


def run_convert_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    num_partitions: int = 8,
    timeout_sec: int = 300,
) -> bool:
    """Drain-and-stop multi-format conversion with streaming resume."""
    pages = read_pages_stream(spark, input_dir)
    results = convert_stream(pages, num_partitions=num_partitions)
    query = (
        results.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query.awaitTermination(timeout_sec)


# ------------------------------------------- windowed event-time rollup

def windowed_event_rollup(events, window: str = "1 hour", watermark: str = "30 minutes"):
    """Event-time tumbling-window aggregation with late-data handling.

    Works on BOTH batch and streaming DataFrames (same plan): group by
    window(ts) x event_type, count + sum(value). On a stream the
    watermark bounds state: events later than ``watermark`` behind the
    max seen event time are dropped and their windows finalized — the
    idiomatic Structured Streaming shape for crawl-rate/metrics rollups.
    """
    from pyspark.sql import functions as F

    w = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        w.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_windowed_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    timeout_sec: int = 300,
) -> bool:
    """Streaming twin of the batch rollup: file-source events stream ->
    watermarked windowed agg -> append-mode parquet sink (windows emit
    once finalized by the watermark; AvailableNow drains and stops)."""
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        ).parquet(input_dir)
    )
    agg = windowed_event_rollup(events, window=window, watermark=watermark)
    query = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query.awaitTermination(timeout_sec)


# ----------------------------- stateful cross-batch dedup (GroupState)


def dedup_stream(pages_stream, text_col: str = "text"):
    """Custom stateful streaming operator: emit each content fingerprint
    the FIRST time it is seen across ALL micro-batches
    (``applyInPandasWithState`` keyed by md5(text); state = seen flag).

    A crawl re-visits urls and mirrors endlessly — batch dedup only sees
    one drop at a time, so the 'have I ever emitted this content'
    predicate is streaming state by nature. State is one boolean per
    distinct fingerprint, hash-partitioned by the groupBy — the same
    shuffle shape as batch exact dedup, held by the state store instead
    of a shuffle file.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = pages_stream.withColumn("fp_md5", F.md5(F.col(text_col)))
    out_schema = (
        "url string, warc_ts timestamp, fp_md5 string, is_first boolean"
    )

    def emit_first(key, pdfs, state):
        import pandas as pd

        seen = state.exists
        rows = []
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                rows.append(
                    {
                        "url": row["url"],
                        "warc_ts": row["warc_ts"],
                        "fp_md5": key[0],
                        "is_first": not seen,
                    }
                )
                seen = True
        if not state.exists:
            state.update((True,))
        yield pd.DataFrame(rows)

    return keyed.groupBy("fp_md5").applyInPandasWithState(
        emit_first,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 300,
) -> bool:
    pages = read_pages_stream(spark, input_dir)
    deduped = dedup_stream(pages)
    query = (
        deduped.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query.awaitTermination(timeout_sec)
