"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The flagship metric is the extraction pipeline (pages -> byte-exact
markdown + spans): pages are synthesized once per (sf, n) into a local
parquet cache (stands in for the Iceberg scan) so the measured time is
scan + extract + aggregate, not input generation.

Each timed item runs SPARK_GRAFT_REPEATS times (default 3) and the
reported per-query number is the MEDIAN; min/max are reported under
``queries_min``/``queries_max``. Single-shot driver records previously
inherited ±2x host-VM noise (round-2 postmortem: three phantom
regressions on unchanged plans); medians make rounds comparable.

Extra keys beyond the driver contract: ``docs_per_sec`` (headline
throughput, from the median extract time) and ``n_pages``.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_PER_DOC = int(os.environ.get("SPARK_GRAFT_PAGES_PER_DOC", "4"))
CACHE_ROOT = os.environ.get("SPARK_GRAFT_CACHE", "/tmp/docling_spark_bench")
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("docling-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(2 * cpus, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        # G1 defaults to ~23 parallel GC threads on a 32-core box; those
        # thrash against 32 task threads + 32 python workers and collapse
        # throughput ~4x (measured). Pin GC parallelism like a production
        # executor JVM would.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ParallelGCThreads=8 -XX:ConcGCThreads=2",
        )
        # each Python-UDF task = 1 JVM thread + 1 python worker process;
        # reserving 2 cores per task keeps runnable threads == cores
        # (measured 2x extraction throughput at local[32])
        .config("spark.task.cpus", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .getOrCreate()
    )


def pages_parquet(spark, sf_dir: str, n_pages: int) -> str:
    """Materialize the synthetic pages table once (deterministic)."""
    tag = sf_dir.rstrip("/").split("/")[-1]
    path = f"{CACHE_ROOT}/pages_{tag}_{n_pages}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from docling_spark.sources.pages import synthesize_pages

        synthesize_pages(spark, sf_dir, n_pages=n_pages).repartition(
            max(CPUS, 8)
        ).write.mode("overwrite").parquet(path)
    return path


def warmup(spark) -> None:
    """Steady-state protocol: spawn the JVM codegen paths and all
    Python UDF workers (imports included) before timing — executor
    startup is not part of cluster throughput, and its cost scales
    with worker count, which would corrupt the N-vs-4N efficiency."""
    from docling_spark.operators.extract import extract_pages
    from docling_spark.sources.pages import synthesize_pages

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tiny = synthesize_pages(spark, "/root/testdata/sf0.001", n_pages=CPUS * 4)
    extract_pages(tiny, num_partitions=CPUS * 2).groupBy("status").count().collect()


def timed(fn, repeats: int = REPEATS, spark=None) -> tuple[float, float, float]:
    """(median, min, max) wall seconds over ``repeats`` runs.

    Each repeat is hermetic: Spark's CacheManager matches persisted
    plans by canonicalized form, so a query that persist()s (e.g. the
    MinHash shingle scan) would silently serve repeats 2..n from repeat
    1's cache and the median would measure cache hits, not the query.
    clearCache() before every repeat keeps the measurement honest."""
    ts = []
    for _ in range(repeats):
        if spark is not None:
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), min(ts), max(ts)


def main() -> None:
    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from docling_spark.operators.extract import extract_pages

    warmup(spark)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    n_pages = n_docs * PAGES_PER_DOC
    pages_path = pages_parquet(spark, SF_DIR, n_pages)

    timings: dict[str, float] = {}
    tmin: dict[str, float] = {}
    tmax: dict[str, float] = {}

    def snapshot(n_pages: int, n_ok: int, t_extract: float, partial: bool) -> dict:
        out = {
            "metric": "headline_suite_wall_sec",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": dict(timings),
            "queries_min": dict(tmin),
            "queries_max": dict(tmax),
            "repeats": REPEATS,
            "sf": SF_DIR.rstrip("/").split("/")[-1],
            "n_pages": n_pages,
            "extract_success": n_ok,
            "docs_per_sec": round(n_pages / t_extract, 1) if t_extract else 0.0,
            "cpus": CPUS,
        }
        if partial:
            # progressive snapshot: if the harness kills a long run, the
            # LAST complete line still carries every finished phase
            out["partial"] = True
        print(json.dumps(out), flush=True)
        return out

    # ---- flagship: extraction throughput ----
    pages = spark.read.parquet(pages_path)
    n_ok_box = [0]

    def run_extract():
        res = extract_pages(
            pages,
            num_partitions=int(spark.conf.get("spark.sql.shuffle.partitions")),
        )
        agg = res.groupBy("status").count().collect()
        n_ok_box[0] = sum(r["count"] for r in agg if r["status"] == "success")

    med, lo, hi = timed(run_extract, spark=spark)
    timings["extract"] = round(med, 3)
    tmin["extract"] = round(lo, 3)
    tmax["extract"] = round(hi, 3)
    t_extract = med
    n_ok = n_ok_box[0]
    snapshot(n_pages, n_ok, t_extract, partial=True)

    # ---- headline companion queries (sf-dir relational + dedup + ann) ----
    qs = entrymod.queries()
    for name in (
        "q_pricing_summary",
        "q_region_revenue",
        "q_top_customers",
        "q_token_stats",
        "q_dedup_exact",
        "x_minhash_pairs",
        "q_ann_topk",
    ):
        med, lo, hi = timed(
            lambda name=name: qs[name](spark, SF_DIR).collect(), spark=spark
        )
        timings[name] = round(med, 3)
        tmin[name] = round(lo, 3)
        tmax[name] = round(hi, 3)
        snapshot(n_pages, n_ok, t_extract, partial=True)

    snapshot(n_pages, n_ok, t_extract, partial=False)
    spark.stop()


if __name__ == "__main__":
    main()
