"""Spark-vs-DuckDB oracle gate + Spark/kernel byte-identity.

Mirrors the driver's t2 correctness check locally (sf0.01): every
oracle-backed query must match DuckDB on row count, column names and
order-insensitive values; rows-only queries must execute and return a
stable schema.
"""

import pytest

from tests.oracle_check import run_all


def test_all_queries_match_oracle(spark):
    results = run_all(spark)
    failures = [r for r in results if not r["ok"]]
    assert not failures, failures
    modes = {r["name"]: r["mode"] for r in results}
    # every q_* query must actually be oracle-checked, not silently rows-only
    assert all(m == "oracle" for n, m in modes.items() if n.startswith("q_")), modes


def test_spark_extraction_matches_local_kernel(spark):
    """The distributed path must be byte-identical to the local kernel
    per url (north rule: byte-identical extracted text per url)."""
    from docling_spark.kernels.html_kernel import HtmlExtractor
    from docling_spark.kernels.markdown import to_markdown
    from docling_spark.operators.extract import extract_pages
    from docling_spark.sources.pages import render_page, page_url, synthesize_pages

    sf_dir = "/root/testdata/sf0.001"
    pages = synthesize_pages(spark, sf_dir)
    res = extract_pages(pages, num_partitions=8)
    got = {r.url: r.md for r in res.select("url", "md").collect()}

    docs = {
        r.doc_id: (r.text, r.lang)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    n = len(docs)
    assert len(got) == n
    for page_id in (0, 1, 7, 42, 313, 499):
        text, lang = docs[page_id % n]
        url = page_url(page_id)
        html = render_page(page_id, text, lang)
        expected = to_markdown(HtmlExtractor(original_url=url).convert(html))
        assert got[url] == expected, f"mismatch for {url}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert {"url", "status", "md", "txt"} <= set(df.columns)


def test_resume_filter(spark, tmp_path):
    """Kill-and-resume semantics: lineage left_anti skips done urls."""
    from docling_spark.operators.extract import extract_pages
    from docling_spark.operators.lineage import resume_filter, write_lineage
    from docling_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").cache()
    total = pages.count()
    # attempt 1 processes only a deterministic half, then "dies"
    from pyspark.sql import functions as F

    half = pages.filter(F.xxhash64("url") % 2 == 0)
    res1 = extract_pages(half, num_partitions=8)
    lineage_path = str(tmp_path / "lineage")
    write_lineage(res1, lineage_path, attempt=0)

    remaining = resume_filter(pages, spark, lineage_path)
    n_half = half.count()
    assert remaining.count() == total - n_half
    # attempt 2 completes the rest; union is exactly the full set
    res2 = extract_pages(remaining, num_partitions=8)
    urls = {r.url for r in res1.select("url").collect()} | {
        r.url for r in res2.select("url").collect()
    }
    assert len(urls) == total
