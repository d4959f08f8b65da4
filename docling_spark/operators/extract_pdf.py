"""PDF extraction as Spark operators — two physical strategies.

Reference pipeline being re-expressed: StandardPdfPipeline
(/root/reference/docling/pipeline/standard_pdf_pipeline.py:68-92,
183-201): parse pages -> per-page preprocess/assemble -> concat pages ->
reading order -> document. Its threaded variant
(threaded_standard_pdf_pipeline.py) exists only to pipeline stages
inside one process; Spark replaces all of it with partition parallelism.

Strategy A — ``extract_pdf_docs`` (doc-at-once): one ``mapInPandas``
parses + assembles each document in a single task. Right when documents
are small (crawl PDFs overwhelmingly are) because there is ZERO shuffle.

Strategy B — ``parse_pdf_page_rows`` + ``assemble_from_pages`` (paged):
parse emits one row per page (url, page_no, blocks, parse_score), pages
of one 2000-page document land in different tasks; the single shuffle is
``groupBy(url).agg(array_sort(collect_list(struct(page_no, blocks))))``
— the reference's page-concat boundary (standard_pdf_pipeline.py:183-201)
made into a real exchange. This is the skew escape hatch for oversized
documents: one doc is no longer one task.

Confidence aggregation (P19, standard_pdf_pipeline.py:253-281) is plain
Spark SQL over the per-page scores: avg + 10th-percentile.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_BLOCK_FIELDS = [
    StructField("kind", StringType()),
    StructField("text", StringType()),
    StructField("level", IntegerType()),
    StructField("page_no", IntegerType()),
    StructField("l", DoubleType()),
    StructField("t", DoubleType()),
    StructField("r", DoubleType()),
    StructField("b", DoubleType()),
    StructField("size", DoubleType()),
    # JSON-serialized TableDataIR for kind == 'table' (else None): the
    # paged strategy must carry the reconstructed grid through the
    # shuffle or strategy B would silently drop tables strategy A keeps
    StructField("table_json", StringType()),
    StructField("bold", BooleanType()),
]

PDF_DOC_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", StringType()),
        StructField("error", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("md", StringType()),
        StructField("txt", StringType()),
        StructField("n_nodes", IntegerType()),
        StructField("parse_score", DoubleType()),
        StructField("bytes_in", LongType()),
        StructField("t_sec", DoubleType()),
    ]
)

PDF_PAGE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", StringType()),
        StructField("error", StringType()),
        StructField("page_no", IntegerType()),
        StructField("width", DoubleType()),
        StructField("height", DoubleType()),
        StructField("n_cells", IntegerType()),
        StructField("parse_score", DoubleType()),
        StructField("blocks", ArrayType(StructType(_BLOCK_FIELDS))),
    ]
)


def _doc_score(page_scores: list[float]) -> float:
    """Doc parse score = 10th percentile over pages
    (standard_pdf_pipeline.py:262-268 nanquantile)."""
    vals = sorted(s for s in page_scores if s == s)  # drop NaN
    if not vals:
        return float("nan")
    k = (len(vals) - 1) * 0.10
    lo = int(k)
    hi = min(lo + 1, len(vals) - 1)
    return vals[lo] + (vals[hi] - vals[lo]) * (k - lo)


# ------------------------------------------------------- strategy A


def extract_one_pdf(url: str, content: bytes) -> dict:
    from docling_spark.kernels.markdown import to_markdown
    from docling_spark.kernels.pdf_kernel import parse_pdf
    from docling_spark.kernels.pdf_layout import build_doc
    from docling_spark.kernels.textout import to_text

    t0 = time.perf_counter()
    n_bytes = len(content) if content is not None else 0
    try:
        pages = parse_pdf(content or b"")
        doc, page_scores = build_doc(pages, name=url or "doc")
        return {
            "status": "success",
            "error": None,
            "n_pages": len(pages),
            "md": to_markdown(doc),
            "txt": to_text(doc),
            "n_nodes": len(doc.nodes),
            "parse_score": _doc_score(page_scores),
            "bytes_in": n_bytes,
            "t_sec": time.perf_counter() - t0,
        }
    except Exception as e:  # noqa: BLE001 — errors become data
        return {
            "status": "failure",
            "error": f"{type(e).__name__}: {e}"[:500],
            "n_pages": 0,
            "md": None,
            "txt": None,
            "n_nodes": 0,
            "parse_score": None,
            "bytes_in": n_bytes,
            "t_sec": time.perf_counter() - t0,
        }


def extract_pdf_docs(
    df: DataFrame, content_col: str = "content", num_partitions: int | None = None
) -> DataFrame:
    import pandas as pd

    pages = df.select("url", content_col)
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    pages = pages.repartition(num_partitions, F.xxhash64("url"))

    def run(batches):
        for pdf in batches:
            rows = [
                extract_one_pdf(u, c)
                for u, c in zip(pdf["url"], pdf[content_col])
            ]
            out = pd.DataFrame(rows)
            out.insert(0, "url", pdf["url"].values)
            yield out

    return pages.mapInPandas(run, PDF_DOC_SCHEMA)


# ------------------------------------------------------- strategy B


def parse_pdf_page_rows(df: DataFrame, content_col: str = "content") -> DataFrame:
    """One output row per page, blocks already assembled per page.

    Parse failures emit a single page_no=0 failure row per doc so the
    downstream regroup still produces a status row for every url.
    """
    import pandas as pd

    from docling_spark.kernels.pdf_kernel import parse_pdf
    from docling_spark.kernels.pdf_layout import (
        page_blocks,
        page_parse_score,
        table_to_json as _table_to_json,
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for url, content in zip(pdf["url"], pdf[content_col]):
                try:
                    for page in parse_pdf(bytes(content) if content is not None else b""):
                        blocks = page_blocks(page)
                        rows.append(
                            {
                                "url": url,
                                "status": "success",
                                "error": None,
                                "page_no": page.page_no,
                                "width": page.width,
                                "height": page.height,
                                "n_cells": len(page.cells),
                                "parse_score": page_parse_score(
                                    [c.text for c in page.cells]
                                )
                                if page.cells
                                else None,
                                "blocks": [
                                    (
                                        b.kind,
                                        b.text,
                                        b.level,
                                        b.page_no,
                                        b.l,
                                        b.t,
                                        b.r,
                                        b.b,
                                        b.size,
                                        _table_to_json(b.table),
                                        b.bold,
                                    )
                                    for b in blocks
                                ],
                            }
                        )
                except Exception as e:  # noqa: BLE001
                    rows.append(
                        {
                            "url": url,
                            "status": "failure",
                            "error": f"{type(e).__name__}: {e}"[:500],
                            "page_no": 0,
                            "width": 0.0,
                            "height": 0.0,
                            "n_cells": 0,
                            "parse_score": None,
                            "blocks": [],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in PDF_PAGE_SCHEMA.fields])

    return df.select("url", content_col).mapInPandas(run, PDF_PAGE_SCHEMA)


ASSEMBLED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("md", StringType()),
        StructField("txt", StringType()),
        StructField("n_nodes", IntegerType()),
        StructField("parse_score", DoubleType()),
    ]
)


def assemble_from_pages(page_rows: DataFrame) -> DataFrame:
    """The one wide dependency of the PDF path: regroup pages per url
    (reference page-concat, standard_pdf_pipeline.py:183-201), then a
    per-doc kernel does classification + reading order + serialize."""
    import pandas as pd

    grouped = page_rows.groupBy("url").agg(
        F.array_sort(
            F.collect_list(F.struct("page_no", "height", "blocks", "parse_score", "status"))
        ).alias("pages"),
    )

    def run(batches):
        from docling_spark.kernels.markdown import to_markdown
        from docling_spark.kernels.pdf_layout import (
            Block,
            assemble_doc,
            mark_page_furniture,
            merge_continuations,
            table_from_json,
        )
        from docling_spark.kernels.textout import to_text

        for pdf in batches:
            rows = []
            for url, pages in zip(pdf["url"], pdf["pages"]):
                statuses = {p["status"] for p in pages}
                if statuses == {"failure"}:
                    rows.append(
                        {
                            "url": url,
                            "status": "failure",
                            "n_pages": 0,
                            "md": None,
                            "txt": None,
                            "n_nodes": 0,
                            "parse_score": None,
                        }
                    )
                    continue
                blocks = [
                    Block(
                        kind=b["kind"],
                        text=b["text"],
                        level=b["level"],
                        page_no=b["page_no"],
                        l=b["l"],
                        t=b["t"],
                        r=b["r"],
                        b=b["b"],
                        size=b["size"],
                        table=table_from_json(b["table_json"]),
                        bold=bool(b["bold"]),
                    )
                    for p in pages
                    for b in p["blocks"]
                ]
                page_heights = {
                    p["page_no"]: p["height"] for p in pages if p["height"]
                }
                mark_page_furniture(blocks, page_heights)
                blocks = merge_continuations(blocks)
                doc = assemble_doc(blocks, name=url)
                scores = [
                    p["parse_score"] for p in pages if p["parse_score"] is not None
                ]
                rows.append(
                    {
                        "url": url,
                        "status": "partial_success"
                        if "failure" in statuses
                        else "success",
                        "n_pages": len(pages),
                        "md": to_markdown(doc),
                        "txt": to_text(doc),
                        "n_nodes": len(doc.nodes),
                        "parse_score": _doc_score(scores) if scores else None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ASSEMBLED_SCHEMA.fields]
            )

    return grouped.mapInPandas(run, ASSEMBLED_SCHEMA)


def extract_pdfs_paged(df: DataFrame, content_col: str = "content") -> DataFrame:
    return assemble_from_pages(parse_pdf_page_rows(df, content_col))


# ------------------------------------------------------- P19 rollup


def confidence_rollup(page_rows: DataFrame) -> DataFrame:
    """Per-doc confidence from page scores — pure Spark SQL
    (standard_pdf_pipeline.py:253-281)."""
    return (
        page_rows.filter(F.col("status") == "success")
        .groupBy("url")
        .agg(
            F.count("*").alias("n_pages"),
            F.round(F.avg("parse_score"), 6).alias("mean_parse_score"),
            F.round(F.expr("percentile(parse_score, 0.1d)"), 6).alias(
                "low_parse_score"
            ),
        )
    )


# ------------------------------------------------- S8: multimodal pages

MULTIMODAL_PAGE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", StringType()),
        StructField("error", StringType()),
        StructField("page_no", IntegerType()),
        StructField("width", DoubleType()),
        StructField("height", DoubleType()),
        StructField("text", StringType()),
        StructField("md", StringType()),
        StructField("doctags", StringType()),
        StructField(
            "cells",
            ArrayType(
                StructType(
                    [
                        StructField("text", StringType()),
                        StructField("l", DoubleType()),
                        StructField("t", DoubleType()),
                        StructField("r", DoubleType()),
                        StructField("b", DoubleType()),
                        StructField("ocr", StringType()),
                        StructField("ocr_confidence", DoubleType()),
                    ]
                )
            ),
        ),
        StructField(
            "segments",
            ArrayType(
                StructType(
                    [
                        StructField("index_in_doc", IntegerType()),
                        StructField("label", StringType()),
                        StructField("text", StringType()),
                        StructField("l", DoubleType()),
                        StructField("t", DoubleType()),
                        StructField("r", DoubleType()),
                        StructField("b", DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


MULTIMODAL_IMAGE_FIELDS = StructType(
    [
        StructField("page_image", BinaryType()),
        StructField("img_width", IntegerType()),
        StructField("img_height", IntegerType()),
    ]
)


def _multimodal_rows_for_doc(
    url: str, content: bytes, image_scale: float | None = None
) -> list[dict]:
    """Per-page (text, md, doctags, cells, segments) tuples — S8,
    reference utils/export.py:13-146 generate_multimodal_pages: cells
    and segment bboxes TOPLEFT-normalized to [0,1], per-page markdown
    from that page's slice of the document items, content_text =
    space-joined item texts."""
    from docling_spark.kernels.doctags import export_to_doctags
    from docling_spark.kernels.markdown import to_markdown
    from docling_spark.kernels.pdf_kernel import parse_pdf
    from docling_spark.kernels.pdf_layout import (
        assemble_doc,
        classify_blocks,
        mark_page_furniture,
        page_blocks,
    )

    pages = parse_pdf(content or b"")
    all_blocks = []
    for page in sorted(pages, key=lambda p: p.page_no):
        all_blocks.extend(page_blocks(page))
    classify_blocks(all_blocks)  # doc-wide: heading ranks need all pages
    # same furniture semantics as the doc path: running heads/folios
    # leave the body layer in the per-page training tuples too
    mark_page_furniture(all_blocks, {p.page_no: p.height for p in pages})

    rows = []
    for page in sorted(pages, key=lambda p: p.page_no):
        w, h = page.width or 1.0, page.height or 1.0
        page_items = [
            (ix, b) for ix, b in enumerate(all_blocks) if b.page_no == page.page_no
        ]
        # per-page doc slice -> md/doctags (export.py main_text_start/stop);
        # classify=False: ranks were assigned doc-wide above — a
        # page-local re-run would promote the page's largest heading to
        # level 1 and disagree with the doc-level export. E3 provenance:
        # one node per block in order, node_id i = block i's bbox.
        page_doc = assemble_doc([b for _, b in page_items], name=url, classify=False)
        bboxes = {
            i: (b.l, b.t, b.r, b.b) for i, (_, b) in enumerate(page_items)
        }
        segments = [
            {
                "index_in_doc": ix,
                "label": b.kind,
                "text": b.text,
                "l": b.l / w,
                "t": b.t / h,
                "r": b.r / w,
                "b": b.b / h,
            }
            for ix, b in page_items
        ]
        cells = [
            {
                "text": c.text,
                "l": c.l / w,
                "t": c.t / h,
                "r": c.r / w,
                "b": c.b / h,
                "ocr": "false",
                "ocr_confidence": 1.0,
            }
            for c in page.cells_top_left()
        ]
        rows.append(
            {
                "url": url,
                "status": "success",
                "error": None,
                "page_no": page.page_no,
                "width": w,
                "height": h,
                "text": " ".join(b.text for _, b in page_items if b.text),
                "md": to_markdown(page_doc),
                "doctags": export_to_doctags(
                    page_doc, bboxes=bboxes, page_w=w, page_h=h
                ),
                "cells": cells,
                "segments": segments,
            }
        )
        if image_scale is not None:
            # P5: deterministic geometry raster (pdf_kernel.page_png),
            # the reference attaches page.image here (export.py:107)
            from docling_spark.kernels.pdf_kernel import (
                encode_png_gray,
                rasterize_page,
            )

            iw, ih, img = rasterize_page(page, scale=image_scale)
            rows[-1]["page_image"] = encode_png_gray(img)
            rows[-1]["img_width"] = iw
            rows[-1]["img_height"] = ih
    return rows


def multimodal_pages(
    df: DataFrame,
    content_col: str = "content",
    num_partitions: int | None = None,
    image_scale: float | None = None,
) -> DataFrame:
    """(url, content) PDF corpus -> one multimodal training row per
    page. Same single-exchange shape as extract_pdf_docs. With
    ``image_scale`` set, each row also carries the P5 geometry raster
    as PNG bytes (page_image, img_width, img_height) — the reference's
    page.image tuple member (utils/export.py:107). Off by default:
    image payloads multiply the shuffle/write volume, so only datasets
    that train on pixels should pay for them."""
    import pandas as pd

    schema = MULTIMODAL_PAGE_SCHEMA
    if image_scale is not None:
        schema = StructType(schema.fields + MULTIMODAL_IMAGE_FIELDS.fields)

    sel = df.select("url", content_col)
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    sel = sel.repartition(num_partitions, F.xxhash64("url"))

    def run(batches):
        for pdf in batches:
            rows = []
            for url, content in zip(pdf["url"], pdf[content_col]):
                try:
                    rows.extend(
                        _multimodal_rows_for_doc(
                            url,
                            bytes(content) if content is not None else b"",
                            image_scale=image_scale,
                        )
                    )
                except Exception as e:  # noqa: BLE001 — errors become data
                    # one failure row per doc so drops stay visible to
                    # lineage/audit (same contract as convert/extract)
                    fail = {
                        "url": url,
                        "status": "failure",
                        "error": f"{type(e).__name__}: {e}"[:500],
                        "page_no": 0,
                        "width": 0.0,
                        "height": 0.0,
                        "text": None,
                        "md": None,
                        "doctags": None,
                        "cells": [],
                        "segments": [],
                    }
                    if image_scale is not None:
                        fail.update(page_image=None, img_width=0, img_height=0)
                    rows.append(fail)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return sel.mapInPandas(run, schema)
