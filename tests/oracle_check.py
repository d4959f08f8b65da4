"""Local mimic of the driver's correctness gate: run each
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB at sf0.01; compare row count, column names, and
order-insensitive values. Usable as a script (fast iteration) and from
pytest (tests/test_spark_queries.py)."""

from __future__ import annotations

import math
import sys

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _norm_rows(cols, rows):
    return sorted("|".join(_norm_cell(v) for v in row) for row in rows)


def compare_query(spark, con, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        return {"name": name, "mode": "rows_only", "rows": len(s_rows), "ok": True}
    res = con.sql(sql)
    d_cols = list(res.columns)
    d_rows = res.fetchall()
    problems = []
    if [c.lower() for c in s_cols] != [c.lower() for c in d_cols]:
        problems.append(f"cols spark={s_cols} duck={d_cols}")
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
    if not problems:
        a = _norm_rows(s_cols, s_rows)
        b = _norm_rows(d_cols, d_rows)
        if a != b:
            bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
            problems.append(f"values differ, first misalignments: {bad}")
    return {
        "name": name,
        "mode": "oracle",
        "rows": len(s_rows),
        "ok": not problems,
        "problems": problems,
    }


def run_all(spark, only=None):
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = []
    for name, fn in qs.items():
        if only and only not in name:
            continue
        try:
            results.append(compare_query(spark, con, name, fn, oracles.get(name)))
        except Exception as e:  # pragma: no cover
            results.append(
                {"name": name, "mode": "error", "ok": False, "problems": [repr(e)[:500]]}
            )
    return results


if __name__ == "__main__":
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, "/root/repo")
    only = sys.argv[1] if len(sys.argv) > 1 else None
    ok = True
    for r in run_all(spark, only):
        status = "OK " if r["ok"] else "FAIL"
        print(f"{status} {r['name']:24s} mode={r['mode']:9s} rows={r.get('rows')}")
        for p in r.get("problems", []):
            ok = False
            print("     ", p[:500])
    print("ALL OK" if ok else "FAILURES PRESENT")
