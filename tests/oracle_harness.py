"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL over the same parquet
tables, then compares row count + column names + values (order-insensitive,
columns sorted by name) — the same contract CORRECTNESS_r{N}.json grades.
"""

from __future__ import annotations

import math

import duckdb

from javascript_vector_database_spark.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    ), [cols[i] for i in order]


def compare(spark, sf_dir: str, spark_fn, sql: str):
    """Assert Spark result == DuckDB result for one registered query."""
    sdf = spark_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duck_con(sf_dir)
    res = con.sql(sql)
    dcols = res.columns
    drows = res.fetchall()
    con.close()

    assert sorted(scols) == sorted(dcols), f"schema: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"rowcount: {len(srows)} vs {len(drows)}"
    sset, _ = _rowset(scols, srows)
    dset, _ = _rowset(dcols, drows)
    for i, (a, b) in enumerate(zip(sset, dset)):
        assert a == b, f"row {i}: spark={a} duck={b}"
