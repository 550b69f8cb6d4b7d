"""DuckDB oracle SQL fragment builders.

The driver runs each ``queries()`` entry on Spark and the matching
``oracle_sql()`` string on DuckDB over the same parquet tables, comparing
row count + schema + order-insensitive value hash.  These helpers emit
DuckDB SQL whose float semantics are bit-identical to the package's Spark
Column expressions (verified: sequential double fold over the array in both
engines produces the same IEEE bits).
"""

from __future__ import annotations


def sql_sqdist(a: str, b: str) -> str:
    """Σ (a_i - b_i)^2 — sequential left fold, double math (matches
    functions.vector.euclidean_distance bit-for-bit)."""
    diffsq = (
        f"list_transform(list_zip({a}, {b}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
        f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))"
    )
    return f"list_reduce({diffsq}, (x, y) -> x + y)"


def sql_euclid(a: str, b: str) -> str:
    return f"sqrt({sql_sqdist(a, b)})"


def sql_dot(a: str, b: str) -> str:
    prods = (
        f"list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))"
    )
    return f"list_reduce({prods}, (x, y) -> x + y)"


def sql_l2_norm(a: str) -> str:
    sq = f"list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    return f"sqrt(list_reduce({sq}, (x, y) -> x + y))"


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_l2_norm(a)} * {sql_l2_norm(b)}))"


#: the canonical query vector for vector-search oracle queries: the
#: embedding of vec_id=7 from the embeddings table itself (a data-derived
#: parameter both engines read identically).
QVEC_CTE = "q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7)"
