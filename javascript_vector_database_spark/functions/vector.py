"""Vector scalar functions as Catalyst Column expressions.

The reference computes euclidean distance in 3 lines of JS over
``number[]`` (reference src/database.ts:218-220) and encodes distances as
fixed-width sort-key strings (src/database.ts:223-225).  Here every
function is a *pure Column expression* built from Spark higher-order array
functions — JVM-side, no Python in the hot path, fully pushdown/codegen
friendly.  All arithmetic is done in DOUBLE (each float32 widens exactly)
and summation is sequential over the array, which keeps results
bit-comparable with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def lit_double_array(values: list[float]) -> Column:
    """``array<double>`` literal via ONE parsed SQL expression.

    ``F.array(*[F.lit(x) ...])`` costs one py4j round trip per element —
    measured 3.2s of pure driver time for a 16x384 centroid block (6144
    lits).  Formatting the shortest round-trip repr into a single
    ``F.expr`` string hands the whole literal to the JVM parser at once
    (~ms).  Bit-exact: Python's repr emits the shortest decimal that
    round-trips, and Java's ``Double.parseDouble`` is correctly rounded,
    so every parsed double equals the source double."""
    def one(x: float) -> str:
        x = float(x)
        if x != x:
            return "CAST('NaN' AS DOUBLE)"
        if x == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if x == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return f"{x!r}D"

    body = ", ".join(one(x) for x in values)
    return F.expr(f"array({body})")


def _dbl(x: Column) -> Column:
    return x.cast("double")


def euclidean_distance(a: Column | str, b: Column | str) -> Column:
    """``sqrt(Σ (a_i - b_i)^2)`` — reference src/database.ts:218-220.

    Sequential fold in array order (same order DuckDB's list functions use),
    differences squared via multiplication (not pow) for cross-engine
    determinism.
    """
    a, b = _as_col(a), _as_col(b)
    diffsq = F.zip_with(a, b, lambda x, y: (_dbl(x) - _dbl(y)) * (_dbl(x) - _dbl(y)))
    return F.sqrt(F.aggregate(diffsq, F.lit(0.0), lambda acc, v: acc + v))


def dot(a: Column | str, b: Column | str) -> Column:
    """Inner product Σ a_i*b_i."""
    a, b = _as_col(a), _as_col(b)
    prods = F.zip_with(a, b, lambda x, y: _dbl(x) * _dbl(y))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    a = _as_col(a)
    sq = F.transform(a, lambda x: _dbl(x) * _dbl(x))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize, as the reference's embedding step does
    (src/vector.ts:35-38, ``normalize: true``)."""
    a = _as_col(a)
    n = l2_norm(a)
    return F.transform(a, lambda x: _dbl(x) / n)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖‖b‖).  For unit vectors equals the dot product."""
    a, b = _as_col(a), _as_col(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def index_nr_to_string(nr: Column | str) -> Column:
    """Compat encoding of the reference's fixed-width index key:
    ``((nr*10) + '').slice(0, 10).padEnd(10, '0')`` — src/database.ts:223-225.

    Reproduced for fidelity tests only; the scale path indexes the raw
    DOUBLE distance instead because the string key is lexicographically
    mis-ordered across integer-digit-count regimes (SURVEY.md §1.3 quirk).

    JS number stringification differs from SQL's CAST(double AS STRING) in
    general, but for values in [0, 20] printed to ≤10 significant chars the
    shortest-roundtrip digits agree; we strip a trailing ``.0`` the way JS
    prints integral doubles (``5`` not ``5.0``) before slicing.
    """
    nr = _dbl(_as_col(nr)) * F.lit(10.0)
    s = F.regexp_replace(nr.cast("string"), r"\.0$", "")
    return F.rpad(F.substring(s, 1, 10), 10, "0")
