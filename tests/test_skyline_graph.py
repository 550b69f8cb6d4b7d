"""Property tests for the skyline sweep and personalized PageRank —
brute-force cross-checks on adversarial inputs the parquet tables don't
exercise (duplicates, total ties, frontier-only sets, disconnected
seeds)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from javascript_vector_database_spark.operators.graph import (
    local_triangle_counts,
    personalized_pagerank,
    seeded_triangle_counts,
)
from javascript_vector_database_spark.operators.skyline import (
    skyline_2d,
    skyline_2d_grouped,
)


def _brute_skyline(points):
    return sorted(
        (x, y) for x, y in points
        if not any(
            qx <= x and qy <= y and (qx < x or qy < y) for qx, qy in points
        )
    )


def _check(spark, points):
    df = spark.createDataFrame(points, schema="x long, y long")
    got = sorted(
        (r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()
    )
    assert got == _brute_skyline(points), (points, got)


def test_skyline_duplicates_and_ties(spark):
    # duplicate frontier points survive in every copy; equal points do
    # not dominate each other
    _check(spark, [(1, 5), (1, 5), (2, 4), (2, 4), (3, 3)])
    # same x, different y: only the min-y row survives
    _check(spark, [(1, 5), (1, 4), (1, 3)])
    # same y, different x: only the min-x row survives
    _check(spark, [(5, 1), (4, 1), (3, 1)])
    # all identical: everything survives
    _check(spark, [(2, 2)] * 4)
    # anti-chain: everything survives
    _check(spark, [(1, 4), (2, 3), (3, 2), (4, 1)])
    # chain: one survivor
    _check(spark, [(1, 1), (2, 2), (3, 3)])


def test_skyline_random_matches_bruteforce(spark):
    rng = random.Random(20260814)
    for trial in range(3):
        pts = [
            (rng.randrange(0, 12), rng.randrange(0, 12)) for _ in range(60)
        ]
        _check(spark, pts)


def test_skyline_grouped_matches_per_group_bruteforce(spark):
    rng = random.Random(7)
    rows = [
        (g, rng.randrange(0, 8), rng.randrange(0, 8))
        for g in ("a", "b", "c")
        for _ in range(25)
    ]
    df = spark.createDataFrame(rows, schema="g string, x long, y long")
    got = sorted(
        (r["g"], r["x"], r["y"])
        for r in skyline_2d_grouped(df, "g", "x", "y").collect()
    )
    want = []
    for g in ("a", "b", "c"):
        pts = [(x, y) for gg, x, y in rows if gg == g]
        want.extend((g, x, y) for x, y in _brute_skyline(pts))
    assert got == sorted(want)


def test_ppr_locality_and_seed_mass(spark):
    """A path graph a-b-c-d-e with seed {a}: after 3 rounds mass reaches
    at most 3 hops (d), never e; and every round's output is exactly the
    integer recurrence (checked via a tiny manual simulation)."""
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    e = spark.createDataFrame(pairs, schema="src long, dst long")
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = spark.createDataFrame([(1,)], schema="node long")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, seeds, rounds=3).collect()
    }
    # manual integer simulation of the same recurrence
    from javascript_vector_database_spark.operators.graph import (
        BASE_MASS,
        DAMP_DEN,
        DAMP_NUM,
        RANK_SCALE,
    )

    adj = {1: [2], 2: [1, 3], 3: [2, 4], 4: [3, 5], 5: [4]}
    deg = {n: len(v) for n, v in adj.items()}
    ranks = {1: RANK_SCALE}
    for _ in range(3):
        contrib: dict[int, int] = {}
        for n, r in ranks.items():
            for m in adj[n]:
                contrib[m] = contrib.get(m, 0) + r // deg[n]
        new = {}
        for n in set(contrib) | {1}:
            base = BASE_MASS if n == 1 else 0
            r = base + (DAMP_NUM * contrib.get(n, 0)) // DAMP_DEN
            if r > 0:
                new[n] = r
        ranks = new
    assert got == ranks, (got, ranks)
    assert 5 not in got  # 4 hops away: unreachable in 3 rounds


def test_passjoin_short_strings_vs_bruteforce(spark):
    """The PassJoin both-short branch: strings shorter than k+1 chars
    cannot index; every short-short pair must still surface (their ED
    is <= k unconditionally), alongside short-long and long-long pairs,
    matching a quadratic Levenshtein reference."""
    from javascript_vector_database_spark.registry.decorrelated import (
        _ED_K,
        edit_distance_pairs,
    )

    def ed(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    keys = ["ab", "ab", "a", "b", "abc", "abd", "abcd", "xbcd",
            "zzzzzz", "zzzzyz", "qqqqqqqq", ""]
    rows = [(i, s, len(s)) for i, s in enumerate(keys)]
    df = spark.createDataFrame(rows, schema="doc_id long, sk string, la long")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["edit_distance"])
        for r in edit_distance_pairs(df).collect()
    )
    want = sorted(
        (i, j, ed(keys[i], keys[j]))
        for i in range(len(keys))
        for j in range(i + 1, len(keys))
        if ed(keys[i], keys[j]) <= _ED_K
    )
    assert got == want, (got, want)


def test_seeded_triangle_counts_match_full_sweep(spark):
    # the seeded probe must agree exactly with the all-node compact-
    # forward sweep on the seed set — random graph incl. hub + triangles
    rng = random.Random(11)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randint(0, 25), rng.randint(0, 25)) for _ in range(140)
            )
            if a != b
        }
    )
    e = spark.createDataFrame(edges, schema="src long, dst long")
    full = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering_coef"])
        for r in local_triangle_counts(e).collect()
    }
    seed_ids = sorted(full)[::3]  # every third node, incl. deg>=2 only
    seeds = spark.createDataFrame(
        [(s,) for s in seed_ids], schema="node long"
    )
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering_coef"])
        for r in seeded_triangle_counts(e, seeds).collect()
    }
    assert set(got) == set(seed_ids)
    for s in seed_ids:
        assert got[s] == full[s], (s, got[s], full[s])
