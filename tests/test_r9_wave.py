"""Crafted-data pins for the r9 wave: deterministic Lloyd IVF training
(integer-exact centroid updates), the capped k-truss routing, and the
k-truss peel itself.  The registry sweep value-checks the registered
rows against DuckDB; these pin the algorithmic claims against
hand-computable reference models.
"""

from __future__ import annotations

import hashlib

from javascript_vector_database_spark.operators import ann_scale, graph


def _floor(x: float) -> int:
    import math

    return math.floor(x)


def test_lloyd_centroids_match_python_reference(spark):
    # two tight clusters + an outlier pair; k=3 so an empty cell (and its
    # carry-forward) is plausible depending on the hash-order init —
    # the reference model implements the identical rule either way
    import math

    vecs = {
        1: [0.0, 0.1],
        2: [0.2, -0.1],
        3: [0.1, 0.0],
        10: [5.0, 5.1],
        11: [5.2, 4.9],
        12: [4.9, 5.0],
        20: [-3.0, 2.0],
    }

    def ref_floor(vid, d, scale):
        return math.floor(vecs[vid][d] * scale + 0.5)

    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        schema="vec_id long, embedding array<double>",
    )
    got = ann_scale.ivf_lloyd_centroids(df, k=3, rounds=3)
    # reference model (floor applied the same way)
    order = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = sorted((i, list(vecs[i])) for i in order[:3])
    for _ in range(3):
        members: dict[int, list[int]] = {}
        for vid, v in vecs.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, c)) ** 0.5, cid)
                for cid, c in cents
            )
            members.setdefault(best[1], []).append(vid)
        new = []
        for cid, old in cents:
            m = members.get(cid)
            if not m:
                new.append((cid, old))
                continue
            moved = [
                (
                    sum(ref_floor(vid, d, ann_scale.LLOYD_SCALE) for vid in m)
                    // len(m)
                )
                / ann_scale.LLOYD_SCALE
                for d in range(len(old))
            ]
            new.append((cid, moved))
        cents = sorted(new)
    assert [c for c, _ in got] == [c for c, _ in cents]
    for (_, a), (_, b) in zip(got, cents):
        assert a == b  # bit-exact, not approx — that's the whole point


def test_lloyd_centroids_converge_to_cluster_means(spark):
    # k=2 with one init point in each far-apart cluster: after one round
    # each centroid must be exactly the integer mean of its cluster.
    # Ids 1..4 are CHOSEN so the md5-order init provably splits:
    # md5 order of {1,2,3,4} is [4,1,2,3], so init = {4 (high), 1 (low)}
    # — the previous id set {1,2,7,9} ordered [9,7,1,2], put BOTH inits
    # in the high cluster, and the test silently never ran (r9 ADVICE).
    vecs = {
        1: [0.0, 0.0],
        2: [0.2, 0.2],
        3: [9.0, 9.0],
        4: [9.4, 9.4],
    }
    order = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    init = sorted(order[:2])
    low = [i for i in init if vecs[i][0] < 5]
    high = [i for i in init if vecs[i][0] >= 5]
    assert low and high, f"init {init} must split across clusters"
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        schema="vec_id long, embedding array<double>",
    )
    got = dict(ann_scale.ivf_lloyd_centroids(df, k=2, rounds=2))
    s = ann_scale.LLOYD_SCALE
    lo_mean = [
        (sum(_floor(vecs[i][d] * s + 0.5) for i in (1, 2)) // 2) / s
        for d in range(2)
    ]
    hi_mean = [
        (sum(_floor(vecs[i][d] * s + 0.5) for i in (3, 4)) // 2) / s
        for d in range(2)
    ]
    assert got[low[0]] == lo_mean
    assert got[high[0]] == hi_mean


def test_ktruss_peel_keeps_clique_drops_pendants(spark):
    # 4-clique (every edge in 2 triangles) + pendant edges (0 triangles):
    # k=4 keeps exactly the clique with support 2 everywhere
    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    pendants = [(1, 10), (2, 11), (10, 11)]
    df = spark.createDataFrame(clique + pendants, schema="src long, dst long")
    rows = graph.ktruss_peel(df, k=4, rounds=2).collect()
    got = {(r["src"], r["dst"]): r["support"] for r in rows}
    assert set(got) == set(clique)
    assert all(s == 2 for s in got.values())


def test_phash_words_match_python_reference(spark):
    from javascript_vector_database_spark.operators import multimodal

    payloads = {
        1: b"hello world, this is a payload long enough to cross cells " * 3,
        2: b"",                      # empty: all bits 0
        3: b"abc",                   # shorter than one cell stride
        4: b"\x00" * 200,            # all-zero bytes: 0*64 > 0 false
    }

    def ref(buf: bytes) -> tuple[int, int]:
        cells = [0] * 64
        for p, byte in enumerate(buf):
            cells[p % 64] += byte
        tot = sum(cells)
        w0 = sum(1 << c for c in range(32) if cells[c] * 64 > tot)
        w1 = sum(1 << c for c in range(32) if cells[c + 32] * 64 > tot)
        return w0, w1

    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in payloads.items()],
        schema="media_id long, payload binary",
    )
    got = {r["media_id"]: (r["w0"], r["w1"])
           for r in multimodal.phash_words(df).collect()}
    for i, b in payloads.items():
        assert got[i] == ref(b), i
    assert got[2] == (0, 0) and got[4] == (0, 0)


def test_phash_near_dup_sensitivity(spark):
    # one flipped byte must move only a few cells -> small hamming
    from javascript_vector_database_spark.operators import multimodal

    base = bytes(range(32, 127)) * 4
    tweaked = bytearray(base)
    tweaked[10] = 126  # single-byte edit
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, tweaked)],
        schema="media_id long, payload binary",
    )
    got = {r["media_id"]: (r["w0"], r["w1"])
           for r in multimodal.phash_words(df).collect()}
    ham = bin(got[1][0] ^ got[2][0]).count("1") + bin(
        got[1][1] ^ got[2][1]
    ).count("1")
    assert ham <= multimodal.PHASH_HAM_K


def test_hourly_acf_constant_series_null_contract(spark, tmp_path):
    # zero-variance series: DuckDB's x/0.0 is NULL while Spark's is
    # Infinity — the row pins acf = NULL on both engines when D == 0
    import datetime
    import os

    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i),
            1,
            "view",
            1.0,
            None,
        )
        for i in range(60)
    ]
    ev = spark.createDataFrame(
        rows,
        schema="event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    sfd = str(tmp_path / "sf")
    os.makedirs(sfd, exist_ok=True)
    ev.write.parquet(os.path.join(sfd, "events.parquet"))
    from javascript_vector_database_spark.registry import queries

    out = queries()["events_hourly_acf"](spark, sfd).collect()
    assert len(out) == 24
    assert all(r["acf"] is None for r in out)
    assert all(r["n_pairs"] == 60 - r["lag"] for r in out)
