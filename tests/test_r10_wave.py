"""Crafted-data pins for the r10 wave.

The headline pin: the Lloyd trainer's DuckDB oracle CTE must FLOOR-divide
negative member sums exactly like Python's ``//`` (r9 ADVICE, high) —
DuckDB's native ``//`` truncates toward zero (-7 // 2 = -3) while Python
floors (-7 // 2 = -4), and Gaussian embeddings make negative per-dimension
sums routine, so an unpinned oracle trains centroids differing by
1/LLOYD_SCALE from the Spark trainer.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd

from javascript_vector_database_spark.operators import ann_scale


def _lloyd_reference(vecs, k, rounds, divide):
    """Pure-Python replay of ivf_lloyd_centroids with a pluggable
    integer-division rule (``divide(s, n)``), mirroring the hash-order
    init, dist-then-cid argmin, integer-scaled mean, and empty-cell
    carry-forward."""
    s = ann_scale.LLOYD_SCALE
    order = sorted(
        vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    cents = sorted((i, [float(x) for x in vecs[i]]) for i in order[:k])
    for _ in range(rounds):
        members: dict[int, list[int]] = {}
        for vid, v in vecs.items():
            best = min(
                (math.sqrt(sum((a - b) ** 2 for a, b in zip(v, c))), cid)
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
                divide(
                    sum(math.floor(vecs[i][d] * s + 0.5) for i in m), len(m)
                )
                / s
                for d in range(len(old))
            ]
            new.append((cid, moved))
        cents = sorted(new)
    return cents


def _negative_sum_vectors(n=40, dim=3):
    """Deterministic vectors biased negative so per-cell member sums are
    negative and (generically) not divisible by the member count."""
    return {
        i: [
            -((i * 37 + d * 13) % 23) * 0.17 - 0.05 - d * 0.011
            for d in range(dim)
        ]
        for i in range(1, n + 1)
    }


def test_lloyd_oracle_floor_division_matches_spark_on_negative_sums(spark):
    from javascript_vector_database_spark.registry.ann_scale_queries import (
        _lloyd_cents_cte,
    )

    vecs = _negative_sum_vectors()
    k, rounds = ann_scale.IVF_K, ann_scale.LLOYD_ROUNDS

    def floor_div(s, n):
        return s // n

    def trunc_div(s, n):  # DuckDB's native `//`
        q = abs(s) // n
        return q if s >= 0 else -q

    floor_model = _lloyd_reference(vecs, k, rounds, floor_div)
    trunc_model = _lloyd_reference(vecs, k, rounds, trunc_div)
    # the crafted data must actually exercise the divergence — if the two
    # rules agree everywhere this test proves nothing
    assert floor_model != trunc_model

    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        schema="vec_id long, embedding array<double>",
    )
    got_spark = ann_scale.ivf_lloyd_centroids(df, k=k, rounds=rounds)
    assert got_spark == floor_model  # bit-exact: Python // floors

    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": list(vecs), "embedding": [vecs[i] for i in vecs]}
        ),
    )
    sql = (
        "WITH "
        + _lloyd_cents_cte(dim=3, rounds=rounds)
        + "\nSELECT cid, cemb FROM cents ORDER BY cid"
    )
    got_duck = [(int(cid), list(c)) for cid, c in con.execute(sql).fetchall()]
    assert got_duck == floor_model  # bit-exact: the CTE now pins floor


# ---------------------------------------------------------------------------
# ParquetTable partition_col layout (the live IVF index's physical table)
# ---------------------------------------------------------------------------

import os

from pyspark.sql import functions as F

from javascript_vector_database_spark.operators.dml import ParquetTable


def _cell_fingerprint(table_path: str, part_col: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for part in sorted(os.listdir(table_path)):
        full = os.path.join(table_path, part)
        if not (part.startswith(f"{part_col}=") and os.path.isdir(full)):
            continue
        files = {}
        for f in sorted(os.listdir(full)):
            if f.endswith(".parquet"):
                p = os.path.join(full, f)
                st = os.stat(p)
                with open(p, "rb") as fh:
                    files[f] = (st.st_size, st.st_mtime_ns, fh.read())
        out[part] = files
    return out


def _mk_cell_rows(spark, ids, tag="v"):
    # cell = id % 4: deterministic and key-stable, like an IVF coarse
    # assignment under fixed centroids
    return spark.createDataFrame(
        [(i, i % 4, f"{tag}{i}") for i in ids],
        "id long, cell long, payload string",
    )


def test_partition_col_merge_rewrites_only_touched_cells(spark, tmp_path):
    path = str(tmp_path / "t")
    t = ParquetTable(spark, path, "id", partition_col="cell")
    t.bulk_upsert(_mk_cell_rows(spark, range(32)), lwt=1.0)
    before = _cell_fingerprint(path, "cell")
    assert set(before) == {f"cell={c}" for c in range(4)}

    # delta touches only cell=3 (ids 3, 7): exactly one dir rewritten
    t.bulk_upsert(_mk_cell_rows(spark, [3, 7], tag="V"), lwt=2.0)
    after = _cell_fingerprint(path, "cell")
    changed = {p for p in before if before[p] != after.get(p)}
    assert changed == {"cell=3"}
    got = {r["id"]: r["payload"] for r in t.docs().collect()}
    assert got[3] == "V3" and got[7] == "V7" and got[2] == "v2"
    assert len(got) == 32
    # the MERGE bumped revisions on replaced keys only
    revs = {r["id"]: r["_rev"] for r in t.df().collect()}
    assert revs[3].startswith("2-") and revs[2].startswith("1-")


def test_partition_col_redelivery_idempotent(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"), "id", partition_col="cell")
    t.bulk_upsert(_mk_cell_rows(spark, range(16)), lwt=1.0)
    state1 = sorted(
        (r["id"], r["cell"], r["payload"]) for r in t.docs().collect()
    )
    # at-least-once: the same rows arrive again — MERGE absorbs them
    t.bulk_upsert(_mk_cell_rows(spark, range(0, 16, 2)), lwt=2.0)
    state2 = sorted(
        (r["id"], r["cell"], r["payload"]) for r in t.docs().collect()
    )
    assert state1 == state2


def test_partition_col_keys_only_remove_falls_back(spark, tmp_path):
    # bulk_remove's delta has no cell column: the documented fallback
    # derives touched partitions via a PK semi-join and must still only
    # rewrite the partitions holding the removed keys
    path = str(tmp_path / "t")
    t = ParquetTable(spark, path, "id", partition_col="cell")
    t.bulk_upsert(_mk_cell_rows(spark, range(32)), lwt=1.0)
    before = _cell_fingerprint(path, "cell")
    t.bulk_remove([5], lwt=2.0)  # cell=1
    after = _cell_fingerprint(path, "cell")
    changed = {p for p in before if before[p] != after.get(p)}
    assert changed == {"cell=1"}
    assert t.docs().count() == 31 and t.df().count() == 32  # tombstone


def test_partition_col_compact_preserves_content_and_layout(spark, tmp_path):
    # every MERGE leaves up to one file per writing task per touched
    # cell; compact() must collapse each cell dir to one file without
    # changing values, revisions, or the cell-partitioned layout
    path = str(tmp_path / "t")
    t = ParquetTable(spark, path, "id", partition_col="cell")
    for lwt, ids in enumerate(([0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11])):
        t.bulk_upsert(_mk_cell_rows(spark, ids), lwt=float(lwt))
    before = sorted(tuple(r) for r in t.df().collect())
    stats = t.compact()
    assert stats["files_after"] <= stats["files_before"]
    after = sorted(tuple(r) for r in t.df().collect())
    assert before == after
    # one file per cell dir, layout still cell-partitioned
    for part in os.listdir(path):
        full = os.path.join(path, part)
        if os.path.isdir(full):
            assert part.startswith("cell=")
            n = sum(f.endswith(".parquet") for f in os.listdir(full))
            assert n == 1, (part, n)


def test_lsh_pairs_from_sig_table_equals_batch(spark):
    # the maintained-signature probe must reproduce lsh_band_pairs
    # exactly, including the two edge classes the MERGE path must not
    # lose: exact-dup groups (star collapse on th) and shingle-less
    # docs (NULL mh in the stored table, still collapse participants)
    from javascript_vector_database_spark.operators import dedup

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, boiler),
        (2, boiler),                      # exact dup of 1 -> star edge
        (3, boiler + " with a twist"),    # near dup -> band pair
        (4, "completely different text about spark shuffles and joins"),
        (5, "hi"),                        # shingle-less (< k tokens)
        (6, "hi"),                        # exact dup of 5 -> star edge
        (7, ""),                          # empty text
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    batch = sorted(
        (r["id_a"], r["id_b"]) for r in dedup.lsh_band_pairs(df).collect()
    )
    withh = df.select(
        "doc_id", F.col("text").alias("__text")
    ).withColumn("th", F.md5("__text"))
    sigs = dedup.minhash_signatures(withh, "__text", "doc_id")
    table = withh.select("doc_id", "th").join(sigs, "doc_id", "left")
    live = sorted(
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_pairs_from_sig_table(table).collect()
    )
    assert live == batch
    assert (1, 2) in live and (5, 6) in live  # both edge classes present


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    # the z-order claim, measured from parquet footers: a time-sorted
    # layout prunes nothing for a user-scoped query (every file spans
    # the full user range), while the z-ordered layout of the SAME rows
    # gives every file a bounding box in both dimensions
    from javascript_vector_database_spark.operators import layout
    from javascript_vector_database_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    zpath = str(tmp_path / "z")
    layout.write_zorder_layout(
        ev, zpath, F.col("user_id"), F.col("ts").cast("long")
    )
    tpath = str(tmp_path / "t")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        (
            ev.repartitionByRange(16, F.col("ts"))
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(tpath)
        )
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
    sz = layout.file_minmax_stats(zpath, ["user_id", "ts"])
    st = layout.file_minmax_stats(tpath, ["user_id", "ts"])
    assert len(sz) > 4 and len(st) > 4  # enough files for pruning to mean anything

    user_box = {"user_id": (3, 9)}
    pz_user = layout.prunable_fraction(sz, user_box)
    pt_user = layout.prunable_fraction(st, user_box)
    assert pt_user <= 0.1  # time-sorted: user predicate prunes ~nothing
    assert pz_user > pt_user and pz_user >= 0.3

    import datetime

    utc = datetime.timezone.utc  # pyarrow returns tz-aware UTC stats
    time_box = {
        "ts": (
            datetime.datetime(2024, 1, 8, tzinfo=utc),
            datetime.datetime(2024, 1, 15, tzinfo=utc),
        )
    }
    # both layouts prune the time dimension; z-order must too (its files
    # carry a ts bounding box as well), even if less tightly than the
    # dedicated time sort
    assert layout.prunable_fraction(st, time_box) >= 0.5
    assert layout.prunable_fraction(sz, time_box) > 0.0

    # and the layouts hold the same rows (clustering is value-neutral)
    a = sorted(tuple(r) for r in spark.read.parquet(zpath).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(tpath).collect())
    assert a == b


def test_z_interleave_matches_python_reference(spark):
    # bit-exact pin of the Morton kernel: bit i of x -> position 2i,
    # bit i of y -> 2i+1, over boundary values and a deterministic grid
    from javascript_vector_database_spark.operators import layout

    def ref(x, y, bits=layout.Z_BITS):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    top = (1 << layout.Z_BITS) - 1
    pts = [(0, 0), (top, top), (top, 0), (0, top), (1, 2), (43690, 21845)]
    pts += [((i * 7919) % (top + 1), (i * 104729) % (top + 1)) for i in range(50)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", layout.z_interleave(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == ref(x, y), (x, y)
    # interleave is a bijection on the grid: distinct inputs, distinct z
    assert len(set(got.values())) == len(got)


def test_file_stats_statless_column_never_prunes(spark, tmp_path):
    # Spark's default INT96 timestamps carry no parquet min/max stats:
    # the stats reader must report (None, None) for them and
    # prunable_fraction must never prune on a statless column — while
    # still pruning on columns that do have bounds in the same files
    import datetime

    from javascript_vector_database_spark.operators import layout
    from javascript_vector_database_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    path = str(tmp_path / "int96")
    # default conf -> INT96 timestamps, sorted by user so user prunes
    (
        ev.repartitionByRange(8, F.col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(path)
    )
    stats = layout.file_minmax_stats(path, ["user_id", "ts"])
    assert all(f["ts"] == (None, None) for f in stats)
    assert all(f["user_id"][0] is not None for f in stats)
    utc = datetime.timezone.utc
    ts_box = {
        "ts": (
            datetime.datetime(2024, 1, 8, tzinfo=utc),
            datetime.datetime(2024, 1, 15, tzinfo=utc),
        )
    }
    assert layout.prunable_fraction(stats, ts_box) == 0.0
    assert layout.prunable_fraction(stats, {"user_id": (3, 9)}) >= 0.5


def test_partition_col_meta_roundtrip_reopen(spark, tmp_path):
    path = str(tmp_path / "t")
    ParquetTable(spark, path, "id", partition_col="cell").bulk_upsert(
        _mk_cell_rows(spark, range(8)), lwt=1.0
    )
    # reopening with DIFFERENT ctor args must adopt the stored layout
    t2 = ParquetTable(spark, path, "id", n_buckets=7)
    t2.bulk_upsert(_mk_cell_rows(spark, [1], tag="V"), lwt=2.0)
    assert t2.partition_col == "cell"
    got = {r["id"]: r["payload"] for r in t2.docs().collect()}
    assert got[1] == "V1" and len(got) == 8
    # layout still cell-partitioned, no synthetic hash dirs appeared
    parts = [p for p in os.listdir(path) if os.path.isdir(os.path.join(path, p))]
    assert all(p.startswith("cell=") for p in parts)
