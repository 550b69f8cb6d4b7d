"""Z-order (Morton) data clustering — multi-dimensional file skipping.

The 100 TB problem this solves: a table sorted (or range-partitioned) on
ONE column prunes scans on that column only — a time-sorted event log
answers time-range queries by skipping files, but a user-scoped query
still reads everything, because every file spans the full user range.
Interleaving the bits of two normalized dimension codes (Morton 1966,
public; the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``) and
range-partitioning + sorting the write on that single z-value gives
every file a SMALL BOUNDING BOX in both dimensions at once: parquet
min/max footers then prune a 2-D box query down to the files whose box
intersects it, in either dimension or both.

Spark-first shape: the z-value is a pure Column expression (32 shift/
mask/or terms — whole-stage codegen, no UDF), the layout is one
``repartitionByRange(z).sortWithinPartitions(z)`` write, and the probe
is an ordinary filtered scan whose range predicates reach the footers
as PushedFilters.  Nothing at read time knows about z at all.

``file_minmax_stats`` / ``prunable_fraction`` read the parquet footers
directly (pyarrow) so the skipping claim is MEASURED per layout, not
asserted: bench extras record the prunable-file fraction of the same
box query under the z-ordered layout vs a single-column time-sorted
layout.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension; z spans 2*Z_BITS bits (fits a long)
Z_BITS = 16


def z_norm16(col: Column, lo: Column | float, hi: Column | float) -> Column:
    """Normalize a numeric column to the [0, 2^Z_BITS) integer grid.
    ``lo``/``hi`` are the column's min/max (bounded 1-row scalars the
    caller inlines as literals — a write-time layout decision, exactly
    like IVF centroids)."""
    lo_c = F.lit(lo) if not isinstance(lo, Column) else lo
    hi_c = F.lit(hi) if not isinstance(hi, Column) else hi
    span = hi_c.cast("double") - lo_c.cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo_c.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    scaled = F.floor(frac * ((1 << Z_BITS) - 1)).cast("long")
    return F.greatest(F.lit(0).cast("long"), F.least(scaled, F.lit((1 << Z_BITS) - 1).cast("long")))


def z_interleave(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two ``bits``-wide non-negative codes: bit i
    of x lands at position 2i, bit i of y at 2i+1.  Pure shift/mask/or
    Column fold — stays inside whole-stage codegen."""
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(one), 2 * i)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(one), 2 * i + 1)
        )
    return z


def write_zorder_layout(
    df: DataFrame,
    path: str,
    x_col: Column,
    y_col: Column,
    n_files: int = 16,
) -> None:
    """Write ``df`` clustered by the z-value of (x_col, y_col): one
    range-partition + in-partition sort on z routes neighboring z cells
    into the same files, so every file's parquet footer carries a tight
    min/max box in BOTH source dimensions.  The z column itself is
    dropped — readers see the original schema and ordinary predicates."""
    xb = df.agg(
        F.min(x_col).alias("xlo"), F.max(x_col).alias("xhi"),
        F.min(y_col).alias("ylo"), F.max(y_col).alias("yhi"),
    ).first()  # bounded: one row of layout constants
    if xb is None or xb["xlo"] is None or xb["ylo"] is None:
        # empty input (or all-NULL dimension): no bounds to cluster on
        raise ValueError(
            "write_zorder_layout needs >= 1 row with non-NULL values in"
            " both dimension columns"
        )
    # rows with a NULL dimension get z=0 (cluster at the origin) instead
    # of a NULL z that would range-partition arbitrarily; pruning stays
    # correct because parquet min/max bounds cover non-NULL values only
    # and a NULL dimension never satisfies a range predicate anyway
    z = F.coalesce(
        z_interleave(
            z_norm16(x_col, float(xb["xlo"]), float(xb["xhi"])),
            z_norm16(y_col, float(xb["ylo"]), float(xb["yhi"])),
        ),
        F.lit(0).cast("long"),
    )
    spark = df.sparkSession
    ts_conf = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(ts_conf, None)
    # Spark's default INT96 timestamps carry NO parquet min/max stats —
    # a clustered layout whose timestamp footers can't bound is a
    # pruning no-op on the time dimension.  TIMESTAMP_MICROS restores
    # the stats (and Spark's own row-group skipping along with them).
    spark.conf.set(ts_conf, "TIMESTAMP_MICROS")
    try:
        (
            df.withColumn("__z", z)
            .repartitionByRange(n_files, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z")
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        if prev is None:
            spark.conf.unset(ts_conf)
        else:
            spark.conf.set(ts_conf, prev)


def file_minmax_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-parquet-file min/max of ``cols`` straight from the footers
    (pyarrow) — the exact information a scan's file/row-group skipping
    uses.  Returns one dict per file: {col: (min, max)}."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins: dict = {c: None for c in cols}
        maxs: dict = {c: None for c in cols}
        # a column missing stats in ANY row group has no file-level
        # bound at all — once invalid it must STAY invalid, or a later
        # row group's stats would fabricate a bound the statless group
        # can escape (and "prunable" would wrongly skip matching rows)
        valid: dict = {c: True for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                if not valid[c]:
                    continue
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    valid[c] = False
                    mins[c] = maxs[c] = None
                    continue
                mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def prunable_fraction(stats: list[dict], box: dict) -> float:
    """Fraction of files a box query can SKIP on footer evidence alone:
    a file is prunable iff its [min, max] misses the query interval in
    at least one constrained dimension.  ``box`` = {col: (lo, hi)}."""
    if not stats:
        return 0.0
    skipped = 0
    for f in stats:
        for c, (lo, hi) in box.items():
            mn, mx = f[c]
            if mn is None:
                continue  # no stats: never prunable on this column
            if mx < lo or mn > hi:
                skipped += 1
                break
    return skipped / len(stats)
