"""Multimodal (image/audio/video) column surface for the training-data
pipeline extension.

The reference is text-only; this is the SURVEY §7.7 extension: media
payloads ride as opaque ``binary`` columns with a typed metadata struct,
and every per-item transform is an Arrow-batched ``mapInPandas`` over
``(media_id, kind, payload, meta)`` — the schema, partitioning, UDF
signatures and batch shapes are real and oracle-tested.  Only the actual
codec calls are stubbed: the image/audio libraries are not in this
container, so ``decode_image``/``resize_image`` raise a clearly-marked
``NotImplementedError`` unless the deterministic fake is requested.

Scale notes: payloads never pass through the driver; transforms are
row-local (zero shuffle) and Arrow-batched; at 100 TB the media table is
written partitioned by ``kind`` with payloads in their own parquet column
chunk so metadata-only queries never read bytes (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

#: modulus for payload checksums (fits in int32, portable to DuckDB)
CHECKSUM_MOD = 2147483647
#: byte-histogram bins: byte >> 6 -> 4 coarse bins
N_HIST_BINS = 4

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int, fmt:string>"
)

BYTE_STATS_SCHEMA = "media_id long, n_bytes long, checksum long, hist array<long>"

FRAME_SAMPLE_SCHEMA = (
    "media_id long, n_frames int, n_sampled int, first_frame_checksum long"
)


def with_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Fabricate the canonical media table from ``documents``: payload =
    utf-8 bytes of the text (a deterministic stand-in for real codec
    output), meta derived from n_chars.  Pure Column expressions — the
    fabrication itself never leaves the JVM."""
    n = F.col("n_chars").cast("int")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.lit(16) + n % 32).alias("width"),
            (F.lit(16) + n % 24).alias("height"),
            (F.lit(1) + n % 8).alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
            F.lit("raw").alias("fmt"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# feature extraction (REAL: byte stats over the opaque payload)
# ---------------------------------------------------------------------------


def byte_stats(media: DataFrame) -> DataFrame:
    """Per-item payload statistics via Arrow-batched ``mapInPandas``:
    byte count, additive checksum mod P, and a 4-bin coarse byte
    histogram (byte >> 6).  This is the shape of any real feature
    extractor: binary in, fixed-width numeric features out, row-local."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # vectorized over the whole Arrow batch: concatenate every
            # payload once, then segment-reduce with np.add.reduceat —
            # no per-row Python loop in the hot path
            bufs = [bytes(p) for p in pdf["payload"]]
            lens = np.fromiter(
                (len(b) for b in bufs), dtype=np.int64, count=len(bufs)
            )
            cat = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.int64)
            starts = np.zeros(len(bufs), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            ends = starts + lens
            if cat.size:
                # segment sums via prefix sums: exact for zero-length
                # segments anywhere (reduceat mishandles a segment whose
                # start == cat.size — e.g. a trailing empty payload)
                csum = np.zeros(cat.size + 1, dtype=np.int64)
                np.cumsum(cat, out=csum[1:])
                sums = csum[ends] - csum[starts]
                bins = cat >> 6
                hist = np.empty((len(bufs), N_HIST_BINS), dtype=np.int64)
                bcsum = np.zeros(cat.size + 1, dtype=np.int64)
                for k in range(N_HIST_BINS):
                    np.cumsum(bins == k, out=bcsum[1:])
                    hist[:, k] = bcsum[ends] - bcsum[starts]
            else:
                sums = np.zeros(len(bufs), dtype=np.int64)
                hist = np.zeros((len(bufs), N_HIST_BINS), dtype=np.int64)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": lens,
                    "checksum": sums % CHECKSUM_MOD,
                    "hist": list(hist),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        extract, schema=BYTE_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# frame sampling (REAL plumbing over the synthetic frame layout)
# ---------------------------------------------------------------------------


def frame_sample(media: DataFrame, stride: int = 2) -> DataFrame:
    """Sample every ``stride``-th frame of a video payload.  The payload
    is treated as ``meta.n_frames`` equal chunks (last chunk ragged);
    returns per-item frame counts and the first sampled frame's checksum.
    Row-local mapInPandas — the 100 TB shape for video pipelines."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                nf = int(meta["n_frames"])
                frame_len = -(-b.size // nf)  # ceil division
                frames = [
                    b[j * frame_len : (j + 1) * frame_len] for j in range(nf)
                ]
                sampled = frames[::stride]
                rows.append(
                    (
                        int(mid),
                        nf,
                        len(sampled),
                        int(sampled[0].sum() % CHECKSUM_MOD) if sampled else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_frames",
                    "n_sampled",
                    "first_frame_checksum",
                ],
            )

    return media.select("media_id", "payload", "meta").mapInPandas(
        sample, schema=FRAME_SAMPLE_SCHEMA
    )


# ---------------------------------------------------------------------------
# codec-backed ops (STUBBED: libraries not in this container)
# ---------------------------------------------------------------------------


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image payloads to pixel arrays.

    Real path requires PIL (NOT installed here) -> NotImplementedError.
    ``fake=True`` runs the deterministic stand-in: bytes reinterpreted as
    a (height*width)-truncated/padded uint8 "pixel" grid, returning per
    item ``(media_id, px_mean, px_std)`` — same schema and batch shape
    the real decoder would produce."""
    if not fake and not _HAS_PIL:
        raise NotImplementedError(
            "STUB: image decode requires PIL, which is not installed in "
            "this container. Pass fake=True for the deterministic stand-in."
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                n_px = int(meta["width"]) * int(meta["height"])
                if b.size == 0:  # empty payload -> all-zero pixel grid
                    b = np.zeros(1, dtype=np.int64)
                px = b[np.arange(n_px) % b.size]  # cyclic tile / truncate
                # mean/std from EXACT integer sums so the arithmetic is a
                # fixed sequence of IEEE double ops — bit-identical to the
                # DuckDB oracle's sqrt((ssq - s*s/n)/n)
                s, ssq = int(px.sum()), int((px * px).sum())
                mean = s / n_px
                std = math.sqrt((ssq - s * s / n_px) / n_px)
                rows.append((int(mid), mean, std))
            yield pd.DataFrame(rows, columns=["media_id", "px_mean", "px_std"])

    return media.select("media_id", "payload", "meta").mapInPandas(
        decode, schema="media_id long, px_mean double, px_std double"
    )


def resize_image(
    media: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Resize image payloads to (width, height).

    Real path requires PIL (NOT installed here) -> NotImplementedError.
    ``fake=True`` runs the deterministic stand-in on the fake pixel grid:
    nearest-neighbor resampling with integer index math
    (``src_y = y * H // h_out``, ``src_x = x * W // w_out``) — the same
    mapInPandas shape, schema and batch layout the PIL kernel would use,
    and exactly reproducible in SQL.  Returns per-item
    ``(media_id, out_n_bytes, out_checksum)`` over the resized grid."""
    if not fake and not _HAS_PIL:
        raise NotImplementedError(
            "STUB: image resize requires PIL, which is not installed in "
            "this container. Pass fake=True for the deterministic stand-in."
        )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                w_in, h_in = int(meta["width"]), int(meta["height"])
                if b.size == 0:  # empty payload -> all-zero pixel grid
                    b = np.zeros(1, dtype=np.int64)
                px = b[np.arange(w_in * h_in) % b.size].reshape(h_in, w_in)
                ys = (np.arange(height) * h_in) // height
                xs = (np.arange(width) * w_in) // width
                out = px[np.ix_(ys, xs)]
                rows.append(
                    (int(mid), out.size, int(out.sum() % CHECKSUM_MOD))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "out_n_bytes", "out_checksum"]
            )

    return media.select("media_id", "payload", "meta").mapInPandas(
        resize, schema="media_id long, out_n_bytes long, out_checksum long"
    )


AUDIO_WINDOW_BYTES = 256
AUDIO_WINDOW_SCHEMA = (
    "media_id long, win_idx long, win_bytes long, energy long, peak long"
)


def audio_windows(
    media: DataFrame, window_bytes: int = AUDIO_WINDOW_BYTES
) -> DataFrame:
    """Fixed-size audio windowing with per-window features: the payload
    (a PCM-like sample stream) splits into ``window_bytes`` windows
    (last ragged) and each window reduces to (sample count, energy =
    sum of squared samples, peak) — the VAD/segmentation front-end
    shape: binary in, one fixed-width feature row PER WINDOW out,
    row-local Arrow batches, no shuffle (downstream groupBys see
    windows already exploded).  Completes the modality triple beside
    decode/resize (image) and frame_sample (video).  Energy bound:
    window_bytes * 255^2 < 2^31 — BIGINT-safe with huge headroom."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.int64
                )
                n_win = -(-b.size // window_bytes) if b.size else 0
                for w in range(n_win):
                    seg = b[w * window_bytes : (w + 1) * window_bytes]
                    rows.append(
                        (
                            int(mid),
                            w,
                            int(seg.size),
                            int((seg * seg).sum()),
                            int(seg.max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "win_idx", "win_bytes", "energy", "peak"],
            )

    return media.select("media_id", "payload").mapInPandas(
        extract, schema=AUDIO_WINDOW_SCHEMA
    )


# ---------------------------------------------------------------------------
# perceptual hash (aHash over the byte stream) — binary near-dup
# ---------------------------------------------------------------------------

PHASH_CELLS = 64
#: pigeonhole blocking: 4 x 16-bit bands guarantee any pair with
#: hamming <= 3 shares at least one full band
PHASH_BANDS = 4
PHASH_HAM_K = 3

PHASH_SCHEMA = "media_id long, w0 long, w1 long"


def phash_words(media: DataFrame) -> DataFrame:
    """Average-hash fingerprint of an opaque binary payload: byte p
    feeds cell ``p mod 64``, bit c is set iff ``cell_sum * 64 >
    total_sum`` (above-mean test as a pure integer comparison — no
    division, no float), packed 32 bits per BIGINT word (positive-word
    discipline).  This is aHash's shape with strided byte cells
    standing in for the 8x8 grayscale grid — on real images the decode
    + downsample feeds the same 64-cell threshold, so the downstream
    banding/hamming plumbing is production-identical.  Arrow-batched
    mapInPandas, vectorized per batch (np.add.at segment scatter), zero
    shuffle — a write-time fingerprint column."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = [bytes(p) for p in pdf["payload"]]
            n = len(bufs)
            w0 = np.zeros(n, dtype=np.int64)
            w1 = np.zeros(n, dtype=np.int64)
            lens = np.fromiter((len(b) for b in bufs), np.int64, count=n)
            cat = np.frombuffer(b"".join(bufs), np.uint8).astype(np.int64)
            if cat.size:
                starts = np.zeros(n, dtype=np.int64)
                np.cumsum(lens[:-1], out=starts[1:])
                row_of = np.repeat(np.arange(n), lens)
                cell = (np.arange(cat.size) - starts[row_of]) % PHASH_CELLS
                acc = np.zeros((n, PHASH_CELLS), dtype=np.int64)
                np.add.at(acc, (row_of, cell), cat)
                tot = acc.sum(axis=1)
                bits = (acc * PHASH_CELLS) > tot[:, None]
                pows = np.int64(1) << np.arange(32, dtype=np.int64)
                w0 = (bits[:, :32] * pows).sum(axis=1)
                w1 = (bits[:, 32:] * pows).sum(axis=1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "w0": w0,
                    "w1": w1,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=PHASH_SCHEMA
    )
