"""Multimodal asset columns: binary payload + typed metadata.

Data model
----------
An *asset* is a struct column::

    asset: struct<
        data:        binary,   -- opaque payload (codec bytes at prod)
        media_type:  string,   -- 'image' | 'audio' | 'video'
        n_bytes:     bigint,
        width:       int,      -- image/video, else null
        height:      int,
        sample_rate: int,      -- audio, else null
        n_frames:    int,      -- video, else null
    >

Scale design (100 TB of media):

* **Metadata ops never touch the bytes.** ``media_type``/dims live in
  sibling struct fields, so a query over metadata prunes ``asset.data``
  at the parquet scan (Spark pushes nested-column pruning:
  ``spark.sql.optimizer.nestedSchemaPruning.enabled`` is on by
  default). Filtering "all 1080p videos" reads kilobytes, not the TBs
  of payload.
* **Byte-touching ops are Arrow-batched ``mapInPandas``** — one
  Python process per partition consuming record batches, never
  row-at-a-time pickling. Output schemas are explicit so the plan
  stays statically typed.
* **Frame sampling is pure JVM** — ``substring`` on binary +
  ``posexplode`` over a ``sequence``; no Python at all for the
  hot "cut videos into frames" path.

The container ships no PIL/cv2/librosa, so *decode* interprets the
payload bytes directly (``np.frombuffer`` → pad/truncate to
``width*height`` u8 pixels). That fake is deterministic and
byte-faithful — real codec decode drops in by replacing
``_decode_u8()`` (see the import-try hook there).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover - typing only
    import pandas as pd

#: Field order of the asset struct (kept stable for writers/readers).
ASSET_FIELDS = [
    "data", "media_type", "n_bytes", "width", "height", "sample_rate", "n_frames",
]


def _null(dtype: str) -> Column:
    return F.lit(None).cast(dtype)


def make_asset(
    data: Column,
    media_type: str,
    width: Column | None = None,
    height: Column | None = None,
    sample_rate: Column | None = None,
    n_frames: Column | None = None,
) -> Column:
    """Assemble an asset struct from a binary column + metadata columns."""
    return F.struct(
        data.alias("data"),
        F.lit(media_type).alias("media_type"),
        F.length(data).cast("bigint").alias("n_bytes"),
        (width if width is not None else _null("int")).cast("int").alias("width"),
        (height if height is not None else _null("int")).cast("int").alias("height"),
        (sample_rate if sample_rate is not None else _null("int")).cast("int").alias("sample_rate"),
        (n_frames if n_frames is not None else _null("int")).cast("int").alias("n_frames"),
    )


def attach_fake_image_assets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    asset_col: str = "asset",
) -> DataFrame:
    """Deterministic synthetic image assets for tests/fixtures: payload =
    UTF-8 bytes of ``text_col``; dims derived from a stable hash so the
    same row always yields the same (width, height). All JVM-side."""
    data = F.encode(F.col(text_col), "UTF-8")
    h = F.abs(F.xxhash64(F.col(id_col)))
    width = (h % 48 + 16)
    height = ((h / F.lit(48)).cast("bigint") % 48 + 16)
    return df.withColumn(asset_col, make_asset(data, "image", width=width, height=height))


# --------------------------------------------------------------------------
# Byte-level feature extraction (Arrow-batched mapInPandas)
# --------------------------------------------------------------------------

_BYTE_STATS_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("entropy", T.DoubleType()),
    T.StructField("mean_byte", T.DoubleType()),
])


def byte_stats(df: DataFrame, asset_col: str = "asset", id_col: str = "doc_id") -> DataFrame:
    """(id, n_bytes, entropy, mean_byte) per asset — real byte math
    (shannon entropy over the byte histogram), no codec needed.

    Input is pruned to exactly (id, data) before the Python stage so
    Arrow transfers only what the UDF reads.
    """
    import numpy as np  # imported here so the closure ships cleanly

    def compute(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for rid, data in zip(pdf["id"], pdf["data"]):
                buf = np.frombuffer(data if data is not None else b"", dtype=np.uint8)
                if buf.size == 0:
                    out.append((rid, 0, 0.0, 0.0))
                    continue
                counts = np.bincount(buf, minlength=256)
                p = counts[counts > 0] / buf.size
                out.append((
                    rid,
                    int(buf.size),
                    float(-(p * np.log2(p)).sum()),
                    float(buf.mean()),
                ))
            yield pd.DataFrame(out, columns=["id", "n_bytes", "entropy", "mean_byte"])

    pruned = df.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(f"{asset_col}.data").alias("data")
    )
    return pruned.mapInPandas(compute, schema=_BYTE_STATS_SCHEMA)


# --------------------------------------------------------------------------
# "Decode" (deterministic byte-interpretation fake; codec hook inside)
# --------------------------------------------------------------------------

def _decode_u8(data: bytes, width: int, height: int):
    """Decode payload bytes to a (height, width) u8 pixel matrix.

    STUB DECODER: no codec libraries exist in this container, so the
    payload is interpreted as raw u8 pixels, padded/truncated to
    width*height (deterministic, byte-faithful). Real decode drops in
    behind the import-try below without touching any Spark plumbing.
    """
    import numpy as np

    try:  # real-codec hook — not available in this container
        from PIL import Image  # noqa: F401
        import io
        # return np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    except ImportError:
        pass
    buf = np.frombuffer(data if data is not None else b"", dtype=np.uint8)
    need = width * height
    if buf.size < need:
        buf = np.pad(buf, (0, need - buf.size), mode="wrap" if buf.size else "constant")
    return buf[:need].reshape(height, width)


_PIXEL_STATS_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("px_mean", T.DoubleType()),
    T.StructField("px_std", T.DoubleType()),
])


def image_pixel_stats(df: DataFrame, asset_col: str = "asset", id_col: str = "doc_id") -> DataFrame:
    """Decode each image asset and emit per-image pixel stats."""
    def compute(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for rid, data, w, h in zip(pdf["id"], pdf["data"], pdf["width"], pdf["height"]):
                px = _decode_u8(data, int(w), int(h))
                out.append((rid, int(w), int(h), float(px.mean()), float(px.std())))
            yield pd.DataFrame(out, columns=["id", "width", "height", "px_mean", "px_std"])

    pruned = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(f"{asset_col}.data").alias("data"),
        F.col(f"{asset_col}.width").alias("width"),
        F.col(f"{asset_col}.height").alias("height"),
    )
    return pruned.mapInPandas(compute, schema=_PIXEL_STATS_SCHEMA)


def resize_pixel_stats(
    df: DataFrame,
    out_w: int,
    out_h: int,
    asset_col: str = "asset",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode → nearest-neighbor resize to (out_w, out_h) → pixel stats.

    The resample is real numpy index math on the decoded matrix; only
    the decode underneath is the stub."""
    import numpy as np

    def compute(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for rid, data, w, h in zip(pdf["id"], pdf["data"], pdf["width"], pdf["height"]):
                px = _decode_u8(data, int(w), int(h))
                ys = (np.arange(out_h) * px.shape[0] // out_h).clip(0, px.shape[0] - 1)
                xs = (np.arange(out_w) * px.shape[1] // out_w).clip(0, px.shape[1] - 1)
                rs = px[np.ix_(ys, xs)]
                out.append((rid, out_w, out_h, float(rs.mean()), float(rs.std())))
            yield pd.DataFrame(out, columns=["id", "width", "height", "px_mean", "px_std"])

    pruned = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(f"{asset_col}.data").alias("data"),
        F.col(f"{asset_col}.width").alias("width"),
        F.col(f"{asset_col}.height").alias("height"),
    )
    return pruned.mapInPandas(compute, schema=_PIXEL_STATS_SCHEMA)


# --------------------------------------------------------------------------
# Video frame sampling (pure JVM — no Python in the hot path)
# --------------------------------------------------------------------------

def sample_frames(
    df: DataFrame,
    every_n: int = 1,
    asset_col: str = "asset",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode video assets into (id, frame_idx, frame_bytes) rows,
    keeping every ``every_n``-th frame.

    The payload is treated as ``n_frames`` equal-length raw frames (the
    container format for the stub; a real demuxer would be a
    mapInPandas stage like the decoders). Pure built-in expressions:
    ``substring`` on binary + ``posexplode(sequence(...))`` — the
    per-frame cut is codegen'd JVM work and parallelizes per row with
    zero Python."""
    nf = F.col(f"{asset_col}.n_frames")
    frame_len = (F.col(f"{asset_col}.n_bytes") / nf).cast("int")
    idxs = F.sequence(F.lit(0), nf - 1, F.lit(every_n))
    return (
        df.filter(nf.isNotNull() & (nf > 0))
        .select(
            F.col(id_col),
            frame_len.alias("_flen"),
            F.col(f"{asset_col}.data").alias("_data"),
            F.explode(idxs).alias("frame_idx"),
        )
        .select(
            F.col(id_col),
            "frame_idx",
            F.expr("substring(_data, frame_idx * _flen + 1, _flen)").alias("frame_bytes"),
        )
    )


# --------------------------------------------------------------------------
# Audio: windowed RMS over u8 samples
# --------------------------------------------------------------------------

_AUDIO_RMS_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("window_idx", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
])


def audio_window_rms(
    df: DataFrame,
    window: int = 1024,
    asset_col: str = "asset",
    id_col: str = "doc_id",
) -> DataFrame:
    """Windowed RMS energy over the payload interpreted as u8 PCM
    samples (stub codec, same contract as :func:`_decode_u8`). One
    output row per (asset, window)."""
    import numpy as np

    def compute(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, widx, rms = [], [], []
            for rid, data in zip(pdf["id"], pdf["data"]):
                buf = np.frombuffer(data if data is not None else b"", dtype=np.uint8)
                n_win = max(math.ceil(buf.size / window), 0)
                for i in range(n_win):
                    chunk = buf[i * window:(i + 1) * window].astype(np.float64)
                    ids.append(rid)
                    widx.append(i)
                    rms.append(float(np.sqrt((chunk ** 2).mean())) if chunk.size else 0.0)
            yield pd.DataFrame({"id": ids, "window_idx": widx, "rms": rms})

    pruned = df.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(f"{asset_col}.data").alias("data")
    )
    return pruned.mapInPandas(compute, schema=_AUDIO_RMS_SCHEMA)


def decode_pixels(data: bytes, width: int, height: int):
    """Public alias of the stub decoder (see :func:`_decode_u8`)."""
    return _decode_u8(data, width, height)


_PHASH_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("phash", T.LongType()),
])


def image_ahash(
    df: DataFrame,
    asset_col: str = "asset",
    id_col: str = "doc_id",
    canvas: int = 32,
    grid: int = 8,
) -> DataFrame:
    """Perceptual average-hash (aHash) per image asset: decode the
    payload onto a canonical ``canvas``x``canvas`` grid (real codecs
    resize here; the stub's byte-faithful decode IS the
    canonicalization), block-mean down to ``grid``x``grid``, threshold
    each cell at the global mean, and pack the bits into one 64-bit
    int. Near-identical images land within small Hamming distance;
    identical payloads hash identically regardless of declared dims.

    Arrow-batched ``mapInPandas`` over a pruned (id, data) projection —
    one numpy reshape/mean per image, no per-pixel Python.
    """
    if grid * grid > 64:
        raise ValueError("grid too large: at most 64 bits fit the hash")
    if canvas % grid:
        raise ValueError(
            f"canvas ({canvas}) must be a multiple of grid ({grid}); "
            "the block-mean reshape needs whole blocks"
        )

    def compute(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        weights = (1 << np.arange(grid * grid - 1, -1, -1, dtype=np.uint64))
        block = canvas // grid

        for pdf in batches:
            out = []
            for rid, data in zip(pdf["id"], pdf["data"]):
                px = _decode_u8(data, canvas, canvas).astype(np.float64)
                small = px.reshape(grid, block, grid, block).mean(axis=(1, 3))
                bits = (small > small.mean()).astype(np.uint64).ravel()
                out.append((rid, int((bits * weights).sum().astype(np.int64))))
            yield pd.DataFrame(out, columns=["id", "phash"])

    pruned = df.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(f"{asset_col}.data").alias("data")
    )
    return pruned.mapInPandas(compute, schema=_PHASH_SCHEMA)


def phash_dup_groups(
    hashes: DataFrame,
    id_col: str = "id",
    hash_col: str = "phash",
) -> DataFrame:
    """Group identical perceptual hashes: (id, group = min id sharing
    the hash, group_size). One hash-shuffle window — no pairwise work.
    For near-dup (small Hamming) matching, band the hash bits and
    bucket-join exactly as the text SimHash path does."""
    w = Window.partitionBy(hash_col)
    return hashes.select(
        F.col(id_col),
        F.col(hash_col),
        F.min(id_col).over(w).alias("group"),
        F.count(F.lit(1)).over(w).alias("group_size"),
    )


def frame_dedup_stats(
    df: DataFrame,
    every_n: int = 1,
    asset_col: str = "asset",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-video frame-level dedup census: one row with
    ``(n_videos, n_frames, n_distinct_frames, dup_ratio)``.

    The storage question behind it — "how many of the corpus's frames
    are byte-identical copies we need not store or re-embed twice?" —
    is the frame-grain version of exact document dedup. The frame cut
    is the pure-JVM :func:`sample_frames` path; frames are then
    collapsed to ``xxhash64`` fingerprints BEFORE the distinct, so 8
    bytes per frame cross the shuffle, never the frame payloads
    (identical scale posture to the unit-hash census in
    operators/linedup.py). A 64-bit collision would undercount
    distincts by 1 in ~2^32 distinct frames — noise at any real scale.
    """
    frames = sample_frames(df, every_n=every_n, asset_col=asset_col, id_col=id_col)
    return frames.agg(
        F.countDistinct(id_col).alias("n_videos"),
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct(F.xxhash64("frame_bytes")).alias("n_distinct_frames"),
    ).select(
        "n_videos",
        "n_frames",
        "n_distinct_frames",
        F.round(
            F.lit(1.0) - F.col("n_distinct_frames") / F.col("n_frames"), 6
        ).alias("dup_ratio"),
    )


def video_scene_segments(
    df: DataFrame,
    every_n: int = 1,
    asset_col: str = "asset",
    id_col: str = "doc_id",
) -> DataFrame:
    """Shot/scene segmentation over the frame stream: one row per
    maximal run of byte-identical consecutive frames —
    ``(id_col, seg_idx, start_frame, seg_frames, frame_sig)`` — the
    temporal-structure pass video training pipelines run before
    frame sampling (keep one exemplar per shot instead of ``every_n``
    blind). "Scene cut" here is frame-content change under the stub
    codec (a real decoder would difference perceptual hashes in the
    same shape — swap ``frame_sig`` for :func:`image_ahash`'s output).

    Scale: the frame cut is the pure-JVM :func:`sample_frames` path;
    frames collapse to md5 signatures map-side (engine-portable, so
    the DuckDB oracle replays every value), and the lag/segment
    windows partition BY VIDEO — state is one video's frames, never
    global. Hour-long videos are fine (~100k frame rows per
    partition); chunk the frame index upstream if a single video's
    frames outgrow one task."""
    frames = sample_frames(
        df, every_n=every_n, asset_col=asset_col, id_col=id_col
    ).withColumn("frame_sig", F.md5("frame_bytes"))
    w = Window.partitionBy(id_col).orderBy("frame_idx")
    cut = (
        F.lag("frame_sig").over(w).isNull()
        | (F.col("frame_sig") != F.lag("frame_sig").over(w))
    ).cast("int")
    seg = frames.withColumn(
        "seg_idx",
        F.sum(cut).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1,
    )
    return seg.groupBy(id_col, "seg_idx").agg(
        F.min("frame_idx").alias("start_frame"),
        F.count(F.lit(1)).alias("seg_frames"),
        F.min("frame_sig").alias("frame_sig"),
    )
