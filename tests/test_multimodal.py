"""Multimodal asset plumbing: schema, determinism, batch shape,
JVM-side frame sampling (meta_frame_spark.multimodal)."""

import numpy as np
from pyspark.sql import functions as F

from meta_frame_spark.multimodal import (
    attach_fake_image_assets,
    audio_window_rms,
    byte_stats,
    decode_pixels,
    image_pixel_stats,
    resize_pixel_stats,
    sample_frames,
)
from meta_frame_spark.multimodal.assets import make_asset


def test_asset_struct_schema(spark, documents):
    df = attach_fake_image_assets(documents)
    f = {x.name: x.dataType.simpleString() for x in df.schema["asset"].dataType.fields}
    assert f == {
        "data": "binary", "media_type": "string", "n_bytes": "bigint",
        "width": "int", "height": "int", "sample_rate": "int", "n_frames": "int",
    }
    row = df.select("asset.n_bytes", F.length("text").alias("l")).first()
    assert row.n_bytes == row.l  # ascii text -> 1 byte/char


def test_metadata_only_query_prunes_payload(spark, documents):
    """Selecting only metadata must drop asset.data from the plan's
    final ReadSchema/Project (nested-schema pruning at scale)."""
    df = attach_fake_image_assets(documents).select("asset.media_type", "asset.width")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the payload expression (encode of the text column) must be pruned
    # out entirely — no reference to the text column survives
    assert "text#" not in plan and "encode(" not in plan


def test_byte_stats_matches_numpy(spark, documents):
    df = attach_fake_image_assets(documents.limit(20))
    got = {r.id: r for r in byte_stats(df).collect()}
    for row in df.select("doc_id", "text").collect():
        buf = np.frombuffer(row.text.encode(), dtype=np.uint8)
        counts = np.bincount(buf, minlength=256)
        p = counts[counts > 0] / buf.size
        want_entropy = float(-(p * np.log2(p)).sum())
        assert got[row.doc_id].n_bytes == buf.size
        assert abs(got[row.doc_id].entropy - want_entropy) < 1e-9
        assert abs(got[row.doc_id].mean_byte - float(buf.mean())) < 1e-9


def test_pixel_stats_deterministic_and_resize(spark, documents):
    df = attach_fake_image_assets(documents.limit(10))
    a = {r.id: (r.px_mean, r.px_std) for r in image_pixel_stats(df).collect()}
    b = {r.id: (r.px_mean, r.px_std) for r in image_pixel_stats(df).collect()}
    assert a == b  # deterministic fake decode
    rs = resize_pixel_stats(df, out_w=8, out_h=8).collect()
    assert all(r.width == 8 and r.height == 8 for r in rs)
    assert len(rs) == 10


def test_decode_pixels_pads_and_truncates():
    px = decode_pixels(b"abcd", 3, 2)
    assert px.shape == (2, 3)
    assert px.tolist()[0] == [97, 98, 99]  # a b c
    assert px.tolist()[1] == [100, 97, 98]  # wrap-pad d a b
    assert decode_pixels(b"", 2, 2).tolist() == [[0, 0], [0, 0]]


def test_sample_frames_jvm_cut(spark):
    # 12-byte payload declared as 4 frames of 3 bytes
    df = spark.createDataFrame([(1, bytearray(b"aaabbbcccddd"))], ["doc_id", "data"])
    assets = df.select(
        "doc_id",
        make_asset(F.col("data"), "video", n_frames=F.lit(4)).alias("asset"),
    )
    rows = sample_frames(assets, every_n=2).orderBy("frame_idx").collect()
    assert [(r.frame_idx, bytes(r.frame_bytes)) for r in rows] == [
        (0, b"aaa"), (2, b"ccc"),
    ]
    # no Python stage in the plan: pure project/generate
    plan = sample_frames(assets)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_audio_window_rms(spark):
    df = spark.createDataFrame([(7, bytearray(bytes([10] * 4 + [20] * 4)))], ["doc_id", "data"])
    assets = df.select(
        "doc_id", make_asset(F.col("data"), "audio", sample_rate=F.lit(8000)).alias("asset")
    )
    rows = audio_window_rms(assets, window=4).orderBy("window_idx").collect()
    assert [r.window_idx for r in rows] == [0, 1]
    assert abs(rows[0].rms - 10.0) < 1e-9
    assert abs(rows[1].rms - 20.0) < 1e-9


def test_image_ahash_identical_payloads_collide(spark):
    """Identical payloads hash identically even with different declared
    dims (the hash canonicalizes); a perturbed payload lands at a
    small-but-nonzero Hamming distance."""
    from meta_frame_spark.multimodal import image_ahash, phash_dup_groups
    from meta_frame_spark.multimodal.assets import make_asset

    base = ("x" * 700).encode()
    rows = [(1, base, 20, 30), (2, base, 40, 16),  # same payload, diff dims
            (3, (b"y" * 10) + base[10:], 20, 30),  # perturbed payload
            (4, bytes(range(256)) * 4, 32, 32)]    # unrelated
    df = spark.createDataFrame(rows, "doc_id bigint, data binary, w int, h int")
    df = df.withColumn(
        "asset",
        make_asset(F.col("data"), "image", width=F.col("w"), height=F.col("h")),
    )
    h = {r.id: r.phash for r in image_ahash(df).collect()}
    assert h[1] == h[2]
    assert bin(h[1] ^ h[4]).count("1") > 0

    groups = {r.id: (r.group, r.group_size)
              for r in phash_dup_groups(image_ahash(df)).collect()}
    assert groups[1] == (1, 2) and groups[2] == (1, 2)
    assert groups[4][1] == 1


def test_frame_dedup_stats_exact_census(spark):
    """Two videos sharing 2 of 4 frames: 8 total frames, 6 distinct."""
    from meta_frame_spark.multimodal.assets import frame_dedup_stats

    df = spark.createDataFrame(
        [(1, bytearray(b"aaabbbcccddd")), (2, bytearray(b"aaabbbxxxyyy"))],
        ["doc_id", "data"],
    )
    assets = df.select(
        "doc_id",
        make_asset(F.col("data"), "video", n_frames=F.lit(4)).alias("asset"),
    )
    row = frame_dedup_stats(assets).collect()[0]
    assert (row.n_videos, row.n_frames, row.n_distinct_frames) == (2, 8, 6)
    assert abs(row.dup_ratio - (1 - 6 / 8)) < 1e-9


def test_video_scene_segments_hand_computed(spark):
    """Maximal runs of byte-identical frames become segments with the
    right starts/lengths; single-frame and all-identical videos are
    one segment; frame signatures differ across distinct content."""
    from pyspark.sql import functions as F

    from meta_frame_spark.multimodal.assets import (
        make_asset,
        video_scene_segments,
    )

    def vid(doc_id, s, n_frames):
        return (doc_id, s, n_frames)

    rows = [
        vid(1, "aaaaaaaaaaaabbbbbbbbcccc", 6),  # AAA BB C (4-byte frames)
        vid(2, "xxxxxxxx", 2),                  # XX -> one segment
        vid(3, "qrst", 1),                      # single frame
    ]
    df = spark.createDataFrame(rows, "doc_id long, s string, nf int").select(
        "doc_id",
        make_asset(F.encode("s", "UTF-8"), "video",
                   n_frames=F.col("nf")).alias("asset"),
    )
    out = video_scene_segments(df).collect()
    segs = {}
    for r in out:
        segs.setdefault(r.doc_id, []).append(
            (r.seg_idx, r.start_frame, r.seg_frames))
    assert sorted(segs[1]) == [(0, 0, 3), (1, 3, 2), (2, 5, 1)]
    assert sorted(segs[2]) == [(0, 0, 2)]
    assert sorted(segs[3]) == [(0, 0, 1)]
    sigs = {r.frame_sig for r in out if r.doc_id == 1}
    assert len(sigs) == 3  # three distinct contents, three signatures
