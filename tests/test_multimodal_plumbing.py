"""E37 plumbing: resize (schema-preserving binary transform) and frame
sampling (row fan-out through mapInPandas), over real binary columns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.multimodal import (
    resize_images,
    sample_frames,
)


def _media(spark):
    rows = [
        (1, b"x" * 100, ("video", "video/mp4", 4, 4, 2500)),
        (2, b"y" * 10, ("image", "image/png", 4, 4, None)),
        (3, None, ("image", "image/png", 4, 4, None)),
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, payload binary, "
        "meta struct<kind:string,mime:string,width:int,height:int,duration_ms:long>",
    )


def test_resize_schema_and_sizes(spark):
    out = resize_images(_media(spark), 4, 4).collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(by_id[1]["payload"]) == 16  # truncated to w*h
    assert len(by_id[2]["payload"]) == 16  # padded to w*h
    assert by_id[3]["payload"] is None
    assert all(r["width"] == 4 and r["height"] == 4 for r in out)


def test_frame_sampling_fanout(spark):
    frames = sample_frames(_media(spark), every_ms=1000).collect()
    per_id = {}
    for r in frames:
        per_id.setdefault(r["media_id"], []).append(r)
    assert len(per_id[1]) == 2  # 2500ms // 1000ms
    assert [r["frame_ts_ms"] for r in sorted(per_id[1], key=lambda r: r["frame_idx"])] == [0, 1000]
    assert len(per_id[2]) == 1  # no duration -> single frame
    assert per_id[3][0]["frame"] is None


def test_exif_roundtrip_and_robustness():
    """encode_exif_jpeg -> decode_media recovers every tag; big-endian
    TIFF parses too; malformed TIFF blocks degrade to no tags (the
    geometry still parses from SOF)."""
    import struct

    from ccxt_ohlcv_fetcher_spark.operators.multimodal import (
        _parse_exif_tiff,
        decode_media,
        encode_exif_jpeg,
    )

    b = encode_exif_jpeg(
        320, 200, "Acme", "X100", 6, "2024:02:03 04:05:06",
        exposure=(1, 128), focal=(50, 1),
    )
    d = decode_media(b)
    assert d["container"] == "jpeg"
    assert (d["width"], d["height"]) == (320, 200)
    assert d["camera_make"] == "Acme"
    assert d["camera_model"] == "X100"
    assert d["orientation"] == 6
    assert d["captured_at"] == "2024:02:03 04:05:06"
    assert d["exposure_s"] == 1 / 128  # Exif sub-IFD rational
    assert d["focal_mm"] == 50.0

    # GPS IFD (0x8825): refs + 3-rational dms groups -> signed degrees
    g = encode_exif_jpeg(
        64, 48, "Acme", "X100", 1, "2024:02:03 04:05:06",
        gps=(
            "S", ((12, 1), (30, 1), (90, 4)),   # 12°30'22.5" S
            "W", ((100, 1), (15, 1), (0, 4)),   # 100°15'0" W
        ),
    )
    dg = decode_media(g)
    assert dg["gps_lat"] == -(12 + 30 / 60 + 22.5 / 3600)
    assert dg["gps_lon"] == -(100 + 15 / 60 + 0.0 / 3600)
    # no gps argument -> no gps fields
    assert d["gps_lat"] is None and d["gps_lon"] is None

    # big-endian (MM) TIFF with one Orientation entry
    tiff = (
        b"MM\x00\x2a" + struct.pack(">I", 8) + struct.pack(">H", 1)
        + struct.pack(">HHIHH", 0x0112, 3, 1, 3, 0) + struct.pack(">I", 0)
    )
    out = dict.fromkeys(
        ("camera_make", "camera_model", "orientation", "captured_at")
    )
    _parse_exif_tiff(tiff, out)
    assert out["orientation"] == 3

    # corrupt the APP1 TIFF bytes: decode must still yield the geometry
    corrupt = bytearray(b)
    corrupt[12:16] = b"XXXX"  # clobber the TIFF byte-order/magic
    d2 = decode_media(bytes(corrupt))
    assert (d2["width"], d2["height"]) == (320, 200)
    assert d2["camera_make"] is None


def test_mp4_box_walk_roundtrip_and_robustness():
    """encode_minimal_mp4 -> decode_media recovers geometry + duration
    via the ISO-BMFF box walk; version-1 mvhd (64-bit times) parses;
    truncation degrades to container-only, never raises."""
    import struct

    from ccxt_ohlcv_fetcher_spark.operators.multimodal import (
        decode_media,
        encode_minimal_mp4,
    )

    b = encode_minimal_mp4(1920, 1080, 90_000)
    d = decode_media(b)
    assert d["container"] == "mp4"
    assert (d["width"], d["height"]) == (1920, 1080)
    assert d["duration_ms"] == 90_000

    # version-1 mvhd: 64-bit creation/modification/duration fields
    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    mvhd_v1 = box(
        b"mvhd",
        struct.pack(">I", 0x01000000)
        + struct.pack(">QQIQ", 0, 0, 600, 1200)  # timescale 600, dur 1200
        + b"\x00" * 80,
    )
    f = box(b"ftyp", b"isom") + box(b"moov", mvhd_v1)
    assert decode_media(f)["duration_ms"] == 2000

    # truncated mid-moov: container identified, metadata absent
    t = decode_media(b[: len(b) // 2])
    assert t["container"] == "mp4" and t["duration_ms"] is None


def test_webp_header_decode_all_three_flavors():
    """WebP dims from VP8X (extended), VP8L (lossless bitstream), and
    VP8 (lossy keyframe) chunks; unknown chunks are skipped."""
    import struct

    from ccxt_ohlcv_fetcher_spark.operators.multimodal import decode_media

    def riff(payload):
        return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload

    def chunk(cid, p):
        return cid + struct.pack("<I", len(p)) + p + (b"\x00" if len(p) & 1 else b"")

    vp8x = chunk(
        b"VP8X",
        b"\x00\x00\x00\x00"
        + (639).to_bytes(3, "little") + (479).to_bytes(3, "little"),
    )
    d = decode_media(riff(vp8x))
    assert (d["container"], d["width"], d["height"]) == ("webp", 640, 480)

    bits = (99) | (49 << 14)  # width-1=99, height-1=49
    vp8l = chunk(b"VP8L", b"\x2f" + struct.pack("<I", bits))
    d2 = decode_media(riff(chunk(b"XTRA", b"xx") + vp8l))  # skip unknown
    assert (d2["width"], d2["height"]) == (100, 50)

    vp8 = chunk(
        b"VP8 ",
        b"\x00\x00\x00" + b"\x9d\x01\x2a"
        + struct.pack("<HH", 320, 240),
    )
    d3 = decode_media(riff(vp8))
    assert (d3["width"], d3["height"]) == (320, 240)


def test_decode_fragmented_mp4_and_avif_headers():
    """fMP4: mvhd duration 0, real duration recovered from mvex/mehd,
    top-level moof count reported as n_fragments. AVIF: brand-switched
    ISO-BMFF, dims from meta(FULL)/iprp/ipco/ispe. Plain MP4 keeps
    n_fragments NULL."""
    from ccxt_ohlcv_fetcher_spark.operators.multimodal import (
        decode_media,
        encode_minimal_avif,
        encode_minimal_fmp4,
        encode_minimal_mp4,
    )

    d = decode_media(encode_minimal_fmp4(640, 360, 5000, 3))
    assert (d["container"], d["width"], d["height"]) == ("mp4", 640, 360)
    assert d["duration_ms"] == 5000 and d["n_fragments"] == 3

    a = decode_media(encode_minimal_avif(100, 7))
    assert (a["container"], a["width"], a["height"]) == ("avif", 100, 7)
    assert a["duration_ms"] is None and a["n_fragments"] is None

    m = decode_media(encode_minimal_mp4(10, 5, 400))
    assert m["n_fragments"] is None and m["duration_ms"] == 400


def test_rollup_frame_features_matches_unfused_chain(spark):
    """r12 fused rollup pin: ``rollup_frame_features`` must be
    value-identical to the chain it replaces in
    ``multimodal_frame_rollup`` — sample_frames -> extract_features ->
    groupBy(media_id).agg(count, sum(n_bytes), sum(checksum)) — over
    every edge shape: None payload, empty payload with a duration,
    payload shorter than one frame, tail-partial frames, and the
    wraparound case where n_frames * frame_bytes > len(body)."""
    from ccxt_ohlcv_fetcher_spark.operators.multimodal import (
        extract_features,
        rollup_frame_features,
        sample_frames,
    )

    rows = [
        (1, bytes(range(100)) * 1, ("video", "video/mp4", 4, 4, 2500)),
        (2, b"y" * 10, ("image", "image/png", 4, 4, None)),
        (3, None, ("image", "image/png", 4, 4, None)),
        (4, b"", ("video", "video/mp4", 4, 4, 3000)),
        (5, bytes(range(30)), ("video", "video/mp4", 4, 4, 5000)),
        (6, None, ("video", "video/mp4", 4, 4, 2000)),
        (7, bytes(range(256)) * 3, ("video", "video/mp4", 4, 4, 999)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, payload binary, "
        "meta struct<kind:string,mime:string,width:int,height:int,duration_ms:long>",
    )

    frames = sample_frames(media, every_ms=1000, frame_bytes=64)
    feats = extract_features(
        frames.select("media_id", "frame_idx", F.col("frame").alias("payload")),
        id_cols=("media_id", "frame_idx"),
    )
    unfused = {
        r["media_id"]: (r["n_frames"], r["bytes_total"], r["checksum_total"])
        for r in feats.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("n_bytes").alias("bytes_total"),
            F.sum("checksum").alias("checksum_total"),
        )
        .collect()
    }
    fused = {
        r["media_id"]: (r["n_frames"], r["bytes_total"], r["checksum_total"])
        for r in rollup_frame_features(media, every_ms=1000, frame_bytes=64).collect()
    }
    assert fused == unfused
    assert set(fused) == {1, 2, 3, 4, 5, 6, 7}
