"""Multimodal column handling (north star; SURVEY.md §2.11, op E37).

Images/audio/video are opaque ``binary`` payloads + typed metadata
structs in one table; heavy per-item work (decode, resize, feature
extraction, frame sampling) runs as Arrow-batched ``mapInPandas`` so
each Python worker sees a columnar batch, not a row.

``decode_media`` is a REAL container-header decoder: pure-Python
parsing of PNG (IHDR chunk incl. CRC check), GIF, BMP, JPEG (SOF scan)
and RIFF/WAV (fmt + data chunks -> sample rate, channels, duration),
straight from the public file-format specs — no codec libraries needed.
Pixel/sample decoding (the part that genuinely needs libjpeg/libsndfile
etc., absent from this container) stays a clearly-marked STUB in the
feature kernels; the decode -> metadata path is end-to-end real and
oracle-checked (``multimodal_probe`` in plans/llm.py).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),  # image|audio|video
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_FIELDS = (
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("head_byte", T.IntegerType(), True),
    T.StructField("checksum", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
)

FEATURE_SCHEMA = T.StructType(
    [T.StructField("media_id", T.LongType(), False), *FEATURE_FIELDS]
)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_media(payload: bytes, meta: dict | None = None) -> dict:
    """Real container-header decode: identify the format from magic bytes
    and parse its dimension/duration metadata. Pure Python over the
    public file-format specs (PNG RFC 2083 §3; GIF87a/89a; BMP
    BITMAPINFOHEADER; JPEG ISO 10918 marker stream; RIFF/WAVE).

    Returns ``{"container", "width", "height", "duration_ms",
    "channels", "sample_rate"}`` (absent aspects ``None``). Raises
    ``ValueError`` on unrecognized or truncated payloads — callers in
    Spark kernels catch it and emit an error row, never crash the task.

    Pixel/sample decoding beyond the header (needs real codec libs)
    remains out of scope — see module docstring.
    """
    if payload is None or len(payload) < 4:
        raise ValueError("empty or truncated payload")
    b = bytes(payload)
    out: dict = {
        "container": None,
        "width": None,
        "height": None,
        "duration_ms": None,
        "channels": None,
        "sample_rate": None,
        "title": None,
        "artist": None,
        "album": None,
        "year": None,
        "camera_make": None,
        "camera_model": None,
        "orientation": None,
        "captured_at": None,
        "exposure_s": None,
        "focal_mm": None,
        "gps_lat": None,
        "gps_lon": None,
        "n_fragments": None,
    }
    if b.startswith(_PNG_MAGIC):
        # PNG: 8-byte magic, then chunks of (len, type, data, crc32).
        # IHDR must come first: width/height are big-endian uint32.
        if len(b) < 33 or b[12:16] != b"IHDR":
            raise ValueError("PNG missing IHDR")
        (length,) = struct.unpack(">I", b[8:12])
        if length != 13:
            raise ValueError("PNG IHDR wrong length")
        data = b[16:29]
        (crc,) = struct.unpack(">I", b[29:33])
        if zlib.crc32(b"IHDR" + data) & 0xFFFFFFFF != crc:
            raise ValueError("PNG IHDR CRC mismatch")
        out["container"] = "png"
        out["width"], out["height"] = struct.unpack(">II", data[:8])
        return out
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) < 10:
            raise ValueError("GIF truncated")
        out["container"] = "gif"
        out["width"], out["height"] = struct.unpack("<HH", b[6:10])
        return out
    if b[:2] == b"BM":
        # BMP: BITMAPINFOHEADER at offset 14; int32 LE width, height
        # (height may be negative for top-down rows — abs it)
        if len(b) < 26:
            raise ValueError("BMP truncated")
        w, h = struct.unpack("<ii", b[18:26])
        out["container"] = "bmp"
        out["width"], out["height"] = w, abs(h)
        return out
    if b[:2] == b"\xff\xd8":
        # JPEG: walk the marker stream to the first SOFn frame header
        # (C0-CF excluding C4/C8/CC which are tables, not frames).
        # Markers may be preceded by any number of 0xFF fill bytes
        # (ISO 10918-1 B.1.1.2); the walk must stop at SOS/EOI because
        # entropy-coded data is not marker-structured.
        i = 2
        while i + 2 <= len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            while i + 1 < len(b) and b[i + 1] == 0xFF:
                i += 1  # legal fill bytes before the marker
            if i + 2 > len(b):
                break
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length field
                continue
            if marker in (0xD9, 0xDA):  # EOI / SOS
                break
            if i + 4 > len(b):
                break
            (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
            if marker == 0xE1 and b[i + 4 : i + 10] == b"Exif\x00\x00":
                # APP1/Exif: a TIFF block (byte-order II/MM + IFD0) with
                # camera metadata tags; malformed blocks are skipped,
                # never fatal — the image geometry still parses from SOF
                _parse_exif_tiff(b[i + 10 : i + 2 + seglen], out)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(b):
                    break
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                out["container"] = "jpeg"
                out["width"], out["height"] = w, h
                return out
            i += 2 + seglen
        raise ValueError("JPEG has no SOF frame header")
    if b[:3] == b"ID3" and len(b) >= 10:
        # MP3 with an ID3v2 envelope: header = "ID3" + version(2) +
        # flags(1) + 4-byte syncsafe tag size (7 bits per byte). Text
        # frames (TIT2/TPE1/TALB/TYER/TDRC, informal standard id3.org
        # id3v2.3/2.4) parse into typed tag fields; a trailing ID3v1
        # block fills any gaps. Audio duration needs frame-by-frame
        # parsing (out of header scope).
        if any(x & 0x80 for x in b[6:10]):
            raise ValueError("ID3v2 size bytes must be syncsafe")
        out["container"] = "mp3"
        version = b[3]
        tag_size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
        region = b[10 : 10 + tag_size]
        field_map = {
            b"TIT2": "title",
            b"TPE1": "artist",
            b"TALB": "album",
            b"TYER": "year",
            b"TDRC": "year",  # v2.4 renamed TYER
        }
        i = 0
        while i + 10 <= len(region):
            fid = region[i : i + 4]
            if fid[0] == 0:  # zero padding ends the frame list
                break
            size_bytes = region[i + 4 : i + 8]
            if version >= 4:
                if any(x & 0x80 for x in size_bytes):
                    break  # malformed v2.4 size: stop, keep parsed tags
                fsize = (
                    (size_bytes[0] << 21)
                    | (size_bytes[1] << 14)
                    | (size_bytes[2] << 7)
                    | size_bytes[3]
                )
            else:
                (fsize,) = struct.unpack(">I", size_bytes)
            if fsize <= 0 or i + 10 + fsize > len(region):
                break
            key = field_map.get(fid)
            data = region[i + 10 : i + 10 + fsize]
            if key is not None and len(data) >= 1:
                txt = _decode_id3_text(data[0], data[1:])
                if txt:
                    out[key] = txt
            i += 10 + fsize
        _fill_from_id3v1(b, out)
        return out
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        # WAV: chunk walk for fmt (channels, sample rate, byte rate)
        # and data (payload size) -> duration = data / byte_rate
        i = 12
        fmt = None
        data_size = None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            (csize,) = struct.unpack("<I", b[i + 4 : i + 8])
            if cid == b"fmt " and i + 8 + 16 <= len(b):
                fmt = struct.unpack("<HHIIHH", b[i + 8 : i + 24])
            elif cid == b"data":
                data_size = csize
            i += 8 + csize + (csize & 1)  # chunks are word-aligned
        if fmt is None:
            raise ValueError("WAV missing fmt chunk")
        _, channels, sample_rate, byte_rate, _, _ = fmt
        out["container"] = "wav"
        out["channels"] = channels
        out["sample_rate"] = sample_rate
        if data_size is not None and byte_rate:
            out["duration_ms"] = int(data_size * 1000 // byte_rate)
        return out
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        # WebP (RIFF container): VP8X extended header carries the
        # 24-bit canvas-minus-one dims; VP8L (lossless) packs 14-bit
        # dims into its LE bitstream; VP8 (lossy) keyframes carry
        # 14-bit dims after the 9D 01 2A start code.
        out["container"] = "webp"
        i = 12
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            (csize,) = struct.unpack("<I", b[i + 4 : i + 8])
            p = b[i + 8 : i + 8 + csize]
            if cid == b"VP8X" and len(p) >= 10:
                out["width"] = 1 + int.from_bytes(p[4:7], "little")
                out["height"] = 1 + int.from_bytes(p[7:10], "little")
                break
            if cid == b"VP8L" and len(p) >= 5 and p[0] == 0x2F:
                bits = int.from_bytes(p[1:5], "little")
                out["width"] = 1 + (bits & 0x3FFF)
                out["height"] = 1 + ((bits >> 14) & 0x3FFF)
                break
            if cid == b"VP8 " and len(p) >= 10 and p[3:6] == b"\x9d\x01\x2a":
                out["width"] = struct.unpack("<H", p[6:8])[0] & 0x3FFF
                out["height"] = struct.unpack("<H", p[8:10])[0] & 0x3FFF
                break
            i += 8 + csize + (csize & 1)
        return out
    if len(b) >= 12 and b[4:8] == b"ftyp":
        # ISO-BMFF (ISO 14496-12): length-prefixed box tree. The major
        # brand splits the family: avif/avis is a HEIF still image
        # (dims live under meta/iprp/ipco/ispe), anything else is
        # MP4/MOV (mvhd duration, tkhd geometry, and for FRAGMENTED
        # files mvex/mehd + the top-level moof count). Codec/sample
        # parsing (stsd and below) needs real decoders — out of header
        # scope like the other containers.
        if b[8:12] in (b"avif", b"avis"):
            out["container"] = "avif"
            for btype, lo, hi in _bmff_boxes(b, 0, len(b)):
                if btype != b"meta":
                    continue
                # meta is a FULL box: 4 version/flags bytes precede
                # its children (the classic HEIF-walk gotcha)
                for ct, clo, chi in _bmff_boxes(b, lo + 4, hi):
                    if ct != b"iprp":
                        continue
                    for pt, plo, phi in _bmff_boxes(b, clo, chi):
                        if pt != b"ipco":
                            continue
                        for qt, qlo, qhi in _bmff_boxes(b, plo, phi):
                            if qt == b"ispe" and qhi - qlo >= 12:
                                out["width"], out["height"] = struct.unpack(
                                    ">II", b[qlo + 4 : qlo + 12]
                                )
                return out
            return out  # brand-only AVIF: no meta/ispe parsed
        out["container"] = "mp4"
        n_moof = 0
        timescale = duration = None
        mehd_duration = None
        for btype, lo, hi in _bmff_boxes(b, 0, len(b)):
            if btype == b"moof":
                # fragmented MP4: each moof/mdat pair is one fragment
                n_moof += 1
                continue
            if btype != b"moov":
                continue
            for ctype, clo, chi in _bmff_boxes(b, lo, hi):
                if ctype == b"mvhd" and chi - clo >= 20:
                    v = _bmff_version(b, clo)
                    if v == 1 and chi - clo >= 28:
                        timescale, duration = struct.unpack(
                            ">IQ", b[clo + 20 : clo + 32]
                        )
                    else:
                        timescale, duration = struct.unpack(
                            ">II", b[clo + 12 : clo + 20]
                        )
                elif ctype == b"mvex":
                    # movie-extends: declares the file fragmented; mehd
                    # (when present) carries the TOTAL fragment
                    # duration, since mvhd's duration is 0 in fMP4
                    for mt, mlo, mhi in _bmff_boxes(b, clo, chi):
                        if mt != b"mehd":
                            continue
                        v = _bmff_version(b, mlo)
                        if v == 1 and mhi - mlo >= 12:
                            (mehd_duration,) = struct.unpack(
                                ">Q", b[mlo + 4 : mlo + 12]
                            )
                        elif mhi - mlo >= 8:
                            (mehd_duration,) = struct.unpack(
                                ">I", b[mlo + 4 : mlo + 8]
                            )
                elif ctype == b"trak":
                    for ttype, tlo, thi in _bmff_boxes(b, clo, chi):
                        if ttype != b"tkhd":
                            continue
                        v = _bmff_version(b, tlo)
                        woff = tlo + (88 if v == 1 else 76)
                        if thi - woff >= 8:
                            w_fx, h_fx = struct.unpack(
                                ">II", b[woff : woff + 8]
                            )
                            if w_fx and h_fx:  # audio tracks carry 0x0
                                out["width"] = w_fx >> 16
                                out["height"] = h_fx >> 16
        if timescale:
            eff = duration if duration else (mehd_duration or 0)
            out["duration_ms"] = int(eff * 1000 // timescale)
        if n_moof:
            out["n_fragments"] = n_moof
        return out
    raise ValueError(f"unrecognized container (magic {b[:4]!r})")


def _bmff_boxes(buf: bytes, i: int, end: int):
    """Yield (type, payload_lo, payload_hi) for each ISO-BMFF box in
    ``buf[i:end]`` — 32-bit sizes, 64-bit largesize (size==1), and
    to-end-of-scope (size==0); malformed sizes stop the walk, keeping
    whatever parsed."""
    while i + 8 <= end:
        (size,) = struct.unpack(">I", buf[i : i + 4])
        btype = buf[i + 4 : i + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                return
            (size,) = struct.unpack(">Q", buf[i + 8 : i + 16])
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - i
        if size < hdr or i + size > end:
            return
        yield btype, i + hdr, i + size
        i += size


def _bmff_version(buf: bytes, i: int) -> int:
    return buf[i] if i < len(buf) else 0


def _decode_id3_text(enc: int, raw: bytes) -> str | None:
    """ID3v2 text-frame payload: 1 encoding byte then the string
    (0 latin-1, 1 utf-16 w/BOM, 2 utf-16be, 3 utf-8). Undecodable or
    unknown-encoding data degrades to None, never an exception."""
    codec = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}.get(enc)
    if codec is None:
        return None
    try:
        return raw.decode(codec).rstrip("\x00") or None
    except UnicodeDecodeError:
        return None


def _fill_from_id3v1(b: bytes, out: dict) -> None:
    """ID3v1: a fixed-layout 128-byte trailer ("TAG" + title[30] +
    artist[30] + album[30] + year[4] + comment[30] + genre[1]).
    Fills only fields ID3v2 frames did not already set (v2 wins —
    it is the richer, better-specified block)."""
    if len(b) < 128 or b[-128:-125] != b"TAG":
        return
    t = b[-128:]
    for key, lo, n in (
        ("title", 3, 30),
        ("artist", 33, 30),
        ("album", 63, 30),
        ("year", 93, 4),
    ):
        if out.get(key) is None:
            val = t[lo : lo + n].decode("latin-1", "replace").rstrip("\x00 ")
            out[key] = val or None


_EXIF_TAGS = {
    0x010F: "camera_make",   # Make, ASCII
    0x0110: "camera_model",  # Model, ASCII
    0x0112: "orientation",   # Orientation, SHORT 1..8
    0x0132: "captured_at",   # DateTime "YYYY:MM:DD HH:MM:SS", ASCII
    0x829A: "exposure_s",    # ExposureTime, RATIONAL (in the Exif sub-IFD)
    0x920A: "focal_mm",      # FocalLength, RATIONAL (in the Exif sub-IFD)
}
_EXIF_IFD_POINTER = 0x8769  # tag whose LONG value is the sub-IFD offset
_GPS_IFD_POINTER = 0x8825  # GPSInfo: LONG value is the GPS IFD offset
# GPS IFD has its OWN tag namespace (EXIF 2.32 §4.6.6)
_GPS_LAT_REF, _GPS_LAT, _GPS_LON_REF, _GPS_LON = 1, 2, 3, 4


def _parse_exif_tiff(
    tiff: bytes, out: dict, _ifd: int | None = None, _gps: bool = False
) -> None:
    """TIFF 6.0 IFD walk (the structure EXIF embeds in JPEG APP1):
    2-byte byte order (II little / MM big), magic 42, IFD0 offset, then
    12-byte entries of (tag, type, count, value-or-offset). Parses the
    camera tags in :data:`_EXIF_TAGS` — ASCII values longer than 4
    bytes and RATIONAL (num/den uint32 pair) values live at an offset
    relative to the TIFF start — and follows the ExifIFD pointer
    (0x8769) one level for the photographic tags and the GPSInfo
    pointer (0x8825) for latitude/longitude (GPS IFD tags live in
    their OWN namespace: ref letters are inline 2-byte ASCII, the
    coordinate is a 3-RATIONAL deg/min/sec group combined here to
    signed decimal degrees). Every read is bounds-checked; malformed
    blocks fill nothing and never raise."""
    if len(tiff) < 8:
        return
    order = tiff[:2]
    if order == b"II":
        endian = "<"
    elif order == b"MM":
        endian = ">"
    else:
        return
    (magic, ifd0) = struct.unpack(endian + "HI", tiff[2:8])
    if magic != 42:
        return
    ifd = ifd0 if _ifd is None else _ifd
    if ifd + 2 > len(tiff):
        return
    (n_entries,) = struct.unpack(endian + "H", tiff[ifd : ifd + 2])
    for k in range(n_entries):
        e = ifd + 2 + 12 * k
        if e + 12 > len(tiff):
            break
        tag, typ, count = struct.unpack(endian + "HHI", tiff[e : e + 8])
        if tag == _EXIF_IFD_POINTER and typ == 4 and _ifd is None:
            (sub,) = struct.unpack(endian + "I", tiff[e + 8 : e + 12])
            if 0 < sub < len(tiff):
                _parse_exif_tiff(tiff, out, _ifd=sub)  # one level only
            continue
        if tag == _GPS_IFD_POINTER and typ == 4 and _ifd is None:
            (sub,) = struct.unpack(endian + "I", tiff[e + 8 : e + 12])
            if 0 < sub < len(tiff):
                _parse_exif_tiff(tiff, out, _ifd=sub, _gps=True)
            continue
        if _gps:
            if typ == 2 and count <= 4 and tag in (_GPS_LAT_REF, _GPS_LON_REF):
                raw = tiff[e + 8 : e + 8 + count].split(b"\x00", 1)[0]
                ref = raw.decode("latin-1", "replace")
                if ref in ("N", "S", "E", "W"):
                    out["_lat_ref" if tag == _GPS_LAT_REF else "_lon_ref"] = ref
            elif typ == 5 and count == 3 and tag in (_GPS_LAT, _GPS_LON):
                (off,) = struct.unpack(endian + "I", tiff[e + 8 : e + 12])
                if off + 24 > len(tiff):
                    continue
                vals = []
                for j in range(3):
                    num, den = struct.unpack(
                        endian + "II", tiff[off + 8 * j : off + 8 * j + 8]
                    )
                    if not den:
                        break
                    vals.append(num / den)
                if len(vals) == 3:
                    # left-to-right double fold matches the oracle's
                    # d + m/60 + s/3600 expression bit-for-bit
                    out["_lat" if tag == _GPS_LAT else "_lon"] = (
                        vals[0] + vals[1] / 60 + vals[2] / 3600
                    )
            continue
        key = _EXIF_TAGS.get(tag)
        if key is None:
            continue
        if typ == 2:  # ASCII, NUL-terminated, count includes the NUL
            if count <= 4:
                raw = tiff[e + 8 : e + 8 + count]
            else:
                (off,) = struct.unpack(endian + "I", tiff[e + 8 : e + 12])
                if off + count > len(tiff):
                    continue
                raw = tiff[off : off + count]
            val = raw.split(b"\x00", 1)[0].decode("latin-1", "replace")
            if val and key in ("camera_make", "camera_model", "captured_at"):
                out[key] = val
        elif typ == 3 and key == "orientation":  # SHORT, inline
            (v,) = struct.unpack(endian + "H", tiff[e + 8 : e + 10])
            if 1 <= v <= 8:
                out[key] = v
        elif typ == 5 and key in ("exposure_s", "focal_mm") and count == 1:
            # RATIONAL: two uint32 (numerator, denominator) at offset
            (off,) = struct.unpack(endian + "I", tiff[e + 8 : e + 12])
            if off + 8 > len(tiff):
                continue
            num, den = struct.unpack(endian + "II", tiff[off : off + 8])
            if den:
                out[key] = num / den
    if _ifd is None and not _gps:
        # combine GPS intermediates to signed decimal degrees (S/W < 0)
        lat, latr = out.pop("_lat", None), out.pop("_lat_ref", None)
        if lat is not None:
            out["gps_lat"] = -lat if latr == "S" else lat
        lon, lonr = out.pop("_lon", None), out.pop("_lon_ref", None)
        if lon is not None:
            out["gps_lon"] = -lon if lonr == "W" else lon


def encode_exif_jpeg(
    width: int,
    height: int,
    make: str,
    model: str,
    orientation: int,
    captured_at: str,
    exposure: tuple[int, int] | None = None,
    focal: tuple[int, int] | None = None,
    gps: tuple[str, tuple, str, tuple] | None = None,
) -> bytes:
    """Minimal spec-valid JPEG with an APP1/Exif TIFF block: SOI, APP1
    (little-endian TIFF, IFD0 with Make/Model/Orientation/DateTime and,
    when ``exposure``/``focal`` (num, den) rationals are given, an Exif
    sub-IFD pointer (0x8769) to ExposureTime/FocalLength; when ``gps``
    is given, a GPSInfo pointer (0x8825) to a GPS IFD), SOF0 carrying
    the geometry, SOS header, EOI. Used by the typed media fixture so
    the EXIF parse is oracle-checkable end to end.

    ``gps`` = (lat_ref, lat_dms, lon_ref, lon_dms) with each dms a
    3-tuple of (num, den) rationals (degrees, minutes, seconds)."""
    has_sub = exposure is not None or focal is not None
    has_gps = gps is not None
    sub_tags = [
        (0x829A, exposure),
        (0x920A, focal),
    ]
    sub_tags = [(t, v) for t, v in sub_tags if v is not None]
    n_ifd0 = 4 + (1 if has_sub else 0) + (1 if has_gps else 0)
    ifd0_off = 8
    sub_off = ifd0_off + 2 + n_ifd0 * 12 + 4
    gps_off = sub_off + (2 + len(sub_tags) * 12 + 4 if has_sub else 0)
    rat_off = gps_off + (2 + 4 * 12 + 4 if has_gps else 0)
    gps_rat_off = rat_off + 8 * len(sub_tags)
    data_off = gps_rat_off + (48 if has_gps else 0)  # ASCII area last
    entries = []
    data_area = b""

    def ascii_entry(tag: int, s: str) -> bytes:
        nonlocal data_area
        raw = s.encode("latin-1") + b"\x00"
        if len(raw) <= 4:
            return struct.pack("<HHI4s", tag, 2, len(raw), raw.ljust(4, b"\x00"))
        off = data_off + len(data_area)
        data_area += raw
        return struct.pack("<HHII", tag, 2, len(raw), off)

    entries.append(ascii_entry(0x010F, make))
    entries.append(ascii_entry(0x0110, model))
    entries.append(struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0))
    entries.append(ascii_entry(0x0132, captured_at))
    sub_block = b""
    rat_area = b""
    if has_sub:
        entries.append(struct.pack("<HHII", 0x8769, 4, 1, sub_off))
        sub_entries = []
        for j, (tag, (num, den)) in enumerate(sub_tags):
            sub_entries.append(
                struct.pack("<HHII", tag, 5, 1, rat_off + 8 * j)
            )
            rat_area += struct.pack("<II", num, den)
        sub_block = (
            struct.pack("<H", len(sub_entries)) + b"".join(sub_entries)
            + struct.pack("<I", 0)
        )
    gps_block = b""
    gps_rat_area = b""
    if has_gps:
        entries.append(struct.pack("<HHII", 0x8825, 4, 1, gps_off))
        lat_ref, lat_dms, lon_ref, lon_dms = gps
        gps_entries = [
            struct.pack(
                "<HHI4s", 1, 2, 2, (lat_ref.encode() + b"\x00").ljust(4, b"\x00")
            ),
            struct.pack("<HHII", 2, 5, 3, gps_rat_off),
            struct.pack(
                "<HHI4s", 3, 2, 2, (lon_ref.encode() + b"\x00").ljust(4, b"\x00")
            ),
            struct.pack("<HHII", 4, 5, 3, gps_rat_off + 24),
        ]
        for num, den in (*lat_dms, *lon_dms):
            gps_rat_area += struct.pack("<II", num, den)
        gps_block = (
            struct.pack("<H", 4) + b"".join(gps_entries) + struct.pack("<I", 0)
        )
    tiff = (
        b"II*\x00" + struct.pack("<I", ifd0_off)
        + struct.pack("<H", len(entries)) + b"".join(entries)
        + struct.pack("<I", 0) + sub_block + gps_block
        + rat_area + gps_rat_area + data_area
    )
    exif_payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(exif_payload)) + exif_payload
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    sos = b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"
    return b"\xff\xd8" + app1 + sof0 + sos + b"\xff\xd9"


def encode_id3v2_mp3(
    title: str | None = None,
    artist: str | None = None,
    album: str | None = None,
    year: str | None = None,
    id3v1_trailer: bool = False,
) -> bytes:
    """Minimal spec-valid MP3 metadata envelope: an ID3v2.3 tag with
    latin-1 text frames (optionally plus an ID3v1 trailer). Used to
    synthesize audio payloads with parseable tags in tests and the
    ``multimodal_probe`` fixture (no audio libs in this container)."""
    frames = b""
    for fid, val in (
        (b"TIT2", title),
        (b"TPE1", artist),
        (b"TALB", album),
        (b"TYER", year),
    ):
        if val is None:
            continue
        data = b"\x00" + val.encode("latin-1")
        frames += fid + struct.pack(">I", len(data)) + b"\x00\x00" + data
    size = len(frames)
    syncsafe = bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    )
    payload = b"ID3\x03\x00\x00" + syncsafe + frames
    if id3v1_trailer:

        def field(s: str | None, n: int) -> bytes:
            return (s or "").encode("latin-1")[:n].ljust(n, b"\x00")

        payload += (
            b"TAG"
            + field(title, 30)
            + field(artist, 30)
            + field(album, 30)
            + field(year, 4)
            + b"\x00" * 30
            + b"\xff"  # genre: none
        )
    return payload


def encode_minimal_mp4(
    width: int, height: int, duration_ms: int, timescale: int = 1000
) -> bytes:
    """Minimal spec-valid ISO-BMFF file: ftyp + moov(mvhd + trak(tkhd))
    — correct box sizes, version-0 full boxes, 16.16-fixed track
    dimensions, movie duration in ``timescale`` units. Used by the
    typed media fixture so the MP4 box walk is oracle-checkable."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    duration = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        struct.pack(">I", 0)  # version 0 + flags
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">I", 0x000007)  # version 0 + enabled/in-movie flags
        + struct.pack(">IIII", 0, 0, 1, 0)  # times, track_ID, reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8  # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/group/volume/reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = box(b"trak", tkhd)
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov


def encode_minimal_fmp4(
    width: int,
    height: int,
    duration_ms: int,
    n_fragments: int,
    timescale: int = 1000,
) -> bytes:
    """Minimal spec-valid FRAGMENTED ISO-BMFF file (the DASH/HLS
    streaming layout): ftyp + moov(mvhd duration=0 + trak(tkhd) +
    mvex(mehd total-fragment-duration + trex defaults)) followed by
    ``n_fragments`` moof(mfhd + traf(tfhd)) + mdat pairs. mvhd's zero
    duration is the fMP4 signature — the real duration lives in mehd,
    exactly what the decoder's mvex walk recovers."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(
        b"ftyp", b"iso5" + struct.pack(">I", 512) + b"iso5iso6mp41dash"
    )
    mvhd = box(
        b"mvhd",
        struct.pack(">I", 0)
        + struct.pack(">IIII", 0, 0, timescale, 0)  # duration 0: fMP4
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">I", 0x000007)
        + struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", 0)  # duration 0 here too
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mehd = box(
        b"mehd",
        struct.pack(">II", 0, duration_ms * timescale // 1000),
    )
    trex = box(
        b"trex", struct.pack(">IIIIII", 0, 1, 1, 0, 0, 0)
    )  # track 1 defaults (sample description 1)
    moov = box(
        b"moov", mvhd + box(b"trak", tkhd) + box(b"mvex", mehd + trex)
    )
    frags = b""
    for seq in range(1, n_fragments + 1):
        mfhd = box(b"mfhd", struct.pack(">II", 0, seq))
        tfhd = box(
            b"tfhd", struct.pack(">II", 0x020000, 1)
        )  # default-base-is-moof, track 1
        frags += box(b"moof", mfhd + box(b"traf", tfhd)) + box(b"mdat", b"")
    return ftyp + moov + frags


def encode_minimal_avif(width: int, height: int) -> bytes:
    """Minimal spec-valid AVIF (HEIF) header: ftyp with major brand
    'avif' + meta FULL box containing hdlr('pict') and
    iprp(ipco(ispe(width, height))) — the property walk every AVIF
    dimension probe performs."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"avif" + struct.pack(">I", 0) + b"avifmif1miaf")
    hdlr = box(
        b"hdlr",
        struct.pack(">I", 0)
        + struct.pack(">I", 0)
        + b"pict"
        + b"\x00" * 12
        + b"\x00",
    )
    ispe = box(b"ispe", struct.pack(">III", 0, width, height))
    meta = box(
        b"meta",
        struct.pack(">I", 0) + hdlr + box(b"iprp", box(b"ipco", ispe)),
    )
    return ftyp + meta


def encode_minimal_png(width: int, height: int) -> bytes:
    """Smallest standards-valid PNG prefix a header decoder accepts:
    magic + IHDR chunk (8-bit RGB) with a correct CRC32. Used to
    synthesize image payloads in tests and the ``multimodal_probe``
    fixture query (no image libs in this container)."""
    data = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + struct.pack(">I", 13)
        + b"IHDR"
        + data
        + struct.pack(">I", zlib.crc32(b"IHDR" + data) & 0xFFFFFFFF)
    )


def encode_minimal_wav(
    n_samples: int, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Minimal PCM16 RIFF/WAVE container with a silent data chunk —
    real, spec-conformant bytes (plays in any audio tool)."""
    data = b"\x00\x00" * n_samples * channels
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("artist", T.StringType(), True),
        T.StructField("album", T.StringType(), True),
        T.StructField("year", T.StringType(), True),
        T.StructField("camera_make", T.StringType(), True),
        T.StructField("camera_model", T.StringType(), True),
        T.StructField("orientation", T.IntegerType(), True),
        T.StructField("captured_at", T.StringType(), True),
        T.StructField("exposure_s", T.DoubleType(), True),
        T.StructField("focal_mm", T.DoubleType(), True),
        T.StructField("gps_lat", T.DoubleType(), True),
        T.StructField("gps_lon", T.DoubleType(), True),
        T.StructField("n_fragments", T.IntegerType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)

_PROBE_FIELDS = (
    "container", "width", "height", "duration_ms",
    "channels", "sample_rate", "title", "artist", "album", "year",
    "camera_make", "camera_model", "orientation", "captured_at",
    "exposure_s", "focal_mm", "gps_lat", "gps_lon", "n_fragments",
)


def probe_media(media: DataFrame) -> DataFrame:
    """Distributed header decode (op E37, the real path): Arrow-batched
    ``mapInPandas`` running :func:`decode_media` per payload. Malformed
    payloads yield a row with ``decode_error`` set — a bad file never
    fails the task (at 100 TB some inputs are always corrupt).

    Header parsing is O(header) per row regardless of payload size and
    embarrassingly parallel: no shuffle, columnar batches in and out.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in PROBE_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rows["media_id"].append(mid)
                try:
                    d = decode_media(payload)
                    err = None
                except ValueError as e:
                    d = dict.fromkeys(_PROBE_FIELDS)
                    err = str(e)
                for f in _PROBE_FIELDS:
                    rows[f].append(d[f])
                rows["decode_error"].append(err)
            yield pd.DataFrame(rows).astype(
                {
                    "width": "Int32",
                    "height": "Int32",
                    "duration_ms": "Int64",
                    "channels": "Int32",
                    "sample_rate": "Int32",
                    "orientation": "Int32",
                    "n_fragments": "Int32",
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, PROBE_SCHEMA)


def typed_media_from_documents(documents: DataFrame) -> DataFrame:
    """Synthesize REAL container payloads from the documents fixture:
    doc_id % 8 == 1 becomes a tagged MP3 (ID3v2.3 frames + ID3v1
    trailer), doc_id % 8 == 3 an EXIF-tagged JPEG (APP1/TIFF IFD0 with
    Make/Model/Orientation/DateTime), doc_id % 8 == 5 an MP4,
    doc_id % 16 == 7 a FRAGMENTED MP4 (mehd duration + moof
    fragments), doc_id % 16 == 0 an AVIF (meta/iprp/ipco/ispe dims),
    other even doc_ids PNGs (width = n_chars, height = 1 + n_chars
    mod 7), other odd WAVs (n_chars samples at 8 kHz mono). All tag values derive from doc
    fields and the bytes are spec-valid (correct magics, CRCs, chunk
    sizes, syncsafe tag sizes, TIFF offsets), so the encode ->
    ``probe_media`` decode round-trip exercises the real parsers and is
    DuckDB-oracle-checkable from the encoding rule."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            kinds = []
            for did, n, lang, source in zip(
                pdf["doc_id"], pdf["n_chars"], pdf["lang"], pdf["source"]
            ):
                n = int(n)
                if did % 8 == 1:
                    # tagged MP3: metadata derived from doc fields so the
                    # oracle can re-derive every tag value
                    payloads.append(
                        encode_id3v2_mp3(
                            title=f"doc-{did}",
                            artist=lang,
                            album=source,
                            year=str(1970 + did % 50),
                            id3v1_trailer=True,
                        )
                    )
                    kinds.append("audio")
                elif did % 8 == 3:
                    # EXIF-tagged JPEG: camera metadata derived from doc
                    # fields so the oracle re-derives every tag value
                    payloads.append(
                        encode_exif_jpeg(
                            width=n,
                            height=1 + n % 5,
                            make=f"make-{lang}",
                            model=source,
                            orientation=1 + (did // 8) % 8,
                            captured_at=f"2024:01:{1 + did % 28:02d} 12:00:00",
                            # power-of-two denominator: 1/2^k is an exact
                            # binary fraction, so the double is engine-exact
                            exposure=(1, 2 ** (did % 10)),
                            focal=(10 + did % 290, 1),
                            # GPS: deg/min integral, seconds in quarter
                            # units (den 4, a binary fraction) — every
                            # piece re-derivable by the oracle
                            gps=(
                                "N" if (did // 8) % 2 == 0 else "S",
                                ((did % 90, 1), (did % 60, 1), (did % 240, 4)),
                                "E" if (did // 16) % 2 == 0 else "W",
                                (
                                    (did % 180, 1),
                                    ((did // 2) % 60, 1),
                                    ((did * 3) % 240, 4),
                                ),
                            ),
                        )
                    )
                    kinds.append("image")
                elif did % 8 == 5:
                    # MP4: geometry + duration derived from doc fields
                    payloads.append(encode_minimal_mp4(n, 1 + n % 9, n * 40))
                    kinds.append("video")
                elif did % 16 == 7:
                    # fragmented MP4 (DASH layout): duration in mehd,
                    # moof-count fragments
                    payloads.append(
                        encode_minimal_fmp4(n, 1 + n % 9, n * 25, 1 + n % 4)
                    )
                    kinds.append("video")
                elif did % 16 == 0:
                    payloads.append(encode_minimal_avif(n, 1 + n % 11))
                    kinds.append("image")
                elif did % 2 == 0:
                    payloads.append(encode_minimal_png(n, 1 + n % 7))
                    kinds.append("image")
                else:
                    payloads.append(encode_minimal_wav(n))
                    kinds.append("audio")
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads, "kind": kinds}
            )

    return documents.select("doc_id", "n_chars", "lang", "source").mapInPandas(
        kernel,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), True),
                T.StructField("kind", T.StringType(), True),
            ]
        ),
    )


def _stub_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake 'embedding': byte histogram moments. Stands in
    for decode_media()+model inference with identical Spark plumbing."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    return [payload[i % len(payload)] / 255.0 for i in range(dim)]


def extract_features(
    media: DataFrame, dim: int = 8, id_cols: tuple[str, ...] = ("media_id",)
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams columnar batches through Python; the kernel
    is vectorizable per batch (real decoders would release the GIL /
    use native code). Output is a stable, declared schema.

    ``id_cols`` pass through the kernel untouched — compound keys (e.g.
    ``(media_id, frame_idx)`` in a frame pipeline) stay separate typed
    columns instead of being packed into one integer, which would
    silently collide once the packed range overflows.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            # vectorized per batch: one concatenated byte buffer + offset
            # arithmetic, no per-row Python in the loop body
            safe = [b if b is not None else b"" for b in payloads]
            lens = np.fromiter((len(b) for b in safe), dtype=np.int64, count=len(safe))
            # sentinel byte keeps every reduceat start index in-bounds
            # (adds 0 to the final segment's sum); zero-length segments
            # return blob[start] by reduceat's definition -> masked below
            blob = np.frombuffer(b"".join(safe) + b"\x00", dtype=np.uint8).astype(np.int64)
            starts = np.cumsum(lens) - lens
            sums = np.add.reduceat(blob, starts) if len(safe) else np.zeros(0, np.int64)
            checksum = np.where(lens > 0, sums, 0) % 2_147_483_647
            head = np.where(lens > 0, blob[starts], -1)
            out = {c: pdf[c] for c in id_cols}
            out.update(
                {
                    "n_bytes": lens,
                    "head_byte": head.astype(np.int32),
                    "checksum": checksum,
                    "feature": [_stub_features(b, dim) for b in safe],
                }
            )
            yield pd.DataFrame(out)

    key_fields = [media.schema[c] for c in id_cols]
    schema = T.StructType(key_fields + list(FEATURE_FIELDS))
    return media.select(*id_cols, "payload").mapInPandas(kernel, schema)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents fixture: payload
    = utf-8 bytes of the text (a stand-in binary), metadata derived from
    doc fields. Used by tests and the multimodal registry query."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            F.col("n_chars").cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def payload_entropy():
    """Scalar Arrow-vectorized ``pandas_udf`` (SURVEY.md §2.10): Shannon
    entropy of the payload's byte distribution — a content-type signal
    (compressed/encrypted media ~8 bits, text ~4-5). The kind of feature
    that is natural in numpy and awkward as a SQL expression; one Arrow
    batch crosses the Python boundary per ~10k rows, never per row.
    """
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def entropy(payloads: pd.Series) -> pd.Series:
        def one(b: bytes | None) -> float:
            if b is None or len(b) == 0:
                return 0.0
            counts = np.bincount(np.frombuffer(b, dtype=np.uint8), minlength=256)
            p = counts[counts > 0] / len(b)
            return float(-(p * np.log2(p)).sum())

        return payloads.map(one)

    return entropy


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing (op E37): batch in, resized batch out.

    The pixel kernel is the STUB (no codecs here — a real build calls
    PIL/libvips inside the same loop); the Spark side — binary in/out,
    declared schema, Arrow batching, metadata rewrite — is real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # STUB resize: deterministic truncate/pad of the byte stream
            # to width*height (stands in for decode->resample->encode).
            target = width * height
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        None if b is None else bytes(b[:target]).ljust(target, b"\0")
                        for b in pdf["payload"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int, frame_bytes: int = 64) -> DataFrame:
    """Video frame sampling plumbing (op E37): one input row fans out to
    one row per sampled frame — the explode-shaped kernel every video
    pipeline needs (``mapInPandas`` may emit more rows than it reads).

    STUB decoder: frame i is a deterministic byte slice; a real build
    seeks the container at ``i * every_ms`` and decodes. Duration comes
    from ``meta.duration_ms`` (null -> treat as one frame at t=0).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "frame_ts_ms": [],
                "frame": [],
            }
            for mid, payload, duration in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n_frames = (
                    1
                    if duration is None or pd.isna(duration)
                    else max(1, int(duration) // every_ms)
                )
                body = b"" if payload is None else bytes(payload)
                for i in range(n_frames):
                    lo = (i * frame_bytes) % max(len(body), 1) if body else 0
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    out["frame"].append(body[lo : lo + frame_bytes] if body else None)
            yield pd.DataFrame(out)

    return media.select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    ).mapInPandas(kernel, FRAME_SCHEMA)


ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("bytes_total", T.LongType(), True),
        T.StructField("checksum_total", T.LongType(), True),
    ]
)


def rollup_frame_features(
    media: DataFrame, every_ms: int, frame_bytes: int = 64
) -> DataFrame:
    """FUSED sample→featurize→rollup over video-style media: the
    per-media aggregate of ``sample_frames`` → ``extract_features`` →
    ``groupBy(media_id)``, computed in ONE ``mapInPandas`` pass.

    Why fuse (guide §8.4): the chained form ships every sampled
    frame's bytes Python→JVM, back into Python for the feature
    kernel, then shuffles one row PER FRAME just to sum them per
    media. But every decision downstream needs only
    ``(frame_len, frame_checksum)`` — lightweight proxies — and every
    frame of a media row lives in the same batch as the row itself,
    so the rollup completes locally: frame bytes never cross a
    boundary, no fan-out rows exist, and the shuffle disappears
    entirely. Per-media math is vectorized (frames are slices of one
    body: a byte cumsum turns every frame sum into two lookups).

    Exactness contract (pinned in tests against the unfused chain):
    identical values to
    ``extract_features(sample_frames(media)).groupBy(media_id).agg(
    count(*), sum(n_bytes), sum(checksum))`` — per-frame checksum is
    ``sum(bytes) % 2147483647`` (int64-exact), totals are int64 sums.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        mod = 2_147_483_647
        for pdf in batches:
            ids, nfr, btot, ctot = [], [], [], []
            for mid, payload, duration in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n_frames = (
                    1
                    if duration is None or pd.isna(duration)
                    else max(1, int(duration) // every_ms)
                )
                body = b"" if payload is None else bytes(payload)
                nb = len(body)
                ids.append(mid)
                nfr.append(n_frames)
                if nb == 0:
                    # sample_frames emits frame=None; extract_features
                    # maps that to n_bytes=0, checksum=0
                    btot.append(0)
                    ctot.append(0)
                    continue
                arr = np.frombuffer(body, dtype=np.uint8).astype(np.int64)
                cs = np.concatenate(([0], np.cumsum(arr)))
                i = np.arange(n_frames, dtype=np.int64)
                lo = (i * frame_bytes) % nb
                hi = np.minimum(lo + frame_bytes, nb)
                btot.append(int((hi - lo).sum()))
                ctot.append(int(((cs[hi] - cs[lo]) % mod).sum()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_frames": nfr,
                    "bytes_total": btot,
                    "checksum_total": ctot,
                }
            )

    return media.select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    ).mapInPandas(kernel, ROLLUP_SCHEMA)
