"""Multimodal column handling (north star; SURVEY.md §2.11, op E37).

Images/audio/video are opaque ``binary`` payloads + typed metadata
structs in one table; heavy per-item work (decode, resize, feature
extraction, frame sampling) runs as Arrow-batched ``mapInPandas`` so
each Python worker sees a columnar batch, not a row.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked STUB (deterministic fake features). Everything around
it — schema, binary round-trip, batch shapes, partitioning — is real
and tested; swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

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

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("head_byte", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_media(payload: bytes, meta: dict) -> object:
    """REAL decode hook — requires codec libraries absent from this
    container. Deliberately unimplemented (see module docstring)."""
    raise NotImplementedError(
        "media decoding requires image/audio codecs not present in this "
        "environment; extract_features uses the deterministic stub kernel"
    )


def _stub_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake 'embedding': byte histogram moments. Stands in
    for decode_media()+model inference with identical Spark plumbing."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    return [payload[i % len(payload)] / 255.0 for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams columnar batches through Python; the kernel
    is vectorizable per batch (real decoders would release the GIL /
    use native code). Output is a stable, declared schema.
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
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": lens,
                    "head_byte": head.astype(np.int32),
                    "checksum": checksum,
                    "feature": [_stub_features(b, dim) for b in safe],
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, FEATURE_SCHEMA)


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
