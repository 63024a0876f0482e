"""Multimodal plumbing: binary schema, Arrow-batched features, stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from etl_pack_spark.operators import multimodal
from etl_pack_spark.sources.reader import read_table


def _media(spark, sf_dir):
    return multimodal.binarize_documents(read_table(spark, sf_dir, "documents"))


def test_binarize_schema(spark, sf_dir):
    media = _media(spark, sf_dir)
    assert [f.name for f in media.schema.fields] == ["media_id", "content", "mime", "n_bytes"]
    assert media.schema["content"].dataType.simpleString() == "binary"
    row = media.orderBy("media_id").first()
    assert row["n_bytes"] == len(row["content"])


def test_metadata_without_decode(spark, sf_dir):
    meta = multimodal.media_metadata(_media(spark, sf_dir))
    row = meta.orderBy("media_id").first()
    assert len(row["magic_hex"]) == 16
    assert row["mime"] == "text/plain"


def test_byte_histogram_sums_to_length(spark, sf_dir):
    hist = multimodal.byte_histogram(_media(spark, sf_dir).limit(50))
    for r in hist.collect():
        assert sum(r["hist"]) == r["n_bytes"]
        assert len(r["hist"]) == 16


def test_decode_unrecognized_payload_null_dims(spark, sf_dir):
    # text payloads are not images: real mode yields NULL dims, not a crash
    out = multimodal.decode_image(_media(spark, sf_dir).limit(5)).collect()
    assert len(out) == 5
    assert all(r["width"] is None and r["height"] is None for r in out)


def _img_df(spark, payloads):
    rows = [(i, bytearray(p)) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_decode_real_headers(spark):
    """Real header parsing, no image library: PNG IHDR, JPEG SOF scan,
    GIF, BMP, and binary PPM/PGM all carry dims in plain bytes."""
    png = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
           + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
           + bytes([8, 2, 0, 0, 0]) + b"\x00" * 4)
    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
            + (480).to_bytes(2, "big") + (640).to_bytes(2, "big") + b"\x03"
            + b"\x00" * 9)
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 4
    bmp = (b"BM" + b"\x00" * 16
           + (800).to_bytes(4, "little") + (600).to_bytes(4, "little")
           + b"\x01\x00" + (24).to_bytes(2, "little") + b"\x00" * 8)
    ppm = b"P6\n# a comment\n32 16\n255\n" + b"\x00" * (32 * 16 * 3)
    pgm = b"P5\n8 4\n255\n" + b"\x00" * 32

    out = multimodal.decode_image(_img_df(spark, [png, jpeg, gif, bmp, ppm, pgm]))
    got = {r["media_id"]: (r["width"], r["height"], r["channels"]) for r in out.collect()}
    assert got[0] == (640, 480, 3)   # png
    assert got[1] == (640, 480, 3)   # jpeg
    assert got[2] == (320, 200, 3)   # gif
    assert got[3] == (800, 600, 3)   # bmp
    assert got[4] == (32, 16, 3)     # ppm
    assert got[5] == (8, 4, 1)       # pgm


def test_decode_fake_deterministic(spark, sf_dir):
    out = multimodal.decode_image(_media(spark, sf_dir).limit(20), fake=True)
    rows = {r["media_id"]: (r["width"], r["height"], r["channels"]) for r in out.collect()}
    again = {r["media_id"]: (r["width"], r["height"], r["channels"])
             for r in multimodal.decode_image(_media(spark, sf_dir).limit(20), fake=True).collect()}
    assert rows == again
    assert all(c == 3 for _, _, c in rows.values())


def test_frame_sampling_offsets(spark, sf_dir):
    frames = multimodal.sample_frames(_media(spark, sf_dir).limit(5), every_n_bytes=32, fake=True)
    per_doc = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("offset").alias("mx")
    ).collect()
    media_len = {r["media_id"]: r["n_bytes"] for r in _media(spark, sf_dir).limit(5).collect()}
    for r in per_doc:
        expect = (media_len[r["media_id"]] + 31) // 32
        assert r["n"] == expect


def test_resize_stub_raises_without_fake(spark, sf_dir):
    with pytest.raises(PythonException, match="NotImplementedError"):
        multimodal.resize_image(_media(spark, sf_dir).limit(1)).collect()


def test_resize_fake_exact_bytes(spark):
    payload = bytes(range(200))
    df = spark.createDataFrame([(1, payload)], "media_id long, content binary")
    out = multimodal.resize_image(df, out_w=4, out_h=4, fake=True).collect()[0]
    n = len(payload)
    w, h = 16 + n % 64, 16 + (n // 64) % 64
    assert (out["src_w"], out["src_h"]) == (w, h)
    expect = bytes(
        payload[((i * h // 4) * w + (j * w // 4)) % n] for i in range(4) for j in range(4)
    )
    assert bytes(out["thumb"]) == expect
    assert len(out["thumb"]) == 16


def test_features_empty_payload_row_matches_oracle_branch(spark):
    """Empty/NULL texts: the featurizer keeps the row (n_bytes=0, NULL
    features) and the suite oracle's UNION branch emits the same row —
    the driver gate stays green if the fixture ever gains empty docs."""
    import duckdb
    import pandas as pd

    from pyspark.sql import functions as F

    from etl_pack_spark import suite

    rows = [(1, "some text"), (2, ""), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    feats = multimodal.media_features(multimodal.binarize_documents(docs), fake=True)
    got = (
        feats.select(
            "media_id", "n_bytes", "src_w", "src_h",
            F.when(F.col("hist").isNotNull(),
                   F.concat_ws(",", F.col("hist").cast("array<string>"))).alias("hist_csv"),
            F.lower(F.hex("thumb")).alias("thumb_hex"),
        )
        .toPandas().sort_values("media_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = (
        con.execute(suite.ORACLES["mm_features"])
        .fetchdf().sort_values("media_id").reset_index(drop=True)
    )
    assert len(got) == len(want) == 3
    for c in got.columns:
        a, b = got[c], want[c]
        assert ((a == b) | (a.isna() & b.isna())).all(), c
