import hashlib

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.multimodal import (
    decode_image,
    dedup_media_exact,
    fake_decode_stats,
    frame_sample_plan,
    synthesize_media_table,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    return synthesize_media_table(spark, docs)


def test_media_schema(media):
    d = dict(media.dtypes)
    assert d["content"] == "binary"
    assert d["media_id"] == "bigint"
    assert "struct" in d["meta"]


def test_fake_decode_stats_deterministic(spark, media):
    a = {r["media_id"]: r for r in fake_decode_stats(media).collect()}
    b = {r["media_id"]: r for r in fake_decode_stats(media).collect()}
    assert len(a) == 50
    mid = next(iter(a))
    assert a[mid]["sha256"] == b[mid]["sha256"]
    assert a[mid]["byte_entropy"] == b[mid]["byte_entropy"]
    assert a[mid]["n_bytes"] > 0
    # cross-check one sha against python hashlib
    blob = media.where(F.col("media_id") == mid).collect()[0]["content"]
    assert a[mid]["sha256"] == hashlib.sha256(bytes(blob)).hexdigest()


def test_decode_image_is_clearly_stubbed(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("pillow present; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(media)


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"x"), ("video/mp4", None, None, 3500))],
        "media_id long, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>",
    )
    frames = frame_sample_plan(df, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_dedup_media_exact(spark):
    df = spark.createDataFrame(
        [
            (1, bytearray(b"same")),
            (2, bytearray(b"same")),
            (3, bytearray(b"other")),
        ],
        "media_id long, content binary",
    )
    kept = sorted(r["media_id"] for r in dedup_media_exact(df).collect())
    assert kept == [1, 3]
