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


def test_fake_resize_shapes_and_determinism(spark, sf_dir):
    from auto_data_linkage_spark.operators.multimodal import (
        fake_resize,
        synthesize_media_table,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = synthesize_media_table(spark, docs)
    out = fake_resize(media, 8, 6)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert (r.width, r.height) == (8, 6)
        assert len(bytes(r.content)) == 8 * 6
    again = {r.media_id: bytes(r.content) for r in fake_resize(media, 8, 6).collect()}
    assert {r.media_id: bytes(r.content) for r in rows} == again


def test_fake_resize_nearest_neighbor_math(spark):
    import numpy as np

    from auto_data_linkage_spark.operators.multimodal import fake_resize

    # a 4x2 "image" with known bytes; downsample to 2x1
    blob = bytes(range(8))  # grid [[0,1,2,3],[4,5,6,7]] at w=4,h=2
    df = spark.createDataFrame(
        [(1, bytearray(blob), ("image/fake", 4, 2, None))],
        "media_id long, content binary, meta struct<mime:string,width:int,height:int,duration_ms:int>",
    )
    out = fake_resize(df, 2, 1).collect()[0]
    got = np.frombuffer(bytes(out.content), dtype=np.uint8)
    # nearest-neighbor: row index (0*2)//1? -> yi=[0], xi=[0,2] -> [0,2]
    assert got.tolist() == [0, 2]


def test_resize_image_real_slot_gated(spark):
    import pytest as _pytest

    from auto_data_linkage_spark.operators import multimodal as M

    if M._HAS_PIL:
        _pytest.skip("pillow present; real slot exercised elsewhere")
    df = spark.createDataFrame(
        [(1, bytearray(b"xx"), ("image/fake", 2, 1, None))],
        "media_id long, content binary, meta struct<mime:string,width:int,height:int,duration_ms:int>",
    )
    with _pytest.raises(NotImplementedError):
        M.resize_image(df, 2, 2)


def test_embed_media_fake_and_pluggable(spark):
    import numpy as np

    from auto_data_linkage_spark.operators import multimodal as M

    rows = [(1, "hello world"), (2, "hello world"), (3, "zzz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    media = M.synthesize_media_table(spark, df)

    vecs = {r.media_id: r.embedding for r in M.embed_media(media).collect()}
    assert len(vecs) == 3 and len(vecs[1]) == 64
    assert vecs[1] == vecs[2]  # identical blobs → identical vectors
    assert vecs[1] != vecs[3]
    assert sum(vecs[1]) == len("hello world")  # histogram mass = n_bytes

    # real-model slot: any list[bytes] -> [n, dim] callable plugs in
    def constant_embedder(blobs):
        return np.ones((len(blobs), 4))

    out = M.embed_media(media, constant_embedder, dim=4).collect()
    assert all(r.embedding == [1.0, 1.0, 1.0, 1.0] for r in out)


def test_media_near_dup_finds_identical_blobs_only(spark):
    from auto_data_linkage_spark.operators import multimodal as M

    rows = [(1, "same payload"), (2, "same payload"), (3, "other thing")]
    media = M.synthesize_media_table(
        spark, spark.createDataFrame(rows, "doc_id long, text string")
    )
    got = [
        (r.media_id_l, r.media_id_r, r.cosine)
        for r in M.media_near_dup(media, threshold=0.95).collect()
    ]
    assert got == [(1, 2, 1.0)]


def test_embed_media_feeds_vector_ann(spark):
    """The composition the hook exists for: media blobs → embeddings →
    IVF ANN over the media corpus (same operators the text embedding
    family uses, no adaptation layer)."""
    from pyspark.sql import functions as F

    from auto_data_linkage_spark.operators import multimodal as M
    from auto_data_linkage_spark.operators import similarity as S

    rows = [(i, f"document payload number {i % 7} repeated") for i in range(40)]
    media = M.synthesize_media_table(
        spark, spark.createDataFrame(rows, "doc_id long, text string")
    )
    vecs = M.embed_media(media).withColumnRenamed("media_id", "vec_id")
    cents = S.kmeans_centroids(vecs, k=4, max_iter=2, seed=3)
    labeled = S.assign_cells(vecs, cents, cell_col="label")
    out = S.ivf_topk(
        labeled, labeled.where(F.col("vec_id") < 5),
        k=3, nprobe=2, dim=64,
    )
    got = out.groupBy("query_id").count().collect()
    assert len(got) == 5
    # i % 7 duplicates embed identically, so every query's top hit is
    # an exact copy at cosine 1
    top = {r.query_id: r.cosine for r in out.where(F.col("rank") == 1).collect()}
    assert all(abs(c - 1.0) < 1e-9 for c in top.values())


def test_media_near_dup_cell_banding_recalls_different_lengths(spark):
    """The default (IVF-cell) banding's reason to exist: two perturbed
    blobs with DIFFERENT byte lengths but close embeddings are found —
    the byte-length fast path structurally cannot pair them."""
    from auto_data_linkage_spark.operators import multimodal as M

    base = "the same repeated visual payload content " * 5
    rows = [
        (1, base),
        (2, base + "x"),  # one extra byte: near-identical histogram
        (3, "completely different bytes entirely unlike the others ### "
            "1234567890 @@@@ wholly distinct distribution zzzzzz qqqqqq"),
    ]
    media = M.synthesize_media_table(
        spark, spark.createDataFrame(rows, "doc_id long, text string")
    )
    got_cell = {
        (r.media_id_l, r.media_id_r)
        for r in M.media_near_dup(media, threshold=0.95, n_cells=2).collect()
    }
    assert (1, 2) in got_cell
    assert not any(3 in p for p in got_cell)
    got_len = {
        (r.media_id_l, r.media_id_r)
        for r in M.media_near_dup(media, threshold=0.95, band="length").collect()
    }
    assert (1, 2) not in got_len  # lengths differ -> fast path misses it
