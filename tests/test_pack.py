"""Sequence packing + stratified sampling operators."""

from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.pack import (
    pack_sequences,
    pack_stats,
    stratified_sample,
)


def _docs(spark, n=200, seed=9):
    import random

    rng = random.Random(seed)
    return spark.createDataFrame(
        [(i, rng.randrange(10, 400)) for i in range(n)],
        "doc_id long, n_tokens long",
    )


def test_pack_assigns_every_doc_once(spark):
    df = _docs(spark)
    packed = pack_sequences(df, capacity=512, num_buckets=4)
    assert packed.count() == 200
    assert packed.select("doc_id").distinct().count() == 200
    assert {c for c in ("bucket", "bin")} <= set(packed.columns)


def test_pack_bins_overflow_by_at_most_one_doc(spark):
    """A bin's token total may exceed capacity only by the document that
    straddles the cut — never by two."""
    df = _docs(spark)
    cap = 512
    stats = pack_stats(df, capacity=cap, num_buckets=4).collect()
    max_doc = 400
    for r in stats:
        assert r["tokens"] < cap + max_doc, r
    # and packing is efficient: full bins dominate (every non-last bin
    # of a bucket holds > capacity - max_doc tokens by construction)
    by_bucket = {}
    for r in stats:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, rows in by_bucket.items():
        rows.sort(key=lambda r: r["bin"])
        for r in rows[:-1]:
            assert r["tokens"] > cap - max_doc, (bucket, r)


def test_pack_deterministic(spark):
    df = _docs(spark)
    a = {(r["doc_id"], r["bucket"], r["bin"])
         for r in pack_sequences(df, capacity=256, num_buckets=8).collect()}
    b = {(r["doc_id"], r["bucket"], r["bin"])
         for r in pack_sequences(df, capacity=256, num_buckets=8).collect()}
    assert a == b


def test_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(1, 5000), (2, 100), (3, 100)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(df, capacity=512, num_buckets=1).collect()
    bins = {r["doc_id"]: r["bin"] for r in packed}
    assert bins[1] == 0  # biggest first
    assert bins[2] != bins[1] and bins[3] != bins[1]


def test_stratified_sample_deterministic_and_proportional(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)],
        "doc_id long, lang string",
    )
    out = stratified_sample(df, "lang", {"en": 0.5, "de": 0.1})
    rows = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in rows}
    assert abs(counts["en"] / 1000 - 0.5) < 0.08
    assert abs(counts["de"] / 1000 - 0.1) < 0.05
    # deterministic membership: the same ids every run
    again = {r["doc_id"] for r in stratified_sample(
        df, "lang", {"en": 0.5, "de": 0.1}).select("doc_id").collect()}
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == again


def test_stratified_sample_default_fraction(spark):
    df = spark.createDataFrame(
        [(i, "xx") for i in range(500)], "doc_id long, lang string"
    )
    assert stratified_sample(df, "lang", {"en": 0.9}).count() == 0  # default 0
    some = stratified_sample(df, "lang", {}, default_fraction=0.3).count()
    assert 0.2 < some / 500 < 0.4


def test_split_chunks_coverage_and_overlap(spark):
    from auto_data_linkage_spark.operators.pack import split_chunks

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        split_chunks(df, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r.chunk_idx,
    )
    # stride 3 over 10 tokens -> starts 0,3,6,9
    assert [r.chunk_idx for r in rows] == [0, 1, 2, 3]
    assert rows[0].chunk_text == "w0 w1 w2 w3"
    assert rows[1].chunk_text == "w3 w4 w5 w6"  # 1-token overlap
    assert rows[3].chunk_text == "w9"           # short tail
    assert [r.n_tokens for r in rows] == [4, 4, 4, 1]
    # every token covered
    covered = set()
    for r in rows:
        covered.update(r.chunk_text.split())
    assert covered == {f"w{i}" for i in range(10)}


def test_split_chunks_empty_doc_and_validation(spark):
    import pytest as _pytest

    from auto_data_linkage_spark.operators.pack import split_chunks

    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    assert split_chunks(df, chunk_tokens=4, overlap=1).count() == 0
    with _pytest.raises(ValueError):
        split_chunks(df, chunk_tokens=4, overlap=4)


def test_split_chunks_adds_no_shuffle(spark):
    from auto_data_linkage_spark.operators.pack import split_chunks
    from auto_data_linkage_spark.plans.explain import count_exchanges

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert count_exchanges(split_chunks(df, chunk_tokens=2, overlap=0)) == 0


def test_sample_k_per_group_exact_k_and_deterministic(spark):
    from auto_data_linkage_spark.operators.pack import sample_k_per_group

    rows = [(i, "g%d" % (i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    a = sample_k_per_group(df, ["g"], 5)
    assert a.groupBy("g").count().collect()[0]["count"] == 5
    assert a.count() == 15
    b = sample_k_per_group(df, ["g"], 5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # small groups: keep everything
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, g string")
    assert sample_k_per_group(tiny, ["g"], 5).count() == 2


def test_sample_k_per_group_pushes_partial_limit(spark):
    """The rank<=k filter must become a WindowGroupLimit below the
    exchange — the hot-group bound (at most k rows per map task ship)."""
    from auto_data_linkage_spark.operators.pack import sample_k_per_group
    from auto_data_linkage_spark.plans.explain import physical_plan

    df = spark.createDataFrame([(i, "g") for i in range(10)], "doc_id long, g string")
    plan = physical_plan(sample_k_per_group(df, ["g"], 3))
    assert plan.count("WindowGroupLimit") >= 2  # partial (map-side) + final


def test_weighted_sample_k_favors_heavy_rows(spark):
    from auto_data_linkage_spark.operators.pack import weighted_sample_k

    # 10 heavy rows (w=1000) among 200 light rows (w=1): the heavy rows
    # should essentially always all be selected into a k=20 sample
    rows = [(i, 1000 if i < 10 else 1) for i in range(210)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r.doc_id for r in weighted_sample_k(df, "w", 20).collect()}
    assert len(got) == 20
    heavy_in = len([i for i in range(10) if i in got])
    assert heavy_in >= 9  # P(all 10) ~ prod(1000/(1000+~200)) ≈ high


def test_weighted_sample_k_deterministic_and_zero_weight_loses(spark):
    from auto_data_linkage_spark.operators.pack import weighted_sample_k

    rows = [(i, 0 if i < 5 else 1) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = {r.doc_id for r in weighted_sample_k(df, "w", 25).collect()}
    b = {r.doc_id for r in weighted_sample_k(df, "w", 25).collect()}
    assert a == b
    assert a == set(range(5, 30))  # the 25 positive-weight rows win


def test_assign_shards_deterministic_and_stable(spark):
    from auto_data_linkage_spark.operators.pack import assign_shards

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = {r.doc_id: (r.shard, r.shard_order) for r in assign_shards(df, 8).collect()}
    b = {r.doc_id: (r.shard, r.shard_order) for r in assign_shards(df, 8).collect()}
    assert a == b
    assert set(s for s, _ in a.values()) == set(range(8))  # all shards hit
    # incremental stability: a subset's assignments match the full run's
    sub = assign_shards(df.where(F.col("doc_id") < 100), 8).collect()
    assert all(a[r.doc_id] == (r.shard, r.shard_order) for r in sub)
    # salt reshuffles
    salted = {r.doc_id: r.shard for r in assign_shards(df, 8, salt=1).collect()}
    assert any(salted[i] != a[i][0] for i in range(500))


def test_assign_shards_balance(spark):
    from auto_data_linkage_spark.operators.pack import assign_shards

    df = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    sizes = (
        assign_shards(df, 8).groupBy("shard").count().orderBy("shard").collect()
    )
    for r in sizes:  # md5 is uniform: each shard ~500 ± a loose 20%
        assert 380 <= r["count"] <= 620


def test_write_shards_layout_and_order(spark, tmp_path):
    from auto_data_linkage_spark.operators.pack import assign_shards, write_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(300)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    write_shards(df, out, 4)
    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    back = spark.read.parquet(out)
    assert back.count() == 300
    # within each shard directory, file order == shard_order ascending
    for i in range(4):
        part = spark.read.parquet(f"{out}/shard={i}")
        got = [r.doc_id for r in part.select("doc_id", "shard_order").collect()]
        want = [
            r.doc_id
            for r in part.select("doc_id", "shard_order")
            .orderBy("shard_order")
            .collect()
        ]
        assert got == want


def test_epoch_repeat_rates(spark):
    from auto_data_linkage_spark.operators.pack import epoch_repeat

    df = spark.createDataFrame(
        [(i, "wiki" if i < 1000 else "web") for i in range(3000)],
        "doc_id long, src string",
    )
    out = epoch_repeat(df, "src", {"wiki": 2.5, "web": 0.5}, epoch=0)
    counts = {r.src: r["count"] for r in out.groupBy("src").count().collect()}
    assert abs(counts["wiki"] - 2500) <= 150  # 1000 * 2.5, hash-slice jitter
    assert abs(counts["web"] - 1000) <= 150  # 2000 * 0.5
    # every wiki row appears at least twice (integer part), copy is 0-based
    per = out.where(F.col("src") == "wiki").groupBy("doc_id").count().collect()
    assert all(r["count"] in (2, 3) for r in per)
    assert out.agg(F.min("copy"), F.max("copy")).collect()[0] == (0, 2)


def test_epoch_repeat_deterministic_but_epoch_shifts(spark):
    from auto_data_linkage_spark.operators.pack import epoch_repeat

    df = spark.createDataFrame(
        [(i, "s") for i in range(400)], "doc_id long, src string"
    )
    a = sorted((r.doc_id, r.copy) for r in epoch_repeat(df, "src", {"s": 1.5}).collect())
    b = sorted((r.doc_id, r.copy) for r in epoch_repeat(df, "src", {"s": 1.5}).collect())
    assert a == b
    c = sorted(
        (r.doc_id, r.copy)
        for r in epoch_repeat(df, "src", {"s": 1.5}, epoch=1).collect()
    )
    assert a != c  # different epochs repeat different residual rows
    # zero-rate stratum vanishes entirely
    z = epoch_repeat(df, "src", {"s": 0.0})
    assert z.count() == 0


def test_assign_shards_composite_key_spreads_repeats(spark):
    """epoch_repeat copies carry only (doc_id, copy) as identity; a
    composite shard key must scatter the copies of one document across
    shards instead of stacking them adjacent in a single shard."""
    from auto_data_linkage_spark.operators.pack import assign_shards, epoch_repeat

    df = spark.createDataFrame(
        [(i, "s") for i in range(300)], "doc_id long, src string"
    )
    rep = epoch_repeat(df, "src", {"s": 3.0})

    single = assign_shards(rep, 8, id_col="doc_id")
    rows = single.select("doc_id", "copy", "shard", "shard_order").collect()
    by_doc: dict[int, set] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add((r.shard, r.shard_order))
    # single-column key: all 3 copies collide on (shard, shard_order)
    assert all(len(v) == 1 for v in by_doc.values())

    comp = assign_shards(rep, 8, id_col=["doc_id", "copy"])
    rows = comp.select("doc_id", "copy", "shard", "shard_order").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add((r.shard, r.shard_order))
    # composite key: every copy gets its own order, most docs span shards
    assert all(len(v) == 3 for v in by_doc.values())
    multi = sum(1 for v in by_doc.values() if len({s for s, _ in v}) > 1)
    assert multi > 200  # P(all 3 in one of 8 shards) ≈ 1.6%

    # single-column path unchanged: composite([c]) == single(c)
    a = sorted(
        (r.doc_id, r.shard, r.shard_order)
        for r in assign_shards(df, 8, id_col="doc_id").collect()
    )
    b = sorted(
        (r.doc_id, r.shard, r.shard_order)
        for r in assign_shards(df, 8, id_col=["doc_id"]).collect()
    )
    assert a == b


def test_leakage_safe_split_group_integrity_and_proportions(spark):
    from auto_data_linkage_spark.operators.pack import leakage_safe_split

    rows = [(i, f"dom{i % 200}.com") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = leakage_safe_split(
        df, weights={"train": 0.8, "val": 0.1, "test": 0.1},
        group_col="domain",
    )
    # leakage guard: every domain lives in exactly one split
    multi = (
        out.groupBy("domain")
        .agg(F.count_distinct("split").alias("k"))
        .where("k > 1")
        .count()
    )
    assert multi == 0
    # proportions near the weights (group granularity: 200 domains)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert 0.7 < counts["train"] / 4000 < 0.9
    assert 0 < counts.get("val", 0) and 0 < counts.get("test", 0)
    # deterministic + incremental-arrival stable: a new row of a known
    # domain gets that domain's split
    one = leakage_safe_split(
        spark.createDataFrame([(99999, "dom7.com")], "doc_id long, domain string"),
        weights={"train": 0.8, "val": 0.1, "test": 0.1},
        group_col="domain",
    ).collect()[0].split
    known = out.where(F.col("domain") == "dom7.com").select("split").distinct().collect()
    assert [r.split for r in known] == [one]
    # salt re-draws
    out2 = leakage_safe_split(
        df, weights={"train": 0.8, "val": 0.1, "test": 0.1},
        group_col="domain", salt=3,
    )
    diff = out.alias("a").join(out2.alias("b"), "doc_id").where(
        F.col("a.split") != F.col("b.split")
    ).count()
    assert diff > 0


def test_leakage_safe_split_zero_exchanges(spark, sf_dir):
    from auto_data_linkage_spark.operators.pack import leakage_safe_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = leakage_safe_split(docs, group_col="source")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_epoch_mixture_hits_budget_shares(spark):
    from auto_data_linkage_spark.operators.pack import epoch_mixture

    df = spark.createDataFrame(
        [
            (i, "wiki" if i < 500 else "web", 100 if i < 500 else 200)
            for i in range(3000)
        ],
        "doc_id long, src string, n_tokens long",
    )
    # wiki: 500 docs x 100 tok = 50k; web: 2500 x 200 = 500k
    out = epoch_mixture(
        df, "src", {"wiki": 0.4, "web": 0.6}, token_budget=1_000_000
    )
    tok = {
        r.src: r.tok
        for r in out.groupBy("src").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    # wiki repeat factor 400k/50k = 8.0 exactly; web 600k/500k = 1.2
    assert tok["wiki"] == 400_000
    assert abs(tok["web"] - 600_000) / 600_000 < 0.05  # hash-slice jitter
    # epoch index is contiguous 1..n per doc
    per = (
        out.where(F.col("src") == "wiki")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.min("epoch").alias("lo"),
             F.max("epoch").alias("hi"))
        .collect()
    )
    assert all(r.n == 8 and r.lo == 1 and r.hi == 8 for r in per)


def test_epoch_mixture_cap_and_missing_domain(spark):
    from auto_data_linkage_spark.operators.pack import epoch_mixture

    df = spark.createDataFrame(
        [(i, "tiny" if i < 10 else "big", 10) for i in range(1000)],
        "doc_id long, src string, n_tokens long",
    )
    # tiny: 100 tokens; uncapped factor would be 500_00 / 100 huge
    out = epoch_mixture(
        df, "src", {"tiny": 0.5}, token_budget=100_000, max_repeat=4.0
    )
    # cap: every tiny doc exactly 4 copies; 'big' absent from weights -> dropped
    assert out.where(F.col("src") == "big").count() == 0
    per = out.groupBy("doc_id").count().collect()
    assert len(per) == 10 and all(r["count"] == 4 for r in per)


def test_epoch_mixture_deterministic(spark):
    from auto_data_linkage_spark.operators.pack import epoch_mixture

    df = spark.createDataFrame(
        [(i, "s", 7) for i in range(400)],
        "doc_id long, src string, n_tokens long",
    )
    kw = dict(token_budget=4000, max_repeat=8.0)
    a = sorted(
        (r.doc_id, r.epoch)
        for r in epoch_mixture(df, "src", {"s": 1.0}, **kw).collect()
    )
    b = sorted(
        (r.doc_id, r.epoch)
        for r in epoch_mixture(df, "src", {"s": 1.0}, **kw).collect()
    )
    assert a == b and len(a) > 400  # factor 4000/2800 ≈ 1.43 -> repeats exist


def test_epoch_mixture_copies_spread_across_shards(spark, tmp_path):
    """SCALE.md composition claim: sharding the mixed corpus on
    (doc_id, epoch) spreads a document's repeats across shards instead
    of packing all copies into one."""
    from auto_data_linkage_spark.operators.pack import (
        epoch_mixture,
        write_shards,
    )

    df = spark.createDataFrame(
        [(i, "s", 10) for i in range(200)],
        "doc_id long, src string, n_tokens long",
    )
    mixed = epoch_mixture(df, "src", {"s": 1.0}, token_budget=8000)
    # factor 4.0: every doc has 4 epochs
    path = str(tmp_path / "shards")
    write_shards(mixed, path, 8, id_col=["doc_id", "epoch"])
    back = spark.read.parquet(path)
    spread = (
        back.groupBy("doc_id")
        .agg(F.countDistinct("shard").alias("n_shards"))
        .agg(F.avg("n_shards").alias("avg"))
        .collect()[0]["avg"]
    )
    # 4 copies over 8 shards: hashing on (doc_id, epoch) must place a
    # doc's copies in >1 shard on average (id-only hashing gives 1.0)
    assert spread > 2.0


def test_fim_split_reconstructs_and_respects_rate(spark, sf_dir):
    from auto_data_linkage_spark.operators.pack import fim_split
    from auto_data_linkage_spark.operators.text import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = fim_split(docs, rate=0.5, min_tokens=4).collect()
    norm = {
        r.doc_id: r.norm
        for r in docs.select(
            "doc_id", F.concat_ws(" ", tokens("text")).alias("norm")
        ).collect()
    }
    n_fim = 0
    for r in out:
        joined = " ".join(p for p in (r.prefix, r.middle, r.suffix) if p)
        assert joined == norm[r.doc_id], r.doc_id
        if r.fim:
            n_fim += 1
        else:
            assert r.middle == "" and r.suffix == ""
    # deterministic hash slice: roughly half the corpus transforms
    assert 0.3 < n_fim / len(out) < 0.7


def test_fim_split_deterministic_and_seedable(spark):
    from auto_data_linkage_spark.operators.pack import fim_split

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(50)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, fim_split(docs, rate=1.0).collect()))
    b = sorted(map(tuple, fim_split(docs, rate=1.0).collect()))
    assert a == b
    c = sorted(map(tuple, fim_split(docs, rate=1.0, seed=7).collect()))
    assert a != c  # different seed -> different split points


def test_fim_split_short_docs_never_split(spark):
    from auto_data_linkage_spark.operators.pack import fim_split

    docs = spark.createDataFrame(
        [(1, "one two three"), (2, ""), (3, "a b c d e")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in fim_split(docs, rate=1.0, min_tokens=4).collect()}
    assert not rows[1].fim and rows[1].prefix == "one two three"
    assert not rows[2].fim and rows[2].prefix == ""
    assert rows[3].fim


def test_fim_split_zero_shuffle(spark, sf_dir):
    from auto_data_linkage_spark.operators.pack import fim_split
    from auto_data_linkage_spark.plans.explain import count_exchanges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert count_exchanges(fim_split(docs)) == 0


class TestSentenceChunks:
    def test_split_sentences(self, spark):
        from auto_data_linkage_spark.operators.pack import split_sentences

        df = spark.createDataFrame(
            [(1, "First one. Second here! Third? yes lowercase stays.")],
            "doc_id long, text string",
        )
        got = [
            (r.sent_idx, r.sentence)
            for r in split_sentences(df).orderBy("sent_idx").collect()
        ]
        # "? yes" does NOT split (lowercase follow — the abbreviation
        # guard); "Third? yes lowercase stays." is one sentence
        assert got == [
            (0, "First one."),
            (1, "Second here!"),
            (2, "Third? yes lowercase stays."),
        ]

    def test_chunks_never_cut_sentences_and_respect_budget(self, spark):
        from auto_data_linkage_spark.operators.pack import (
            sentence_chunks,
            split_sentences,
        )

        text = (
            "Alpha beta gamma delta. Epsilon zeta eta theta. "
            "Iota kappa lambda mu. Nu xi omicron pi. Rho sigma tau."
        )
        df = spark.createDataFrame([(7, text)], "doc_id long, text string")
        chunks = sentence_chunks(df, max_tokens=8).orderBy("chunk_idx")
        rows = chunks.collect()
        all_sents = {
            r.sentence for r in split_sentences(df).collect()
        }
        joined = " ".join(r.chunk_text for r in rows)
        # reassembled chunks reproduce the document exactly
        assert joined == text
        # every chunk boundary is a sentence boundary
        for r in rows:
            parts = r.chunk_text.split(". ")
            assert r.chunk_text.rstrip(".!?") != ""
            for s in all_sents:
                # a sentence is either fully inside a chunk or absent
                assert (s in r.chunk_text) or all(
                    w not in r.chunk_text.split() for w in [s]
                )
        # greedy budget: tokens before a chunk's first sentence define
        # assignment, so each chunk holds >= 1 sentence and starts a new
        # chunk once the budget is crossed
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        assert all(r.n_tokens >= 1 for r in rows)

    def test_empty_and_whitespace_docs_produce_no_chunks(self, spark):
        from auto_data_linkage_spark.operators.pack import sentence_chunks

        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "Real content here.")],
            "doc_id long, text string",
        )
        got = sentence_chunks(df, max_tokens=8).collect()
        assert {r.doc_id for r in got} == {3}

    def test_matches_independent_python_reference(self, spark):
        import re

        from auto_data_linkage_spark.operators.pack import sentence_chunks

        texts = [
            "One two three. Four five six seven! Eight? Nine ten.",
            "Single sentence no terminal",
            "A. B. C. D. E. F. G. H.",
        ]
        max_tokens = 4

        def ref_chunks(doc_id, text):
            marked = re.sub(r"([.!?])\s+([A-Z])", "\\1\x1e\\2", text)
            sents = [s for s in marked.split("\x1e") if s.strip()]
            out, cum = {}, 0
            for s in sents:
                nt = len([t for t in s.lower().split() if t])
                idx = cum // max_tokens
                out.setdefault(idx, []).append((s, nt))
                cum += nt
            return {
                (doc_id, i, " ".join(s for s, _ in v), sum(n for _, n in v))
                for i, v in out.items()
            }

        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            (r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
            for r in sentence_chunks(df, max_tokens=max_tokens).collect()
        }
        want = set()
        for i, t in enumerate(texts):
            want |= ref_chunks(i, t)
        assert got == want


class TestTokenBudgetCap:
    def _wt(self, spark):
        rows = []
        for i in range(20):
            rows.append((i, "big", 100))       # 2000 tokens total
        for i in range(100, 105):
            rows.append((i, "small", 10))      # 50 tokens total
        for i in range(200, 203):
            rows.append((i, "dropped", 10))
        return spark.createDataFrame(
            rows, "doc_id long, lang string, n_tokens long"
        )

    def test_hard_cap_includes_first_crossing_doc(self, spark):
        from auto_data_linkage_spark.operators.pack import token_budget_cap

        wt = self._wt(spark)
        out = token_budget_cap(
            wt, "lang", {"big": 450, "small": 1000}
        ).collect()
        by_lang = {}
        for r in out:
            by_lang.setdefault(r.lang, []).append(r)
        # big: docs of 100 tokens; cum 100,200,...; kept while
        # cum - 100 < 450 => cum <= 500 => exactly 5 docs (crossing
        # doc included, budget reached)
        assert len(by_lang["big"]) == 5
        assert max(r.cum_tokens for r in by_lang["big"]) == 500
        # small is under budget: everything kept
        assert len(by_lang["small"]) == 5
        # absent from the dict: dropped
        assert "dropped" not in by_lang

    def test_int_budget_and_determinism(self, spark):
        from auto_data_linkage_spark.operators.pack import token_budget_cap

        wt = self._wt(spark)
        a = sorted(map(tuple, token_budget_cap(wt, "lang", 250).collect()))
        b = sorted(map(tuple, token_budget_cap(wt, "lang", 250).collect()))
        assert a == b
        # every stratum (including 'dropped') capped at 250:
        # big keeps ceil: cum - 100 < 250 => 3 docs; small/dropped all
        langs = {}
        for t in a:
            langs.setdefault(t[1], []).append(t)
        assert len(langs["big"]) == 3
        assert len(langs["small"]) == 5 and len(langs["dropped"]) == 3

    def test_prefix_is_hash_ordered_not_id_ordered(self, spark):
        """The kept set must be the md5-hash prefix (an unbiased
        subsample), not the lowest ids."""
        from auto_data_linkage_spark.operators.pack import token_budget_cap
        from auto_data_linkage_spark.operators.text import md5_hash64

        wt = self._wt(spark).where(F.col("lang") == "big")
        kept = {r.doc_id for r in token_budget_cap(wt, "lang", 450).collect()}
        order = [
            r.doc_id
            for r in wt.select(
                "doc_id",
                md5_hash64(F.col("doc_id").cast("string"), 0).alias("h"),
            ).orderBy("h", "doc_id").collect()
        ]
        assert kept == set(order[:5])
        assert kept != set(range(5))  # would mean id order, biased
