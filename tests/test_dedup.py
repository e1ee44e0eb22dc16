import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    exact_duplicates,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_duplicates,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "The quick  brown fox jumps over the lazy dog", "en"),   # exact after norm
        (3, "the quick brown fox jumps over the lazy cat", "en"),    # near-dup
        (4, "pack my box with five dozen liquor jugs", "en"),
        (5, "sphinx of black quartz judge my vow", "en"),
        (6, "el veloz zorro marron salta sobre el perro", "es"),
        (7, "el veloz zorro marron salta sobre el gato", "es"),      # near-dup of 6
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_duplicates_and_dedup(spark, docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_copies"] == 2 and groups[0]["keep_id"] == 1
    kept = exact_dedup(docs)
    assert kept.count() == 6
    assert kept.where(F.col("doc_id") == 2).count() == 0


def test_minhash_signature_properties(spark, docs):
    sig = docs.select("doc_id", minhash_signature("text", 16).alias("s"))
    rows = {r["doc_id"]: r["s"] for r in sig.collect()}
    assert all(len(s) == 16 for s in rows.values())
    # near-identical docs share most minhashes; unrelated docs share few
    same = sum(a == b for a, b in zip(rows[1], rows[3]))
    diff = sum(a == b for a, b in zip(rows[1], rows[5]))
    assert same > diff


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {
        (r["doc_id_l"], r["doc_id_r"])
        for r in minhash_lsh_candidates(docs, num_hashes=16, num_bands=8).collect()
    }
    assert (1, 2) in pairs  # exact dup must collide
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup should collide
    assert (4, 5) not in pairs  # unrelated must not


def test_minhash_lsh_leaves_no_pinned_cache(spark, docs):
    """The banded table is materialized via eager localCheckpoint, not
    persist()/cache(): the SQL CacheManager must hold no entry afterwards
    (a .persist() here pinned one entry per call in long-lived sessions,
    and unpersist-on-return races lazy consumers). localCheckpoint DOES
    register an RDD-level persist entry, but its lifecycle is GC-managed —
    released by the ContextCleaner once the DataFrame is dropped — so the
    RDD count is asserted as bounded (≤ before + 1), not unchanged."""
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    cached_before = cache_mgr.cachedData().size()
    rdds_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    minhash_lsh_candidates(docs, num_hashes=16, num_bands=8).collect()
    # no NEW SQL-level cache entry (other tests in the shared session may
    # legitimately hold their own)
    assert cache_mgr.cachedData().size() == cached_before
    rdds_after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert rdds_after <= rdds_before + 1


def test_minhash_verified_pairs(spark, docs):
    verified = minhash_dedup_pairs(
        docs, jaccard_threshold=0.5, num_hashes=16, num_bands=8
    ).collect()
    got = {(r["doc_id_l"], r["doc_id_r"]): r["jaccard"] for r in verified}
    assert got[(1, 2)] == pytest.approx(1.0)
    assert all(j >= 0.5 for j in got.values())


def test_simhash_identical_for_same_token_set(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["h"] for r in df.select("doc_id", simhash("text").alias("h")).collect()}
    assert rows[1] == rows[2]  # order-insensitive token set
    assert rows[1] != rows[3]
    dups = simhash_duplicates(df).collect()
    assert len(dups) == 1 and dups[0]["n_docs"] == 2


def test_ngram_jaccard_blocked(spark, docs):
    pairs = ngram_jaccard_pairs(docs, block_cols=("lang",), threshold=0.3)
    got = {(r["doc_id_l"], r["doc_id_r"]): r["jaccard"] for r in pairs.collect()}
    assert (6, 7) in got          # es near-dups found within their block
    assert (1, 6) not in got      # cross-lang pair never compared


def test_embedding_dup_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0], 0),   # near-dup of 1
        (3, [0.0, 1.0, 0.0], 0),
        (4, [1.0, 0.0, 0.0], 1),      # same vector, different bucket
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {
        (r["vec_id_l"], r["vec_id_r"]): r["cosine"]
        for r in embedding_dup_pairs(df, threshold=0.95).collect()
    }
    assert (1, 2) in got
    assert (1, 3) not in got
    assert (1, 4) not in got  # bucket blocking respected


def test_exact_dedup_on_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # testdata has no exact dups; dedup must be a no-op
    assert exact_dedup(docs).count() == docs.count()


def test_text_ops_edge_inputs(spark):
    # empty, whitespace, unicode, single char, long token, null — no
    # crashes, sane ranges
    from auto_data_linkage_spark.operators import text as X

    rows = [
        (1, ""),
        (2, "   \t\n "),
        (3, "héllo wörld héllo"),
        (4, "x"),
        (5, "a" * 5000),
        (6, None),
        (7, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        X.token_count("text").alias("n_tok"),
        X.quality_score("text").alias("q"),
        X.lang_id("text").alias("lang"),
        X.doc_fingerprint("text").alias("fp"),
        X.rolling_fingerprints("text", 3, 4).alias("winnow"),
        X.shingles("text", 3).alias("sh"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["n_tok"] == 0 and by_id[2]["n_tok"] == 0
    assert by_id[7]["lang"] == "en"
    for r in out:
        if r["q"] is not None:
            assert 0.0 <= r["q"] <= 1.0, r
    # null text propagates null features, never errors
    assert by_id[6]["fp"] is None
    # identical normalized text -> identical fingerprint
    fp = spark.createDataFrame([("A  b",), ("a b",)], "text string").select(
        X.doc_fingerprint("text").alias("fp")).collect()
    assert fp[0]["fp"] == fp[1]["fp"]


def test_simhash_near_pairs_exact_vs_bruteforce(spark):
    # banded candidates must find EVERY pair within max_hamming < n_bands
    # (pigeonhole) — compare against the brute-force cross join
    from auto_data_linkage_spark.operators import dedup as D

    # long docs: one changed token out of 60 flips ~1 signature bit
    base = " ".join(f"token{i}" for i in range(60))
    texts = [
        (1, base),
        (2, base.replace("token30", "changed")),  # hamming 1 from 1
        (3, base.replace("token10", "altered")),  # hamming 1 from 1
        (4, " ".join(f"other{i}" for i in range(60))),  # hamming ~17
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_id_l"], r["doc_id_r"])
        for r in D.simhash_near_pairs(df, max_hamming=3, n_bands=4).collect()
    }
    sig = D.simhash_table(df)
    from pyspark.sql import functions as F

    l = sig.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"))
    r = sig.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"))
    brute = {
        (x["a"], x["b"])
        for x in l.join(r, F.col("a") < F.col("b"))
        .where(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 3)
        .collect()
    }
    assert got == brute
    assert brute, "fixture should contain at least one near pair"


def test_simhash_near_pairs_rejects_bad_bands():
    from auto_data_linkage_spark.operators import dedup as D

    import pytest

    with pytest.raises(ValueError):
        D.simhash_near_pairs(None, max_hamming=4, n_bands=4)


def test_simhash_near_pairs_bucket_cap(spark):
    from auto_data_linkage_spark.operators import dedup as D

    base = " ".join(f"token{i}" for i in range(60))
    # 6 near-identical docs -> every band bucket has ~6 members
    texts = [(i, base.replace("token30", f"w{i}")) for i in range(1, 7)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    pairs = lambda **kw: {
        (r["doc_id_l"], r["doc_id_r"])
        for r in D.simhash_near_pairs(df, max_hamming=3, n_bands=4, **kw).collect()
    }
    full = pairs()
    capped = pairs(max_bucket=3)
    assert len(full) == 15     # C(6,2) — all near each other
    # the three identical-value band buckets (6 members) are dropped;
    # pairs may still collide via the differing band's small buckets,
    # so the capped result is a strict subset, never a superset
    assert capped < full


# ---------------------------------------------------- boilerplate strip


def test_strip_boilerplate_literal_path(spark):
    from auto_data_linkage_spark.operators.dedup import strip_boilerplate

    boiler = "accept all cookies"
    rows = [(i, f"{boiler} unique words {i} here now") for i in range(20)]
    rows += [(100, "no banner at all in this one")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in strip_boilerplate(
            df, chunk_words=3, min_doc_frac=0.5
        ).collect()
    }
    # BOTH corpus-wide chunks ("accept all cookies", "here now") are
    # boilerplate; the per-doc middle chunk survives
    assert out[0].n_removed == 2
    assert out[0].clean_text == "unique words 0"
    assert out[100].n_removed == 0
    assert out[100].clean_text == "no banner at all in this one"


def test_strip_boilerplate_join_path_matches_literal(spark):
    from auto_data_linkage_spark.operators import dedup as D

    rows = [(i, f"shared prefix tokens doc {i} tail") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lit = D.strip_boilerplate(df, chunk_words=2, min_doc_frac=0.5)
    old = D._BOILER_LITERAL_MAX
    try:
        D._BOILER_LITERAL_MAX = 0  # force the broadcast-anti-join path
        joined = D.strip_boilerplate(df, chunk_words=2, min_doc_frac=0.5)
    finally:
        D._BOILER_LITERAL_MAX = old
    a = sorted(map(tuple, lit.collect()))
    b = sorted(map(tuple, joined.collect()))
    assert a == b
    assert any(r[2] > 0 for r in a)  # something was actually removed


def test_boilerplate_chunks_threshold(spark):
    from auto_data_linkage_spark.operators.dedup import boilerplate_chunks

    rows = [(i, "common pair " + f"x{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bl = boilerplate_chunks(df, chunk_words=2, min_doc_frac=0.5).collect()
    assert [(r.chunk, r.doc_freq) for r in bl] == [("common pair", 10)]


def test_semantic_decontaminate_flags_planted_copy(spark):
    from auto_data_linkage_spark.operators.dedup import semantic_decontaminate

    bench = spark.createDataFrame(
        [(1000, [1.0, 0.0, 0.0]), (1001, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [0.99, 0.01, 0.0]),  # near-copy of bench 1000
            (2, [0.0, 0.0, 1.0]),  # orthogonal to both
            (3, [2.0, 0.0, 0.0]),  # scaled copy: cosine exactly 1
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in semantic_decontaminate(corpus, bench).collect()}
    assert not out[1].keep and out[1].max_bench_cosine > 0.99
    assert out[2].keep and out[2].max_bench_cosine == 0.0
    assert not out[3].keep and out[3].max_bench_cosine == 1.0


def test_semantic_decontaminate_broadcasts_benchmark(spark):
    from auto_data_linkage_spark.operators.dedup import semantic_decontaminate

    bench = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 50)],
        "vec_id long, embedding array<double>",
    )
    plan = (
        semantic_decontaminate(corpus, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_semantic_decontaminate_empty_benchmark_keeps_everything(spark):
    """An accidentally-empty benchmark must read as "nothing flagged"
    (every corpus row kept, cosine 0.0) — the inner broadcast join
    would otherwise silently drop every corpus row."""
    from auto_data_linkage_spark.operators.dedup import semantic_decontaminate

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    bench = corpus.where(F.col("vec_id") < 0)  # empty slice
    out = sorted(
        (r.vec_id, r.max_bench_cosine, r.keep)
        for r in semantic_decontaminate(corpus, bench).collect()
    )
    assert out == [(1, 0.0, True), (2, 0.0, True)]


def test_span_dedup_catches_arbitrary_offset_duplicates(spark):
    """The recall property chunk_dedup lacks: a duplicated span is
    removed from the later document at EVERY (offset_a, offset_b)
    alignment, including ones that straddle fixed chunk boundaries."""
    from auto_data_linkage_spark.operators.dedup import span_dedup

    cases = []
    # sweep misalignments 0..4 on each side (25 alignments, one pass);
    # each case gets its OWN span so cases don't dedup against each other
    cid = 0
    for off_a in range(5):
        for off_b in range(5):
            span = [f"s{cid}x{i}" for i in range(6)]
            pre_a = [f"a{cid}w{j}" for j in range(off_a)]
            pre_b = [f"b{cid}w{j}" for j in range(off_b)]
            post_b = [f"c{cid}w{j}" for j in range(3)]
            cases.append(
                (cid * 2, cid * 2 + 1,
                 " ".join(pre_a + span + [f"t{cid}"]),
                 " ".join(pre_b + span + post_b))
            )
            cid += 1
    rows = []
    for ida, idb, ta, tb in cases:
        rows.append((ida, ta))
        rows.append((idb, tb))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in span_dedup(df, min_span_words=6).collect()}
    for ida, idb, _, _ in cases:
        # first occurrence (lower doc_id) intact
        assert out[ida].n_removed == 0, (ida, out[ida])
        # later occurrence: exactly the 6 span tokens removed
        assert out[idb].n_removed == 6, (idb, out[idb])
        assert not any(w.startswith("s") for w in out[idb].dedup_text.split())


def test_span_dedup_overlapping_self_repetition(spark):
    """In-document repetition: 'p q r p q r p q r' with k=3 keeps only
    the first period of the cycle (every later 3-gram occurrence marks
    its span; overlapping spans union)."""
    from auto_data_linkage_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(
        [(1, "p q r p q r p q r"), (2, "x y z w")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in span_dedup(df, min_span_words=3).collect()}
    assert out[1].dedup_text == "p q r"
    assert out[1].n_removed == 6
    assert out[2].n_removed == 0 and out[2].dedup_text == "x y z w"


def test_span_dedup_hash_key_equivalent(spark, sf_dir):
    """The scale path (8-byte md5 gram keys in the exchange) must give
    identical results to the exact text-keyed mode on a real corpus."""
    from auto_data_linkage_spark.operators.dedup import span_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = {
        r.doc_id: (r.n_tokens, r.n_removed, r.dedup_text)
        for r in span_dedup(docs, min_span_words=5).collect()
    }
    b = {
        r.doc_id: (r.n_tokens, r.n_removed, r.dedup_text)
        for r in span_dedup(docs, min_span_words=5, hash_key=True).collect()
    }
    assert a == b and len(a) > 0


# ------------------------------------------- minhash LSH scale guards


def test_minhash_hot_bucket_cap_bounds_degenerate_corpus(spark):
    """A constructed mega-bucket (one template repeated 400×, plus 800
    short/empty docs) must produce O(cap²) candidates, never O(n²):
    short docs are routed around banding entirely, and the over-cap
    template bucket is dropped by the broadcast anti-join."""
    template = " ".join(f"tok{i}" for i in range(20))
    rows = [(i, template) for i in range(400)]          # template mega-bucket
    rows += [(1000 + i, "hi") for i in range(400)]      # sub-shingle-length
    rows += [(2000 + i, "") for i in range(400)]        # empty
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # routing alone: the 800 short/empty docs never band, so the
    # uncapped pair count is C(400,2) (template docs only), not C(1200,2)
    n_uncapped = minhash_lsh_candidates(
        df, num_hashes=8, num_bands=4, max_bucket=None
    ).count()
    assert n_uncapped == 400 * 399 // 2
    # the cap then drops the 400-member template bucket outright
    assert (
        minhash_lsh_candidates(
            df, num_hashes=8, num_bands=4, max_bucket=50
        ).count()
        == 0
    )


@pytest.mark.exhaustive
def test_minhash_short_doc_routing_vs_exact_dedup(spark):
    """Sub-shingle-length docs can only be exact duplicates (their
    shingle set is the singleton {whole text}); routing them out of
    banding loses nothing because exact_dedup owns them."""
    rows = [
        (1, ""), (2, ""),                     # empty pair
        (3, "a b"), (4, "a b"),               # 2-token exact pair
        (5, "the quick brown fox jumps"),
        (6, "the quick brown fox jumps!"),    # genuine near-dup, 5 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_id_l"], r["doc_id_r"])
        for r in minhash_lsh_candidates(df, num_hashes=16, num_bands=8).collect()
    }
    assert all(p[0] >= 5 for p in pairs), pairs   # short docs never band
    assert (5, 6) in pairs                        # long near-dups still found
    # legacy behavior reachable: route_short=False re-admits them
    legacy = {
        (r["doc_id_l"], r["doc_id_r"])
        for r in minhash_lsh_candidates(
            df, num_hashes=16, num_bands=8, route_short=False
        ).collect()
    }
    assert (1, 2) in legacy and (3, 4) in legacy
    # and exact_dedup catches exactly those routed-out duplicates
    kept = {r["doc_id"] for r in exact_dedup(df).collect()}
    assert 2 not in kept and 4 not in kept and {1, 3, 5, 6} <= kept


@pytest.mark.exhaustive
def test_minhash_guards_are_noop_on_normal_corpus(spark, docs):
    """Default guards must not change recall when no bucket is hot and
    no doc is sub-shingle-length."""
    kw = dict(num_hashes=16, num_bands=8)
    guarded = {
        (r["doc_id_l"], r["doc_id_r"])
        for r in minhash_lsh_candidates(docs, **kw).collect()
    }
    raw = {
        (r["doc_id_l"], r["doc_id_r"])
        for r in minhash_lsh_candidates(
            docs, max_bucket=None, route_short=False, **kw
        ).collect()
    }
    assert guarded == raw and len(guarded) > 0


@pytest.mark.exhaustive
def test_incremental_near_dedup_caps_hot_batch_bucket(spark):
    """The batch-side self-join in incremental_near_dedup honours
    max_bucket: an over-cap template cluster in the delta produces no
    within-batch edges, so every template doc survives independently
    (bounded work; recall traded exactly like the batch operator)."""
    from auto_data_linkage_spark.operators.dedup import incremental_near_dedup

    template = " ".join(f"tok{i}" for i in range(20))
    existing = spark.createDataFrame(
        [(10_000, "some unrelated corpus document entirely")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(i, template) for i in range(100)], "doc_id long, text string"
    )
    capped = incremental_near_dedup(existing, new, max_bucket=10)
    assert capped.count() == 100           # bucket dropped → no edges
    full = incremental_near_dedup(existing, new, max_bucket=None)
    assert full.count() == 1               # one survivor per component


@pytest.mark.exhaustive
def test_bloom_decontaminate_superset_of_exact(spark, sf_dir):
    """Bloom flags are a superset of the exact operator's (never a false
    negative): every doc the exact n-gram overlap drops must also be
    dropped by the bloom variant, and n_flagged >= n_shared per doc."""
    from auto_data_linkage_spark.operators.dedup import (
        bloom_decontaminate,
        decontaminate,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # ~17 bench docs → ~8k distinct grams; m = 2^20 puts the per-gram
    # FP rate near 1e-6 so keep-flag flips are genuinely rare
    bench = docs.where(F.col("doc_id") % 29 == 0)
    train = docs.where(F.col("doc_id") % 29 != 0)
    exact = {
        r["doc_id"]: r["n_shared"]
        for r in decontaminate(train, bench, shingle_k=5).collect()
    }
    bloom = {
        r["doc_id"]: r["n_flagged"]
        for r in bloom_decontaminate(
            train, bench, shingle_k=5, m_bits=1 << 20, n_hashes=4
        ).collect()
    }
    assert set(exact) == set(bloom)
    for d, n in exact.items():
        assert bloom[d] >= n, (d, n, bloom[d])
    # at this filter size the FP load is tiny: the keep sets agree on
    # the overwhelming majority of documents
    disagree = sum(1 for d in exact if (exact[d] == 0) != (bloom[d] == 0))
    assert disagree <= max(2, len(exact) // 100), disagree


def test_bloom_decontaminate_corpus_path_is_joinefree(spark):
    """The corpus probe must be a literal projection: the only join in
    the plan is the final per-doc count join-back — no benchmark-side
    relation is joined or broadcast into the gram path."""
    from auto_data_linkage_spark.operators.dedup import bloom_decontaminate

    docs = spark.createDataFrame(
        [(i, f"token{i} alpha beta gamma delta epsilon zeta") for i in range(30)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    out = bloom_decontaminate(docs, bench, shingle_k=3, m_bits=4096, n_hashes=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") <= 2, plan  # one id join-back (+ AQE reuse)


def test_decontaminate_attribution_matches_boolean_operator(spark, sf_dir):
    """Attribution's contaminated-doc set equals decontaminate's, and a
    doc's distinct shared-gram count is bounded by its per-pair sums."""
    from auto_data_linkage_spark.operators.dedup import (
        decontaminate,
        decontaminate_attribution,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    att = decontaminate_attribution(train, bench, shingle_k=5).collect()
    dec = decontaminate(train, bench, shingle_k=5).collect()

    att_docs = {r.doc_id for r in att}
    dec_docs = {r.doc_id for r in dec if not r.keep}
    assert att_docs == dec_docs
    assert all(r.n_shared >= 1 for r in att)
    # a gram shared with two bench docs counts once in decontaminate but
    # once PER PAIR in attribution: per-doc pair-sum >= distinct count
    per_doc = {}
    for r in att:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_shared
    dec_n = {r.doc_id: r.n_shared for r in dec}
    assert all(per_doc[d] >= dec_n[d] for d in att_docs)


def test_decontaminate_attribution_hand_built(spark):
    """Known tiny corpus: exact (doc, bench, n_shared) triples."""
    from auto_data_linkage_spark.operators.dedup import (
        decontaminate_attribution,
    )

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with no overlap at all"),
            (3, "quick brown fox jumps high and the lazy dog sleeps"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            (100, "a quick brown fox jumps over fences"),
            (200, "the lazy dog sleeps all day long"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.bench_id): r.n_shared
        for r in decontaminate_attribution(train, bench, shingle_k=3).collect()
    }
    # doc 1 / bench 100: "quick brown fox", "brown fox jumps",
    # "fox jumps over"
    assert out[(1, 100)] == 3
    # doc 1 / bench 200: "the lazy dog"
    assert out[(1, 200)] == 1
    # doc 3 / bench 100: "quick brown fox", "brown fox jumps";
    # doc 3 / bench 200: "the lazy dog", "lazy dog sleeps"
    assert out[(3, 100)] == 2
    assert out[(3, 200)] == 2
    # doc 2 is clean — no rows at all
    assert all(d != 2 for d, _ in out)
    assert len(out) == 4


def test_keep_best_in_cluster_picks_highest_score(spark):
    from auto_data_linkage_spark.operators.dedup import keep_best_in_cluster

    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (4, 2), (5, 7)],
        "doc_id long, score long",
    )
    # cluster {1,2,3}: 2 and 3 tie at 9 -> min id 2 wins; 4,5 singletons
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "node long, component long"
    )
    kept = sorted(
        (r.doc_id, r.score)
        for r in keep_best_in_cluster(docs, comp, "score").collect()
    )
    assert kept == [(2, 9), (4, 2), (5, 7)]


def test_keep_best_in_cluster_bounded_window(spark):
    """The arbitration window is WindowGroupLimit-eligible (rn == 1), so
    hot components never ship their full membership per task."""
    from auto_data_linkage_spark.operators.dedup import keep_best_in_cluster
    from auto_data_linkage_spark.plans.explain import physical_plan

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("score")
    )
    comp = spark.range(500).select(
        F.col("id").alias("node"), (F.col("id") % 3).alias("component")
    )
    plan = physical_plan(keep_best_in_cluster(docs, comp, "score"))
    assert "WindowGroupLimit" in plan


def test_paragraph_dedup_unit(spark):
    """unit='paragraph' dedups blank-line-separated blocks: the
    repeated footer paragraph survives only at its first (id, pos)
    occurrence; unique paragraphs all survive; documents reassemble
    with blank-line joins."""
    from auto_data_linkage_spark.operators.dedup import line_dedup

    footer = "follow us on all the social networks for more updates"
    rows = [
        (1, f"alpha one content block\n\n{footer}"),
        (2, f"beta two content block\n \n{footer}"),
        (3, f"{footer}\n\ngamma three content block"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(
        df, unit="paragraph", min_chars=10).collect()}
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["dedup_text"] == f"alpha one content block\n\n{footer}"
    # doc 2's footer (id order) and doc 3's footer (also later id) drop
    assert out[2]["dedup_text"] == "beta two content block"
    assert out[3]["dedup_text"] == "gamma three content block"
    with __import__("pytest").raises(ValueError):
        line_dedup(df, unit="sentence")


def test_dedup_recall_probe(spark, sf_dir):
    """The planted-duplicate QC loop: a gentle perturbation (1 in 12
    tokens dropped) at a moderate threshold must recover most planted
    twins, and recall is monotone in probe hardness (dropping 1 in 3
    tokens can only lower it). All planted twin ids are negative, so
    they never collide with the corpus id space."""
    from auto_data_linkage_spark.operators.dedup import dedup_recall_probe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    gentle = dedup_recall_probe(
        docs, probe_rate=0.2, drop_every=12,
        jaccard_threshold=0.5, num_hashes=8, num_bands=8,
    ).collect()[0]
    assert gentle["n_planted"] > 0
    assert gentle["recall"] >= 0.7, gentle
    hard = dedup_recall_probe(
        docs, probe_rate=0.2, drop_every=3,
        jaccard_threshold=0.5, num_hashes=8, num_bands=8,
    ).collect()[0]
    assert hard["n_planted"] == gentle["n_planted"]
    assert hard["recall"] <= gentle["recall"], (hard, gentle)


def test_dedup_recall_probe_validation(spark, sf_dir):
    from auto_data_linkage_spark.operators.dedup import dedup_recall_probe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import pytest as _pt

    with _pt.raises(ValueError):
        dedup_recall_probe(docs, probe_rate=0.0)
    with _pt.raises(ValueError):
        dedup_recall_probe(docs, drop_every=1)


def test_duplication_weights_soft_dedup(spark):
    """Hand-built clusters: a 3-cluster weighs 1/3 per member, a pair
    1/2, singletons 1.0; every input row appears exactly once; total
    sampling mass == number of distinct contents at alpha=1."""
    from auto_data_linkage_spark.operators.dedup import duplication_weights

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    comp = spark.createDataFrame(
        # {1,2,3} one cluster, {4,5} another; 6,7 singletons (absent)
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)],
        "node long, component long",
    )
    got = {r["doc_id"]: r for r in duplication_weights(docs, comp).collect()}
    assert len(got) == 7
    assert got[1]["n_copies"] == 3 and got[1]["weight"] == round(1 / 3, 6)
    assert got[4]["n_copies"] == 2 and got[4]["weight"] == 0.5
    assert got[6]["n_copies"] == 1 and got[6]["weight"] == 1.0
    mass = sum(r["weight"] for r in got.values())
    assert abs(mass - 4.0) < 1e-5  # 2 clusters + 2 singletons... = 1+1+1+1
    # alpha=0 keeps everything at weight 1 (pure annotation)
    flat = duplication_weights(docs, comp, alpha=0.0).collect()
    assert all(r["weight"] == 1.0 for r in flat)
    import pytest as _pt

    with _pt.raises(ValueError):
        duplication_weights(docs, comp, alpha=-1)


class TestStripBoilerplateGrouped:
    def test_per_site_nav_removed_only_within_its_site(self, spark):
        from auto_data_linkage_spark.operators.dedup import (
            strip_boilerplate_grouped,
        )

        nav_a = "home products about contact cart login search help"
        body = [
            "alpha beta gamma delta epsilon zeta eta theta",
            "iota kappa lam mu nu xi omicron pi",
            "rho sigma tau upsilon phi chi psi omega",
        ]
        rows = []
        # site A: nav_a prefixes every page -> boilerplate FOR A
        for i, b in enumerate(body):
            rows.append((i, "A", f"{nav_a} {b}"))
        # site B: ONE page contains the same chunk -> below B's floor,
        # must survive there
        rows.append((10, "B", f"{nav_a} {body[0]}"))
        rows.append((11, "B", body[1]))
        rows.append((12, "B", body[2]))
        df = spark.createDataFrame(rows, "doc_id long, src string, text string")
        out = {
            r.doc_id: r
            for r in strip_boilerplate_grouped(
                df, "src", chunk_words=8, min_doc_frac=0.5, min_docs=2
            ).collect()
        }
        for i, b in enumerate(body):
            assert out[i].clean_text == b, out[i].clean_text
            assert out[i].n_removed == 1 and out[i].group == "A"
        assert out[10].clean_text == f"{nav_a} {body[0]}"
        assert out[10].n_removed == 0 and out[10].group == "B"

    def test_reassembly_preserves_order_and_counts(self, spark):
        from auto_data_linkage_spark.operators.dedup import (
            strip_boilerplate_grouped,
        )

        nav = "one two three four"
        rows = [
            (1, "S", f"{nav} aa bb cc dd {nav} ee ff gg hh"),
            (2, "S", f"{nav} ii jj kk ll"),
            (3, "S", f"{nav} mm nn oo pp"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, src string, text string")
        out = {
            r.doc_id: r
            for r in strip_boilerplate_grouped(
                df, "src", chunk_words=4, min_doc_frac=0.5, min_docs=2
            ).collect()
        }
        # doc 1 has the nav chunk TWICE (positions 0 and 2): both go
        assert out[1].clean_text == "aa bb cc dd ee ff gg hh"
        assert out[1].n_removed == 2 and out[1].n_chunks == 4
        assert out[2].clean_text == "ii jj kk ll"

    def test_line_unit_preserves_case_and_structure(self, spark):
        """unit="line": boilerplate LINES are removed by a normalized
        key (case/indent variants of the same nav bar unify) but the
        surviving text reassembles the ORIGINAL lines — case, blank
        lines, and paragraph breaks intact. This is the unit a pipeline
        that REPLACES training text must use."""
        from auto_data_linkage_spark.operators.dedup import (
            strip_boilerplate_grouped,
        )

        nav = "Home | Products | About"
        rows = [
            (1, "A", f"{nav}\nAlpha Beta keeps Case.\n\n"
                     f"Second Paragraph here.\n  WE USE COOKIES  "),
            (2, "A", f"{nav.upper()}\nOther body text two.\n\n"
                     f"we use cookies"),
            (3, "A", f"  {nav}\nThird body text three.\nWe Use Cookies"),
            (4, "B", f"{nav}\nSite B keeps it."),
        ]
        df = spark.createDataFrame(rows, "doc_id long, src string, text string")
        out = {
            r.doc_id: r
            for r in strip_boilerplate_grouped(
                df, "src", unit="line", min_doc_frac=0.5, min_docs=2
            ).collect()
        }
        # nav (all case/indent variants) and the cookie banner are gone;
        # the body keeps case AND the blank line between paragraphs
        assert out[1].clean_text == (
            "Alpha Beta keeps Case.\n\nSecond Paragraph here."
        )
        assert out[1].n_chunks == 5 and out[1].n_removed == 2
        assert out[2].clean_text == "Other body text two.\n"
        # site B saw the nav only once -> below the floor, kept verbatim
        assert out[4].clean_text == f"{nav}\nSite B keeps it."
        assert out[4].n_removed == 0

    def test_line_unit_blank_lines_never_detected(self, spark):
        """Blank lines appear in every document but are structure, not
        boilerplate — they must survive even though their document
        frequency tops every floor."""
        from auto_data_linkage_spark.operators.dedup import (
            strip_boilerplate_grouped,
        )

        rows = [
            (i, "S", f"Unique body line {i}.\n\nUnique tail {i}.")
            for i in range(4)
        ]
        df = spark.createDataFrame(rows, "doc_id long, src string, text string")
        out = {
            r.doc_id: r
            for r in strip_boilerplate_grouped(
                df, "src", unit="line", min_doc_frac=0.3, min_docs=2
            ).collect()
        }
        for i in range(4):
            assert out[i].clean_text == f"Unique body line {i}.\n\nUnique tail {i}."
            assert out[i].n_removed == 0

    def test_unit_validation(self, spark):
        from auto_data_linkage_spark.operators.dedup import (
            strip_boilerplate_grouped,
        )
        import pytest as _pt

        df = spark.createDataFrame([(1, "S", "x")],
                                   "doc_id long, src string, text string")
        with _pt.raises(ValueError, match="unit"):
            strip_boilerplate_grouped(df, "src", unit="paragraph")


def test_source_overlap_matrix_counts_and_rates(spark):
    """Hand-computed matrix: pairs (1,2) same-source A, (1,3) and (2,3)
    cross A×B, doc 4 in source C untouched — counts exact, rates
    normalized by n_a·n_b (cross) and n·(n−1)/2 (diagonal), unordered
    source keys."""
    from auto_data_linkage_spark.operators.dedup import (
        source_overlap_matrix,
    )

    docs = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "C")],
        "doc_id long, source string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "doc_id_l long, doc_id_r long"
    )
    out = {
        (r.source_a, r.source_b): r
        for r in source_overlap_matrix(docs, pairs).collect()
    }
    assert set(out) == {("A", "A"), ("A", "B")}
    aa = out[("A", "A")]
    assert (aa.n_pairs, aa.n_docs_a, aa.n_docs_b) == (1, 2, 2)
    assert aa.dup_rate == 1.0  # 1 pair / (2·1/2)
    ab = out[("A", "B")]
    assert (ab.n_pairs, ab.n_docs_a, ab.n_docs_b) == (2, 2, 1)
    assert ab.dup_rate == 1.0  # 2 pairs / (2·1)
