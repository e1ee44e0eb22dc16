import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.text import (
    add_text_features,
    bpe_token_count,
    doc_fingerprint,
    lang_id,
    md5_hash64,
    quality_score,
    rolling_fingerprints,
    shingles,
    token_count,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("the cat sat",), ("one-two  three!",), ("",)], "text string"
    )
    rows = df.select(
        token_count("text").alias("ws"), bpe_token_count("text").alias("bpe")
    ).collect()
    assert rows[0]["ws"] == 3 and rows[0]["bpe"] == 3
    assert rows[1]["ws"] == 2  # whitespace split
    assert rows[1]["bpe"] == 5  # one, -, two, three, !
    assert rows[2]["ws"] == 0


def test_quality_score_ordering(spark):
    df = spark.createDataFrame(
        [
            ("good", "the cat sat on the mat and it is happy there today",),
            ("junk", "@@@ ### $$$ %%% 111 222 333 !!!",),
        ],
        "kind string, text string",
    )
    got = {r["kind"]: r["q"] for r in df.select("kind", quality_score("text").alias("q")).collect()}
    assert got["good"] > got["junk"]
    assert 0.0 <= got["junk"] <= got["good"] <= 1.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("en", "the cat and the dog is in a house"),
            ("es", "el perro y la casa es un lugar que no se ve"),
            ("de", "der hund und die katze ist ein tier zu hause"),
            ("und", "zzz qqq xxx"),
        ],
        "expected string, text string",
    )
    rows = df.select("expected", lang_id("text").alias("got")).collect()
    for r in rows:
        assert r["got"] == r["expected"], r


def test_lang_id_fifteen_language_matrix(spark):
    """Short snippets in each supported language must classify to their
    own code — the multilingual coverage the curation claim rests on."""
    snippets = [
        ("en", "the house and the garden of a king"),
        ("es", "el perro y la casa que no se ve"),
        ("fr", "le chien est dans la maison pour une nuit"),
        ("de", "der hund und die katze ist ein tier"),
        ("it", "il cane che sono una bestia non per caso con"),
        ("pt", "o cachorro não está em um lugar para do da"),
        ("nl", "de hond en het huis van een dat niet zijn"),
        ("sv", "hunden och huset är som en katt på av för"),
        ("pl", "pies się nie na to że jest do jak"),
        ("ru", "и собака не на это как он что по"),
        ("tr", "bir köpek ve bu ev için ile çok"),
        ("id", "anjing yang dan di itu dengan untuk ini"),
        ("vi", "con chó là và của có không một"),
        ("ro", "câinele și de la în să cu este"),
        ("zh", "wo de gou shi zai ta men zhe"),
    ]
    df = spark.createDataFrame(snippets, "expected string, text string")
    rows = df.select("expected", lang_id("text").alias("got")).collect()
    misses = [(r["expected"], r["got"]) for r in rows if r["got"] != r["expected"]]
    assert not misses, misses


def test_lang_id_min_hits_floor(spark):
    """One incidental function word must not commit a language AT THE
    DEFAULT floor (min_hits=2): 'a zebra' is und, not en. min_hits=1
    restores the label-anything behavior; well-evidenced docs are
    unaffected either way."""
    df = spark.createDataFrame(
        [(1, "a zebra"), (2, "the cat and the dog is in a house")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["d1"], r["d2"])
        for r in df.select(
            "doc_id",
            lang_id("text").alias("d1"),
            lang_id("text", min_hits=1).alias("d2"),
        ).collect()
    }
    assert rows[1] == ("und", "en")   # single "a" hit is below the floor
    assert rows[2] == ("en", "en")    # well-evidenced doc unaffected


def test_lang_id_short_snippet_false_positive_matrix(spark):
    """A single incidental function word from EACH supported language,
    embedded in otherwise out-of-vocabulary text, must map to und at
    the default floor — the false-positive matrix the floor exists
    for."""
    from auto_data_linkage_spark.operators.text import LANG_STOPWORDS

    snippets = [
        (lang, f"zzz {sorted(LANG_STOPWORDS[lang])[0]} qqq")
        for lang in sorted(LANG_STOPWORDS)
    ]
    df = spark.createDataFrame(snippets, "lang string, text string")
    got = df.select("lang", lang_id("text").alias("pred")).collect()
    wrong = [(r["lang"], r["pred"]) for r in got if r["pred"] != "und"]
    assert not wrong, wrong


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("A  cat\tsat",), ("a cat sat",), ("a cat stood",)], "text string"
    )
    fps = [r["fp"] for r in df.select(doc_fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    got = df.select(shingles("text", 3).alias("s")).collect()[0]["s"]
    assert sorted(got) == ["a b c", "b c d"]
    # shorter than k -> single shingle of the whole text
    short = spark.createDataFrame([("a b",)], "text string")
    got2 = short.select(shingles("text", 3).alias("s")).collect()[0]["s"]
    assert got2 == ["a b"]


def test_md5_hash64_matches_duckdb(spark):
    import duckdb

    df = spark.createDataFrame([("hello",), ("world",)], "v string")
    got = {r["v"]: r["h"] for r in df.select("v", md5_hash64(F.col("v"), seed=7).alias("h")).collect()}
    con = duckdb.connect()
    for v, h in got.items():
        expected = con.execute(
            "select cast(concat('0x', substr(md5(concat('7|', ?)),1,15)) as bigint)",
            [v],
        ).fetchone()[0]
        assert h == expected, v


def test_rolling_fingerprints_shared_prefix(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),  # near-dup
            (3, "completely different words entirely here now"),
        ],
        "id int, text string",
    )
    rows = {r["id"]: r["fp"] for r in df.select("id", rolling_fingerprints("text").alias("fp")).collect()}
    shared_12 = len(set(rows[1]) & set(rows[2]))
    shared_13 = len(set(rows[1]) & set(rows[3]))
    assert shared_12 > shared_13


def test_add_text_features_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = add_text_features(docs)
    row = out.limit(1).collect()[0]
    assert row["n_tokens"] > 0
    assert 0.0 <= row["quality"] <= 1.0
    assert len(row["fingerprint"]) == 32


def test_winnow_select_coverage_guarantee(spark):
    """Winnowing property: two documents sharing a token run of length
    >= w + k - 1 MUST share at least one selected fingerprint; the global
    k-smallest variant has no such guarantee. Also: short docs (< one
    window) still produce their overall-min fingerprint."""
    from auto_data_linkage_spark.operators.text import winnow_select

    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w + k - 1
    df = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"seven eight {shared} nine ten eleven twelve"),
            (3, "totally different words here entirely"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    rows = df.select(
        "doc_id", winnow_select("text", k=k, w=w).alias("fps")
    ).collect()
    fps = {r["doc_id"]: set(r["fps"]) for r in rows}
    assert fps[1] & fps[2], "shared >= w+k-1 run must share a fingerprint"
    assert not (fps[1] & fps[3])
    assert len(fps[4]) == 1  # sub-window doc -> overall min


def test_curate_documents_pipeline(spark):
    """Composed curation: quality gate, language gate, exact-dup group
    collapses to min id, near-dup cluster collapses to min id."""
    from auto_data_linkage_spark.operators.pipeline import curate_documents

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "with some other common words that keep the quality score high"
    )
    rows = [
        (1, base),                      # survives (cluster min)
        (2, base),                      # exact dup of 1 -> dropped
        (3, base + " extra tail"),      # near dup of 1 -> dropped
        (4, "el perro y el gato y la casa y los amigos y una palabra mas"),  # not en
        (5, "#### $$$$ %%%% 1234 5678 !!!! ???? ****"),  # low quality
        (6, "a completely different english sentence about the weather and "
            "the mountains with many of the usual common words in it"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["lang_pred"], r["quality"])
        for r in curate_documents(
            df, min_quality=0.5, langs=("en",), num_hashes=4, num_bands=4
        ).collect()
    }
    assert set(out) == {1, 6}
    assert out[1][0] == "en" and out[6][0] == "en"
    assert all(q >= 0.5 for _, q in out.values())


def test_curate_documents_best_quality_keeper(spark):
    """keeper='best_quality' keeps the highest-quality member of each
    near-dup cluster instead of the min id; cluster count is unchanged."""
    from auto_data_linkage_spark.operators.pipeline import curate_documents

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "with some other common words that keep the quality score high"
    )
    rows = [
        (1, base + " 1234 $$"),         # same cluster, punct lowers quality
        (2, base + " extra tail"),      # near dup of 1, higher quality
        (6, "a completely different english sentence about the weather and "
            "the mountains with many of the usual common words in it"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kwargs = dict(min_quality=0.3, langs=("en",), num_hashes=4,
                  num_bands=4, jaccard_threshold=0.5)
    best = {r["doc_id"] for r in
            curate_documents(df, keeper="best_quality", **kwargs).collect()}
    minid = {r["doc_id"] for r in curate_documents(df, **kwargs).collect()}
    assert minid == {1, 6}   # min-id keeper: 1 survives its cluster
    assert best == {2, 6}    # quality keeper: 2 (higher quality) survives
    import pytest as _pytest
    with _pytest.raises(ValueError):
        curate_documents(df, keeper="longest", **kwargs)


def test_normalize_text_nfc_and_cleanups(spark):
    from auto_data_linkage_spark.operators.text import normalize_text

    decomposed = "Café  du\tmonde"  # e + combining acute, messy ws
    composed = "Café du monde"
    df = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, "ctrl\x00char"), (4, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.norm_text for r in normalize_text(df).collect()}
    assert out[1] == composed  # NFC composes, whitespace collapses
    assert out[2] == composed
    assert out[3] == "ctrlchar"
    assert out[4] is None
    # the canonicalization goal: both spellings now share a content hash
    from pyspark.sql import functions as F

    hashes = (
        normalize_text(df.where(F.col("doc_id") <= 2))
        .select(F.md5("norm_text").alias("h"))
        .distinct()
        .count()
    )
    assert hashes == 1


def test_normalize_text_bad_form_raises(spark):
    from auto_data_linkage_spark.operators.text import normalize_text

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    import pytest as _pt

    with _pt.raises(ValueError):
        normalize_text(df, form="NFX")


def test_gopher_rules_each_gate(spark):
    from auto_data_linkage_spark.operators.text import gopher_rules

    good = ("the quick brown fox jumps over that lazy dog and then "
            "writers have fun with lots of words to fill the page nicely")
    rows = [
        (1, good),                                   # passes everything
        (2, "too few words"),                        # word_count fails
        (3, "the of and to " + "supercalifragilistic " * 20),  # mean len
        (4, good + " " + "# " * 40),                 # symbol ratio fails
        (5, good.replace(" ", "\n- ")),              # bullet lines fail
        (6, good + " 111 222 333 444 555 666 777 888 999 000 "
              "111 222 333 444 555 666"),            # alpha frac fails
        (7, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii"),
        #                                            # stopwords fail
        # list-heavy but legitimate: 50% bullet lines must PASS — the
        # Gopher threshold is >90% bullet lines (Rae'21 / DataTrove 0.9),
        # not >10% (the round-7 ADVICE over-filtering bug)
        (8, "\n".join(
            line for pair in zip(
                [good] * 6, [f"- item number {i} of the list" for i in range(6)]
            ) for line in pair
        )),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_rules(df, min_words=10).collect()}
    assert out[1].keep
    assert out[8].bullet_ok and out[8].keep
    assert not out[2].word_count_ok and not out[2].keep
    assert not out[3].mean_len_ok and not out[3].keep
    assert not out[4].symbol_ok and not out[4].keep
    assert not out[5].bullet_ok and not out[5].keep
    assert not out[6].alpha_ok and not out[6].keep
    assert not out[7].stopword_ok and not out[7].keep


def test_c4_clean_gates(spark):
    from auto_data_linkage_spark.operators.text import c4_clean

    rows = [
        (1, "This is a good long sentence that ends properly.\n"
            "Another fine sentence with enough words here.\n"
            "And a third complete sentence for the page quota.\n"
            "short.\nno terminal punct here at all"),
        (2, "Enable javascript to view this page properly please.\n"
            "Only one good sentence survives on this page today."),
        (3, "A fine sentence that would normally be kept here.\n"
            "But the page contains lorem ipsum filler text.\n"
            "So the whole page must be dropped by the gate."),
        (4, "function() { return 1; }\n"
            "A perfectly good sentence that ends with a period.\n"
            "Another good sentence that also ends with a period.\n"
            "Third sentence is here to cross the line quota."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in c4_clean(df).collect()}
    assert out[1].keep and out[1].n_kept == 3
    assert "short." not in out[1].clean_text          # <5 words dropped
    assert not out[2].keep and out[2].n_kept == 1     # javascript + quota
    assert not out[3].keep                            # lorem ipsum page
    assert not out[4].keep                            # curly brace page
    assert out[4].n_kept == 3                         # lines still clean


def _rep_ref(text):
    """Independent Python reference of gopher_repetition_rules."""
    import re
    from collections import Counter

    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    total = sum(len(t) for t in toks)
    lines = [s for s in (l.strip(" ") for l in text.split("\n")) if s != ""]
    paras = [s for s in (p.strip(" ") for p in re.split(r"\n{2,}", text))
             if s != ""]

    def stats(vals, overhead):
        cnt = Counter(vals)
        top = max((m * (len(v) - overhead) for v, m in cnt.items()
                   if m >= 2), default=0)
        dup = sum((m - 1) * (len(v) - overhead) for v, m in cnt.items())
        return top, dup

    def grams(n):
        if len(toks) < n:
            return []
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]

    _, dup_l = stats(lines, 0)
    _, dup_p = stats(paras, 0)
    lc = sum(len(l) for l in lines)
    pc = sum(len(p) for p in paras)
    g = {n: stats(grams(n), n - 1) for n in range(2, 11)}
    return {
        "dup_line_ok": 10 * (len(lines) - len(set(lines))) <= 3 * len(lines),
        "dup_para_ok": 10 * (len(paras) - len(set(paras))) <= 3 * len(paras),
        "dup_line_char_ok": 5 * dup_l <= lc,
        "dup_para_char_ok": 5 * dup_p <= pc,
        "top_2gram_ok": 5 * g[2][0] <= total,
        "top_3gram_ok": 50 * g[3][0] <= 9 * total,
        "top_4gram_ok": 25 * g[4][0] <= 4 * total,
        "dup_5gram_ok": 20 * g[5][1] <= 3 * total,
        "dup_6gram_ok": 50 * g[6][1] <= 7 * total,
        "dup_7gram_ok": 100 * g[7][1] <= 13 * total,
        "dup_8gram_ok": 25 * g[8][1] <= 3 * total,
        "dup_9gram_ok": 100 * g[9][1] <= 11 * total,
        "dup_10gram_ok": 10 * g[10][1] <= total,
    }


def test_gopher_repetition_rules_flip_each_class(spark):
    from auto_data_linkage_spark.operators.text import gopher_repetition_rules

    import random

    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(200)]

    def sent(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    clean = "\n".join(sent(12) for _ in range(10))
    dup_lines = "\n".join([sent(8)] * 5 + [sent(8) for _ in range(5)])
    p = sent(30)
    dup_paras = "\n\n".join([p, p, sent(30)])
    top2 = " ".join(["alpha beta"] * 30) + " " + sent(60)
    span10 = sent(10)
    dup10 = " ".join([span10] * 5) + " " + sent(20)

    rows = [(1, clean), (2, dup_lines), (3, dup_paras), (4, top2),
            (5, dup10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.asDict() for r in gopher_repetition_rules(df).collect()}

    for doc_id, text in rows:
        ref = _rep_ref(text)
        got = {k: v for k, v in out[doc_id].items()
               if k not in ("doc_id", "keep")}
        assert got == ref, f"doc {doc_id}: {got} != {ref}"

    assert out[1]["keep"]
    assert not out[2]["dup_line_ok"]
    assert not out[3]["dup_para_ok"]
    assert not out[4]["top_2gram_ok"]
    assert not out[5]["dup_10gram_ok"] and not out[5]["dup_5gram_ok"]
    for d in (2, 3, 4, 5):
        assert not out[d]["keep"]


def test_gopher_repetition_rules_random_parity(spark):
    """30 random docs (mixed repetition levels) — every boolean matches
    the independent Python reference bit-for-bit."""
    from auto_data_linkage_spark.operators.text import gopher_repetition_rules

    import random

    rng = random.Random(42)
    vocab = [f"t{i}" for i in range(50)]
    docs = []
    for i in range(30):
        parts = []
        for _ in range(rng.randint(1, 8)):
            words = [rng.choice(vocab) for _ in range(rng.randint(1, 25))]
            line = " ".join(words)
            parts.extend([line] * rng.randint(1, 3))
        sep = "\n\n" if i % 2 else "\n"
        docs.append((i, sep.join(parts)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r.asDict() for r in gopher_repetition_rules(df).collect()}
    for i, text in docs:
        ref = _rep_ref(text)
        got = {k: v for k, v in out[i].items() if k not in ("doc_id", "keep")}
        assert got == ref, f"doc {i}"


def test_gopher_repetition_rules_zero_exchanges(spark, sf_dir):
    from auto_data_linkage_spark.operators.text import gopher_repetition_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = gopher_repetition_rules(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


# ------------------------------------------------------------------ HTML
def test_html_to_text_fixture(spark):
    from auto_data_linkage_spark.operators.text import extract_html

    html = (
        '<html><head><title>T</title><style>p{color:red}</style></head>'
        '<body><!-- chrome --><div>Hello &amp; welcome</div>'
        '<p>one<br>two &lt;esc&gt;</p>'
        '<script>var x = "<p>not text</p>";</script>'
        '<ul><li>alpha</li><li>beta</li></ul>'
        '<a href="/x">link</a> tail&nbsp;words</body></html>'
    )
    df = spark.createDataFrame([(1, html)], "id long, html string")
    row = extract_html(df, "html").collect()[0]
    assert row["text"] == (
        "T\nHello & welcome\none\ntwo <esc>\nalpha\nbeta\nlink tail words"
    )
    assert row["n_links"] == 1
    assert row["script_chars"] > 0
    assert 0 < row["tag_density"] < 1


def test_html_entity_decode_order_no_double_decode(spark):
    """&amp;lt; is the LITERAL string '&lt;' — decoding &amp; last must
    not re-expose it as a '<'. The classic double-decode bug."""
    from auto_data_linkage_spark.operators.text import html_to_text

    df = spark.createDataFrame(
        [(1, "<p>a &amp;lt; b</p>"), (2, "<p>&quot;q&quot; &#39;s&#39;</p>")],
        "id long, html string",
    )
    got = {r["id"]: r["t"] for r in df.select(
        "id", html_to_text("html").alias("t")).collect()}
    assert got[1] == "a &lt; b"
    assert got[2] == "\"q\" 's'"


def test_html_drop_content_per_tag(spark):
    from auto_data_linkage_spark.operators.text import html_to_text

    df = spark.createDataFrame(
        [
            (1, "x<style>s{a:b}</style>y<noscript>n</noscript>z"),
            (2, "a<template><b>inner</b></template>c"),
            (3, None),
            (4, ""),
        ],
        "id long, html string",
    )
    got = {r["id"]: r["t"] for r in df.select(
        "id", html_to_text("html").alias("t")).collect()}
    assert got[1] == "xyz" and got[2] == "ac"
    assert got[3] is None and got[4] == ""


def test_extract_html_zero_shuffle_plan(spark, sf_dir):
    from auto_data_linkage_spark.operators.text import extract_html
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.concat(F.lit("<p>"), "text", F.lit("</p>")).alias("html")
    )
    plan = (
        extract_html(docs, "html")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


class TestFixMojibake:
    """UTF-8-as-cp1252 mojibake repair: Spark operator == pure-Python
    reference, conservative on legitimate accented text."""

    @staticmethod
    def _sloppy_decode(bs: bytes) -> str:
        out = []
        for b in bs:
            try:
                out.append(bytes([b]).decode("cp1252"))
            except UnicodeDecodeError:
                out.append(chr(b))
        return "".join(out)

    def test_operator_matches_reference_and_fixes(self, spark):
        from auto_data_linkage_spark.operators.text import (
            fix_mojibake,
            fix_mojibake_str,
        )

        goods = [
            "don’t — café déjà vu São Paulo €5 “quoted”",
            "αβγ κόσμος",          # Greek leads (CE/CF)
            "pâté and naïve text",  # legit accents — must NOT change
            "plain ascii",
            None,
        ]
        rows = []
        for g in goods:
            if g is None:
                rows.append((None,))
                continue
            bad = self._sloppy_decode(g.encode("utf-8"))
            rows.append((bad,))
        # double-encoded twin of the first string
        dbl = self._sloppy_decode(
            self._sloppy_decode(goods[0].encode("utf-8")).encode("utf-8")
        )
        rows.append((dbl,))
        df = spark.createDataFrame(rows, "text string")
        got = [
            r["text"]
            for r in fix_mojibake(df, "text").collect()
        ]
        want = [fix_mojibake_str(r[0]) for r in rows]
        assert got == want
        # and the repairs actually recover the originals
        assert got[0] == goods[0]
        assert got[1] == goods[1]
        assert got[2] == goods[2]   # untouched (round-trip fails)
        assert got[3] == goods[3]
        assert got[4] is None
        assert got[5] == goods[0]   # double-encoding unwound

    def test_clean_rows_never_enter_the_udf(self, spark):
        from auto_data_linkage_spark.operators.text import fix_mojibake

        df = spark.createDataFrame(
            [("hello world",), ("déjà vu",)], "text string"
        )
        out = fix_mojibake(df, "text", out_col="fixed")
        vals = {r["text"]: r["fixed"] for r in out.collect()}
        assert vals == {"hello world": "hello world", "déjà vu": "déjà vu"}
        # the UDF is gated behind a declarative rlike: the plan keeps a
        # CASE WHEN around the Python eval
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "RLIKE" in plan or "rlike" in plan.lower()


def test_curation_funnel_counts_each_stage(spark):
    """The funnel's five rows count the same planted corpus the
    curate_documents tests use: 6 docs in, one low-quality drop, one
    non-English drop, one exact dup, one near dup — and the final
    stage equals curate_documents' survivor count (keeper-independent)."""
    from auto_data_linkage_spark.operators.pipeline import (
        curate_documents,
        curation_funnel,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "with some other common words that keep the quality score high"
    )
    rows = [
        (1, base),                      # survives (cluster min)
        (2, base),                      # exact dup of 1
        (3, base + " extra tail"),      # near dup of 1
        (4, "el perro y el gato y la casa y los amigos y una palabra mas"),
        (5, "#### $$$$ %%%% 1234 5678 !!!! ???? ****"),  # low quality
        (6, "a completely different english sentence about the weather and "
            "the mountains with many of the usual common words in it"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kwargs = dict(min_quality=0.5, langs=("en",), num_hashes=4, num_bands=4)
    out = curation_funnel(df, **kwargs).collect()
    got = {r["stage"]: r["survivors"] for r in out}
    toks = {r["stage"]: r["survivor_tokens"] for r in out}
    assert got == {
        "input": 6,
        "quality": 5,      # doc 5 dropped
        "language": 4,     # doc 4 dropped
        "exact_dedup": 3,  # doc 2 collapsed into 1
        "near_dedup": 2,   # doc 3 collapsed into 1
    }
    assert got["near_dedup"] == curate_documents(df, **kwargs).count()
    # token mass tracks the whitespace token counts of each stage's
    # survivor set exactly (cumulative, monotone non-increasing)
    n = {i: len(t.split()) for i, t in rows}
    assert toks["input"] == sum(n.values())
    assert toks["quality"] == sum(v for k, v in n.items() if k != 5)
    assert toks["language"] == sum(v for k, v in n.items() if k not in (4, 5))
    assert toks["exact_dedup"] == n[1] + n[3] + n[6]
    assert toks["near_dedup"] == n[1] + n[6]
    idx = [r["stage_idx"] for r in
           curation_funnel(df, **kwargs).orderBy("stage_idx").collect()]
    assert idx == [0, 1, 2, 3, 4]
