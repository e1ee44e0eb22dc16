"""BPE tokenizer: training determinism, encode equivalence to an
independent reference implementation, reconstruction invariant."""

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators import bpe as B


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "low low low low low"),
        (2, "lower lower newest newest"),
        (3, "newest newest newest newest"),
        (4, "widest widest widest"),
        (5, "low lower newest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def ref_apply_merges(word: str, merges) -> list[str]:
    """Independent reference: apply merges in learned order, each to
    ALL occurrences (subword-nmt style) — a different algorithm shape
    than encode_word's greedy min-rank loop."""
    sym = list(word[:-1]) + [word[-1] + B.END]
    for a, b in merges:
        out = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_train_deterministic_and_sensible(spark, corpus):
    m1 = B.train_bpe(corpus, num_merges=10, min_freq=1)
    m2 = B.train_bpe(corpus, num_merges=10, min_freq=1)
    assert m1 == m2
    # "newest" (7x) dominates: 'e','s' and 's','t</w>' style merges
    # must appear among the first learned pairs
    flat = ["".join(p) for p in m1]
    assert any("es" in s or "st" + B.END in s for s in flat[:4])


def test_encode_matches_reference_implementation(spark, corpus):
    merges = B.train_bpe(corpus, num_merges=30, min_freq=1)
    ranks = {p: i for i, p in enumerate(merges)}
    words = [r.word for r in B.word_frequencies(corpus).collect()]
    for w in words:
        assert B.encode_word(w, ranks) == ref_apply_merges(w, merges), w


def test_encode_dataframe_and_reconstruction(spark, corpus):
    merges = B.train_bpe(corpus, num_merges=20, min_freq=1)
    out = B.bpe_encode(corpus, merges).collect()
    for r in out:
        recon = (
            "".join(r.bpe_tokens).replace(B.END, " ").strip()
        )
        assert recon == " ".join(r.text.lower().split())


def test_encode_unseen_and_null(spark):
    df = spark.createDataFrame(
        [(1, "totally unseen zz"), (2, None)], "doc_id long, text string"
    )
    merges = [("l", "o")]
    rows = {r.doc_id: r.bpe_tokens for r in B.bpe_encode(df, merges).collect()}
    assert rows[2] == []
    # unseen words fall back to characters (+ END on the last)
    assert rows[1][:2] == ["t", "o"]
    assert rows[1][-1] == "z" + B.END


def test_documents_table_roundtrip(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    merges = B.train_bpe(docs, num_merges=50)
    assert len(merges) > 10
    enc = B.bpe_encode(docs, merges)
    row = enc.select(
        F.sum(F.size("bpe_tokens")).alias("bpe"),
        F.sum(F.size(F.split(F.lower("text"), r"\s+"))).alias("words"),
    ).collect()[0]
    # compression: fewer than chars, at least as many as words
    assert row.bpe >= row.words


def test_vocab_and_id_roundtrip(spark, corpus):
    merges = B.train_bpe(corpus, num_merges=20, min_freq=1)
    vocab = B.bpe_vocab(corpus, merges)
    assert vocab[0] == B.UNK
    assert vocab == B.bpe_vocab(corpus, merges)  # deterministic
    toks = {r.doc_id: r.bpe_tokens for r in B.bpe_encode(corpus, merges).collect()}
    ids = {
        r.doc_id: r.token_ids
        for r in B.bpe_encode_ids(corpus, merges, vocab).collect()
    }
    for d, tok_list in toks.items():
        assert [vocab[i] for i in ids[d]] == tok_list  # ids decode to tokens
        assert 0 not in ids[d]  # in-corpus text never hits <unk>


def test_ids_unknown_maps_to_unk(spark, corpus):
    merges = B.train_bpe(corpus, num_merges=5, min_freq=1)
    vocab = B.bpe_vocab(corpus, merges)
    other = spark.createDataFrame([(1, "Ωmega")], "doc_id long, text string")
    row = B.bpe_encode_ids(other, merges, vocab).collect()[0]
    assert row.token_ids[0] == 0  # 'ω' not in the training alphabet


# ------------------------------------------------- property (hypothesis)

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcdef", min_size=1, max_size=12)


@settings(max_examples=30, deadline=None)
@given(
    corpus_words=st.lists(_word, min_size=3, max_size=30),
    probe_words=st.lists(_word, min_size=1, max_size=10),
)
def test_encode_equivalence_property(spark, corpus_words, probe_words):
    """For any TRAINED merge list (training guarantees merges that
    create a symbol precede merges consuming it), greedy min-rank
    encoding equals apply-in-learned-order encoding — on seen AND
    unseen words — and always reconstructs the word."""
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(corpus_words)], "doc_id long, text string"
    )
    merges = B.train_bpe(df, num_merges=25, min_freq=1)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in corpus_words + probe_words:
        got = B.encode_word(w, ranks)
        assert got == ref_apply_merges(w, merges), (w, merges)
        assert "".join(got) == w + B.END


def test_unicode_whitespace_train_encode_agreement(spark):
    """Training splits JVM-side with Java \\s+ (ASCII whitespace only);
    the encode UDF must split identically. A document with NBSP /
    NEL-joined words must hash to the SAME word list on both sides —
    Python str.split() would split them apart and encode words training
    never counted."""
    # Java \s does NOT split NBSP ( ) or NEL (\x85); Python
    # str.split() splits both
    nbsp_doc = "alpha beta alpha beta gamma\x85delta"
    rows = [(1, nbsp_doc), (2, "alpha beta plain words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # 1. split_words mirrors tokens() exactly on these corpora
    spark_words = sorted(
        r.w
        for r in df.select(
            F.explode(B.tokens(F.col("text"))).alias("w")
        ).collect()
    )
    py_words = sorted(
        w for (_, t) in rows for w in B.split_words(t)
    )
    assert spark_words == py_words
    assert "alpha beta" in py_words  # NBSP word stays whole

    # 2. the full train->encode path sees only trained words, so the
    # reconstruction invariant holds on the non-ASCII corpus
    merges = B.train_bpe(df, num_merges=20, min_freq=1)
    enc = B.bpe_encode(df, merges)
    got = enc.select(
        "doc_id",
        F.trim(
            F.regexp_replace(F.array_join("bpe_tokens", ""), B.END, " ")
        ).alias("recon"),
        F.trim(
            F.regexp_replace(F.lower("text"), r"\s+", " ")
        ).alias("norm"),
    ).collect()
    for r in got:
        assert r.recon == r.norm, r.doc_id


def test_tokenizer_json_round_trip(spark, corpus, tmp_path):
    """Export the trained artifact in the standard tokenizer-JSON shape,
    re-import it, and require id-stream equality — the interop contract
    a downstream training stack depends on."""
    import json

    merges = B.train_bpe(corpus, num_merges=25, min_freq=1)
    vocab = B.bpe_vocab(corpus, merges)
    path = str(tmp_path / "tokenizer.json")
    doc = B.export_tokenizer_json(merges, vocab, path)

    # standard shape: model.type/vocab/merges + the sentinel declared
    on_disk = json.load(open(path))
    assert on_disk == json.loads(json.dumps(doc))
    assert on_disk["model"]["type"] == "BPE"
    assert on_disk["model"]["unk_token"] == B.UNK
    assert on_disk["model"]["end_of_word_suffix"] == B.END
    assert on_disk["model"]["vocab"][B.UNK] == 0
    assert all(isinstance(m, str) and " " in m
               for m in on_disk["model"]["merges"])

    m2, v2 = B.load_tokenizer_json(path)
    assert m2 == merges and v2 == vocab

    a = B.bpe_encode_ids(corpus, merges, vocab).select("doc_id", "token_ids")
    b = B.bpe_encode_ids(corpus, m2, v2).select("doc_id", "token_ids")
    got_a = {r.doc_id: r.token_ids for r in a.collect()}
    got_b = {r.doc_id: r.token_ids for r in b.collect()}
    assert got_a == got_b and all(len(v) > 0 for v in got_a.values())


def test_tokenizer_json_rejects_non_bpe(tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a BPE"):
        B.load_tokenizer_json({"model": {"type": "WordPiece"}})


def test_export_special_tokens_appended_and_loadable(tmp_path):
    from auto_data_linkage_spark.operators.bpe import (
        export_tokenizer_json,
        load_tokenizer_json,
        special_token_ids,
    )

    vocab = ["a", "b", "ab</w>"]
    merges = [("a", "b</w>")]
    path = str(tmp_path / "tok.json")
    doc = export_tokenizer_json(
        merges, vocab, path, special_tokens=("<|endoftext|>", "<|pad|>")
    )
    # base ids unchanged; specials appended in order
    assert doc["model"]["vocab"]["a"] == 0
    assert doc["model"]["vocab"]["<|endoftext|>"] == 3
    assert doc["model"]["vocab"]["<|pad|>"] == 4
    assert special_token_ids(path) == {"<|endoftext|>": 3, "<|pad|>": 4}
    merges2, vocab2 = load_tokenizer_json(path)
    assert vocab2[:3] == vocab and len(vocab2) == 5
    assert merges2 == merges
    # no-specials artifact: empty map, same base ids
    doc0 = export_tokenizer_json(merges, vocab)
    assert special_token_ids(doc0) == {}
    assert doc0["model"]["vocab"] == {v: i for i, v in enumerate(vocab)}
