"""Byte-pair-encoding tokenizer: distributed-corpus training, Arrow-
batched encoding.

The reference has no tokenizer (its string ops stop at levenshtein /
jaro-winkler, SURVEY §2.9); this is the LLM-pipeline token-accounting
step (`text.bpe_token_count` is the zero-UDF regex *approximation*;
this module is the real subword algorithm, Sennrich et al. 2016).

Spark-first split of the work:

- **Training** scans the corpus ONCE, distributed, into the word-
  frequency table (`word_frequencies` — explode + hash agg, map-side
  partials). BPE training itself then runs driver-side over that
  table, which is the *standard* formulation of the algorithm (merges
  are learned from word→count, not from the raw corpus) — the driver
  transfer is bounded by `max_words` (top-N by frequency), not corpus
  size. Merge selection uses an incrementally-maintained pair-count
  index, so each of the `num_merges` steps touches only words that
  contain the merged pair.
- **Encoding** is per-row iterative (greedy lowest-rank merge until
  fixpoint) — genuinely not expressible in Spark's built-ins, so it is
  an Arrow-batched pandas UDF with the merge table in the closure
  (broadcast once per executor) and a per-batch word cache: each
  DISTINCT word is encoded once per batch regardless of its frequency.

Determinism: ties in merge selection break lexicographically, so the
learned merge list is a pure function of the word-frequency table.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from auto_data_linkage_spark.operators.text import tokens

__all__ = [
    "END",
    "split_words",
    "word_frequencies",
    "train_bpe",
    "bpe_encode",
    "encode_word",
    "UNK",
    "bpe_vocab",
    "bpe_encode_ids",
    "export_tokenizer_json",
    "load_tokenizer_json",
]

END = "</w>"  # end-of-word sentinel: lets merges distinguish suffixes

# Training tokenizes JVM-side with text.tokens() — Java regex ``\s+``,
# which is ASCII whitespace only ([ \t\n\x0B\f\r], no NBSP/\x85/…).
# Python ``str.split()`` splits on UNICODE whitespace, so the encode
# UDFs must NOT use it: they would see words training never counted and
# flip the reconstruction invariant on non-ASCII corpora. This regex is
# the exact Python mirror of Java ``\s``; both sides lowercase (F.lower
# and str.lower agree on the simple case mappings these tokens hit —
# locale-special forms like Turkish dotted-I are out of scope and
# documented here rather than handled).
import re as _re

_JAVA_WS = _re.compile(r"[ \t\n\x0b\f\r]+")


def split_words(text: str, lowercase: bool = True) -> list[str]:
    """Python-side word split matching :func:`text.tokens` exactly:
    Java-``\\s`` whitespace classes only, lowercased, empties dropped."""
    t = text.lower() if lowercase else text
    return [w for w in _JAVA_WS.split(t) if w]


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed word-frequency table ``(word, freq)`` — the one
    corpus-sized pass of BPE training. Lowercased whitespace words
    (the same normalization :func:`bpe_encode` applies)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _pair_stats(words: dict[tuple[str, ...], int]):
    """pair -> total freq, and pair -> set of words containing it."""
    counts: dict[tuple[str, str], int] = defaultdict(int)
    index: dict[tuple[str, str], set] = defaultdict(set)
    for w, f in words.items():
        for a, b in zip(w, w[1:]):
            counts[(a, b)] += f
            index[(a, b)].add(w)
    return counts, index

def _merge_word(w: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out, i, merged = [], 0, pair[0] + pair[1]
    while i < len(w):
        if i + 1 < len(w) and w[i] == pair[0] and w[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(w[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 200,
    min_freq: int = 2,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Driver transfer
    is the top-``max_words`` word-frequency rows (deterministic order:
    freq desc, word asc), never the corpus."""
    wf = (
        word_frequencies(df, text_col)
        .where(F.col("freq") >= min_freq)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    words: dict[tuple[str, ...], int] = {}
    for r in wf:
        sym = tuple(r.word[:-1]) + (r.word[-1] + END,)
        words[sym] = words.get(sym, 0) + r.freq

    counts, index = _pair_stats(words)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not counts:
            break
        # deterministic: max freq, ties broken lexicographically
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_freq:
            break
        merges.append(best)
        # re-tokenize only words containing the merged pair
        for w in list(index[best]):
            f = words.pop(w)
            for a, b in zip(w, w[1:]):
                counts[(a, b)] -= f
                if counts[(a, b)] <= 0:
                    counts.pop((a, b), None)
                index[(a, b)].discard(w)
            nw = _merge_word(w, best)
            words[nw] = words.get(nw, 0) + f
            for a, b in zip(nw, nw[1:]):
                counts[(a, b)] += f
                index[(a, b)].add(nw)
        counts.pop(best, None)
        index.pop(best, None)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the present pair
    with the lowest training rank until none remains."""
    sym = list(word[:-1]) + [word[-1] + END] if word else []
    while len(sym) > 1:
        pairs = [(ranks.get((a, b)), i) for i, (a, b) in enumerate(zip(sym, sym[1:]))]
        ranked = [(r, i) for r, i in pairs if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        sym[i : i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    *,
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Append ``out_col: array<string>`` — the BPE token stream of the
    whitespace-split, optionally lowercased text. Arrow-batched; each
    distinct word is encoded once per batch via a cache."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def enc(texts):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def run(text):
            if text is None:
                return []
            out: list[str] = []
            for w in split_words(text, lowercase):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        return pd.Series([run(t) for t in texts])

    return df.withColumn(out_col, enc(F.col(text_col)))


UNK = "<unk>"


def bpe_vocab(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> list[str]:
    """Deterministic vocabulary for a merge list: ``[<unk>] + sorted
    corpus alphabet (chars and char</w> variants, one distributed
    distinct pass) + merge products in rank order``. Index IS the token
    id — stable across engines and re-runs for the same corpus+merges."""
    alpha_rows = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .select(F.explode(F.split("w", "")).alias("ch"))
        .where(F.col("ch") != "")
        .distinct()
        .collect()
    )
    alphabet = sorted({r.ch for r in alpha_rows} | {r.ch + END for r in alpha_rows})
    products = [a + b for a, b in merges]
    seen = set(alphabet)
    out = [UNK] + alphabet
    for p in products:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


def bpe_encode_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: list[str],
    text_col: str = "text",
    *,
    out_col: str = "token_ids",
) -> DataFrame:
    """Append ``out_col: array<int>`` — the model-ready id stream.
    Same Arrow-batched greedy encode as :func:`bpe_encode`, mapping
    each token through the vocab in the closure (symbols outside the
    vocab — e.g. characters unseen at vocab-build time — map to id 0,
    ``<unk>``)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    ids = {tok: i for i, tok in enumerate(vocab)}

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(texts):
        import pandas as pd

        cache: dict[str, list[int]] = {}

        def run(text):
            if text is None:
                return []
            out: list[int] = []
            for w in split_words(text):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = [
                        ids.get(t, 0) for t in encode_word(w, ranks)
                    ]
                out.extend(got)
            return out

        return pd.Series([run(t) for t in texts])

    return df.withColumn(out_col, enc(F.col(text_col)))


def export_tokenizer_json(
    merges: list[tuple[str, str]],
    vocab: list[str],
    path: str | None = None,
    *,
    special_tokens: tuple[str, ...] = (),
) -> dict:
    """Export vocab + merges in the standard tokenizer-JSON shape
    (the ``tokenizers``-library file format: ``model.type = "BPE"``,
    ``model.vocab`` token→id, ``model.merges`` "a b" strings in rank
    order, ``unk_token``), so downstream training stacks consume the
    trained artifact directly. The repo's ``</w>`` end-of-word sentinel
    is declared as ``end_of_word_suffix`` — the field the reference
    format defines for exactly this convention.

    ``special_tokens`` (e.g. ``("<|endoftext|>",)``) append to the END
    of the vocabulary — base-token ids are unchanged, so artifacts
    with and without specials encode ordinary text identically — and
    are recorded in the format's ``added_tokens`` list, the field
    training stacks read for BOS/EOS/PAD ids. Writes to ``path`` when
    given; returns the dict either way."""
    full = list(vocab) + [t for t in special_tokens if t not in vocab]
    doc = {
        "version": "1.0",
        "model": {
            "type": "BPE",
            "unk_token": UNK,
            "end_of_word_suffix": END,
            "vocab": {tok: i for i, tok in enumerate(full)},
            "merges": [f"{a} {b}" for a, b in merges],
        },
        "added_tokens": [
            {"id": full.index(t), "content": t, "special": True}
            for t in special_tokens
        ],
    }
    if path is not None:
        import json

        with open(path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
    return doc


def special_token_ids(src: str | dict) -> dict[str, int]:
    """``content -> id`` for the artifact's ``added_tokens`` (empty for
    artifacts exported without specials)."""
    if isinstance(src, str):
        import json

        with open(src) as f:
            src = json.load(f)
    return {t["content"]: t["id"] for t in src.get("added_tokens", [])}


def load_tokenizer_json(src: str | dict) -> tuple[list[tuple[str, str]], list[str]]:
    """Inverse of :func:`export_tokenizer_json`: accept a path or a
    parsed dict, return ``(merges, vocab)`` with vocab order restored
    from the token→id map. Round-trip guarantee (tested):
    ``bpe_encode_ids`` with the loaded artifact is identical to the
    freshly-trained one."""
    if isinstance(src, str):
        import json

        with open(src) as f:
            src = json.load(f)
    model = src["model"]
    if model.get("type") != "BPE":
        raise ValueError(f"not a BPE tokenizer artifact: {model.get('type')}")
    merges = [tuple(m.split(" ", 1)) for m in model["merges"]]
    vocab_map = model["vocab"]
    vocab = [t for t, _ in sorted(vocab_map.items(), key=lambda kv: kv[1])]
    return merges, vocab
