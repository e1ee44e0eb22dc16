"""String-similarity comparisons (reference parity: SURVEY §2.9).

The reference (via Splink 3.9.4) compares each attribute column with one of
three distance functions at a tuned threshold, producing a 3-level
comparison per column: exact match / distance-within-threshold / else
(reference: python/arc/autolinker/autolinker.py:345-358, :448-461).

Spark-first mapping:

- ``levenshtein`` — built-in ``F.levenshtein`` (JVM, codegen'd)
- ``jaccard``     — token/char-ngram set Jaccard via ``array_intersect`` /
  ``array_union`` on split tokens — pure built-ins, no UDF
- ``jaro_winkler``— no Spark built-in; Arrow-batched pandas UDF
  (rapidfuzz if importable, pure-Python fallback)

Each comparison renders to a ``when()`` ladder producing an integer gamma:
``-1`` null on either side, ``2`` exact, ``1`` within threshold, ``0`` else.
The ladder is a narrow projection over the candidate-pair DataFrame — it
runs inside the same whole-stage-codegen span as the join that produced the
pairs (except the pandas-UDF jaro-winkler, which is the one Arrow hop).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_LEVEL = -1
EXACT_LEVEL = 2
FUZZY_LEVEL = 1
ELSE_LEVEL = 0
N_LEVELS = 3  # gamma in {0, 1, 2}; -1 excluded from estimation

try:  # optional fast path; not in the base image
    from rapidfuzz.distance import JaroWinkler as _RF_JW  # type: ignore

    def _jw_one(s1: str, s2: str) -> float:
        return _RF_JW.similarity(s1, s2)

except Exception:  # pragma: no cover - exercised when rapidfuzz is absent

    def _jw_one(s1: str, s2: str) -> float:
        return _jaro_winkler_py(s1, s2)


def _jaro_py(s1: str, s2: str) -> float:
    """Jaro similarity, standard definition (public algorithm)."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0 and len2 == 0:
        return 1.0
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(max(len1, len2) // 2 - 1, 0)
    s1_matched = [False] * len1
    s2_matched = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not s2_matched[j] and s2[j] == c1:
                s1_matched[i] = True
                s2_matched[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(len1):
        if s1_matched[i]:
            while not s2_matched[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    transpositions //= 2
    return (
        matches / len1 + matches / len2 + (matches - transpositions) / matches
    ) / 3.0


def _jaro_winkler_py(
    s1: str, s2: str, prefix_weight: float = 0.1, boost_threshold: float = 0.7
) -> float:
    """Jaro–Winkler with the common 0.7 boost threshold and max prefix 4
    (matches DuckDB's ``jaro_winkler_similarity`` semantics)."""
    jaro = _jaro_py(s1, s2)
    if jaro <= boost_threshold:
        return jaro
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1.0 - jaro)


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    """Arrow-batched Jaro–Winkler similarity. The inner loop is per-row
    Python (vectorizing JW in numpy doesn't pay off for short strings) but
    batches transfer via Arrow, not per-row pickling."""
    out = [
        None if (a is None or b is None) else _jw_one(a, b)
        for a, b in zip(left, right)
    ]
    return pd.Series(out, dtype="float64")


def token_jaccard(left: Column, right: Column) -> Column:
    """Set Jaccard similarity of whitespace tokens, using only built-in
    array functions (no UDF). For character n-grams use :func:`ngram_jaccard`."""
    lt = F.array_distinct(F.split(left, r"\s+"))
    rt = F.array_distinct(F.split(right, r"\s+"))
    inter = F.size(F.array_intersect(lt, rt))
    union = F.size(F.array_union(lt, rt))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def char_ngram_set(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of a string column, built-ins only."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1))),
            lambda i: c.substr(i, F.lit(n)),
        )
    )


def ngram_jaccard(left: Column, right: Column, n: int = 3) -> Column:
    """Character n-gram Jaccard similarity — pure built-ins."""
    lg = char_ngram_set(left, n)
    rg = char_ngram_set(right, n)
    inter = F.size(F.array_intersect(lg, rg))
    union = F.size(F.array_union(lg, rg))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# Soundex-style letter→code map (A..Z): vowels/H/W/Y → 0 (separators),
# consonant classes 1-6 as in classic soundex.
PHONETIC_MAP = "01230120022455012623010202"


def phonetic_key(col: Column | str) -> Column:
    """Soundex-style phonetic blocking key, pure built-in expressions.

    Spec (deliberately backreference-free so the identical operation
    chain runs on engines whose regex lacks ``\\1``, e.g. RE2):

    1. uppercase, strip non-letters;
    2. map every letter to its class digit via :data:`PHONETIC_MAP`;
    3. collapse runs of each digit (seven chained ``d+ → d`` replaces —
       equivalent to the classic adjacent-duplicate collapse);
    4. drop the separator zeros;
    5. key = first letter + next three class digits, zero-padded.

    This is classic soundex minus the H/W bridging rule (two letters of
    the same class separated only by H/W still code twice here). As a
    BLOCKING key that difference only splits a handful of candidate
    blocks; it never corrupts scoring, which happens on the raw strings.
    Empty/non-alphabetic input yields the empty string key.
    """
    c = F.col(col) if isinstance(col, str) else col
    letters = F.regexp_replace(F.upper(c), "[^A-Z]", "")
    coded = F.translate(letters, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", PHONETIC_MAP)
    for d in "0123456":
        coded = F.regexp_replace(coded, f"{d}+", d)
    digits = F.replace(coded, F.lit("0"), F.lit(""))
    key = F.concat(
        F.substring(letters, 1, 1), F.rpad(F.substring(digits, 2, 3), 3, "0")
    )
    # NULL propagates (so equi-join blocking drops unkeyed rows instead
    # of clumping them into one mega-block); non-alphabetic input → ''.
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(F.length(letters) > 0, key)
        .otherwise(F.lit(""))
    )


def phonetic_key_sql(expr: str) -> str:
    """DuckDB twin of :func:`phonetic_key` — same operation chain, kept
    in lockstep for the catalog oracles."""
    letters = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    coded = (
        f"translate({letters}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
        f"'{PHONETIC_MAP}')"
    )
    for d in "0123456":
        coded = f"regexp_replace({coded}, '{d}+', '{d}', 'g')"
    digits = f"replace({coded}, '0', '')"
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL "
        f"WHEN length({letters}) > 0 THEN "
        f"concat(substr({letters}, 1, 1), rpad(substr({digits}, 2, 3), 3, '0')) "
        f"ELSE '' END"
    )


@dataclass(frozen=True)
class Comparison:
    """One attribute column's 3-level comparison (exact / fuzzy / else).

    ``method`` ∈ {"levenshtein", "jaccard", "jaro_winkler", "exact"};
    thresholds follow the reference's hyperopt space: levenshtein integer
    1-5 (distance ≤ t), jaccard 0.7-0.99 (similarity ≥ t), jaro_winkler
    0.7-0.99 (similarity ≥ t) — autolinker.py:351-353.

    ``tf_adjustment`` enables term-frequency adjustment of the exact-match
    Bayes factor (Splink 3.x semantics, public): agreeing on a RARE value
    ("zyzmalski") is stronger evidence than agreeing on a common one
    ("smith"), so the exact-level u is replaced per-pair by the value's
    observed relative frequency.
    """

    column: str
    method: str = "levenshtein"
    threshold: float = 2.0
    tf_adjustment: bool = False

    @property
    def gamma_name(self) -> str:
        return f"gamma_{self.column}"

    def fuzzy_predicate(self, left: Column, right: Column) -> Column | None:
        if self.method == "levenshtein":
            return F.levenshtein(left, right) <= int(self.threshold)
        if self.method == "jaccard":
            return token_jaccard(left, right) >= float(self.threshold)
        if self.method == "jaro_winkler":
            return jaro_winkler_udf(left, right) >= float(self.threshold)
        if self.method == "exact":
            return None
        raise ValueError(f"unknown comparison method {self.method!r}")

    def gamma_expr(self, left_suffix: str = "_l", right_suffix: str = "_r") -> Column:
        """``when()`` ladder producing the gamma level for this column."""
        left = F.col(f"{self.column}{left_suffix}")
        right = F.col(f"{self.column}{right_suffix}")
        ladder = F.when(left.isNull() | right.isNull(), F.lit(NULL_LEVEL)).when(
            left == right, F.lit(EXACT_LEVEL)
        )
        fuzzy = self.fuzzy_predicate(left, right)
        if fuzzy is not None:
            ladder = ladder.when(fuzzy, F.lit(FUZZY_LEVEL))
        return ladder.otherwise(F.lit(ELSE_LEVEL)).alias(self.gamma_name)

    @property
    def n_levels(self) -> int:
        return N_LEVELS if self.method != "exact" else 2
