import duckdb
import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.compare import (
    Comparison,
    _jaro_winkler_py,
    jaro_winkler_udf,
    ngram_jaccard,
    token_jaccard,
)


def test_jaro_winkler_pure_python_known_values():
    # classic textbook values
    assert _jaro_winkler_py("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert _jaro_winkler_py("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-2)
    assert _jaro_winkler_py("abc", "abc") == 1.0
    assert _jaro_winkler_py("abc", "xyz") == 0.0
    assert _jaro_winkler_py("", "") == 1.0


def test_jaro_winkler_matches_duckdb():
    """DuckDB ships jaro_winkler_similarity — cross-validate our UDF against
    it on a spread of realistic strings (same 0.7 boost threshold)."""
    pairs = [
        ("martha", "marhta"), ("dwayne", "duane"), ("smith", "smyth"),
        ("crate", "trace"), ("lachlan", "lachlam"), ("", "abc"),
        ("jellyfish", "smellyfish"), ("a", "a"), ("ab", "ba"),
    ]
    con = duckdb.connect()
    for a, b in pairs:
        expected = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert _jaro_winkler_py(a, b) == pytest.approx(expected, abs=1e-9), (a, b)


def test_jaro_winkler_udf(spark):
    df = spark.createDataFrame(
        [("martha", "marhta"), (None, "x")], "a string, b string"
    )
    rows = df.select(jaro_winkler_udf("a", "b").alias("jw")).collect()
    assert rows[0]["jw"] == pytest.approx(0.9611, abs=1e-4)
    assert rows[1]["jw"] is None


def test_token_jaccard(spark):
    df = spark.createDataFrame([("big red dog", "big blue dog")], "a string, b string")
    val = df.select(token_jaccard(F.col("a"), F.col("b")).alias("j")).collect()[0]["j"]
    assert val == pytest.approx(2 / 4)


def test_ngram_jaccard_identical_and_disjoint(spark):
    df = spark.createDataFrame([("abcd", "abcd"), ("abcd", "wxyz")], "a string, b string")
    vals = [
        r["j"]
        for r in df.select(ngram_jaccard(F.col("a"), F.col("b"), 2).alias("j")).collect()
    ]
    assert vals[0] == pytest.approx(1.0)
    assert vals[1] == pytest.approx(0.0)


def test_gamma_levels(spark):
    df = spark.createDataFrame(
        [
            ("smith", "smith"),   # exact -> 2
            ("smith", "smyth"),   # lev 1 -> 1
            ("smith", "jones"),   # far -> 0
            (None, "smith"),      # null -> -1
        ],
        "name_l string, name_r string",
    )
    comp = Comparison("name", "levenshtein", 2)
    got = [r[comp.gamma_name] for r in df.select(comp.gamma_expr()).collect()]
    assert got == [2, 1, 0, -1]


def test_gamma_exact_method(spark):
    df = spark.createDataFrame([("a", "a"), ("a", "b")], "c_l string, c_r string")
    comp = Comparison("c", "exact", 0)
    got = [r[comp.gamma_name] for r in df.select(comp.gamma_expr()).collect()]
    assert got == [2, 0]


def test_phonetic_key_known_values(spark):
    from auto_data_linkage_spark.compare import phonetic_key

    cases = [
        ("Robert", "R163"),
        ("Rupert", "R163"),      # classic soundex collision
        ("Ashcraft", "A261"),    # no H/W bridge in this spec (vs A226/A261 variants)
        ("honeyman", "H550"),
        ("", ""),
        ("123", ""),             # non-alphabetic -> empty key
        (None, None),            # NULL propagates (drops out of equi-joins)
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = [r.k for r in df.select(phonetic_key("s").alias("k")).collect()]
    assert got == [want for _, want in cases]


def test_phonetic_key_sql_twin_parity(spark):
    import duckdb

    from auto_data_linkage_spark.compare import phonetic_key, phonetic_key_sql

    samples = [
        "Robert", "Tymczak", "Pfister", "Washington DC", "goldenrod",
        "lavender", "x", "LLAMA", "aeiou", "",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    sp = [r.k for r in df.select(phonetic_key("s").alias("k")).collect()]
    con = duckdb.connect()
    dk = [
        con.execute("SELECT " + phonetic_key_sql(f"'{s}'")).fetchone()[0]
        for s in samples
    ]
    assert sp == dk
