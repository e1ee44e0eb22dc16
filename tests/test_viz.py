"""HTML dashboard sinks (S6): bounded sampling, well-formed output."""

from pyspark.sql import functions as F

from auto_data_linkage_spark.viz import cluster_viewer, comparison_viewer


def test_cluster_viewer_samples_by_size_band(spark, tmp_path):
    # 40 clusters of size 2, 8 of size 4, 2 of size 12, plus singletons
    rows = []
    uid = 0
    for c in range(40):
        for _ in range(2):
            rows.append((f"u{uid}", f"pair{c}", f"v{uid}")); uid += 1
    for c in range(8):
        for _ in range(4):
            rows.append((f"u{uid}", f"mid{c}", f"v{uid}")); uid += 1
    for c in range(2):
        for _ in range(12):
            rows.append((f"u{uid}", f"big{c}", f"v{uid}")); uid += 1
    for _ in range(30):
        rows.append((f"u{uid}", f"s{uid}", f"v{uid}")); uid += 1
    df = spark.createDataFrame(rows, "unique_id string, cluster_id string, attr string")

    out = cluster_viewer(
        df, str(tmp_path / "clusters.html"), clusters_per_band=3,
        max_members_per_cluster=5,
    )
    html = open(out, encoding="utf-8").read()
    assert "<html>" in html and "Cluster viewer" in html
    # every band section rendered, bounded sampling honoured
    for band in ("2–2", "3–5", "6–10", "11+"):
        assert f"size {band}" in html
    assert html.count("pair") <= 3 * 2 + 40  # ≤3 sampled size-2 clusters (+ids in text)
    # big clusters truncated to 5 members: a big id appears ≤ 5+1 times
    big_mentions = max(html.count("big0"), html.count("big1"))
    assert big_mentions <= 6
    # singletons never shown
    assert "s" + str(uid - 1) not in html


def test_comparison_viewer_histogram_and_tails(spark, tmp_path):
    preds = spark.createDataFrame(
        [(f"a{i}", f"b{i}", i / 100.0) for i in range(100)],
        "unique_id_l string, unique_id_r string, match_probability double",
    )
    out = comparison_viewer(
        preds, str(tmp_path / "scv.html"), n_buckets=10, n_examples=5
    )
    html = open(out, encoding="utf-8").read()
    assert "match-probability distribution" in html
    assert "0.90–1.00" in html and "0.00–0.10" in html
    # tails present: highest pair a99 and lowest pair a0
    assert "a99" in html and "a0" in html
    assert "Strongest pairs" in html and "Weakest pairs" in html


def test_autolinker_viewer_facade(spark, people, tmp_path):
    from auto_data_linkage_spark.autolink import AutoLinker

    linker = AutoLinker(max_evals=1, comparison_size_limit=100_000, random_seed=3)
    linker.auto_link(people)
    p1 = linker.cluster_viewer(str(tmp_path / "cv.html"), threshold=0.8)
    p2 = linker.comparison_viewer(str(tmp_path / "scv.html"))
    assert open(p1, encoding="utf-8").read().startswith("<!DOCTYPE html>")
    assert open(p2, encoding="utf-8").read().startswith("<!DOCTYPE html>")


def test_comparison_viewer_null_probabilities_rendered(spark, tmp_path):
    preds = spark.createDataFrame(
        [("a", "b", 0.9), ("c", "d", None), ("e", "f", None)],
        "unique_id_l string, unique_id_r string, match_probability double",
    )
    out = comparison_viewer(preds, str(tmp_path / "n.html"), n_buckets=4)
    html = open(out, encoding="utf-8").read()
    assert "<td>NULL</td><td>2</td>" in html


def test_comparison_viewer_weakest_pairs_skip_nulls(spark, tmp_path):
    """NULL probabilities must not fill the weakest-pairs table (Spark
    sorts NULL first ascending; the viewer uses asc_nulls_last and the
    histogram buckets NULLs separately)."""
    rows = [(f"n{i}", f"m{i}", None) for i in range(5)] + [
        (f"a{i}", f"b{i}", 0.1 + i / 100.0) for i in range(5)
    ]
    preds = spark.createDataFrame(
        rows, "unique_id_l string, unique_id_r string, match_probability double"
    )
    out = comparison_viewer(
        preds, str(tmp_path / "w.html"), n_buckets=4, n_examples=3
    )
    html = open(out, encoding="utf-8").read()
    weakest = html.split("Weakest pairs")[1]
    assert "a0" in weakest and "a1" in weakest and "a2" in weakest
    assert "n0" not in weakest
