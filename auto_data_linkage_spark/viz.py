"""HTML dashboard sinks (SURVEY §2.1 S6; reference
autolinker.py:1097-1140 ``cluster_viewer`` / ``comparison_viewer``,
which delegate to Splink's dashboard writers).

Self-contained static HTML — no JS dependencies, no external assets —
generated from BOUNDED Spark-side samples so the driver never collects
more than a few hundred rows regardless of data size:

- :func:`cluster_viewer` samples clusters **by size band** (the
  reference's ``sampling_method="by_cluster_size"``): odd cluster shapes
  concentrate in the large bands, so stratified sampling surfaces likely
  false-positive merges that uniform sampling would miss.
- :func:`comparison_viewer` renders the match-probability histogram and
  the highest/lowest-scoring pairs around the clustering threshold —
  the pairs a reviewer should eyeball first.
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ font-family: system-ui, sans-serif; margin: 2rem; color: #222; }}
h1 {{ font-size: 1.4rem; }} h2 {{ font-size: 1.1rem; margin-top: 1.5rem; }}
table {{ border-collapse: collapse; margin: .5rem 0; }}
th, td {{ border: 1px solid #ccc; padding: .25rem .6rem; font-size: .85rem; }}
th {{ background: #f2f2f2; text-align: left; }}
.bar {{ background: #4a7aa7; height: .8rem; display: inline-block; }}
caption {{ caption-side: top; text-align: left; font-weight: 600; padding: .25rem 0; }}
</style></head><body><h1>{title}</h1>{body}</body></html>
"""


def _table(rows: list[dict], caption: str) -> str:
    if not rows:
        return f"<p><em>{_html.escape(caption)}: no rows</em></p>"
    cols = list(rows[0].keys())
    head = "".join(f"<th>{_html.escape(str(c))}</th>" for c in cols)
    body = "".join(
        "<tr>"
        + "".join(f"<td>{_html.escape(str(r.get(c, '')))}</td>" for c in cols)
        + "</tr>"
        for r in rows
    )
    return (
        f"<table><caption>{_html.escape(caption)}</caption>"
        f"<tr>{head}</tr>{body}</table>"
    )


_SIZE_BANDS = ((2, 2), (3, 5), (6, 10), (11, None))


def cluster_viewer(
    clusters: DataFrame,
    path: str,
    *,
    cluster_col: str = "cluster_id",
    unique_id: str = "unique_id",
    clusters_per_band: int = 5,
    max_members_per_cluster: int = 20,
) -> str:
    """Write a cluster-inspection dashboard to ``path`` and return the
    path. Samples ``clusters_per_band`` clusters from each size band
    (2, 3–5, 6–10, 11+) and lists their member records.

    Driver transfer is bounded by construction:
    #bands × clusters_per_band × max_members_per_cluster rows.
    """
    sizes = clusters.groupBy(cluster_col).agg(F.count("*").alias("__n")).where(
        F.col("__n") >= 2
    )
    sections = []
    total = clusters.count()
    multi = sizes.count()
    for lo, hi in _SIZE_BANDS:
        band = sizes.where(F.col("__n") >= lo)
        label = f"{lo}+" if hi is None else f"{lo}–{hi}"
        if hi is not None:
            band = band.where(F.col("__n") <= hi)
        # deterministic "sample": smallest hash first — stable across runs
        picked = (
            band.withColumn("__h", F.xxhash64(F.col(cluster_col)))
            .orderBy("__h")
            .limit(clusters_per_band)
            .drop("__h")
        )
        members = (
            clusters.join(F.broadcast(picked), cluster_col)
            .withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy(cluster_col).orderBy(unique_id)
                ),
            )
            .where(F.col("__rn") <= max_members_per_cluster)
            .drop("__rn", "__n")
        )
        rows = [r.asDict() for r in members.collect()]
        rows.sort(key=lambda r: (str(r[cluster_col]), str(r[unique_id])))
        sections.append(
            f"<h2>Cluster size {label}</h2>"
            + _table(rows, f"sampled clusters of size {label}")
        )
    body = (
        f"<p>{total} records, {multi} multi-record clusters. Odd shapes in "
        "the large bands are the usual sign of over-merging (false "
        "positives); singletons that should have matched indicate missed "
        "links.</p>" + "".join(sections)
    )
    out = _PAGE.format(title="Cluster viewer", body=body)
    with open(path, "w", encoding="utf-8") as f:
        f.write(out)
    return path


def comparison_viewer(
    predictions: DataFrame,
    path: str,
    *,
    probability_col: str = "match_probability",
    n_buckets: int = 20,
    n_examples: int = 15,
) -> str:
    """Write a comparison-inspection dashboard to ``path`` and return the
    path: the score histogram (one groupBy — ``n_buckets`` rows) plus the
    strongest and weakest scoring pairs (two bounded top-k fetches)."""
    # least() IGNORES nulls (least(3, NULL) = 3), so a bare least/floor
    # bucket silently files NULL probabilities into the top bucket —
    # keep them NULL explicitly and render them as their own row
    bucket = F.when(
        F.col(probability_col).isNull(), F.lit(None).cast("int")
    ).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor(F.col(probability_col) * n_buckets).cast("int"),
        )
    )
    hist = {
        r["b"]: r["n"]
        for r in predictions.groupBy(bucket.alias("b"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # NULL probabilities (e.g. outer-joined enrichments) land under key
    # None — rendered as their own row, never silently folded into the
    # bar scaling of the numeric buckets
    n_null = hist.pop(None, 0)
    peak = max(hist.values(), default=1)
    bars = []
    for b in range(n_buckets):
        n = hist.get(b, 0)
        width = int(300 * n / max(peak, 1))
        bars.append(
            f"<tr><td>{b / n_buckets:.2f}–{(b + 1) / n_buckets:.2f}</td>"
            f"<td>{n}</td>"
            f'<td><span class="bar" style="width:{width}px"></span></td></tr>'
        )
    if n_null:
        bars.append(f"<tr><td>NULL</td><td>{n_null}</td><td></td></tr>")
    hist_html = (
        "<table><caption>match-probability distribution</caption>"
        "<tr><th>probability</th><th>pairs</th><th></th></tr>"
        + "".join(bars)
        + "</table>"
    )
    # the two interesting tails: likely-wrong strong links & weak matches
    strongest = [
        r.asDict()
        for r in predictions.orderBy(
            F.col(probability_col).desc_nulls_last()
        ).limit(n_examples).collect()
    ]
    # nulls_last: Spark sorts NULL first ascending, so without it a
    # handful of NULL probabilities would fill the whole weakest table
    # (the histogram already buckets NULLs separately)
    weakest = [
        r.asDict()
        for r in predictions.orderBy(
            F.col(probability_col).asc_nulls_last()
        ).limit(n_examples).collect()
    ]
    body = (
        hist_html
        + "<h2>Strongest pairs</h2>"
        + _table(strongest, f"top {n_examples} by {probability_col}")
        + "<h2>Weakest pairs</h2>"
        + _table(weakest, f"bottom {n_examples} by {probability_col}")
    )
    out = _PAGE.format(title="Comparison viewer", body=body)
    with open(path, "w", encoding="utf-8") as f:
        f.write(out)
    return path
