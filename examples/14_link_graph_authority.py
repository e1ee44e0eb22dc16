"""Domain authority from the corpus's own link graph — the graph tier
of web curation (round 9i):

1. ``extract_links`` turns raw HTML pages into a domain edge table
   (zero-UDF regexp chain + eTLD+1 resolution),
2. ``link_graph_stats`` profiles degrees/reciprocity (a link-farm ring
   shows up as mutual links),
3. ``pagerank`` ranks domains with exact fixed-point arithmetic (ranks
   are bit-identical run to run — rerun this script and diff),
4. the TrustRank mode (``seeds=``) starves the spam ring that plain
   PageRank keeps feeding teleport mass,
5. ``anchor_texts`` mines (anchor, target-domain) pairs — retrieval
   training data in someone else's words,
6. the authority gate keeps only documents hosted on top-ranked domains.

Run: python examples/14_link_graph_authority.py   (~40 s on local[8])
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.graph import (
    anchor_texts,
    extract_links,
    link_graph_stats,
    pagerank,
)
from auto_data_linkage_spark.session import get_spark

# a small web: two reputable hubs, a long tail linking to them, and a
# three-domain spam ring that links only to itself.
PAGES = [
    ("https://docs.example.com/intro",
     '<a href="https://spark.apache.org/docs">Spark documentation</a>'
     '<a href="https://wiki.example.org/graphs">graph background</a>'),
    ("https://wiki.example.org/graphs",
     '<a href="https://spark.apache.org/sql">Spark SQL reference</a>'),
    ("https://blog.example.net/post1",
     '<a href="https://docs.example.com/intro">a great intro</a>'
     '<a href="https://spark.apache.org/">the engine itself</a>'),
    ("https://blog.example.net/post2",
     '<a href="https://wiki.example.org/graphs">wiki article</a>'),
    # spam ring: mutual links, no in-links from the real web
    ("https://spam-a.biz/x", '<a href="https://spam-b.biz/y">buy</a>'),
    ("https://spam-b.biz/y", '<a href="https://spam-c.biz/z">cheap</a>'),
    ("https://spam-c.biz/z", '<a href="https://spam-a.biz/x">now</a>'),
]


def main() -> None:
    spark = get_spark("link-graph-example", cpus=8)
    pages = spark.createDataFrame(PAGES, ["url", "html"])

    edges = extract_links(pages)
    print("== domain edges ==")
    edges.orderBy("src_domain", "dst_domain").show(truncate=False)

    print("== degree / reciprocity profile ==")
    link_graph_stats(edges).orderBy("domain").show(truncate=False)

    ranks = pagerank(edges, iterations=10)
    print("== PageRank (fixed-point, bit-exact) ==")
    ranks.orderBy(F.desc("rank_scaled")).show(truncate=False)

    trusted = pagerank(edges, iterations=10, seeds=["example.com", "example.org"])
    print("== TrustRank seeded at the curated hubs "
          "(trust flows along their out-links; spam ring decays) ==")
    trusted.orderBy(F.desc("rank_scaled")).show(truncate=False)

    print("== anchor-text pairs (retrieval weak supervision) ==")
    anchor_texts(pages).orderBy("dst_domain").show(truncate=False)

    # authority gate: keep pages hosted on the top-3 TrustRank domains
    top = (
        trusted.orderBy(F.desc("rank_scaled"), "domain")
        .limit(3)
        .select("domain")
    )
    from auto_data_linkage_spark.operators.graph import _HOST_RE
    from auto_data_linkage_spark.operators.urls import registered_domain

    hosted = pages.select(
        "url",
        registered_domain(
            F.lower(F.regexp_extract("url", _HOST_RE, 1))
        ).alias("domain"),
    )
    kept = hosted.join(F.broadcast(top), "domain")
    print("== documents surviving the authority gate ==")
    kept.orderBy("url").show(truncate=False)
    n_spam = kept.where(F.col("domain").contains("spam")).count()
    assert n_spam == 0, "spam ring must not survive the gate"
    print("OK: spam ring pruned, "
          f"{kept.count()}/{pages.count()} pages kept")
    spark.stop()


if __name__ == "__main__":
    main()
