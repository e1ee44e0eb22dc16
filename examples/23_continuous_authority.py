"""A domain-authority service that keeps ITSELF fresh: persistent
edge store + exactly-once crawl appends + takedown tombstones + a
WARM persisted PageRank loop + one-call maintenance — the graph tier
composed end to end (round 14).

Storyline: a crawler streams pages; each micro-batch's links append
to a manifest-layout edge store as immutable deltas under one atomic
commit carrying an (app_id, batch_id) idempotence token (a replayed
batch is skipped — exactly-once without rewriting anything). Authority
refreshes on a schedule with ONE call:

    refresh_pagerank(spark, store, warm=True, persist=True,
                     tol_scaled=...)

— the previous rank vector loads from the store's own derived `ranks`
table, the tol-stopped power iteration converges in 1-2 updates once
the graph is quiet (vs a cold fixed schedule), and the refreshed
vector commits back for the next pass. A domain takedown is a
tombstone append: the next refresh redistributes its authority as if
it never existed, bit-identical to PageRank over the filtered edges.
Finally `maintain_corpus` compacts/checkpoints/vacuums the edge store
in the same pass as the corpus it curates for.

Run: python examples/23_continuous_authority.py   (~60 s on local[8])
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from auto_data_linkage_spark.operators import manifestfs as M  # noqa: E402
from auto_data_linkage_spark.operators.graph import (  # noqa: E402
    delete_domains_from_edge_store,
    edge_store_sink,
    init_edge_store,
    load_ranks,
    refresh_pagerank,
)
from auto_data_linkage_spark.operators.maintain import (  # noqa: E402
    maintain_corpus,
)
from auto_data_linkage_spark.session import get_spark  # noqa: E402
from auto_data_linkage_spark.sources import corpusstore as C  # noqa: E402


def crawl_batch(spark, lo, hi):
    """Synthetic crawl slice: every page links to a rotating set of
    reference domains; a three-site spam ring links to itself."""
    d = F.col("id")
    return spark.range(lo, hi).select(
        F.concat(
            F.lit("https://site"), (d % 50).cast("string"),
            F.lit(".com/p/"), d.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit('<a href="https://ref'), (d % 5).cast("string"),
            F.lit('.org/x">r</a>'),
            F.when(
                d % 9 == 0,
                F.concat(
                    F.lit('<a href="https://spam'),
                    (d % 3).cast("string"),
                    F.lit('.biz/s">$</a>'),
                ),
            ).otherwise(F.lit("")),
        ).alias("html"),
    )


def main() -> None:
    spark = get_spark("continuous-authority", cpus=8)
    root = tempfile.mkdtemp(prefix="adl_ex23_")
    corpus, store = f"{root}/corpus", f"{root}/edges"

    # the corpus this authority signal curates for (gives maintain_corpus
    # a registry to drive; the edge store rides along via extra_stores)
    C.build_corpus_snapshot(
        spark.range(0, 200).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc "), F.col("id")).alias("text"),
            (F.col("id") % 2).alias("part"),
        ),
        corpus, key="doc_id", partition_by=["part"],
    )

    init_edge_store(store, n_buckets=4)
    sink = edge_store_sink(store, app_id="crawler-v1")

    print("== day 1: three crawl micro-batches (exactly-once appends)")
    for b in range(3):
        sink(crawl_batch(spark, b * 200, (b + 1) * 200), b)
    sink(crawl_batch(spark, 400, 600), 2)  # a REPLAY of batch 2: skipped
    print("   committed version:", M.read_manifest(store)["version"])

    print("== first refresh: cold (no persisted vector yet)")
    stats: dict = {}
    refresh_pagerank(
        spark, store, warm=True, persist=True,
        iterations=40, tol_scaled=20_000_000, stats=stats,
    )
    print(f"   cold pass ran {stats['iterations_run']} updates")
    top = load_ranks(spark, store).orderBy(
        F.desc("rank_scaled"), "domain"
    ).limit(5)
    print("   top domains:", [(r.domain, r.rank_scaled) for r in top.collect()])

    print("== day 2: a small delta, then the WARM one-call refresh")
    sink(crawl_batch(spark, 600, 640), 3)
    stats2: dict = {}
    refresh_pagerank(
        spark, store, warm=True, persist=True,
        iterations=40, tol_scaled=20_000_000, stats=stats2,
    )
    print(
        f"   warm pass ran {stats2['iterations_run']} updates "
        f"(vs {stats['iterations_run']} cold — the persisted vector was "
        "already near the new fixed point)"
    )

    print("== takedown: spam ring masked, authority redistributed")
    delete_domains_from_edge_store(
        spark, store, ["spam0.biz", "spam1.biz", "spam2.biz"]
    )
    ranks = refresh_pagerank(spark, store, warm=True, persist=True,
                             iterations=40, tol_scaled=20_000_000)
    spam_left = ranks.where(F.col("domain").startswith("spam")).count()
    print("   spam domains still ranked:", spam_left)

    print("== one-call maintenance: compaction + checkpoint + vacuum")
    rep = maintain_corpus(
        spark, corpus, compact_over=1, keep_versions=1,
        min_age_seconds=0, extra_stores=[store],
    )
    m = rep["maintained"][store]
    print(
        "   edge store:", m["compacted"],
        "| reclaimed gens:", len(m["vacuum"]["removed_gens"]),
    )
    print(
        "   ranks survive maintenance:",
        load_ranks(spark, store).count(), "domains;",
        "history replays to v1:",
        [h["version"] for h in M.history(store)][0] == 1,
    )
    spark.stop()


if __name__ == "__main__":
    main()
