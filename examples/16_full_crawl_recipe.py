"""The COMPLETE crawl-to-training-set recipe — every gate
`prepare_training_set` offers, in one call (rounds 9i/9j additions
included):

  0a. encoding repair (mojibake fixed before anything reads the text)
  0.  URL front door (blocklist + per-domain quota + URL dedup)
  0b. authority gate (PageRank over the crawl's own link graph)
  1.  quality/language curation + exact + near dedup
  2.  Gopher document + repetition rules
  2b. benchmark decontamination
  3.  span dedup  →  4. BPE  →  5. packing  →  6. shards

Run: python examples/16_full_crawl_recipe.py   (~90 s on local[8])
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.graph import extract_links, pagerank
from auto_data_linkage_spark.operators.pipeline import prepare_training_set
from auto_data_linkage_spark.session import get_spark

GOOD = ("the quick brown fox jumps over that lazy dog and all of the "
        "words here have to be sensible because this text must pass "
        "every quality gate with room to spare today")


def sloppy(bs: bytes) -> str:
    out = []
    for b in bs:
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


def main() -> None:
    spark = get_spark("full-crawl-recipe", cpus=8)

    # a tiny synthetic crawl: good pages on linked domains, one page of
    # mojibake (repairable), one spam domain, one benchmark leak
    rows = []
    for i in range(40):
        dom = f"site{i % 4}"
        rows.append((
            i,
            f"{GOOD} unique number {i} extra words",
            f"https://{dom}.com/p/{i}",
            f'<a href="https://site{(i + 1) % 4}.com/x">next</a>',
        ))
    # mojibake page (repaired by stage 0a, then passes curation)
    rows.append((
        100,
        sloppy((GOOD + " don’t café unique mojibake page").encode("utf-8")),
        "https://site0.com/p/moji",
        "",
    ))
    # spam domain: no in-links from the ring → low PageRank → gated
    rows.append((
        101, f"{GOOD} unique spam content",
        "https://spam.biz/p/1", '<a href="https://spam.biz/o">self</a>',
    ))
    # benchmark leak: shares a 7-gram with the eval set
    rows.append((
        102, f"{GOOD} the exact benchmark question appears verbatim here",
        "https://site1.com/p/leak", "",
    ))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, url string, html string"
    )
    benchmark = spark.createDataFrame(
        [(0, "the exact benchmark question appears verbatim here")],
        "bid long, text string",
    )

    # domain authority from the crawl's own links
    ranks = pagerank(extract_links(docs), iterations=5)
    print("== domain ranks ==")
    ranks.orderBy(F.desc("rank_scaled")).show()

    out = tempfile.mkdtemp(prefix="crawl_recipe_")
    report = prepare_training_set(
        docs.drop("html"),
        out,
        fix_encoding=True,
        url_col="url",
        blocked_domains=["blocked.example"],
        max_per_domain=50,
        domain_ranks=ranks,
        min_rank_scaled=10_000_000,   # spam.biz ranks below this
        benchmark=benchmark,
        benchmark_shingle_k=7,
        min_quality=0.3,
        gopher_min_words=10,
        span_words=60,
        num_merges=30,
        capacity=512,
        n_shards=2,
        jaccard_threshold=0.95,
    )
    print("== pipeline report ==")
    for k, v in report.items():
        print(f"  {k}: {v}")

    assert report["n_authority_kept"] <= report["n_url_kept"]
    assert report["n_decontaminated"] < report["n_curated"], (
        "the benchmark leak must be dropped"
    )
    assert report["total_tokens"] > 0
    print(f"OK — shards under {out}")
    spark.stop()


if __name__ == "__main__":
    main()
