"""A vector search service that maintains ITSELF: corpus snapshot +
persisted ANN index + drift-triggered rebuild + consumer-aware vacuum
+ log checkpointing — the round-13 storage tier composed.

Storyline: embeddings live in a corpus snapshot (versioned, atomic
commits). An IVF-PQ index serves top-k. `sync_ann_index` folds every
corpus commit into the index O(delta) — and MEASURES each append's
quantization drift against the build-time baseline, so when the
embedding distribution moves (new model, new domain), the
`rebuild_over=` policy re-trains codebooks/centroids from the synced
corpus head automatically, restoring recall. Meanwhile the corpus
vacuums itself on a cron without coordinating with the sync: the
sync's registered cursor raises the vacuum's retention floor, so a
lagging sync can never lose the history it still needs. Finally the
manifest log is checkpointed so vacuum can reclaim old manifest files
while `history()` still replays the full audit trail.

Run: python examples/21_self_maintaining_ann.py
"""

import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from auto_data_linkage_spark.operators import annindex as A  # noqa: E402
from auto_data_linkage_spark.operators import manifestfs as M  # noqa: E402
from auto_data_linkage_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
)
from auto_data_linkage_spark.operators.sync import sync_ann_index  # noqa: E402
from auto_data_linkage_spark.session import get_spark  # noqa: E402
from auto_data_linkage_spark.sources import corpusstore as C  # noqa: E402

DIM, K = 16, 6


def make_vectors(spark, ids, centers, shift=0.0, noise=0.15, seed=0):
    rnd = random.Random(seed)
    rows = [
        (
            i,
            [centers[i % K][d] + rnd.gauss(0, noise) + shift
             for d in range(DIM)],
            int(i) % 2,
        )
        for i in ids
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, part int"
    )


def recall_at5(spark, idx_path, full, queries):
    exact, got = {}, {}
    for r in brute_force_topk(full, queries, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in A.ann_index_topk(
        A.load_ann_index(spark, idx_path), queries, k=5, nprobe=3,
        rerank_factor=20, corpus=full,
    ).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    rs = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
    return sum(rs) / len(rs)


def main() -> None:
    spark = get_spark("self-maintaining-ann", cpus=8)
    rnd = random.Random(7)
    centers = [[rnd.uniform(-3, 3) for _ in range(DIM)] for _ in range(K)]
    work = tempfile.mkdtemp()
    corpus, idx = f"{work}/corpus", f"{work}/idx"

    # 1. corpus v1 + index trained on it; first sync anchors the cursor
    base = make_vectors(spark, range(600), centers, seed=1)
    C.build_corpus_snapshot(base, corpus, key="vec_id", partition_by=["part"])
    A.build_ann_index(
        C.load_corpus_snapshot(spark, corpus).select("vec_id", "embedding"),
        idx, m=4, n_codewords=8, n_cells=K,
    )
    out = sync_ann_index(spark, corpus, idx, since=1, rebuild_over=0.1)
    print("baseline recon_err:",
          round(A.load_ann_index(spark, idx).meta["recon_err"], 3))

    # 2. in-distribution growth: drift stays under the threshold
    C.append_corpus_snapshot(
        corpus, make_vectors(spark, range(600, 900), centers, seed=2)
    )
    out = sync_ann_index(spark, corpus, idx, rebuild_over=0.1)
    print(f"in-distribution append: drift={out['drift']:.3f} "
          f"rebuilt={out['rebuilt']}")

    # 3. the embedding distribution MOVES (say, a new embed model):
    #    drift trips, the policy rebuilds from the synced head
    C.append_corpus_snapshot(
        corpus, make_vectors(spark, range(9000, 9300), centers,
                             shift=4.0, seed=3)
    )
    out = sync_ann_index(spark, corpus, idx, rebuild_over=0.1)
    print(f"shifted append:         drift={out['drift']:.3f} "
          f"rebuilt={out['rebuilt']}")
    full = C.load_corpus_snapshot(spark, corpus).select(
        "vec_id", "embedding"
    ).localCheckpoint(eager=True)
    queries = full.where(F.col("vec_id") >= 9000).limit(10)
    print("recall@5 on drifted-region queries after the rebuild:",
          round(recall_at5(spark, idx, full, queries), 2))

    # 4. consumer-aware vacuum: the sync's registered cursor sets the
    #    retention floor, so a cron vacuum can never starve a lagging
    #    sync — and once caught up, the same vacuum reclaims
    print("registered consumers:", C.registered_sync_cursors(corpus))
    out = C.vacuum_corpus_snapshot(corpus, keep_manifests=1,
                                   min_age_seconds=0)
    print("default vacuum (caught-up consumer):",
          len(out["removed_manifests"]), "manifests reclaimed,",
          len(M._manifest_names(corpus)), "kept")

    # 5. checkpoint the index's manifest log: old manifest FILES become
    #    reclaimable while history() keeps the full audit trail
    before = len(M.history(idx))
    M.checkpoint_manifest_log(idx)
    M.vacuum(idx, keep_manifests=1, min_age_seconds=0)
    print(f"index log after checkpoint+vacuum: "
          f"{len(M._manifest_names(idx))} manifest file(s), history "
          f"still replays {len(M.history(idx))}/{before} versions")

    # 6. ...or let ONE call do all of it: maintain_corpus discovers the
    #    consumer indexes from the corpus registry and runs sync (with
    #    fragmentation + drift policies), log checkpoints, and the
    #    consumer-aware vacuum — the cron job as a function
    from auto_data_linkage_spark.operators.maintain import maintain_corpus

    C.append_corpus_snapshot(
        corpus, make_vectors(spark, range(900, 1000), centers, seed=9)
    )
    rep = maintain_corpus(
        spark, corpus, compact_over=4, rebuild_over=0.1, min_age_seconds=0
    )
    only = next(iter(rep["synced"].values()))
    print(f"maintain_corpus: synced {len(rep['synced'])} index(es), "
          f"applied={sum(a['action'] == 'applied' for a in only['applied'])} "
          f"commit(s), drift={only['drift']:.3f}, "
          f"rebuilt={only['rebuilt']}, corpus vacuum reclaimed "
          f"{len(rep['corpus']['vacuum']['removed_manifests'])} manifests")


if __name__ == "__main__":
    main()
