"""Domain link-graph operators (operators/graph.py): href extraction,
degree stats, and fixed-point PageRank — pinned against an independent
pure-Python fixed-point reference (exact equality, no float tolerance)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.graph import (
    PAGERANK_SCALE,
    anchor_texts,
    extract_links,
    link_graph_stats,
    pagerank,
)


def _py_pagerank(edges, iterations, scale=PAGERANK_SCALE, dp=85, seeds=None):
    """Independent fixed-point reference: plain dict/int arithmetic,
    no Spark — the oracle the distributed plan must equal EXACTLY."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    out = {x: sorted({t for s, t in edges if s == x and t != x}) for x in nodes}
    n = len(nodes)
    trusted = set(nodes) if seeds is None else set(seeds) & set(nodes)
    n_tel = len(trusted)
    r = {x: scale // n for x in nodes}
    tel = (scale // n_tel) * (100 - dp) // 100
    for _ in range(iterations):
        dang = sum(r[x] for x in nodes if not out[x])
        inn = {x: 0 for x in nodes}
        for s in nodes:
            if out[s]:
                share = r[s] // len(out[s])
                for t in out[s]:
                    inn[t] += share
        r = {
            x: (tel if x in trusted else 0)
            + (dp * (inn[x] + (dang // n_tel if x in trusted else 0))) // 100
            for x in nodes
        }
    return r


EDGES = [
    ("a", "b"), ("b", "a"), ("b", "c"), ("d", "c"), ("d", "a"),
    ("e", "a"),  # e dangling-free, c dangling
]


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, ["src_domain", "dst_domain"])


class TestPagerank:
    def test_matches_independent_reference_exactly(self, spark):
        got = {
            r["domain"]: r["rank_scaled"]
            for r in pagerank(_edges_df(spark, EDGES), iterations=5).collect()
        }
        assert got == _py_pagerank(EDGES, 5)

    def test_bit_identical_across_runs(self, spark):
        e = _edges_df(spark, EDGES)
        a = sorted(map(tuple, pagerank(e, iterations=3).collect()))
        b = sorted(map(tuple, pagerank(e, iterations=3).collect()))
        assert a == b

    def test_self_loops_and_multi_edges_ignored(self, spark):
        noisy = EDGES + [("a", "a"), ("b", "c"), ("b", "c")]
        got = {
            r["domain"]: r["rank_scaled"]
            for r in pagerank(_edges_df(spark, noisy), iterations=4).collect()
        }
        assert got == _py_pagerank(EDGES, 4)

    def test_dangling_mass_recycled(self, spark):
        # pure sink graph: everything points at z; z's mass must flow
        # back via the dangling term, not vanish.
        edges = [("a", "z"), ("b", "z"), ("c", "z")]
        got = {
            r["domain"]: r["rank_scaled"]
            for r in pagerank(_edges_df(spark, edges), iterations=6).collect()
        }
        assert got == _py_pagerank(edges, 6)
        assert got["z"] > got["a"] == got["b"] == got["c"] > 0

    def test_total_mass_conserved_within_floor_loss(self, spark):
        got = pagerank(_edges_df(spark, EDGES), iterations=5).collect()
        total = sum(r["rank_scaled"] for r in got)
        # each DIV floors away <1 scaled unit per node/edge/iteration:
        # the total stays within a tiny additive band below SCALE.
        assert PAGERANK_SCALE * 0.999 < total <= PAGERANK_SCALE

    def test_small_scale_still_exact(self, spark):
        got = {
            r["domain"]: r["rank_scaled"]
            for r in pagerank(
                _edges_df(spark, EDGES), iterations=3, scale=10**6
            ).collect()
        }
        assert got == _py_pagerank(EDGES, 3, scale=10**6)

    def test_trustrank_matches_reference_exactly(self, spark):
        got = {
            r["domain"]: r["rank_scaled"]
            for r in pagerank(
                _edges_df(spark, EDGES), iterations=4,
                seeds=["a", "e", "not-in-graph"],
            ).collect()
        }
        assert got == _py_pagerank(EDGES, 4, seeds=["a", "e"])

    def test_trustrank_starves_unreachable_island(self, spark):
        # x<->y is a spam ring unreachable from the seed component;
        # under seeded teleport its rank decays toward 0 while plain
        # PageRank would keep feeding it teleport mass.
        edges = EDGES + [("x", "y"), ("y", "x")]
        tr = {
            r["domain"]: r["rank_scaled"]
            for r in pagerank(
                _edges_df(spark, edges), iterations=8, seeds=["e"]
            ).collect()
        }
        pr = {
            r["domain"]: r["rank_scaled"]
            for r in pagerank(_edges_df(spark, edges), iterations=8).collect()
        }
        # the ring holds only its initial mass decaying at 0.85/iter
        # (0.85^8 = 0.27 of scale/10), while unseeded PageRank feeds it
        # teleport mass every round toward a fat steady state:
        assert tr["x"] < pr["x"] // 4
        # and the decay continues with more iterations (no floor):
        tr16 = {
            r["domain"]: r["rank_scaled"]
            for r in pagerank(
                _edges_df(spark, edges), iterations=16, seeds=["e"]
            ).collect()
        }
        assert tr16["x"] < tr["x"] // 2
        assert tr["a"] > 0

    def test_trustrank_no_seed_in_graph_raises(self, spark):
        with pytest.raises(ValueError):
            pagerank(_edges_df(spark, EDGES), iterations=1, seeds=["zzz"])

    def test_empty_graph(self, spark):
        e = _edges_df(spark, [("a", "a")])  # only a self-loop -> no edges
        assert pagerank(e, iterations=2).count() == 0

    def test_schema(self, spark):
        df = pagerank(_edges_df(spark, EDGES), iterations=1)
        assert [f.name for f in df.schema.fields] == ["domain", "rank_scaled"]
        assert df.schema["rank_scaled"].dataType.typeName() == "long"


class TestExtractLinks:
    def _pages(self, spark):
        rows = [
            (
                "https://www.foo.com/x",
                '<a href="https://bar.co.uk/p?q=1">a</a>'
                "<a href='HTTP://www.baz.org/q#frag'>b</a>"
                '<a href="/relative">c</a>'
                '<a href="https://foo.com/self">d</a>'
                '<a href="https://bar.co.uk/other">e</a>',
            ),
            ("https://sub.bar.co.uk/y", '<a href="https://foo.com/z">f</a>'),
        ]
        return spark.createDataFrame(rows, ["url", "html"])

    def test_edges(self, spark):
        got = {
            (r["src_domain"], r["dst_domain"]): r["n_links"]
            for r in extract_links(self._pages(spark)).collect()
        }
        assert got == {
            # relative + self links dropped; queries/fragments never
            # reach the host regex; schemes match case-insensitively;
            # www. stripped by eTLD+1; two hrefs to bar.co.uk collapse
            # into one edge with n_links=2
            ("foo.com", "bar.co.uk"): 2,
            ("foo.com", "baz.org"): 1,
            ("bar.co.uk", "foo.com"): 1,
        }

    def test_keep_self_links(self, spark):
        got = extract_links(self._pages(spark), drop_self=False)
        pairs = {(r["src_domain"], r["dst_domain"]) for r in got.collect()}
        assert ("foo.com", "foo.com") in pairs

    def test_no_python_udf_in_plan(self, spark):
        plan = extract_links(self._pages(spark))._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestAnchorTexts:
    def test_anchor_pairs(self, spark):
        rows = [
            (
                "https://www.foo.com/x",
                '<a href="https://bar.co.uk/p" rel="nofollow"> Spark guide </a>'
                '<a href="https://baz.org/q"><b>bold</b> link</a>'  # markup-wrapped: recovered
                '<a href="https://qux.net/r"></a>'  # empty anchor dropped
                '<a href="/rel">relative dropped</a>'
                '<a href="https://foo.com/self">self dropped</a>'
                '<a href="https://dangle.io/u">unclosed anchor dropped',
            ),
        ]
        df = spark.createDataFrame(rows, ["url", "html"])
        got = {
            (r["src_domain"], r["dst_domain"], r["anchor"])
            for r in anchor_texts(df).collect()
        }
        assert got == {
            ("foo.com", "bar.co.uk", "Spark guide"),
            ("foo.com", "baz.org", "bold link"),
        }

    def test_multiline_and_span_wrapped_anchors_recovered(self, spark):
        rows = [
            (
                "https://src.com/",
                '<a href="https://t1.com/a"><span class="x">deep\n'
                "  learning</span>  notes</a>"
                '<a href="https://t2.com/b"><img src="x.png"/></a>',
            ),
        ]
        df = spark.createDataFrame(rows, ["url", "html"])
        got = {
            (r["dst_domain"], r["anchor"])
            for r in anchor_texts(df).collect()
        }
        # t2: image-only anchor strips to empty -> dropped
        assert got == {("t1.com", "deep learning notes")}

    def test_no_python_udf_in_plan(self, spark):
        df = spark.createDataFrame([("u", "h")], ["url", "html"])
        plan = anchor_texts(df)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestLinkGraphStats:
    def test_degrees_and_reciprocity(self, spark):
        stats = {
            r["domain"]: (r["out_degree"], r["in_degree"], r["reciprocal"])
            for r in link_graph_stats(_edges_df(spark, EDGES)).collect()
        }
        assert stats == {
            "a": (1, 3, 1),  # a->b reciprocated by b->a
            "b": (2, 1, 1),
            "c": (0, 2, 0),
            "d": (2, 0, 0),
            "e": (1, 0, 0),
        }


class TestCatalogParity:
    def test_pagerank_iterations_match_oracle_unroll(self):
        """The SQL oracle unrolls the same iteration count the catalog
        query passes — a drifted constant would silently compare
        different algorithms."""
        import inspect

        from auto_data_linkage_spark import queries_llm as q

        sql = q._domain_pagerank_sql()
        assert "FROM r4" in sql and "r5" not in sql
        assert "iterations=4" in inspect.getsource(q.domain_pagerank_q)
        from auto_data_linkage_spark.queries import REGISTRY

        tsql = REGISTRY["domain_trustrank"].sql
        assert "FROM r4" in tsql and "r5" not in tsql
        assert "iterations=4" in inspect.getsource(q.domain_trustrank_q)


class TestEdgeStore:
    def _pages(self, spark, lo, hi):
        from pyspark.sql import functions as F

        return (
            spark.range(lo, hi)
            .select(
                F.concat(
                    F.lit("https://site"), (F.col("id") % 5).cast("string"),
                    F.lit(".com/p/"), F.col("id").cast("string"),
                ).alias("url"),
                F.concat(
                    F.lit('<a href="https://ref'),
                    (F.col("id") % 3).cast("string"),
                    F.lit('.org/x">l</a>'),
                ).alias("html"),
            )
        )

    def test_sink_accumulates_and_load_aggregates(self, spark, tmp_path):
        from auto_data_linkage_spark.operators.graph import (
            edge_store_sink,
            extract_links,
            load_edges,
        )

        store = str(tmp_path / "edges")
        sink = edge_store_sink(store, n_buckets=4)
        sink(self._pages(spark, 0, 40), 0)
        sink(self._pages(spark, 40, 80), 1)

        got = {
            (r.src_domain, r.dst_domain): r.n_links
            for r in load_edges(spark, store).collect()
        }
        want = {
            (r.src_domain, r.dst_domain): r.n_links
            for r in extract_links(self._pages(spark, 0, 80)).collect()
        }
        assert got == want

    def test_compaction_merges_deltas(self, spark, tmp_path):
        from auto_data_linkage_spark.operators.graph import (
            compact_edge_store,
            edge_store_sink,
            load_edges,
            pagerank,
        )

        store = str(tmp_path / "edges_cc")
        sink = edge_store_sink(store, n_buckets=2)
        for b in range(4):
            sink(self._pages(spark, b * 20, (b + 1) * 20), b)
        before = sorted(
            map(tuple, load_edges(spark, store).collect())
        )
        pr_before = sorted(
            map(tuple, pagerank(load_edges(spark, store), iterations=3).collect())
        )
        summary = compact_edge_store(spark, store, max_files_per_bucket=2)
        assert summary["buckets_rewritten"] > 0
        assert summary["files_after"] < summary["files_before"]
        assert sorted(map(tuple, load_edges(spark, store).collect())) == before
        # and the refresh product is bit-identical (fixed-point claim)
        pr_after = sorted(
            map(tuple, pagerank(load_edges(spark, store), iterations=3).collect())
        )
        assert pr_after == pr_before

    def test_streaming_pages_into_store(self, spark, tmp_path):
        from auto_data_linkage_spark.operators.graph import (
            edge_store_sink,
            load_edges,
        )

        landing = str(tmp_path / "landing")
        ckpt = str(tmp_path / "ckpt")
        store = str(tmp_path / "edges_stream")
        batch = self._pages(spark, 0, 30)
        batch.coalesce(1).write.mode("overwrite").parquet(landing)

        q = (
            spark.readStream.schema(batch.schema)
            .parquet(landing)
            .writeStream.foreachBatch(edge_store_sink(store, n_buckets=2))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert load_edges(spark, store).count() > 0


class TestWarmStart:
    def test_warm_start_is_exact_iteration_resume(self, spark):
        """Warm start IS "resume the power iteration": k cold rounds
        then 1 warm round equals k+1 cold rounds BIT-FOR-BIT (the
        fixed-point arithmetic makes this an equality, not a
        tolerance)."""
        e = _edges_df(spark, EDGES)
        for k in (1, 4):
            cold = pagerank(e, iterations=k + 1)
            resumed = pagerank(
                e, iterations=1, init_ranks=pagerank(e, iterations=k)
            )
            assert sorted(map(tuple, cold.collect())) == sorted(
                map(tuple, resumed.collect())
            )

    def test_warm_start_converges_faster_after_edge_delta(self, spark):
        """After a small edge delta, 2 warm iterations land closer to
        the new fixed point than 2 cold iterations do."""
        e_old = _edges_df(spark, EDGES)
        old_ranks = pagerank(e_old, iterations=30)
        new_edges = EDGES + [("e", "c"), ("c", "e")]
        e_new = _edges_df(spark, new_edges)
        truth = {
            r.domain: r.rank_scaled
            for r in pagerank(e_new, iterations=40).collect()
        }
        warm = {
            r.domain: r.rank_scaled
            for r in pagerank(
                e_new, iterations=2, init_ranks=old_ranks
            ).collect()
        }
        cold = {
            r.domain: r.rank_scaled
            for r in pagerank(e_new, iterations=2).collect()
        }
        err_warm = sum(abs(warm[d] - truth[d]) for d in truth)
        err_cold = sum(abs(cold[d] - truth[d]) for d in truth)
        assert err_warm < err_cold

    def test_new_domains_get_uniform_share(self, spark):
        e = _edges_df(spark, EDGES + [("new1", "a")])
        prev = pagerank(_edges_df(spark, EDGES), iterations=3)
        out = pagerank(e, iterations=1, init_ranks=prev)
        assert "new1" in {r.domain for r in out.collect()}


def test_refresh_pagerank_over_edge_store(spark, tmp_path):
    """The continuous-authority loop: sink pages -> refresh -> sink more
    -> warm refresh; the warm result equals a cold run resumed from the
    previous ranks (exact, by the warm-start resume identity)."""
    from auto_data_linkage_spark.operators.graph import (
        edge_store_sink,
        load_edges,
        refresh_pagerank,
    )

    store = str(tmp_path / "edges")
    pages = TestEdgeStore()._pages
    sink = edge_store_sink(store, n_buckets=2)
    sink(pages(spark, 0, 40), 0)
    r1 = refresh_pagerank(spark, store, iterations=5)

    sink(pages(spark, 40, 80), 1)
    warm = refresh_pagerank(spark, store, prev_ranks=r1, iterations=2)
    resumed = pagerank(
        load_edges(spark, store), iterations=1,
        init_ranks=pagerank(
            load_edges(spark, store), iterations=1, init_ranks=r1
        ),
    )
    assert sorted(map(tuple, warm.collect())) == sorted(
        map(tuple, resumed.collect())
    )


class TestEarlyStop:
    """tol_scaled convergence early-stop: piggybacked on the dangling
    collect (zero extra jobs), bit-identical to the fixed schedule at
    the stop point, and what makes warm refreshes adaptive."""

    def test_off_by_default_and_stats_report_schedule(self, spark):
        s = {}
        pagerank(_edges_df(spark, EDGES), iterations=5, stats=s).collect()
        assert s["iterations_run"] == 5

    def test_stop_point_is_bit_identical_to_fixed_run(self, spark):
        e = _edges_df(spark, EDGES)
        tol = PAGERANK_SCALE // 10**6
        s = {}
        adaptive = sorted(
            map(
                tuple,
                pagerank(e, iterations=60, tol_scaled=tol, stats=s).collect(),
            )
        )
        assert 0 < s["iterations_run"] < 60
        assert s["final_l1"] <= tol
        fixed = sorted(
            map(tuple, pagerank(e, iterations=s["iterations_run"]).collect())
        )
        assert adaptive == fixed

    def test_warm_refresh_converges_in_fewer_iterations(self, spark):
        """The adaptive-refresh claim: after an edge delta, the
        warm-started run crosses the tolerance in FEWER updates than a
        cold run, and its result equals the fixed-iteration warm run
        stopped at the same point (bit-identical)."""
        e_old = _edges_df(spark, EDGES)
        old_ranks = pagerank(e_old, iterations=30)
        e_new = _edges_df(spark, EDGES + [("e", "c"), ("c", "e")])
        tol = PAGERANK_SCALE // 10**4
        s_warm, s_cold = {}, {}
        warm = sorted(
            map(
                tuple,
                pagerank(
                    e_new,
                    iterations=100,
                    tol_scaled=tol,
                    init_ranks=old_ranks,
                    stats=s_warm,
                ).collect(),
            )
        )
        pagerank(
            e_new, iterations=100, tol_scaled=tol, stats=s_cold
        ).collect()
        assert s_warm["iterations_run"] < s_cold["iterations_run"]
        fixed = sorted(
            map(
                tuple,
                pagerank(
                    e_new,
                    iterations=s_warm["iterations_run"],
                    init_ranks=old_ranks,
                ).collect(),
            )
        )
        assert warm == fixed

    def test_min_iterations_floor(self, spark):
        """A tolerance met immediately still performs min_iterations
        updates — a warm start exactly AT the old fixed point must not
        skip folding a new edge delta in."""
        s = {}
        pagerank(
            _edges_df(spark, EDGES),
            iterations=100,
            tol_scaled=PAGERANK_SCALE,
            min_iterations=3,
            stats=s,
        ).collect()
        assert s["iterations_run"] == 3


def _py_hits(edges, iterations, scale=10**6):
    """Independent fixed-point HITS reference: dict/int arithmetic,
    L1 rescale by exact integer division — the oracle the distributed
    plan must equal EXACTLY."""
    pairs = sorted({(s, t) for s, t in edges if s != t})
    nodes = sorted({s for s, _ in pairs} | {t for _, t in pairs})
    n = len(nodes)
    hub = {x: scale // n for x in nodes}
    auth = {}
    for _ in range(iterations):
        raw = {x: 0 for x in nodes}
        for s, t in pairs:
            raw[t] += hub[s]
        tot = max(sum(raw.values()), 1)
        auth = {x: raw[x] * scale // tot for x in nodes}
        raw = {x: 0 for x in nodes}
        for s, t in pairs:
            raw[s] += auth[t]
        tot = max(sum(raw.values()), 1)
        hub = {x: raw[x] * scale // tot for x in nodes}
    return hub, auth


class TestHits:
    def test_matches_independent_reference_exactly(self, spark):
        from auto_data_linkage_spark.operators.graph import hits

        got = {
            r.domain: (r.hub_scaled, r.auth_scaled)
            for r in hits(_edges_df(spark, EDGES), iterations=4).collect()
        }
        hub, auth = _py_hits(EDGES, 4)
        assert got == {x: (hub[x], auth[x]) for x in hub}

    def test_hub_vs_authority_separation(self, spark):
        """A pure directory page (only out-links) must score hub-high /
        authority-zero; its targets the reverse."""
        from auto_data_linkage_spark.operators.graph import hits

        edges = [("dir", "a"), ("dir", "b"), ("dir", "c"),
                 ("a", "b"), ("c", "b")]
        out = {
            r.domain: (r.hub_scaled, r.auth_scaled)
            for r in hits(_edges_df(spark, edges), iterations=5).collect()
        }
        assert out["dir"][1] == 0           # nothing links TO the hub
        assert out["dir"][0] == max(v[0] for v in out.values())
        assert out["b"][1] == max(v[1] for v in out.values())

    def test_bit_identical_across_runs_and_random_graphs(self, spark):
        import random

        from auto_data_linkage_spark.operators.graph import hits

        rng = random.Random(7)
        for trial in range(3):
            edges = sorted({
                (f"n{rng.randrange(12)}", f"n{rng.randrange(12)}")
                for _ in range(25)
            })
            df = _edges_df(spark, edges)
            got = {
                r.domain: (r.hub_scaled, r.auth_scaled)
                for r in hits(df, iterations=3).collect()
            }
            hub, auth = _py_hits(edges, 3)
            assert got == {x: (hub[x], auth[x]) for x in hub}, edges

    def test_empty_and_validation(self, spark):
        import pytest as _pt

        from auto_data_linkage_spark.operators.graph import hits

        empty = spark.createDataFrame([], "src_domain string, dst_domain string")
        assert hits(empty, iterations=2).count() == 0
        with _pt.raises(ValueError, match="iterations"):
            hits(empty, iterations=0)

    def test_node_count_floor_raises_not_silent_zeros(self, spark):
        """More nodes than `scale` units: the initial hub share floors
        to 0 and zero vectors are a fixed point — must raise, never
        return an all-zero result."""
        import pytest as _pt

        from auto_data_linkage_spark.operators.graph import hits

        df = _edges_df(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        with _pt.raises(ValueError, match="scale"):
            hits(df, iterations=2, scale=2)  # 3 nodes > scale=2
        # scale == n is the boundary: share is 1 unit, still nonzero
        out = hits(df, iterations=2, scale=3).collect()
        assert len(out) == 3


def test_persisted_ranks_roundtrip_replace_and_vacuum(spark, tmp_path):
    """commit_ranks stores the rank vector as the manifest store's
    derived table (replaced whole per commit, at_version recorded);
    load_ranks round-trips it; vacuum reclaims the superseded rank
    generation while the live one keeps serving."""
    from auto_data_linkage_spark.operators import manifestfs as M
    from auto_data_linkage_spark.operators.graph import (
        commit_ranks,
        edge_store_sink,
        init_edge_store,
        load_ranks,
        refresh_pagerank,
        vacuum_edge_store,
    )

    store = str(tmp_path / "edges")
    init_edge_store(store, n_buckets=2)
    pages = TestEdgeStore()._pages
    sink = edge_store_sink(store, app_id="crawl")
    sink(pages(spark, 0, 40), 0)

    assert load_ranks(spark, store) is None
    v_edges = M.read_manifest(store)["version"]
    r1 = refresh_pagerank(spark, store, iterations=3)
    commit_ranks(spark, store, r1)
    got = sorted(map(tuple, load_ranks(spark, store).collect()))
    assert got == sorted(map(tuple, r1.collect()))
    meta = M.read_manifest(store)["meta"]
    assert meta["ranks"]["algo"] == "pagerank"
    assert meta["ranks"]["at_version"] == v_edges

    # second commit REPLACES: exactly one live rank generation
    commit_ranks(spark, store, refresh_pagerank(spark, store, iterations=5))
    snap = M.read_manifest(store)
    assert [len(g) for g in snap["tables"]["ranks"].values()] == [1]
    vac = vacuum_edge_store(store, keep_manifests=1, min_age_seconds=0)
    assert vac["removed_gens"]  # the superseded rank gen reclaimed
    assert load_ranks(spark, store).count() == r1.count()


def test_warm_persisted_refresh_loop(spark, tmp_path):
    """The one-call steady-state cadence: warm=True + persist=True
    feeds each refresh from the last committed vector; after a small
    delta the tol-stopped warm pass converges in fewer updates than
    the cold pass did, and the persisted vector tracks the result."""
    from auto_data_linkage_spark.operators import manifestfs as M
    from auto_data_linkage_spark.operators.graph import (
        edge_store_sink,
        init_edge_store,
        load_ranks,
        refresh_pagerank,
    )

    store = str(tmp_path / "edges")
    init_edge_store(store, n_buckets=2)
    pages = TestEdgeStore()._pages
    sink = edge_store_sink(store, app_id="crawl")
    sink(pages(spark, 0, 60), 0)

    s_cold: dict = {}
    r1 = refresh_pagerank(
        spark, store, warm=True, persist=True,
        iterations=12, tol_scaled=5_000, stats=s_cold,
    )
    assert sorted(map(tuple, load_ranks(spark, store).collect())) == sorted(
        map(tuple, r1.collect())
    )

    sink(pages(spark, 60, 66), 1)  # small crawl delta
    s_warm: dict = {}
    r2 = refresh_pagerank(
        spark, store, warm=True, persist=True,
        iterations=12, tol_scaled=5_000, stats=s_warm,
    )
    assert s_warm["iterations_run"] <= s_cold["iterations_run"]
    assert sorted(map(tuple, load_ranks(spark, store).collect())) == sorted(
        map(tuple, r2.collect())
    )
    assert M.read_manifest(store)["meta"]["ranks"]["at_version"] > 1


def test_quiescent_refresh_skips_compute_and_commit(spark, tmp_path):
    """The rank twin of 'idle syncs commit nothing': with no edge/
    tombstone change and the same knobs, a warm persisted refresh
    serves the committed vector with zero recompute and zero new
    commit; any takedown or knob change recomputes."""
    from auto_data_linkage_spark.operators import manifestfs as M
    from auto_data_linkage_spark.operators.graph import (
        delete_domains_from_edge_store,
        edge_store_sink,
        init_edge_store,
        refresh_pagerank,
    )

    store = str(tmp_path / "edges")
    init_edge_store(store, n_buckets=2)
    sink = edge_store_sink(store, app_id="crawl")
    sink(TestEdgeStore()._pages(spark, 0, 40), 0)

    kw = dict(warm=True, persist=True, iterations=8, tol_scaled=1_000_000)
    r1 = refresh_pagerank(spark, store, **kw)
    v_after = M.read_manifest(store)["version"]

    s: dict = {}
    r2 = refresh_pagerank(spark, store, stats=s, **kw)
    assert s == {"iterations_run": 0, "final_l1": None, "skipped": True}
    assert M.read_manifest(store)["version"] == v_after  # no new commit
    assert sorted(map(tuple, r2.collect())) == sorted(
        map(tuple, r1.collect())
    )

    # a knob change misses the params key: recompute + fresh commit
    s2: dict = {}
    refresh_pagerank(spark, store, stats=s2, warm=True, persist=True,
                     iterations=8, tol_scaled=1_000_000, damping_pct=80)
    assert s2.get("skipped") is None and s2["iterations_run"] >= 1
    assert M.read_manifest(store)["version"] > v_after

    # a takedown changes the served edge state: recompute (and the
    # masked domain leaves the ranking)
    delete_domains_from_edge_store(spark, store, ["ref0.org"])
    s3: dict = {}
    r4 = refresh_pagerank(spark, store, stats=s3, **kw)
    assert s3.get("skipped") is None and s3["iterations_run"] >= 1
    assert "ref0.org" not in {r.domain for r in r4.collect()}

    # and the loop re-quiesces on the next call
    s4: dict = {}
    refresh_pagerank(spark, store, stats=s4, **kw)
    assert s4.get("skipped") is True

    # skip_current=False forces the contractual extra update
    s5: dict = {}
    refresh_pagerank(spark, store, stats=s5, skip_current=False, **kw)
    assert s5.get("skipped") is None and s5["iterations_run"] >= 1


def test_quiescence_survives_compaction(spark, tmp_path):
    """Round-15: compaction proves logical identity, so a rank vector
    that was current at swap time stays current — a nightly compact on
    a quiet graph must NOT force a nightly warm recompute."""
    from auto_data_linkage_spark.operators import manifestfs as M
    from auto_data_linkage_spark.operators.graph import (
        compact_edge_store,
        edge_store_sink,
        init_edge_store,
        refresh_pagerank,
    )

    store = str(tmp_path / "edges")
    init_edge_store(store, n_buckets=2)
    pages = TestEdgeStore()._pages
    sink = edge_store_sink(store, app_id="crawl")
    # several micro-batches → fragmented buckets worth compacting
    sink(pages(spark, 0, 20), 0)
    sink(pages(spark, 20, 40), 1)
    sink(pages(spark, 40, 60), 2)

    kw = dict(warm=True, persist=True, iterations=8, tol_scaled=1_000_000)
    r1 = refresh_pagerank(spark, store, **kw)
    v_after = M.read_manifest(store)["version"]

    out = compact_edge_store(spark, store, max_files_per_bucket=0)
    assert out["buckets_rewritten"] >= 1

    # still quiescent: zero updates, zero new rank commit, same vector
    s: dict = {}
    r2 = refresh_pagerank(spark, store, stats=s, **kw)
    assert s == {"iterations_run": 0, "final_l1": None, "skipped": True}
    assert M.read_manifest(store)["version"] == v_after + 1  # compact only
    assert sorted(map(tuple, r2.collect())) == sorted(
        map(tuple, r1.collect())
    )

    # maintain's ops report agrees: ranks.current stays True
    from auto_data_linkage_spark.operators.graph import _edge_state_key

    snap = M.read_manifest(store)
    assert snap["meta"]["ranks"]["edge_state"] == _edge_state_key(snap)

    # a STALE vector stays stale through compaction: append a delta,
    # compact, and the refresh recomputes (no false carry-forward)
    sink(pages(spark, 60, 70), 3)
    compact_edge_store(spark, store, max_files_per_bucket=0)
    s2: dict = {}
    refresh_pagerank(spark, store, stats=s2, **kw)
    assert s2.get("skipped") is None and s2["iterations_run"] >= 1


def test_commit_ranks_at_version_pins_scored_snapshot(spark, tmp_path):
    """Round-15 (ADVICE): at_version records the snapshot the vector
    was SCORED from, not a fresh read at commit time — a concurrent
    append between scoring and commit must not be claimed as scored."""
    from auto_data_linkage_spark.operators import manifestfs as M
    from auto_data_linkage_spark.operators.graph import (
        commit_ranks,
        edge_store_sink,
        init_edge_store,
        refresh_pagerank,
    )

    store = str(tmp_path / "edges")
    init_edge_store(store, n_buckets=2)
    pages = TestEdgeStore()._pages
    sink = edge_store_sink(store, app_id="crawl")
    sink(pages(spark, 0, 30), 0)
    v_scored = M.read_manifest(store)["version"]

    ranks = refresh_pagerank(spark, store, iterations=3)
    ranks = ranks.localCheckpoint(eager=True)
    # concurrent append lands AFTER scoring, BEFORE the rank commit
    sink(pages(spark, 30, 40), 1)

    commit_ranks(spark, store, ranks, at_version=v_scored)
    assert M.read_manifest(store)["meta"]["ranks"]["at_version"] == v_scored

    # the warm persisted loop pins automatically: its commit records
    # the version of the snapshot whose fingerprint it scored (the head
    # it read at refresh time — NOT the newer head its own rank commit
    # creates)
    v_head = M.read_manifest(store)["version"]
    r = refresh_pagerank(
        spark, store, warm=True, persist=True, iterations=3
    )
    assert r is not None
    meta = M.read_manifest(store)["meta"]
    assert meta["ranks"]["at_version"] == v_head


def test_empty_rank_commit_skip_falls_through(spark, tmp_path, monkeypatch):
    """Round-15 (ADVICE): a rank commit whose vector write yields ZERO
    parquet parts records meta["ranks"] without a ranks table; a
    matching warm refresh must fall through to a recompute instead of
    breaking the DataFrame return contract with None. (This Spark
    writes one schema-bearing empty part even for an empty frame, so
    the no-parts write is simulated; the guard covers engines/versions
    that emit only _SUCCESS.) On an empty store the ordinary warm loop
    keeps its contract either way: every refresh returns a (possibly
    empty) DataFrame, never None."""
    from auto_data_linkage_spark.operators import manifestfs as M
    from auto_data_linkage_spark.operators.graph import (
        _edge_state_key,
        _pagerank_params,
        commit_ranks,
        init_edge_store,
        load_ranks,
        refresh_pagerank,
    )

    store = str(tmp_path / "edges")
    init_edge_store(store, n_buckets=2)

    # simulate the no-parts write (see docstring)
    monkeypatch.setattr(M, "written_parts", lambda *a, **k: [])
    empty = spark.createDataFrame([], "domain string, rank_scaled bigint")
    snap = M.read_manifest(store)
    commit_ranks(
        spark, store, empty,
        params=_pagerank_params(3, {}),
        edge_state=_edge_state_key(snap),
        at_version=snap["version"],
    )
    monkeypatch.undo()
    post = M.read_manifest(store)
    assert post["meta"]["ranks"] is not None
    assert "ranks" not in post["tables"]  # no parts were written
    assert load_ranks(spark, store) is None

    # fingerprint+params MATCH, but there is no table to serve: the
    # skip falls through and the refresh still returns a DataFrame
    s: dict = {}
    r = refresh_pagerank(
        spark, store, warm=True, iterations=3, stats=s
    )
    assert r is not None and r.count() == 0
    assert s.get("skipped") is None  # recomputed, not served

    # the ordinary empty-store warm persisted loop never returns None
    kw = dict(warm=True, persist=True, iterations=3)
    r1 = refresh_pagerank(spark, store, **kw)
    r2 = refresh_pagerank(spark, store, **kw)
    assert r1 is not None and r2 is not None and r2.count() == 0


def test_persisted_hits_loop_and_quiescence(spark, tmp_path):
    """Round-15 ask #5: HITS gets the persisted-vector loop — no
    warm-START (renormalization makes every re-run cold by design) but
    the committed (hub, auth) vector quiesces on a quiet graph, goes
    stale on a real delta, survives compaction, coexists with the
    PageRank ranks table, and shows up in maintain's currency report."""
    from auto_data_linkage_spark.operators import manifestfs as M
    from auto_data_linkage_spark.operators.graph import (
        compact_edge_store,
        edge_store_sink,
        init_edge_store,
        load_hits,
        load_ranks,
        refresh_hits,
        refresh_pagerank,
    )

    store = str(tmp_path / "edges")
    init_edge_store(store, n_buckets=2)
    pages = TestEdgeStore()._pages
    sink = edge_store_sink(store, app_id="crawl")
    sink(pages(spark, 0, 40), 0)

    assert load_hits(spark, store) is None
    r1 = refresh_hits(spark, store, iterations=4, persist=True)
    got = sorted(map(tuple, load_hits(spark, store).collect()))
    assert got == sorted(map(tuple, r1.collect()))
    meta = M.read_manifest(store)["meta"]
    assert meta["hits"]["algo"] == "hits"
    assert meta["hits"]["params"]["iterations"] == 4

    # quiescence: same knobs + same edge state -> served, no commit
    v = M.read_manifest(store)["version"]
    r2 = refresh_hits(spark, store, iterations=4, persist=True)
    assert M.read_manifest(store)["version"] == v  # no new commit
    assert sorted(map(tuple, r2.collect())) == got

    # knob change recomputes + commits
    refresh_hits(spark, store, iterations=6, persist=True)
    assert M.read_manifest(store)["version"] == v + 1

    # compaction carries a current HITS fingerprint forward
    sink(pages(spark, 40, 60), 1)
    r3 = refresh_hits(spark, store, iterations=6, persist=True)
    v3 = M.read_manifest(store)["version"]
    compact_edge_store(spark, store, max_files_per_bucket=0)
    r4 = refresh_hits(spark, store, iterations=6, persist=True)
    assert M.read_manifest(store)["version"] == v3 + 1  # compact only
    assert sorted(map(tuple, r4.collect())) == sorted(
        map(tuple, r3.collect())
    )

    # ranks and hits coexist: a PageRank commit doesn't clobber hits
    refresh_pagerank(spark, store, warm=True, persist=True, iterations=3)
    snap = M.read_manifest(store)
    assert "hits" in snap["tables"] and "ranks" in snap["tables"]
    assert load_hits(spark, store).count() == load_ranks(
        spark, store
    ).count()

    # time-travel read never persists
    import pytest as _pt

    with _pt.raises(ValueError, match="persist"):
        refresh_hits(spark, store, version=1, persist=True)


def test_hits_staleness_in_maintain_report(spark, tmp_path):
    """maintain_corpus's edge-store pass reports hits currency next to
    ranks (round-15 ask #5)."""
    from auto_data_linkage_spark.operators.graph import (
        edge_store_sink,
        init_edge_store,
        refresh_hits,
    )
    from auto_data_linkage_spark.operators.maintain import _maintain_store

    store = str(tmp_path / "edges")
    init_edge_store(store, n_buckets=2)
    pages = TestEdgeStore()._pages
    sink = edge_store_sink(store, app_id="crawl")
    sink(pages(spark, 0, 30), 0)
    refresh_hits(spark, store, iterations=3, persist=True)

    rep = _maintain_store(
        spark, store, "edges",
        compact_over=1000, keep_versions=2,
        min_age_seconds=0, checkpoint=False,
    )
    assert rep["hits"]["current"] is True

    sink(pages(spark, 30, 40), 1)
    rep2 = _maintain_store(
        spark, store, "edges",
        compact_over=1000, keep_versions=2,
        min_age_seconds=0, checkpoint=False,
    )
    assert rep2["hits"]["current"] is False


def test_trustrank_is_seeded_refresh_pagerank(spark, tmp_path):
    """Round-15 ask #5: TrustRank == refresh_pagerank(seeds=...) — the
    persisted warm loop serves it directly. The seed list is part of
    the committed knob set, so a seeded schedule quiesces on a quiet
    graph and a seed-list change recomputes."""
    from auto_data_linkage_spark.operators import manifestfs as M
    from auto_data_linkage_spark.operators.graph import (
        edge_store_sink,
        init_edge_store,
        load_ranks,
        pagerank,
        refresh_pagerank,
    )

    store = str(tmp_path / "edges")
    init_edge_store(store, n_buckets=2)
    pages = TestEdgeStore()._pages
    sink = edge_store_sink(store, app_id="crawl")
    sink(pages(spark, 0, 40), 0)

    seeds = ["ref0.org", "ref1.org"]
    kw = dict(warm=True, persist=True, iterations=6, seeds=seeds)
    r1 = refresh_pagerank(spark, store, **kw)
    # identical to a direct seeded pagerank over the same edges
    from auto_data_linkage_spark.operators.graph import load_edges

    direct = pagerank(load_edges(spark, store), iterations=6, seeds=seeds)
    assert sorted(map(tuple, r1.collect())) == sorted(
        map(tuple, direct.collect())
    )
    meta = M.read_manifest(store)["meta"]
    assert meta["ranks"]["params"]["seeds"] == sorted(seeds)

    # quiet graph + same seeds -> quiesce
    s: dict = {}
    refresh_pagerank(spark, store, stats=s, **kw)
    assert s.get("skipped") is True

    # seed-list change -> recompute (different trust base)
    s2: dict = {}
    r3 = refresh_pagerank(
        spark, store, stats=s2, warm=True, persist=True,
        iterations=6, seeds=["ref2.org"],
    )
    assert s2.get("skipped") is None
    assert sorted(map(tuple, load_ranks(spark, store).collect())) == sorted(
        map(tuple, r3.collect())
    )


class TestAdaptiveDriverPath:
    """r15: small graphs run the exact-integer loop driver-side
    (pagerank/hits ``driver_threshold``, the connected_components
    adaptive-execution convention). The contract is BIT-IDENTITY with
    the distributed loop — pinned here by running both paths on the
    same graphs, including the seeded, warm-started, and early-stop
    variants."""

    def _edges(self, spark, pairs):
        return spark.createDataFrame(
            [(s, d) for s, d in pairs], "src_domain string, dst_domain string"
        )

    def test_pagerank_driver_equals_distributed(self, spark):
        e = self._edges(
            spark,
            [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("x", "a"),
             ("d", "d"), ("a", "b")],  # self-loop + dup exercised
        )
        fast = pagerank(e, iterations=4)
        slow = pagerank(e, iterations=4, driver_threshold=0)
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, slow.collect())
        )
        assert dict(fast.dtypes) == dict(slow.dtypes)

    def test_pagerank_driver_seeds_and_stats(self, spark):
        e = self._edges(
            spark, [("a", "b"), ("b", "a"), ("c", "a"), ("c", "d")]
        )
        sf, ss = {}, {}
        fast = pagerank(
            e, iterations=6, seeds=["a"], tol_scaled=0, stats=sf
        )
        slow = pagerank(
            e, iterations=6, seeds=["a"], tol_scaled=0, stats=ss,
            driver_threshold=0,
        )
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, slow.collect())
        )
        assert sf == ss  # iterations_run + final_l1 identical

    def test_pagerank_driver_warm_start(self, spark):
        e = self._edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        r0 = pagerank(e, iterations=2)
        e2 = self._edges(
            spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
        )
        fast = pagerank(e2, iterations=2, init_ranks=r0)
        slow = pagerank(
            e2, iterations=2, init_ranks=r0, driver_threshold=0
        )
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, slow.collect())
        )

    def test_pagerank_no_seed_in_graph_raises_on_driver_path(self, spark):
        e = self._edges(spark, [("a", "b")])
        with pytest.raises(ValueError, match="no seed domain"):
            pagerank(e, iterations=2, seeds=["zz"])

    def test_hits_driver_equals_distributed(self, spark):
        from auto_data_linkage_spark.operators.graph import hits

        e = self._edges(
            spark,
            [("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("a1", "h2"),
             ("z", "z")],
        )
        fast = hits(e, iterations=3)
        slow = hits(e, iterations=3, driver_threshold=0)
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, slow.collect())
        )
        assert dict(fast.dtypes) == dict(slow.dtypes)

    def test_empty_graph_driver_path_schema(self, spark):
        from auto_data_linkage_spark.operators.graph import hits

        e = self._edges(spark, []).where("src_domain != src_domain")
        assert pagerank(e, iterations=2).collect() == []
        assert hits(e, iterations=2).collect() == []
