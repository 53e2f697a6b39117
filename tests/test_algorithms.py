"""PageRank goldens on hand-checkable graphs."""

import pytest

from grafink_spark.graph.algorithms import pagerank


def _edges(spark, pairs):
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src long, dst long")


def test_two_node_cycle_is_uniform(spark):
    pr = {r.id: r.rank for r in pagerank(_edges(spark, [(1, 2)]), iters=5).collect()}
    assert pr[1] == pytest.approx(0.5)
    assert pr[2] == pytest.approx(0.5)


def test_star_center_dominates_and_mass_conserved(spark):
    # undirected star: center 0, leaves 1..4 — no dangling nodes, so
    # total mass stays 1
    pr = {
        r.id: r.rank
        for r in pagerank(
            _edges(spark, [(0, i) for i in range(1, 5)]), iters=4
        ).collect()
    }
    assert pr[0] > max(pr[i] for i in range(1, 5))
    assert sum(pr.values()) == pytest.approx(1.0)
    # leaves are symmetric
    leaf = pr[1]
    assert all(pr[i] == pytest.approx(leaf) for i in range(2, 5))


def test_directed_chain_ranks_increase_downstream(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    pr = {r.id: r.rank for r in pagerank(df, iters=3).collect()}
    assert pr[1] < pr[2] < pr[3]


def test_triangle_counts_k4_pendant_and_disjoint(spark):
    from grafink_spark.graph.algorithms import triangle_counts

    edges = spark.createDataFrame(
        # K4 on 1-4, pendant 5, disjoint triangle 6-7-8; includes
        # reverse duplicates and a self-loop to exercise normalization
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
         (6, 7), (7, 8), (8, 6), (2, 1), (3, 1), (5, 5)],
        "src long, dst long",
    )
    out = {r["id"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3, 6: 1, 7: 1, 8: 1}


def test_triangle_counts_star_has_none(spark):
    from grafink_spark.graph.algorithms import triangle_counts

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    assert triangle_counts(edges).count() == 0


def test_k_core_clique_survives_tail_peels(spark):
    from grafink_spark.graph.algorithms import k_core

    # 4-clique {1,2,3,4} + tail 4-5-6: the tail peels, the clique stays
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        "src long, dst long",
    )
    out = {r.id: r.core_degree for r in k_core(edges, k=3, rounds=4).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_k_core_cascade_and_cycle(spark):
    from grafink_spark.graph.algorithms import k_core

    # path 1-2-3-4-5 fully cascades at k=2; cycle 10-11-12-10 survives
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (12, 10)],
        "src long, dst long",
    )
    out = {r.id: r.core_degree for r in k_core(edges, k=2, rounds=4).collect()}
    assert out == {10: 2, 11: 2, 12: 2}


def test_bfs_distances_chain_and_unreachable(spark):
    from grafink_spark.graph.algorithms import bfs_distances

    # chain 1-2-3-4-5 plus disconnected 9-10
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (9, 10)])
    d = {r.id: r.dist for r in bfs_distances(e, 1, max_hops=6).collect()}
    assert d == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_distances_hop_cap(spark):
    from grafink_spark.graph.algorithms import bfs_distances

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    d = {r.id: r.dist for r in bfs_distances(e, 1, max_hops=2).collect()}
    assert d == {1: 0, 2: 1, 3: 2}


def test_bfs_takes_shortest_route(spark):
    from grafink_spark.graph.algorithms import bfs_distances

    # 1-2-3-4 chain plus shortcut 1-4
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    d = {r.id: r.dist for r in bfs_distances(e, 1, max_hops=5).collect()}
    assert d[4] == 1
    assert d[3] == 2  # via the shortcut, not the 3-hop chain


def test_adamic_adar_path_graph(spark):
    import math

    from grafink_spark.graph.algorithms import adamic_adar

    # path 1-2-3: only candidate pair (1,3) with common neighbor 2
    # (deg 2) → aa = 1/ln(2)
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    rows = adamic_adar(e, min_common=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.a, r.b, r.common_neighbors) == (1, 3, 1)
    assert r.aa_score == round(1.0 / math.log(2.0), 6)


def test_adamic_adar_excludes_existing_edges(spark):
    from grafink_spark.graph.algorithms import adamic_adar

    # triangle: every pair adjacent → no candidates
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    assert adamic_adar(e, min_common=1).count() == 0


def test_adamic_adar_min_common_filter(spark):
    from grafink_spark.graph.algorithms import adamic_adar

    # square 1-2-4-3-1: pair (1,4) has common neighbors {2,3}, pair
    # (2,3) has {1,4}; with min_common=2 both survive, each aa =
    # 2/ln(2)
    e = spark.createDataFrame(
        [(1, 2), (2, 4), (3, 4), (1, 3)], "src long, dst long"
    )
    rows = {(r.a, r.b): r.common_neighbors for r in adamic_adar(e, min_common=2).collect()}
    assert rows == {(1, 4): 2, (2, 3): 2}


def test_shortest_paths_weighted_detour(spark):
    from grafink_spark.graph.algorithms import shortest_paths

    # direct 1→3 costs 10; detour 1→2→3 costs 3+4=7
    e = spark.createDataFrame(
        [(1, 3, 10.0), (1, 2, 3.0), (2, 3, 4.0)],
        "src long, dst long, weight double",
    )
    both = e.unionByName(
        e.selectExpr("dst as src", "src as dst", "weight")
    )
    d = {r.id: r.dist for r in shortest_paths(both, 1, rounds=4).collect()}
    assert d == {1: 0.0, 2: 3.0, 3: 7.0}


def test_shortest_paths_round_bound(spark):
    from grafink_spark.graph.algorithms import shortest_paths

    # chain 1→2→3→4→5, unit weights; rounds=2 reaches only depth 2
    e = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(1, 5)],
        "src long, dst long, weight double",
    )
    d = {r.id: r.dist for r in shortest_paths(e, 1, rounds=2).collect()}
    assert d == {1: 0.0, 2: 1.0, 3: 2.0}


def test_shortest_paths_parallel_edges_take_min(spark):
    from grafink_spark.graph.algorithms import shortest_paths

    e = spark.createDataFrame(
        [(1, 2, 9.0), (1, 2, 2.0)], "src long, dst long, weight double"
    )
    d = {r.id: r.dist for r in shortest_paths(e, 1, rounds=1).collect()}
    assert d == {1: 0.0, 2: 2.0}


def test_label_propagation_two_communities(spark):
    from grafink_spark.graph.algorithms import label_propagation

    # two triangles {1,2,3} and {10,11,12} joined by bridge 3-10
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        "src long, dst long",
    )
    got = {r.id: r.label for r in label_propagation(edges, iters=3).collect()}
    assert set(got) == {1, 2, 3, 10, 11, 12}
    # triangle 1 coalesces on its min label
    assert got[1] == got[2] == got[3] == 1
    # triangle 2 stays a separate community despite the bridge
    assert got[10] == got[11] == got[12]
    assert got[10] != got[1]


def test_label_propagation_tie_breaks_min_label(spark):
    from grafink_spark.graph.algorithms import label_propagation

    # star: center 5 sees neighbors {1, 9} once each → tie → min = 1
    edges = spark.createDataFrame([(5, 1), (5, 9)], "src long, dst long")
    got = {r.id: r.label for r in label_propagation(edges, iters=1).collect()}
    assert got[5] == 1


def test_personalized_pagerank_concentrates_near_seeds(spark):
    from grafink_spark.graph.algorithms import pagerank, personalized_pagerank

    # two communities bridged by one edge; seed in community A
    edges_list = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    both = edges_list + [(b, a) for a, b in edges_list]
    edges = spark.createDataFrame(both, "src long, dst long")
    ppr = {r.id: r.rank for r in personalized_pagerank(edges, [1], iters=6).collect()}
    # mass concentrates around the seed's community
    assert ppr[1] > ppr[10]
    assert ppr[2] > ppr[11]
    assert min(ppr.values()) >= 0.0
    # differs from global pagerank (which is symmetric across the bridge)
    pr = {r.id: r.rank for r in pagerank(edges, iters=6).collect()}
    assert abs(pr[2] - pr[11]) < 1e-9  # symmetric globally
    assert ppr[2] / max(ppr[11], 1e-12) > 2.0  # strongly asymmetric personalized


def test_multi_source_bfs_matches_single_source(spark):
    from grafink_spark.graph.algorithms import bfs_distances, multi_source_bfs

    edges_list = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    both = edges_list + [(b, a) for a, b in edges_list]
    edges = spark.createDataFrame(both, "src long, dst long")
    multi = {
        (r.seed, r.id): r.dist
        for r in multi_source_bfs(edges, [1, 10], max_hops=6).collect()
    }
    for seed in (1, 10):
        single = {
            r.id: r.dist for r in bfs_distances(edges, seed, max_hops=6).collect()
        }
        assert {i: d for (s, i), d in multi.items() if s == seed} == single
    # components stay separate
    assert (1, 10) not in multi and (10, 1) not in multi


def test_closeness_centrality_golden(spark):
    from grafink_spark.graph.algorithms import closeness_centrality

    # path graph 1-2-3-4-5: from seed 3 (center) dists 1,1,2,2 → 4/6;
    # from seed 1 (end) dists 1,2,3,4 → 4/10
    edges_list = [(1, 2), (2, 3), (3, 4), (4, 5)]
    both = edges_list + [(b, a) for a, b in edges_list]
    edges = spark.createDataFrame(both, "src long, dst long")
    got = {
        r.seed: (r.n_reached, round(r.closeness, 6))
        for r in closeness_centrality(edges, [1, 3], max_hops=6).collect()
    }
    assert got == {1: (5, round(4 / 10, 6)), 3: (5, round(4 / 6, 6))}


def test_multi_source_bfs_string_ids(spark):
    # the frontier schema is typed from the graph's dst column, so
    # string-id graphs (the shape the similarity/dedup graphs use)
    # work without int coercion (r2 review finding)
    from grafink_spark.graph.algorithms import multi_source_bfs

    edges_list = [("a", "b"), ("b", "c"), ("x", "y")]
    both = edges_list + [(b, a) for a, b in edges_list]
    edges = spark.createDataFrame(both, "src string, dst string")
    got = {
        (r.seed, r.id): r.dist
        for r in multi_source_bfs(edges, ["a", "x"], max_hops=3).collect()
    }
    assert got == {
        ("a", "a"): 0, ("a", "b"): 1, ("a", "c"): 2,
        ("x", "x"): 0, ("x", "y"): 1,
    }


def test_hits_star_graph_roles(spark):
    """On a directed star u->{v1..v4}: u is a pure hub (authority 0),
    the leaves are pure authorities (hub 0) with equal normalized
    scores 1/sqrt(4); HITS must separate the roles PageRank merges."""
    from grafink_spark.graph.algorithms import hits

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    got = {r.id: (round(r.hub, 9), round(r.authority, 9)) for r in hits(edges, iters=2).collect()}
    assert got[0] == (1.0, 0.0)
    for i in range(1, 5):
        assert got[i] == (0.0, 0.5)


def test_hits_rejects_zero_iters(spark):
    import pytest

    from grafink_spark.graph.algorithms import hits

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        hits(edges, iters=0)


def test_reliable_checkpoint_dir_matches_local_path(spark, tmp_path):
    """checkpoint_dir routes lineage cuts through reliable
    df.checkpoint() (files land under the dir — executor-loss-proof on
    a real cluster) and the results are identical to the default
    localCheckpoint path, across the iterative family."""
    import os

    from grafink_spark.graph.algorithms import hits, pagerank
    from grafink_spark.llm.dedup import connected_components

    ckpt = str(tmp_path / "ckpt")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)], "src long, dst long"
    )

    pr_local = {r.id: round(r.rank, 12) for r in pagerank(edges, iters=3).collect()}
    pr_ckpt = {
        r.id: round(r.rank, 12)
        for r in pagerank(edges, iters=3, checkpoint_dir=ckpt).collect()
    }
    assert pr_local == pr_ckpt

    h_local = {r.id: (round(r.hub, 12), round(r.authority, 12)) for r in hits(edges).collect()}
    h_ckpt = {
        r.id: (round(r.hub, 12), round(r.authority, 12))
        for r in hits(edges, checkpoint_dir=ckpt).collect()
    }
    assert h_local == h_ckpt

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    cc = {
        r.doc_id: r.component_id
        for r in connected_components(pairs, checkpoint_dir=ckpt).collect()
    }
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    # reliable checkpoints actually landed on the shared dir
    found = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert found, "no checkpoint files written to checkpoint_dir"


def test_betweenness_path_graph_golden(spark):
    """Path a-b-c-d-e, all vertices as seeds: raw Brandes dependency
    sums are {b:6, c:8, d:6}, endpoints 0 (ordered-pair convention)."""
    from grafink_spark.graph.algorithms import betweenness_sampled

    und = [(i, i + 1) for i in range(4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    out = {
        r.id: round(r.betweenness, 9)
        for r in betweenness_sampled(
            edges, sources=[0, 1, 2, 3, 4], max_hops=4
        ).collect()
    }
    assert out == {0: 0.0, 1: 6.0, 2: 8.0, 3: 6.0, 4: 0.0}


def test_betweenness_diamond_splits_paths(spark):
    """Diamond a→{b,c}→d (directed, seeds=[a]): two equal shortest
    paths, so b and c each carry δ = 1/2."""
    from grafink_spark.graph.algorithms import betweenness_sampled

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    out = {
        r.id: r.betweenness
        for r in betweenness_sampled(edges, [0], max_hops=3).collect()
    }
    assert out[1] == 0.5 and out[2] == 0.5 and out[3] == 0.0


def test_betweenness_isolated_seed_empty(spark):
    from grafink_spark.graph.algorithms import betweenness_sampled

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    assert betweenness_sampled(edges, [99], max_hops=2).count() == 0


def test_inexact_paths_agree_with_exact_to_ulp(spark):
    """exact=False (plain-double production sums) must agree with the
    decimal oracle path to floating-point noise on every algorithm
    that offers the swap."""
    from grafink_spark.graph.algorithms import hits, personalized_pagerank

    edges = spark.createDataFrame(
        [(a, b) for a in range(12) for b in range(12)
         if a != b and (a * 7 + b) % 3 == 0],
        "src long, dst long",
    )
    for fn, kw, cols in (
        (pagerank, {"iters": 3}, ["rank"]),
        (personalized_pagerank, {"seeds": [0, 1], "iters": 3}, ["rank"]),
        (hits, {"iters": 2}, ["hub", "authority"]),
    ):
        ex = {r["id"]: r for r in fn(edges, **kw).collect()}
        fast = {r["id"]: r for r in fn(edges, exact=False, **kw).collect()}
        assert ex.keys() == fast.keys()
        for vid in ex:
            for c in cols:
                assert abs(ex[vid][c] - fast[vid][c]) < 1e-9, (fn, vid, c)


def test_katz_star_graph_golden(spark):
    """Star graph (all leaves -> hub): after 2 rounds the hub scores
    beta + alpha*k*(beta + alpha*... ) — hand-computed; leaves getting
    nothing stay at beta + alpha*hub-feedback only if edges exist both
    ways. Directed here: only the hub accumulates."""
    from grafink_spark.graph.algorithms import katz_centrality

    k = 4
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, k + 1)], "src long, dst long"
    )
    out = {r.id: r.katz for r in katz_centrality(edges, iters=2, alpha=0.1, beta=1.0).collect()}
    # round 1: hub = 1 + 0.1*4*1 = 1.4; leaves = 1.0 (no in-edges)
    # round 2: hub = 1 + 0.1*4*1.0 = 1.4 (leaves unchanged feed it)
    assert abs(out[0] - 1.4) < 1e-12
    for i in range(1, k + 1):
        assert abs(out[i] - 1.0) < 1e-12


def test_katz_hub_neighbor_beats_pagerank_split(spark):
    """The vertex pointed at by a high-out-degree hub keeps the full
    attenuated credit (no out-degree division) — the semantic
    difference from PageRank."""
    from grafink_spark.graph.algorithms import katz_centrality

    # hub 0 points at 1..5; vertex 9 is pointed at by leaf 6 only
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(6, 9)], "src long, dst long"
    )
    out = {r.id: r.katz for r in katz_centrality(edges, iters=1, alpha=0.1).collect()}
    # both receive one in-edge from a beta=1 source: equal katz —
    # PageRank would give 9 five times the credit of each of 1..5
    assert abs(out[1] - out[9]) < 1e-12
