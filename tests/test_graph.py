"""PageRank sanity on a planted graph + plan discipline (oracle parity at
sf0.01 is already enforced by test_oracle_parity.py)."""

from __future__ import annotations

import pandas as pd

from tdk_apache_log_etl_spark.operators import QUERIES
from tdk_apache_log_etl_spark.operators.graph import HITS_SCALE, RANK_SCALE

from .conftest import SF_DIR_SMOKE


def _lineitem(tmp_path, orders):
    # orders: list of part-key baskets; one synthetic lineitem row per part
    rows = []
    for okey, basket in enumerate(orders):
        for i, part in enumerate(basket):
            rows.append((okey, part, 1, i + 1))
    pd.DataFrame(
        rows, columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    ).to_parquet(tmp_path / "lineitem.parquet")
    return str(tmp_path)


def test_hub_outranks_leaves(spark, tmp_path):
    # Star through part 0: orders {0,1}, {0,2}, {0,3} (each placed twice —
    # MIN_COOCCUR prunes single co-occurrences) → part 0 has three
    # in-edges (each leaf's only neighbor), leaves one each from the hub.
    sf = _lineitem(tmp_path, [[0, 1], [0, 2], [0, 3]] * 2)
    ranks = {
        r.part_key: r.pagerank
        for r in QUERIES["pagerank_part_graph"](spark, sf).collect()
    }
    assert set(ranks) == {0, 1, 2, 3}
    assert ranks[0] > ranks[1] == ranks[2] == ranks[3]
    # total mass stays near N·S: floor-division loses < 1 unit per edge
    # per iteration, never gains
    assert sum(ranks.values()) <= 4 * RANK_SCALE


def test_symmetric_pair_ranks_equal_fixed_point(spark, tmp_path):
    # Two nodes, one mutual edge, outdeg 1 each: the iteration maps
    # S -> 0.15S + 0.85S = S exactly, so ranks stay at the fixed point.
    sf = _lineitem(tmp_path, [[7, 9]] * 2)
    ranks = {
        r.part_key: r.pagerank
        for r in QUERIES["pagerank_part_graph"](spark, sf).collect()
    }
    assert ranks == {7: RANK_SCALE, 9: RANK_SCALE}


def test_triangle_count_planted(spark, tmp_path):
    # Parts {1,2,3} form a triangle (basket ordered twice to clear
    # MIN_COOCCUR); part 4 hangs off part 1 without closing anything.
    sf = _lineitem(tmp_path, [[1, 2, 3], [1, 2, 3], [1, 4], [1, 4]])
    row = QUERIES["triangle_count_part_graph"](spark, sf).collect()[0]
    assert row.n_triangles == 1
    assert row.n_edges == 4  # {1-2, 1-3, 2-3, 1-4} oriented low->high


def test_edges_built_once_via_cache(spark):
    # The K iterations must reuse the persisted edge frame, not re-run the
    # lineitem self-join per iteration: the plan shows InMemoryTableScan
    # and exactly one in-memory relation build.
    plan = (
        QUERIES["pagerank_part_graph"](spark, SF_DIR_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "InMemoryTableScan" in plan


def test_lpa_clique_converges_to_one_community(spark, tmp_path):
    # A 3-clique {1,2,3} (two identical baskets clear MIN_COOCCUR) plus
    # an isolated pair {4,5}. The clique must end in ONE community; the
    # pair oscillates bipartitely under synchronous LPA (a known
    # artifact) but deterministically — 5 nodes total, sizes [1,1,3].
    sf = _lineitem(tmp_path, [[1, 2, 3], [1, 2, 3], [4, 5], [4, 5]])
    out = QUERIES["lpa_communities_part_graph"](spark, sf).collect()
    sizes = sorted(r.n_members for r in out)
    assert sum(sizes) == 5
    assert sizes == [1, 1, 3]


def test_kcore_planted_clique_pendant_cycle(spark, tmp_path):
    # K4 on {1,2,3,4} (degree 3 each) survives the 3-core; a pendant 5
    # hung off node 1 peels in round one; a 4-cycle {6,7,8,9} (degree 2)
    # peels entirely. Duplicate baskets clear MIN_COOCCUR.
    baskets = (
        [[1, 2, 3, 4]] * 2
        + [[1, 5]] * 2
        + [[6, 7], [7, 8], [8, 9], [9, 6]] * 2
    )
    sf = _lineitem(tmp_path, baskets)
    rows = {r.node: r.core_degree for r in
            QUERIES["kcore_part_graph"](spark, sf).collect()}
    assert rows == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_matches_pure_python_peel(spark):
    from tdk_apache_log_etl_spark.operators.graph import (
        K_CORE,
        significant_pairs,
    )

    got = {r.node: r.core_degree for r in
           QUERIES["kcore_part_graph"](spark, SF_DIR_SMOKE).collect()}
    adj: dict[int, set[int]] = {}
    for r in significant_pairs(spark, SF_DIR_SMOKE).collect():
        adj.setdefault(r.src, set()).add(r.dst)
    # reference peel: remove any node with degree < k until fixpoint
    alive = set(adj)
    changed = True
    while changed:
        changed = False
        for n in list(alive):
            if len(adj[n] & alive) < K_CORE:
                alive.discard(n)
                changed = True
    expect = {n: len(adj[n] & alive) for n in alive}
    assert got == expect and got  # non-degenerate on the smoke corpus


def test_link_prediction_planted_wedges(spark, tmp_path):
    # a=1 and b=2 share neighbors {10, 11} but never co-order; a also
    # has private neighbor 20. Jaccard(1,2) = 2/(3+2-2) = 2/3;
    # Jaccard(10,11) = 2/(2+2-2) = 1.0 (both see exactly {1, 2}).
    baskets = (
        [[1, 10]] * 2 + [[1, 11]] * 2 + [[2, 10]] * 2 + [[2, 11]] * 2
        + [[1, 20]] * 2
    )
    sf = _lineitem(tmp_path, baskets)
    rows = QUERIES["link_prediction_jaccard"](spark, sf).collect()
    by_pair = {(r.node, r.predicted): r for r in rows}
    assert by_pair[(1, 2)].common_neighbors == 2
    assert abs(by_pair[(1, 2)].jaccard - 2 / 3) < 1e-15
    assert by_pair[(10, 11)].jaccard == 1.0
    # no predicted pair may be an existing edge
    edges = {(1, 10), (1, 11), (2, 10), (2, 11), (1, 20)}
    edges |= {(b, a) for a, b in edges}
    assert edges.isdisjoint(by_pair)


def test_hits_planted_bipartite(spark, tmp_path):
    # c1 buys parts {10, 11, 12}; c2 buys {10}. Part 10 is pointed at by
    # both hubs → top authority (pinned to the max-norm scale); 11 and 12
    # are symmetric → equal; c1's basket covers every authority → top hub.
    pd.DataFrame(
        [(0, 1), (1, 1), (2, 1), (3, 2)],
        columns=["o_orderkey", "o_custkey"],
    ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(
        [(0, 10), (1, 11), (2, 12), (3, 10)],
        columns=["l_orderkey", "l_partkey"],
    ).to_parquet(tmp_path / "lineitem.parquet")
    rows = QUERIES["hits_purchase_graph"](spark, str(tmp_path)).collect()
    auth = {r.node_key: r.score for r in rows if r.node_type == "part"}
    hub = {r.node_key: r.score for r in rows if r.node_type == "customer"}
    assert auth[10] == HITS_SCALE  # max-normalized top authority
    assert auth[11] == auth[12] < auth[10]
    assert hub[1] == HITS_SCALE and hub[2] < hub[1]


def test_weighted_sssp_prefers_cheap_strong_edges(spark, tmp_path):
    # Star from part 1: edge 1-2 co-ordered 100 times (cost 1+100//100=2),
    # edge 1-3 co-ordered twice (cost 1+100//2=51). Source = the degree-2
    # hub = part 1. A disconnected pair {8,9} is unreachable -> absent.
    sf = _lineitem(
        tmp_path, [[1, 2]] * 100 + [[1, 3]] * 2 + [[8, 9]] * 2
    )
    dist = {
        r.part_key: r.dist
        for r in QUERIES["weighted_sssp_part_graph"](spark, sf).collect()
    }
    assert dist == {1: 0, 2: 2, 3: 51}


def test_sssp_takes_cheaper_two_hop_detour(spark, tmp_path):
    # Direct edge 1-3 is weak (2 co-orders -> cost 51); the detour 1-2-3
    # uses two strong edges (100 co-orders -> cost 2 each, total 4).
    # Bellman-Ford must return 4, not 51.
    sf = _lineitem(
        tmp_path, [[1, 3]] * 2 + [[1, 2]] * 100 + [[2, 3]] * 100
    )
    dist = {
        r.part_key: r.dist
        for r in QUERIES["weighted_sssp_part_graph"](spark, sf).collect()
    }
    assert dist[3] == 4
    assert dist[2] == 2


def test_ppr_mass_localizes_at_source_component(spark, tmp_path):
    # Two disconnected mutual pairs {1,2} and {8,9}: personalized restart
    # pins all mass to node 1's component; 8/9 never receive rank and are
    # excluded from the output.
    sf = _lineitem(tmp_path, [[1, 2]] * 2 + [[8, 9]] * 2)
    ppr = {
        r.part_key: r.ppr
        for r in QUERIES["ppr_part_graph"](spark, sf).collect()
    }
    assert set(ppr) == {1, 2}
    # both ends of the source's component carry mass; total mass never
    # exceeds the injected restart mass (floor division only loses units,
    # never gains) — on a 2-cycle K=5 truncation still oscillates, so no
    # ordering between the two is asserted, only locality + conservation
    assert ppr[1] > 0 and ppr[2] > 0
    assert sum(ppr.values()) <= RANK_SCALE


def test_closeness_perfect_hub(spark, tmp_path):
    # Star 0-{1,2,3}: the only seed (0 % 50 == 0) reaches everyone at
    # distance 1 -> normalized closeness ((4-1)/(4-1))*((4-1)/3) = 1.0.
    sf = _lineitem(tmp_path, [[0, 1], [0, 2], [0, 3]] * 2)
    out = QUERIES["hub_closeness_centrality"](spark, sf).collect()
    assert len(out) == 1
    [r] = out
    assert (r.part_key, r.n_reached, r.sum_dist) == (0, 4, 3)
    assert r.closeness == 1.0


def test_star_graph_assortativity_minus_one(spark, tmp_path):
    # Star through part 0 (same fixture as the PageRank pin): every edge
    # joins the deg-3 hub to a deg-1 leaf, the maximally DISassortative
    # shape — r = −1.0 exactly (integer moments, perfect-square sqrt).
    sf = _lineitem(tmp_path, [[0, 1], [0, 2], [0, 3]] * 2)
    [r] = QUERIES["degree_assortativity_part_graph"](spark, sf).collect()
    assert r.n_edges_directed == 6
    assert r.assortativity == -1.0


def test_resource_alloc_star_leaves(spark, tmp_path):
    # Star through hub 0 (deg 3): leaf pairs (1,2),(1,3),(2,3) share only
    # the hub, so RA = floor(1e9 / 3) for each; hub-leaf pairs are edges
    # (excluded). Integer-exact.
    from tdk_apache_log_etl_spark.operators.graph import RA_SCALE

    sf = _lineitem(tmp_path, [[0, 1], [0, 2], [0, 3]] * 2)
    rows = QUERIES["link_prediction_resource_alloc"](spark, sf).collect()
    got = {(r.node, r.predicted): r for r in rows}
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    for r in rows:
        assert r.ra_scaled == RA_SCALE // 3
        assert r.common_neighbors == 1


def test_kcore_invariant_audit_planted_and_parity(spark, tmp_path):
    # planted clique+pendant+cycle graph: all invariants must hold and
    # n_deg_ge_k must count exactly the nodes with full-graph degree >= 3
    baskets = (
        [[1, 2, 3, 4]] * 2
        + [[1, 5]] * 2
        + [[6, 7], [7, 8], [8, 9], [9, 6]] * 2
    )
    sf = _lineitem(tmp_path, baskets)
    r = QUERIES["kcore_invariant_audit"](spark, sf).collect()[0]
    # node 1 has degree 4 (clique + pendant); 2,3,4 have 3; others < 3
    assert (r.k, r.n_deg_ge_k) == (3, 4)
    assert r.min_degree_ok and r.degree_report_ok
    assert r.maximal_ok and r.size_bound_ok
    # oracle parity on the planted graph too
    from tdk_apache_log_etl_spark.operators import ORACLES

    from .parity import compare

    ok, detail = compare(
        spark,
        "kcore_invariant_audit",
        QUERIES["kcore_invariant_audit"],
        ORACLES["kcore_invariant_audit"],
        sf,
    )
    assert ok, detail
