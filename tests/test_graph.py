"""Graph-analytics operator tests: join-based PageRank vs an
independent dense numpy reference on a planted digraph (including a
dangling node and parallel edges), and the degree histogram."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

# a->b, a->c, b->c, c->a, d->c (d has no in-edges; parallel edge a->b
# twice so edge multiplicity matters), e is dangling-only (appears as
# dst; contributes nothing, keeps teleport mass)
EDGES = [("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"),
         ("c", "a"), ("d", "c"), ("c", "e")]


def _numpy_pagerank(edges, iterations=3, damping=0.85):
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1 - damping) / n)
        for s, d in edges:
            nxt[idx[d]] += damping * r[idx[s]] / out[idx[s]]
        r = nxt
    return {m: r[idx[m]] * n for m in nodes}


@pytest.fixture(scope="module")
def edge_ds(ray_session):
    return rd.from_pandas(pd.DataFrame(EDGES, columns=["src", "dst"]))


def test_pagerank_matches_numpy_reference(edge_ds):
    from omop2obo_ray.pipelines.graph import pagerank

    got = (pagerank(edge_ds, iterations=3, damping=0.85)
           .to_pandas().set_index("node")["rank"])
    want = _numpy_pagerank(EDGES)
    assert set(got.index) == set(want)
    for node, w in want.items():
        assert got[node] == pytest.approx(w, rel=1e-12), node
    # sanity: c receives the most mass (3 in-edges), e the least
    # among receivers of teleport-only "d"
    assert got["c"] == got.max()
    assert got["d"] == got.min()


def test_pagerank_iterations_change_result(edge_ds):
    from omop2obo_ray.pipelines.graph import pagerank

    r1 = (pagerank(edge_ds, iterations=1).to_pandas()
          .set_index("node")["rank"])
    r3 = (pagerank(edge_ds, iterations=3).to_pandas()
          .set_index("node")["rank"])
    assert not np.allclose(sorted(r1), sorted(r3))


def test_degree_stats(edge_ds):
    from omop2obo_ray.pipelines.graph import degree_stats

    got = (degree_stats(edge_ds).to_pandas()
           .set_index("degree")["n_nodes"].to_dict())
    # out-degrees: a=3 (parallel edges count), b=1, c=2, d=1
    assert got == {3: 1, 1: 2, 2: 1}


def test_connected_components_planted(ray_session):
    from omop2obo_ray.pipelines.graph import connected_components

    # two components: {a,b,c} via chain, {x,y} — plus no isolated nodes
    edges = pd.DataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], columns=["src", "dst"])
    got = (connected_components(rd.from_pandas(edges)).to_pandas()
           .set_index("node")["component"].to_dict())
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    # method= front door routes to the alternating algorithm
    alt = (connected_components(rd.from_pandas(edges), method="alternating")
           .to_pandas().set_index("node")["component"].to_dict())
    assert alt == got


def _union_find(edges):
    """Driver-side oracle: component = min member id."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_alternating_cc_long_path(ray_session):
    """A 200-hop path: min-label propagation would need ~200 rounds
    (beyond its cap); large-star/small-star converges in O(log n)."""
    from omop2obo_ray.pipelines.graph import connected_components_alternating

    names = [f"n{i:04d}" for i in range(201)]
    edges = pd.DataFrame({"src": names[:-1], "dst": names[1:]})
    stats: dict = {}
    got = (connected_components_alternating(rd.from_pandas(edges),
                                            n_coarse=8, stats=stats,
                                            local_below=0)
           .to_pandas().set_index("node")["component"].to_dict())
    assert got == {n: "n0000" for n in names}
    # paper bound is O(log n); allow generous slack over log2(201)≈7.7
    assert 0 < stats["rounds"] <= 20, stats

    # endgame local-finish (default): identical labels, one task
    stats2: dict = {}
    got2 = (connected_components_alternating(rd.from_pandas(edges),
                                             n_coarse=8, stats=stats2)
            .to_pandas().set_index("node")["component"].to_dict())
    assert got2 == got and stats2.get("local_finish") is True


def test_alternating_cc_random_matches_union_find(ray_session):
    from omop2obo_ray.pipelines.graph import connected_components_alternating

    rng = np.random.default_rng(11)
    n = 400
    pairs = rng.integers(0, n, size=(420, 2))
    edges = [(f"v{a:03d}", f"v{b:03d}") for a, b in pairs]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    want = _union_find([(a, b) for a, b in edges if a != b])

    got = (connected_components_alternating(rd.from_pandas(df), n_coarse=8)
           .to_pandas().set_index("node")["component"].to_dict())
    assert got == want


def test_alternating_cc_int_keys_and_self_loops(ray_session):
    from omop2obo_ray.pipelines.graph import connected_components_alternating

    df = pd.DataFrame({"src": [1, 2, 7, 9], "dst": [2, 3, 7, 9]})
    got = (connected_components_alternating(rd.from_pandas(df), n_coarse=8)
           .to_pandas().set_index("node")["component"].to_dict())
    # self-loop-only nodes (7, 9) are not emitted, like isolated nodes
    assert got == {1: 1, 2: 1, 3: 1}


def test_extract_anchors_edge_cases():
    from omop2obo_ray.functions.html import extract_anchors

    html = (b"<html><body>"
            b"<a href=\"https://a.com/1\">one</a>"
            b"<A HREF='https://b.com/2'>two</A>"               # caps + single quotes
            b"<a rel=nofollow title='x' href = \"/rel/path\">three</a>"  # attr order + spaces
            b"<a href=\"https://c.com/?a=1&amp;b=2\">four</a>"  # entity unescape
            b"<a name=\"no-href\">five</a>"                     # no href
            b"<a href=''>empty</a>"                             # empty href drops
            b"<p>no anchors here</p></body></html>")
    assert extract_anchors(html) == [
        "https://a.com/1", "https://b.com/2", "/rel/path",
        "https://c.com/?a=1&b=2"]
    assert extract_anchors(None) == []
    assert extract_anchors(b"<p>none</p>") == []


def test_anchor_edges_to_pagerank(ray_session):
    # end-to-end: synthesized pages → anchor parser → edge Dataset →
    # degree histogram (ties the pages table to the graph family)
    import ray.data as rd

    from omop2obo_ray.pipelines.graph import (anchor_edges, degree_stats,
                                              synth_anchor_pages)

    docs = rd.from_items([{"doc_id": i} for i in range(40)])
    edges = anchor_edges(synth_anchor_pages(docs))
    df = edges.to_pandas()
    assert len(df) == 120                      # 3 anchors per page
    assert df["src"].nunique() == 40
    deg = degree_stats(edges).to_pandas()
    assert deg["n_nodes"].sum() == 40 and set(deg["degree"]) == {3}


def _brute_triangles(edges):
    es = set()
    for u, v in edges:
        if u != v:
            es.add((min(u, v), max(u, v)))
    nodes = sorted({n for e in es for n in e})
    n = 0
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in es:
                continue
            for c in nodes:
                if c > b and (a, c) in es and (b, c) in es:
                    n += 1
    return n


def test_triangle_count_known_graphs(ray_session):
    import ray.data as rd

    from omop2obo_ray.pipelines.graph import triangle_count

    def tc(edges):
        ds = rd.from_items([{"src": s, "dst": d} for s, d in edges])
        return triangle_count(ds).to_pandas()["n_triangles"].iloc[0]

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    assert tc(k4) == 4
    assert tc([("a", "b"), ("b", "c"), ("c", "d")]) == 0      # path
    assert tc([("h", x) for x in "abcdefg"]) == 0             # star hub
    # dup / reversed / self-loop edges must not change the count
    tri = [("x", "y"), ("y", "z"), ("z", "x"),
           ("y", "x"), ("x", "y"), ("z", "z")]
    assert tc(tri) == 1


def test_triangle_count_matches_bruteforce_random(ray_session):
    import ray.data as rd

    from omop2obo_ray.pipelines.graph import triangle_count

    rng = np.random.default_rng(5)
    edges = [(f"v{rng.integers(0, 40)}", f"v{rng.integers(0, 40)}")
             for _ in range(300)]
    got = triangle_count(
        rd.from_items([{"src": s, "dst": d} for s, d in edges])
        .repartition(8)).to_pandas()["n_triangles"].iloc[0]
    assert got == _brute_triangles(edges)


def test_hits_matches_numpy_reference(ray_session):
    import ray.data as rd

    from omop2obo_ray.pipelines.graph import hits

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("d", "c"), ("a", "b")]          # dup edge dedups
    got = (hits(rd.from_items([{"src": s, "dst": d} for s, d in edges]),
                iterations=2).to_pandas().set_index("node"))

    es = sorted(set(edges))
    nodes = sorted({n for e in es for n in e})
    # engine after 2 iterations: a1=indeg (h0≡1); h1 from a1; a2 from
    # h1; hub=h2 from a2, auth=a2
    a1 = {n: 0 for n in nodes}
    for _s, d in es:
        a1[d] += 1
    h1 = {n: 0 for n in nodes}
    for s, d in es:
        h1[s] += a1[d]
    a2 = {n: 0 for n in nodes}
    for s, d in es:
        a2[d] += h1[s]
    h2 = {n: 0 for n in nodes}
    for s, d in es:
        h2[s] += a2[d]
    for n in nodes:
        assert got.loc[n, "hub"] == h2[n], n
        assert got.loc[n, "auth"] == a2[n], n


# ---------------------------------------------------------------------------
# clustering coefficient / BFS hops / k-core
# ---------------------------------------------------------------------------

def _simple_undirected(edges):
    es = set()
    for u, v in edges:
        if u != v:
            es.add((min(u, v), max(u, v)))
    return es


def _brute_clustering(edges):
    es = _simple_undirected(edges)
    adj: dict[str, set[str]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for n, nb in adj.items():
        d = len(nb)
        nbl = sorted(nb)
        t = sum(1 for i, x in enumerate(nbl) for y in nbl[i + 1:]
                if (min(x, y), max(x, y)) in es)
        out[n] = (d, t, 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0)
    return out


def test_clustering_coefficient_matches_bruteforce(ray_session):
    from omop2obo_ray.pipelines.graph import clustering_coefficient

    rng = np.random.default_rng(11)
    edges = [(f"v{rng.integers(0, 30)}", f"v{rng.integers(0, 30)}")
             for _ in range(200)]
    got = (clustering_coefficient(
        rd.from_items([{"src": s, "dst": d} for s, d in edges])
        .repartition(8)).to_pandas().set_index("node"))
    want = _brute_clustering(edges)
    assert set(got.index) == set(want)
    for n, (d, t, c) in want.items():
        assert got.loc[n, "d"] == d, n
        assert got.loc[n, "tri"] == t, n
        assert got.loc[n, "coeff"] == pytest.approx(c, abs=1e-12), n


def test_clustering_coefficient_triangle_free(ray_session):
    # path graph: wedges exist but close nothing → all-zero tri/coeff
    # (regression: the empty closed-wedge set must not feed a join —
    # zero-row blocks are schema-less after the exchange)
    from omop2obo_ray.pipelines.graph import clustering_coefficient

    edges = [(f"p{i}", f"p{i+1}") for i in range(6)]
    got = (clustering_coefficient(
        rd.from_items([{"src": s, "dst": d} for s, d in edges]))
        .to_pandas().set_index("node"))
    assert len(got) == 7
    assert (got["tri"] == 0).all()
    assert (got["coeff"] == 0.0).all()
    assert got.loc["p0", "d"] == 1 and got.loc["p3", "d"] == 2


def _brute_bfs(edges, seeds, max_hops, directed):
    adj: dict[str, set[str]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for k in range(1, max_hops + 1):
        nxt = {d for f in frontier for d in adj.get(f, ())
               if d not in dist}
        for n in nxt:
            dist[n] = k
        frontier = nxt
        if not frontier:
            break
    return dist


def test_bfs_hops_matches_python_oracle(ray_session):
    from omop2obo_ray.pipelines.graph import bfs_hops

    rng = np.random.default_rng(3)
    edges = [(f"v{rng.integers(0, 60)}", f"v{rng.integers(0, 60)}")
             for _ in range(150)]
    ds = rd.from_items([{"src": s, "dst": d} for s, d in edges]
                       ).repartition(6)
    for directed in (False, True):
        for max_hops in (1, 3):
            got = (bfs_hops(ds, ["v0", "v7"], max_hops=max_hops,
                            directed=directed).to_pandas()
                   .set_index("node")["hops"].to_dict())
            want = _brute_bfs(edges, ["v0", "v7"], max_hops, directed)
            assert got == want, (directed, max_hops)


def test_bfs_hops_seed_not_in_graph_and_empty_seeds(ray_session):
    from omop2obo_ray.pipelines.graph import bfs_hops

    ds = rd.from_items([{"src": "a", "dst": "b"}])
    got = bfs_hops(ds, ["zzz"], max_hops=2).to_pandas()
    assert got["node"].tolist() == ["zzz"] and got["hops"].tolist() == [0]
    with pytest.raises(ValueError):
        bfs_hops(ds, [], max_hops=2)


def _brute_kcore(edges, k):
    es = _simple_undirected(edges)
    while True:
        deg: dict[str, int] = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {n for n, d in deg.items() if d < k}
        if not bad:
            return deg
        es = {(a, b) for a, b in es if a not in bad and b not in bad}


def test_kcore_matches_python_oracle(ray_session):
    from omop2obo_ray.pipelines.graph import kcore

    rng = np.random.default_rng(17)
    edges = [(f"v{rng.integers(0, 35)}", f"v{rng.integers(0, 35)}")
             for _ in range(180)]
    ds = rd.from_items([{"src": s, "dst": d} for s, d in edges]
                       ).repartition(6)
    for k in (2, 3, 5):
        got = (kcore(ds, k).to_pandas()
               .set_index("node")["d"].to_dict())
        assert got == _brute_kcore(edges, k), k


def test_kcore_multi_round_peel_and_empty(ray_session):
    from omop2obo_ray.pipelines.graph import kcore

    # long path, k=2: endpoints peel one layer per round — exercises
    # repeated peel rounds; the 2-core of a path is empty
    path = [(f"p{i}", f"p{i+1}") for i in range(12)]
    ds = rd.from_items([{"src": s, "dst": d} for s, d in path])
    assert len(kcore(ds, 2).to_pandas()) == 0
    # a cycle IS its own 2-core
    cyc = path + [("p12", "p0")]
    got = kcore(rd.from_items(
        [{"src": s, "dst": d} for s, d in cyc]), 2).to_pandas()
    assert len(got) == 13 and (got["d"] == 2).all()


def _py_link_prediction(edges, max_center_degree=10_000,
                        include_existing=False):
    """Independent pure-python oracle: neighbor-set arithmetic."""
    import math

    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    nbrs: dict[str, set] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    deg = {n: len(v) for n, v in nbrs.items()}
    out = {}
    for u, vs in nbrs.items():
        if deg[u] < 2 or deg[u] > max_center_degree:
            continue
        vs = sorted(vs)
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                a, b = vs[i], vs[j]
                cn, aa = out.get((a, b), (0, 0.0))
                out[(a, b)] = (cn + 1, aa + 1.0 / math.log(deg[u]))
    res = {}
    for (a, b), (cn, aa) in out.items():
        if not include_existing and (a, b) in und:
            continue
        res[(a, b)] = (cn, aa, cn / (deg[a] + deg[b] - cn))
    return res


def test_link_prediction_matches_python_oracle(ray_session):
    from omop2obo_ray.pipelines.graph import link_prediction

    # square a-b-c-d-a plus chord a-c plus pendant e-a; duplicate and
    # reversed edges exercise the canonical dedup
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
             ("a", "c"), ("a", "e"), ("b", "a"), ("a", "b")]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = link_prediction(ds).to_pandas()
    want = _py_link_prediction(edges)
    assert set(zip(got["a"], got["b"])) == set(want)
    for _, r in got.iterrows():
        cn, aa, jacc = want[(r["a"], r["b"])]
        assert r["cn"] == cn
        assert r["aa"] == pytest.approx(aa, rel=1e-12)
        assert r["jacc"] == pytest.approx(jacc, rel=1e-12)
    # b-d share {a, c} → top candidate by cn
    top = got.sort_values("cn", ascending=False).iloc[0]
    assert (top["a"], top["b"]) == ("b", "d") and top["cn"] == 2


def test_link_prediction_include_existing_and_cap(ray_session):
    from omop2obo_ray.pipelines.graph import link_prediction

    # star center s with leaves l0..l4 plus edge l0-l1: s has degree 5
    edges = [("s", f"l{i}") for i in range(5)] + [("l0", "l1")]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))

    withx = link_prediction(ds, include_existing=True).to_pandas()
    want = _py_link_prediction(edges, include_existing=True)
    assert set(zip(withx["a"], withx["b"])) == set(want)
    assert ("l0", "l1") in set(zip(withx["a"], withx["b"]))

    # cap excludes the degree-5 center: only l0/l1 (degree 2) can be
    # centers, and their shared-neighbor pairs involve s
    capped = link_prediction(ds, max_center_degree=4,
                             include_existing=True).to_pandas()
    want_capped = _py_link_prediction(edges, max_center_degree=4,
                                      include_existing=True)
    assert set(zip(capped["a"], capped["b"])) == set(want_capped)
    for _, r in capped.iterrows():
        cn, aa, jacc = want_capped[(r["a"], r["b"])]
        assert (r["cn"], r["jacc"]) == (cn, pytest.approx(jacc))


def test_link_prediction_empty_and_wedge_free(ray_session):
    from omop2obo_ray.pipelines.graph import link_prediction

    empty = rd.from_pandas(pd.DataFrame({"src": pd.Series([], dtype=str),
                                         "dst": pd.Series([], dtype=str)}))
    assert link_prediction(empty).count() == 0
    # single edge: no node has degree >= 2 → no wedges
    one = rd.from_pandas(pd.DataFrame({"src": ["x"], "dst": ["y"]}))
    assert link_prediction(one).count() == 0


def test_taxonomy_rollup_diamond_dag(ray_session):
    """Diamond: d has parents b and c, both children of a. d's count
    must reach a ONCE (closure semantics), not once per path."""
    from omop2obo_ray.pipelines.graph import taxonomy_rollup

    edges = rd.from_pandas(pd.DataFrame({
        "child": ["b", "c", "d", "d", "e"],
        "parent": ["a", "a", "b", "c", "d"]}))
    counts = rd.from_pandas(pd.DataFrame({
        "concept": ["a", "b", "c", "d", "e"],
        "n": np.array([1, 10, 100, 1000, 10000], dtype=np.int64)}))
    got = (taxonomy_rollup(counts, edges).to_pandas()
           .set_index("concept")["total"].sort_index())
    assert got.to_dict() == {
        "a": 11111,          # everything, e/d counted once each
        "b": 11010,          # b + d + e
        "c": 11100,          # c + d + e
        "d": 11000,          # d + e
        "e": 10000,
    }


def test_taxonomy_rollup_orphans_and_cycle_guard(ray_session):
    from omop2obo_ray.pipelines.graph import taxonomy_rollup

    # x→y→x cycle must terminate; z is parentless
    edges = rd.from_pandas(pd.DataFrame({
        "child": ["x", "y"], "parent": ["y", "x"]}))
    counts = rd.from_pandas(pd.DataFrame({
        "concept": ["x", "y", "z"],
        "n": np.array([1, 2, 4], dtype=np.int64)}))
    got = (taxonomy_rollup(counts, edges).to_pandas()
           .set_index("concept")["total"].sort_index())
    # each of x,y is the other's ancestor (once); z stands alone
    assert got.to_dict() == {"x": 3, "y": 3, "z": 4}


# ---------------------------------------------------------------------------
# BGP matching + RDFS-lite type inference
# ---------------------------------------------------------------------------

TRIPLES = [
    # (subj, pred, obj) — small social/geo KG
    ("alice", "lives_in", "denver"),
    ("bob", "lives_in", "denver"),
    ("carol", "lives_in", "boston"),
    ("denver", "in_state", "co"),
    ("boston", "in_state", "ma"),
    ("alice", "knows", "bob"),
    ("alice", "knows", "carol"),
    ("bob", "knows", "carol"),
    ("bob", "knows", "bob"),          # self-loop for repeated-var test
]


@pytest.fixture(scope="module")
def triple_ds(ray_session):
    return rd.from_pandas(
        pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"]))


def test_match_bgp_single_pattern_constant_pushdown(triple_ds):
    from omop2obo_ray.pipelines.graph import match_bgp

    got = match_bgp(triple_ds, [("?p", "lives_in", "denver")]).to_pandas()
    assert sorted(got["p"]) == ["alice", "bob"]
    assert list(got.columns) == ["p"]


def test_match_bgp_two_hop_join(triple_ds):
    """?p lives_in ?c . ?c in_state co → people in Colorado."""
    from omop2obo_ray.pipelines.graph import match_bgp

    got = match_bgp(triple_ds, [("?p", "lives_in", "?c"),
                                ("?c", "in_state", "co")]).to_pandas()
    assert sorted(map(tuple, got[["p", "c"]].to_numpy())) == [
        ("alice", "denver"), ("bob", "denver")]


def test_match_bgp_three_patterns_and_bag_semantics(triple_ds):
    """?a knows ?b . ?b lives_in ?c . ?c in_state ?s — bag semantics
    (one row per derivation), matching the SQL-join oracle."""
    from omop2obo_ray.pipelines.graph import match_bgp

    got = match_bgp(triple_ds, [("?a", "knows", "?b"),
                                ("?b", "lives_in", "?c"),
                                ("?c", "in_state", "?s")]).to_pandas()
    rows = sorted(map(tuple, got[["a", "b", "c", "s"]].to_numpy()))
    assert rows == [
        ("alice", "bob", "denver", "co"),
        ("alice", "carol", "boston", "ma"),
        ("bob", "bob", "denver", "co"),
        ("bob", "carol", "boston", "ma"),
    ]


def test_match_bgp_repeated_variable_in_one_pattern(triple_ds):
    from omop2obo_ray.pipelines.graph import match_bgp

    got = match_bgp(triple_ds, [("?x", "knows", "?x")]).to_pandas()
    assert got["x"].tolist() == ["bob"]


def test_match_bgp_rejects_cross_product(triple_ds):
    from omop2obo_ray.pipelines.graph import match_bgp

    with pytest.raises(ValueError, match="cross product"):
        match_bgp(triple_ds, [("?a", "lives_in", "?b"),
                              ("?c", "in_state", "?d")])
    with pytest.raises(ValueError, match="at least one"):
        match_bgp(triple_ds, [])


def test_match_bgp_empty_result(triple_ds):
    from omop2obo_ray.pipelines.graph import match_bgp

    got = match_bgp(triple_ds, [("?p", "lives_in", "atlantis"),
                                ("?p", "knows", "?q")]).to_pandas()
    assert len(got) == 0


def test_infer_types_diamond_closure(ray_session):
    """Diamond subclass DAG: asserted leaf types every ancestor ONCE
    even when two asserted classes share ancestors."""
    from omop2obo_ray.pipelines.graph import infer_types

    edges = rd.from_pandas(pd.DataFrame({
        "child": ["dog", "cat", "mammal", "mammal", "reptile"],
        "parent": ["mammal", "mammal", "animal", "organism", "animal"]}))
    typed = rd.from_pandas(pd.DataFrame({
        "entity": ["rex", "rex", "tom"],
        "cls": ["dog", "cat", "dog"]}))   # rex asserted dog AND cat
    got = infer_types(typed, edges).to_pandas()
    rows = sorted(map(tuple, got[["entity", "cls"]].to_numpy()))
    assert rows == sorted([
        ("rex", "dog"), ("rex", "cat"), ("rex", "mammal"),
        ("rex", "animal"), ("rex", "organism"),
        ("tom", "dog"), ("tom", "mammal"), ("tom", "animal"),
        ("tom", "organism"),
    ])


def test_infer_types_cycle_and_unknown_class(ray_session):
    from omop2obo_ray.pipelines.graph import infer_types

    # a <-> b cycle; entity typed with a class absent from the DAG
    edges = rd.from_pandas(pd.DataFrame({
        "child": ["a", "b"], "parent": ["b", "a"]}))
    typed = rd.from_pandas(pd.DataFrame({
        "entity": ["e1", "e2"], "cls": ["a", "zz"]}))
    got = infer_types(typed, edges).to_pandas()
    rows = sorted(map(tuple, got[["entity", "cls"]].to_numpy()))
    assert rows == [("e1", "a"), ("e1", "b"), ("e2", "zz")]


def test_match_bgp_optional_pattern(triple_ds):
    """OPTIONAL: everyone keeps their binding; people without a known
    'knows' edge get null for the optional variable."""
    from omop2obo_ray.pipelines.graph import match_bgp

    got = match_bgp(
        triple_ds, [("?p", "lives_in", "?c")],
        optional_patterns=[("?p", "knows", "?q")]).to_pandas()
    rows = sorted(map(lambda r: (r[0], r[1], r[2]),
                      got[["p", "c", "q"]].fillna("∅").to_numpy()))
    assert rows == [
        ("alice", "denver", "bob"),
        ("alice", "denver", "carol"),
        ("bob", "denver", "bob"),
        ("bob", "denver", "carol"),
        ("carol", "boston", "∅"),        # carol knows nobody → null
    ]


def test_match_bgp_optional_no_candidates(triple_ds):
    from omop2obo_ray.pipelines.graph import match_bgp

    got = match_bgp(
        triple_ds, [("?p", "lives_in", "denver")],
        optional_patterns=[("?p", "votes_for", "?v")]).to_pandas()
    assert sorted(got["p"]) == ["alice", "bob"]
    assert got["v"].isna().all()


def test_property_path_chain_and_seed(ray_session):
    """c8 ⊑ c4 ⊑ c2 ⊑ c1 halving chain: p* from c8 reaches the whole
    chain with exact min hops; p+ = hops >= 1 filter downstream."""
    from omop2obo_ray.pipelines.graph import property_path

    rows = [("c8", "subclass_of", "c4"), ("c4", "subclass_of", "c2"),
            ("c2", "subclass_of", "c1"), ("c9", "subclass_of", "c4"),
            ("c8", "other_pred", "zz")]
    triples = rd.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"]))
    got = (property_path(triples, "subclass_of", ["c8"]).to_pandas()
           .set_index("node")["hops"].sort_index())
    assert got.to_dict() == {"c8": 0, "c4": 1, "c2": 2, "c1": 3}
    # directed: c9 (a sibling child of c4) is NOT reached; the other
    # predicate's edge is filtered out (no 'zz')


def test_match_bgp_minus_pattern(triple_ds):
    """MINUS removes bindings whose shared vars match; multiplicity on
    the minus side must not multiply survivors."""
    from omop2obo_ray.pipelines.graph import match_bgp

    got = match_bgp(
        triple_ds, [("?p", "lives_in", "?c")],
        minus_patterns=[("?p", "knows", "?q")]).to_pandas()
    # alice and bob know someone → removed; carol survives exactly once
    assert sorted(map(tuple, got[["p", "c"]].to_numpy())) == [
        ("carol", "boston")]

    # minus pattern with no candidates removes nothing
    got2 = match_bgp(
        triple_ds, [("?p", "lives_in", "?c")],
        minus_patterns=[("?p", "votes_for", "?v")]).to_pandas()
    assert len(got2) == 3


def test_ego_subgraph_one_hop(triple_ds):
    """1-hop undirected ball around alice: every triple rooted at
    alice or her direct neighbors; boston's triple stays out."""
    from omop2obo_ray.pipelines.graph import ego_subgraph

    got = ego_subgraph(triple_ds, ["alice"], hops=1).to_pandas()
    assert len(got) == 8
    assert set(got["subj"]) == {"alice", "bob", "carol", "denver"}
    assert ("boston", "in_state", "ma") not in set(
        map(tuple, got[["subj", "pred", "obj"]].to_numpy()))
    # unknown seed reaches nothing → no triples, typed empty result
    empty = ego_subgraph(triple_ds, ["nobody"], hops=2)
    assert empty.count() == 0
    assert empty.schema().names == ["subj", "pred", "obj"]


def test_construct_template_and_optional_skip(triple_ds):
    """CONSTRUCT mints inverse + derived triples per binding; template
    triples touching an UNBOUND optional variable are skipped."""
    from omop2obo_ray.pipelines.graph import construct

    got = construct(
        triple_ds, [("?p", "lives_in", "?c")],
        optional_patterns=[("?c", "in_state", "?s")],
        template=[("?c", "resident", "?p"),
                  ("?p", "state", "?s")]).to_pandas()
    rows = set(map(tuple, got[["subj", "pred", "obj"]].to_numpy()))
    # inverse edges always emitted (3 people)
    assert ("denver", "resident", "alice") in rows
    assert ("boston", "resident", "carol") in rows
    # state triples emitted only where ?s bound
    assert ("alice", "state", "co") in rows
    assert ("carol", "state", "ma") in rows
    assert len(got) == 3 + 3          # all optional vars bound here

    # unbound template var rejected up front
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not bound"):
        construct(triple_ds, [("?p", "lives_in", "?c")],
                  template=[("?p", "x", "?zz")])


def test_kg_void_stats(triple_ds):
    from omop2obo_ray.pipelines.graph import kg_void_stats

    got = (kg_void_stats(triple_ds).to_pandas()
           .set_index("pred").sort_index())
    # lives_in: 3 triples, 3 subjects, 2 cities; knows: 4 triples,
    # 2 subjects (alice, bob), 2 objects; in_state: 2/2/2
    assert got.loc["lives_in"].tolist() == [3, 3, 2]
    assert got.loc["knows"].tolist() == [4, 2, 2]
    assert got.loc["in_state"].tolist() == [2, 2, 2]


def test_validate_shapes_cardinality(ray_session):
    from omop2obo_ray.pipelines.graph import validate_shapes

    rows = [
        ("c1", "in_nation", "n1"),
        ("c2", "in_nation", "n1"), ("c2", "in_nation", "n2"),  # 2 > max
        ("c3", "in_nation", "n1"),                 # missing email: 0 < 1
        ("c1", "email", "e1"),
        ("c3", "knows", "c1"),
    ]
    triples = rd.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"]))
    shapes = [
        ("one_nation", "in_nation", "in_nation", 1, 1),
        ("has_email", "in_nation", "email", 1, 99),
    ]
    got = validate_shapes(triples, shapes).to_pandas()
    viol = sorted(map(tuple, got[["subj", "shape_id", "n_found"]]
                      .to_numpy()))
    assert viol == [
        ("c2", "has_email", 0),          # c2 has no email
        ("c2", "one_nation", 2),         # double nation
        ("c3", "has_email", 0),
    ]
    # c1 satisfies both; knows-only subjects are not targets
    ok = validate_shapes(triples, [("k", "knows", "knows", 1, 5)])
    assert ok.to_pandas().empty


def test_extract_anchor_texts_edge_cases():
    from omop2obo_ray.functions.html import extract_anchor_texts

    html = (b"<html><body>"
            b"<a href=\"https://a.com/1\">one</a>"
            b"<A HREF='https://b.com/2'> spaced  <b>bold</b> text </A>"
            b"<a href=\"https://c.com\">A &amp; B</a>"
            b"<a href=''>dropped</a>"
            b"<a href=\"https://d.com\"><img src=\"x.png\"/></a>"
            b"</body></html>")
    assert extract_anchor_texts(html) == [
        ("https://a.com/1", "one"),
        ("https://b.com/2", "spaced bold text"),
        ("https://c.com", "A & B"),
        ("https://d.com", ""),
    ]
    assert extract_anchor_texts(None) == []


def test_anchor_extractors_agree_on_edges():
    """extract_anchors and extract_anchor_texts must emit the SAME
    (href) edge sequence even for unclosed / nested anchors — the
    unclosed ones get text '' instead of being dropped."""
    from omop2obo_ray.functions.html import (extract_anchor_texts,
                                             extract_anchors)

    html = (b"<body>"
            b"<a href=\"https://a.com/closed\">ok</a>"
            b"<a href=\"https://b.com/unclosed\">never closed "
            b"<a href=\"https://c.com/next\">fine</a>"
            b"<a href=\"https://d.com/nested\"><a href=\"https://e.com/in\">in</a></a>"
            b"<a href=\"https://f.com/tail\">tail never closes"
            b"</body>")
    texts = extract_anchor_texts(html)
    assert [h for h, _ in texts] == extract_anchors(html)
    by_href = dict(texts)
    assert by_href["https://a.com/closed"] == "ok"
    assert by_href["https://b.com/unclosed"] == ""   # close after next open
    assert by_href["https://c.com/next"] == "fine"
    assert by_href["https://d.com/nested"] == ""     # nested open first
    assert by_href["https://e.com/in"] == "in"
    assert by_href["https://f.com/tail"] == ""       # EOF, no close


def test_anchor_text_edges_synth(ray_session):
    from omop2obo_ray.pipelines.graph import (anchor_text_edges,
                                              synth_anchor_pages)

    docs = rd.from_items([{"doc_id": i} for i in range(10)])
    got = anchor_text_edges(synth_anchor_pages(docs)).to_pandas()
    assert len(got) == 30
    assert sorted(got["anchor_text"].unique()) == ["a", "b", "c"]


def test_bgp_aggregate_group_by_state(triple_ds):
    """GROUP BY ?s over ?p lives_in ?c . ?c in_state ?s: count,
    distinct cities, min/max city term per state."""
    from omop2obo_ray.pipelines.graph import bgp_aggregate

    got = bgp_aggregate(
        triple_ds, [("?p", "lives_in", "?c"), ("?c", "in_state", "?s")],
        ["s"], agg_var="c",
        aggs=("count", "count_distinct", "min", "max"),
    ).to_pandas().sort_values("s").reset_index(drop=True)
    assert got.to_dict("records") == [
        {"s": "co", "n": 2, "n_distinct": 1,
         "min_v": "denver", "max_v": "denver"},
        {"s": "ma", "n": 1, "n_distinct": 1,
         "min_v": "boston", "max_v": "boston"},
    ]


def test_bgp_select_filter_order_limit_distinct(triple_ds):
    """FILTER prunes bindings, DISTINCT collapses bag duplicates,
    ORDER BY + LIMIT take a deterministic prefix."""
    from omop2obo_ray.pipelines.graph import bgp_select

    # ?a knows ?b, filter ?b != 'carol' → (alice,bob), (bob,bob)
    got = bgp_select(triple_ds, [("?a", "knows", "?b")],
                     filters=[("b", "!=", "carol")],
                     order_by=["a", "b"]).to_pandas()
    assert list(map(tuple, got[["a", "b"]].to_numpy())) == [
        ("alice", "bob"), ("bob", "bob")]

    # bag → DISTINCT: ?a knows ?b . ?b lives_in ?c projected through a
    # two-pattern join stays a bag; distinct over (a,) requires the
    # full row to be distinct, so use a shape with duplicate rows:
    # ?p lives_in denver yields alice,bob — add the identical pattern
    # twice via union upstream is overkill; instead check LIMIT
    lim = bgp_select(triple_ds, [("?p", "lives_in", "?c")],
                     order_by=["p"], limit=2).to_pandas()
    assert list(lim["p"]) == ["alice", "bob"]

    # distinct over a genuinely duplicated bag: ?a knows ?b . ?b
    # knows ?x projected — bob knows bob AND bob knows carol make
    # (alice, bob) appear twice in (a, b) after the join? No: columns
    # include x, so dedup the PROJECTION by filtering then distinct
    dup = bgp_select(triple_ds, [("?a", "knows", "?b"),
                                 ("?b", "knows", "?x")],
                     distinct=True).to_pandas()
    full = bgp_select(triple_ds, [("?a", "knows", "?b"),
                                  ("?b", "knows", "?x")]).to_pandas()
    assert len(dup) == len(full.drop_duplicates())
    assert len(full) >= len(dup)


def test_bgp_select_rejects_unknown_filter_op(triple_ds):
    from omop2obo_ray.pipelines.graph import bgp_select

    with pytest.raises(ValueError, match="unsupported filter op"):
        bgp_select(triple_ds, [("?a", "knows", "?b")],
                   filters=[("b", "~=", "carol")])


def test_bgp_select_empty_after_filter(triple_ds):
    """A filter that kills every binding must still sort/limit cleanly
    (zero-row blocks poison Ray sorts unless sanitized)."""
    from omop2obo_ray.pipelines.graph import bgp_select

    got = bgp_select(triple_ds, [("?a", "knows", "?b")],
                     filters=[("b", "==", "nobody")],
                     order_by=["a"], limit=5).to_pandas()
    assert len(got) == 0


def _pandas_label_prop(df, iterations, undirected=True):
    """Independent sync label-propagation oracle: mode of neighbor
    labels per round, ties to the smallest label, keep-own when no
    in-neighbors (weight-0 own marker)."""
    sym = df
    if undirected:
        sym = pd.concat(
            [df, df.rename(columns={"src": "dst", "dst": "src"})])
    nodes = pd.unique(pd.concat([sym["src"], sym["dst"]]))
    lab = pd.Series(nodes, index=nodes)
    for _ in range(iterations):
        votes = sym.assign(
            label=lab.loc[sym["src"].values].values)[["dst", "label"]]
        votes = votes.rename(columns={"dst": "node"})
        votes["w"] = 1
        own = pd.DataFrame({"node": nodes,
                            "label": lab.loc[nodes].values, "w": 0})
        allv = (pd.concat([votes, own])
                .groupby(["node", "label"], sort=False)["w"].sum()
                .reset_index()
                .sort_values(["node", "w", "label"],
                             ascending=[True, False, True],
                             kind="mergesort"))
        win = allv.drop_duplicates("node", keep="first")
        lab = pd.Series(win["label"].values, index=win["node"].values)
    return pd.DataFrame({"node": nodes, "label": lab.loc[nodes].values})


def test_label_propagation_planted_communities(ray_session):
    """Two dense planted communities + sparse bridges: the operator
    must match the pandas oracle exactly, and intra-community labels
    must be far more homogeneous than chance."""
    from omop2obo_ray.pipelines.graph import label_propagation

    rng = np.random.default_rng(7)
    n = 120
    rows = []
    for c in range(2):
        base = c * n
        for _ in range(n * 4):
            a, b = rng.integers(0, n, 2)
            if a != b:
                rows.append((f"n{base + a:04d}", f"n{base + b:04d}"))
    for _ in range(4):
        a, b = rng.integers(0, n, 2)
        rows.append((f"n{a:04d}", f"n{n + b:04d}"))
    df = pd.DataFrame(rows, columns=["src", "dst"]).drop_duplicates()

    got = (label_propagation(rd.from_pandas(df), iterations=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    exp = (_pandas_label_prop(df, 3)
           .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_label_propagation_directed_keep_own(ray_session):
    """undirected=False: a source-only node has no in-neighbors, so
    the weight-0 own marker must keep its label through every round."""
    from omop2obo_ray.pipelines.graph import label_propagation

    df = pd.DataFrame([("s", "a"), ("a", "b"), ("b", "a")],
                      columns=["src", "dst"])
    got = (label_propagation(rd.from_pandas(df), iterations=4,
                             undirected=False)
           .to_pandas().set_index("node")["label"])
    exp = _pandas_label_prop(df, 4, undirected=False).set_index(
        "node")["label"]
    assert got.sort_index().equals(exp.sort_index())
    assert got["s"] == "s"


def _pandas_ppr(df, seeds, iterations, damping=0.85, undirected=False):
    """Independent PPR oracle: fixed-iteration, dangling mass leaks,
    teleport restricted to seeds."""
    sym = df
    if undirected:
        sym = pd.concat(
            [df, df.rename(columns={"src": "dst", "dst": "src"})])
    nodes = pd.unique(pd.concat([sym["src"], sym["dst"]]))
    deg = sym.groupby("src")["dst"].size()
    r = pd.Series(np.isin(nodes, list(seeds)) / len(seeds), index=nodes)
    base = (1 - damping) * np.isin(nodes, list(seeds)) / len(seeds)
    for _ in range(iterations):
        contrib = (sym.assign(
            c=r.loc[sym["src"]].values / deg.loc[sym["src"]].values)
            .groupby("dst")["c"].sum())
        c = pd.Series(0.0, index=nodes)
        c.loc[contrib.index] = contrib.values
        r = pd.Series(base, index=nodes) + damping * c
    return pd.DataFrame({"node": nodes, "rank": r.loc[nodes].values})


def test_personalized_pagerank_matches_oracle(ray_session):
    from omop2obo_ray.pipelines.graph import personalized_pagerank

    rng = np.random.default_rng(11)
    a = rng.integers(0, 60, 400)
    b = rng.integers(0, 60, 400)
    df = (pd.DataFrame({"src": [f"n{x}" for x in a],
                        "dst": [f"n{y}" for y in b]})
          .query("src != dst").drop_duplicates())
    seeds = ["n3", "n17", "n42"]
    for und in (False, True):
        got = (personalized_pagerank(rd.from_pandas(df), seeds,
                                     iterations=3, undirected=und)
               .to_pandas().sort_values("node").reset_index(drop=True))
        exp = (_pandas_ppr(df, seeds, 3, undirected=und)
               .sort_values("node").reset_index(drop=True))
        assert list(got["node"]) == list(exp["node"])
        np.testing.assert_allclose(got["rank"], exp["rank"],
                                   rtol=1e-12, atol=1e-15)


def test_personalized_pagerank_mass_and_seeds(ray_session):
    """Seed-only teleport: with no in-edges a non-seed node scores 0;
    total mass ≤ 1 (dangling leak only shrinks it)."""
    from omop2obo_ray.pipelines.graph import personalized_pagerank

    df = pd.DataFrame({"src": ["s", "s", "a"],
                       "dst": ["a", "b", "c"]})
    got = (personalized_pagerank(rd.from_pandas(df), ["s"], iterations=4)
           .to_pandas().set_index("node")["rank"])
    assert got.sum() <= 1.0 + 1e-12
    # 'b' is reachable only from the seed: positive; 's' has no
    # in-edges so it keeps exactly the teleport base
    assert got["b"] > 0
    assert abs(got["s"] - 0.15) < 1e-12


def test_match_bgp_union_pads_unbound(ray_session):
    """UNION branches with different variable sets: bag semantics, and
    variables unbound in a branch come back null (SPARQL padding)."""
    from omop2obo_ray.pipelines.graph import match_bgp_union

    df = pd.DataFrame({
        "subj": ["c1", "c2", "s1", "n1", "n2"],
        "pred": ["cust_in", "cust_in", "supp_in", "in_region",
                 "in_region"],
        "obj": ["n1", "n2", "n1", "r1", "r2"]})
    got = match_bgp_union(
        rd.from_pandas(df),
        [[("?x", "cust_in", "?n"), ("?n", "in_region", "?r")],
         [("?x", "supp_in", "?n")]]).to_pandas()
    assert sorted(got.columns) == ["n", "r", "x"]
    # branch 1: both customers bind r; branch 2: supplier row, r null
    b1 = got[got["r"].notna()].sort_values("x")
    assert list(b1["x"]) == ["c1", "c2"] and list(b1["r"]) == ["r1", "r2"]
    b2 = got[got["r"].isna()]
    assert list(b2["x"]) == ["s1"] and list(b2["n"]) == ["n1"]


def test_random_walks_matches_simulation(ray_session):
    """Distributed walk corpus ≡ a single-process simulation of the
    pinned hash recurrence, on a graph with hubs, a sink (walk stops
    early) and multi-walks per node."""
    from omop2obo_ray.pipelines.graph import random_walks

    edges = pd.DataFrame({
        "src": [1, 1, 1, 2, 2, 3, 4, 5, 5],
        "dst": [2, 3, 4, 3, 9, 1, 5, 1, 2]})  # 9 is a sink
    got = (random_walks(rd.from_pandas(edges).repartition(3),
                        walk_len=5, walks_per_node=2, seed=17)
           .to_pandas().sort_values(["start", "w", "step"])
           .reset_index(drop=True))

    nbrs = {s: sorted(g["dst"]) for s, g in edges.groupby("src")}
    rows = []
    for start in sorted(nbrs):
        for w in range(2):
            cur = start
            rows.append((start, w, 0, cur))
            for t in range(1, 6):
                if cur not in nbrs:
                    break
                deg = len(nbrs[cur])
                h = (start * 100003 + w * 2971 + cur * 30011
                     + t * 1009 + 17) % 1_000_000_007
                cur = nbrs[cur][h % deg]
                rows.append((start, w, t, cur))
    exp = (pd.DataFrame(rows, columns=["start", "w", "step", "node"])
           .sort_values(["start", "w", "step"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the sink was reachable and stopped at least one walk early
    assert (exp.groupby(["start", "w"])["step"].max() < 5).any()


def test_sssp_matches_bellman_ford(ray_session):
    """Frontier relaxation ≡ full Bellman-Ford: a longer-hop cheaper
    path must overwrite the greedy short-hop distance, unreachable
    nodes stay absent, and a tight max_rounds truncates exactly at
    the ≤k-edge distances."""
    from omop2obo_ray.pipelines.graph import sssp

    #     1 →(10)→ 2            cheap detour 1→3→4→2 costs 3
    edges = pd.DataFrame({
        "src": [1, 1, 3, 4, 2, 7],
        "dst": [2, 3, 4, 2, 5, 8],
        "w":   [10, 1, 1, 1, 1, 1]})  # 7→8 unreachable from 1
    got = (sssp(rd.from_pandas(edges).repartition(3), [1])
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert list(got["node"]) == [1, 2, 3, 4, 5]
    assert list(got["dist"]) == [0, 3, 1, 2, 4]

    # k=1: only direct edges from the seed are settled
    k1 = (sssp(rd.from_pandas(edges), [1], max_rounds=1)
          .to_pandas().set_index("node")["dist"])
    assert k1[2] == 10 and k1[3] == 1 and 4 not in k1.index


def test_random_walks_disk_index_identity(ray_session, tmp_path):
    """The stationary disk-bucket neighbor index must reproduce the
    exchange-mode walks exactly (same pinned hash, only the join
    transport differs)."""
    from omop2obo_ray.pipelines.graph import random_walks

    rng = np.random.default_rng(11)
    edges = pd.DataFrame({
        "src": rng.integers(0, 60, 500),
        "dst": rng.integers(0, 60, 500)}).drop_duplicates()
    a = (random_walks(rd.from_pandas(edges).repartition(4),
                      walk_len=5, walks_per_node=2)
         .to_pandas().sort_values(["start", "w", "step", "node"])
         .reset_index(drop=True))
    b = (random_walks(rd.from_pandas(edges).repartition(4),
                      walk_len=5, walks_per_node=2, index="disk",
                      stage_dir=str(tmp_path / "idx"))
         .to_pandas().sort_values(["start", "w", "step", "node"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_weighted_pagerank_matches_numpy(ray_session):
    """weight_col distributes rank proportional to edge weight; the
    uniform case (equal weights) must equal unweighted pagerank."""
    from omop2obo_ray.pipelines.graph import pagerank

    df = pd.DataFrame({
        "src": ["a", "a", "b", "c", "c", "d"],
        "dst": ["b", "c", "c", "a", "d", "a"],
        "q":   [3.0, 1.0, 2.0, 5.0, 5.0, 4.0]})
    got = (pagerank(rd.from_pandas(df), iterations=3, weight_col="q")
           .to_pandas().set_index("node")["rank"].sort_index())

    nodes = sorted(set(df["src"]) | set(df["dst"]))
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    W = np.zeros((n, n))
    for s, d, q in df.itertuples(index=False):
        W[idx[s], idx[d]] += q
    W = W / W.sum(axis=1, keepdims=True)
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        r = 0.15 / n + 0.85 * (r @ W)
    exp = pd.Series(r * n, index=nodes)
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                               rtol=1e-12)

    # equal weights ≡ unweighted
    dfu = df.assign(q=1.0)
    a = (pagerank(rd.from_pandas(dfu), iterations=2, weight_col="q")
         .to_pandas().set_index("node")["rank"].sort_index())
    b = (pagerank(rd.from_pandas(dfu), iterations=2)
         .to_pandas().set_index("node")["rank"].sort_index())
    np.testing.assert_allclose(a.to_numpy(), b.to_numpy(), rtol=1e-12)


def test_sameas_resolve_against_union_find(ray_session):
    """Smushing ≡ union-find canonicalization + rewrite + distinct on a
    planted alias graph (chains, a star, singletons, entities with no
    aliases, objects pointing INTO alias clusters, and two source
    triples that collapse onto one canonical triple)."""
    import numpy as np

    from omop2obo_ray.pipelines.graph import sameas_resolve

    rng = np.random.default_rng(7)
    n = 120
    ents = [f"e{i:03d}" for i in range(n)]
    same = []
    # chains of 6 over the first half; star over a block of 10
    for base in range(0, 60, 6):
        for i in range(base, base + 5):
            same.append((ents[i + 1], "owl:sameAs", ents[i]))
    for i in range(61, 70):
        same.append((ents[60], "owl:sameAs", ents[i]))
    data = []
    for i in range(n):
        data.append((ents[i], "type", f"T{i % 3}"))
        j = int(rng.integers(0, n))
        data.append((ents[i], "linksTo", ents[j]))
    tri = pd.DataFrame(same + data, columns=["subj", "pred", "obj"])

    # oracle: union-find over the sameAs pairs, min-member canonical
    parent = {e: e for e in ents}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, _, o in same:
        ra, rb = find(s), find(o)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    canon = {e: find(e) for e in ents}
    exp = (pd.DataFrame(
        [(canon[s], p, canon.get(o, o)) for s, p, o in data],
        columns=["subj", "pred", "obj"])
        .drop_duplicates().sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True))

    got = (sameas_resolve(rd.from_pandas(tri)).to_pandas()
           .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) < len(data)  # collapses actually happened

    # mapping mode agrees with the oracle on clustered nodes
    m = (sameas_resolve(rd.from_pandas(tri), keep_mapping=True)
         .to_pandas().set_index("node")["component"].to_dict())
    for e, c in m.items():
        assert canon[e] == c
    # every node of a non-trivial cluster appears in the mapping
    assert set(m) == {e for e in ents
                      if sum(1 for x in ents if canon[x] == canon[e]) > 1}


def test_sameas_resolve_no_aliases_identity(ray_session):
    from omop2obo_ray.pipelines.graph import sameas_resolve

    tri = pd.DataFrame({"subj": ["a", "b"], "pred": ["p", "p"],
                        "obj": ["x", "y"]})
    got = (sameas_resolve(rd.from_pandas(tri)).to_pandas()
           .sort_values("subj").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, tri)


def _bfs_balls(pairs, max_t):
    """Pure-python oracle: ball sizes per node per radius (undirected)."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for s in adj:
        dist = {s: 0}
        frontier = [s]
        for d in range(1, max_t + 1):
            nxt = [v for u in frontier for v in adj[u] if v not in dist]
            for v in nxt:
                dist.setdefault(v, d)
            frontier = list(dict.fromkeys(nxt))
        for t in range(max_t + 1):
            out[(s, t)] = sum(1 for d in dist.values() if d <= t)
    return out


def test_neighborhood_function_exact_matches_bfs(ray_session):
    """Exact (bitset) mode reproduces per-radius BFS ball sizes on a
    random graph, including isolated-in-degree nodes and a multi-edge."""
    from omop2obo_ray.pipelines.graph import neighborhood_function

    rng = np.random.default_rng(7)
    pairs = list({(f"v{a}", f"v{b}")
                  for a, b in rng.integers(0, 60, size=(150, 2))
                  if a != b})
    pairs.append(pairs[0])  # duplicate edge must not change balls
    df = pd.DataFrame(pairs, columns=["src", "dst"])
    got = (neighborhood_function(rd.from_pandas(df).repartition(4),
                                 max_t=3, mode="exact")
           .to_pandas())
    exp = _bfs_balls(pairs, 3)
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert exp[(r.node, r.t)] == r.ball, (r.node, r.t)


def test_neighborhood_function_hll_tracks_exact(ray_session):
    """HLL mode: monotone in t and within the published error band of
    the exact ball sizes (2^10 registers → σ≈3.3%; assert 5σ)."""
    from omop2obo_ray.pipelines.graph import neighborhood_function

    rng = np.random.default_rng(3)
    pairs = list({(f"v{a}", f"v{b}")
                  for a, b in rng.integers(0, 400, size=(900, 2))
                  if a != b})
    df = pd.DataFrame(pairs, columns=["src", "dst"])
    ds = rd.from_pandas(df).repartition(4)
    est = (neighborhood_function(ds, max_t=2, mode="hll", hll_bits=10)
           .to_pandas().set_index(["node", "t"])["ball_est"])
    exact = _bfs_balls(pairs, 2)
    assert set(est.index) == set(exact)
    tol = 5 * 1.04 / np.sqrt(1024)
    for (node, t), e in est.items():
        true = exact[(node, t)]
        assert abs(e - true) <= max(2.0, tol * true), (node, t, e, true)
    # monotone in t per node
    wide = est.unstack("t")
    assert (wide[1] >= wide[0] - 1e-9).all()
    assert (wide[2] >= wide[1] - 1e-9).all()


def test_dag_depth_matches_longest_path(ray_session):
    """dag_depth ≡ the longest-path-from-roots oracle on a random DAG
    (edges only i→j with i<j, so acyclicity holds by construction)."""
    from omop2obo_ray.pipelines.graph import dag_depth

    rng = np.random.default_rng(23)
    pairs = sorted({(int(min(a, b)), int(max(a, b)))
                    for a, b in rng.integers(0, 80, size=(200, 2))
                    if a != b})
    df = pd.DataFrame(pairs, columns=["src", "dst"])
    got = (dag_depth(rd.from_pandas(df).repartition(4))
           .to_pandas().set_index("node")["depth"].to_dict())

    # oracle: DP over topological (numeric) order
    parents = {}
    nodes = set()
    for a, b in pairs:
        parents.setdefault(b, []).append(a)
        nodes.update((a, b))
    depth = {}
    for v in sorted(nodes):
        ps = [p for p in parents.get(v, [])]
        depth[v] = 0 if not ps else 1 + max(depth[p] for p in ps)
    assert got == depth


def test_maximal_independent_set_properties(ray_session):
    """Luby MIS on a random graph: the selection is (a) independent —
    no edge inside it, (b) maximal — every unselected node has a
    selected neighbor, (c) partition-invariant (deterministic
    priorities, not RNG state)."""
    from omop2obo_ray.pipelines.graph import maximal_independent_set

    rng = np.random.default_rng(11)
    e = pd.DataFrame({"src": rng.integers(0, 120, 500),
                      "dst": rng.integers(0, 120, 500)})
    e = e[e.src != e.dst].drop_duplicates()
    got = maximal_independent_set(
        rd.from_pandas(e).repartition(5)).to_pandas()
    mis = set(got["node"])

    adj: dict[int, set] = {}
    for a, b in zip(e.src, e.dst):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    assert all(not (adj[v] & mis) for v in mis)                # independent
    assert all(adj[v] & mis for v in adj if v not in mis)      # maximal

    again = maximal_independent_set(
        rd.from_pandas(e).repartition(17)).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("node").reset_index(drop=True),
        again.sort_values("node").reset_index(drop=True))

    # endgame local-finish (default) ≡ the distributed rounds
    # EXACTLY (deterministic integer algorithm, incl. sel_round)
    dist = maximal_independent_set(
        rd.from_pandas(e).repartition(5), local_below=0).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("node").reset_index(drop=True),
        dist.sort_values("node").reset_index(drop=True))


def test_maximal_independent_set_star_and_guard(ray_session):
    """On a star graph the hub either wins alone round 0 or every leaf
    wins — never both; and the exhaustion guard raises at
    max_rounds=0 unless allow_partial."""
    import pytest

    from omop2obo_ray.pipelines.graph import maximal_independent_set

    e = pd.DataFrame({"src": [0] * 8, "dst": list(range(1, 9))})
    got = maximal_independent_set(rd.from_pandas(e)).to_pandas()
    mis = set(got["node"])
    assert mis == {0} or mis == set(range(1, 9))
    with pytest.raises(RuntimeError):
        maximal_independent_set(rd.from_pandas(e), max_rounds=0)
    part = maximal_independent_set(rd.from_pandas(e), max_rounds=0,
                                   allow_partial=True).to_pandas()
    assert len(part) == 0


def test_harmonic_centrality_vs_bfs_oracle(ray_session):
    """Exact-mode harmonic centrality ≡ Σ 1/d over a BFS oracle on a
    random undirected graph (bounded radius 3)."""
    from collections import deque

    from omop2obo_ray.pipelines.graph import harmonic_centrality

    rng = np.random.default_rng(3)
    e = pd.DataFrame({"src": [f"v{a}" for a in rng.integers(0, 60, 150)],
                      "dst": [f"v{b}" for b in rng.integers(0, 60, 150)]})
    e = e[e.src != e.dst].drop_duplicates()
    got = (harmonic_centrality(rd.from_pandas(e).repartition(4), max_t=3)
           .to_pandas().set_index("node")["harmonic"].to_dict())

    adj: dict[str, set] = {}
    for a, b in zip(e.src, e.dst):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v in adj:
        dist = {v: 0}
        q = deque([v])
        while q:
            x = q.popleft()
            if dist[x] >= 3:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        want = sum(1.0 / d for d in dist.values() if d > 0)
        assert got[v] == pytest.approx(want, abs=1e-9), v


def test_redirect_resolve_chains_and_cycles(ray_session):
    """Pointer doubling ≡ the naive chain walk on a random functional
    graph with planted terminals and a planted 3-cycle; duplicate
    sources collapse to their min target."""
    from omop2obo_ray.pipelines.graph import redirect_resolve

    rng = np.random.default_rng(7)
    n = 300
    # functional map: node k redirects to f(k); ~1/3 of nodes are
    # terminals (no outgoing row); nodes 900/901/902 form a cycle
    srcs = [k for k in range(n) if k % 3 != 0]
    ptr = {k: int((k * 7 + 3) % n) for k in srcs}
    ptr.update({900: 901, 901: 902, 902: 900})
    rows = [(k, v) for k, v in ptr.items()]
    rows.append((5, 999))  # duplicate source: min target wins
    df = pd.DataFrame(rows, columns=["src", "dst"])

    got = (redirect_resolve(rd.from_pandas(df).repartition(4))
           .to_pandas().set_index("node"))

    eff = dict(ptr)
    eff[5] = min(ptr[5], 999)
    for k, tgt in eff.items():
        seen, cur, steps = {k}, tgt, 0
        while cur in eff and steps < 10_000:
            if cur in seen:
                steps = None  # cycle
                break
            seen.add(cur)
            cur = eff[cur]
            steps += 1
        if steps is None or k in (900, 901, 902):
            assert got.loc[k, "resolved"] == 0, k
        else:
            assert got.loc[k, "resolved"] == 1, k
            assert got.loc[k, "final"] == cur, k
    assert set(got.index) == set(eff)


def test_redirect_resolve_log_rounds(ray_session):
    """A 200-link chain resolves within 9 doubling rounds (2^8 = 256 ≥
    200) — the logarithmic bound that makes the op viable at crawl
    scale — and an insufficient budget reports resolved=0."""
    from omop2obo_ray.pipelines.graph import redirect_resolve

    df = pd.DataFrame({"src": range(200), "dst": range(1, 201)})
    ds = rd.from_pandas(df).repartition(4)
    got = redirect_resolve(ds, max_rounds=9).to_pandas()
    assert (got["resolved"] == 1).all()
    assert (got["final"] == 200).all()
    capped = redirect_resolve(ds, max_rounds=3).to_pandas()
    assert (capped["resolved"] == 0).any()


def test_k_truss_matches_peeling_oracle(ray_session):
    """k_truss (full fixpoint) ≡ the naive support-peel oracle on a
    random graph with a planted 6-clique (non-empty 5-truss)."""
    from omop2obo_ray.pipelines.graph import k_truss

    rng = np.random.default_rng(13)
    pairs = {(f"n{a}", f"n{b}") for a, b in
             rng.integers(0, 40, size=(150, 2)) if a != b}
    cl = [f"c{i}" for i in range(6)]
    pairs |= {(cl[i], cl[j]) for i in range(6) for j in range(i + 1, 6)}
    df = pd.DataFrame(sorted(pairs), columns=["src", "dst"])

    def oracle(k):
        edges = {tuple(sorted(p)) for p in pairs}
        while True:
            adj = {}
            for a, b in edges:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            new = {(a, b) for a, b in edges
                   if len(adj[a] & adj[b]) >= k - 2}
            if new == edges:
                return edges
            edges = new

    for k in (3, 4, 5):
        got = (k_truss(rd.from_pandas(df).repartition(4), k)
               .to_pandas())
        got_set = set(zip(got["a"], got["b"]))
        assert got_set == oracle(k), k
    # the planted clique survives as the 5-truss core
    got5 = oracle(5)
    assert {(cl[i], cl[j]) for i in range(6)
            for j in range(i + 1, 6)} <= got5


def test_betweenness_matches_brandes(ray_session):
    """Multi-source distributed Brandes ≡ the textbook per-source
    Brandes accumulation (raw dependency sums, undirected) on a
    random graph, seeded from 5 pivots."""
    from collections import deque

    from omop2obo_ray.pipelines.graph import betweenness

    rng = np.random.default_rng(17)
    pairs = sorted({(int(min(a, b)), int(max(a, b))) for a, b in
                    rng.integers(0, 60, size=(220, 2)) if a != b})
    df = pd.DataFrame(pairs, columns=["src", "dst"])
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds = [0, 7, 13, 21, 42]

    exp = {v: 0.0 for v in adj}
    for s in seeds:
        if s not in adj:
            continue
        dist, sigma, order = {s: 0}, {s: 1.0}, [s]
        dq = deque([s])
        while dq:
            v = dq.popleft()
            for w in sorted(adj[v]):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    dq.append(w)
                    order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in adj[w]:
                if dist.get(v, -9) == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                exp[w] += delta[w]

    # endgame local-finish (default) vs the independent oracle
    got = (betweenness(rd.from_pandas(df).repartition(4), seeds)
           .to_pandas().set_index("node")["bc"].to_dict())
    for v, e in exp.items():
        g = got.get(v, 0.0)
        assert abs(g - e) < 1e-9, (v, g, e)

    # distributed path (local_below=0): same values (allclose — float
    # association order differs) and the same node set
    got_d = (betweenness(rd.from_pandas(df).repartition(4), seeds,
                         local_below=0)
             .to_pandas().set_index("node")["bc"].to_dict())
    assert set(got_d) == set(got)
    for v, g in got.items():
        assert abs(got_d[v] - g) < 1e-9, (v, got_d[v], g)


def test_reciprocity_matches_oracle(ray_session):
    """reciprocity ≡ the naive reverse-set count on a random directed
    graph with planted mutual pairs; duplicates don't double-count."""
    from omop2obo_ray.pipelines.graph import reciprocity

    rng = np.random.default_rng(29)
    es = {(int(a), int(b)) for a, b in
          rng.integers(0, 50, size=(300, 2)) if a != b}
    es |= {(1, 2), (2, 1), (3, 4), (4, 3)}
    rows = sorted(es) + [(1, 2), (3, 4)]  # duplicates
    df = pd.DataFrame(rows, columns=["src", "dst"])
    got = (reciprocity(rd.from_pandas(df).repartition(4))
           .to_pandas().iloc[0])
    n_recip = sum(1 for (a, b) in es if (b, a) in es)
    assert got["n_edges"] == len(es)
    assert got["n_recip"] == n_recip
    assert abs(got["ratio"] - n_recip / len(es)) < 1e-12


def test_assortativity_matches_pearson(ray_session):
    """assortativity ≡ Pearson corr of endpoint degrees over both
    orientations of the deduped undirected edge set."""
    from omop2obo_ray.pipelines.graph import assortativity

    rng = np.random.default_rng(31)
    pairs = sorted({(int(min(a, b)), int(max(a, b))) for a, b in
                    rng.integers(0, 40, size=(200, 2)) if a != b})
    df = pd.DataFrame(pairs, columns=["src", "dst"])
    got = (assortativity(rd.from_pandas(df).repartition(4))
           .to_pandas().iloc[0])
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    x = np.array([deg[a] for a, b in pairs]
                 + [deg[b] for a, b in pairs], float)
    y = np.array([deg[b] for a, b in pairs]
                 + [deg[a] for a, b in pairs], float)
    r = np.corrcoef(x, y)[0, 1]
    assert got["n"] == 2 * len(pairs)
    assert abs(got["r"] - r) < 1e-9


def test_edge_embeddedness_matches_common_neighbors(ray_session):
    """edge_embeddedness ≡ |N(a) ∩ N(b)| per deduped canonical edge,
    with 0-support bridges included."""
    from omop2obo_ray.pipelines.graph import edge_embeddedness

    rng = np.random.default_rng(19)
    # canonical order is LEXICOGRAPHIC on string ids ('n15' < 'n3'),
    # matching the engine's min/max_element_wise
    pairs = sorted({tuple(sorted((f"n{a}", f"n{b}"))) for a, b in
                    rng.integers(0, 30, size=(120, 2)) if a != b})
    pairs.append(("x1", "x2"))  # isolated bridge, support 0
    df = pd.DataFrame(pairs, columns=["src", "dst"])
    got = (edge_embeddedness(rd.from_pandas(df).repartition(4))
           .to_pandas())
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    exp = {(a, b): len(adj[a] & adj[b]) for a, b in pairs}
    assert {(r.a, r.b): r.support
            for r in got.itertuples()} == exp


def test_powerlaw_alpha_matches_mle(ray_session):
    """powerlaw_alpha ≡ the closed-form Hill MLE over the deduped
    undirected degree distribution."""
    from omop2obo_ray.pipelines.graph import powerlaw_alpha

    rng = np.random.default_rng(37)
    pairs = sorted({(f"n{min(a, b)}", f"n{max(a, b)}") for a, b in
                    rng.integers(0, 60, size=(400, 2)) if a != b})
    df = pd.DataFrame(pairs, columns=["src", "dst"])
    got = (powerlaw_alpha(rd.from_pandas(df).repartition(4), d_min=3)
           .to_pandas().iloc[0])
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    tail = np.array([d for d in deg.values() if d >= 3], float)
    alpha = 1.0 + len(tail) / (np.log(tail).sum()
                               - len(tail) * np.log(3.0))
    assert got["n_tail"] == len(tail)
    assert abs(got["alpha"] - alpha) < 1e-9


def test_wu_palmer_matches_oracle(ray_session):
    """wu_palmer ≡ the set-intersection LCA oracle on a binary-ish
    tree with an extra diamond (DAG rediscovery dedup exercised)."""
    from omop2obo_ray.pipelines.graph import wu_palmer

    edges = [(k, k // 2) for k in range(2, 120)]
    edges.append((97, 3))  # diamond: 97 has parents 48 and 3
    df = pd.DataFrame(edges, columns=["child", "parent"])
    pairs = [(40, 41), (97, 13), (5, 119), (2, 3), (97, 96)]

    anc = {}
    par = {}
    for c, p in edges:
        par.setdefault(c, set()).add(p)

    def ancestors(v):
        if v in anc:
            return anc[v]
        out = {v}
        for p in par.get(v, ()):
            out |= ancestors(p)
        anc[v] = out
        return out

    got = (wu_palmer(rd.from_pandas(df).repartition(4), pairs)
           .to_pandas().set_index(["qa", "qb"]))
    for a, b in pairs:
        common = ancestors(a) & ancestors(b)
        dl = max(len(ancestors(x)) for x in common)
        da, db = len(ancestors(a)), len(ancestors(b))
        assert got.loc[(a, b), "lca_depth"] == dl, (a, b)
        assert abs(got.loc[(a, b), "sim"] - 2 * dl / (da + db)) < 1e-12
    assert len(got) == len(pairs)


def test_resnik_lin_matches_oracle(ray_session):
    """resnik_lin ≡ the pure-python IC oracle on a diamond DAG with
    sparse annotations (some nodes annotated 0, duplicate edges)."""
    from omop2obo_ray.pipelines.graph import resnik_lin

    edges = [(k, k // 2) for k in range(2, 64)]
    edges.append((31, 5))          # diamond
    edges.append((40, 20))         # duplicate edge
    df = pd.DataFrame(edges, columns=["child", "parent"])
    # annotate odd nodes only, count = node % 7 + 1; even nodes get
    # IC purely from descendants
    cdf = pd.DataFrame({"concept": [n for n in range(1, 64) if n % 2],
                        "n": [n % 7 + 1 for n in range(1, 64)
                              if n % 2]})
    pairs = [(20, 21), (31, 44), (5, 63), (2, 3), (40, 41)]

    par = {}
    for c, p in set(edges):
        par.setdefault(c, set()).add(p)

    def ancestors(v):
        out = {v}
        for p in par.get(v, ()):
            out |= ancestors(p)
        return out

    cnt = dict(zip(cdf["concept"], cdf["n"]))
    nodes = {x for e in edges for x in e}
    desc = {a: 0 for a in nodes}
    for v in nodes:
        for a in ancestors(v):
            desc[a] += cnt.get(v, 0)
    N = sum(c for n, c in cnt.items() if n in nodes)

    got = (resnik_lin(rd.from_pandas(df).repartition(4),
                      rd.from_pandas(cdf).repartition(2), pairs)
           .to_pandas().set_index(["qa", "qb"]))
    import math
    kept = 0
    for a, b in pairs:
        if desc[a] == 0 or desc[b] == 0:
            # undefined IC endpoint (44 has no annotated
            # descendants) — the pair must be absent
            assert (a, b) not in got.index, (a, b)
            continue
        kept += 1
        common = {x for x in ancestors(a) & ancestors(b)
                  if desc[x] > 0}
        mf = min(desc[x] for x in common)
        res = math.log(N / mf)
        lin = 2 * res / (math.log(N / desc[a]) + math.log(N / desc[b]))
        assert got.loc[(a, b), "min_freq"] == mf, (a, b)
        assert abs(got.loc[(a, b), "resnik"] - res) < 1e-12
        assert abs(got.loc[(a, b), "lin"] - lin) < 1e-12
    # (31,44) and (40,41) drop: 44 and 40 have no annotated
    # descendants in range
    assert len(got) == kept and kept == len(pairs) - 2


def test_transitive_reduction_matches_oracle(ray_session):
    """transitive_reduction ≡ the pure-python redundancy oracle on a
    tree + asserted shortcut edges (some redundant, one not)."""
    from omop2obo_ray.pipelines.graph import transitive_reduction

    edges = [(k, k // 2) for k in range(2, 64)]
    edges += [(20, 5), (44, 11), (9, 1)]   # grandparent shortcuts
    edges += [(33, 7)]                     # cross edge, oracle decides
    edges += [(40, 20), (40, 20)]          # duplicate edge
    df = pd.DataFrame(edges, columns=["child", "parent"])

    par = {}
    for c, p in set(edges):
        par.setdefault(c, set()).add(p)

    def ancestors(v):
        out = {v}
        for p in par.get(v, ()):
            out |= ancestors(p)
        return out

    want = set()
    for c, p in set(edges):
        redundant = any(p in (ancestors(q) - {q}) for q in par[c])
        if not redundant:
            want.add((c, p))

    got = set(map(tuple, transitive_reduction(
        rd.from_pandas(df).repartition(4))
        .to_pandas()[["c", "p"]].itertuples(index=False)))
    assert got == want
    assert (20, 5) not in got and (44, 11) not in got
    assert (20, 10) in got


def test_effective_diameter_matches_bfs_oracle(ray_session):
    """effective_diameter ≡ the BFS-ball interpolation oracle on a
    two-component graph (path + clique)."""
    from omop2obo_ray.pipelines.graph import effective_diameter

    edges = [(f"p{i}", f"p{i+1}") for i in range(8)]
    edges += [(f"k{i}", f"k{j}") for i in range(5) for j in range(5)
              if i < j]
    df = pd.DataFrame(edges, columns=["src", "dst"])

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def ball(v, t):
        cur = {v}
        for _ in range(t):
            cur = cur | {w for u in cur for w in adj.get(u, ())}
        return len(cur)

    max_t, q = 3, 0.9
    p = [float(sum(ball(v, t) for v in adj)) for t in range(max_t + 1)]
    target = q * p[max_t]
    t_hi = next(t for t in range(max_t + 1) if p[t] >= target)
    want = 0.0 if t_hi == 0 else (t_hi - 1) + (
        target - p[t_hi - 1]) / (p[t_hi] - p[t_hi - 1])

    got = effective_diameter(rd.from_pandas(df).repartition(3),
                             max_t=max_t, q=q,
                             mode="exact").to_pandas()
    assert len(got) == 1
    assert got["t_hi"][0] == t_hi
    assert abs(got["eff_diameter"][0] - want) < 1e-12

    # HLL mode runs the same recurrence on estimates — sane range
    est = effective_diameter(rd.from_pandas(df).repartition(3),
                             max_t=max_t, q=q, mode="hll",
                             hll_bits=10).to_pandas()
    assert 0.0 <= est["eff_diameter"][0] <= max_t


def test_partition_quality_matches_oracle(ray_session):
    """partition_quality ≡ the per-community python oracle (two
    planted cliques + a bridge; one straggler community)."""
    from omop2obo_ray.pipelines.graph import partition_quality

    edges = ([(f"a{i}", f"a{j}") for i in range(4) for j in range(4)
              if i < j]
             + [(f"b{i}", f"b{j}") for i in range(4) for j in range(4)
                if i < j]
             + [("a0", "b0"), ("a1", "x0"), ("x0", "x0")])  # bridge, straggler, self-loop
    df = pd.DataFrame(edges, columns=["src", "dst"])
    nodes = sorted({x for e in edges for x in e})
    comm = {n: n[0] for n in nodes}   # community = first letter
    adf = pd.DataFrame({"node": nodes,
                        "community": [comm[n] for n in nodes]})

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    m = len(und)
    import collections
    st = collections.defaultdict(lambda: [0, 0, 0])  # internal, cut, vol
    for a, b in und:
        ca, cb = comm[a], comm[b]
        st[ca][2] += 1
        st[cb][2] += 1
        if ca == cb:
            st[ca][0] += 1
        else:
            st[ca][1] += 1
            st[cb][1] += 1

    got = partition_quality(rd.from_pandas(df).repartition(3),
                            rd.from_pandas(adf).repartition(2)) \
        .to_pandas().set_index("community")
    assert len(got) == len(st)
    for c, (internal, cut, vol) in st.items():
        row = got.loc[c]
        assert row["internal"] == internal and row["cut"] == cut \
            and row["vol"] == vol, c
        denom = min(vol, 2 * m - vol)
        if denom > 0:
            assert abs(row["conductance"] - cut / denom) < 1e-12
        want_q = internal / m - (vol / (2 * m)) ** 2
        assert abs(row["modularity_term"] - want_q) < 1e-12
    # global modularity of the planted partition is clearly positive
    assert got["modularity_term"].sum() > 0.3


def test_kge_negative_samples_matches_oracle(ray_session):
    """kge_negative_samples ≡ the pinned-hash python replay (exact
    row-set identity; duplicate input triples collapse first)."""
    from omop2obo_ray.pipelines.graph import kge_negative_samples

    tri = [(i % 13, i % 3, (i * 7 + 1) % 13) for i in range(60)]
    ents = sorted({x for s, _, o in tri for x in (s, o)})
    E, M = len(ents), 1000000007

    want = set()
    for s, p, o in set(tri):
        key = ((((s % M) * 1000003 + p % M) % M) * 1000003
               + o % M) % M
        for j in range(2):
            kj = (key + j * 7919) % M
            head = (kj * 30011 + 17) % M % 2
            repl = ents[(kj * 48271 + 11) % M % E]
            if head:
                want.add((s, p, o, j, "head", repl, o))
            else:
                want.add((s, p, o, j, "tail", s, repl))

    got = set(map(tuple, kge_negative_samples(
        rd.from_pandas(pd.DataFrame(tri, columns=["s", "p", "o"]))
        .repartition(3), 2).to_pandas().itertuples(index=False)))
    assert got == want
    # both sides corrupted somewhere, never both at once
    sides = {r[4] for r in got}
    assert sides == {"head", "tail"}


def test_neighbor_sample_matches_oracle(ray_session):
    """neighbor_sample ≡ the pinned-hash fan-sampling replay
    (2 hops, fanouts [3, 2], hub + chain + duplicate edges)."""
    from omop2obo_ray.pipelines.graph import neighbor_sample

    edges = [(0, i) for i in range(1, 8)]          # hub fan-out 7
    edges += [(i, i + 1) for i in range(1, 6)]     # chain
    edges += [(3, 9), (3, 10), (3, 11), (0, 1)]    # branch + dup
    df = pd.DataFrame(edges, columns=["src", "dst"])
    M = 1000000007
    fanouts = [3, 2]

    adj = {}
    for s, d in sorted(set(edges)):
        adj.setdefault(s, []).append(d)
    for s in adj:
        adj[s].sort(key=lambda d: ((d % M) * 48271
                                   + (s % M) * 30011) % M * 10**12 + d)

    want = set()
    seeds = sorted(adj)
    for seed in seeds:
        want.add((seed, 0, seed))
        cur = {seed}
        for hop, f in enumerate(fanouts, 1):
            nxt = {d for n in cur for d in adj.get(n, [])[:f]}
            for d in nxt:
                want.add((seed, hop, d))
            cur = nxt

    got = set(map(tuple, neighbor_sample(
        rd.from_pandas(df).repartition(3), fanouts)
        .to_pandas().itertuples(index=False)))
    assert got == want
    # hub kept only 3 of 7 hop-1 neighbors
    assert len({n for s, h, n in got if s == 0 and h == 1}) == 3


def test_closeness_centrality_matches_bfs(ray_session):
    """closeness ≡ BFS oracle at radius 2 (path + triangle graph)."""
    from omop2obo_ray.pipelines.graph import closeness_centrality

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("x", "y"), ("y", "z"), ("z", "x")]
    df = pd.DataFrame(edges, columns=["src", "dst"])

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    got = closeness_centrality(rd.from_pandas(df).repartition(2),
                               max_t=2, mode="exact").to_pandas() \
        .set_index("node")
    for v in adj:
        dist, cur, seen = {v: 0}, {v}, {v}
        for t in (1, 2):
            cur = {w for u in cur for w in adj[u]} - seen
            for w in cur:
                dist[w] = t
            seen |= cur
        reached = len(dist) - 1
        totd = sum(dist.values())
        want = reached / totd if totd else 0.0
        assert got.loc[v, "reached"] == reached, v
        assert abs(got.loc[v, "closeness"] - want) < 1e-12, v


def test_quotient_graph_matches_oracle(ray_session):
    """quotient_graph ≡ the pandas rollup (intra loops included)."""
    from omop2obo_ray.pipelines.graph import quotient_graph

    edges = [("a1", "a2"), ("a2", "a3"), ("a1", "b1"), ("a2", "b2"),
             ("b1", "b2"), ("b2", "c1"), ("c1", "c2"), ("a3", "a1"),
             ("a1", "a2"), ("x1", "x1")]   # dup + self loop
    comm = {n: n[0] for e in edges for n in e}
    df = pd.DataFrame(edges, columns=["src", "dst"])
    adf = pd.DataFrame({"node": list(comm), "community":
                        [comm[n] for n in comm]})

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    want = {}
    for a, b in und:
        k = tuple(sorted((comm[a], comm[b])))
        want[k] = want.get(k, 0) + 1

    got = quotient_graph(rd.from_pandas(df).repartition(3),
                         rd.from_pandas(adf).repartition(2)) \
        .to_pandas().set_index(["ca", "cb"])["n_edges"].to_dict()
    assert got == want
    assert got[("a", "a")] == 3 and got[("a", "b")] == 2


def test_cc_incremental_equals_full_recompute(ray_session):
    """cc_incremental(assign, new) ≡ CC over old ∪ new edges when
    assign came from the CC family (bridge two old components, add a
    brand-new chain, touch one isolated old component not at all)."""
    from omop2obo_ray.pipelines.graph import (
        cc_incremental, connected_components_alternating)

    old = ([(i, i + 1) for i in range(1, 5)]       # comp min 1
           + [(i, i + 1) for i in range(10, 15)]   # comp min 10
           + [(i, i + 1) for i in range(20, 23)]   # comp min 20
           + [(30, 31)])                            # untouched
    new = [(4, 12), (22, 40), (40, 41), (50, 51)]  # bridge, grow, new

    old_df = pd.DataFrame(old, columns=["src", "dst"])
    new_df = pd.DataFrame(new, columns=["src", "dst"])

    assign = connected_components_alternating(
        rd.from_pandas(old_df).repartition(3)).to_pandas()

    got = cc_incremental(rd.from_pandas(assign).repartition(2),
                         rd.from_pandas(new_df).repartition(2)) \
        .to_pandas().set_index("node")["component"].to_dict()

    want = connected_components_alternating(
        rd.from_pandas(pd.concat([old_df, new_df]))
        .repartition(3)).to_pandas() \
        .set_index("node")["component"].to_dict()
    # full recompute lacks rows for isolated nodes? no — every node
    # here touches an edge, so domains must match exactly
    assert got == want
    assert got[12] == 1 and got[41] == 20 and got[51] == 50
    assert got[31] == 30


def test_scc_matches_mutual_reachability_oracle(ray_session):
    """SCC ≡ the BFS mutual-reachability oracle on a bowtie-ish
    graph; the upstream feeder (1 → cycle{5,6,7}) forces a second
    peel round (f(5)=1 ≠ b(5)=5 in round one)."""
    from omop2obo_ray.pipelines.graph import \
        strongly_connected_components

    edges = [(5, 6), (6, 7), (7, 5),          # cycle A (min 5)
             (1, 5),                            # feeder into A
             (7, 20), (20, 21), (21, 20),       # A → cycle B (min 20)
             (21, 30),                          # B → sink chain
             (30, 31), (31, 32),
             (2, 2),                            # self-loop singleton
             (40, 41), (41, 42), (42, 40), (40, 40),  # cycle C + loop
             (3, 1)]                            # chain into feeder
    df = pd.DataFrame(edges, columns=["src", "dst"])

    adj, radj = {}, {}
    nodes = set()
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        radj.setdefault(b, set()).add(a)
        nodes |= {a, b}

    def reach(v, g):
        seen, cur = {v}, {v}
        while cur:
            cur = {w for u in cur for w in g.get(u, ())} - seen
            seen |= cur
        return seen

    want = {}
    for v in sorted(nodes):
        scc = reach(v, adj) & reach(v, radj)
        want[v] = min(scc)

    # distributed path (local_below=0 forces the exchange rounds)
    stats = {}
    got = strongly_connected_components(
        rd.from_pandas(df).repartition(3), stats=stats,
        local_below=0).to_pandas() \
        .set_index("node")["component"].to_dict()
    assert got == want
    assert stats["peels"] >= 2            # the feeder forces peeling
    assert got[5] == got[6] == got[7] == 5
    assert got[20] == got[21] == 20 and got[30] == 30

    # endgame local-finish (default): identical assignment, one task
    stats2 = {}
    got2 = strongly_connected_components(
        rd.from_pandas(df).repartition(3), stats=stats2).to_pandas() \
        .set_index("node")["component"].to_dict()
    assert got2 == got
    assert stats2.get("local_finish") is True


def test_filter_bindings_ops(ray_session):
    """filter_bindings: comparison + regex ops AND together; unbound
    (null) vars drop per SPARQL error semantics."""
    from omop2obo_ray.pipelines.graph import filter_bindings

    df = pd.DataFrame({
        "c": ["c1", "c2", "c10", "c3", None],
        "n": ["n1", "n2", "n2", "n3", "n1"]})
    ds = rd.from_pandas(df).repartition(2)

    out = filter_bindings(ds, [("n", "!=", "n3")]).to_pandas()
    assert sorted(out["c"].dropna()) == ["c1", "c10", "c2"]
    assert len(out) == 4  # the null-c row survives (c not filtered)

    out = filter_bindings(ds, [("c", "regex", "^c1")]).to_pandas()
    assert sorted(out["c"]) == ["c1", "c10"]   # null c dropped

    out = filter_bindings(
        ds, [("c", ">=", "c2"), ("n", "==", "n2")]).to_pandas()
    assert sorted(out["c"]) == ["c2"]          # 'c10' < 'c2' lexic.

    out = filter_bindings(ds, [("c", "not_regex", "1")]).to_pandas()
    assert sorted(out["c"]) == ["c2", "c3"]


def test_label_spreading_matches_oracle(ray_session):
    """label_spreading ≡ the synchronous python replay: seeds
    clamped, majority+lex tie-break, frontier grows one hop/round."""
    from omop2obo_ray.pipelines.graph import label_spreading

    edges = [(1, 2), (2, 3), (3, 4), (4, 5),      # chain
             (10, 11), (11, 12), (2, 10),          # branch
             (20, 21)]                              # unreachable pair
    seeds = {1: "A", 5: "B", 12: "C"}
    df = pd.DataFrame(edges, columns=["src", "dst"])
    sdf = pd.DataFrame({"node": list(seeds),
                        "label": list(seeds.values())})

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    lab = dict(seeds)
    for _ in range(3):
        new = {}
        for v in adj:
            votes = {}
            for u in adj[v]:
                if u in lab:
                    votes[lab[u]] = votes.get(lab[u], 0) + 1
            if v in seeds:
                new[v] = seeds[v]
            elif votes:
                new[v] = sorted(votes.items(),
                                key=lambda kv: (-kv[1], kv[0]))[0][0]
            elif v in lab:
                new[v] = lab[v]
        lab = new

    got = label_spreading(rd.from_pandas(df).repartition(3),
                          rd.from_pandas(sdf).repartition(2),
                          iterations=3).to_pandas() \
        .set_index("node")
    assert got["label"].to_dict() == lab
    assert set(got[got["is_seed"] == 1].index) == set(seeds)
    assert 20 not in got.index and 21 not in got.index


def test_triple_vote_matches_oracle(ray_session):
    """triple_vote: distinct-source counts, vote shares, plurality
    flag with lex tie-break; duplicate assertions collapse."""
    from omop2obo_ray.pipelines.graph import triple_vote

    rows = [
        ("e1", "born_in", "paris", "s1"),
        ("e1", "born_in", "paris", "s2"),
        ("e1", "born_in", "paris", "s2"),   # dup assertion
        ("e1", "born_in", "lyon", "s3"),
        ("e1", "born_in", "nice", "s4"),
        ("e2", "type", "city", "s1"),
        ("e3", "type", "a", "s1"), ("e3", "type", "b", "s2"),  # tie
    ]
    df = pd.DataFrame(rows, columns=["subj", "pred", "obj",
                                     "source"])
    got = triple_vote(rd.from_pandas(df).repartition(3)) \
        .to_pandas().set_index(["subj", "pred", "obj"])
    r = got.loc[("e1", "born_in", "paris")]
    assert (r["n_sources"], r["n_total"]) == (2, 4)
    assert abs(r["confidence"] - 0.5) < 1e-15
    assert r["is_majority"] == 1
    assert got.loc[("e1", "born_in", "lyon"), "is_majority"] == 0
    assert got.loc[("e2", "type", "city"), "confidence"] == 1.0
    # tie → lexicographically smallest object wins
    assert got.loc[("e3", "type", "a"), "is_majority"] == 1
    assert got.loc[("e3", "type", "b"), "is_majority"] == 0


def test_sssp_seed_dataset_matches_list(ray_session):
    """sssp with seeds as a Dataset (with duplicate seed rows) ≡
    sssp with the same seeds as a driver list (VERDICT r3 #2)."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.graph import sssp

    e = pd.DataFrame({
        "src": [1, 1, 2, 3, 4, 5, 2],
        "dst": [2, 3, 4, 4, 5, 6, 6],
        "w": [1, 4, 1, 1, 2, 3, 10]})
    seeds = [1, 3]
    a = (sssp(rd.from_pandas(e).repartition(3), seeds)
         .to_pandas().sort_values("node").reset_index(drop=True))
    seed_ds = rd.from_pandas(pd.DataFrame(
        {"node": [1, 3, 1, 3, 3]}))  # dup rows must be deduped
    b = (sssp(rd.from_pandas(e).repartition(3), seed_ds)
         .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_dag_depth_many_roots_no_driver_list(ray_session):
    """dag_depth on a DAG whose root set is ~half of all nodes (the
    web-graph shape): the root set flows into sssp as a Dataset —
    correctness checked against the closed-form depth."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.graph import dag_depth

    # 20_000 roots r_i -> mid(i%50) -> sink(i%7): depths are
    # roots 0, mids 1, sinks 2
    n_roots = 20_000
    roots = np.arange(n_roots, dtype=np.int64)
    mids = 10**6 + (roots % 50)
    sinks = 2 * 10**6 + (np.arange(50, dtype=np.int64) % 7)
    e = pd.DataFrame({
        "src": np.concatenate([roots, 10**6 + np.arange(50)]),
        "dst": np.concatenate([mids, sinks])})
    got = dag_depth(rd.from_pandas(e).repartition(8)).to_pandas()
    got = got.set_index("node")["depth"]
    assert len(got) == n_roots + 50 + 7
    assert (got.loc[roots] == 0).all()
    assert (got.loc[10**6 + np.arange(50)] == 1).all()
    assert (got.loc[np.unique(sinks)] == 2).all()


def test_katz_centrality_matches_matrix_replay(ray_session):
    """katz_centrality ≡ the numpy adjacency-power replay (exact
    integer scaled numerator, one final division)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.graph import katz_centrality

    e = pd.DataFrame({"src": [0, 0, 1, 2, 3, 3, 1],
                      "dst": [1, 2, 2, 3, 0, 1, 2]})  # dup edge 1->2
    got = (katz_centrality(rd.from_pandas(e).repartition(3),
                           beta_inv=8, rounds=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    A = np.zeros((4, 4), np.int64)
    for s, d in set(zip(e["src"], e["dst"])):
        A[s, d] = 1
    p = np.ones(4, np.int64)
    acc = np.full(4, 8 ** 3, np.int64)
    for k in range(1, 4):
        p = p @ A
        acc += p * 8 ** (3 - k)
    assert got["katz_num"].tolist() == acc.tolist()
    assert np.allclose(got["katz"], acc / 8.0 ** 3)


def test_graph_diff_statuses(ray_session):
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.graph import graph_diff

    old = pd.DataFrame({"src": [1, 1, 2, 2], "dst": [2, 3, 3, 3]})
    new = pd.DataFrame({"src": [1, 2, 4], "dst": [2, 4, 5]})
    got = (graph_diff(rd.from_pandas(old).repartition(2),
                      rd.from_pandas(new).repartition(2))
           .to_pandas().sort_values(["src", "dst"])
           .reset_index(drop=True))
    want = {(1, 2): "kept", (1, 3): "removed", (2, 3): "removed",
            (2, 4): "added", (4, 5): "added"}
    assert {(r.src, r.dst): r.status
            for r in got.itertuples()} == want
    assert len(got) == 5  # dup (2,3) in old counted once


def test_directed_wedge_pairs_modes(ray_session):
    """cocitation ≡ pairs sharing an in-link; coupling ≡ pairs
    sharing an out-link; dup edges collapse; hub guard excludes
    over-degree centers."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.graph import directed_wedge_pairs

    e = pd.DataFrame({
        "src": [1, 1, 2, 2, 3, 3, 3, 1],
        "dst": [10, 11, 10, 11, 10, 11, 12, 10]})  # dup (1,10)
    cc = (directed_wedge_pairs(rd.from_pandas(e).repartition(3),
                               mode="cocitation")
          .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    # citers: 1→{10,11}, 2→{10,11}, 3→{10,11,12}
    want_cc = {(10, 11): 3, (10, 12): 1, (11, 12): 1}
    assert {(r.a, r.b): r.n for r in cc.itertuples()} == want_cc

    bc = (directed_wedge_pairs(rd.from_pandas(e).repartition(3),
                               mode="coupling")
          .to_pandas())
    # targets: 10←{1,2,3}, 11←{1,2,3}, 12←{3}
    want_bc = {(1, 2): 2, (1, 3): 2, (2, 3): 2}
    assert {(r.a, r.b): r.n for r in bc.itertuples()} == want_bc

    # hub guard: cap 2 excludes center 3 (out-deg 3) in cocitation
    capped = (directed_wedge_pairs(rd.from_pandas(e),
                                   mode="cocitation",
                                   max_center_degree=2).to_pandas())
    assert {(r.a, r.b): r.n for r in capped.itertuples()} == {
        (10, 11): 2}


def test_page_meta_extraction(ray_session):
    """page_meta parses title/description/canonical/lang with both
    attribute orders, entity unescape and whitespace collapse."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.graph import page_meta

    pages = pd.DataFrame({"url": ["u1", "u2", "u3"], "html": [
        (b'<html lang="de"><head><title>A &amp;\n B</title>'
         b'<meta name="description" content="first desc">'
         b'<link href="https://c.test/x" rel="canonical">'
         b'</head></html>'),
        (b'<html><head><META CONTENT="swapped order" '
         b'NAME="description"></head><body>no title</body></html>'),
        b'<p>bare</p>']})
    got = (page_meta(rd.from_pandas(pages).repartition(2))
           .to_pandas().set_index("url").sort_index())
    assert got.loc["u1", "title"] == "A & B"
    assert got.loc["u1", "meta_description"] == "first desc"
    assert got.loc["u1", "canonical"] == "https://c.test/x"
    assert got.loc["u1", "html_lang"] == "de"
    assert got.loc["u2", "meta_description"] == "swapped order"
    assert got.loc["u2", "title"] == ""
    assert (got.loc["u3"] == "").all()


def test_wl_labels_distinguish_structure(ray_session):
    """WL colors: symmetric nodes share colors, structurally distinct
    nodes diverge; matches a pure-python replay."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.graph import wl_labels

    # path 1-2-3-4-5 plus triangle 10-11-12
    e = pd.DataFrame({
        "src": [1, 2, 3, 4, 10, 11, 12],
        "dst": [2, 3, 4, 5, 11, 12, 10]})
    got = (wl_labels(rd.from_pandas(e).repartition(3), rounds=2)
           .to_pandas().set_index("node")["wl"])

    adj = {}
    for s, d in zip(e["src"], e["dst"]):
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    lab = {n: str(len(v)) for n, v in adj.items()}
    for _ in range(2):
        lab = {n: hashlib.md5(
            (lab[n] + "|" + ",".join(sorted(lab[m] for m in adj[n])))
            .encode()).hexdigest() for n in adj}
    assert got.to_dict() == lab
    # symmetry: path ends equal, triangle nodes all equal
    assert got[1] == got[5] and got[2] == got[4]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[3] and got[10] != got[1]


def test_closure_local_finish_identity(ray_session):
    """ancestor_closure_distributed's endgame local-finish kernel
    (default local_below) ≡ the per-hop exchange path (local_below=0)
    on a diamond DAG with a shortcut and a multi-parent node."""
    from omop2obo_ray.pipelines.graph import ancestor_closure_distributed

    edges = pd.DataFrame({
        "child": [4, 4, 2, 3, 5, 6, 6],
        "parent": [2, 3, 1, 1, 4, 4, 1]})  # diamond 4→{2,3}→1, 6→{4,1}

    for include_self in (True, False):
        loc = ancestor_closure_distributed(
            rd.from_pandas(edges).repartition(2),
            include_self=include_self).to_pandas() \
            .sort_values(["node", "anc"]).reset_index(drop=True)
        dist = ancestor_closure_distributed(
            rd.from_pandas(edges).repartition(2),
            include_self=include_self, local_below=0).to_pandas() \
            .sort_values(["node", "anc"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(loc, dist)
    # diamond dedup: node 4 reaches root 1 via both 2 and 3 → once
    assert ((loc["node"] == 4) & (loc["anc"] == 1)).sum() == 1
