"""End-to-end test of the graph-query CLI (jobs/run_graph.py) over a
materialized-warehouse edge table."""

from __future__ import annotations

import os

import pytest

import jobs.run_graph as cli

# a→b→c chain typed 't', plus a d→c edge typed 'u'
_EDGES = [
    ("edge_1", "t", "a", "b"),
    ("edge_2", "t", "b", "c"),
    ("edge_3", "u", "d", "c"),
]


@pytest.fixture()
def warehouse(spark, tmp_path):
    wh = str(tmp_path / "wh")
    spark.createDataFrame(
        _EDGES, "id string, label string, out_id string, in_id string"
    ).write.mode("overwrite").parquet(os.path.join(wh, "edges"))
    return wh


def _run(spark, warehouse, tmp_path, *argv):
    out = str(tmp_path / "result")
    cli.main(
        ["--warehouse", warehouse, "--output", out, *argv], spark=spark
    )
    return spark.read.parquet(out)


def test_cli_degrees_typed(spark, warehouse, tmp_path):
    got = {
        r["id"]: r["degree"]
        for r in _run(
            spark, warehouse, tmp_path, "--query", "degrees", "--label", "t"
        ).collect()
    }
    # only the 't' edges count: d is absent, c has in-degree 1
    assert got == {"a": 1, "b": 2, "c": 1}


def test_cli_two_hop_typed(spark, warehouse, tmp_path):
    rows = _run(
        spark, warehouse, tmp_path,
        "--query", "two-hop", "--first-label", "t", "--second-label", "t",
    ).collect()
    assert {(r["src"], r["dst"]) for r in rows} == {("a", "c")}


def test_cli_pagerank_and_components(spark, warehouse, tmp_path):
    pr = _run(
        spark, warehouse, tmp_path, "--query", "pagerank", "--iters", "2"
    ).collect()
    assert {r["id"] for r in pr} == {"a", "b", "c", "d"}
    # sink c accumulates the most rank mass
    best = max(pr, key=lambda r: r["rank_fp"])
    assert best["id"] == "c"
    comp = _run(
        spark, warehouse, tmp_path, "--query", "components"
    ).collect()
    # one weak component containing everything, labeled by min id
    assert {r["component"] for r in comp} == {"a"}


def test_cli_khop_requires_sources_and_runs(spark, warehouse, tmp_path):
    with pytest.raises(SystemExit):
        cli.main(
            ["--warehouse", warehouse, "--query", "khop"], spark=spark
        )
    got = {
        r["id"]: r["hops"]
        for r in _run(
            spark, warehouse, tmp_path,
            "--query", "khop", "--sources", "a", "--k", "2",
        ).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2}


def test_cli_show_path_prints(spark, warehouse, tmp_path, capsys):
    cli.main(
        ["--warehouse", warehouse, "--query", "degree-distribution",
         "--show", "5"],
        spark=spark,
    )
    printed = capsys.readouterr().out
    assert "degree" in printed and "n_nodes" in printed


def test_cli_rejects_misapplied_label_flags(spark, warehouse):
    with pytest.raises(SystemExit):
        cli.main(
            ["--warehouse", warehouse, "--query", "pagerank",
             "--label", "t"],
            spark=spark,
        )
    with pytest.raises(SystemExit):
        cli.main(
            ["--warehouse", warehouse, "--query", "degrees",
             "--first-label", "t"],
            spark=spark,
        )


def test_cli_sssp_runs_and_requires_sources(spark, warehouse, tmp_path):
    got = {
        r["id"]: r["dist"]
        for r in _run(
            spark, warehouse, tmp_path,
            "--query", "sssp", "--sources", "a", "--rounds", "2",
        ).collect()
    }
    # unit weights over a→b→c: hop distances
    assert got == {"a": 0, "b": 1, "c": 2}
    with pytest.raises(SystemExit):
        cli.main(
            ["--warehouse", warehouse, "--query", "sssp"], spark=spark
        )


def test_cli_hits_and_lpa(spark, warehouse, tmp_path):
    # a→b→c chain + d→c: b and d are hubs into c, c the top authority
    h = {
        r["id"]: (r["hub_fp"], r["auth_fp"])
        for r in _run(
            spark, warehouse, tmp_path, "--query", "hits", "--iters", "2"
        ).collect()
    }
    assert set(h) == {"a", "b", "c", "d"}
    assert h["c"][1] == max(v[1] for v in h.values())
    # --rounds 1 (NOT the operator default) proves the flag is wired
    # through AND pins the exact one-round labels: undirected nbrs are
    # a:{b}, b:{a,c}, c:{b,d}, d:{c}, so each vertex takes its
    # neighbors' min initial label
    lpa = {
        r["id"]: r["community"]
        for r in _run(
            spark, warehouse, tmp_path, "--query", "lpa", "--rounds", "1"
        ).collect()
    }
    assert lpa == {"a": "b", "b": "a", "c": "b", "d": "c"}


def test_cli_kcore_and_assortativity(spark, warehouse, tmp_path):
    # k=1, 1 round: only vertices with an edge survive (all four here);
    # --k/--rounds NOT at operator defaults proves both flags are wired
    got = {
        r["id"]: r["core_degree"]
        for r in _run(
            spark, warehouse, tmp_path,
            "--query", "kcore", "--k", "2", "--rounds", "1",
        ).collect()
    }
    # undirected degrees: a1 b2 c2 d1 → a,d peel; b-c edge survives
    assert got == {"b": 1, "c": 1}
    rows = _run(
        spark, warehouse, tmp_path, "--query", "assortativity"
    ).collect()
    assert len(rows) == 1 and rows[0]["n_edges"] == 3


def test_cli_scc_and_transitivity(spark, warehouse, tmp_path):
    # the a→b→c / d→c graph is a DAG: every vertex trims to a singleton;
    # --trips/--rounds off operator defaults prove both flags are wired
    got = {
        r["id"]: r["scc"]
        for r in _run(
            spark, warehouse, tmp_path,
            "--query", "scc", "--trips", "3", "--rounds", "4",
        ).collect()
    }
    assert got == {"a": "a", "b": "b", "c": "c", "d": "d"}
    rows = _run(
        spark, warehouse, tmp_path, "--query", "transitivity"
    ).collect()
    # undirected a-b, b-c, d-c → degrees a1 b2 c2 d1 → 2 wedges, 0 closed
    assert len(rows) == 1
    assert (rows[0]["n_wedges"], rows[0]["n_closed"]) == (2, 0)
    assert rows[0]["transitivity"] == 0.0


def test_cli_adamic_adar(spark, warehouse, tmp_path):
    # undirected a-b, b-c, c-d: (a,c) share b, (b,d) share c — both
    # mids degree 2 → one micro-unit term floor(1e6/ln 2) = 1442695
    got = {
        (r["a"], r["b"]): r["aa_fp"]
        for r in _run(
            spark, warehouse, tmp_path, "--query", "adamic-adar"
        ).collect()
    }
    assert got == {("a", "c"): 1442695, ("b", "d"): 1442695}


def test_cli_resource_allocation_and_weighted_pagerank_flag(spark, warehouse, tmp_path):
    # undirected a-b, b-c, c-d: both witness mids have degree 2 → 500000
    got = {
        (r["a"], r["b"]): r["ra_fp"]
        for r in _run(
            spark, warehouse, tmp_path, "--query", "resource-allocation"
        ).collect()
    }
    assert got == {("a", "c"): 500000, ("b", "d"): 500000}


def test_cli_ktruss(spark, warehouse, tmp_path):
    # the a→b→c / d→c graph has no triangles: k=3 peels everything,
    # k=2 keeps all three undirected edges with support 0
    assert _run(
        spark, warehouse, tmp_path,
        "--query", "ktruss", "--k", "3", "--rounds", "1",
    ).count() == 0
    rows = _run(
        spark, warehouse, tmp_path,
        "--query", "ktruss", "--k", "2", "--rounds", "1",
    ).collect()
    assert {(r["u"], r["v"], r["support"]) for r in rows} == {
        ("a", "b", 0), ("b", "c", 0), ("c", "d", 0),
    }


def test_cli_pref_attach_and_katz(spark, warehouse, tmp_path):
    # undirected a-b, b-c, c-d (degrees a1 b2 c2 d1): (a,c) share b →
    # 1·2 = 2, (b,d) share c → 2·1 = 2
    got = {
        (r["a"], r["b"]): r["pref_attach"]
        for r in _run(
            spark, warehouse, tmp_path, "--query", "pref-attach"
        ).collect()
    }
    assert got == {("a", "c"): 2, ("b", "d"): 2}
    # directed a→b, b→c, d→c at alpha 0.05, one round: split(1e6) = 50000
    got = {
        r["id"]: r["katz_fp"]
        for r in _run(
            spark, warehouse, tmp_path, "--query", "katz", "--iters", "1"
        ).collect()
    }
    assert got == {
        "a": 1_000_000,
        "b": 1_050_000,
        "c": 1_100_000,
        "d": 1_000_000,
    }


def test_cli_harmonic(spark, warehouse, tmp_path):
    # directed a→b→c, d→c from source a: b at 1 hop, c at 2 hops
    got = {
        r["id"]: (r["hc_fp"], r["n_reached"])
        for r in _run(
            spark, warehouse, tmp_path,
            "--query", "harmonic", "--sources", "a", "--rounds", "3",
        ).collect()
    }
    assert got == {
        "a": (0, 0),
        "b": (1_000_000, 1),
        "c": (500_000, 1),
        "d": (0, 0),
    }
    with pytest.raises(SystemExit):
        cli.main(
            ["--warehouse", warehouse, "--query", "harmonic"], spark=spark
        )


def test_cli_walks_and_skipgrams(spark, warehouse, tmp_path):
    walks = _run(
        spark, warehouse, tmp_path,
        "--query", "walks", "--walk-length", "2",
    ).collect()
    seqs = {}
    for r in walks:
        seqs.setdefault(r["walk_id"], {})[r["step"]] = r["vertex"]
    # the a→b→c chain is forced (single out-neighbors); d→c stops at c
    assert seqs["a#0"] == {0: "a", 1: "b", 2: "c"}
    assert seqs["d#0"] == {0: "d", 1: "c"}
    sg = _run(
        spark, warehouse, tmp_path,
        "--query", "skipgrams", "--walk-length", "2", "--window", "1",
    ).collect()
    got = {
        (r["walk_id"], r["center"], r["context"], r["delta"]) for r in sg
    }
    assert ("a#0", "a", "b", 1) in got and ("a#0", "c", "b", -1) in got
    assert all(abs(r["delta"]) == 1 for r in sg)


def test_cli_cooccur(spark, tmp_path):
    wh = str(tmp_path / "whco")
    rows = [("e1", "t", "o1", "p1"), ("e2", "t", "o1", "p2"),
            ("e3", "t", "o2", "p1"), ("e4", "t", "o2", "p2"),
            ("e5", "t", "o2", "p3")]
    spark.createDataFrame(
        rows, "id string, label string, out_id string, in_id string"
    ).write.mode("overwrite").parquet(os.path.join(wh, "edges"))
    got = {
        (r["a"], r["b"]): r["n_shared"]
        for r in _run(
            spark, wh, tmp_path, "--query", "cooccur", "--min-count", "2"
        ).collect()
    }
    assert got == {("p1", "p2"): 2}


def test_cli_summary(spark, warehouse, tmp_path):
    r = _run(spark, warehouse, tmp_path, "--query", "summary").collect()[0]
    # a→b→c chain + d→c: 4 vertices, 3 edges, no loops, no reciprocals
    assert (r["n_vertices"], r["n_edges"], r["n_self_loops"]) == (4, 3, 0)
    assert r["density"] == 0.25 and r["reciprocity"] == 0.0


def test_cli_betweenness_and_eccentricity(spark, warehouse, tmp_path):
    # a→b→c: from source a, b is the only intermediate (δ = 1e6);
    # ecc(a) = 2 reaching {b, c}
    bc = {
        r["id"]: (r["bc_fp"], r["n_sources"])
        for r in _run(
            spark, warehouse, tmp_path,
            "--query", "betweenness", "--sources", "a", "--rounds", "3",
        ).collect()
    }
    assert bc["b"] == (1_000_000, 1)
    assert bc["a"] == (0, 0) and bc["c"] == (0, 1)
    ecc = {
        r["id"]: (r["ecc"], r["n_reached"])
        for r in _run(
            spark, warehouse, tmp_path,
            "--query", "eccentricity", "--sources", "a,d", "--rounds", "3",
        ).collect()
    }
    assert ecc == {"a": (2, 2), "d": (1, 1)}
    for q in ("betweenness", "eccentricity"):
        with pytest.raises(SystemExit):
            cli.main(["--warehouse", warehouse, "--query", q], spark=spark)


def test_cli_mis(spark, warehouse, tmp_path):
    got = {
        r["id"]: r["state"]
        for r in _run(
            spark, warehouse, tmp_path, "--query", "mis", "--rounds", "4"
        ).collect()
    }
    assert set(got) == {"a", "b", "c", "d"}
    ins = {v for v, s in got.items() if s == "in"}
    adj = {("a", "b"), ("b", "c"), ("d", "c")}
    adj |= {(y, x) for x, y in adj}
    assert ins and not any(
        (u, v) in adj for u in ins for v in ins if u != v
    )


def test_cli_coloring(spark, warehouse, tmp_path):
    got = {
        r["id"]: r["color"]
        for r in _run(
            spark, warehouse, tmp_path, "--query", "coloring",
            "--rounds", "4",
        ).collect()
    }
    assert set(got) == {"a", "b", "c", "d"}
    adj = {("a", "b"), ("b", "c"), ("d", "c")}
    # proper: no edge joins two same-colored vertices (NULL = uncolored)
    assert not any(
        got[u] is not None and got[u] == got[v] for u, v in adj
    )
    # 4 rounds on a 4-vertex path-ish graph must finish the coloring
    assert all(c is not None for c in got.values())


def test_cli_matching(spark, warehouse, tmp_path):
    got = {
        r["id"]: (r["match_id"], r["round"])
        for r in _run(
            spark, warehouse, tmp_path, "--query", "matching",
            "--rounds", "4",
        ).collect()
    }
    assert set(got) == {"a", "b", "c", "d"}
    # symmetric 1:1 partnership over real edges only
    adj = {("a", "b"), ("b", "c"), ("d", "c")}
    adj |= {(y, x) for x, y in adj}
    for x, (m, r) in got.items():
        if m is not None:
            assert (x, m) in adj and got[m] == (x, r)
    # maximality on this path graph: no edge fully unmatched
    assert all(
        got[u][0] is not None or got[v][0] is not None
        for u, v in [("a", "b"), ("b", "c"), ("d", "c")]
    )


def test_cli_msf_unit_weights(spark, warehouse, tmp_path):
    rows = _run(
        spark, warehouse, tmp_path, "--query", "msf", "--rounds", "4"
    ).collect()
    got = {(r["u"], r["v"]) for r in rows}
    # unit weights → a deterministic spanning forest: |V|-|components|
    # edges over the fixture graph, all of them real edges
    adj = {("a", "b"), ("b", "c"), ("c", "d")}
    assert got.issubset(adj)
    assert all(r["w"] == 1 for r in rows)
    verts = {x for e in adj for x in e}
    assert len(got) == len(verts) - 1  # fixture graph is connected


def test_cli_toposort(spark, warehouse, tmp_path):
    """a->b->c chain plus d->c: layers 0,1,2 with d at 0."""
    df = _run(
        spark, warehouse, tmp_path, "--query", "toposort",
        "--rounds", "5",
    )
    got = {r["id"]: r["layer"] for r in df.collect()}
    assert got == {"a": 0, "d": 0, "b": 1, "c": 2}


def test_cli_rich_club(spark, warehouse, tmp_path):
    got = {r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
           for r in _run(
               spark, warehouse, tmp_path, "--query", "rich-club"
           ).collect()}
    # chain a-b-c plus d-c: degrees a=1, b=2, c=2, d=1 -> club at k=2+
    # is empty; at k=1 (not in the default ks) b-c would qualify
    assert set(got) == {2, 4, 8, 16}
    assert all(v == (0, 0, None) for v in got.values())
