"""spark-submit graph-query entry point over the materialized sink.

    spark-submit --py-files dist/kg.zip jobs/run_graph.py \
        --warehouse /path/to/warehouse --query pagerank \
        [--output /path/to/result] [--show 20]

The reference's sink is a Gremlin graph container whose consumers
immediately TRAVERSE it ("data will be available in a graph database",
reference README.md:11) — Gremlin IS their query CLI.  This job is the
Spark-side equivalent over the pipeline's materialized ``edges`` table:
each ``--query`` dispatches to the corresponding ``kg.ops.graph``
operator and either writes the result as parquet (``--output``) or
prints the first ``--show`` rows in a deterministic order.  Label
typing (``--label`` / ``--first-label``/``--second-label``) maps to the
Gremlin ``out('label')`` form; the sink schema carries ``label`` on
every edge (Migrator.cs:147).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# direct `python jobs/run_graph.py` puts jobs/ on sys.path, not the repo
# root; on a cluster the package ships via --py-files instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "degrees",
    "degree-distribution",
    "two-hop",
    "pagerank",
    "ppr",
    "triangles",
    "clustering",
    "jaccard",
    "adamic-adar",
    "resource-allocation",
    "pref-attach",
    "katz",
    "khop",
    "sssp",
    "harmonic",
    "betweenness",
    "eccentricity",
    "hits",
    "lpa",
    "components",
    "mis",
    "coloring",
    "matching",
    "msf",
    "scc",
    "kcore",
    "ktruss",
    "assortativity",
    "rich-club",
    "transitivity",
    "walks",
    "skipgrams",
    "cooccur",
    "pmi",
    "summary",
    "toposort",
)


def _sources_df(spark, spec: str):
    ids = [s.strip() for s in spec.split(",") if s.strip()]
    if not ids:
        raise SystemExit("--sources must name at least one vertex id")
    return spark.createDataFrame([(i,) for i in ids], "id string")


def main(argv: list[str] | None = None, spark=None) -> None:
    """``spark=None`` builds and owns a session (spark-submit path);
    a caller-supplied session (tests) is reused and NOT stopped."""
    ap = argparse.ArgumentParser(description="kg graph queries")
    ap.add_argument("--warehouse", required=True,
                    help="pipeline warehouse root (reads <warehouse>/edges)")
    ap.add_argument("--query", required=True, choices=QUERIES)
    ap.add_argument("--label", default=None,
                    help="restrict to one edge label (degrees; Gremlin "
                         "bothE('label'))")
    ap.add_argument("--first-label", default=None,
                    help="type the first hop (two-hop)")
    ap.add_argument("--second-label", default=None,
                    help="type the second hop (two-hop)")
    ap.add_argument("--iters", type=int, default=3,
                    help="rank rounds (pagerank/ppr/hits/katz)")
    ap.add_argument("--sources", default=None,
                    help="comma-separated vertex ids "
                         "(ppr/khop/sssp/harmonic/betweenness/"
                         "eccentricity)")
    ap.add_argument("--k", type=int, default=2,
                    help="BFS depth (khop); degree threshold (kcore); "
                         "truss order (ktruss)")
    ap.add_argument("--rounds", type=int, default=3,
                    help="relaxation rounds = max path edges (sssp); "
                         "synchronous update rounds (lpa); peel rounds "
                         "(kcore); min-label propagation budget per "
                         "coloring pass (scc); BFS budget "
                         "(harmonic/betweenness/eccentricity); "
                         "selection rounds (mis/coloring); peel "
                         "rounds = longest dependency chain (toposort)")
    ap.add_argument("--trips", type=int, default=2,
                    help="trim+color trips (scc)")
    ap.add_argument("--weight-col", default=None,
                    help="edge weight column (sssp/pagerank/msf; default "
                         "unit weights)")
    ap.add_argument("--max-fanout", type=int, default=None,
                    help="drop mid/shared vertices above this degree "
                         "(two-hop/jaccard/adamic-adar super-node cap)")
    ap.add_argument("--min-common", type=int, default=1,
                    help="minimum shared neighbors "
                         "(jaccard/adamic-adar/pref-attach)")
    ap.add_argument("--walk-length", type=int, default=4,
                    help="steps per walk (walks/skipgrams)")
    ap.add_argument("--walks-per-vertex", type=int, default=1,
                    help="walk replicas per start vertex "
                         "(walks/skipgrams)")
    ap.add_argument("--seed", type=int, default=0,
                    help="hash-choice seed (walks/skipgrams/mis/"
                         "coloring)")
    ap.add_argument("--window", type=int, default=2,
                    help="skip-gram context window (skipgrams)")
    ap.add_argument("--min-count", type=int, default=1,
                    help="minimum shared contexts (cooccur)")
    ap.add_argument("--output", default=None,
                    help="write result parquet here instead of printing")
    ap.add_argument("--show", type=int, default=20,
                    help="rows to print when --output is not given")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    # reject filter flags the chosen query would silently ignore — the
    # same fail-loudly contract kg.ops.graph.degrees applies to
    # half-specified label filters: an untyped answer the caller
    # believes is typed is the worst outcome
    if args.label is not None and args.query != "degrees":
        raise SystemExit(
            f"--label applies to --query degrees only (got {args.query}); "
            "use --first-label/--second-label for two-hop"
        )
    if (
        args.first_label is not None or args.second_label is not None
    ) and args.query != "two-hop":
        raise SystemExit(
            "--first-label/--second-label apply to --query two-hop only"
        )

    owns = spark is None
    if owns:
        from kg.session import get_spark

        spark = get_spark(
            "kg-graph", shuffle_partitions=args.shuffle_partitions
        )
    try:
        from kg.ops import graph as g

        edges = spark.read.parquet(os.path.join(args.warehouse, "edges"))
        t0 = time.monotonic()
        if args.query == "degrees":
            out = (
                g.degrees(edges, label_col="label", label=args.label)
                if args.label is not None
                else g.degrees(edges)
            )
        elif args.query == "degree-distribution":
            out = g.degree_distribution(edges)
        elif args.query == "two-hop":
            typed = args.first_label is not None or args.second_label is not None
            out = g.two_hop(
                edges,
                max_fanout=args.max_fanout,
                label_col="label" if typed else None,
                first_label=args.first_label,
                second_label=args.second_label,
            )
        elif args.query == "pagerank":
            out = g.pagerank(
                edges, iters=args.iters, weight_col=args.weight_col
            )
        elif args.query == "ppr":
            if not args.sources:
                raise SystemExit("--query ppr requires --sources")
            out = g.personalized_pagerank(
                edges, _sources_df(spark, args.sources), iters=args.iters
            )
        elif args.query == "triangles":
            out = g.triangles(edges)
        elif args.query == "clustering":
            out = g.clustering_coefficient(edges)
        elif args.query == "jaccard":
            out = g.neighbor_jaccard(
                edges, min_common=args.min_common, max_fanout=args.max_fanout
            )
        elif args.query == "adamic-adar":
            out = g.adamic_adar(
                edges, min_common=args.min_common, max_fanout=args.max_fanout
            )
        elif args.query == "resource-allocation":
            out = g.resource_allocation(
                edges, min_common=args.min_common, max_fanout=args.max_fanout
            )
        elif args.query == "pref-attach":
            out = g.preferential_attachment(
                edges, min_common=args.min_common, max_fanout=args.max_fanout
            )
        elif args.query == "katz":
            out = g.katz(edges, iters=args.iters)
        elif args.query == "khop":
            if not args.sources:
                raise SystemExit("--query khop requires --sources")
            out = g.k_hop(edges, _sources_df(spark, args.sources), k=args.k)
        elif args.query == "sssp":
            if not args.sources:
                raise SystemExit("--query sssp requires --sources")
            out = g.shortest_paths(
                edges,
                _sources_df(spark, args.sources),
                rounds=args.rounds,
                weight_col=args.weight_col,
            )
        elif args.query == "harmonic":
            if not args.sources:
                raise SystemExit("--query harmonic requires --sources")
            out = g.harmonic_centrality(
                edges, _sources_df(spark, args.sources), rounds=args.rounds
            )
        elif args.query == "betweenness":
            if not args.sources:
                raise SystemExit("--query betweenness requires --sources")
            out = g.betweenness(
                edges, _sources_df(spark, args.sources), rounds=args.rounds
            )
        elif args.query == "eccentricity":
            if not args.sources:
                raise SystemExit("--query eccentricity requires --sources")
            out = g.eccentricity(
                edges, _sources_df(spark, args.sources), rounds=args.rounds
            )
        elif args.query == "hits":
            out = g.hits(edges, iters=args.iters)
        elif args.query == "lpa":
            out = g.label_propagation(edges, rounds=args.rounds)
        elif args.query == "kcore":
            out = g.k_core(edges, k=args.k, rounds=args.rounds)
        elif args.query == "ktruss":
            out = g.k_truss(edges, k=args.k, rounds=args.rounds)
        elif args.query == "assortativity":
            out = g.assortativity(edges)
        elif args.query == "rich-club":
            out = g.rich_club(edges)
        elif args.query == "transitivity":
            out = g.transitivity(edges)
        elif args.query == "scc":
            out = g.strongly_connected_components(
                edges, trips=args.trips, rounds=args.rounds
            )
        elif args.query == "walks":
            out = g.random_walks(
                edges,
                walk_length=args.walk_length,
                walks_per_vertex=args.walks_per_vertex,
                seed=args.seed,
            )
        elif args.query == "skipgrams":
            out = g.skipgram_pairs(
                g.random_walks(
                    edges,
                    walk_length=args.walk_length,
                    walks_per_vertex=args.walks_per_vertex,
                    seed=args.seed,
                ),
                window=args.window,
            )
        elif args.query == "cooccur":
            out = g.cooccurrence(
                edges,
                min_count=args.min_count,
                max_fanout=args.max_fanout,
            )
        elif args.query == "pmi":
            out = g.cooccurrence_pmi(
                edges,
                min_count=args.min_count,
                max_fanout=args.max_fanout,
            )
        elif args.query == "summary":
            out = g.graph_summary(edges)
        elif args.query == "mis":
            out = g.maximal_independent_set(
                edges, rounds=args.rounds, seed=args.seed
            )
        elif args.query == "coloring":
            out = g.greedy_coloring(
                edges, rounds=args.rounds, seed=args.seed
            )
        elif args.query == "matching":
            out = g.maximal_matching(
                edges, rounds=args.rounds, seed=args.seed
            )
        elif args.query == "toposort":
            out = g.topological_layers(edges, rounds=args.rounds)
        elif args.query == "msf":
            out = g.minimum_spanning_forest(
                edges, weight_col=args.weight_col, rounds=args.rounds
            )
        else:  # components
            out = g.components(edges)
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
            print(
                f"{args.query}: wrote {args.output} "
                f"in {time.monotonic() - t0:.1f}s"
            )
        else:
            # deterministic print order: sort on every column
            out.orderBy(*out.columns).show(args.show, truncate=False)
    finally:
        if owns:
            spark.stop()


if __name__ == "__main__":
    main()
