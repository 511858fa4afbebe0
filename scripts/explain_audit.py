"""Physical-plan audit for the headline queries.

Prints `explain("formatted")` for each headline query and greps the plan
for the properties that matter at 100 TB:

* parquet scans are column-pruned (ReadSchema lists only needed columns)
  and filters are pushed (PushedFilters non-empty where a filter exists);
* small dims join via BroadcastHashJoin, not SortMergeJoin;
* hot expressions sit inside WholeStageCodegen spans;
* no CartesianProduct outside the deliberate broadcast NL join in ANN.

Writes the summary to BENCH/PLANS.md.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from kg.session import get_spark
    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plan-audit", cores=4, shuffle_partitions=8)
    qs = entry.queries()
    names = [
        "edge_docs", "pricing_summary", "top_tokens_per_lang",
        "user_event_windows", "dedup_exact", "dedup_minhash",
        "dedup_embedding", "text_stats", "ann_brute_force", "ann_lsh", "ann_ivf",
        "graph_pagerank", "graph_triangles", "graph_jaccard",
        "repetition_stats", "graph_degree", "graph_two_hop",
        "ann_ivf_trained", "dedup_winnow", "dedup_paragraphs",
        "winnow_fingerprints", "decontaminate", "split_assign",
        "sample_stratified", "tfidf_topk", "pack_sequences",
        "graph_two_hop_typed", "graph_degree_typed", "graph_ppr",
        "graph_clustering", "graph_khop", "graph_components",
        "dedup_cluster_keepers", "curate_corpus",
        "corpus_profile", "sample_weighted", "lm_score",
        "clean_lines", "redact_pii", "graph_sssp", "ann_pq", "graph_hits",
        "graph_lpa", "ann_ivf_pq", "dsir", "gopher_quality", "bpe_tokens",
        "graph_kcore", "graph_assortativity", "graph_transitivity",
        "graph_scc", "graph_adamic_adar", "media_decode",
        "graph_resource_alloc", "graph_pagerank_weighted", "graph_ktruss",
        "graph_katz", "graph_pref_attach", "graph_harmonic", "ann_ivf_sq",
        "chunk_docs", "bm25_search", "vocab_coverage", "bigram_lm",
        "knn_graph",
        "graph_walks",
        "graph_cooccur", "graph_skipgrams", "graph_pmi", "graph_summary",
        "hybrid_search", "token_entropy", "bigram_surprisal",
        "graph_betweenness", "graph_eccentricity", "dedup_edit_distance",
        "dedup_overlap", "kmeans_clusters", "embedding_outliers",
        "event_funnel", "event_retention", "graph_mis", "span_census",
        "graph_coloring", "graph_matching", "graph_msf",
        "events_asof", "events_range_join", "dedup_semantic",
        "distinct_sketch", "ols_price_qty", "diverse_select",
        "skew_profile", "graph_toposort", "bloom_semi_join",
        "length_quantiles", "decayed_activity",
        "column_profile", "k_anonymity", "distribution_drift",
        "negative_samples", "cms_token_counts", "jl_projected",
        "ams_f2_tokens", "language_mix", "ngram_diversity",
        "event_transitions", "split_leakage", "hard_negatives",
        "isotropy", "graph_rich_club", "event_burstiness",
        "token_gini", "l_diversity", "t_closeness", "vocab_overlap",
        "rank_rbo", "zipf_slope", "entity_profile",
    ]
    lines = ["# Physical plan audit\n"]
    import contextlib
    import io

    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_cart = len(re.findall(r"CartesianProduct", plan))
        n_wsc = len(re.findall(r"WholeStageCodegen", plan))
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        lines.append(f"## {name}\n")
        lines.append(
            f"- joins: {n_bhj} broadcast-hash, {n_smj} sort-merge, "
            f"{n_cart} cartesian; {n_wsc} whole-stage-codegen spans"
        )
        for s in scans:
            cols = [c.split(":")[0] for c in s.split(",") if c]
            lines.append(f"- scan reads: {cols}")
        for p in pushed:
            if p:
                lines.append(f"- pushed filters: {p}")
        lines.append("")
        print(f"=== {name}: bhj={n_bhj} smj={n_smj} cart={n_cart} wsc={n_wsc}")
        for s in scans:
            print(f"- scan reads: {[c.split(':')[0] for c in s.split(',') if c]}")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
