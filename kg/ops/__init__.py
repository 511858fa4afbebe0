"""Large-scale training-data operators over document / embedding tables.

First-class components alongside the KG pipeline: deduplication (exact,
paragraph, MinHash-LSH, SimHash, n-gram Jaccard, winnowing,
embedding-cosine), similarity search (brute-force, banded-LSH, IVF with
a k-means trainer, PQ ADC, IVF-PQ residual composite), text analysis
(language-ID, quality, Gopher rules, repetition signals, token counting,
fingerprinting, PII redaction), curation (decontamination, splits,
sampling, domain mixing, TF-IDF, LM scoring, DSIR selection, C4 line
cleaning, sequence packing, profiling), multimodal column plumbing, and
full-text retrieval (exact fixed-point BM25 top-k), and
graph queries over the materialized vertex/edge output (degrees, typed
2-hop, k-hop, shortest paths, PageRank plain/weighted/personalized,
HITS, Katz, harmonic, triangles, clustering coefficient, neighbor
Jaccard, Adamic-Adar,
resource allocation, preferential attachment, label propagation,
components, strongly connected
components, bounded k-core and k-truss peeling, degree assortativity,
global transitivity, one-row graph profile, deterministic DeepWalk
random walks + skip-gram pairs, bipartite co-occurrence + PMI).
"""

from kg.ops.curate import (  # noqa: F401
    chunk_documents,
    clean_lines,
    contamination_score,
    decontaminate,
    dsir_weights,
    pack_sequences,
    span_census,
    split_assign,
    split_leakage,
    stratified_sample,
    temperature_mix_weights,
    tfidf_topk,
    word_ngrams,
)
from kg.ops.dedup import (  # noqa: F401
    edit_distance_duplicates,
    embedding_near_duplicates,
    exact_duplicates,
    minhash_duplicates,
    ngram_jaccard_pairs,
    overlap_duplicates,
    paragraph_dedup,
    semantic_dedup,
    simhash_col,
    simhash_col_jvm,
    simhash_candidates,
    winnow_duplicates,
)
from kg.ops.bloom import bloom_bits, bloom_semi_join  # noqa: F401
from kg.ops.diverse import select_diverse  # noqa: F401
from kg.ops.events import (  # noqa: F401
    asof_join,
    cohort_retention,
    decayed_activity,
    event_transitions,
    funnel_steps,
    inter_event_stats,
    range_join,
)
from kg.ops.graph import (  # noqa: F401
    adamic_adar,
    negative_samples,
    assortativity,
    betweenness,
    clustering_coefficient,
    components,
    cooccurrence,
    cooccurrence_pmi,
    degree_distribution,
    graph_summary,
    greedy_coloring,
    maximal_matching,
    minimum_spanning_forest,
    degrees,
    eccentricity,
    harmonic_centrality,
    hits,
    k_core,
    k_hop,
    k_truss,
    katz,
    label_propagation,
    maximal_independent_set,
    neighbor_jaccard,
    pagerank,
    personalized_pagerank,
    preferential_attachment,
    random_walks,
    resource_allocation,
    rich_club,
    shortest_paths,
    skipgram_pairs,
    strongly_connected_components,
    transitivity,
    triangles,
    two_hop,
)
from kg.ops.kmeans import (  # noqa: F401
    embedding_outliers,
    kmeans_fit,
    kmeans_profile,
)
from kg.ops.minhash import minhash_candidate_pairs  # noqa: F401
from kg.ops.pca import (  # noqa: F401
    isotropy_score,
    jl_projection,
    pca_projection,
    top_principal_component,
)
from kg.ops.retrieval import (  # noqa: F401
    bm25_topk,
    rank_biased_overlap,
    rbo_weights_fp,
    rrf_fuse,
)
from kg.ops.sketch import (  # noqa: F401
    ams_f2,
    cms_cells,
    cms_estimate,
    mincount_distinct,
)
from kg.ops.quality import (  # noqa: F401
    column_profile,
    k_anonymity,
    l_diversity,
    t_closeness,
)
from kg.ops.stats import (  # noqa: F401
    distribution_drift,
    group_quantiles,
    ols_fit,
    skew_profile,
)
from kg.ops.similarity import (  # noqa: F401
    banded_lsh_pairs,
    banded_signatures,
    brute_force_topk,
    hard_negatives,
    ivf_assign,
    ivf_pq_topk,
    ivf_sq_topk,
    ivf_topk,
    knn_graph,
    lsh_ann_topk,
    pq_encode,
    pq_topk,
    sq_encode,
    sq_train,
    subvectors,
)
from kg.ops.text import (  # noqa: F401
    bigram_next_tokens,
    bigram_surprisal,
    doc_fingerprint,
    gopher_quality,
    language_id,
    ngram_diversity,
    quality_score,
    redact_pii,
    repetition_stats,
    token_count,
    token_entropy,
    token_gini,
    tokens_col,
    vocab_coverage,
    vocab_overlap,
    winnow_fingerprints,
    zipf_slope,
)
