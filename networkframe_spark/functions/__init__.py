"""Scale-extension operator library: text analysis, deduplication,
similarity search, multimodal column plumbing.

These go beyond the reference's surface (SURVEY §7 phase 3 / BASELINE
north star): the operations a large-scale training-data pipeline needs,
built on the same DataFrame-first principles — JVM-side built-in
functions wherever possible, Arrow-batched pandas UDFs only where the
semantics demand Python.
"""

from .dedup import (
    containment_duplicates,
    dedup_near,
    duplicate_clusters,
    embedding_duplicates,
    exact_duplicates,
    minhash_lsh_duplicates,
    ngram_jaccard_duplicates,
    simhash_duplicates,
)
from .retrieval import retrieval_metrics
from .search import bm25_top_docs, rrf_fuse
from .temporal import asof_join, funnel_counts, inter_event_stats, range_join
from .stats import (
    chi2_independence,
    group_percentiles,
    ks_test_2samp,
    psi_drift,
)
from .pipeline import (
    add_repetition_score,
    cap_per_group,
    dedup_chunks,
    filter_quality,
    hash_sample,
    leakage_report,
    ngram_decontaminate,
    pack_token_sequences,
    split_by_cluster,
    stratified_sample,
    tf_idf_top_terms,
    token_histogram,
    train_test_split,
)
from .similarity import (
    brute_force_top_k,
    embedding_gram,
    label_centroids,
    lsh_top_k,
    mine_hard_negatives,
    principal_component_scores,
)
from .text import (
    add_fingerprint,
    add_language_id,
    add_quality_score,
    add_token_count,
    redact_pii,
    tokens_col,
)

__all__ = [
    "exact_duplicates",
    "minhash_lsh_duplicates",
    "simhash_duplicates",
    "ngram_jaccard_duplicates",
    "embedding_duplicates",
    "brute_force_top_k",
    "lsh_top_k",
    "add_token_count",
    "add_quality_score",
    "add_language_id",
    "add_fingerprint",
    "tokens_col",
    "hash_sample",
    "train_test_split",
    "stratified_sample",
    "leakage_report",
    "add_repetition_score",
    "filter_quality",
    "token_histogram",
    "tf_idf_top_terms",
    "duplicate_clusters",
    "dedup_near",
    "bm25_top_docs",
    "group_percentiles",
    "chi2_independence",
    "ks_test_2samp",
    "psi_drift",
    "rrf_fuse",
    "retrieval_metrics",
    "pack_token_sequences",
    "containment_duplicates",
    "redact_pii",
    "dedup_chunks",
    "label_centroids",
    "ngram_decontaminate",
    "cap_per_group",
    "embedding_gram",
    "principal_component_scores",
    "asof_join",
    "range_join",
    "inter_event_stats",
    "funnel_counts",
    "split_by_cluster",
    "mine_hard_negatives",
]
