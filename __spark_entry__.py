"""Driver contract: entry smoke, queries(), oracle_sql().

Every operator claimed in SURVEY.md §2 (plus the scale-extension ops)
gets a ``queries()`` entry running through the engine and a matching
DuckDB ``oracle_sql()`` string.  Conventions that keep the value-hash
comparison deterministic:

- every aggregate / computed column is aliased identically in both;
- floating SUM/AVG goes through DECIMAL (exact, order-independent)
  and is cast back to double;
- unordered float expressions (cosine, ratios) are rounded to 6 dp;
- graph construction follows FIXTURES.md §4: nodes = customer ∪
  supplier (supplier keys negated-1), edges = lineitem ⋈ orders.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkframe_spark import NetworkFrame
from networkframe_spark.functions.dedup import (
    MINHASH_PRIME,
    containment_duplicates,
    duplicate_clusters,
    embedding_duplicates,
    exact_duplicates,
    fuzzy_decontaminate,
    minhash_lsh_duplicates,
    minhash_params,
    minhash_signatures,
    ngram_jaccard_duplicates,
    semantic_dedup,
    simhash_table,
)
from networkframe_spark.functions.multimodal import extract_image_features
from networkframe_spark.functions.pipeline import (
    add_repetition_score,
    cap_per_group,
    chunk_documents,
    corpus_describe,
    curriculum_order,
    dedup_chunks,
    dedup_lines,
    filter_by_percentile,
    filter_quality,
    global_shuffle,
    mix_domains,
    ngram_decontaminate,
    split_by_cluster,
    hash_sample,
    leakage_report,
    pack_token_sequences,
    stratified_sample,
    tf_idf_top_terms,
    token_histogram,
    train_test_split,
)
from networkframe_spark.functions.search import bm25_top_docs, rrf_fuse
from networkframe_spark.functions.similarity import (
    brute_force_top_k,
    build_ivf_index,
    embedding_clusters,
    embedding_gram,
    ivf_index_search,
    ivf_top_k,
    label_centroids,
    lsh_top_k,
)
from networkframe_spark.functions.stats import group_percentiles
from networkframe_spark.functions.temporal import (
    asof_join,
    retention_cohorts,
    rolling_stats,
    funnel_counts,
    inter_event_stats,
    range_join,
)
from networkframe_spark.functions.text import (
    add_fingerprint,
    add_language_id,
    add_quality_score,
    char_entropy_score,
    add_token_count,
    redact_pii,
    unigram_logprob_score,
    word_tokens_col,
)
from networkframe_spark.sources import (
    load_graph,
    nation_region_graph,
    read_embeddings,
    read_events,
    read_table,
    save_graph,
    tpch_graph,
)
from networkframe_spark.streaming.ops import (
    session_stats,
    session_window_stats,
    user_event_sequences,
    windowed_event_counts,
)

# ---------------------------------------------------------------------------
# shared SQL prelude: the canonical graph as DuckDB CTEs
# ---------------------------------------------------------------------------
GRAPH_CTE = """
nodes AS (
  SELECT c_custkey AS id, 'customer' AS kind, c_name AS name,
         c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT -s_suppkey - 1 AS id, 'supplier' AS kind, s_name AS name,
         s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
),
edges AS (
  SELECT o_custkey AS source, -l_suppkey - 1 AS target,
         l_extendedprice AS weight
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
"""

TOKS_CTE = """
toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
)
"""

# word 3-gram shingles, mirroring networkframe_spark.functions.dedup.shingles_col
SHINGLE_CTE = (
    TOKS_CTE
    + """,
idx AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
  FROM toks
),
sh AS (
  SELECT DISTINCT doc_id AS id, array_to_string(t[i:i+2], ' ') AS sh
  FROM idx
  WHERE array_to_string(t[i:i+2], ' ') <> ''
)
"""
)

SIMHASH_BITS = 32
N_PERM = 4
# domain-mixture targets for mix_domains: upweight src0-src4 2x.  The
# fixture's 20 sources are uniform, so C* binds on the upweighted ones
# (kept whole) and the rest keep a 0.5 hash-bucket fraction.
MIX_WEIGHTS = {f"src{i}": (2.0 if i < 5 else 1.0) for i in range(20)}
PAGERANK_ITERS = 5


def _graph(spark: SparkSession, sf_dir: str, decimal_weight: bool = False) -> NetworkFrame:
    nf = tpch_graph(spark, sf_dir)
    if decimal_weight:
        nf = nf._return(
            edges=nf.edges.withColumn("weight", F.col("weight").cast("decimal(18,2)"))
        )
    return nf


# ---------------------------------------------------------------------------
# entry: flagship smoke query at sf0.001
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the TPC-H graph, filter nodes with closure,
    condense to the nation-level quotient graph."""
    nf = _graph(spark, "/root/testdata/sf0.001", decimal_weight=True)
    active = nf.query_nodes("acctbal > 0")
    cond = active.condense("nationkey", func="sum", columns=["weight"])
    return cond.edges.select(
        "source", "target", F.col("weight").cast("double").alias("block_weight")
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # -- S1 query_nodes (filter only) -----------------------------------
    def q_query_nodes(spark, sf):
        nf = _graph(spark, sf)
        return nf.query_nodes("acctbal > 5000").nodes.select(
            "id", "kind", "nationkey", "acctbal"
        )

    q["query_nodes"] = q_query_nodes

    # -- S1 closure: edges after node filter ----------------------------
    def q_query_nodes_closure(spark, sf):
        nf = _graph(spark, sf)
        return nf.query_nodes("acctbal > 1000").edges

    q["query_nodes_closure"] = q_query_nodes_closure

    # -- S2 query_edges --------------------------------------------------
    def q_query_edges(spark, sf):
        nf = _graph(spark, sf)
        return nf.query_edges("weight > @w", local_dict={"w": 50000}).edges

    q["query_edges"] = q_query_edges

    # -- S3 loc block selection ------------------------------------------
    def q_loc_block(spark, sf):
        nf = _graph(spark, sf)
        rows = nf.nodes.filter("kind = 'customer' AND nationkey < 5").select("id")
        cols = nf.nodes.filter("kind = 'supplier' AND nationkey < 5").select("id")
        return nf.loc[rows, cols].edges

    q["loc_block"] = q_loc_block

    # -- S5 remove_nodes (anti-join + closure) ---------------------------
    def q_remove_nodes(spark, sf):
        nf = _graph(spark, sf)
        victims = nf.nodes.filter("nationkey IN (0, 1, 2)").select("id")
        return nf.remove_nodes(victims).edges

    q["remove_nodes"] = q_remove_nodes

    # -- S6 remove_edges (pair anti-join) --------------------------------
    def q_remove_edges(spark, sf):
        nf = _graph(spark, sf)
        heavy = nf.edges.filter("weight > 80000")
        return nf.remove_edges(heavy).edges

    q["remove_edges"] = q_remove_edges

    # -- S8 add_nodes (union) --------------------------------------------
    def q_add_nodes(spark, sf):
        nf = _graph(spark, sf)
        nation = read_table(spark, sf, "nation").select(
            (F.col("n_nationkey").cast("long") + F.lit(1000000)).alias("id"),
            F.lit("nation").alias("kind"),
            F.col("n_name").alias("name"),
            F.col("n_nationkey").cast("int").alias("nationkey"),
            F.lit(None).cast("double").alias("acctbal"),
        )
        out = nf.add_nodes(nation)
        return out.nodes.select("id", "kind")

    q["add_nodes"] = q_add_nodes

    # -- S7 remove_unused_nodes (semi-join) ------------------------------
    def q_remove_unused_nodes(spark, sf):
        nf = _graph(spark, sf)
        return nf.remove_unused_nodes().nodes.select("id", "kind")

    q["remove_unused_nodes"] = q_remove_unused_nodes

    # -- S4 reindex_nodes -------------------------------------------------
    def q_reindex_nodes(spark, sf):
        nf = _graph(spark, sf)
        idx = spark.range(1, 2001).select(F.col("id").cast("long"))
        return nf.reindex_nodes(idx).nodes.select("id", "kind", "acctbal")

    q["reindex_nodes"] = q_reindex_nodes

    # -- J1 apply_node_features ------------------------------------------
    def q_apply_node_features(spark, sf):
        nf = _graph(spark, sf)
        out = nf.apply_node_features("nationkey", axis="both")
        return out.edges.select(
            "source", "target", "weight", "source_nationkey", "target_nationkey"
        )

    q["apply_node_features"] = q_apply_node_features

    # -- J2 node_agreement ------------------------------------------------
    def q_node_agreement(spark, sf):
        nf = _graph(spark, sf)
        a = nf.query_nodes("kind == 'customer'")
        b = nf.query_nodes("acctbal > 0")
        val = a.node_agreement(b)
        return spark.createDataFrame([(round(val, 6),)], "agreement double")

    q["node_agreement"] = q_node_agreement

    # -- G4/G5 groupby size ----------------------------------------------
    def q_groupby_size(spark, sf):
        nf = _graph(spark, sf)
        return nf.groupby_nodes("nationkey").size_edges()

    q["groupby_size"] = q_groupby_size

    # -- G6 condense sum (decimal-exact) ---------------------------------
    def q_condense_sum(spark, sf):
        nf = _graph(spark, sf, decimal_weight=True)
        cond = nf.condense("nationkey", func="sum", columns=["weight"])
        return cond.edges.select(
            "source", "target", F.col("weight").cast("double").alias("block_weight")
        )

    q["condense_sum"] = q_condense_sum

    # -- A10 k-hop aggregation (k=1, decimal-exact mean) ------------------
    def q_khop_agg(spark, sf):
        nf = _graph(spark, sf)
        pairs = nf.k_hop_pairs(1, directed=False, drop_self=True)
        feats = nf.nodes.select(
            F.col("id").alias("neighbor"), F.col("acctbal").cast("decimal(18,2)").alias("a")
        )
        return (
            pairs.join(feats, on="neighbor")
            .groupBy(F.col("node").alias("id"))
            .agg(
                F.count(F.lit(1)).alias("n_neighbors"),
                (F.sum("a").cast("double") / F.count(F.lit(1))).alias("acctbal_neighbor_mean"),
            )
        )

    q["khop_aggregation"] = q_khop_agg

    # -- A7 k-hop neighborhood (k=2 undirected from node 1) ---------------
    def q_khop_neighborhood(spark, sf):
        nf = _graph(spark, sf).persist()
        return nf.k_hop_neighborhood(1, 2, directed=False).nodes.select("id")

    q["khop_neighborhood"] = q_khop_neighborhood

    # -- A6 reachability on the sparse heavy-edge subgraph ----------------
    def q_reachable(spark, sf):
        nf = _graph(spark, sf).query_edges("weight > 103000").persist()
        seed = (
            nf.edges.orderBy(F.desc("weight"), F.asc("source"), F.asc("target"))
            .limit(1)
            .collect()[0]["source"]
        )
        out = nf.select_component_from_node(seed, directed=True)
        used = out.remove_unused_nodes()
        return used.nodes.select("id")

    q["reachable_from"] = q_reachable

    # -- A1-A4 weak components on the sparse subgraph ----------------------
    def q_components(spark, sf):
        nf = (
            _graph(spark, sf)
            .query_edges("weight > 103000")
            .remove_unused_nodes()
            .persist()
        )
        return nf.label_nodes_by_component(connection="weak").nodes.select(
            "id", "component"
        )

    q["weak_components"] = q_components

    # -- C7 aggregated (sparse) adjacency --------------------------------
    def q_aggregated_edges(spark, sf):
        nf = _graph(spark, sf, decimal_weight=True)
        return nf.aggregated_edges(weight_col="weight", aggfunc="sum").select(
            "source", "target", F.col("weight").cast("double").alias("weight")
        )

    q["aggregated_edges"] = q_aggregated_edges

    # -- G4 apply_edges with a non-size string agg ------------------------
    def q_apply_edges_max(spark, sf):
        nf = _graph(spark, sf)
        return nf.groupby_nodes("nationkey").apply_edges("max", columns=["weight"])

    q["apply_edges_max"] = q_apply_edges_max

    # -- G7/O3 largest connected component --------------------------------
    def q_largest_component(spark, sf):
        nf = (
            _graph(spark, sf)
            .query_edges("weight > 103000")
            .remove_unused_nodes()
            .persist()
        )
        return nf.largest_connected_component(connection="weak").nodes.select("id")

    q["largest_component"] = q_largest_component

    # -- A1 strong components on the cyclic nation<->region graph ---------
    def q_strong_components(spark, sf):
        nf = nation_region_graph(spark, sf)
        both = nf._return(
            edges=nf.edges.union(
                nf.edges.select(
                    F.col("target").alias("source"), F.col("source").alias("target")
                )
            )
        )
        return both.component_labels(directed=True, connection="strong")

    q["strong_components"] = q_strong_components

    # -- A8 bounded pair table (k=2) --------------------------------------
    def q_khop_pairs(spark, sf):
        nf = _graph(spark, sf).query_edges("weight > 103000").persist()
        return nf.k_hop_pairs(2, directed=False, drop_self=True)

    q["khop_pairs"] = q_khop_pairs

    # -- C1 validation as a query -----------------------------------------
    def q_validation(spark, sf):
        nf = _graph(spark, sf).persist()
        dup = nf.nodes.groupBy("id").count().filter(F.col("count") > 1).count()
        ids = nf.nodes.select("id")
        dangling = (
            nf.edges.select(F.col("source").alias("id"))
            .union(nf.edges.select(F.col("target").alias("id")))
            .distinct()
            .join(ids, on="id", how="left_anti")
            .count()
        )
        return spark.createDataFrame(
            [(dup, dangling)], "dup_ids long, dangling_endpoints long"
        )

    q["frame_validation"] = q_validation

    # -- C6 dense adjacency (small graph, via the driver-side export) ------
    def q_adjacency_dense(spark, sf):
        nf = nation_region_graph(spark, sf)
        weighted = nf._return(edges=nf.edges.withColumn("weight", F.lit(1.0)))
        mat = weighted.to_adjacency()  # pandas, id x id, zero-filled
        long = mat.reset_index().melt(
            id_vars="index", var_name="target", value_name="weight"
        )
        long.columns = ["source", "target", "weight"]
        return spark.createDataFrame(long).select(
            F.col("source").cast("long"),
            F.col("target").cast("long"),
            F.col("weight").cast("double"),
        )

    q["adjacency_dense"] = q_adjacency_dense

    # -- A3 component count ------------------------------------------------
    def q_n_components(spark, sf):
        nf = (
            _graph(spark, sf)
            .query_edges("weight > 103000")
            .remove_unused_nodes()
            .persist()
        )
        n = nf.n_connected_components(directed=False)
        full = nf.is_fully_connected(directed=False)
        return spark.createDataFrame(
            [(n, full)], "n_components long, fully_connected boolean"
        )

    q["n_components"] = q_n_components

    # -- G2/G3 group metadata ---------------------------------------------
    def q_group_metadata(spark, sf):
        nf = _graph(spark, sf)
        return nf.nodes.groupBy("nationkey").agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.array_join(F.sort_array(F.collect_list("id")), ",").alias("ids"),
        )

    q["group_metadata"] = q_group_metadata

    # -- J3 frame equality (order-insensitive comparator) ------------------
    def q_frame_equality(spark, sf):
        nf = _graph(spark, sf).persist()
        shuffled = nf._return(
            nodes=nf.nodes.orderBy(F.desc("id")), edges=nf.edges.orderBy(F.desc("weight"))
        )
        filtered = nf.query_nodes("acctbal > 5000")
        return spark.createDataFrame(
            [(nf == shuffled, nf == filtered)], "eq_self boolean, eq_filtered boolean"
        )

    q["frame_equality"] = q_frame_equality

    # -- C2/C3 serde round-trip --------------------------------------------
    def q_serde_roundtrip(spark, sf):
        nf = nation_region_graph(spark, sf)
        back = NetworkFrame.from_dict(nf.to_dict(), spark)
        return back.nodes.select("id", "name", "kind")

    q["serde_roundtrip"] = q_serde_roundtrip

    # -- distributed graph sink/source round-trip (sources.py:273/:320) ----
    # Writes the full TPC-H graph (nodes/edges parquet, source-bucketed
    # edge files, _graph manifest), reloads it, and reruns a node-filter
    # closure query on the reloaded frame — proving the manifest/bucket
    # path end-to-end under the value-hash oracle, not just plan tests.
    def q_graph_save_load(spark, sf):
        import os as _os
        import tempfile as _tempfile

        nf = _graph(spark, sf)
        path = _os.path.join(
            _tempfile.gettempdir(),
            # PID-suffixed: concurrent replay/bench processes on one
            # sf dir must never race on a shared round-trip dir
            f"nfspark_graph_rt_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        save_graph(nf, path, mode="overwrite", edge_buckets=8)
        back = load_graph(spark, path)
        return back.query_nodes("acctbal > 3000").edges

    q["graph_save_load"] = q_graph_save_load

    # small-files compaction round-trip: fragment documents into 32
    # shards, compact to ~1 file, prove the data survives bit-exact
    def q_compact_roundtrip(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.sources import compact_parquet

        base = _os.path.join(
            _tempfile.gettempdir(),
            # PID-suffixed: same no-shared-tmp-dir rule as the index
            # and graph round-trip queries
            f"nfspark_compact_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        docs = read_table(spark, sf, "documents")
        docs.repartition(32).write.mode("overwrite").parquet(base + "_src")
        back = compact_parquet(
            spark,
            base + "_src",
            base + "_dst",
            target_records_per_file=1_000_000,
            sort_by=["doc_id"],
        )
        return back.select("doc_id", "text", "lang", "source", "n_chars")

    q["compact_roundtrip"] = q_compact_roundtrip

    # -- A12 spectral ordering -----------------------------------------
    # Hash-checkable: tol=0 + fixed iterations converge the power
    # iteration to machine precision, abs() kills the eigenvector sign
    # ambiguity, and the oracle derives the closed-form limit (the
    # nation→region graph is R disjoint equal unit-weight stars, so the
    # uniform-init limit is the symmetric mix of per-star Perron
    # vectors: leaf = 1/sqrt(2N), center = sqrt(N/R) * leaf).
    def q_sort_spectral(spark, sf):
        nf = nation_region_graph(spark, sf)
        weighted = nf._return(edges=nf.edges.withColumn("weight", F.lit(1.0)))
        sorted_nf = weighted.sort_spectral(max_iter=200, tol=0.0)
        return sorted_nf.nodes.select(
            "id", F.round(F.abs(F.col("spectral_score")), 6).alias("abs_score")
        )

    q["sort_spectral"] = q_sort_spectral

    # -- text ops ----------------------------------------------------------
    def q_token_count(spark, sf):
        docs = read_table(spark, sf, "documents")
        return add_token_count(docs).select("doc_id", "n_tokens")

    q["token_count"] = q_token_count

    def q_bpe_tokens(spark, sf):
        docs = read_table(spark, sf, "documents")
        return docs.select(
            "doc_id", F.size(word_tokens_col("text")).alias("n_bpe_tokens")
        )

    q["bpe_token_count"] = q_bpe_tokens

    def q_lang_id(spark, sf):
        docs = read_table(spark, sf, "documents")
        return add_language_id(docs).select("doc_id", "lang_pred")

    q["language_id"] = q_lang_id

    def q_quality(spark, sf):
        docs = read_table(spark, sf, "documents")
        return add_quality_score(docs).select("doc_id", "quality_score")

    q["quality_score"] = q_quality

    # Gopher rule filter: min_words=20 sits inside the fixture's 10..99
    # token range so both outcomes occur on every rule-relevant column
    def q_gopher(spark, sf):
        from networkframe_spark.functions.text import gopher_rules

        docs = read_table(spark, sf, "documents")
        return gopher_rules(docs, min_words=20).select(
            "doc_id",
            "rule_word_count",
            "rule_mean_word_len",
            "rule_symbol_ratio",
            "rule_alpha_ratio",
            "rule_stopwords",
            "gopher_pass",
        )

    q["gopher_rules"] = q_gopher

    def q_clean_text(spark, sf):
        from networkframe_spark.functions.text import clean_text

        docs = read_table(spark, sf, "documents")
        return clean_text(docs).select("doc_id", "text", "n_chars_removed")

    q["clean_text"] = q_clean_text

    def q_fingerprint(spark, sf):
        docs = read_table(spark, sf, "documents")
        return add_fingerprint(docs).select("doc_id", "fingerprint")

    q["fingerprint"] = q_fingerprint

    # -- corpus pipeline ---------------------------------------------------
    def q_hash_sample(spark, sf):
        docs = read_table(spark, sf, "documents")
        return hash_sample(docs, fraction=0.25, seed=7).select("doc_id", "lang")

    q["hash_sample"] = q_hash_sample

    # per-row Bernoulli keep-probability = the doc's own quality score
    def q_weighted_sample(spark, sf):
        from networkframe_spark.functions.pipeline import weighted_sample

        docs = add_quality_score(read_table(spark, sf, "documents"))
        return weighted_sample(docs, "quality_score", seed=7).select(
            "doc_id", "quality_score"
        )

    q["weighted_sample"] = q_weighted_sample

    def q_train_test_split(spark, sf):
        docs = read_table(spark, sf, "documents")
        return train_test_split(docs, test_fraction=0.2, seed=7).select(
            "doc_id", "split"
        )

    q["train_test_split"] = q_train_test_split

    def q_stratified_sample(spark, sf):
        docs = read_table(spark, sf, "documents")
        return stratified_sample(
            docs,
            fractions={"en": 0.1, "de": 1.0, "zh": 0.5},
            strata_col="lang",
            seed=7,
        ).select("doc_id", "lang")

    q["stratified_sample"] = q_stratified_sample

    def q_leakage_report(spark, sf):
        # plant known contamination: a 30% sample of test leaks into
        # train; the report must recover exactly those documents
        # (fixture has no organic cross-split dups at this sf)
        docs = read_table(spark, sf, "documents")
        split = train_test_split(docs, test_fraction=0.2, seed=7)
        train = split.filter(F.col("split") == "train")
        test = split.filter(F.col("split") == "test")
        leaked = hash_sample(test, fraction=0.3, seed=3)
        return leakage_report(train.unionByName(leaked), test)

    q["leakage_report"] = q_leakage_report

    def q_repetition_score(spark, sf):
        docs = read_table(spark, sf, "documents")
        return add_repetition_score(docs, n=2).select("doc_id", "dup_ngram_frac")

    q["repetition_score"] = q_repetition_score

    def q_filter_quality(spark, sf):
        # thresholds chosen to actually discriminate on the fixture
        # (quality quartiles ~0.42/0.47/0.52; tokens 10..99)
        docs = read_table(spark, sf, "documents")
        return filter_quality(
            docs, min_quality=0.45, min_tokens=20, max_dup_ngram_frac=0.08
        ).select("doc_id")

    q["filter_quality"] = q_filter_quality

    def q_token_histogram(spark, sf):
        docs = read_table(spark, sf, "documents")
        return token_histogram(docs, bucket_width=20)

    q["token_histogram"] = q_token_histogram

    def q_tfidf_top_terms(spark, sf):
        docs = read_table(spark, sf, "documents")
        return tf_idf_top_terms(docs, k=3, min_token_len=3)

    q["tfidf_top_terms"] = q_tfidf_top_terms

    # -- dedup -------------------------------------------------------------
    def q_exact_dups(spark, sf):
        docs = read_table(spark, sf, "documents")
        return exact_duplicates(docs).select("doc_id", "canonical_id", "is_duplicate")

    q["exact_dedup"] = q_exact_dups

    def q_minhash(spark, sf):
        docs = read_table(spark, sf, "documents")
        sig = minhash_signatures(docs, n_perm=N_PERM)
        return sig.select(
            "doc_id",
            *[F.element_at("sig", i + 1).alias(f"h{i}") for i in range(N_PERM)],
        )

    q["minhash_signatures"] = q_minhash

    def q_jaccard(spark, sf):
        docs = read_table(spark, sf, "documents")
        return ngram_jaccard_duplicates(docs, n=3, threshold=0.5)

    q["ngram_jaccard_dedup"] = q_jaccard

    def q_simhash(spark, sf):
        docs = read_table(spark, sf, "documents")
        return simhash_table(docs, bits=SIMHASH_BITS)

    q["simhash"] = q_simhash

    def q_embed_dups(spark, sf):
        emb = read_embeddings(spark, sf)
        # 0.42 sits inside the fixture's similarity distribution (34
        # pairs at sf0.01) so the oracle check exercises real output;
        # the old 0.8 threshold matched zero pairs and passed trivially
        return embedding_duplicates(emb, threshold=0.42)

    q["embedding_dedup"] = q_embed_dups

    # the banded 100 TB path, forced (auto would pick exact at the
    # fixture's 500 rows): 4 planes x 2 tables over the 64-dim corpus
    # so buckets are populated; the oracle replays the banding with
    # the same inlined plane literals as lsh_recall_report, so the
    # score-before-dedup rewrite sits under the driver hash, not just
    # plan tests
    def q_embed_dups_lsh(spark, sf):
        emb = read_embeddings(spark, sf)
        return embedding_duplicates(
            emb, threshold=0.42, mode="lsh", n_planes=4, n_tables=2
        )

    q["embedding_dedup_lsh"] = q_embed_dups_lsh

    # the r16 auto-plane policy under the driver hash: n_planes=None
    # resolves via auto_n_planes(count, threshold, n_tables) — at
    # threshold 0.42 the S-curve recall cap pins planes to 4 at EVERY
    # corpus size (p=0.638: even 4 planes exceed a 1% miss budget at
    # 2 tables, so density can never push higher), making the oracle
    # the SAME banding SQL as embedding_dedup_lsh — if the policy
    # arithmetic drifts, the hash goes red
    def q_embed_dups_auto(spark, sf):
        emb = read_embeddings(spark, sf)
        return embedding_duplicates(
            emb, threshold=0.42, mode="lsh", n_planes=None, n_tables=2
        )

    q["embedding_dedup_auto"] = q_embed_dups_auto

    def q_lsh_dedup(spark, sf):
        docs = read_table(spark, sf, "documents")
        return minhash_lsh_duplicates(
            docs, n_perm=N_PERM, bands=2, threshold=0.5, verify=True
        )

    q["minhash_lsh_dedup"] = q_lsh_dedup

    # Cross-corpus fuzzy decontamination in the exhaustive bands=0
    # mode (every shared-shingle pair verified — exact for
    # threshold > 0, hence SQL-oracle-checkable; the banded scale path
    # is gated by a recall unit test, same split as cosine_topk_lsh).
    # Eval set = every 20th doc, so contamination provably exists.
    def q_fuzzy_decontaminate(spark, sf):
        docs = read_table(spark, sf, "documents")
        ev = docs.filter("doc_id % 20 = 0")
        return fuzzy_decontaminate(docs, ev, bands=0, threshold=0.5)

    q["fuzzy_decontaminate"] = q_fuzzy_decontaminate

    # recall of the BANDED fuzzy-decontamination scale path against
    # its own exhaustive (bands=0) truth — the lexical sibling of
    # semantic_decon_recall.  4-perm signatures in 2 bands x 2 rows
    # (the same deterministic LCG permutations minhash_lsh_dedup's
    # oracle already replays), disjoint train/eval split so recall
    # isn't propped up by self-pairs.  pred ⊆ truth by construction:
    # the banded path verifies exact Jaccard on collision pairs only.
    def q_fuzzy_decon_recall(spark, sf):
        from networkframe_spark.functions.similarity import (
            pair_recall_report,
        )

        docs = read_table(spark, sf, "documents")
        ev = docs.filter("doc_id % 20 = 0")
        tr = docs.filter("doc_id % 20 <> 0")
        truth = fuzzy_decontaminate(tr, ev, bands=0, threshold=0.5)
        pred = fuzzy_decontaminate(
            tr, ev, bands=2, n_perm=N_PERM, threshold=0.5
        )
        return pair_recall_report(truth, pred)

    q["fuzzy_decon_recall"] = q_fuzzy_decon_recall

    # -- similarity search -------------------------------------------------
    def q_topk(spark, sf):
        emb = read_embeddings(spark, sf)
        qs = emb.filter("vec_id < 10")
        return brute_force_top_k(emb, qs, k=3)

    q["cosine_topk"] = q_topk

    def q_mine_hard_negatives(spark, sf):
        from networkframe_spark.functions.similarity import (
            mine_hard_negatives,
        )

        emb = read_embeddings(spark, sf)
        anchors = emb.filter("vec_id < 10")
        return mine_hard_negatives(emb, k=3, anchors=anchors)

    q["mine_hard_negatives"] = q_mine_hard_negatives

    # LSH plumbing in deterministic degenerate mode: zero hyperplanes
    # puts every vector in one bucket, so the banded candidate join is
    # exhaustive and the output is bit-identical to brute force — the
    # same trick that makes exhaustive-probe IVF oracle-checkable.
    # Probabilistic recall of the real multi-plane path is covered by
    # unit tests (test_lsh_top_k_recall*).
    def q_topk_lsh(spark, sf):
        emb = read_embeddings(spark, sf)
        qs = emb.filter("vec_id < 10")
        return lsh_top_k(emb, qs, k=3, n_planes=0, n_tables=1)

    q["cosine_topk_lsh"] = q_topk_lsh

    # IVF index scale path.  n_probe == n_lists makes it exhaustive, so
    # this one IS oracle-checkable: identical output to brute force.
    def q_topk_ivf(spark, sf):
        emb = read_embeddings(spark, sf)
        qs = emb.filter("vec_id < 10")
        return ivf_top_k(emb, qs, k=3, n_lists=8, n_probe=8, n_iter=2)

    q["cosine_topk_ivf"] = q_topk_ivf

    # Persisted-IVF path (similarity.py:542/:593) under driver-grade
    # evidence: build the on-disk index (cells parquet PARTITIONED BY
    # list_id + centroid manifest), then probe it with
    # n_probe == n_lists — exhaustive, so the partition-pruned scan
    # path is oracle-identical to brute force (same trick as
    # cosine_topk_ivf).  Real deployments probe a fraction of cells;
    # the pruning plan shape is guarded in test_plans.py.
    def q_ivf_index_search(spark, sf):
        import os as _os
        import tempfile as _tempfile

        emb = read_embeddings(spark, sf)
        path = _os.path.join(
            _tempfile.gettempdir(),
            # PID-suffixed: two concurrent replay/bench processes on the
            # same sf dir must never share (and race on) one index dir
            f"nfspark_ivf_index_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_ivf_index(emb, path, n_lists=8, n_iter=2, mode="overwrite")
        qs = emb.filter("vec_id < 10")
        return ivf_index_search(spark, path, qs, k=3, n_probe=8)

    q["ivf_index_search"] = q_ivf_index_search

    # incremental index maintenance: build on the even half, APPEND
    # the odd half against the stored centroids, then exhaustive-probe
    # — cell membership depends only on the centroid manifest, so the
    # post-add search must equal brute force over the full corpus
    # (same oracle trick as ivf_index_search)
    def q_ivf_index_add(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.similarity import ivf_index_add

        emb = read_embeddings(spark, sf)
        path = _os.path.join(
            _tempfile.gettempdir(),
            # PID-suffixed: two concurrent replay/bench processes on the
            # same sf dir must never share (and race on) one index dir
            f"nfspark_ivf_add_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_ivf_index(
            emb.filter("vec_id % 2 = 0"), path, n_lists=8, n_iter=2,
            mode="overwrite",
        )
        ivf_index_add(spark, path, emb.filter("vec_id % 2 = 1"))
        qs = emb.filter("vec_id < 10")
        return ivf_index_search(spark, path, qs, k=3, n_probe=8)

    q["ivf_index_add_search"] = q_ivf_index_add

    # persisted LSH index (similarity.py build_lsh_index /
    # lsh_index_search): the corpus banded ONCE offline, probes
    # partition-prune the (table, bucket) dirs.  Exhaustive probing
    # (n_probe_bits = n_planes) is provably brute force — the same
    # oracle trick as ivf_index_search; genuine pruning is
    # plan-guarded in test_lsh_index_search_plan_prunes_partitions.
    def q_lsh_index_search(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.similarity import (
            build_lsh_index,
            lsh_index_search,
        )

        emb = read_embeddings(spark, sf)
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_lshidx_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_lsh_index(
            emb, path, n_planes=4, n_tables=2, mode="overwrite"
        )
        qs = emb.filter("vec_id < 10")
        return lsh_index_search(spark, path, qs, k=3, n_probe_bits=4)

    q["lsh_index_search"] = q_lsh_index_search

    # IVF-PQ (similarity.py build_ivfpq_index/ivfpq_search): coarse
    # cells store only PQ codes, probes partition-prune the code
    # files.  No-residual variant, so the exhaustive probe
    # (n_probe == n_lists) is bit-identical to pure ADC — the oracle
    # IS pq_search's (same first_ids codebook, queries, k); genuine
    # pruning is plan-guarded in test_ivfpq_index_search.
    def q_ivfpq_search(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.similarity import (
            build_ivfpq_index,
            ivfpq_search,
        )

        emb = read_embeddings(spark, sf)
        path = _os.path.join(
            _tempfile.gettempdir(),
            # PID-suffixed: two concurrent replay/bench processes on the
            # same sf dir must never share (and race on) one index dir
            f"nfspark_ivfpq_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_ivfpq_index(
            emb, path, n_lists=8, m=4, k_codes=16, n_iter=2,
            codebook_init="first_ids", residual=False, mode="overwrite",
        )
        qs = emb.filter("vec_id < 5").select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return ivfpq_search(spark, path, qs, k=5, n_probe=8)

    q["ivfpq_search"] = q_ivfpq_search

    # IVF-PQ recall under GENUINE pruning (n_probe=2 of 8 cells) vs
    # exact L2 truth — the quality counterweight to the codes-only
    # index's size wins.  coarse_init/codebook_init="first_ids" make
    # cell routing + codes fully SQL-replayable; the truth metric is
    # L2 (what the index approximates), so the report isolates
    # quantization + probe loss from cosine/L2 metric disagreement.
    def q_ivfpq_recall(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.similarity import (
            ann_recall_report,
            build_ivfpq_index,
            ivfpq_search,
        )

        emb = read_embeddings(spark, sf)
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_ivfpqr_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_ivfpq_index(
            emb, path, n_lists=8, m=4, k_codes=16,
            codebook_init="first_ids", coarse_init="first_ids",
            residual=False, mode="overwrite",
        )
        qs = emb.filter("vec_id < 10").select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        approx = ivfpq_search(spark, path, qs, k=5, n_probe=2)
        return ann_recall_report(
            emb, qs, approx, k=5, query_id_col="query_id",
            exclude_self=False, metric="l2",
        )

    q["ivfpq_recall"] = q_ivfpq_recall

    # incremental IVF-PQ maintenance: build the codes index on the
    # even half, APPEND the odd half against the STORED manifests
    # (codes layer twin of ivf_index_add_search), exhaustive-probe.
    # Codes quantize against the even-half first_ids codebook whether
    # written by build or by add, so the post-add search is pq_search
    # with that codebook over the FULL corpus — the oracle replays
    # exactly that (seeds = 16 smallest EVEN ids).
    def q_ivfpq_add_search(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.similarity import (
            build_ivfpq_index,
            ivfpq_index_add,
            ivfpq_search,
        )

        emb = read_embeddings(spark, sf)
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_ivfpqa_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_ivfpq_index(
            emb.filter("vec_id % 2 = 0"), path, n_lists=8, m=4,
            k_codes=16, codebook_init="first_ids",
            coarse_init="first_ids", residual=False, mode="overwrite",
        )
        ivfpq_index_add(spark, path, emb.filter("vec_id % 2 = 1"))
        qs = emb.filter("vec_id < 5").select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return ivfpq_search(spark, path, qs, k=5, n_probe=8)

    q["ivfpq_add_search"] = q_ivfpq_add_search

    # residual IVFADC under genuine pruning — the round-12 engine
    # path under the driver's own hash: first_ids coarse routing +
    # first_ids codebook TRAINED ON RESIDUALS (x − centroid[cell]),
    # per-(query, probed-cell) ADC, top-5 vs exact-L2 truth.  The
    # oracle replays the entire pipeline including the list-arithmetic
    # residuals (DuckDB list_transform over generate_series).
    def q_ivfpq_residual_recall(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.similarity import (
            ann_recall_report,
            build_ivfpq_index,
            ivfpq_search,
        )

        emb = read_embeddings(spark, sf)
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_ivfpqres_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_ivfpq_index(
            emb, path, n_lists=8, m=4, k_codes=16,
            codebook_init="first_ids", coarse_init="first_ids",
            residual=True, mode="overwrite",
        )
        qs = emb.filter("vec_id < 10").select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        approx = ivfpq_search(spark, path, qs, k=5, n_probe=2)
        return ann_recall_report(
            emb, qs, approx, k=5, query_id_col="query_id",
            exclude_self=False, metric="l2",
        )

    q["ivfpq_residual_recall"] = q_ivfpq_residual_recall

    # OPQ path under the driver hash (similarity.opq_rotation /
    # build_ivfpq_index(rotation=)): the whole index lives in rotated
    # space — coarse cells, codebook, codes — and ivfpq_search applies
    # the stored R to queries automatically.  The rotation here is a
    # LITERAL Givens-structured orthogonal matrix (theta=0.6 pairing
    # dim i with i+32, so it genuinely mixes across all four PQ
    # subspaces); production learns R via opq_rotation, but the
    # learned matrix is driver-side algebra — what the oracle must
    # pin is the ENGINE path: rotate -> route -> encode -> ADC.
    # Exhaustive no-residual probe == pq_search over the rotated
    # corpus, so the SQL twin is pq_search with a rotated e CTE
    # (float64 literals round-trip exactly; the Givens matmul is
    # bit-identical to the two-term expression).
    def q_ivfpq_opq(spark, sf):
        import math as _math
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.similarity import (
            build_ivfpq_index,
            ivfpq_search,
        )

        emb = read_embeddings(spark, sf)
        c, s = _math.cos(0.6), _math.sin(0.6)
        R = [[0.0] * 64 for _ in range(64)]
        for i in range(64):
            R[i][i] = c
        for i in range(32):
            R[i][i + 32] = s
            R[i + 32][i] = -s
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_ivfpqopq_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_ivfpq_index(
            emb, path, n_lists=8, m=4, k_codes=16,
            codebook_init="first_ids", coarse_init="first_ids",
            residual=False, rotation=R, mode="overwrite",
        )
        qs = emb.filter("vec_id < 5").select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return ivfpq_search(spark, path, qs, k=5, n_probe=8)

    q["ivfpq_opq"] = q_ivfpq_opq

    # oversampled IVF-PQ candidates + EXACT rerank (ann_rerank,
    # Jegou et al. 2011 re-rank-with-source-coding): the production
    # fix for the quantization recall cliff the 500k A/B measured —
    # codes prune to k'=15 candidates, full-precision vectors are
    # read ONLY for those pairs (broadcast join, corpus never
    # shuffles), exact 6-dp L2 re-ranks to the final top-5.  Same
    # first_ids index config as ivfpq_recall, so the oracle reuses
    # that CTE chain and appends the rerank join.
    def q_ivfpq_rerank(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.similarity import (
            ann_rerank,
            build_ivfpq_index,
            ivfpq_search,
        )

        emb = read_embeddings(spark, sf)
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_ivfpqrr_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_ivfpq_index(
            emb, path, n_lists=8, m=4, k_codes=16,
            codebook_init="first_ids", coarse_init="first_ids",
            residual=False, mode="overwrite",
        )
        qs = emb.filter("vec_id < 10").select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        cand = ivfpq_search(spark, path, qs, k=15, n_probe=2)
        return ann_rerank(cand, emb, qs, k=5, metric="l2")

    q["ivfpq_rerank"] = q_ivfpq_rerank

    # int8 scalar-quantized search (asymmetric: corpus stored as int8
    # codes + per-vector scale, queries full-precision) — the 8x
    # storage tier of the quantization family (SCALE.md r12 table:
    # recall 0.99/0.95 at 500k vs PQ's 0.26/0.11).  Exact L2 ranks
    # over the DEQUANTIZED corpus, so the whole code→score path is
    # SQL-replayable.
    def q_sq_topk(spark, sf):
        from networkframe_spark.functions.similarity import (
            brute_force_top_k,
            dequantize_expr,
            quantize_embeddings,
        )

        emb = read_embeddings(spark, sf)
        sq = quantize_embeddings(emb)
        deq = sq.select(
            "vec_id",
            dequantize_expr(F.col("qembedding"), F.col("scale")).alias(
                "embedding"
            ),
        )
        qs = emb.filter("vec_id < 10")
        return brute_force_top_k(
            deq, qs, k=5, exclude_self=False, metric="l2"
        )

    q["sq_topk"] = q_sq_topk

    # chunked offline ANN search (ann_search_batched): the residual
    # ADC guard's "chunk the query batch" remedy as an operator —
    # per-query independence makes chunked == one-shot bit-exactly,
    # so exhaustive-probe batched search shares pq_search's oracle
    def q_ivfpq_batched(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.similarity import (
            ann_search_batched,
            build_ivfpq_index,
        )

        emb = read_embeddings(spark, sf)
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_ivfpqb_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_ivfpq_index(
            emb, path, n_lists=8, m=4, k_codes=16,
            codebook_init="first_ids", residual=False, mode="overwrite",
        )
        qs = emb.filter("vec_id < 5").select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return ann_search_batched(
            spark, path, qs, batch_size=2, k=5, n_probe=8
        )

    q["ivfpq_batched"] = q_ivfpq_batched

    # persisted int8 IVF index (similarity.py build_ivf_sq_index /
    # ivf_sq_search): cells store quantize_embeddings codes + scale —
    # 8x smaller pruned scans at the measured 0.99/0.95 recall
    # (SCALE.md compression table).  Exhaustive probe is bit-identical
    # to brute L2 over the DEQUANTIZED corpus (the sq_topk
    # arithmetic); genuine pruning is plan-guarded in
    # test_ivf_sq_search_plan_prunes_partitions.
    def q_ivf_sq_search(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.similarity import (
            build_ivf_sq_index,
            ivf_sq_search,
        )

        emb = read_embeddings(spark, sf)
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_ivfsq_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_ivf_sq_index(emb, path, n_lists=8, n_iter=2, mode="overwrite")
        qs = emb.filter("vec_id >= 10 and vec_id < 20")
        return ivf_sq_search(
            spark, path, qs, k=4, n_probe=8, exclude_self=False
        )

    q["ivf_sq_search"] = q_ivf_sq_search

    # the index-maintenance duty cycle end-to-end: build the int8 IVF
    # store on the even half, APPEND the odd half against the stored
    # centroid manifest (ivf_sq_index_add), COMPACT the accumulated
    # small files (index_compact — the atomic-swap rewrite), then
    # exhaustive-probe.  Search is contract-identical across add and
    # compaction, so the oracle is simply sq-brute over the FULL
    # corpus — one hash pins all three operators.
    def q_ivf_sq_compacted(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.similarity import (
            build_ivf_sq_index,
            index_compact,
            ivf_sq_index_add,
            ivf_sq_search,
        )

        emb = read_embeddings(spark, sf)
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_ivfsqc_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_ivf_sq_index(
            emb.filter("vec_id % 2 = 0"), path, n_lists=4, n_iter=1,
            mode="overwrite",
        )
        ivf_sq_index_add(spark, path, emb.filter("vec_id % 2 = 1"))
        index_compact(spark, path)
        qs = emb.filter("vec_id < 8")
        return ivf_sq_search(
            spark, path, qs, k=3, n_probe=4, exclude_self=False
        )

    q["ivf_sq_compacted"] = q_ivf_sq_compacted

    # token-budgeted corpus selection (the curation pipeline's final
    # step): greedily keep the best-scoring docs whose running token
    # total fits the budget — rank by (score DESC, id), keep the
    # maximal prefix with inclusive cum <= budget.  Distributed
    # prefix sum (two-phase range scheme), no global window.
    def q_select_budget(spark, sf):
        from networkframe_spark.functions.pipeline import (
            select_under_budget,
        )

        docs = read_table(spark, sf, "documents")
        return select_under_budget(
            docs, budget=8_000, score_col="n_chars"
        )

    q["select_under_budget"] = q_select_budget

    # DSIR importance weights (Xie et al. 2023, unigram variant):
    # score every source doc by the target/source log-likelihood
    # ratio of its tokens (add-1 smoothing over the union vocab) —
    # the cheap lever for shifting a generic crawl toward a curated
    # target domain.  Target here: the corpus's English slice.
    def q_dsir(spark, sf):
        from networkframe_spark.functions.pipeline import dsir_weights

        docs = read_table(spark, sf, "documents")
        return dsir_weights(docs, docs.filter("lang = 'en'"))

    q["dsir_weights"] = q_dsir

    # Gumbel-top-k weighted sampling (Vieira 2014) — DSIR's
    # importance-resampling step as an operator: rank on w − ln(−ln u)
    # with the standard md5 coin, distributed TakeOrdered for the
    # global top-n, rank window over only the n survivors.
    def q_gumbel(spark, sf):
        from networkframe_spark.functions.pipeline import (
            gumbel_topk_sample,
        )

        docs = read_table(spark, sf, "documents").select(
            "doc_id", (F.col("n_chars") / 100.0).alias("weight")
        )
        return gumbel_topk_sample(docs, n=50)

    q["gumbel_topk"] = q_gumbel

    # persisted MinHash index (dedup.build_minhash_index /
    # minhash_index_decontaminate): the lexical twin of the embedding
    # LSH index — corpus shingled/signed/banded ONCE into a
    # (band, kmod)-partitioned store, every eval probe prunes at file
    # listing and decides on the signature-agreement estimate; the
    # oracle replays banding + estimate verbatim (no exhaustive trick).
    def q_minhash_index(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.dedup import (
            build_minhash_index,
            minhash_index_decontaminate,
        )

        docs = read_table(spark, sf, "documents")
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_mhidx_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_minhash_index(
            docs.filter("doc_id % 20 != 0"), path,
            n_perm=4, bands=2, n_kmod=16, mode="overwrite",
        )
        return minhash_index_decontaminate(
            spark, path, docs.filter("doc_id % 20 = 0"), threshold=0.25
        )

    q["minhash_index_decon"] = q_minhash_index

    # corpus SELF-dedup against the persisted index
    # (dedup.minhash_index_duplicates): the stored banding is
    # self-joined within (band, key) buckets — zero shingle
    # recomputation — decision = the same signature-agreement
    # estimate the decon probe uses, replayed verbatim below
    def q_minhash_index_dup(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.dedup import (
            build_minhash_index,
            minhash_index_duplicates,
        )

        docs = read_table(spark, sf, "documents")
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_mhdup_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_minhash_index(
            docs, path, n_perm=4, bands=2, n_kmod=16, mode="overwrite"
        )
        return minhash_index_duplicates(spark, path, threshold=0.25)

    q["minhash_index_dup"] = q_minhash_index_dup

    # incremental duty cycle: index the odd half, minhash_index_add the
    # even half, then dedup ONLY the delta (new x old + new x new pairs
    # via the partition-pruned probe) — the oracle replays the full
    # banding restricted to pairs touching the even half
    def q_minhash_index_dup_delta(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.dedup import (
            build_minhash_index,
            minhash_index_add,
            minhash_index_duplicates,
        )

        docs = read_table(spark, sf, "documents")
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_mhdupd_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_minhash_index(
            docs.filter("doc_id % 2 = 1"), path,
            n_perm=4, bands=2, n_kmod=16, mode="overwrite",
        )
        new = docs.filter("doc_id % 2 = 0")
        minhash_index_add(spark, path, new)
        return minhash_index_duplicates(
            spark, path, threshold=0.25, delta_docs=new
        )

    q["minhash_index_dup_delta"] = q_minhash_index_dup_delta

    # retraction lifecycle (similarity.index_remove): build on the
    # full corpus, remove the %5==1 slice in place (touched-partition
    # dynamic overwrite), probe with the %20==0 evals — the oracle is
    # the decon replay with the train side restricted to the
    # remaining ids (eval ids are %20==0 ⊂ %5==0, so removal never
    # touches a probe; self-collisions est=1.0 are in BOTH sides)
    def q_minhash_index_removed(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.dedup import (
            build_minhash_index,
            minhash_index_decontaminate,
        )
        from networkframe_spark.functions.similarity import index_remove

        docs = read_table(spark, sf, "documents")
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_mhrm_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_minhash_index(
            docs, path, n_perm=4, bands=2, n_kmod=16, mode="overwrite"
        )
        index_remove(
            spark, path, docs.filter("doc_id % 5 = 1").select("doc_id")
        )
        return minhash_index_decontaminate(
            spark, path, docs.filter("doc_id % 20 = 0"), threshold=0.25
        )

    q["minhash_index_removed"] = q_minhash_index_removed

    # sorted-neighborhood candidate pairs (Hernandez & Stolfo 1995
    # merge/purge): order-based blocking over a 12-char text prefix
    # key — the classic ER complement to the hash-bucket near-dup
    # families; global rank via the two-phase range scheme, pairing
    # via ONE floor(rank/window) equi-join, O(n x window) candidates
    def q_sorted_neighborhood(spark, sf):
        from networkframe_spark.functions.dedup import (
            sorted_neighborhood_pairs,
        )

        docs = read_table(spark, sf, "documents")
        return sorted_neighborhood_pairs(
            docs, F.lower(F.substring("text", 1, 12)), window=4
        )

    q["sorted_neighborhood"] = q_sorted_neighborhood

    # SNM blocking verified with the family's exact shingle Jaccard:
    # 16-char prefix key, window 8, threshold 0.5 — finds the
    # fixture's seeded near-dup pairs (25 at sf0.01) without any
    # shingle self-join
    def q_snm_dedup(spark, sf):
        from networkframe_spark.functions.dedup import snm_duplicates

        docs = read_table(spark, sf, "documents")
        return snm_duplicates(docs, window=8, threshold=0.5)

    q["snm_dedup"] = q_snm_dedup

    # SNM blocking recall vs the exhaustive shingle-Jaccard truth —
    # the driver-visible twin of SCALE.md's 256/256 sf0.1 rows (same
    # pattern as semantic_decon_recall / fuzzy_decon_recall: pred ⊆
    # truth by construction because the verify is exact, so recall is
    # the blocking assumption's true miss rate)
    def q_snm_recall(spark, sf):
        from networkframe_spark.functions.dedup import (
            ngram_jaccard_duplicates,
            snm_duplicates,
        )
        from networkframe_spark.functions.similarity import (
            pair_recall_report,
        )

        docs = read_table(spark, sf, "documents")
        truth = ngram_jaccard_duplicates(docs, threshold=0.5)
        pred = snm_duplicates(docs, window=8, threshold=0.5)
        return pair_recall_report(
            truth, pred, group_col="id_a", pair_cols=("id_a", "id_b")
        )

    q["snm_recall"] = q_snm_recall

    # multilayer flatten (C9 — the reference class is an all-pass
    # stub, reference multilayer.py:4-23; semantics are ours): two
    # overlapping customer layers with layer-specific node attrs;
    # flatten keeps the alphabetically-FIRST layer's attributes for
    # shared nodes (tagged-union + groupBy-min dedup, no global
    # window) and unions the edges with their layer tag — the result
    # joins the deduped nodes with the flattened out-degree so both
    # legs of flatten() land under one hash.
    def q_multilayer_flatten(spark, sf):
        from networkframe_spark.frame import NetworkFrame
        from networkframe_spark.multilayer import MultilayerNetworkFrame

        cust = read_table(spark, sf, "customer")

        def layer(pred, score):
            nodes = cust.filter(pred).select(
                F.col("c_custkey").cast("long").alias("id"),
                score.alias("score"),
            )
            edges = cust.filter(pred).select(
                F.col("c_custkey").cast("long").alias("source"),
                (F.col("c_custkey") % 100 + 1).cast("long").alias("target"),
            )
            return NetworkFrame(nodes, edges, directed=True)

        ml = MultilayerNetworkFrame(
            {
                "east": layer(
                    F.col("c_nationkey") < 12, F.round(F.col("c_acctbal"), 2)
                ),
                "west": layer(
                    F.col("c_nationkey") >= 5,
                    F.round(F.col("c_acctbal") * 2, 2),
                ),
            }
        )
        flat = ml.flatten()
        deg = flat.edges.groupBy("source").agg(
            F.count(F.lit(1)).alias("out_degree")
        )
        return (
            flat.nodes.join(deg, on=flat.nodes["id"] == deg["source"], how="left")
            .select(
                "id",
                "score",
                F.coalesce(F.col("out_degree"), F.lit(0))
                .cast("bigint")
                .alias("out_degree"),
            )
        )

    q["multilayer_flatten"] = q_multilayer_flatten

    # semantic decontamination (the paraphrase leg of the triad):
    # eval = every 20th vector, train = the rest; brute mode is exact.
    # threshold 0.42 sits at the synthetic corpus's cross-pair tail
    # (max cross cosine 0.49) so the result set is non-empty
    def q_semantic_decontaminate(spark, sf):
        from networkframe_spark.functions.similarity import (
            semantic_decontaminate,
        )

        emb = read_embeddings(spark, sf)
        ev = emb.filter("vec_id % 20 = 0")
        tr = emb.filter("vec_id % 20 <> 0")
        return semantic_decontaminate(tr, ev, threshold=0.42)

    q["semantic_decontaminate"] = q_semantic_decontaminate

    # recall of the LSH scale path of semantic decontamination vs its
    # own brute-force truth, per eval doc: 2 tables x 4 deterministic
    # hyperplanes over the same 1-in-20 eval split the brute query
    # uses.  pred ⊆ truth by construction (the lsh path computes the
    # same cosine on band-collision pairs only), so the report is the
    # banding's true miss rate — the number SCALE.md's RECALL table
    # tracks.  Oracle replays the banding with inlined plane literals
    # (same trick as lsh_recall_report).
    def q_semantic_decon_recall(spark, sf):
        from networkframe_spark.functions.similarity import (
            pair_recall_report,
            semantic_decontaminate,
        )

        emb = read_embeddings(spark, sf)
        ev = emb.filter("vec_id % 20 = 0")
        tr = emb.filter("vec_id % 20 <> 0")
        truth = semantic_decontaminate(tr, ev, threshold=0.42)
        pred = semantic_decontaminate(
            tr, ev, threshold=0.42, method="lsh", n_planes=4, n_tables=2
        )
        return pair_recall_report(truth, pred)

    q["semantic_decon_recall"] = q_semantic_decon_recall

    # int8 storage quantization: codes joined to one string so the
    # engines compare a scalar column, not array-repr formatting
    def q_quantize_embeddings(spark, sf):
        from networkframe_spark.functions.similarity import quantize_embeddings

        emb = read_embeddings(spark, sf)
        qz = quantize_embeddings(emb)
        return qz.select(
            "vec_id",
            F.round("scale", 9).alias("scale"),
            F.concat_ws(
                ",", F.transform(F.col("qembedding"), lambda v: v.cast("string"))
            ).alias("codes"),
        )

    q["quantize_embeddings"] = q_quantize_embeddings

    # kNN graph bridge: embeddings -> NetworkFrame edge table (exact
    # brute method = the oracle path; lsh/ivf are the scale methods).
    # Subset to 200 vectors: the all-pairs oracle is O(n^2) in DuckDB.
    def q_knn_graph(spark, sf):
        from networkframe_spark.functions.similarity import knn_graph

        emb = read_embeddings(spark, sf).filter("vec_id < 200")
        g = knn_graph(emb, k=3)
        return g.edges.select("source", "target", "weight", "rank")

    q["knn_graph"] = q_knn_graph

    # Matryoshka truncation: posexploded to (vec_id, pos, x) scalars
    # so the engines compare doubles, not array-repr formatting
    def q_truncate_embeddings(spark, sf):
        from networkframe_spark.functions.similarity import truncate_embeddings

        emb = read_embeddings(spark, sf)
        t = truncate_embeddings(emb, dim=16)
        return t.select(
            "vec_id", F.posexplode(F.col("embedding")).alias("pos", "x")
        )

    q["truncate_embeddings"] = q_truncate_embeddings

    # product quantization, oracle-checkable first_ids codebook (the
    # kmeans init is the production path; same assignment machinery)
    def q_pq_encode(spark, sf):
        from networkframe_spark.functions.similarity import pq_codebook, pq_encode

        emb = read_embeddings(spark, sf)
        cb = pq_codebook(emb, m=4, k=16, init="first_ids")
        return pq_encode(emb, cb).select(
            "vec_id",
            F.concat_ws(
                ",", F.transform(F.col("codes"), lambda v: v.cast("string"))
            ).alias("codes"),
        )

    q["pq_encode"] = q_pq_encode

    # ADC top-k on the codes; queries = the first 5 vectors
    def q_pq_search(spark, sf):
        from networkframe_spark.functions.similarity import (
            pq_codebook,
            pq_encode,
            pq_search,
        )

        emb = read_embeddings(spark, sf)
        cb = pq_codebook(emb, m=4, k=16, init="first_ids")
        codes = pq_encode(emb, cb)
        queries = emb.filter("vec_id < 5").select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return pq_search(codes, cb, queries, k=5)

    q["pq_search"] = q_pq_search

    # label-noise audit on the subset the O(n^2) oracle can afford
    def q_knn_label_check(spark, sf):
        from networkframe_spark.functions.similarity import knn_label_check

        emb = read_embeddings(spark, sf).filter("vec_id < 200")
        return knn_label_check(emb, k=5)

    q["knn_label_check"] = q_knn_label_check

    def q_merge_incremental(spark, sf):
        from networkframe_spark.functions.pipeline import merge_incremental

        events = read_events(spark, sf)
        # incoming batch: re-deliveries of even events with doubled
        # value and a later timestamp — latest must win
        incoming = (
            events.filter("event_id % 2 = 0")
            .withColumn("value", F.round(F.col("value") * 2, 2))
            .withColumn(
                "ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")
            )
        )
        merged = merge_incremental(
            events, incoming, key_col="event_id", tiebreak_col="user_id"
        )
        return merged.select("event_id", "user_id", "ts", "event_type", "value")

    q["merge_incremental"] = q_merge_incremental

    # diff a synthetic "next version": drop ids % 5 == 0, double the
    # value of ids % 3 == 0, add shifted new ids
    def q_table_diff(spark, sf):
        from networkframe_spark.functions.pipeline import table_diff

        events = read_events(spark, sf).select("event_id", "value")
        new = (
            events.filter("event_id % 5 != 0")
            .withColumn(
                "value",
                F.when(
                    F.col("event_id") % 3 == 0, F.round(F.col("value") * 2, 2)
                ).otherwise(F.col("value")),
            )
            .unionByName(
                events.select(
                    (F.col("event_id") + 1_000_000).alias("event_id"), "value"
                ).filter("event_id <= 1000100")
            )
        )
        return table_diff(events, new, key_col="event_id")

    q["table_diff"] = q_table_diff

    def q_json_key_profile(spark, sf):
        from networkframe_spark.functions.pipeline import json_key_profile

        events = read_events(spark, sf)
        return json_key_profile(events, "props")

    q["json_key_profile"] = q_json_key_profile

    # -- multimodal plumbing: binary payload -> Arrow UDF features ---------
    def q_multimodal(spark, sf):
        docs = read_table(spark, sf, "documents")
        media = docs.select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "UTF-8").alias("payload"),
            F.lit("image").alias("media_type"),
            (16 * (1 + F.col("doc_id") % 4)).cast("int").alias("width"),
            (16 * (1 + F.col("doc_id") % 3)).cast("int").alias("height"),
        )
        feats = extract_image_features(media)
        return feats.select(
            "media_id", "media_type", "n_bytes", F.round("aspect_ratio", 6).alias("aspect_ratio")
        )

    q["multimodal_features"] = q_multimodal

    # -- temporal / streaming-equivalent ----------------------------------
    def q_events_window(spark, sf):
        events = read_events(spark, sf)
        return windowed_event_counts(events, "1 hour")

    q["events_window_agg"] = q_events_window

    # batch twin of streaming/stream.stream_edge_condense: events as
    # edges user->event_type, quotient graph per tumbling hour
    def q_stream_condense_twin(spark, sf):
        from networkframe_spark.streaming.ops import windowed_edge_condense

        events = read_events(spark, sf)
        return windowed_edge_condense(events, "1 hour", cohorts=10)

    q["stream_condense_twin"] = q_stream_condense_twin

    # batch twin of streaming/stream.stream_neardup_parquet: the
    # documents table folded through neardup_increment in three
    # micro-batch slices (doc_id % 3) — the converged pair table must
    # equal batch MinHash-LSH over the whole corpus, so the oracle is
    # the full-corpus SQL: a driver-hashed stream≡batch equivalence
    def q_stream_neardup_twin(spark, sf):
        from networkframe_spark.streaming.ops import neardup_increment

        docs = read_table(spark, sf, "documents").select("doc_id", "text")
        state = (None, None, None)
        for i in range(3):
            sl = docs.filter(F.col("doc_id") % 3 == i)
            # materialize=True keeps the fold's plan bounded the way
            # the parquet-backed streaming sink does (its overwrite is
            # a materialization) — and checkpoints in dependency order
            # so the pairs job reads the docs/bands checkpoints
            # instead of re-deriving the whole fold (r17)
            state = neardup_increment(
                sl, *state, n_perm=N_PERM, n_bands=2, shingle_n=3,
                threshold=0.5, materialize=True,
            )
        return state[2]

    q["stream_neardup_twin"] = q_stream_neardup_twin

    def q_anomaly_zscore(spark, sf):
        from networkframe_spark.functions.temporal import anomaly_zscore

        events = read_events(spark, sf)
        return anomaly_zscore(events, n_rows=20, threshold=3.0)

    q["anomaly_zscore"] = q_anomaly_zscore

    def q_dup_ngram_fraction(spark, sf):
        from networkframe_spark.functions.pipeline import dup_ngram_fraction

        docs = read_table(spark, sf, "documents")
        return dup_ngram_fraction(docs, n=8)

    q["dup_ngram_fraction"] = q_dup_ngram_fraction

    def q_winsorize(spark, sf):
        from networkframe_spark.functions.stats import winsorize

        events = read_events(spark, sf)
        return winsorize(
            events, "value", 0.05, 0.95, group_col="event_type"
        ).select("event_id", "event_type", "value", "value_wins", "was_clamped")

    q["winsorize"] = q_winsorize

    def q_embedding_outliers(spark, sf):
        from networkframe_spark.functions.similarity import embedding_outliers

        emb = read_embeddings(spark, sf)
        return embedding_outliers(emb, pct=0.05)

    q["embedding_outliers"] = q_embedding_outliers

    def q_sessions(spark, sf):
        events = read_events(spark, sf)
        return session_stats(events, gap_minutes=30)

    q["sessionize"] = q_sessions

    def q_session_windows(spark, sf):
        events = read_events(spark, sf)
        return session_window_stats(events, gap="30 minutes")

    q["session_windows"] = q_session_windows

    # -- temporal joins (as-of, range) -------------------------------------
    def q_asof(spark, sf):
        events = read_events(spark, sf)
        clicks = events.filter("event_type = 'click'").select(
            "user_id", "ts", "event_id"
        )
        purchases = events.filter("event_type = 'purchase'").select(
            "user_id", "ts", "event_id", F.col("value")
        )
        out = asof_join(clicks, purchases, on="user_id", right_cols=["value"])
        return out.select(
            "user_id",
            "event_id",
            F.round("value_right", 6).alias("last_purchase_value"),
            F.col("ts_right").alias("last_purchase_ts"),
        )

    q["asof_join"] = q_asof

    def q_asof_forward(spark, sf):
        events = read_events(spark, sf)
        clicks = events.filter("event_type = 'click'").select(
            "user_id", "ts", "event_id"
        )
        purchases = events.filter("event_type = 'purchase'").select(
            "user_id", "ts", "event_id", F.col("value")
        )
        out = asof_join(
            clicks, purchases, on="user_id", right_cols=["value"],
            direction="forward",
        )
        return out.select(
            "user_id",
            "event_id",
            F.round("value_right", 6).alias("next_purchase_value"),
            F.col("ts_right").alias("next_purchase_ts"),
        )

    q["asof_join_forward"] = q_asof_forward

    def q_asof_nearest(spark, sf):
        events = read_events(spark, sf)
        clicks = events.filter("event_type = 'click'").select(
            "user_id", "ts", "event_id"
        )
        purchases = events.filter("event_type = 'purchase'").select(
            "user_id", "ts", "event_id", F.col("value")
        )
        out = asof_join(
            clicks, purchases, on="user_id", right_cols=["value"],
            direction="nearest", tolerance_seconds=86400,
        )
        return out.select(
            "user_id",
            "event_id",
            F.round("value_right", 6).alias("near_purchase_value"),
            F.col("ts_right").alias("near_purchase_ts"),
        )

    q["asof_join_nearest"] = q_asof_nearest

    def q_range_join(spark, sf):
        events = read_events(spark, sf)
        clicks = events.filter("event_type = 'click'").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        errors = events.filter("event_type = 'error'").select(
            "user_id", "ts", F.col("event_id").alias("error_id")
        )
        out = range_join(clicks, errors, on="user_id", window_seconds=600)
        return out.select("user_id", "click_id", F.col("error_id_right").alias("error_id"))

    q["range_join"] = q_range_join

    def q_sliding(spark, sf):
        events = read_events(spark, sf)
        return (
            events.groupBy(
                "event_type",
                F.window("ts", "1 hour", "30 minutes")["start"].alias("window_start"),
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
        )

    q["events_sliding_window"] = q_sliding

    # batch twin of streaming dropDuplicates-within-watermark
    def q_event_dedup(spark, sf):
        events = read_events(spark, sf)
        return events.select("user_id", "event_type").dropDuplicates(
            ["user_id", "event_type"]
        )

    q["event_dedup"] = q_event_dedup

    # -- round-2 extensions: centrality, motifs, cluster dedup, search,
    # -- distribution stats -------------------------------------------------
    def q_pagerank(spark, sf):
        nf = _graph(spark, sf)
        return nf.pagerank(damping=0.85, n_iter=PAGERANK_ITERS)

    q["pagerank"] = q_pagerank

    def q_pagerank_weighted(spark, sf):
        # weighted transition shares: heavy order edges carry more
        # rank mass; 6-dp-quantized weights + decimal out-weight sums
        # keep the shares engine-portable
        nf = _graph(spark, sf)
        return nf.pagerank(
            damping=0.85, n_iter=PAGERANK_ITERS, weight_col="weight"
        )

    q["pagerank_weighted"] = q_pagerank_weighted

    def q_triangles(spark, sf):
        # doc-clique graph: docs < 450 form 7 mod-cliques, the rest are
        # isolated (exercises the zero-fill path)
        docs = read_table(spark, sf, "documents")
        ids = docs.select(F.col("doc_id").alias("id"))
        pairs = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("a.id % 7 = b.id % 7 AND a.id < b.id"))
            .filter("a.id < 450 AND b.id < 450")
            .select(F.col("a.id").alias("source"), F.col("b.id").alias("target"))
        )
        return NetworkFrame(ids, pairs).triangle_counts()

    q["triangle_count"] = q_triangles

    def q_dedup_clusters(spark, sf):
        docs = read_table(spark, sf, "documents")
        pairs = ngram_jaccard_duplicates(docs, n=3, threshold=0.5)
        return duplicate_clusters(docs, pairs)

    q["dedup_clusters"] = q_dedup_clusters

    def q_bm25(spark, sf):
        docs = read_table(spark, sf, "documents")
        return bm25_top_docs(docs, ["spark", "hash", "vector"], k=10)

    q["bm25_search"] = q_bm25

    # persisted inverted text index (sixth family): probe ≡ transient
    # BM25 bit-for-bit — the oracle replays the full-corpus scoring
    def q_text_index_search(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.search import (
            build_text_index,
            text_index_search,
        )

        docs = read_table(spark, sf, "documents")
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_tix_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_text_index(docs, path, n_kmod=16, mode="overwrite")
        return text_index_search(
            spark, path, ["spark", "hash", "vector"], k=10
        )

    q["text_index_search"] = q_text_index_search

    # incremental duty cycle: index the even half, text_index_add the
    # odd half (stored params + exact-integer meta deltas) — probe ≡
    # the same full-corpus BM25 the oracle replays
    def q_text_index_added(spark, sf):
        import os as _os
        import shutil as _shutil
        import tempfile as _tempfile

        from networkframe_spark.functions.search import (
            build_text_index,
            text_index_add,
            text_index_search,
        )

        docs = read_table(spark, sf, "documents")
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_tixadd_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        _shutil.rmtree(path, ignore_errors=True)
        build_text_index(docs.filter("doc_id % 2 = 0"), path, n_kmod=16)
        text_index_add(spark, path, docs.filter("doc_id % 2 = 1"))
        return text_index_search(
            spark, path, ["spark", "hash", "vector"], k=10
        )

    q["text_index_added"] = q_text_index_added

    # batched retrieval run: per-query BM25 top-k against the persisted
    # index (one pruned postings scan for the term union; query-keyed
    # top-k window, never global) — the shape rrf_fuse(query_col=)
    # fuses with vector rankings
    def q_text_index_batch(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.search import (
            build_text_index,
            text_index_search_batch,
        )

        docs = read_table(spark, sf, "documents")
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_tixb_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_text_index(docs, path, n_kmod=16, mode="overwrite")
        queries = spark.createDataFrame(
            [
                (1, ["spark", "hash"]),
                (2, ["vector", "data", "spark"]),
                (3, ["partition"]),
            ],
            "query_id long, terms array<string>",
        )
        return text_index_search_batch(spark, queries, path, k=5)

    q["text_index_batch"] = q_text_index_batch

    # hybrid retrieval: BM25 (persisted text index) + cosine ANN
    # (persisted LSH index, exhaustive-probe so the vector leg is
    # provably brute force — the lsh_index_search oracle trick) fused
    # per query with RRF.  The oracle composes the three proven SQL
    # twins (per-query BM25, brute cosine top-k, decimal RRF).
    def q_hybrid_search(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.search import (
            build_text_index,
            hybrid_search_batch,
        )
        from networkframe_spark.functions.similarity import build_lsh_index

        docs = read_table(spark, sf, "documents")
        emb = read_embeddings(spark, sf)
        base = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_hyb_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_text_index(docs, base + "/tix", n_kmod=16, mode="overwrite")
        build_lsh_index(
            emb, base + "/lsh", n_planes=4, n_tables=2, mode="overwrite"
        )
        terms = spark.createDataFrame(
            [
                (0, ["spark", "hash"]),
                (1, ["vector", "data"]),
                (2, ["partition", "spark"]),
            ],
            "query_id long, terms array<string>",
        )
        queries = terms.join(
            emb.selectExpr("vec_id as query_id", "embedding"),
            on="query_id",
        )
        return hybrid_search_batch(
            spark,
            queries,
            base + "/tix",
            base + "/lsh",
            k=10,
            lexical_k=5,
            vector_k=3,
            n_probe_bits=4,  # = n_planes: exhaustive, vector leg == brute
            exclude_self=True,
        )

    q["hybrid_search"] = q_hybrid_search

    # hybrid retrieval with the QUANTIZED vector leg (r15 verdict task
    # 2): vector_index="ivf_sq" rides the int8 IVF store — the 100 TB
    # memory answer — instead of LSH.  Exhaustive probe (n_probe =
    # n_lists) makes the leg equal brute L2 over the DEQUANTIZED
    # corpus (the sq_topk oracle arithmetic), so the whole fusion is
    # SQL-expressible: BM25 twin + sq-brute twin + decimal RRF.
    def q_hybrid_search_ivfsq(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.search import (
            build_text_index,
            hybrid_search_batch,
        )
        from networkframe_spark.functions.similarity import (
            build_ivf_sq_index,
        )

        docs = read_table(spark, sf, "documents")
        emb = read_embeddings(spark, sf)
        base = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_hybsq_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_text_index(docs, base + "/tix", n_kmod=16, mode="overwrite")
        build_ivf_sq_index(
            emb, base + "/ivfsq", n_lists=8, n_iter=2, mode="overwrite"
        )
        terms = spark.createDataFrame(
            [
                (0, ["spark", "hash"]),
                (1, ["vector", "data"]),
                (2, ["partition", "spark"]),
            ],
            "query_id long, terms array<string>",
        )
        queries = terms.join(
            emb.selectExpr("vec_id as query_id", "embedding"),
            on="query_id",
        )
        return hybrid_search_batch(
            spark,
            queries,
            base + "/tix",
            base + "/ivfsq",
            k=10,
            lexical_k=5,
            vector_k=3,
            vector_index="ivf_sq",
            n_probe=8,  # = n_lists: exhaustive, vector leg == sq-brute
            exclude_self=False,
        )

    q["hybrid_search_ivfsq"] = q_hybrid_search_ivfsq

    # exact phrase search over the POSITIONAL text index (r15 verdict
    # task 4): build half the corpus with positions=True, text_index_add
    # the other half (pinning the positional add ≡ rebuild identity),
    # then phrase-probe — Lucene PhraseQuery semantics (tf = phrase
    # occurrences, df = matching docs) through the same partition-pruned
    # postings read as bag-of-terms search.
    def q_phrase_search(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.search import (
            build_text_index,
            text_index_add,
            text_index_phrase_search,
        )

        docs = read_table(spark, sf, "documents")
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_phr_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_text_index(
            docs.filter("doc_id % 2 = 0"), path, n_kmod=16,
            mode="overwrite", positions=True,
        )
        text_index_add(spark, path, docs.filter("doc_id % 2 = 1"))
        return text_index_phrase_search(spark, path, ["hash", "join"], k=10)

    q["phrase_search"] = q_phrase_search

    # CJK-aware tokenization (r15 verdict task 5): whitespace split +
    # character-bigram expansion of CJK/kana tokens (C4/CCNet and
    # Lucene CJKAnalyzer practice) — a whitespace tokenizer sees one
    # CJK sentence as ONE token, silently degrading BM25/shingles/
    # token gates on multilingual corpora.  Deterministic inline
    # mixed-script fixture (the sf documents are ASCII-only).
    _CJK_FIXTURE = [
        (0, "the weather is nice today"),
        (1, "今日は良い天気です"),
        (2, "明日も良い天気でしょう"),
        (3, "spark で 分散処理 is fast"),
        (4, "天気 weather 天気"),
        (5, "悪い天気の日"),
        (6, "nothing related here"),
        (7, "良い本を読む"),
    ]

    def q_cjk_tokens(spark, sf):
        from networkframe_spark.functions.text import tokens_col

        docs = spark.createDataFrame(
            _CJK_FIXTURE, "doc_id long, text string"
        )
        t = tokens_col("text", mode="cjk_aware")
        return docs.select(
            "doc_id",
            F.size(t).cast("bigint").alias("n_tokens"),
            F.concat_ws("|", t).alias("tok_str"),
        )

    q["cjk_tokens"] = q_cjk_tokens

    def q_cjk_bm25(spark, sf):
        from networkframe_spark.functions.search import bm25_top_docs

        docs = spark.createDataFrame(
            _CJK_FIXTURE, "doc_id long, text string"
        )
        # the query phrase expands through the SAME tokenizer:
        # '良い天気' -> ['良い', 'い天', '天気']
        return bm25_top_docs(
            docs, ["良い天気"], k=10, tokenizer="cjk_aware"
        )

    q["cjk_bm25"] = q_cjk_bm25

    def q_percentiles(spark, sf):
        events = read_events(spark, sf)
        return group_percentiles(
            events, "value", "event_type", ps=(0.25, 0.5, 0.9, 0.99)
        )

    q["value_percentiles"] = q_percentiles

    def q_pack(spark, sf):
        docs = read_table(spark, sf, "documents")
        return pack_token_sequences(docs, max_tokens=2048)

    q["pack_sequences"] = q_pack

    def q_sequences(spark, sf):
        events = read_events(spark, sf)
        return user_event_sequences(events)

    q["user_sequences"] = q_sequences

    def q_containment(spark, sf):
        docs = read_table(spark, sf, "documents")
        return containment_duplicates(docs, n=3, threshold=0.8)

    q["containment_dedup"] = q_containment

    def q_redact(spark, sf):
        # plant deterministic PII spans so the redaction has visible
        # effect on the synthetic corpus; the oracle plants identically
        docs = read_table(spark, sf, "documents")
        planted = docs.select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com")),
                ).otherwise(F.lit("")),
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.concat(F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".1")),
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
        out = redact_pii(planted)
        return out.select(
            "doc_id", "n_email", "n_ipv4", "n_phone",
            F.substring("text_redacted", 1, 80).alias("head"),
        )

    q["pii_redact"] = q_redact

    def q_describe(spark, sf):
        return _graph(spark, sf).describe()

    q["graph_describe"] = q_describe

    # -- round-2 session-3 extensions: BFS distances, k-core, link
    # -- prediction, chunk-level dedup, label centroids ---------------------
    def q_hop_distances(spark, sf):
        nf = _graph(spark, sf).query_edges("weight > 103000").persist()
        seed = (
            nf.edges.orderBy(F.desc("weight"), F.asc("source"), F.asc("target"))
            .limit(1)
            .collect()[0]["source"]
        )
        return nf.hop_distances(seed, directed=False)

    q["hop_distances"] = q_hop_distances

    # double-sweep diameter bound on the same heavy subgraph (nodes
    # pruned to edge-incident ones so the min-id seed is in-component)
    def q_approx_diameter(spark, sf):
        nf = (
            _graph(spark, sf)
            .query_edges("weight > 103000")
            .remove_unused_nodes()
            .persist()
        )
        return nf.approx_diameter(directed=False)

    q["approx_diameter"] = q_approx_diameter

    def q_embedding_drift(spark, sf):
        from networkframe_spark.functions.similarity import embedding_drift

        emb = read_embeddings(spark, sf)
        return embedding_drift(
            emb.filter("vec_id % 2 = 0"), emb.filter("vec_id % 2 = 1")
        )

    q["embedding_drift"] = q_embedding_drift

    def q_k_core(spark, sf):
        nf = _graph(spark, sf).query_edges("weight > 103000")
        return nf.k_core(2)

    q["k_core"] = q_k_core

    def q_link_prediction(spark, sf):
        nf = _graph(spark, sf)
        return nf.link_prediction(min_common=2, max_hub_degree=50)

    q["link_prediction"] = q_link_prediction

    def q_dedup_chunks(spark, sf):
        docs = read_table(spark, sf, "documents")
        out = dedup_chunks(docs, chunk_tokens=20)
        return out.select(
            "doc_id", "n_chunks", "n_kept",
            F.substring("text_deduped", 1, 120).alias("head"),
        )

    q["dedup_chunks"] = q_dedup_chunks

    def q_label_centroids(spark, sf):
        emb = read_embeddings(spark, sf)
        out = label_centroids(emb)
        return out.select(
            "label", "n_vectors",
            F.posexplode("centroid").alias("pos", "c"),
        )

    q["label_centroids"] = q_label_centroids

    def q_decontaminate(spark, sf):
        docs = read_table(spark, sf, "documents")
        split = train_test_split(docs, test_fraction=0.2, seed=7)
        train = split.filter("split = 'train'")
        test = split.filter("split = 'test'")
        return ngram_decontaminate(train, test, n=4)

    q["ngram_decontaminate"] = q_decontaminate

    # MassiveText §2.1 exact-substring rule: stride-1 eval windows vs
    # strided corpus windows; (25, 26) guarantees every shared
    # 50-token run is caught
    def q_exact_substring_decontaminate(spark, sf):
        from networkframe_spark.functions.pipeline import (
            exact_substring_decontaminate,
        )

        docs = read_table(spark, sf, "documents")
        split = train_test_split(docs, test_fraction=0.2, seed=7)
        train = split.filter("split = 'train'")
        test = split.filter("split = 'test'")
        return exact_substring_decontaminate(train, test, window=25, stride=26)

    q["exact_substring_decontaminate"] = q_exact_substring_decontaminate

    def q_cap_per_group(spark, sf):
        docs = read_table(spark, sf, "documents")
        return cap_per_group(docs, "source", 15).select("doc_id", "source")

    q["cap_per_group"] = q_cap_per_group

    def q_ppr(spark, sf):
        nf = _graph(spark, sf)
        return nf.pagerank(
            damping=0.85, n_iter=PAGERANK_ITERS, personalize=[1, 2, 3]
        )

    q["pagerank_personalized"] = q_ppr

    def q_ppr_batch(spark, sf):
        # same three seeds as q_ppr, but as three INDEPENDENT restart
        # vectors computed in one set of rounds (sparse (seed, id)
        # state); oracle unrolls the identical scaled-long arithmetic
        nf = _graph(spark, sf)
        return nf.pagerank_personalized_batch(
            [1, 2, 3], damping=0.85, n_iter=PAGERANK_ITERS
        )

    q["pagerank_personalized_batch"] = q_ppr_batch

    def q_embedding_gram(spark, sf):
        emb = read_embeddings(spark, sf)
        return embedding_gram(emb, method="explode")

    q["embedding_gram"] = q_embedding_gram

    def q_graph_metrics(spark, sf):
        return _graph(spark, sf).metrics()

    q["graph_metrics"] = q_graph_metrics

    def q_inter_event(spark, sf):
        events = read_events(spark, sf)
        return inter_event_stats(events)

    q["inter_event_stats"] = q_inter_event

    def q_funnel(spark, sf):
        events = read_events(spark, sf)
        return funnel_counts(events, "click", "purchase", within_minutes=60)

    q["funnel"] = q_funnel

    def q_local_clustering(spark, sf):
        # same doc-clique graph as triangle_count (cliques => 1.0,
        # isolated => 0.0 — both branches exercised)
        docs = read_table(spark, sf, "documents")
        ids = docs.select(F.col("doc_id").alias("id"))
        pairs = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("a.id % 7 = b.id % 7 AND a.id < b.id"))
            .filter("a.id < 450 AND b.id < 450")
            .select(F.col("a.id").alias("source"), F.col("b.id").alias("target"))
        )
        return NetworkFrame(ids, pairs).local_clustering()

    q["local_clustering"] = q_local_clustering

    def q_split_by_cluster(spark, sf):
        docs = read_table(spark, sf, "documents")
        pairs = ngram_jaccard_duplicates(docs, n=3, threshold=0.5)
        return split_by_cluster(docs, pairs, test_fraction=0.2, seed=7)

    q["split_by_cluster"] = q_split_by_cluster

    # -- round-5 pipeline ops ----------------------------------------------
    def q_dedup_lines(spark, sf):
        # single-line fixture corpus: sep=" " runs the same operator as
        # common-token (stopword-style) removal — tokens present in
        # >= 400 distinct docs are the "boilerplate lines"
        docs = read_table(spark, sf, "documents")
        return dedup_lines(docs, min_docs=400, sep=" ")

    q["dedup_lines"] = q_dedup_lines

    def q_chunk_documents(spark, sf):
        docs = read_table(spark, sf, "documents")
        return chunk_documents(docs, chunk_size=32, stride=24)

    q["chunk_documents"] = q_chunk_documents

    def q_mix_domains(spark, sf):
        docs = read_table(spark, sf, "documents")
        return mix_domains(docs, MIX_WEIGHTS, domain_col="source").select(
            "doc_id", "source"
        )

    q["mix_domains"] = q_mix_domains

    def q_global_shuffle(spark, sf):
        docs = read_table(spark, sf, "documents")
        return global_shuffle(docs, key_col="doc_id", seed=7).select(
            "doc_id", "shuffle_key"
        )

    q["global_shuffle"] = q_global_shuffle

    def q_filter_percentile(spark, sf):
        docs = read_table(spark, sf, "documents")
        return filter_by_percentile(
            docs, "n_chars", pct=0.75, keep="above"
        ).select("doc_id", "n_chars")

    q["filter_by_percentile"] = q_filter_percentile

    def q_semantic_dedup(spark, sf):
        # score="expr" is the pure-SQL twin of the DuckDB oracle; the
        # Arrow matmul path (default) is pair-set-equal away from the
        # threshold boundary and covered by unit tests
        emb = read_embeddings(spark, sf)
        return semantic_dedup(
            emb, n_clusters=8, threshold=0.35, init="first_ids", score="expr"
        )

    q["semantic_dedup"] = q_semantic_dedup

    # The production Arrow matmul path under the SAME value-hash
    # oracle: since the numpy scorer rounds half-up exactly like
    # F.round/DuckDB (similarity.round_half_up), the two paths are
    # bit-identical on the fixture — no more "pair-set-equal away from
    # the boundary" hedge.
    def q_semantic_dedup_arrow(spark, sf):
        emb = read_embeddings(spark, sf)
        return semantic_dedup(
            emb, n_clusters=8, threshold=0.35, init="first_ids", score="arrow"
        )

    q["semantic_dedup_arrow"] = q_semantic_dedup_arrow

    def q_shortest_paths(spark, sf):
        # same heavy subgraph + deterministic seed as hop_distances;
        # fixed max_rounds matched by the unrolled SQL twin (rounds
        # past convergence are no-ops, so bounded-round semantics are
        # exact on both engines)
        nf = _graph(spark, sf).query_edges("weight > 103000").persist()
        seed = (
            nf.edges.orderBy(F.desc("weight"), F.asc("source"), F.asc("target"))
            .limit(1)
            .collect()[0]["source"]
        )
        return nf.shortest_paths(seed, directed=False, max_rounds=8)

    q["shortest_paths"] = q_shortest_paths

    def q_label_propagation(spark, sf):
        # doc-clique graph (mod-7 cliques, ids < 450): cliques collapse
        # to their min id, isolated docs keep their own label
        docs = read_table(spark, sf, "documents")
        ids = docs.select(F.col("doc_id").alias("id"))
        pairs = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("a.id % 7 = b.id % 7 AND a.id < b.id"))
            .filter("a.id < 450 AND b.id < 450")
            .select(F.col("a.id").alias("source"), F.col("b.id").alias("target"))
        )
        return NetworkFrame(ids, pairs).label_propagation(n_iter=2)

    q["label_propagation"] = q_label_propagation

    def q_modularity_refine(spark, sf):
        # same doc-clique graph, but seeded with an adversarial
        # (id % 3) partition that slices every clique three ways —
        # one exact-integer local-move round pulls nodes toward their
        # clique's dominant slice; the round-level accept test (exact
        # scaled modularity, DECIMAL) is part of the oracled contract
        docs = read_table(spark, sf, "documents")
        ids = docs.select(F.col("doc_id").alias("id"))
        pairs = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("a.id % 7 = b.id % 7 AND a.id < b.id"))
            .filter("a.id < 450 AND b.id < 450")
            .select(F.col("a.id").alias("source"), F.col("b.id").alias("target"))
        )
        bad = ids.select("id", (F.col("id") % 3).alias("community"))
        return NetworkFrame(ids, pairs).modularity_refine(bad, n_rounds=1)

    q["modularity_refine"] = q_modularity_refine

    # full two-level Louvain from singletons on the same doc-clique
    # graph (7 disjoint ~64-cliques + isolated ids >= 450): level 1
    # moves nodes onto min-id neighbors, aggregation collapses each
    # clique to 2 supernodes, level 2 merges them — the whole
    # phase/aggregate/phase pipeline is exact-integer, so the oracle
    # unrolls both levels including the weighted self-loop supergraph
    def q_louvain(spark, sf):
        docs = read_table(spark, sf, "documents")
        ids = docs.select(F.col("doc_id").alias("id"))
        pairs = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("a.id % 7 = b.id % 7 AND a.id < b.id"))
            .filter("a.id < 450 AND b.id < 450")
            .select(F.col("a.id").alias("source"), F.col("b.id").alias("target"))
        )
        return NetworkFrame(ids, pairs).louvain_communities(
            n_levels=2, n_rounds=1
        )

    q["louvain_communities"] = q_louvain

    # weighted twin: same clique graph, integer edge weights 1..5 from
    # the endpoint ids; weight_col quantizes at 1e-6 units so every
    # phase quantity stays an exact integer (oracle scales identically)
    def q_louvain_weighted(spark, sf):
        docs = read_table(spark, sf, "documents")
        ids = docs.select(F.col("doc_id").alias("id"))
        pairs = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("a.id % 7 = b.id % 7 AND a.id < b.id"))
            .filter("a.id < 450 AND b.id < 450")
            .select(
                F.col("a.id").alias("source"),
                F.col("b.id").alias("target"),
                ((F.col("a.id") + F.col("b.id")) % 5 + 1).alias("weight"),
            )
        )
        return NetworkFrame(ids, pairs).louvain_communities(
            n_levels=2, n_rounds=1, weight_col="weight"
        )

    q["louvain_weighted"] = q_louvain_weighted

    # Leiden on a "stranded-leaves" gadget graph built to EXERCISE the
    # refinement step (not just re-run Louvain): per gadget of four
    # ids 4g..4g+3 (doc_id < 400 -> 100 gadgets), hub 4g+1 has a
    # strong edge (w=10) to 4g and weak edges (w=1) to 4g+2 / 4g+3.
    # The simultaneous local-move phase sends the hub to 4g's
    # community while both leaves chase the hub's OLD label, leaving
    # community {4g+2, 4g+3} with no internal edge — the exact
    # Louvain defect from Traag et al. 2019.  Refinement splits it
    # into singletons before aggregation; level 2 then merges the
    # whole gadget through the hub supernode.  doc_id >= 400 stay
    # isolated singletons.  Oracle unrolls both levels including the
    # per-level recursive-CTE connected-component refinement.
    def q_leiden(spark, sf):
        docs = read_table(spark, sf, "documents")
        ids = docs.select(F.col("doc_id").alias("id"))
        hubs = ids.filter("id < 400 AND id % 4 = 1").select(
            F.col("id").alias("h")
        )
        pairs = (
            hubs.select(
                F.col("h").alias("source"),
                (F.col("h") - 1).alias("target"),
                F.lit(10).alias("weight"),
            )
            .unionByName(
                hubs.select(
                    F.col("h").alias("source"),
                    (F.col("h") + 1).alias("target"),
                    F.lit(1).alias("weight"),
                )
            )
            .unionByName(
                hubs.select(
                    F.col("h").alias("source"),
                    (F.col("h") + 2).alias("target"),
                    F.lit(1).alias("weight"),
                )
            )
        )
        return NetworkFrame(ids, pairs).leiden_communities(
            n_levels=2, n_rounds=1, weight_col="weight"
        )

    q["leiden_communities"] = q_leiden

    def q_label_propagation_weighted(spark, sf):
        # weighted voting over the customer-supplier multigraph:
        # parallel order edges accumulate into exact decimal vote sums
        nf = _graph(spark, sf)
        return nf.label_propagation(
            n_iter=2, directed=False, weight_col="weight"
        )

    q["label_propagation_weighted"] = q_label_propagation_weighted

    def q_unigram_logprob(spark, sf):
        docs = read_table(spark, sf, "documents")
        return unigram_logprob_score(docs)

    q["unigram_logprob"] = q_unigram_logprob

    def q_perplexity_buckets(spark, sf):
        from networkframe_spark.functions.pipeline import perplexity_buckets

        docs = read_table(spark, sf, "documents")
        return perplexity_buckets(docs)

    q["perplexity_buckets"] = q_perplexity_buckets

    def q_zipf_fit(spark, sf):
        from networkframe_spark.functions.text import zipf_fit

        docs = read_table(spark, sf, "documents")
        return zipf_fit(docs, top_n=1000)

    q["zipf_fit"] = q_zipf_fit

    def q_bpe_train(spark, sf):
        from networkframe_spark.functions.text import bpe_train

        docs = read_table(spark, sf, "documents")
        return bpe_train(docs, n_merges=8)

    q["bpe_train"] = q_bpe_train

    def q_bpe_encode(spark, sf):
        from networkframe_spark.functions.text import bpe_encode, bpe_train

        docs = read_table(spark, sf, "documents")
        merges = bpe_train(docs, n_merges=8)
        return bpe_encode(docs, merges)

    q["bpe_encode"] = q_bpe_encode

    def q_robust_outliers(spark, sf):
        from networkframe_spark.functions.stats import robust_outliers

        events = read_events(spark, sf)
        return robust_outliers(events, "value", group_col="event_type")

    q["robust_outliers"] = q_robust_outliers

    def q_similar_strings(spark, sf):
        from networkframe_spark.functions.dedup import similar_strings

        # capped input: the fixture's tiny vocabulary makes every
        # trigram a stopword-gram, so the candidate join is
        # Σ df² — quadratic in sf without the cap (same constant-
        # input discipline as the k_truss doc-clique graph)
        docs = read_table(spark, sf, "documents").filter("doc_id < 500")
        return similar_strings(docs, max_dist=2, prefix_len=40)

    q["similar_strings"] = q_similar_strings

    def q_hashed_tfidf(spark, sf):
        from networkframe_spark.functions.pipeline import hashed_tfidf_vectors

        docs = read_table(spark, sf, "documents")
        return hashed_tfidf_vectors(docs, n_features=256)

    q["hashed_tfidf"] = q_hashed_tfidf

    def q_top_event_paths(spark, sf):
        from networkframe_spark.functions.temporal import top_event_paths

        events = read_events(spark, sf)
        return top_event_paths(events, path_len=3, top_n=20)

    q["top_event_paths"] = q_top_event_paths

    def q_weighted_sample_k(spark, sf):
        from networkframe_spark.functions.pipeline import weighted_sample_k

        docs = read_table(spark, sf, "documents")
        return weighted_sample_k(docs, "n_chars", k=50).select(
            "doc_id", "n_chars"
        )

    q["weighted_sample_k"] = q_weighted_sample_k

    def q_group_rare_categories(spark, sf):
        from networkframe_spark.functions.pipeline import group_rare_categories

        docs = read_table(spark, sf, "documents")
        return group_rare_categories(docs, "source", min_count=30).select(
            "doc_id", "source", "source_folded"
        )

    q["group_rare_categories"] = q_group_rare_categories

    def q_target_encoding(spark, sf):
        from networkframe_spark.functions.pipeline import target_encoding

        docs = read_table(spark, sf, "documents")
        return target_encoding(docs, "lang", "n_chars", smoothing=20.0)

    q["target_encoding"] = q_target_encoding

    # salted join must be result-identical to the plain join (the
    # oracle IS the plain join)
    def q_salted_join(spark, sf):
        from networkframe_spark.functions.pipeline import salted_join

        docs = read_table(spark, sf, "documents")
        rstats = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("lang_n"))
        return salted_join(docs, rstats, on="lang", n_salt=8).select(
            "doc_id", "lang", "lang_n"
        )

    q["salted_join"] = q_salted_join

    def q_script_profile(spark, sf):
        from networkframe_spark.functions.text import script_profile

        docs = read_table(spark, sf, "documents")
        return script_profile(docs)

    q["script_profile"] = q_script_profile

    def q_extract_json(spark, sf):
        from networkframe_spark.functions.pipeline import extract_json

        events = read_events(spark, sf)
        return extract_json(events, "props", {"k": "int"}).select(
            "event_id", "k"
        )

    q["extract_json"] = q_extract_json

    # A/B readout over a deterministic variant derived from the JSON
    # payload (k parity) — composes extract_json
    def q_ab_test_report(spark, sf):
        from networkframe_spark.functions.pipeline import (
            ab_test_report,
            extract_json,
        )

        events = read_events(spark, sf)
        ej = extract_json(events, "props", {"k": "int"})
        ev = ej.withColumn(
            "variant",
            F.when(F.col("k") % 2 == 0, F.lit("A")).otherwise(F.lit("B")),
        )
        return ab_test_report(ev, "variant", "value")

    q["ab_test_report"] = q_ab_test_report

    # integer/string columns only: double->string rendering is the
    # one piece the engines don't share bit-for-bit
    def q_column_profile(spark, sf):
        from networkframe_spark.functions.stats import column_profile

        events = read_events(spark, sf)
        return column_profile(events, ["event_id", "user_id", "event_type"])

    q["column_profile"] = q_column_profile

    def q_category_stats(spark, sf):
        from networkframe_spark.functions.stats import category_stats

        docs = read_table(spark, sf, "documents")
        return category_stats(docs, "lang")

    q["category_stats"] = q_category_stats

    def q_join_skew_report(spark, sf):
        from networkframe_spark.functions.stats import join_skew_report

        orders = read_table(spark, sf, "orders").select(
            F.col("o_custkey").alias("custkey")
        )
        cust = read_table(spark, sf, "customer").select(
            F.col("c_custkey").alias("custkey")
        )
        return join_skew_report(orders, cust, on="custkey", top_n=20)

    q["join_skew_report"] = q_join_skew_report

    def q_numeric_histogram(spark, sf):
        from networkframe_spark.functions.stats import numeric_histogram

        events = read_events(spark, sf)
        return numeric_histogram(events, "value", bins=20, lo=0.0, hi=500.0)

    q["numeric_histogram"] = q_numeric_histogram

    # correlations over (value, json k, utc hour) — composes
    # extract_json; moments are exact decimals
    def q_pairwise_corr(spark, sf):
        from networkframe_spark.functions.pipeline import extract_json
        from networkframe_spark.functions.stats import pairwise_corr
        from networkframe_spark.functions.temporal import _epoch_s

        events = read_events(spark, sf)
        ej = extract_json(events, "props", {"k": "int"}).withColumn(
            "hour", F.pmod(F.floor(_epoch_s("ts") / 3600), F.lit(24)).cast("int")
        )
        return pairwise_corr(ej, ["value", "k", "hour"])

    q["pairwise_corr"] = q_pairwise_corr

    def q_bigram_logprob(spark, sf):
        from networkframe_spark.functions.text import bigram_logprob_score

        docs = read_table(spark, sf, "documents")
        return bigram_logprob_score(docs)

    q["bigram_logprob"] = q_bigram_logprob

    def q_embedding_clusters(spark, sf):
        # first_ids seeds = SQL-expressible oracle mode; kmeans init is
        # the production default (unit-tested)
        emb = read_embeddings(spark, sf)
        return embedding_clusters(emb, n_clusters=8, init="first_ids")

    q["embedding_clusters"] = q_embedding_clusters

    # -- round 6 session 2: centrality / walk / cohort / curriculum ----
    def q_hits(spark, sf):
        nf = _graph(spark, sf)
        return nf.hits(n_iter=3, directed=True)

    q["hits_scores"] = q_hits

    def q_harmonic(spark, sf):
        nf = _graph(spark, sf)
        return nf.harmonic_centrality([1, 2, 3], directed=False)

    q["harmonic_centrality"] = q_harmonic

    def q_random_walks(spark, sf):
        # undirected so walks bounce across the bipartite graph
        # instead of dying at supplier sinks after one hop
        nf = _graph(spark, sf)
        return nf.random_walks(walk_length=4, walks_per_node=2, directed=False)

    q["random_walks"] = q_random_walks

    def q_node2vec_walks(spark, sf):
        # p=2 discourages returning, q=0.5 encourages moving outward —
        # a DFS-flavored corpus; quarter-unit p/q keeps every weight
        # an exact integer (see algorithms.node2vec_walks)
        nf = _graph(spark, sf)
        return nf.node2vec_walks(
            walk_length=3, walks_per_node=1, p=2.0, q=0.5, directed=False
        )

    q["node2vec_walks"] = q_node2vec_walks

    def q_topological_levels(spark, sf):
        # doc-chain DAG: doc i -> i+50 (depth 9 at 500 docs) — levels
        # follow the longest path; isolated tail docs sit at their
        # chain position
        docs = read_table(spark, sf, "documents")
        ids = docs.select(F.col("doc_id").alias("id")).filter("id < 500")
        edges = ids.select(
            F.col("id").alias("source"), (F.col("id") + 50).alias("target")
        ).filter("target < 500")
        return NetworkFrame(ids, edges).topological_levels(max_rounds=16)

    q["topological_levels"] = q_topological_levels

    def q_sample_negative_edges(spark, sf):
        nf = _graph(spark, sf)
        return nf.sample_negative_edges(per_node=2, directed=False)

    q["sample_negative_edges"] = q_sample_negative_edges

    def q_maximal_independent_set(spark, sf):
        # undirected bipartite customer-supplier graph; md5 priorities
        # make the parallel Luby rounds equal the sequential greedy
        # MIS, so a fixed-round unrolled SQL twin is exact
        nf = _graph(spark, sf)
        return nf.maximal_independent_set(directed=False, seed=42)

    q["maximal_independent_set"] = q_maximal_independent_set

    def q_retention(spark, sf):
        events = read_events(spark, sf)
        return retention_cohorts(events, period_days=7)

    q["retention_cohorts"] = q_retention

    def q_rolling_stats(spark, sf):
        events = read_events(spark, sf)
        return rolling_stats(events, n_rows=5)

    q["rolling_stats"] = q_rolling_stats

    def q_char_entropy(spark, sf):
        docs = read_table(spark, sf, "documents")
        return char_entropy_score(docs)

    q["char_entropy"] = q_char_entropy

    def q_curriculum(spark, sf):
        docs = read_table(spark, sf, "documents")
        scored = add_quality_score(docs)
        return curriculum_order(
            scored, "quality_score", n_stages=4, seed=42
        ).select("doc_id", "quality_score", "stage", "shuffle_key")

    q["curriculum_order"] = q_curriculum

    def q_betweenness(spark, sf):
        nf = _graph(spark, sf)
        return nf.betweenness_approx([1, 2, 3], directed=False, max_hops=3)

    q["betweenness_approx"] = q_betweenness

    def q_community_quality(spark, sf):
        # doc-clique graph with DELIBERATELY misaligned labels
        # (doc_id % 3 over mod-7 cliques) so cuts/conductance are
        # non-trivial; isolated docs are singleton communities
        docs = read_table(spark, sf, "documents")
        ids = docs.select(F.col("doc_id").alias("id"))
        pairs = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("a.id % 7 = b.id % 7 AND a.id < b.id"))
            .filter("a.id < 450 AND b.id < 450")
            .select(F.col("a.id").alias("source"), F.col("b.id").alias("target"))
        )
        labels = ids.select(
            "id",
            F.when(F.col("id") < 450, F.col("id") % 3)
            .otherwise(F.col("id"))
            .alias("community"),
        )
        return NetworkFrame(ids, pairs).community_quality(labels)

    q["community_quality"] = q_community_quality

    def q_k_truss(spark, sf):
        # the TPC-H bipartite graph has no triangles, so build the
        # doc-clique graph (mod-7 cliques over doc_id < 450) plus a
        # doc-id chain: chain edges have support 0 and peel in round
        # 1; clique edges survive.  max_rounds pinned so the DuckDB
        # twin can unroll the exact same peel.
        docs = read_table(spark, sf, "documents")
        ids = docs.select(F.col("doc_id").alias("id")).filter("id < 450")
        clique = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("a.id % 7 = b.id % 7 AND a.id < b.id"))
            .select(F.col("a.id").alias("source"), F.col("b.id").alias("target"))
        )
        chain = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("b.id = a.id + 1"))
            .select(F.col("a.id").alias("source"), F.col("b.id").alias("target"))
        )
        nodes = docs.select(F.col("doc_id").alias("id"))
        return NetworkFrame(nodes, clique.unionAll(chain)).k_truss(
            k=5, max_rounds=3
        )

    q["k_truss"] = q_k_truss

    def q_core_numbers(spark, sf):
        # same clique+chain graph as k_truss; 4 pinned h-index rounds
        # so the DuckDB twin can unroll the identical iteration
        docs = read_table(spark, sf, "documents")
        ids = docs.select(F.col("doc_id").alias("id")).filter("id < 450")
        clique = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("a.id % 7 = b.id % 7 AND a.id < b.id"))
            .select(F.col("a.id").alias("source"), F.col("b.id").alias("target"))
        )
        chain = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("b.id = a.id + 1"))
            .select(F.col("a.id").alias("source"), F.col("b.id").alias("target"))
        )
        nodes = docs.select(F.col("doc_id").alias("id"))
        return NetworkFrame(nodes, clique.unionAll(chain)).core_numbers(
            max_rounds=4
        )

    q["core_numbers"] = q_core_numbers

    def q_edge_jaccard(spark, sf):
        # clique+chain graph again: clique edges are heavily embedded
        # (high jaccard), chain edges are bridges (jaccard 0)
        docs = read_table(spark, sf, "documents")
        ids = docs.select(F.col("doc_id").alias("id")).filter("id < 450")
        clique = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("a.id % 7 = b.id % 7 AND a.id < b.id"))
            .select(F.col("a.id").alias("source"), F.col("b.id").alias("target"))
        )
        chain = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("b.id = a.id + 1"))
            .select(F.col("a.id").alias("source"), F.col("b.id").alias("target"))
        )
        nodes = docs.select(F.col("doc_id").alias("id"))
        return NetworkFrame(nodes, clique.unionAll(chain)).edge_jaccard()

    q["edge_jaccard"] = q_edge_jaccard

    def q_lexical_diversity(spark, sf):
        from networkframe_spark.functions.text import lexical_diversity

        docs = read_table(spark, sf, "documents")
        return lexical_diversity(docs)

    q["lexical_diversity"] = q_lexical_diversity

    def q_sentence_stats(spark, sf):
        from networkframe_spark.functions.text import sentence_stats

        docs = read_table(spark, sf, "documents")
        return sentence_stats(docs)

    q["sentence_stats"] = q_sentence_stats

    def q_time_profile(spark, sf):
        from networkframe_spark.functions.temporal import time_profile

        events = read_events(spark, sf)
        return time_profile(events)

    q["time_profile"] = q_time_profile

    def q_rfm_segments(spark, sf):
        from networkframe_spark.functions.temporal import rfm_segments

        events = read_events(spark, sf)
        return rfm_segments(events)

    q["rfm_segments"] = q_rfm_segments

    def q_corpus_describe(spark, sf):
        docs = read_table(spark, sf, "documents")
        return corpus_describe(docs)

    q["corpus_describe"] = q_corpus_describe

    def q_rrf_fuse(spark, sf):
        from pyspark.sql import Window

        # TakeOrdered top-k (distributed partial sort via limit), THEN
        # a rank window over only the k surviving rows — never a
        # single-partition window over the full table
        docs = read_table(spark, sf, "documents")
        top_a = docs.orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(100)
        w1 = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
        a = top_a.select("doc_id", F.row_number().over(w1).alias("rank"))
        scored = add_quality_score(docs)
        top_b = scored.orderBy(
            F.desc("quality_score"), F.asc("doc_id")
        ).limit(100)
        w2 = Window.orderBy(F.desc("quality_score"), F.asc("doc_id"))
        b = top_b.select("doc_id", F.row_number().over(w2).alias("rank"))
        return rrf_fuse([a, b], k=60)

    q["rrf_fuse"] = q_rrf_fuse

    def q_resample(spark, sf):
        from networkframe_spark.functions.temporal import resample_events

        events = read_events(spark, sf)
        return resample_events(events, minutes=60)

    q["resample_events"] = q_resample

    def q_fill_gaps(spark, sf):
        from networkframe_spark.functions.temporal import fill_gaps

        events = read_events(spark, sf)
        return fill_gaps(events, minutes=60)

    q["fill_gaps"] = q_fill_gaps

    def q_ewma(spark, sf):
        from networkframe_spark.functions.temporal import ewma

        events = read_events(spark, sf)
        return ewma(events, n_rows=8)

    q["ewma"] = q_ewma

    def q_topk_group(spark, sf):
        from networkframe_spark.functions.stats import top_k_per_group

        docs = read_table(spark, sf, "documents")
        return top_k_per_group(
            docs, "lang", "n_chars", 5, tie_col="doc_id"
        ).select("lang", "doc_id", "n_chars", "rank")

    q["top_k_per_group"] = q_topk_group

    def q_neighbor_sample(spark, sf):
        nf = _graph(spark, sf)
        return nf.neighbor_sample(
            [1, 2, 3], fanouts=[3, 2], directed=False, seed=42
        )

    q["neighbor_sample"] = q_neighbor_sample

    def q_degree_distribution(spark, sf):
        nf = _graph(spark, sf)
        return nf.degree_distribution("und")

    q["degree_distribution"] = q_degree_distribution

    def q_build_vocab(spark, sf):
        from networkframe_spark.functions.text import build_vocab

        docs = read_table(spark, sf, "documents")
        return build_vocab(docs, size=50)

    q["build_vocab"] = q_build_vocab

    def q_pmi_bigrams(spark, sf):
        from networkframe_spark.functions.text import pmi_bigrams

        docs = read_table(spark, sf, "documents")
        return pmi_bigrams(docs, min_count=5)

    q["pmi_bigrams"] = q_pmi_bigrams

    def q_kfold(spark, sf):
        from networkframe_spark.functions.pipeline import kfold_split

        docs = read_table(spark, sf, "documents")
        return kfold_split(docs, k=5, seed=7).select("doc_id", "fold")

    q["kfold_split"] = q_kfold

    def q_bipartite_project(spark, sf):
        # suppliers linked via shared customers; hub-cap keeps the
        # wedge count sum(deg^2)-bounded on the capped side
        nf = _graph(spark, sf)
        return nf.bipartite_project(side="target", max_hub_degree=60)

    q["bipartite_project"] = q_bipartite_project

    def q_funnel_steps(spark, sf):
        from networkframe_spark.functions.temporal import funnel_steps

        events = read_events(spark, sf)
        return funnel_steps(
            events, ["view", "click", "purchase"], within_minutes=120
        )

    q["funnel_steps"] = q_funnel_steps

    def q_trend_slope(spark, sf):
        from networkframe_spark.functions.temporal import trend_slope

        events = read_events(spark, sf)
        return trend_slope(events)

    q["trend_slope"] = q_trend_slope

    def q_attribute_mixing(spark, sf):
        nf = _graph(spark, sf)
        return nf.attribute_mixing("nationkey", directed=True)

    q["attribute_mixing"] = q_attribute_mixing

    def q_attribute_assortativity(spark, sf):
        nf = _graph(spark, sf)
        return nf.attribute_assortativity("nationkey", directed=True)

    q["attribute_assortativity"] = q_attribute_assortativity

    def q_dedup_corpus(spark, sf):
        from networkframe_spark.functions.dedup import dedup_corpus

        # ngram_jaccard mode: its pair finder + cluster fold both have
        # exact SQL twins (o["dedup_clusters"]) — the composed keep
        # filter is oracle-checkable end-to-end
        docs = read_table(spark, sf, "documents")
        return dedup_corpus(docs, method="ngram_jaccard", threshold=0.5).select(
            "doc_id", "cluster_id"
        )

    q["dedup_corpus"] = q_dedup_corpus

    # the one-call dedup riding the PERSISTED banding end-to-end:
    # pair finder = the stored-index self-join (signature-agreement
    # estimate decision), cluster fold + keep identical to
    # dedup_corpus — the oracle composes minhash_index_dup's pair SQL
    # with dedup_clusters' recursive reach
    def q_dedup_corpus_index(spark, sf):
        import os as _os
        import tempfile as _tempfile

        from networkframe_spark.functions.dedup import (
            build_minhash_index,
            dedup_corpus,
        )

        docs = read_table(spark, sf, "documents")
        path = _os.path.join(
            _tempfile.gettempdir(),
            f"nfspark_dcidx_{_os.path.basename(sf.rstrip('/'))}"
            f"_{_os.getpid()}",
        )
        build_minhash_index(
            docs, path, n_perm=4, bands=2, n_kmod=16, mode="overwrite"
        )
        return dedup_corpus(
            docs, method="minhash_index", threshold=0.25, index_path=path
        ).select("doc_id", "cluster_id")

    q["dedup_corpus_index"] = q_dedup_corpus_index

    def q_chi2_independence(spark, sf):
        from networkframe_spark.functions.stats import chi2_independence

        docs = read_table(spark, sf, "documents")
        return chi2_independence(docs, "lang", "source")

    q["chi2_independence"] = q_chi2_independence

    def q_ks_test(spark, sf):
        from networkframe_spark.functions.stats import ks_test_2samp

        events = read_events(spark, sf)
        return ks_test_2samp(events, "value", "event_type", "view", "purchase")

    q["ks_test_2samp"] = q_ks_test

    def q_psi_drift(spark, sf):
        from networkframe_spark.functions.stats import psi_drift

        events = read_events(spark, sf)
        return psi_drift(
            events.filter("event_type = 'view'"),
            events.filter("event_type = 'purchase'"),
            "value",
            bins=10,
        )

    q["psi_drift"] = q_psi_drift

    def q_rrf_fusion(spark, sf):
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        docs = read_table(spark, sf, "documents")
        w1 = W.partitionBy("lang").orderBy(
            F.desc("n_chars"), F.asc("doc_id")
        )
        w2 = W.partitionBy("lang").orderBy(F.asc("doc_id"))
        r1 = docs.select(
            F.col("lang").alias("query_id"),
            "doc_id",
            F.row_number().over(w1).alias("rank"),
        ).filter("rank <= 20")
        r2 = docs.select(
            F.col("lang").alias("query_id"),
            "doc_id",
            F.row_number().over(w2).alias("rank"),
        ).filter("rank <= 20")
        return rrf_fuse(
            [r1, r2], id_col="doc_id", k=60, query_col="query_id"
        )

    q["rrf_fusion"] = q_rrf_fusion

    def q_retrieval_metrics(spark, sf):
        from pyspark.sql import functions as F

        from networkframe_spark.functions.retrieval import retrieval_metrics
        from networkframe_spark.functions.similarity import brute_force_top_k

        emb = read_embeddings(spark, sf)
        qs = emb.filter("vec_id < 10")
        pred = brute_force_top_k(emb, qs, k=10).withColumnRenamed(
            "vec_id", "doc_id"
        )
        truth = (
            qs.alias("q")
            .join(
                emb.alias("c"),
                (F.col("q.label") == F.col("c.label"))
                & (F.col("q.vec_id") != F.col("c.vec_id")),
            )
            .select(
                F.col("q.vec_id").alias("query_id"),
                F.col("c.vec_id").alias("doc_id"),
            )
        )
        return retrieval_metrics(pred, truth, k=10)

    q["retrieval_metrics"] = q_retrieval_metrics

    def q_mmr_rerank(spark, sf):
        from pyspark.sql import functions as F

        from networkframe_spark.functions.similarity import (
            brute_force_top_k,
            mmr_rerank,
        )

        emb = read_embeddings(spark, sf)
        qs = emb.filter("vec_id < 10")
        cand = brute_force_top_k(emb, qs, k=8).join(
            emb.select("vec_id", "embedding"), on="vec_id"
        )
        return mmr_rerank(cand, k=3, lam=0.7)

    q["mmr_rerank"] = q_mmr_rerank

    def q_mann_whitney(spark, sf):
        from networkframe_spark.functions.stats import mann_whitney_u

        events = read_events(spark, sf)
        return mann_whitney_u(
            events, "value", "event_type", "view", "purchase"
        )

    q["mann_whitney_u"] = q_mann_whitney

    def q_bootstrap_ci(spark, sf):
        from networkframe_spark.functions.stats import bootstrap_ci_mean

        events = read_events(spark, sf)
        return bootstrap_ci_mean(
            events, "value", "event_id", n_boot=50
        )

    q["bootstrap_ci_mean"] = q_bootstrap_ci

    # hard-sigmoid quality classifier: 4 exact-integer GD iterations
    # over 6 codegen'd text features; the weak label (n_chars > 300)
    # is learnable from the length features, so the trained accuracy
    # (0.9+) vs the 0.51 base rate proves training actually moved.
    # Every quantity is a scaled integer -> the oracle replays the
    # whole training loop bit-for-bit (HUGEINT // == Spark div).
    def q_train_quality_classifier(spark, sf):
        from networkframe_spark.functions.classifier import (
            train_quality_classifier,
        )

        docs = read_table(spark, sf, "documents").withColumn(
            "y", (F.col("n_chars") > 300).cast("int")
        )
        return train_quality_classifier(docs, "y", n_iter=4, lr_num=4, lr_den=1)

    q["train_quality_classifier"] = q_train_quality_classifier

    # ANN evaluation with REAL pruning under exact evidence: the
    # cosine-cell search probes 2 of 8 cells (genuinely skipping 3/4
    # of the corpus per query — unlike the exhaustive-probe oracle
    # modes of cosine_topk_ivf/lsh), and the report measures its
    # recall@5 against brute-force truth per query.
    def q_ann_recall(spark, sf):
        from networkframe_spark.functions.similarity import (
            ann_recall_report,
            cell_pruned_top_k,
        )

        emb = read_embeddings(spark, sf)
        qs = emb.filter("vec_id < 10")
        approx = cell_pruned_top_k(emb, qs, k=5, n_cells=8, n_probe=2)
        return ann_recall_report(emb, qs, approx, k=5)

    q["ann_recall_cell_pruned"] = q_ann_recall

    # LSH under REAL pruning with measured evidence: 2 tables x 4
    # Rademacher hyperplanes over the 500-vector sf0.01 corpus means
    # ~16 buckets/table (~60 candidates/query, ~88% of the corpus
    # genuinely skipped), and the report records the recall@5 price
    # against brute-force truth.  The planes are deterministic
    # (md5-seeded +-1), so the oracle inlines them as SQL literals and
    # replays the banding exactly — the same trick the cell-pruned
    # oracle uses for its first-8-ids seeds.
    def q_lsh_recall(spark, sf):
        from networkframe_spark.functions.similarity import (
            ann_recall_report,
            lsh_top_k,
        )

        emb = read_embeddings(spark, sf)
        qs = emb.filter("vec_id < 10")
        approx = lsh_top_k(emb, qs, k=5, n_planes=4, n_tables=2)
        return ann_recall_report(emb, qs, approx, k=5)

    q["lsh_recall_report"] = q_lsh_recall

    # multi-probe twin of lsh_recall_report: same 2x4 banding, but
    # each query ALSO probes the n_planes buckets one sign-flip away
    # (Lv et al. 2007).  Corpus banding is untouched — query-side
    # fan-out only — and measured recall@5 jumps 0.2 -> ~0.7 at the
    # same index size.  The oracle replays the probe expansion with
    # xor() over the inlined plane literals.
    def q_lsh_multiprobe_recall(spark, sf):
        from networkframe_spark.functions.similarity import (
            ann_recall_report,
            lsh_top_k,
        )

        emb = read_embeddings(spark, sf)
        qs = emb.filter("vec_id < 10")
        approx = lsh_top_k(
            emb, qs, k=5, n_planes=4, n_tables=2, n_probe_bits=1
        )
        return ann_recall_report(emb, qs, approx, k=5)

    q["lsh_multiprobe_recall"] = q_lsh_multiprobe_recall

    # leakage-safe temporal split: 4/5 time-range cutoff + 1h embargo
    def q_time_split(spark, sf):
        from networkframe_spark.functions.pipeline import time_split

        events = read_events(spark, sf)
        return time_split(
            events, "ts", train_frac_num=4, train_frac_den=5,
            embargo_seconds=3600,
        ).select("event_id", "split")

    q["time_split"] = q_time_split

    # classifier evaluation pair: score docs with a FIXED literal
    # weight vector (so the oracle replays the hard-sigmoid scoring
    # without the training loop), then confusion counts / reliability
    # bins against the same weak label
    _CLF_EVAL_W = [0.2, 4.0, 0.0, -2.0, 0.0, 0.0]

    def q_classification_report(spark, sf):
        from networkframe_spark.functions.classifier import (
            classification_report,
            score_quality_classifier,
        )

        docs = read_table(spark, sf, "documents").withColumn(
            "y", (F.col("n_chars") > 300).cast("int")
        )
        scored = score_quality_classifier(docs, _CLF_EVAL_W)
        scored = scored.withColumn(
            "pred", (F.col("quality_p") >= 0.5).cast("int")
        )
        return classification_report(scored, "y", "pred")

    q["classification_report"] = q_classification_report

    def q_calibration_bins(spark, sf):
        from networkframe_spark.functions.classifier import (
            calibration_bins,
            score_quality_classifier,
        )

        docs = read_table(spark, sf, "documents").withColumn(
            "y", (F.col("n_chars") > 300).cast("int")
        )
        scored = score_quality_classifier(docs, _CLF_EVAL_W)
        return calibration_bins(scored, "quality_p", "y", n_bins=10)

    q["calibration_bins"] = q_calibration_bins

    # rolling-origin CV: 3 expanding-window folds over the event range
    def q_rolling_origin(spark, sf):
        from networkframe_spark.functions.pipeline import (
            rolling_origin_splits,
        )

        events = read_events(spark, sf)
        return rolling_origin_splits(events, "ts", n_folds=3).select(
            "fold", "event_id", "role"
        )

    q["rolling_origin_splits"] = q_rolling_origin

    # -- driver-window rotation -----------------------------------------
    # The driver's correctness gate hashes only the FIRST 50 entries of
    # this dict.  Registration order above is historical (oldest first),
    # which froze the window on the round-1/2 core and left the newer,
    # riskier ops (centrality, temporal, ANN) with replay-only evidence.
    # Reorder here: a stable 25-query core (cross-round comparability)
    # followed by 25 rotated-in newer ops, then everything else in
    # registration order.  Every entry keeps its oracle either way.
    _window = [
        # round-16 rotation — the codified STALENESS POLICY (r14):
        # every window = 16-query stable core (cross-round
        # comparability: the same frame/graph anchors) + this round's
        # NEW registrations (never hashed = age 0, highest mismatch
        # risk) + the remaining slots filled with the registered ops
        # whose LAST driver hash is OLDEST (ties broken
        # alphabetically; computed from CORRECTNESS_r01..r15 — this
        # window refreshes the r08/r09/r10 cohorts).  Slot math:
        # 16 core + 5 r16 registrations + 29 oldest = 50.
        "query_nodes", "query_nodes_closure", "query_edges", "loc_block",
        "remove_nodes", "remove_edges", "reindex_nodes",
        "adjacency_dense", "condense_sum",
        "apply_node_features", "groupby_size",
        "khop_aggregation", "weak_components", "aggregated_edges",
        "largest_component", "strong_components",
        # r16 registrations: quantized hybrid leg, positional phrase
        # search, CJK-aware tokenization, auto-plane policy
        "hybrid_search_ivfsq", "phrase_search", "cjk_tokens", "cjk_bm25",
        "embedding_dedup_auto",
        # oldest-hashed cohort: last driver hash r08 (23), r09 (1),
        # r10 (6) — alphabetical within a round
        "anomaly_zscore", "asof_join", "asof_join_forward",
        "asof_join_nearest", "bootstrap_ci_mean", "chi2_independence",
        "ks_test_2samp", "mann_whitney_u", "maximal_independent_set",
        "mmr_rerank", "modularity_refine", "pagerank_personalized",
        "pagerank_personalized_batch", "psi_drift", "range_join",
        "retrieval_metrics", "rrf_fusion", "sample_negative_edges",
        "stream_neardup_twin", "time_split", "topological_levels",
        "train_quality_classifier", "winsorize",
        "add_nodes", "bm25_search", "bpe_train", "calibration_bins",
        "cap_per_group", "classification_report",
    ]
    ordered = {k: q[k] for k in _window if k in q}
    for k, v in q.items():
        if k not in ordered:
            ordered[k] = v
    return ordered


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect, same column names, same determinism rules)
# ---------------------------------------------------------------------------
def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["query_nodes"] = f"""
WITH {GRAPH_CTE}
SELECT id, kind, nationkey, acctbal FROM nodes WHERE acctbal > 5000
"""

    o["query_nodes_closure"] = f"""
WITH {GRAPH_CTE},
kept AS (SELECT id FROM nodes WHERE acctbal > 1000)
SELECT e.source, e.target, e.weight
FROM edges e
WHERE e.source IN (SELECT id FROM kept) AND e.target IN (SELECT id FROM kept)
"""

    o["query_edges"] = f"""
WITH {GRAPH_CTE}
SELECT source, target, weight FROM edges WHERE weight > 50000
"""

    o["loc_block"] = f"""
WITH {GRAPH_CTE},
r AS (SELECT id FROM nodes WHERE kind = 'customer' AND nationkey < 5),
c AS (SELECT id FROM nodes WHERE kind = 'supplier' AND nationkey < 5)
SELECT e.source, e.target, e.weight
FROM edges e
WHERE e.source IN (SELECT id FROM r) AND e.target IN (SELECT id FROM c)
"""

    o["remove_nodes"] = f"""
WITH {GRAPH_CTE},
kept AS (SELECT id FROM nodes WHERE nationkey NOT IN (0, 1, 2))
SELECT e.source, e.target, e.weight
FROM edges e
WHERE e.source IN (SELECT id FROM kept) AND e.target IN (SELECT id FROM kept)
"""

    o["remove_edges"] = f"""
WITH {GRAPH_CTE},
bad AS (SELECT DISTINCT source, target FROM edges WHERE weight > 80000)
SELECT e.source, e.target, e.weight
FROM edges e
WHERE NOT EXISTS (
  SELECT 1 FROM bad b WHERE b.source = e.source AND b.target = e.target
)
"""

    o["add_nodes"] = f"""
WITH {GRAPH_CTE}
SELECT id, kind FROM nodes
UNION ALL
SELECT n_nationkey + 1000000 AS id, 'nation' AS kind FROM nation
"""

    o["remove_unused_nodes"] = f"""
WITH {GRAPH_CTE}
SELECT id, kind FROM nodes
WHERE id IN (SELECT source FROM edges UNION SELECT target FROM edges)
"""

    o["reindex_nodes"] = f"""
WITH {GRAPH_CTE},
idx AS (SELECT x AS id FROM range(1, 2001) t(x))
SELECT idx.id, n.kind, n.acctbal
FROM idx LEFT JOIN nodes n ON idx.id = n.id
"""

    o["apply_node_features"] = f"""
WITH {GRAPH_CTE}
SELECT e.source, e.target, e.weight,
       ns.nationkey AS source_nationkey, nt.nationkey AS target_nationkey
FROM edges e
LEFT JOIN nodes ns ON e.source = ns.id
LEFT JOIN nodes nt ON e.target = nt.id
"""

    o["node_agreement"] = f"""
WITH {GRAPH_CTE},
a AS (SELECT id FROM nodes WHERE kind = 'customer'),
b AS (SELECT id FROM nodes WHERE acctbal > 0)
SELECT round(
  (SELECT count(*) FROM a WHERE id IN (SELECT id FROM b))::DOUBLE
  / (SELECT count(*) FROM a), 6) AS agreement
"""

    o["groupby_size"] = f"""
WITH {GRAPH_CTE}
SELECT ns.nationkey AS source_nationkey, nt.nationkey AS target_nationkey,
       count(*) AS size
FROM edges e
JOIN nodes ns ON e.source = ns.id
JOIN nodes nt ON e.target = nt.id
GROUP BY 1, 2
"""

    o["condense_sum"] = f"""
WITH {GRAPH_CTE}
SELECT ns.nationkey AS source, nt.nationkey AS target,
       CAST(SUM(CAST(e.weight AS DECIMAL(18,2))) AS DOUBLE) AS block_weight
FROM edges e
JOIN nodes ns ON e.source = ns.id
JOIN nodes nt ON e.target = nt.id
GROUP BY 1, 2
"""

    o["khop_aggregation"] = f"""
WITH {GRAPH_CTE},
sym AS (
  SELECT DISTINCT source, target FROM (
    SELECT source, target FROM edges
    UNION ALL
    SELECT target AS source, source AS target FROM edges
  )
),
pairs AS (SELECT source AS node, target AS neighbor FROM sym WHERE source <> target)
SELECT p.node AS id,
       count(*) AS n_neighbors,
       CAST(SUM(CAST(n.acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
         AS acctbal_neighbor_mean
FROM pairs p JOIN nodes n ON p.neighbor = n.id
GROUP BY p.node
"""

    o["khop_neighborhood"] = f"""
WITH {GRAPH_CTE},
sym AS (
  SELECT DISTINCT source, target FROM (
    SELECT source, target FROM edges
    UNION ALL
    SELECT target AS source, source AS target FROM edges
  )
),
h1 AS (SELECT DISTINCT target AS id FROM sym WHERE source = 1),
h2 AS (SELECT DISTINCT s2.target AS id FROM sym s2 WHERE s2.source IN (SELECT id FROM h1))
SELECT DISTINCT id FROM (
  SELECT 1 AS id UNION ALL SELECT id FROM h1 UNION ALL SELECT id FROM h2
)
"""

    o["reachable_from"] = f"""
WITH RECURSIVE {GRAPH_CTE},
heavy AS (SELECT source, target FROM edges WHERE weight > 103000),
seed AS (
  SELECT source AS id FROM edges WHERE weight > 103000
  ORDER BY weight DESC, source ASC, target ASC LIMIT 1
),
reach AS (
  SELECT id FROM seed
  UNION
  SELECT h.target AS id FROM reach JOIN heavy h ON h.source = reach.id
),
used AS (SELECT source AS id FROM heavy UNION SELECT target FROM heavy),
kept_edges AS (
  SELECT h.source, h.target FROM heavy h
  WHERE h.source IN (SELECT id FROM reach) AND h.target IN (SELECT id FROM reach)
)
SELECT DISTINCT id FROM reach
WHERE id IN (SELECT source FROM kept_edges UNION SELECT target FROM kept_edges)
"""

    o["weak_components"] = f"""
WITH RECURSIVE {GRAPH_CTE},
heavy AS (SELECT DISTINCT source, target FROM edges WHERE weight > 103000),
used AS (SELECT source AS id FROM heavy UNION SELECT target FROM heavy),
sym AS (
  SELECT source, target FROM heavy
  UNION
  SELECT target AS source, source AS target FROM heavy
),
reach AS (
  SELECT id, id AS r FROM used
  UNION
  SELECT s.target AS id, reach.r FROM reach JOIN sym s ON s.source = reach.id
),
comp AS (SELECT id, min(r) AS comp_min FROM reach GROUP BY id),
numbered AS (
  SELECT comp_min,
         row_number() OVER (ORDER BY count(*) DESC, comp_min ASC) - 1 AS component
  FROM comp GROUP BY comp_min
)
SELECT c.id, n.component
FROM comp c JOIN numbered n ON c.comp_min = n.comp_min
"""

    o["aggregated_edges"] = f"""
WITH {GRAPH_CTE}
SELECT source, target,
       CAST(SUM(CAST(weight AS DECIMAL(18,2))) AS DOUBLE) AS weight
FROM edges GROUP BY source, target
"""

    o["apply_edges_max"] = f"""
WITH {GRAPH_CTE}
SELECT ns.nationkey AS source_nationkey, nt.nationkey AS target_nationkey,
       max(e.weight) AS weight
FROM edges e
JOIN nodes ns ON e.source = ns.id
JOIN nodes nt ON e.target = nt.id
GROUP BY 1, 2
"""

    o["largest_component"] = f"""
WITH RECURSIVE {GRAPH_CTE},
heavy AS (SELECT DISTINCT source, target FROM edges WHERE weight > 103000),
used AS (SELECT source AS id FROM heavy UNION SELECT target FROM heavy),
sym AS (
  SELECT source, target FROM heavy
  UNION
  SELECT target AS source, source AS target FROM heavy
),
reach AS (
  SELECT id, id AS r FROM used
  UNION
  SELECT s.target AS id, reach.r FROM reach JOIN sym s ON s.source = reach.id
),
comp AS (SELECT id, min(r) AS comp_min FROM reach GROUP BY id),
top AS (
  SELECT comp_min FROM comp GROUP BY comp_min
  ORDER BY count(*) DESC, comp_min ASC LIMIT 1
)
SELECT c.id FROM comp c WHERE c.comp_min IN (SELECT comp_min FROM top)
"""

    o["strong_components"] = """
WITH RECURSIVE
nr_nodes AS (
  SELECT n_nationkey::BIGINT AS id FROM nation
  UNION ALL
  SELECT -r_regionkey::BIGINT - 1 AS id FROM region
),
nr_edges AS (
  SELECT n_nationkey::BIGINT AS source, -n_regionkey::BIGINT - 1 AS target FROM nation
  UNION ALL
  SELECT -n_regionkey::BIGINT - 1 AS source, n_nationkey::BIGINT AS target FROM nation
),
reach AS (
  SELECT source AS a, target AS b FROM nr_edges
  UNION
  SELECT r.a, e.target AS b FROM reach r JOIN nr_edges e ON e.source = r.b
),
mutual AS (
  SELECT r1.a AS id, r1.b AS other
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
  UNION ALL
  SELECT id, id AS other FROM nr_nodes
),
comp AS (SELECT id, min(other) AS comp_min FROM mutual GROUP BY id),
numbered AS (
  SELECT comp_min,
         row_number() OVER (ORDER BY count(*) DESC, comp_min ASC) - 1 AS component
  FROM comp GROUP BY comp_min
)
SELECT c.id, n.component FROM comp c JOIN numbered n ON c.comp_min = n.comp_min
"""

    o["khop_pairs"] = f"""
WITH {GRAPH_CTE},
heavy AS (SELECT DISTINCT source, target FROM edges WHERE weight > 103000),
sym AS (
  SELECT source, target FROM heavy
  UNION
  SELECT target AS source, source AS target FROM heavy
),
p2 AS (
  SELECT a.source AS node, b.target AS neighbor
  FROM sym a JOIN sym b ON a.target = b.source
  UNION
  SELECT source AS node, target AS neighbor FROM sym
)
SELECT node, neighbor FROM p2 WHERE node <> neighbor
"""

    o["frame_validation"] = f"""
WITH {GRAPH_CTE},
dups AS (SELECT id FROM nodes GROUP BY id HAVING count(*) > 1),
ends AS (SELECT source AS id FROM edges UNION SELECT target FROM edges),
dangling AS (SELECT id FROM ends WHERE id NOT IN (SELECT id FROM nodes))
SELECT (SELECT count(*) FROM dups) AS dup_ids,
       (SELECT count(*) FROM dangling) AS dangling_endpoints
"""

    o["adjacency_dense"] = """
WITH nr_nodes AS (
  SELECT n_nationkey::BIGINT AS id FROM nation
  UNION ALL
  SELECT -r_regionkey::BIGINT - 1 AS id FROM region
),
nr_edges AS (
  SELECT n_nationkey::BIGINT AS source, -n_regionkey::BIGINT - 1 AS target,
         1.0 AS weight
  FROM nation
),
agg AS (
  SELECT source, target, SUM(weight) AS w FROM nr_edges GROUP BY source, target
)
SELECT a.id AS source, b.id AS target,
       COALESCE(g.w, 0.0)::DOUBLE AS weight
FROM nr_nodes a CROSS JOIN nr_nodes b
LEFT JOIN agg g ON g.source = a.id AND g.target = b.id
"""

    o["n_components"] = f"""
WITH RECURSIVE {GRAPH_CTE},
heavy AS (SELECT DISTINCT source, target FROM edges WHERE weight > 103000),
used AS (SELECT source AS id FROM heavy UNION SELECT target FROM heavy),
sym AS (
  SELECT source, target FROM heavy
  UNION
  SELECT target AS source, source AS target FROM heavy
),
reach AS (
  SELECT id, id AS r FROM used
  UNION
  SELECT s.target AS id, reach.r FROM reach JOIN sym s ON s.source = reach.id
),
comp AS (SELECT id, min(r) AS comp_min FROM reach GROUP BY id)
SELECT count(DISTINCT comp_min) AS n_components,
       count(DISTINCT comp_min) = 1 AS fully_connected
FROM comp
"""

    o["group_metadata"] = f"""
WITH {GRAPH_CTE}
SELECT nationkey, count(*) AS n_nodes,
       string_agg(id::VARCHAR, ',' ORDER BY id) AS ids
FROM nodes GROUP BY nationkey
"""

    o["frame_equality"] = """
SELECT true AS eq_self, false AS eq_filtered
"""

    o["serde_roundtrip"] = """
SELECT n_nationkey::BIGINT AS id, n_name AS name, 'nation' AS kind FROM nation
UNION ALL
SELECT -r_regionkey::BIGINT - 1 AS id, r_name AS name, 'region' AS kind FROM region
"""

    # parquet round-trip is value-preserving, so the oracle is simply
    # the closure query at the round-trip's filter threshold
    o["graph_save_load"] = f"""
WITH {GRAPH_CTE},
kept AS (SELECT id FROM nodes WHERE acctbal > 3000)
SELECT e.source, e.target, e.weight
FROM edges e
WHERE e.source IN (SELECT id FROM kept) AND e.target IN (SELECT id FROM kept)
"""

    # compaction must be a pure physical rewrite: content identical
    o["compact_roundtrip"] = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""

    # Closed-form power-iteration limit for R disjoint equal stars with
    # unit weights (the nation→region graph): from a uniform start the
    # per-star amplitudes stay equal (equal leading eigenvalues), so
    # the limit is the symmetric mix of per-star Perron vectors —
    # leaf |v| = 1/sqrt(2N), center |v| = sqrt(d) * leaf with
    # d = N/R leaves per star.  Derived from the data, not hardcoded:
    # N and R are counted from the tables.
    o["sort_spectral"] = """
WITH n AS (SELECT count(*)::DOUBLE AS nn FROM nation),
     r AS (SELECT count(*)::DOUBLE AS nr FROM region)
SELECT n_nationkey::BIGINT AS id,
       round(1.0 / sqrt(2.0 * (SELECT nn FROM n)), 6) AS abs_score
FROM nation
UNION ALL
SELECT -r_regionkey::BIGINT - 1 AS id,
       round(sqrt((SELECT nn FROM n) / (SELECT nr FROM r))
             / sqrt(2.0 * (SELECT nn FROM n)), 6) AS abs_score
FROM region
"""

    o["token_count"] = f"""
WITH {TOKS_CTE}
SELECT d.doc_id,
       CASE WHEN length(trim(d.text)) = 0 THEN 0 ELSE len(t.t) END AS n_tokens
FROM documents d JOIN toks t ON d.doc_id = t.doc_id
"""

    o["bpe_token_count"] = """
SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
         AS n_bpe_tokens
FROM documents
"""

    # quality score mirrors functions/text.py::add_quality_score exactly
    o["quality_score"] = f"""
WITH {TOKS_CTE},
feats AS (
  SELECT d.doc_id,
         length(d.text) AS n_chars,
         greatest(len(t.t), 1) AS n_tokens,
         length(regexp_replace(lower(d.text), '[a-z0-9\\s]', '', 'g')) AS punct,
         len(list_filter(t.t, x -> list_contains(
           ['the','and','of','to','a','in','is','it','that','for','was','with'], x)))
           AS n_stop,
         length(regexp_replace(d.text, '\\s+', '', 'g')) AS nonspace
  FROM documents d JOIN toks t ON d.doc_id = t.doc_id
)
SELECT doc_id, round(
    0.4 * least(n_chars / 1000.0, 1.0)
  + 0.3 * least((n_stop::DOUBLE / n_tokens) / 0.4, 1.0)
  + 0.2 * (1.0 - punct::DOUBLE / greatest(n_chars, 1))
  + 0.1 * (CASE WHEN nonspace::DOUBLE / n_tokens BETWEEN 2 AND 12
           THEN 1.0 ELSE 0.0 END), 6) AS quality_score
FROM feats
"""

    # gopher rules mirror functions/text.py::gopher_rules (min_words=20);
    # bullet/ellipsis line rules are computed for gopher_pass but not
    # projected (single-line fixture docs rarely discriminate on them)
    o["gopher_rules"] = f"""
WITH {TOKS_CTE},
feats AS (
  SELECT d.doc_id,
         len(t.t) AS n_words,
         greatest(len(t.t), 1) AS n_words1,
         list_sum(list_transform(t.t, x -> length(x))) AS sum_wl,
         (length(d.text) - length(replace(d.text, '#', ''))) AS n_hash,
         ((length(d.text) - length(replace(d.text, '...', ''))) / 3)::INT AS n_ellipsis,
         string_split(d.text, chr(10)) AS lines,
         len(list_filter(t.t, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
         len(list_intersect(list_distinct(t.t),
             ['the','be','to','of','and','that','have','with'])) AS stop_hits
  FROM documents d JOIN toks t ON d.doc_id = t.doc_id
),
rules AS (
  SELECT doc_id,
         n_words BETWEEN 20 AND 100000 AS rule_word_count,
         (sum_wl::DOUBLE / n_words1) BETWEEN 3.0 AND 10.0 AS rule_mean_word_len,
         ((n_hash + n_ellipsis)::DOUBLE / n_words1) <= 0.1 AS rule_symbol_ratio,
         (len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))::DOUBLE
            / greatest(len(lines), 1)) <= 0.9 AS rule_bullet_ratio,
         (len(list_filter(lines, l -> regexp_matches(trim(l), '\\.\\.\\.$')))::DOUBLE
            / greatest(len(lines), 1)) <= 0.3 AS rule_ellipsis_ratio,
         (n_alpha::DOUBLE / n_words1) >= 0.8 AS rule_alpha_ratio,
         stop_hits >= 2 AS rule_stopwords
  FROM feats
)
SELECT doc_id, rule_word_count, rule_mean_word_len, rule_symbol_ratio,
       rule_alpha_ratio, rule_stopwords,
       (rule_word_count AND rule_mean_word_len AND rule_symbol_ratio AND
        rule_bullet_ratio AND rule_ellipsis_ratio AND rule_alpha_ratio AND
        rule_stopwords) AS gopher_pass
FROM rules
"""

    # clean_text mirrors functions/text.py::clean_text (same regex chain;
    # DuckDB needs the explicit 'g' flag Spark applies by default)
    o["clean_text"] = """
WITH cleaned AS (
  SELECT doc_id, text AS orig,
         trim(
          regexp_replace(
           regexp_replace(
            regexp_replace(
             regexp_replace(
              regexp_replace(
               regexp_replace(
                regexp_replace(text,
                 '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
                '[‘’]', '''', 'g'),
               '[“”]', '"', 'g'),
              '[–—]', '-', 'g'),
             '[ \\t]+', ' ', 'g'),
            ' ?\\n ?', chr(10), 'g'),
           '\\n{3,}', chr(10) || chr(10), 'g')
         ) AS ctext
  FROM documents
)
SELECT doc_id, ctext AS text,
       (length(orig) - length(ctext))::INT AS n_chars_removed
FROM cleaned
"""

    # language id mirrors functions/text.py::add_language_id (fold order =
    # dict order en,de,fr,es,it; strictly-greater replacement = sort by
    # (-score, index) and take first)
    lang_structs = []
    from networkframe_spark.functions.text import STOPWORDS

    for i, (lang, words) in enumerate(STOPWORDS.items()):
        wl = ", ".join(f"'{w}'" for w in words)
        lang_structs.append(
            "{'s': -len(list_filter(t.t, x -> list_contains([" + wl + "], x))), "
            f"'i': {i}, 'l': '{lang}'}}"
        )
    structs = ", ".join(lang_structs)
    o["language_id"] = f"""
WITH {TOKS_CTE},
scored AS (
  SELECT d.doc_id, lower(d.text) AS lt,
         list_sort([{structs}]) AS ranking
  FROM documents d JOIN toks t ON d.doc_id = t.doc_id
)
SELECT doc_id,
  CASE
    WHEN regexp_matches(lt, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
    WHEN regexp_matches(lt, '[\\x{{3040}}-\\x{{30ff}}]') THEN 'ja'
    WHEN regexp_matches(lt, '[\\x{{ac00}}-\\x{{d7af}}]') THEN 'ko'
    WHEN regexp_matches(lt, '[\\x{{0400}}-\\x{{04ff}}]') THEN 'ru'
    WHEN regexp_matches(lt, '[\\x{{0600}}-\\x{{06ff}}]') THEN 'ar'
    WHEN ranking[1].s < 0 THEN ranking[1].l
    ELSE 'unknown'
  END AS lang_pred
FROM scored
"""

    o["fingerprint"] = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""

    # deterministic md5 bucket shared by the sampling/split oracles:
    # Spark conv(substr(md5(k || ':seed'),1,15),16,10) == DuckDB
    # ('0x' || substr(md5(k || ':seed'),1,15))::BIGINT
    BUCKET = (
        "('0x' || substr(md5(doc_id::VARCHAR || ':7'), 1, 15))::BIGINT % 1000000"
    )

    o["hash_sample"] = f"""
SELECT doc_id, lang FROM documents WHERE {BUCKET} < 250000
"""

    # weighted Bernoulli: same md5 coin, per-row threshold from the
    # quality score (CTE wraps the full quality_score oracle statement)
    o["weighted_sample"] = f"""
WITH qs AS ({o["quality_score"]})
SELECT doc_id, quality_score FROM qs
WHERE {BUCKET} < CAST(round(quality_score * 1000000) AS BIGINT)
"""

    o["train_test_split"] = f"""
SELECT doc_id,
       CASE WHEN {BUCKET} < 200000 THEN 'test' ELSE 'train' END AS split
FROM documents
"""

    o["stratified_sample"] = f"""
SELECT doc_id, lang FROM documents
WHERE {BUCKET} < CASE lang
  WHEN 'de' THEN 1000000 WHEN 'en' THEN 100000 WHEN 'zh' THEN 500000
  ELSE 0 END
"""

    o["leakage_report"] = f"""
WITH fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
         {BUCKET} AS b,
         ('0x' || substr(md5(doc_id::VARCHAR || ':3'), 1, 15))::BIGINT % 1000000
           AS leak_b
  FROM documents
),
train AS (
  SELECT doc_id, fingerprint FROM fp WHERE b >= 200000
  UNION ALL
  SELECT doc_id, fingerprint FROM fp WHERE b < 200000 AND leak_b < 300000
),
test AS (SELECT doc_id, fingerprint FROM fp WHERE b < 200000)
SELECT t.doc_id AS train_id, s.doc_id AS test_id, t.fingerprint
FROM train t JOIN test s ON t.fingerprint = s.fingerprint
"""

    # word-bigram repetition: grams over token indices 1..max(len-2,0)+1
    # mirrors Spark sequence(0, greatest(size-n, 0)) + slice(toks, i+1, n)
    GRAMS_CTE = """
grams AS (
  SELECT d.doc_id, d.text,
         list_transform(
           generate_series(1, greatest(len(t.t) - 2, 0) + 1),
           i -> array_to_string(t.t[i : i + 1], ' ')
         ) AS g
  FROM documents d JOIN toks t ON d.doc_id = t.doc_id
)
"""

    o["repetition_score"] = f"""
WITH {TOKS_CTE},
{GRAMS_CTE}
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 OR len(g) <= 0 THEN 0.0
            ELSE round((len(g) - len(list_distinct(g)))::DOUBLE / len(g), 6)
       END AS dup_ngram_frac
FROM grams
"""

    o["filter_quality"] = f"""
WITH {TOKS_CTE},
{GRAMS_CTE},
feats AS (
  SELECT d.doc_id,
         length(d.text) AS n_chars,
         greatest(len(t.t), 1) AS n_tok_div,
         CASE WHEN length(trim(d.text)) = 0 THEN 0 ELSE len(t.t) END AS n_tokens,
         length(regexp_replace(lower(d.text), '[a-z0-9\\s]', '', 'g')) AS punct,
         len(list_filter(t.t, x -> list_contains(
           ['the','and','of','to','a','in','is','it','that','for','was','with'], x)))
           AS n_stop,
         length(regexp_replace(d.text, '\\s+', '', 'g')) AS nonspace
  FROM documents d JOIN toks t ON d.doc_id = t.doc_id
),
quality AS (
  SELECT doc_id, n_tokens, round(
      0.4 * least(n_chars / 1000.0, 1.0)
    + 0.3 * least((n_stop::DOUBLE / n_tok_div) / 0.4, 1.0)
    + 0.2 * (1.0 - punct::DOUBLE / greatest(n_chars, 1))
    + 0.1 * (CASE WHEN nonspace::DOUBLE / n_tok_div BETWEEN 2 AND 12
             THEN 1.0 ELSE 0.0 END), 6) AS quality_score
  FROM feats
),
rep AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 OR len(g) <= 0 THEN 0.0
              ELSE round((len(g) - len(list_distinct(g)))::DOUBLE / len(g), 6)
         END AS dup_ngram_frac
  FROM grams
)
SELECT q.doc_id
FROM quality q JOIN rep r ON q.doc_id = r.doc_id
WHERE q.quality_score >= 0.45
  AND q.n_tokens BETWEEN 20 AND 1000000
  AND r.dup_ngram_frac <= 0.08
"""

    o["token_histogram"] = f"""
WITH {TOKS_CTE},
counts AS (
  SELECT d.doc_id,
         CASE WHEN length(trim(d.text)) = 0 THEN 0 ELSE len(t.t) END AS n
  FROM documents d JOIN toks t ON d.doc_id = t.doc_id
)
SELECT (n // 20) * 20 AS token_bucket, count(*) AS n_docs
FROM counts GROUP BY 1
"""

    o["tfidf_top_terms"] = f"""
WITH {TOKS_CTE},
terms AS (
  SELECT doc_id, unnest(t) AS term FROM toks
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms
  WHERE length(term) >= 3 GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nd AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ln(((SELECT n FROM nd) + 1)::DOUBLE / (dfreq.df + 1)), 6)
           AS tfidf
  FROM tf JOIN dfreq ON tf.term = dfreq.term
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf, tfidf, rank FROM ranked WHERE rank <= 3
"""

    o["exact_dedup"] = """
WITH fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents
),
canon AS (SELECT fingerprint, min(doc_id) AS canonical_id FROM fp GROUP BY fingerprint)
SELECT f.doc_id, c.canonical_id, f.doc_id <> c.canonical_id AS is_duplicate
FROM fp f JOIN canon c ON f.fingerprint = c.fingerprint
"""

    # minhash signatures with the same (a, b) parameters
    params = minhash_params(N_PERM)
    sig_cols = ", ".join(
        f"min(({a} * h + {b}) % {MINHASH_PRIME}) AS h{i}"
        for i, (a, b) in enumerate(params)
    )
    o["minhash_signatures"] = f"""
WITH {SHINGLE_CTE},
hashed AS (
  SELECT id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_PRIME} AS h
  FROM sh
)
SELECT id AS doc_id, {sig_cols}
FROM hashed GROUP BY id
"""

    o["ngram_jaccard_dedup"] = f"""
WITH {SHINGLE_CTE},
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT s.id_a, s.id_b,
       round(s.shared::DOUBLE / (sa.n_sh + sb.n_sh - s.shared), 6) AS jaccard
FROM shared s
JOIN sizes sa ON s.id_a = sa.id
JOIN sizes sb ON s.id_b = sb.id
WHERE s.shared::DOUBLE / (sa.n_sh + sb.n_sh - s.shared) >= 0.5
"""

    # banded fuzzy-decontamination recall: truth = exhaustive
    # cross-corpus Jaccard >= 0.5 on the disjoint %20 split; pred =
    # truth ∩ (2 bands x 2 rows minhash collisions), replayed with
    # the same LCG permutation literals as minhash_lsh_dedup
    o["fuzzy_decon_recall"] = f"""
WITH {SHINGLE_CTE},
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
shared AS (
  SELECT a.id AS train_id, b.id AS eval_id, count(*) AS shared
  FROM sh a JOIN sh b ON a.sh = b.sh
  WHERE a.id % 20 <> 0 AND b.id % 20 = 0
  GROUP BY 1, 2
),
truth AS (
  SELECT s.train_id, s.eval_id
  FROM shared s
  JOIN sizes st ON s.train_id = st.id
  JOIN sizes se ON s.eval_id = se.id
  WHERE round(s.shared::DOUBLE / (st.n_sh + se.n_sh - s.shared), 6) >= 0.5
),
hashed AS (
  SELECT id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_PRIME} AS h
  FROM sh
),
sigs AS (SELECT id, {sig_cols} FROM hashed GROUP BY id),
banded AS (
  SELECT id, 0 AS band, h0::VARCHAR || '_' || h1::VARCHAR AS key FROM sigs
  UNION ALL
  SELECT id, 1 AS band, h2::VARCHAR || '_' || h3::VARCHAR AS key FROM sigs
),
cand AS (
  SELECT DISTINCT a.id AS train_id, b.id AS eval_id
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
  WHERE a.id % 20 <> 0 AND b.id % 20 = 0
),
pred AS (SELECT * FROM truth INNER JOIN cand USING (train_id, eval_id)),
hits AS (SELECT eval_id, count(*) AS n_hit FROM pred GROUP BY 1),
perq AS (SELECT eval_id, count(*) AS n_truth FROM truth GROUP BY 1)
SELECT perq.eval_id,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       round(coalesce(n_hit, 0) / n_truth, 6) AS recall
FROM perq LEFT JOIN hits USING (eval_id)
"""

    # fuzzy_decontaminate (bands=0 exhaustive): cross-corpus Jaccard
    # between all docs and the eval subset (every 20th doc)
    o["fuzzy_decontaminate"] = f"""
WITH {SHINGLE_CTE},
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
shared AS (
  SELECT a.id AS train_id, b.id AS eval_id, count(*) AS shared
  FROM sh a JOIN sh b ON a.sh = b.sh AND b.id % 20 = 0
  GROUP BY 1, 2
)
SELECT s.train_id, s.eval_id,
       round(s.shared::DOUBLE / (st.n_sh + se.n_sh - s.shared), 6) AS jaccard
FROM shared s
JOIN sizes st ON s.train_id = st.id
JOIN sizes se ON s.eval_id = se.id
WHERE round(s.shared::DOUBLE / (st.n_sh + se.n_sh - s.shared), 6) >= 0.5
"""

    # persisted MinHash index probe: same LCG signatures, band
    # collisions (h0_h1 / h2_h3), decision = signature-component
    # agreement fraction >= 0.5 — the banding + estimate replayed
    # verbatim, no exhaustive-mode trick needed
    o["minhash_index_decon"] = f"""
WITH {SHINGLE_CTE},
hashed AS (
  SELECT id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_PRIME} AS h
  FROM sh
),
sigs AS (SELECT id, {sig_cols} FROM hashed GROUP BY id),
banded AS (
  SELECT id, h0, h1, h2, h3,
         0 AS band, h0::VARCHAR || '_' || h1::VARCHAR AS key FROM sigs
  UNION ALL
  SELECT id, h0, h1, h2, h3,
         1 AS band, h2::VARCHAR || '_' || h3::VARCHAR AS key FROM sigs
),
pairs AS (
  SELECT DISTINCT a.id AS train_id, b.id AS eval_id,
         round(((a.h0 = b.h0)::INT + (a.h1 = b.h1)::INT
              + (a.h2 = b.h2)::INT + (a.h3 = b.h3)::INT) / 4.0, 6)
           AS est_jaccard
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
  WHERE a.id % 20 <> 0 AND b.id % 20 = 0
)
SELECT train_id, eval_id, est_jaccard FROM pairs
WHERE est_jaccard >= 0.25
"""

    # persisted-index SELF-dedup: same signatures/banding, self-pairs
    # within buckets, same agreement estimator — est is a pure function
    # of the pair's sigs so DISTINCT == the Spark groupBy-max fold
    o["minhash_index_dup"] = f"""
WITH {SHINGLE_CTE},
hashed AS (
  SELECT id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_PRIME} AS h
  FROM sh
),
sigs AS (SELECT id, {sig_cols} FROM hashed GROUP BY id),
banded AS (
  SELECT id, h0, h1, h2, h3,
         0 AS band, h0::VARCHAR || '_' || h1::VARCHAR AS key FROM sigs
  UNION ALL
  SELECT id, h0, h1, h2, h3,
         1 AS band, h2::VARCHAR || '_' || h3::VARCHAR AS key FROM sigs
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         round(((a.h0 = b.h0)::INT + (a.h1 = b.h1)::INT
              + (a.h2 = b.h2)::INT + (a.h3 = b.h3)::INT) / 4.0, 6)
           AS est_jaccard
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
  WHERE a.id < b.id
)
SELECT id_a, id_b, est_jaccard FROM pairs
WHERE est_jaccard >= 0.25
"""

    # post-removal probe: the decon replay with the train side
    # restricted to the ids left in the store (%5 <> 1); eval side
    # unchanged (%20 == 0 never removed), self-collisions included
    o["minhash_index_removed"] = f"""
WITH {SHINGLE_CTE},
hashed AS (
  SELECT id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_PRIME} AS h
  FROM sh
),
sigs AS (SELECT id, {sig_cols} FROM hashed GROUP BY id),
banded AS (
  SELECT id, h0, h1, h2, h3,
         0 AS band, h0::VARCHAR || '_' || h1::VARCHAR AS key FROM sigs
  UNION ALL
  SELECT id, h0, h1, h2, h3,
         1 AS band, h2::VARCHAR || '_' || h3::VARCHAR AS key FROM sigs
),
pairs AS (
  SELECT DISTINCT a.id AS train_id, b.id AS eval_id,
         round(((a.h0 = b.h0)::INT + (a.h1 = b.h1)::INT
              + (a.h2 = b.h2)::INT + (a.h3 = b.h3)::INT) / 4.0, 6)
           AS est_jaccard
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
  WHERE a.id % 5 <> 1 AND b.id % 20 = 0
)
SELECT train_id, eval_id, est_jaccard FROM pairs
WHERE est_jaccard >= 0.25
"""

    # delta duty cycle: full banding restricted to pairs touching the
    # even half (the added batch) — new x old plus new x new, already
    # canonical under id_a < id_b
    o["minhash_index_dup_delta"] = f"""
WITH {SHINGLE_CTE},
hashed AS (
  SELECT id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_PRIME} AS h
  FROM sh
),
sigs AS (SELECT id, {sig_cols} FROM hashed GROUP BY id),
banded AS (
  SELECT id, h0, h1, h2, h3,
         0 AS band, h0::VARCHAR || '_' || h1::VARCHAR AS key FROM sigs
  UNION ALL
  SELECT id, h0, h1, h2, h3,
         1 AS band, h2::VARCHAR || '_' || h3::VARCHAR AS key FROM sigs
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         round(((a.h0 = b.h0)::INT + (a.h1 = b.h1)::INT
              + (a.h2 = b.h2)::INT + (a.h3 = b.h3)::INT) / 4.0, 6)
           AS est_jaccard
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
  WHERE a.id < b.id AND (a.id % 2 = 0 OR b.id % 2 = 0)
)
SELECT id_a, id_b, est_jaccard FROM pairs
WHERE est_jaccard >= 0.25
"""

    votes = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(SIMHASH_BITS)
    )
    packed = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    o["simhash"] = f"""
WITH {TOKS_CTE},
tok_rows AS (SELECT doc_id, unnest(t) AS w FROM toks),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM tok_rows
),
votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
SELECT doc_id, {packed} AS simhash FROM votes
"""

    # LSH banding over the same 4-perm signatures: 2 bands x 2 rows
    o["minhash_lsh_dedup"] = f"""
WITH {SHINGLE_CTE},
hashed AS (
  SELECT id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_PRIME} AS h
  FROM sh
),
sigs AS (SELECT id, {sig_cols} FROM hashed GROUP BY id),
banded AS (
  SELECT id, 0 AS band, h0::VARCHAR || '_' || h1::VARCHAR AS key FROM sigs
  UNION ALL
  SELECT id, 1 AS band, h2::VARCHAR || '_' || h3::VARCHAR AS key FROM sigs
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key AND a.id < b.id
),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
shared AS (
  SELECT c.id_a, c.id_b, count(*) AS shared
  FROM cand c
  JOIN sh a ON a.id = c.id_a
  JOIN sh b ON b.id = c.id_b AND b.sh = a.sh
  GROUP BY c.id_a, c.id_b
)
SELECT s.id_a, s.id_b,
       round(s.shared::DOUBLE / (sa.n_sh + sb.n_sh - s.shared), 6) AS jaccard
FROM shared s
JOIN sizes sa ON s.id_a = sa.id
JOIN sizes sb ON s.id_b = sb.id
WHERE s.shared::DOUBLE / (sa.n_sh + sb.n_sh - s.shared) >= 0.5
"""

    # stream≡batch: the incremental three-slice fold must equal the
    # full-corpus MinHash — same SQL as minhash_lsh_dedup
    o["stream_neardup_twin"] = o["minhash_lsh_dedup"]

    o["multimodal_features"] = """
SELECT doc_id AS media_id,
       'image' AS media_type,
       octet_length(encode(text)) AS n_bytes,
       round((16 * (1 + doc_id % 4))::DOUBLE / (16 * (1 + doc_id % 3)), 6)
         AS aspect_ratio
FROM documents
"""

    o["embedding_dedup"] = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product((a.embedding::DOUBLE[]), (b.embedding::DOUBLE[]))
         / (sqrt(list_dot_product((a.embedding::DOUBLE[]), (a.embedding::DOUBLE[])))
            * sqrt(list_dot_product((b.embedding::DOUBLE[]), (b.embedding::DOUBLE[])))), 6) AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_dot_product((a.embedding::DOUBLE[]), (b.embedding::DOUBLE[]))
      / (sqrt(list_dot_product((a.embedding::DOUBLE[]), (a.embedding::DOUBLE[])))
         * sqrt(list_dot_product((b.embedding::DOUBLE[]), (b.embedding::DOUBLE[])))) >= 0.42
"""

    o["cosine_topk"] = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         round(list_dot_product((q.embedding::DOUBLE[]), (c.embedding::DOUBLE[]))
           / (sqrt(list_dot_product((q.embedding::DOUBLE[]), (q.embedding::DOUBLE[])))
              * sqrt(list_dot_product((c.embedding::DOUBLE[]), (c.embedding::DOUBLE[])))), 6) AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 3
"""

    # hard negatives: the same scored cross join, label-mismatch
    # filtered BEFORE the per-anchor top-k (NULL labels never pair)
    o["mine_hard_negatives"] = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neg_id,
         q.label AS anchor_label, c.label AS neg_label,
         round(list_dot_product((q.embedding::DOUBLE[]), (c.embedding::DOUBLE[]))
           / (sqrt(list_dot_product((q.embedding::DOUBLE[]), (q.embedding::DOUBLE[])))
              * sqrt(list_dot_product((c.embedding::DOUBLE[]), (c.embedding::DOUBLE[])))), 6) AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 10 AND q.label <> c.label
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neg_id ASC) AS rank
  FROM scored
)
SELECT query_id, neg_id, anchor_label, neg_label, cosine, rank
FROM ranked WHERE rank <= 3
"""

    # exhaustive-probe IVF == brute force: same oracle as cosine_topk
    o["cosine_topk_ivf"] = o["cosine_topk"]
    # single-bucket (n_planes=0) LSH == brute force: same oracle
    o["cosine_topk_lsh"] = o["cosine_topk"]
    # exhaustive probe (n_probe == n_lists) of the persisted index ==
    # brute force: same oracle again
    o["ivf_index_search"] = o["cosine_topk"]

    # persisted LSH with exhaustive probes: every bucket in the
    # Hamming-n_planes ball is probed, so candidates = all pairs and
    # the search IS brute cosine top-k (the ivf trick)
    o["lsh_index_search"] = o["cosine_topk"]
    # build-on-half + append-other-half + exhaustive probe == brute
    # force over the union: same oracle once more
    o["ivf_index_add_search"] = o["cosine_topk"]

    o["semantic_decontaminate"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
ev AS (SELECT vec_id AS eval_id, emb AS e_emb FROM e WHERE vec_id % 20 = 0),
tr AS (SELECT vec_id AS train_id, emb AS t_emb FROM e WHERE vec_id % 20 <> 0)
SELECT train_id, eval_id,
       round(list_dot_product(t_emb, e_emb)
         / (sqrt(list_dot_product(t_emb, t_emb))
            * sqrt(list_dot_product(e_emb, e_emb))), 6) AS cosine
FROM tr, ev
WHERE round(list_dot_product(t_emb, e_emb)
        / (sqrt(list_dot_product(t_emb, t_emb))
           * sqrt(list_dot_product(e_emb, e_emb))), 6) >= 0.42
"""

    o["quantize_embeddings"] = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0
           AS scale
  FROM embeddings
)
SELECT vec_id, round(scale, 9) AS scale,
       CASE WHEN scale = 0
            THEN array_to_string(list_transform(emb, x -> 0), ',')
            ELSE array_to_string(
                   list_transform(emb, x -> round(x / scale)::INT), ',')
       END AS codes
FROM e
"""

    # int8-SQ asymmetric search: dequantize (round(x/scale) * scale,
    # scale = max|x|/127 — the exact quantize_embeddings arithmetic),
    # then exact 6-dp squared-L2 top-5, self included
    o["sq_topk"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
s AS (
  SELECT vec_id, emb,
         list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
  FROM e
),
deq AS (
  SELECT vec_id,
         CASE WHEN scale = 0 THEN list_transform(emb, x -> 0.0)
              ELSE list_transform(emb, x -> round(x / scale) * scale)
         END AS demb
  FROM s
),
q AS (SELECT vec_id AS query_id, emb FROM e WHERE vec_id < 10)
SELECT query_id, vec_id, d2, CAST(rk AS INTEGER) AS rank FROM (
  SELECT q.query_id, c.vec_id,
         round(list_dot_product(q.emb, q.emb)
           - 2 * list_dot_product(q.emb, c.demb)
           + list_dot_product(c.demb, c.demb), 6) AS d2,
         row_number() OVER (PARTITION BY q.query_id ORDER BY
           round(list_dot_product(q.emb, q.emb)
             - 2 * list_dot_product(q.emb, c.demb)
             + list_dot_product(c.demb, c.demb), 6) ASC,
           c.vec_id ASC) AS rk
  FROM q, deq c
) WHERE rk <= 5
"""

    # persisted int8 IVF, exhaustive probe == brute L2 over the
    # dequantized corpus — the sq_topk arithmetic (scale = max|x|/127,
    # codes = round(x/scale), deq = code * scale), queries 10..19,
    # top-4, self included
    o["ivf_sq_search"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
s AS (
  SELECT vec_id, emb,
         list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
  FROM e
),
deq AS (
  SELECT vec_id,
         CASE WHEN scale = 0 THEN list_transform(emb, x -> 0.0)
              ELSE list_transform(emb, x -> round(x / scale) * scale)
         END AS demb
  FROM s
),
q AS (SELECT vec_id AS query_id, emb FROM e
      WHERE vec_id >= 10 AND vec_id < 20)
SELECT query_id, vec_id, d2, CAST(rk AS INTEGER) AS rank FROM (
  SELECT q.query_id, c.vec_id,
         round(list_dot_product(q.emb, q.emb)
           - 2 * list_dot_product(q.emb, c.demb)
           + list_dot_product(c.demb, c.demb), 6) AS d2,
         row_number() OVER (PARTITION BY q.query_id ORDER BY
           round(list_dot_product(q.emb, q.emb)
             - 2 * list_dot_product(q.emb, c.demb)
             + list_dot_product(c.demb, c.demb), 6) ASC,
           c.vec_id ASC) AS rk
  FROM q, deq c
) WHERE rk <= 4
"""

    # build-on-half + incremental add + compaction == the same index
    # over the full corpus (adds are manifest-routed, compaction is a
    # contract-identical rewrite), so the oracle is sq-brute over ALL
    # rows: queries 0..7, top-3, self included
    o["ivf_sq_compacted"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
s AS (
  SELECT vec_id, emb,
         list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
  FROM e
),
deq AS (
  SELECT vec_id,
         CASE WHEN scale = 0 THEN list_transform(emb, x -> 0.0)
              ELSE list_transform(emb, x -> round(x / scale) * scale)
         END AS demb
  FROM s
),
q AS (SELECT vec_id AS query_id, emb FROM e WHERE vec_id < 8)
SELECT query_id, vec_id, d2, CAST(rk AS INTEGER) AS rank FROM (
  SELECT q.query_id, c.vec_id,
         round(list_dot_product(q.emb, q.emb)
           - 2 * list_dot_product(q.emb, c.demb)
           + list_dot_product(c.demb, c.demb), 6) AS d2,
         row_number() OVER (PARTITION BY q.query_id ORDER BY
           round(list_dot_product(q.emb, q.emb)
             - 2 * list_dot_product(q.emb, c.demb)
             + list_dot_product(c.demb, c.demb), 6) ASC,
           c.vec_id ASC) AS rk
  FROM q, deq c
) WHERE rk <= 3
"""

    # token-budget prefix selection: rank by (n_chars DESC, doc_id),
    # keep while the ROWS-framed inclusive running token total fits
    o["select_under_budget"] = """
WITH toks AS (
  SELECT doc_id, n_chars,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
),
d AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS score,
         len(t) AS n_tokens
  FROM toks
),
c AS (
  SELECT doc_id, score, n_tokens,
         sum(n_tokens) OVER (
           ORDER BY score DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM d
)
SELECT doc_id, score AS n_chars,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(cum AS BIGINT) AS cum_tokens
FROM c WHERE cum <= 8000
"""

    # DSIR unigram log-likelihood ratio, add-1 smoothing over the
    # union vocabulary; target = the lang='en' slice
    o["dsir_weights"] = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
),
tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
tf AS (
  SELECT doc_id, tok, count(*) AS c FROM tok WHERE tok <> ''
  GROUP BY doc_id, tok
),
freq_s AS (SELECT tok, sum(c) AS ns FROM tf GROUP BY tok),
ttoks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents WHERE lang = 'en'
),
ttok AS (SELECT doc_id, unnest(t) AS tok FROM ttoks),
ttf AS (
  SELECT doc_id, tok, count(*) AS c FROM ttok WHERE tok <> ''
  GROUP BY doc_id, tok
),
freq_t AS (SELECT tok, sum(c) AS nt FROM ttf GROUP BY tok),
v AS (SELECT count(*) AS v FROM
      (SELECT tok FROM freq_s UNION SELECT tok FROM freq_t)),
cs AS (SELECT sum(ns) AS ts FROM freq_s),
ct AS (SELECT sum(nt) AS tt FROM freq_t),
lr AS (
  SELECT s.tok,
         ln(CAST(coalesce(t.nt, 0) + 1 AS DOUBLE) / (ct.tt + v.v))
         - ln(CAST(s.ns + 1 AS DOUBLE) / (cs.ts + v.v)) AS lr
  FROM freq_s s LEFT JOIN freq_t t USING (tok), v, cs, ct
),
agg AS (
  SELECT tf.doc_id, sum(tf.c) AS n_tokens,
         round(sum(tf.c * lr.lr), 6) AS log_ratio_sum,
         round(sum(tf.c * lr.lr) / sum(tf.c), 6) AS log_ratio_mean
  FROM tf JOIN lr USING (tok) GROUP BY tf.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
       agg.log_ratio_sum, agg.log_ratio_mean
FROM documents d LEFT JOIN agg USING (doc_id)
"""

    # Gumbel-top-k: per-row uniform from the standard md5 coin,
    # perturbed key w - ln(-ln u), global top-50 by (key DESC, id)
    o["gumbel_topk"] = """
WITH d AS (
  SELECT doc_id, n_chars / 100.0 AS weight,
         ((('0x' || substr(md5(doc_id || ':42'), 1, 15))::BIGINT
           % 1000000) + 0.5) / 1000000.0 AS u
  FROM documents
),
g AS (SELECT doc_id, weight, weight - ln(-ln(u)) AS gk FROM d),
r AS (
  SELECT doc_id, weight, gk,
         row_number() OVER (ORDER BY gk DESC, doc_id ASC) AS rk
  FROM g
)
SELECT doc_id, weight, round(gk, 6) AS gumbel_key,
       CAST(rk AS INTEGER) AS rank
FROM r WHERE rk <= 50
"""

    # sorted-neighborhood blocking: every pair within 4 positions of
    # the global (prefix-key, id) order, id_a the earlier-sorted row
    o["sorted_neighborhood"] = """
WITH d AS (
  SELECT doc_id, lower(substr(text, 1, 12)) AS k FROM documents
),
r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY k ASC, doc_id ASC) - 1 AS rn
  FROM d
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(b.rn - a.rn AS INTEGER) AS gap
FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 4
"""

    # SNM candidates (16-char prefix key, window 8) verified with the
    # exact shingle Jaccard — same shingle CTE and arithmetic as
    # ngram_jaccard_dedup, candidates restricted by sort distance
    o["snm_dedup"] = f"""
WITH {SHINGLE_CTE},
d AS (
  SELECT doc_id, lower(substr(text, 1, 16)) AS k FROM documents
),
r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY k ASC, doc_id ASC) - 1 AS rn
  FROM d
),
cand AS (
  SELECT least(a.doc_id, b.doc_id) AS id_a,
         greatest(a.doc_id, b.doc_id) AS id_b
  FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 8
),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
shared AS (
  SELECT c.id_a, c.id_b, count(*) AS shared
  FROM cand c
  JOIN sh a ON a.id = c.id_a
  JOIN sh b ON b.id = c.id_b AND b.sh = a.sh
  GROUP BY 1, 2
)
SELECT s.id_a, s.id_b,
       round(s.shared::DOUBLE / (sa.n_sh + sb.n_sh - s.shared), 6)
         AS jaccard
FROM shared s
JOIN sizes sa ON s.id_a = sa.id
JOIN sizes sb ON s.id_b = sb.id
WHERE round(s.shared::DOUBLE / (sa.n_sh + sb.n_sh - s.shared), 6) >= 0.5
"""

    # SNM recall vs exhaustive truth: truth = all shingle-Jaccard
    # >= 0.5 pairs (ngram_jaccard_dedup's CTEs at threshold 0.5),
    # pred = the snm_dedup pipeline above; one pair equi-join + a
    # per-id_a aggregate, groups with no truth pairs absent
    o["snm_recall"] = f"""
WITH {SHINGLE_CTE},
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
allshared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY a.id, b.id
),
truth AS (
  SELECT s.id_a, s.id_b
  FROM allshared s
  JOIN sizes sa ON s.id_a = sa.id
  JOIN sizes sb ON s.id_b = sb.id
  WHERE round(s.shared::DOUBLE / (sa.n_sh + sb.n_sh - s.shared), 6)
        >= 0.5
),
d AS (
  SELECT doc_id, lower(substr(text, 1, 16)) AS k FROM documents
),
r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY k ASC, doc_id ASC) - 1 AS rn
  FROM d
),
cand AS (
  SELECT least(a.doc_id, b.doc_id) AS id_a,
         greatest(a.doc_id, b.doc_id) AS id_b
  FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 8
),
candshared AS (
  SELECT c.id_a, c.id_b, count(*) AS shared
  FROM cand c
  JOIN sh a ON a.id = c.id_a
  JOIN sh b ON b.id = c.id_b AND b.sh = a.sh
  GROUP BY 1, 2
),
pred AS (
  SELECT s.id_a, s.id_b
  FROM candshared s
  JOIN sizes sa ON s.id_a = sa.id
  JOIN sizes sb ON s.id_b = sb.id
  WHERE round(s.shared::DOUBLE / (sa.n_sh + sb.n_sh - s.shared), 6)
        >= 0.5
),
hits AS (
  SELECT t.id_a, count(*) AS n_hit
  FROM truth t JOIN pred p USING (id_a, id_b)
  GROUP BY 1
),
perg AS (SELECT id_a, count(*) AS n_truth FROM truth GROUP BY 1)
SELECT perg.id_a,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       round(coalesce(n_hit, 0) / n_truth, 6) AS recall
FROM perg LEFT JOIN hits USING (id_a)
"""

    o["knn_graph"] = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
  WHERE vec_id < 200
),
scored AS (
  SELECT q.vec_id AS source, c.vec_id AS target,
         round(list_dot_product(q.emb, c.emb)
           / (sqrt(list_dot_product(q.emb, q.emb))
              * sqrt(list_dot_product(c.emb, c.emb))), 6) AS weight
  FROM e q, e c
  WHERE q.vec_id <> c.vec_id
),
ranked AS (
  SELECT source, target, weight,
         row_number() OVER (PARTITION BY source
                            ORDER BY weight DESC, target ASC) AS rank
  FROM scored
)
SELECT source, target, weight, rank FROM ranked WHERE rank <= 3
"""

    o["events_window_agg"] = """
SELECT event_type,
       date_trunc('hour', ts) AS window_start,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""

    # quotient graph per hour window: user cohorts x event types,
    # decimal-exact weight sums cast to double (stream_edge_condense's
    # batch twin)
    o["stream_condense_twin"] = """
SELECT date_trunc('hour', ts) AS window_start,
       user_id % 10 AS source_group,
       event_type AS target_group,
       count(*) AS n_edges,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_weight
FROM events
GROUP BY 1, 2, 3
"""

    o["sessionize"] = """
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
         floor(epoch(ts))::BIGINT AS ts_s,
         lag(floor(epoch(ts))::BIGINT) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800 THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sess AS (
  SELECT *, sum(is_new) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       max(ts_s) - min(ts_s) AS duration_s,
       round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
FROM sess
GROUP BY user_id, session_id
"""

    o["session_windows"] = """
WITH ordered AS (
  SELECT user_id, ts, value,
         floor(epoch(ts))::BIGINT AS ts_s,
         lag(floor(epoch(ts))::BIGINT) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800 THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sess AS (
  SELECT *, sum(is_new) OVER (
    PARTITION BY user_id ORDER BY ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, min(ts) AS session_start,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM sess
GROUP BY user_id, session_id
"""

    # DuckDB's native ASOF JOIN is the oracle for ours
    o["asof_join"] = """
WITH clicks AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c.event_id,
       round(p.value, 6) AS last_purchase_value,
       p.ts AS last_purchase_ts
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""

    # forward asof: DuckDB's native ASOF with the inequality flipped
    o["asof_join_forward"] = """
WITH clicks AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c.event_id,
       round(p.value, 6) AS next_purchase_value,
       p.ts AS next_purchase_ts
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""

    # nearest asof: both directional ASOF matches joined back per
    # click; MICROSECOND deltas (epoch_us — the precision the engine
    # compares on), exact ties prefer backward, the 86400 s tolerance
    # bounds |dt| on both sides
    o["asof_join_nearest"] = """
WITH clicks AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT c.user_id, c.event_id, c.ts, p.value AS bv, p.ts AS bts
  FROM clicks c ASOF LEFT JOIN purchases p
    ON c.user_id = p.user_id AND c.ts >= p.ts
),
f AS (
  SELECT c.user_id, c.event_id, p.value AS fv, p.ts AS fts
  FROM clicks c ASOF LEFT JOIN purchases p
    ON c.user_id = p.user_id AND c.ts <= p.ts
),
j AS (
  SELECT b.user_id, b.event_id,
         bv, bts, fv, fts,
         bts IS NOT NULL
           AND abs(epoch_us(b.ts) - epoch_us(bts)) <= 86400000000 AS mb,
         fts IS NOT NULL
           AND abs(epoch_us(b.ts) - epoch_us(fts)) <= 86400000000 AS mf,
         epoch_us(b.ts) - epoch_us(bts) AS bdt,
         epoch_us(fts) - epoch_us(b.ts) AS fdt
  FROM b JOIN f USING (user_id, event_id)
)
SELECT user_id, event_id,
       round(CASE WHEN mb AND (NOT mf OR bdt <= fdt) THEN bv
                  WHEN mf THEN fv END, 6) AS near_purchase_value,
       CASE WHEN mb AND (NOT mf OR bdt <= fdt) THEN bts
            WHEN mf THEN fts END AS near_purchase_ts
FROM j
"""

    o["range_join"] = """
SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id
FROM events c JOIN events e
  ON c.user_id = e.user_id
 AND c.event_type = 'click' AND e.event_type = 'error'
 AND epoch_us(e.ts) >= epoch_us(c.ts)
 AND epoch_us(e.ts) - epoch_us(c.ts) <= 600000000
"""

    o["events_sliding_window"] = """
WITH w AS (
  SELECT event_type,
         unnest([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
           AS window_start
  FROM events
)
SELECT event_type, window_start, count(*) AS n_events
FROM w GROUP BY 1, 2
"""

    o["event_dedup"] = """
SELECT DISTINCT user_id, event_type FROM events
"""

    # -- round-2 extensions -------------------------------------------------
    # fixed-iteration PageRank, unrolled: one (contribution, rank) CTE
    # pair per iteration; 1e-18 scaled-long integer sums + 12-dp
    # per-round rounding match the engine bit-for-bit
    pr_iters = "".join(
        f""",
c{i} AS (
  SELECT e.target AS id,
         SUM(floor(p.pr / d.w_out * 1e18)::BIGINT) AS s
  FROM edges e
  JOIN pr{i - 1} p ON e.source = p.id
  JOIN deg d ON e.source = d.source
  GROUP BY e.target
),
pr{i} AS (
  SELECT n.id,
         round((1 - 0.85) / (SELECT count(*) FROM nodes)
               + 0.85 * (coalesce(c{i}.s, 0) / 1e18), 12) AS pr
  FROM nodes n LEFT JOIN c{i} ON n.id = c{i}.id
)"""
        for i in range(1, PAGERANK_ITERS + 1)
    )
    o["pagerank"] = f"""
WITH {GRAPH_CTE},
deg AS (SELECT source, count(*) AS w_out FROM edges GROUP BY source),
pr0 AS (SELECT id, 1.0 / (SELECT count(*) FROM nodes) AS pr FROM nodes)
{pr_iters}
SELECT id, round(pr, 6) AS pagerank FROM pr{PAGERANK_ITERS}
"""

    # weighted PageRank: transition shares = 6-dp-quantized weight /
    # decimal-summed out-weight; same scaled-long round scheme
    prw_iters = "".join(
        f""",
wc{i} AS (
  SELECT e.target AS id,
         SUM(floor(p.pr * (e.w / d.w_out) * 1e18)::BIGINT) AS s
  FROM we e
  JOIN wpr{i - 1} p ON e.source = p.id
  JOIN wdeg d ON e.source = d.source
  GROUP BY e.target
),
wpr{i} AS (
  SELECT n.id,
         round((1 - 0.85) / (SELECT count(*) FROM nodes)
               + 0.85 * (coalesce(wc{i}.s, 0) / 1e18), 12) AS pr
  FROM nodes n LEFT JOIN wc{i} ON n.id = wc{i}.id
)"""
        for i in range(1, PAGERANK_ITERS + 1)
    )
    o["pagerank_weighted"] = f"""
WITH {GRAPH_CTE},
we AS (
  SELECT source, target,
         CAST(CAST(weight AS DECIMAL(28,6)) AS DOUBLE) AS w
  FROM edges
),
wdeg AS (
  SELECT source, CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS w_out
  FROM we GROUP BY source
),
wpr0 AS (SELECT id, 1.0 / (SELECT count(*) FROM nodes) AS pr FROM nodes)
{prw_iters}
SELECT id, round(pr, 6) AS pagerank FROM wpr{PAGERANK_ITERS}
"""

    o["triangle_count"] = """
WITH e AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM documents a JOIN documents b
    ON a.doc_id % 7 = b.doc_id % 7 AND a.doc_id < b.doc_id
  WHERE a.doc_id < 450 AND b.doc_id < 450
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
),
corners AS (
  SELECT a AS id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, count(*) AS triangles FROM corners GROUP BY id)
SELECT d.doc_id AS id, coalesce(cnt.triangles, 0) AS triangles
FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.id
"""

    # near-dup pairs (same SQL as ngram_jaccard_dedup) folded to
    # clusters by transitive closure; min id per component
    o["dedup_clusters"] = f"""
WITH RECURSIVE {SHINGLE_CTE},
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY a.id, b.id
),
pairs AS (
  SELECT s.id_a, s.id_b FROM shared s
  JOIN sizes sa ON s.id_a = sa.id
  JOIN sizes sb ON s.id_b = sb.id
  WHERE s.shared::DOUBLE / (sa.n_sh + sb.n_sh - s.shared) >= 0.5
),
sym AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r
)
SELECT id AS doc_id, min(r) AS cluster_id, (min(r) <> id) AS is_duplicate
FROM reach GROUP BY id
"""

    o["bm25_search"] = f"""
WITH {TOKS_CTE},
lens AS (SELECT doc_id, len(t) AS dl FROM toks),
tot AS (SELECT SUM(dl)::DOUBLE / count(*) AS avgdl, count(*) AS n FROM lens),
tf AS (
  SELECT doc_id, w AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
  WHERE w IN ('spark', 'hash', 'vector')
  GROUP BY doc_id, w
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
per_term AS (
  SELECT tf.doc_id,
         CAST(round(
           ln(1.0 + (tot.n::DOUBLE - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / tot.avgdl)), 6)
         AS DECIMAL(38,12)) AS ts
  FROM tf
  JOIN dfreq ON tf.term = dfreq.term
  JOIN lens ON tf.doc_id = lens.doc_id
  CROSS JOIN tot
),
scored AS (
  SELECT doc_id, round(CAST(SUM(ts) AS DOUBLE), 6) AS score
  FROM per_term GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT doc_id, score, rank FROM ranked WHERE rank <= 10
"""

    # persisted text index: the probe (and the build+add duty cycle)
    # is contract-identical to transient BM25, so both replay the
    # exact full-corpus scoring SQL
    o["text_index_search"] = o["bm25_search"]
    o["text_index_added"] = o["bm25_search"]

    # batched retrieval run: the same BM25 scoring replayed per query
    # (df/N/avgdl are query-independent globals; top-k partitions by
    # query)
    o["text_index_batch"] = f"""
WITH {TOKS_CTE},
lens AS (SELECT doc_id, len(t) AS dl FROM toks),
tot AS (SELECT SUM(dl)::DOUBLE / count(*) AS avgdl, count(*) AS n FROM lens),
qt AS (
  SELECT * FROM (VALUES
    (1, 'spark'), (1, 'hash'),
    (2, 'vector'), (2, 'data'), (2, 'spark'),
    (3, 'partition')
  ) AS v(query_id, term)
),
tf AS (
  SELECT doc_id, w AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
  WHERE w IN (SELECT term FROM qt)
  GROUP BY doc_id, w
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
per_term AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(round(
           ln(1.0 + (tot.n::DOUBLE - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / tot.avgdl)), 6)
         AS DECIMAL(38,12)) AS ts
  FROM tf
  JOIN dfreq ON tf.term = dfreq.term
  JOIN qt ON tf.term = qt.term
  JOIN lens ON tf.doc_id = lens.doc_id
  CROSS JOIN tot
),
scored AS (
  SELECT query_id, doc_id, round(CAST(SUM(ts) AS DOUBLE), 6) AS score
  FROM per_term GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score, rank
FROM ranked WHERE rank <= 5
"""

    # hybrid retrieval: per-query BM25 top-5 + brute cosine top-3
    # (the exhaustive-probe LSH leg) fused with 12-dp DECIMAL RRF —
    # each leg's SQL is the already-proven twin, composed
    o["hybrid_search"] = f"""
WITH {TOKS_CTE},
lens AS (SELECT doc_id, len(t) AS dl FROM toks),
tot AS (SELECT SUM(dl)::DOUBLE / count(*) AS avgdl, count(*) AS n FROM lens),
qt AS (
  SELECT * FROM (VALUES
    (0, 'spark'), (0, 'hash'),
    (1, 'vector'), (1, 'data'),
    (2, 'partition'), (2, 'spark')
  ) AS v(query_id, term)
),
tf AS (
  SELECT doc_id, w AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
  WHERE w IN (SELECT term FROM qt)
  GROUP BY doc_id, w
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
per_term AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(round(
           ln(1.0 + (tot.n::DOUBLE - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / tot.avgdl)), 6)
         AS DECIMAL(38,12)) AS ts
  FROM tf
  JOIN dfreq ON tf.term = dfreq.term
  JOIN qt ON tf.term = qt.term
  JOIN lens ON tf.doc_id = lens.doc_id
  CROSS JOIN tot
),
scored_lex AS (
  SELECT query_id, doc_id, round(CAST(SUM(ts) AS DOUBLE), 6) AS score
  FROM per_term GROUP BY query_id, doc_id
),
lex AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM scored_lex QUALIFY rank <= 5
),
vscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         round(list_dot_product((q.embedding::DOUBLE[]), (c.embedding::DOUBLE[]))
           / (sqrt(list_dot_product((q.embedding::DOUBLE[]), (q.embedding::DOUBLE[])))
              * sqrt(list_dot_product((c.embedding::DOUBLE[]), (c.embedding::DOUBLE[])))), 6) AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 3 AND q.vec_id <> c.vec_id
),
vec AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, doc_id ASC
         ) AS rank
  FROM vscored QUALIFY rank <= 3
),
u AS (
  SELECT query_id, doc_id,
         CAST(round(1.0 / (60 + rank), 12) AS DECIMAL(38,12)) AS term
  FROM lex
  UNION ALL
  SELECT query_id, doc_id,
         CAST(round(1.0 / (60 + rank), 12) AS DECIMAL(38,12))
  FROM vec
),
fused AS (
  SELECT query_id, doc_id, count(*) AS n_lists,
         round(CAST(SUM(term) AS DOUBLE), 6) AS rrf_score
  FROM u GROUP BY query_id, doc_id
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_lists, rrf_score,
       row_number() OVER (
         PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC
       ) AS fused_rank
FROM fused QUALIFY fused_rank <= 10
"""

    # hybrid with the int8-quantized vector leg: BM25 twin + sq-brute
    # L2 twin (exhaustive probe == dequantized brute force, the
    # sq_topk arithmetic) + decimal RRF — same fusion SQL as
    # hybrid_search with the cosine leg swapped for the d2-asc leg
    o["hybrid_search_ivfsq"] = f"""
WITH {TOKS_CTE},
lens AS (SELECT doc_id, len(t) AS dl FROM toks),
tot AS (SELECT SUM(dl)::DOUBLE / count(*) AS avgdl, count(*) AS n FROM lens),
qt AS (
  SELECT * FROM (VALUES
    (0, 'spark'), (0, 'hash'),
    (1, 'vector'), (1, 'data'),
    (2, 'partition'), (2, 'spark')
  ) AS v(query_id, term)
),
tf AS (
  SELECT doc_id, w AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
  WHERE w IN (SELECT term FROM qt)
  GROUP BY doc_id, w
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
per_term AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(round(
           ln(1.0 + (tot.n::DOUBLE - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / tot.avgdl)), 6)
         AS DECIMAL(38,12)) AS ts
  FROM tf
  JOIN dfreq ON tf.term = dfreq.term
  JOIN qt ON tf.term = qt.term
  JOIN lens ON tf.doc_id = lens.doc_id
  CROSS JOIN tot
),
scored_lex AS (
  SELECT query_id, doc_id, round(CAST(SUM(ts) AS DOUBLE), 6) AS score
  FROM per_term GROUP BY query_id, doc_id
),
lex AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM scored_lex QUALIFY rank <= 5
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
s AS (
  SELECT vec_id, emb,
         list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
  FROM e
),
deq AS (
  SELECT vec_id,
         CASE WHEN scale = 0 THEN list_transform(emb, x -> 0.0)
              ELSE list_transform(emb, x -> round(x / scale) * scale)
         END AS demb
  FROM s
),
vscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         round(list_dot_product(q.emb, q.emb)
           - 2 * list_dot_product(q.emb, c.demb)
           + list_dot_product(c.demb, c.demb), 6) AS d2
  FROM e q, deq c
  WHERE q.vec_id < 3
),
vec AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY d2 ASC, doc_id ASC
         ) AS rank
  FROM vscored QUALIFY rank <= 3
),
u AS (
  SELECT query_id, doc_id,
         CAST(round(1.0 / (60 + rank), 12) AS DECIMAL(38,12)) AS term
  FROM lex
  UNION ALL
  SELECT query_id, doc_id,
         CAST(round(1.0 / (60 + rank), 12) AS DECIMAL(38,12))
  FROM vec
),
fused AS (
  SELECT query_id, doc_id, count(*) AS n_lists,
         round(CAST(SUM(term) AS DOUBLE), 6) AS rrf_score
  FROM u GROUP BY query_id, doc_id
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_lists, rrf_score,
       row_number() OVER (
         PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC
       ) AS fused_rank
FROM fused QUALIFY fused_rank <= 10
"""

    # phrase 'hash join': chain-join of per-term positions (b.o =
    # a.o + 1), tf = occurrence count per doc, df = matching docs,
    # BM25 single-virtual-term scoring — the engine's array_intersect
    # fold over shifted position arrays computes the same set
    o["phrase_search"] = f"""
WITH {TOKS_CTE},
lens AS (SELECT doc_id, len(t) AS dl FROM toks),
tot AS (SELECT SUM(dl)::DOUBLE / count(*) AS avgdl, count(*) AS n FROM lens),
idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks),
p AS (SELECT doc_id, t[i] AS w, i AS o FROM idx),
a AS (SELECT doc_id, o FROM p WHERE w = 'hash'),
b AS (SELECT doc_id, o FROM p WHERE w = 'join'),
m AS (
  SELECT a.doc_id, count(*) AS ptf
  FROM a JOIN b ON a.doc_id = b.doc_id AND b.o = a.o + 1
  GROUP BY a.doc_id
),
dfp AS (SELECT count(*) AS df_p FROM m),
scored AS (
  SELECT m.doc_id,
         round(ln(1.0 + (tot.n::DOUBLE - dfp.df_p + 0.5) / (dfp.df_p + 0.5))
           * (m.ptf * 2.2)
           / (m.ptf + 1.2 * (0.25 + 0.75 * lens.dl / tot.avgdl)), 6) AS score
  FROM m
  JOIN lens ON m.doc_id = lens.doc_id
  CROSS JOIN tot CROSS JOIN dfp
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER)
         AS rank
FROM scored QUALIFY rank <= 10
"""

    # shared mixed-script fixture + cjk_aware token expression for the
    # two CJK oracles below (DuckDB list_transform/substr twin of
    # text.tokens_col(mode='cjk_aware'))
    _CJK_VALUES = """(VALUES
    (0, 'the weather is nice today'),
    (1, '今日は良い天気です'),
    (2, '明日も良い天気でしょう'),
    (3, 'spark で 分散処理 is fast'),
    (4, '天気 weather 天気'),
    (5, '悪い天気の日'),
    (6, 'nothing related here'),
    (7, '良い本を読む')
  ) AS v(doc_id, text)"""
    _CJK_TOKS = r"""list_filter(flatten(list_transform(
      regexp_split_to_array(lower(trim(text)), '\s+'),
      t -> CASE WHEN regexp_matches(t, '[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}]')
           THEN list_transform(generate_series(1, greatest(length(t)-1, 1)),
                               i -> t[i:i+1])
           ELSE [t] END)), x -> x <> '')"""

    o["cjk_tokens"] = f"""
WITH d AS (SELECT * FROM {_CJK_VALUES}),
toks AS (SELECT doc_id, {_CJK_TOKS} AS t FROM d)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       list_aggregate(t, 'string_agg', '|') AS tok_str
FROM toks
"""

    o["cjk_bm25"] = f"""
WITH d AS (SELECT * FROM {_CJK_VALUES}),
toks AS (SELECT doc_id, {_CJK_TOKS} AS t FROM d),
lens AS (SELECT doc_id, len(t) AS dl FROM toks),
tot AS (SELECT SUM(dl)::DOUBLE / count(*) AS avgdl, count(*) AS n FROM lens),
tf AS (
  SELECT doc_id, w AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
  WHERE w IN ('良い', 'い天', '天気')
  GROUP BY doc_id, w
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
per_term AS (
  SELECT tf.doc_id,
         CAST(round(
           ln(1.0 + (tot.n::DOUBLE - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / tot.avgdl)), 6)
         AS DECIMAL(38,12)) AS ts
  FROM tf
  JOIN dfreq ON tf.term = dfreq.term
  JOIN lens ON tf.doc_id = lens.doc_id
  CROSS JOIN tot
),
scored AS (
  SELECT doc_id, round(CAST(SUM(ts) AS DOUBLE), 6) AS score
  FROM per_term GROUP BY doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER)
         AS rank
FROM scored QUALIFY rank <= 10
"""

    o["value_percentiles"] = """
SELECT event_type,
       round(quantile_cont(value::DOUBLE, 0.25), 6) AS p25,
       round(quantile_cont(value::DOUBLE, 0.5), 6) AS p50,
       round(quantile_cont(value::DOUBLE, 0.9), 6) AS p90,
       round(quantile_cont(value::DOUBLE, 0.99), 6) AS p99,
       count(*) AS n_rows
FROM events GROUP BY event_type
"""

    # deterministic hash-order layout + running token total; the
    # engine's two-phase distributed prefix sum equals this single
    # global window by construction
    o["pack_sequences"] = f"""
WITH {TOKS_CTE},
d AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR || ':42'), 1, 15))::BIGINT % 1000000
           AS key,
         len(t) AS n_tokens
  FROM toks
),
cum AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY key, doc_id ROWS UNBOUNDED PRECEDING)
           - n_tokens AS start_offset
  FROM d
)
SELECT doc_id, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
       floor(start_offset / 2048)::BIGINT AS shard_id
FROM cum
"""

    o["user_sequences"] = """
SELECT user_id, count(*) AS n_events, min(ts) AS first_ts, max(ts) AS last_ts,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS sequence
FROM events GROUP BY user_id
"""

    o["containment_dedup"] = f"""
WITH {SHINGLE_CTE},
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT s.id_a, s.id_b,
       round(s.shared::DOUBLE / least(sa.n_sh, sb.n_sh), 6) AS containment
FROM shared s
JOIN sizes sa ON s.id_a = sa.id
JOIN sizes sb ON s.id_b = sb.id
WHERE s.shared::DOUBLE / least(sa.n_sh, sb.n_sh) >= 0.8
"""

    o["pii_redact"] = r"""
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact user' || doc_id::VARCHAR || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' from 10.0.' || (doc_id % 256)::VARCHAR || '.1'
                 ELSE '' END AS text
  FROM documents
),
counted AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
         len(regexp_extract_all(text,
             '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS n_ipv4,
         len(regexp_extract_all(text, '\+?\d[\d\-\s]{7,}\d')) AS n_phone
  FROM planted
)
SELECT doc_id, n_email, n_ipv4, n_phone,
       substr(
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IPV4]', 'g'),
           '\+?\d[\d\-\s]{7,}\d', '[PHONE]', 'g'),
         1, 80) AS head
FROM counted
"""

    o["graph_describe"] = f"""
WITH {GRAPH_CTE}
SELECT
  (SELECT count(*) FROM nodes) AS n_nodes,
  (SELECT count(*) FROM edges) AS n_edges,
  (SELECT count(*) FROM (SELECT DISTINCT source, target FROM edges)) AS n_distinct_pairs,
  (SELECT CAST(coalesce(sum(CASE WHEN source = target THEN 1 ELSE 0 END), 0) AS BIGINT) FROM edges) AS n_self_loops,
  (SELECT coalesce(max(d), 0) FROM (SELECT count(*) AS d FROM edges GROUP BY source)) AS max_out_degree,
  (SELECT coalesce(max(d), 0) FROM (SELECT count(*) AS d FROM edges GROUP BY target)) AS max_in_degree,
  (SELECT count(*) FROM nodes n
   WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.source = n.id OR e.target = n.id))
    AS n_isolated
"""

    o["hop_distances"] = f"""
WITH RECURSIVE {GRAPH_CTE},
heavy AS (SELECT source, target FROM edges WHERE weight > 103000),
seed AS (
  SELECT source AS id FROM edges WHERE weight > 103000
  ORDER BY weight DESC, source ASC, target ASC LIMIT 1
),
sym AS (
  SELECT source AS a, target AS b FROM heavy
  UNION
  SELECT target AS a, source AS b FROM heavy
),
walk AS (
  SELECT id, 0 AS dist FROM seed
  UNION
  SELECT s.b AS id, walk.dist + 1 AS dist
  FROM walk JOIN sym s ON s.a = walk.id
  WHERE walk.dist < 30
)
SELECT id, CAST(min(dist) AS INTEGER) AS dist FROM walk GROUP BY id
"""

    # double-sweep BFS: two recursive walks, the second seeded by the
    # (max dist, min id) argmax of the first
    o["approx_diameter"] = f"""
WITH RECURSIVE {GRAPH_CTE},
heavy AS (SELECT source, target FROM edges WHERE weight > 103000),
hn AS (
  SELECT DISTINCT id FROM (
    SELECT source AS id FROM heavy UNION ALL SELECT target FROM heavy
  )
),
seed AS (SELECT min(id) AS id FROM hn),
sym AS (
  SELECT source AS a, target AS b FROM heavy
  UNION
  SELECT target AS a, source AS b FROM heavy
),
w1 AS (
  SELECT id, 0 AS dist FROM seed
  UNION
  SELECT s.b AS id, w1.dist + 1 AS dist
  FROM w1 JOIN sym s ON s.a = w1.id
  WHERE w1.dist < 30
),
d1 AS (SELECT id, min(dist) AS dist FROM w1 GROUP BY id),
far AS (SELECT id FROM d1 ORDER BY dist DESC, id ASC LIMIT 1),
w2 AS (
  SELECT id, 0 AS dist FROM far
  UNION
  SELECT s.b AS id, w2.dist + 1 AS dist
  FROM w2 JOIN sym s ON s.a = w2.id
  WHERE w2.dist < 30
),
d2 AS (SELECT id, min(dist) AS dist FROM w2 GROUP BY id)
SELECT (SELECT id FROM seed) AS start_id,
       (SELECT id FROM far) AS peripheral_id,
       (SELECT CAST(max(dist) AS INTEGER) FROM d2) AS diameter_lower_bound
"""

    o["embedding_drift"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
a AS (SELECT * FROM e WHERE vec_id % 2 = 0),
b AS (SELECT * FROM e WHERE vec_id % 2 = 1),
da AS (
  SELECT CAST(unnest(range(0, len(emb))) AS INTEGER) AS pos,
         unnest(emb) AS val FROM a
),
db AS (
  SELECT CAST(unnest(range(0, len(emb))) AS INTEGER) AS pos,
         unnest(emb) AS val FROM b
),
ma AS (SELECT pos, avg(val) AS m_a FROM da GROUP BY pos),
mb AS (SELECT pos, avg(val) AS m_b FROM db GROUP BY pos),
dims AS (SELECT ma.pos, m_a, m_b FROM ma JOIN mb ON ma.pos = mb.pos),
stats AS (
  SELECT sqrt(sum((m_a - m_b) * (m_a - m_b))) AS centroid_l2,
         sum(m_a * m_b)
           / (sqrt(sum(m_a * m_a)) * sqrt(sum(m_b * m_b))) AS centroid_cosine
  FROM dims
),
ca AS (
  SELECT count(*) AS n_a,
         avg(sqrt(list_dot_product(emb, emb))) AS norm_a FROM a
),
cb AS (
  SELECT count(*) AS n_b,
         avg(sqrt(list_dot_product(emb, emb))) AS norm_b FROM b
)
SELECT n_a, n_b,
       round(centroid_l2, 6) AS centroid_l2,
       round(centroid_cosine, 6) AS centroid_cosine,
       round(norm_a / norm_b, 6) AS norm_ratio
FROM stats, ca, cb
"""

    # unrolled fixed-iteration peel: fixpoint measured at 3 rounds on
    # the sf0.01 heavy subgraph; 6 gives margin (extra rounds are
    # no-ops once converged, so over-unrolling is always safe)
    _kc = [
        "und AS (SELECT DISTINCT least(source, target) AS u,"
        " greatest(source, target) AS v FROM heavy WHERE source != target)",
        "nb0 AS (SELECT u AS id, v AS nb FROM und"
        " UNION ALL SELECT v AS id, u AS nb FROM und)",
    ]
    for _i in range(6):
        _kc.append(
            f"k{_i + 1} AS (SELECT id FROM (SELECT id, count(*) AS c"
            f" FROM nb{_i} GROUP BY id) WHERE c >= 2)"
        )
        _kc.append(
            f"nb{_i + 1} AS (SELECT nb{_i}.id, nb{_i}.nb FROM nb{_i}"
            f" WHERE nb{_i}.id IN (SELECT id FROM k{_i + 1})"
            f" AND nb{_i}.nb IN (SELECT id FROM k{_i + 1}))"
        )
    o["k_core"] = (
        f"WITH {GRAPH_CTE},\n"
        "heavy AS (SELECT source, target FROM edges WHERE weight > 103000),\n"
        + ",\n".join(_kc)
        + "\nSELECT id, count(*) AS core_degree FROM nb6 GROUP BY id"
        " HAVING count(*) >= 2"
    )

    o["link_prediction"] = f"""
WITH {GRAPH_CTE},
e AS (
  SELECT DISTINCT least(source, target) AS u, greatest(source, target) AS v
  FROM edges WHERE source != target
),
nb AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v AS w, u AS x FROM e),
deg AS (SELECT x AS id, count(*) AS deg FROM nb GROUP BY x),
centers AS (
  SELECT nb.w, nb.x FROM nb JOIN deg ON deg.id = nb.w WHERE deg.deg <= 50
),
wd AS (SELECT c.w, c.x, d.deg AS wdeg FROM centers c JOIN deg d ON d.id = c.w),
pairs AS (
  SELECT t1.x AS a, t2.x AS b, count(*) AS n_common,
         sum(1.0 / ln(t1.wdeg)) AS aa
  FROM wd t1 JOIN wd t2 ON t1.w = t2.w AND t1.x < t2.x
  GROUP BY t1.x, t2.x
  HAVING count(*) >= 2
),
nonadj AS (
  SELECT p.* FROM pairs p
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = p.a AND e.v = p.b)
)
SELECT a AS source, b AS candidate, n_common,
       round(n_common / CAST(da.deg + db.deg - n_common AS DOUBLE), 6)
         AS jaccard,
       round(aa, 6) AS adamic_adar
FROM nonadj JOIN deg da ON da.id = a JOIN deg db ON db.id = b
"""

    o["dedup_chunks"] = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
nch AS (
  SELECT doc_id, t, CAST(ceil(len(t) / 20.0) AS INTEGER) AS n_chunks FROM tok
),
ch AS (SELECT doc_id, n_chunks, unnest(range(0, n_chunks)) AS pos, t FROM nch),
chunks AS (
  SELECT doc_id, CAST(pos AS INTEGER) AS pos,
         array_to_string(t[(pos * 20 + 1):(pos * 20 + 20)], ' ') AS chunk
  FROM ch
),
first AS (
  SELECT chunk, min(doc_id * 100000 + pos) AS fo FROM chunks GROUP BY chunk
),
kept AS (
  SELECT c.doc_id, c.pos, c.chunk FROM chunks c
  JOIN first f ON f.chunk = c.chunk AND c.doc_id * 100000 + c.pos = f.fo
),
agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(chunk, ' ' ORDER BY pos) AS text_deduped
  FROM kept GROUP BY doc_id
)
SELECT n.doc_id, n.n_chunks, CAST(coalesce(a.n_kept, 0) AS INTEGER) AS n_kept,
       substr(coalesce(a.text_deduped, ''), 1, 120) AS head
FROM nch n LEFT JOIN agg a USING (doc_id)
"""

    o["label_centroids"] = """
WITH longf AS (
  SELECT label,
         CAST(unnest(range(0, len(embedding))) AS INTEGER) AS pos,
         unnest(embedding) AS val
  FROM embeddings
)
SELECT label, count(*) AS n_vectors, pos,
       round(avg(CAST(val AS DOUBLE)), 6) AS c
FROM longf GROUP BY label, pos
"""

    o["ngram_decontaminate"] = f"""
WITH {TOKS_CTE},
lab AS (
  SELECT doc_id,
         CASE WHEN {BUCKET} < 200000 THEN 'test' ELSE 'train' END AS split
  FROM documents
),
idx AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(len(t) - 3, 1))) AS i
  FROM toks
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+3], ' ') AS gram FROM idx
),
cg AS (
  SELECT g.doc_id, g.gram FROM grams g
  JOIN lab l USING (doc_id) WHERE l.split = 'train'
),
eg AS (
  SELECT g.doc_id AS eval_id, g.gram FROM grams g
  JOIN lab l USING (doc_id) WHERE l.split = 'test'
)
SELECT cg.doc_id,
       count(DISTINCT cg.gram) AS n_shared_grams,
       count(DISTINCT eg.eval_id) AS n_eval_docs
FROM cg JOIN eg ON eg.gram = cg.gram
GROUP BY cg.doc_id
"""

    o["exact_substring_decontaminate"] = f"""
WITH {TOKS_CTE.strip().rstrip()},
lab AS (
  SELECT doc_id,
         CASE WHEN {BUCKET} < 200000 THEN 'test' ELSE 'train' END AS split
  FROM documents
),
cidx AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(len(t) - 24, 1), 26)) AS i
  FROM toks
),
eidx AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(len(t) - 24, 1))) AS i
  FROM toks
),
cfp AS (
  SELECT DISTINCT c.doc_id, md5(array_to_string(t[i:i+24], ' ')) AS fp
  FROM cidx c JOIN lab l USING (doc_id) WHERE l.split = 'train'
),
efp AS (
  SELECT DISTINCT e.doc_id AS eval_id, md5(array_to_string(t[i:i+24], ' ')) AS fp
  FROM eidx e JOIN lab l USING (doc_id) WHERE l.split = 'test'
)
SELECT cfp.doc_id,
       count(DISTINCT cfp.fp) AS n_shared_windows,
       count(DISTINCT efp.eval_id) AS n_eval_docs
FROM cfp JOIN efp USING (fp)
GROUP BY cfp.doc_id
"""

    # cross-document duplicate 8-gram fraction: per-doc gram tf with
    # multiplicity, gram df over the tf table, dup share at 6 dp;
    # truncated single gram for docs shorter than 8 tokens (mirrors
    # _grams_expr)
    o["dup_ngram_fraction"] = f"""
WITH {TOKS_CTE.strip().rstrip()},
idx AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(len(t) - 7, 1))) AS i
  FROM toks
),
g AS (
  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS gram FROM idx
),
tf AS (
  SELECT doc_id, gram, count(*) AS c FROM g
  WHERE length(trim(gram)) > 0 GROUP BY 1, 2
),
dfreq AS (SELECT gram, count(*) AS df FROM tf GROUP BY gram),
agg AS (
  SELECT tf.doc_id, SUM(tf.c) AS n_grams,
         SUM(CASE WHEN dfreq.df >= 2 THEN tf.c ELSE 0 END) AS dup
  FROM tf JOIN dfreq USING (gram) GROUP BY tf.doc_id
)
SELECT d.doc_id, CAST(coalesce(agg.n_grams, 0) AS BIGINT) AS n_grams,
       round(agg.dup / agg.n_grams, 6) AS dup_frac
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""

    o["cap_per_group"] = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source ORDER BY {BUCKET} ASC, doc_id ASC
         ) AS rn
  FROM documents
) WHERE rn <= 15
"""

    # personalized PageRank: same unrolled scaled-long scheme as
    # o["pagerank"], with restart mass and init concentrated on the
    # seed set {{1,2,3}} instead of uniform over nodes
    _seed_base = "CASE WHEN n.id IN (1, 2, 3) THEN (1 - 0.85) / 3 ELSE 0 END"
    ppr_iters = "".join(
        f""",
pc{i} AS (
  SELECT e.target AS id,
         SUM(floor(p.pr / d.w_out * 1e18)::BIGINT) AS s
  FROM edges e
  JOIN ppr{i - 1} p ON e.source = p.id
  JOIN deg d ON e.source = d.source
  GROUP BY e.target
),
ppr{i} AS (
  SELECT n.id,
         round({_seed_base}
               + 0.85 * (coalesce(pc{i}.s, 0) / 1e18), 12) AS pr
  FROM nodes n LEFT JOIN pc{i} ON n.id = pc{i}.id
)"""
        for i in range(1, PAGERANK_ITERS + 1)
    )
    pprb_iters = "".join(
        f""",
bc{i} AS (
  SELECT p.seed, e.target AS id,
         SUM(floor(p.pr / d.w_out * 1e18)::BIGINT) AS s
  FROM edges e
  JOIN pprb{i - 1} p ON e.source = p.id
  JOIN deg d ON e.source = d.source
  GROUP BY p.seed, e.target
),
pprb{i} AS (
  SELECT seed, id, round(sum(v), 12) AS pr FROM (
    SELECT seed, id, 0.85 * (s / 1e18) AS v FROM bc{i}
    UNION ALL
    SELECT id AS seed, id, 0.15 AS v FROM nodes WHERE id IN (1, 2, 3)
  ) GROUP BY seed, id
  HAVING round(sum(v), 12) > 0
)"""
        for i in range(1, PAGERANK_ITERS + 1)
    )
    o["pagerank_personalized_batch"] = f"""
WITH {GRAPH_CTE},
deg AS (SELECT source, count(*) AS w_out FROM edges GROUP BY source),
pprb0 AS (SELECT id AS seed, id, 1.0 AS pr FROM nodes WHERE id IN (1, 2, 3))
{pprb_iters}
SELECT seed, id, round(pr, 6) AS pagerank FROM pprb{PAGERANK_ITERS}
"""

    o["pagerank_personalized"] = f"""
WITH {GRAPH_CTE},
deg AS (SELECT source, count(*) AS w_out FROM edges GROUP BY source),
ppr0 AS (
  SELECT id, CASE WHEN id IN (1, 2, 3) THEN 1.0 / 3 ELSE 0 END AS pr
  FROM nodes
)
{ppr_iters}
SELECT id, round(pr, 6) AS pagerank FROM ppr{PAGERANK_ITERS}
"""

    # centered Gram: the scaled-long floor/sum scheme keeps every
    # partial order-independent and engine-exact (see similarity.py)
    o["embedding_gram"] = """
WITH longf AS (
  SELECT vec_id,
         CAST(unnest(range(0, len(embedding))) AS INTEGER) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
sums AS (SELECT i, SUM(floor(x * 1e12)::BIGINT) AS s FROM longf GROUP BY i),
means AS (
  SELECT i, s / 1e12 / (SELECT count(*) FROM embeddings) AS m FROM sums
),
a AS (
  SELECT l.vec_id, l.i, l.x - m.m AS cx FROM longf l JOIN means m USING (i)
)
SELECT a.i, b.i AS j,
       round(SUM(floor(a.cx * b.cx * 1e12)::BIGINT) / 1e12, 6) AS g
FROM a JOIN a AS b USING (vec_id)
GROUP BY a.i, b.i
"""

    o["graph_metrics"] = f"""
WITH {GRAPH_CTE},
pairs AS (SELECT DISTINCT source, target FROM edges WHERE source != target),
und AS (
  SELECT DISTINCT least(source, target) AS u, greatest(source, target) AS v
  FROM pairs
),
sym AS (SELECT u AS a, v AS b FROM und UNION ALL SELECT v AS a, u AS b FROM und),
deg AS (SELECT a AS id, count(*) AS deg FROM sym GROUP BY a),
de AS (
  SELECT da.deg AS da, db.deg AS db
  FROM sym s JOIN deg da ON da.id = s.a JOIN deg db ON db.id = s.b
),
nn AS (SELECT count(*) AS n FROM nodes),
mm AS (SELECT count(*) AS m FROM pairs),
recip AS (
  SELECT count(*) AS r FROM pairs p
  WHERE EXISTS (
    SELECT 1 FROM pairs q WHERE q.source = p.target AND q.target = p.source
  )
)
SELECT
  round((SELECT m FROM mm) / CAST((SELECT n FROM nn) * ((SELECT n FROM nn) - 1) AS DOUBLE), 6) AS density,
  round((SELECT r FROM recip) / CAST((SELECT m FROM mm) AS DOUBLE), 6) AS reciprocity,
  (SELECT round(corr(da, db), 6) FROM de) AS assortativity,
  round((SELECT sum(deg) FROM deg) / CAST((SELECT n FROM nn) AS DOUBLE), 6) AS avg_degree
"""

    o["inter_event_stats"] = """
WITH gapped AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ) AS gap_us
  FROM events
)
SELECT user_id, count(*) AS n_events,
       round(sum(gap_us) / count(gap_us) / 1e6, 6) AS mean_gap_s,
       round(max(gap_us) / 1e6, 6) AS max_gap_s
FROM gapped GROUP BY user_id
"""

    o["funnel"] = """
WITH a AS (
  SELECT user_id AS u, epoch_us(ts) AS ta FROM events WHERE event_type = 'click'
),
b AS (
  SELECT user_id AS u, epoch_us(ts) AS tb FROM events WHERE event_type = 'purchase'
),
conv AS (
  SELECT DISTINCT a.u FROM a JOIN b ON a.u = b.u
  WHERE b.tb > a.ta AND b.tb - a.ta <= 3600000000::BIGINT
)
SELECT (SELECT count(DISTINCT u) FROM a) AS n_step1_users,
       (SELECT count(*) FROM conv) AS n_converted,
       round((SELECT count(*) FROM conv)
             / CAST((SELECT count(DISTINCT u) FROM a) AS DOUBLE), 6)
         AS conversion_rate
"""

    o["local_clustering"] = """
WITH e AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM documents a JOIN documents b
    ON a.doc_id % 7 = b.doc_id % 7 AND a.doc_id < b.doc_id
  WHERE a.doc_id < 450 AND b.doc_id < 450
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
),
corners AS (
  SELECT a AS id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, count(*) AS triangles FROM corners GROUP BY id),
degs AS (
  SELECT id, count(*) AS deg FROM (
    SELECT u AS id FROM e UNION ALL SELECT v FROM e
  ) GROUP BY id
)
SELECT d.doc_id AS id, coalesce(cnt.triangles, 0) AS triangles,
       CASE WHEN coalesce(degs.deg, 0) >= 2
            THEN round(coalesce(cnt.triangles, 0)
                       / (degs.deg * (degs.deg - 1) / 2.0), 6)
            ELSE 0.0 END AS clustering
FROM documents d
LEFT JOIN cnt ON d.doc_id = cnt.id
LEFT JOIN degs ON d.doc_id = degs.id
"""

    # leakage-safe split: same recursive closure as dedup_clusters,
    # then the md5 bucket CASE applied to the CLUSTER id (seed 7)
    _CLUSTER_BUCKET = (
        "('0x' || substr(md5(cluster_id::VARCHAR || ':7'), 1, 15))::BIGINT"
        " % 1000000"
    )
    o["split_by_cluster"] = f"""
WITH RECURSIVE {SHINGLE_CTE},
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY a.id, b.id
),
pairs AS (
  SELECT s.id_a, s.id_b FROM shared s
  JOIN sizes sa ON s.id_a = sa.id
  JOIN sizes sb ON s.id_b = sb.id
  WHERE s.shared::DOUBLE / (sa.n_sh + sb.n_sh - s.shared) >= 0.5
),
sym AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r
),
clusters AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, cluster_id,
       CASE WHEN {_CLUSTER_BUCKET} < 200000 THEN 'test' ELSE 'train' END
         AS split
FROM clusters
"""

    # -- round-5 pipeline ops ----------------------------------------------
    o["dedup_lines"] = """
WITH lines AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS line,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents
),
normed AS (
  SELECT doc_id, pos, line,
         trim(regexp_replace(lower(line), '\\s+', ' ', 'g')) AS norm
  FROM lines
),
boiler AS (
  SELECT norm FROM normed WHERE norm <> ''
  GROUP BY norm HAVING count(DISTINCT doc_id) >= 400
)
SELECT n.doc_id,
       coalesce(
         string_agg(CASE WHEN b.norm IS NULL THEN n.line END, ' '
                    ORDER BY n.pos), '') AS text,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN b.norm IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed
FROM normed n LEFT JOIN boiler b ON n.norm = b.norm
GROUP BY n.doc_id
"""

    o["chunk_documents"] = """
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents
),
s AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(len(toks) - 1, 0) + 1, 24)) AS start
  FROM t
)
SELECT doc_id,
       (start // 24)::BIGINT AS chunk_id,
       array_to_string(list_slice(toks, start + 1, start + 32), ' ')
         AS chunk_text,
       least(len(toks) - start, 32)::INT AS n_tokens
FROM s
"""

    _mix_values = ", ".join(
        f"('src{i}', {2.0 if i < 5 else 1.0})" for i in range(20)
    )
    o["mix_domains"] = f"""
WITH w(source, wt) AS (VALUES {_mix_values}),
c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
r AS (SELECT c.source, c.n, w.wt FROM c JOIN w USING (source)),
cs AS (SELECT min(n / wt) AS cstar FROM r),
thr AS (
  SELECT source, floor(cstar * wt / n * 1000000)::BIGINT AS t FROM r, cs
)
SELECT d.doc_id, d.source
FROM documents d JOIN thr USING (source)
WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || ':42'), 1, 15))::BIGINT
      % 1000000 < thr.t
"""

    o["global_shuffle"] = """
SELECT doc_id, md5(doc_id::VARCHAR || ':7') AS shuffle_key FROM documents
"""

    o["filter_by_percentile"] = """
SELECT doc_id, n_chars FROM documents
WHERE n_chars >= (SELECT quantile_cont(n_chars, 0.75) FROM documents)
"""

    o["semantic_dedup"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
seeds AS (
  SELECT vec_id AS sid, emb AS semb FROM e ORDER BY vec_id LIMIT 8
),
scored AS (
  SELECT e.vec_id, e.emb, s.sid,
         round(list_dot_product(e.emb, s.semb)
               / (sqrt(list_dot_product(e.emb, e.emb))
                  * sqrt(list_dot_product(s.semb, s.semb))), 6) AS sim
  FROM e, seeds s
),
assigned AS (
  SELECT vec_id, emb, sid AS cluster FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY sim DESC, sid ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster AS cluster,
       round(list_dot_product(a.emb, b.emb)
             / (sqrt(list_dot_product(a.emb, a.emb))
                * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cosine
FROM assigned a
JOIN assigned b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.emb, b.emb)
            / (sqrt(list_dot_product(a.emb, a.emb))
               * sqrt(list_dot_product(b.emb, b.emb))), 6) >= 0.35
"""

    # Arrow scorer rounds half-up like the SQL: same oracle verbatim
    o["semantic_dedup_arrow"] = o["semantic_dedup"]

    # unrolled synchronous Bellman-Ford: 8 rounds matched to the
    # entry's max_rounds (rounds past convergence are no-ops)
    _sp = [
        "heavy AS (SELECT source, target, weight FROM edges"
        " WHERE weight > 103000)",
        "seed AS (SELECT source AS id FROM edges WHERE weight > 103000"
        " ORDER BY weight DESC, source ASC, target ASC LIMIT 1)",
        "bidir AS (SELECT source, target, weight AS w FROM heavy"
        " UNION ALL SELECT target, source, weight FROM heavy)",
        "e AS (SELECT source, target, min(w) AS w FROM bidir"
        " GROUP BY source, target)",
        "d0 AS (SELECT id, 0.0 AS dist FROM seed)",
    ]
    for _i in range(8):
        _sp.append(
            f"d{_i + 1} AS (SELECT id, min(dist) AS dist FROM ("
            f"SELECT e.target AS id, d{_i}.dist + e.w AS dist"
            f" FROM d{_i} JOIN e ON e.source = d{_i}.id"
            f" UNION ALL SELECT id, dist FROM d{_i}) GROUP BY id)"
        )
    o["shortest_paths"] = (
        f"WITH {GRAPH_CTE.strip().rstrip()}, "
        + ", ".join(_sp)
        + " SELECT id, round(dist, 6) AS dist FROM d8"
    )

    # unrolled 2-round deterministic LPA on the doc-clique graph
    _lp = [
        "eg AS (SELECT a.doc_id AS u, b.doc_id AS v FROM documents a"
        " JOIN documents b ON a.doc_id % 7 = b.doc_id % 7"
        " AND a.doc_id < b.doc_id"
        " WHERE a.doc_id < 450 AND b.doc_id < 450)",
        "sym AS (SELECT u AS source, v AS target FROM eg"
        " UNION SELECT v, u FROM eg)",
        "l0 AS (SELECT doc_id AS id, doc_id AS community FROM documents)",
    ]
    for _i in range(2):
        _lp.append(
            f"v{_i + 1} AS (SELECT id, nb, count(*) AS n FROM ("
            f"SELECT s.target AS id, l{_i}.community AS nb"
            f" FROM sym s JOIN l{_i} ON s.source = l{_i}.id"
            f" UNION ALL SELECT id, community FROM l{_i}"
            f") GROUP BY 1, 2)"
        )
        _lp.append(
            f"w{_i + 1} AS (SELECT id, nb FROM (SELECT id, nb, row_number()"
            f" OVER (PARTITION BY id ORDER BY n DESC, nb ASC) AS rn"
            f" FROM v{_i + 1}) WHERE rn = 1)"
        )
        _lp.append(
            f"l{_i + 1} AS (SELECT l{_i}.id,"
            f" coalesce(w{_i + 1}.nb, l{_i}.community) AS community"
            f" FROM l{_i} LEFT JOIN w{_i + 1} ON l{_i}.id = w{_i + 1}.id)"
        )
    o["label_propagation"] = (
        "WITH " + ", ".join(_lp) + " SELECT id, community FROM l2"
    )

    # one unrolled Louvain local-move round on the doc-clique graph
    # seeded with the adversarial id%3 partition: the EXACT integer
    # gain test 2m(k_vb-k_va) - deg(vol_b-vol_a+deg) > 0 (HUGEINT),
    # smallest-community tie-break, then the round-level accept
    # comparing exact scaled modularity 2m*internal_ordered - sum vol^2
    o["modularity_refine"] = """
WITH eg AS MATERIALIZED (
  SELECT a.doc_id AS u, b.doc_id AS v FROM documents a
  JOIN documents b ON a.doc_id % 7 = b.doc_id % 7 AND a.doc_id < b.doc_id
  WHERE a.doc_id < 450 AND b.doc_id < 450
),
sym AS MATERIALIZED (SELECT u AS source, v AS target FROM eg UNION SELECT v, u FROM eg),
l0 AS MATERIALIZED (SELECT doc_id AS id, doc_id % 3 AS community FROM documents),
deg AS MATERIALIZED (SELECT source AS id, count(*) AS deg FROM sym GROUP BY 1),
m2 AS MATERIALIZED (SELECT count(*) AS m2 FROM sym),
vol AS MATERIALIZED (
  SELECT l0.community, coalesce(sum(deg.deg), 0) AS vol
  FROM l0 LEFT JOIN deg ON l0.id = deg.id GROUP BY 1
),
kvc AS MATERIALIZED (
  SELECT s.target AS id, l0.community AS nc, count(*) AS k
  FROM sym s JOIN l0 ON s.source = l0.id GROUP BY 1, 2
),
base AS MATERIALIZED (
  SELECT l0.id, l0.community, coalesce(deg.deg, 0) AS deg,
         coalesce(ka.k, 0) AS ka, va.vol AS vola
  FROM l0
  LEFT JOIN deg ON l0.id = deg.id
  LEFT JOIN kvc ka ON ka.id = l0.id AND ka.nc = l0.community
  JOIN vol va ON va.community = l0.community
),
cand AS MATERIALIZED (
  SELECT b.id, k.nc,
         CAST(m2.m2 AS HUGEINT) * (k.k - b.ka)
           - CAST(b.deg AS HUGEINT) * (vb.vol - b.vola + b.deg) AS gain
  FROM base b
  JOIN kvc k ON k.id = b.id AND k.nc <> b.community
  JOIN vol vb ON vb.community = k.nc
  CROSS JOIN m2
),
moves AS MATERIALIZED (
  SELECT id, nc FROM (
    SELECT id, nc, row_number()
      OVER (PARTITION BY id ORDER BY gain DESC, nc ASC) AS rn
    FROM cand WHERE gain > 0
  ) WHERE rn = 1
),
l1 AS MATERIALIZED (
  SELECT l0.id, coalesce(m.nc, l0.community) AS community
  FROM l0 LEFT JOIN moves m ON l0.id = m.id
),
int0 AS MATERIALIZED (
  SELECT count(*) AS c FROM sym s
  JOIN l0 a ON s.source = a.id JOIN l0 b ON s.target = b.id
  WHERE a.community = b.community
),
q0 AS MATERIALIZED (
  SELECT CAST(m2.m2 AS HUGEINT) * int0.c
         - (SELECT coalesce(sum(CAST(vol AS HUGEINT) * vol), 0) FROM vol)
         AS q
  FROM m2, int0
),
vol1 AS MATERIALIZED (
  SELECT l1.community, coalesce(sum(deg.deg), 0) AS vol
  FROM l1 LEFT JOIN deg ON l1.id = deg.id GROUP BY 1
),
int1 AS MATERIALIZED (
  SELECT count(*) AS c FROM sym s
  JOIN l1 a ON s.source = a.id JOIN l1 b ON s.target = b.id
  WHERE a.community = b.community
),
q1 AS MATERIALIZED (
  SELECT CAST(m2.m2 AS HUGEINT) * int1.c
         - (SELECT coalesce(sum(CAST(vol AS HUGEINT) * vol), 0) FROM vol1)
         AS q
  FROM m2, int1
)
SELECT l1.id,
       CASE WHEN q1.q >= q0.q THEN l1.community ELSE l0.community END
         AS community
FROM l1 JOIN l0 ON l1.id = l0.id CROSS JOIN q0 CROSS JOIN q1
"""

    # two-level Louvain, fully unrolled and parametrized by the
    # level-1 edge-weight expression (unweighted = literal 1;
    # weighted = 1e-6-quantized integer units, mirroring the Spark
    # quantization): phase 1, aggregation into a weighted supergraph
    # WITH self-loop rows, phase 2, label composition.  All HUGEINT.
    def _louvain_oracle(wexpr: str) -> str:
        return """
WITH eg AS (
  SELECT a.doc_id AS u, b.doc_id AS v, {wexpr} AS w FROM documents a
  JOIN documents b ON a.doc_id % 7 = b.doc_id % 7 AND a.doc_id < b.doc_id
  WHERE a.doc_id < 450 AND b.doc_id < 450
),
sym AS MATERIALIZED (SELECT u AS source, v AS target, w FROM eg
       UNION SELECT v, u, w FROM eg),
m2 AS MATERIALIZED (SELECT sum(w) AS m2 FROM sym),
l0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS community FROM documents),
deg AS MATERIALIZED (SELECT source AS id, sum(w) AS deg FROM sym GROUP BY 1),
vol0 AS MATERIALIZED (
  SELECT l0.community, coalesce(sum(deg.deg), 0) AS vol
  FROM l0 LEFT JOIN deg ON l0.id = deg.id GROUP BY 1
),
kvc AS MATERIALIZED (
  SELECT s.target AS id, l0.community AS nc, sum(s.w) AS k
  FROM sym s JOIN l0 ON s.source = l0.id GROUP BY 1, 2
),
base AS MATERIALIZED (
  SELECT l0.id, l0.community, coalesce(deg.deg, 0) AS deg,
         coalesce(ka.k, 0) AS ka, va.vol AS vola
  FROM l0
  LEFT JOIN deg ON l0.id = deg.id
  LEFT JOIN kvc ka ON ka.id = l0.id AND ka.nc = l0.community
  JOIN vol0 va ON va.community = l0.community
),
cand AS MATERIALIZED (
  SELECT b.id, k.nc,
         CAST(m2.m2 AS HUGEINT) * (k.k - b.ka)
           - CAST(b.deg AS HUGEINT) * (vb.vol - b.vola + b.deg) AS gain
  FROM base b
  JOIN kvc k ON k.id = b.id AND k.nc < b.community
  JOIN vol0 vb ON vb.community = k.nc
  CROSS JOIN m2
),
moves AS MATERIALIZED (
  SELECT id, nc FROM (
    SELECT id, nc, row_number()
      OVER (PARTITION BY id ORDER BY gain DESC, nc ASC) AS rn
    FROM cand WHERE gain > 0
  ) WHERE rn = 1
),
l1 AS MATERIALIZED (
  SELECT l0.id, coalesce(m.nc, l0.community) AS community
  FROM l0 LEFT JOIN moves m ON l0.id = m.id
),
int0 AS MATERIALIZED (
  SELECT coalesce(sum(s.w), 0) AS c FROM sym s
  JOIN l0 a ON s.source = a.id JOIN l0 b ON s.target = b.id
  WHERE a.community = b.community
),
q0 AS MATERIALIZED (
  SELECT CAST(m2.m2 AS HUGEINT) * int0.c
         - (SELECT coalesce(sum(CAST(vol AS HUGEINT) * vol), 0) FROM vol0)
         AS q
  FROM m2, int0
),
vol1 AS MATERIALIZED (
  SELECT l1.community, coalesce(sum(deg.deg), 0) AS vol
  FROM l1 LEFT JOIN deg ON l1.id = deg.id GROUP BY 1
),
int1 AS MATERIALIZED (
  SELECT coalesce(sum(s.w), 0) AS c FROM sym s
  JOIN l1 a ON s.source = a.id JOIN l1 b ON s.target = b.id
  WHERE a.community = b.community
),
q1 AS MATERIALIZED (
  SELECT CAST(m2.m2 AS HUGEINT) * int1.c
         - (SELECT coalesce(sum(CAST(vol AS HUGEINT) * vol), 0) FROM vol1)
         AS q
  FROM m2, int1
),
a1 AS MATERIALIZED (
  SELECT l1.id,
         CASE WHEN q1.q >= q0.q THEN l1.community ELSE l0.community END
           AS community
  FROM l1 JOIN l0 ON l1.id = l0.id CROSS JOIN q0 CROSS JOIN q1
),
w2 AS MATERIALIZED (
  SELECT a.community AS source, b.community AS target,
         CAST(sum(s.w) AS HUGEINT) AS w
  FROM sym s
  JOIN a1 a ON s.source = a.id JOIN a1 b ON s.target = b.id
  GROUP BY 1, 2
),
n2 AS MATERIALIZED (SELECT DISTINCT community AS id FROM a1),
l20 AS MATERIALIZED (SELECT id, id AS community FROM n2),
deg2 AS MATERIALIZED (SELECT source AS id, sum(w) AS deg FROM w2 GROUP BY 1),
cross2 AS MATERIALIZED (SELECT source, target, w FROM w2 WHERE source <> target),
vol20 AS MATERIALIZED (
  SELECT l20.community, coalesce(sum(deg2.deg), 0) AS vol
  FROM l20 LEFT JOIN deg2 ON l20.id = deg2.id GROUP BY 1
),
kvc2 AS MATERIALIZED (
  SELECT s.target AS id, l20.community AS nc, sum(s.w) AS k
  FROM cross2 s JOIN l20 ON s.source = l20.id GROUP BY 1, 2
),
base2 AS MATERIALIZED (
  SELECT l20.id, l20.community, coalesce(deg2.deg, 0) AS deg,
         coalesce(ka.k, 0) AS ka, va.vol AS vola
  FROM l20
  LEFT JOIN deg2 ON l20.id = deg2.id
  LEFT JOIN kvc2 ka ON ka.id = l20.id AND ka.nc = l20.community
  JOIN vol20 va ON va.community = l20.community
),
cand2 AS MATERIALIZED (
  SELECT b.id, k.nc,
         CAST(m2.m2 AS HUGEINT) * (k.k - b.ka)
           - CAST(b.deg AS HUGEINT) * (vb.vol - b.vola + b.deg) AS gain
  FROM base2 b
  JOIN kvc2 k ON k.id = b.id AND k.nc < b.community
  JOIN vol20 vb ON vb.community = k.nc
  CROSS JOIN m2
),
moves2 AS MATERIALIZED (
  SELECT id, nc FROM (
    SELECT id, nc, row_number()
      OVER (PARTITION BY id ORDER BY gain DESC, nc ASC) AS rn
    FROM cand2 WHERE gain > 0
  ) WHERE rn = 1
),
l21 AS MATERIALIZED (
  SELECT l20.id, coalesce(m.nc, l20.community) AS community
  FROM l20 LEFT JOIN moves2 m ON l20.id = m.id
),
int20 AS MATERIALIZED (
  SELECT coalesce(sum(s.w), 0) AS c FROM w2 s
  JOIN l20 a ON s.source = a.id JOIN l20 b ON s.target = b.id
  WHERE a.community = b.community
),
q20 AS MATERIALIZED (
  SELECT CAST(m2.m2 AS HUGEINT) * int20.c
         - (SELECT coalesce(sum(CAST(vol AS HUGEINT) * vol), 0) FROM vol20)
         AS q
  FROM m2, int20
),
vol21 AS MATERIALIZED (
  SELECT l21.community, coalesce(sum(deg2.deg), 0) AS vol
  FROM l21 LEFT JOIN deg2 ON l21.id = deg2.id GROUP BY 1
),
int21 AS MATERIALIZED (
  SELECT coalesce(sum(s.w), 0) AS c FROM w2 s
  JOIN l21 a ON s.source = a.id JOIN l21 b ON s.target = b.id
  WHERE a.community = b.community
),
q21 AS MATERIALIZED (
  SELECT CAST(m2.m2 AS HUGEINT) * int21.c
         - (SELECT coalesce(sum(CAST(vol AS HUGEINT) * vol), 0) FROM vol21)
         AS q
  FROM m2, int21
),
a2 AS MATERIALIZED (
  SELECT l21.id,
         CASE WHEN q21.q >= q20.q THEN l21.community ELSE l20.community END
           AS community
  FROM l21 JOIN l20 ON l21.id = l20.id CROSS JOIN q20 CROSS JOIN q21
)
SELECT a1.id, a2.community
FROM a1 JOIN a2 ON a1.community = a2.id
""".format(wexpr=wexpr)

    o["louvain_communities"] = _louvain_oracle("CAST(1 AS HUGEINT)")
    # weighted twin: integer weights 1..5 from the endpoint ids,
    # scaled by 1e6 exactly as louvain_communities(weight_col=...)
    o["louvain_weighted"] = _louvain_oracle(
        "CAST(((a.doc_id + b.doc_id) % 5 + 1) * 1000000 AS HUGEINT)"
    )

    # Leiden on the stranded-leaves gadget graph: the Louvain
    # two-level unroll (same phase CTE shapes as _louvain_oracle)
    # with a connected-component REFINEMENT after each phase —
    # intra-community edges only, min-member-id labels via a
    # recursive reachability CTE (UNION dedup terminates it; min
    # over reachable ids = component min because sym is
    # symmetric).  Weights are pre-scaled by 1e6 exactly as
    # leiden_communities(weight_col=...) quantizes.
    o["leiden_communities"] = """
WITH RECURSIVE
hubs AS MATERIALIZED (
  SELECT doc_id AS h FROM documents WHERE doc_id < 400 AND doc_id % 4 = 1
),
eg AS MATERIALIZED (
  SELECT h AS u, h - 1 AS v, CAST(10000000 AS HUGEINT) AS w FROM hubs
  UNION ALL SELECT h, h + 1, CAST(1000000 AS HUGEINT) FROM hubs
  UNION ALL SELECT h, h + 2, CAST(1000000 AS HUGEINT) FROM hubs
),
sym AS MATERIALIZED (SELECT u AS source, v AS target, w FROM eg
       UNION SELECT v, u, w FROM eg),
m2 AS MATERIALIZED (SELECT sum(w) AS m2 FROM sym),
l0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS community FROM documents),
deg AS MATERIALIZED (SELECT source AS id, sum(w) AS deg FROM sym GROUP BY 1),
vol0 AS MATERIALIZED (
  SELECT l0.community, coalesce(sum(deg.deg), 0) AS vol
  FROM l0 LEFT JOIN deg ON l0.id = deg.id GROUP BY 1
),
kvc AS MATERIALIZED (
  SELECT s.target AS id, l0.community AS nc, sum(s.w) AS k
  FROM sym s JOIN l0 ON s.source = l0.id GROUP BY 1, 2
),
base AS MATERIALIZED (
  SELECT l0.id, l0.community, coalesce(deg.deg, 0) AS deg,
         coalesce(ka.k, 0) AS ka, va.vol AS vola
  FROM l0
  LEFT JOIN deg ON l0.id = deg.id
  LEFT JOIN kvc ka ON ka.id = l0.id AND ka.nc = l0.community
  JOIN vol0 va ON va.community = l0.community
),
cand AS MATERIALIZED (
  SELECT b.id, k.nc,
         CAST(m2.m2 AS HUGEINT) * (k.k - b.ka)
           - CAST(b.deg AS HUGEINT) * (vb.vol - b.vola + b.deg) AS gain
  FROM base b
  JOIN kvc k ON k.id = b.id AND k.nc < b.community
  JOIN vol0 vb ON vb.community = k.nc
  CROSS JOIN m2
),
moves AS MATERIALIZED (
  SELECT id, nc FROM (
    SELECT id, nc, row_number()
      OVER (PARTITION BY id ORDER BY gain DESC, nc ASC) AS rn
    FROM cand WHERE gain > 0
  ) WHERE rn = 1
),
l1 AS MATERIALIZED (
  SELECT l0.id, coalesce(m.nc, l0.community) AS community
  FROM l0 LEFT JOIN moves m ON l0.id = m.id
),
int0 AS MATERIALIZED (
  SELECT coalesce(sum(s.w), 0) AS c FROM sym s
  JOIN l0 a ON s.source = a.id JOIN l0 b ON s.target = b.id
  WHERE a.community = b.community
),
q0 AS MATERIALIZED (
  SELECT CAST(m2.m2 AS HUGEINT) * int0.c
         - (SELECT coalesce(sum(CAST(vol AS HUGEINT) * vol), 0) FROM vol0)
         AS q
  FROM m2, int0
),
vol1 AS MATERIALIZED (
  SELECT l1.community, coalesce(sum(deg.deg), 0) AS vol
  FROM l1 LEFT JOIN deg ON l1.id = deg.id GROUP BY 1
),
int1 AS MATERIALIZED (
  SELECT coalesce(sum(s.w), 0) AS c FROM sym s
  JOIN l1 a ON s.source = a.id JOIN l1 b ON s.target = b.id
  WHERE a.community = b.community
),
q1 AS MATERIALIZED (
  SELECT CAST(m2.m2 AS HUGEINT) * int1.c
         - (SELECT coalesce(sum(CAST(vol AS HUGEINT) * vol), 0) FROM vol1)
         AS q
  FROM m2, int1
),
a1 AS MATERIALIZED (
  SELECT l1.id,
         CASE WHEN q1.q >= q0.q THEN l1.community ELSE l0.community END
           AS community
  FROM l1 JOIN l0 ON l1.id = l0.id CROSS JOIN q0 CROSS JOIN q1
),
intra1 AS MATERIALIZED (
  SELECT s.source, s.target FROM sym s
  JOIN a1 x ON s.source = x.id JOIN a1 y ON s.target = y.id
  WHERE x.community = y.community AND s.source <> s.target
),
reach1(id, lbl) AS (
  SELECT id, id FROM a1
  UNION
  SELECT i.target, r.lbl FROM reach1 r JOIN intra1 i ON i.source = r.id
),
r1 AS MATERIALIZED (SELECT id, min(lbl) AS community FROM reach1 GROUP BY id),
w2 AS MATERIALIZED (
  SELECT a.community AS source, b.community AS target,
         CAST(sum(s.w) AS HUGEINT) AS w
  FROM sym s
  JOIN r1 a ON s.source = a.id JOIN r1 b ON s.target = b.id
  GROUP BY 1, 2
),
n2 AS MATERIALIZED (SELECT DISTINCT community AS id FROM r1),
l20 AS MATERIALIZED (SELECT id, id AS community FROM n2),
deg2 AS MATERIALIZED (SELECT source AS id, sum(w) AS deg FROM w2 GROUP BY 1),
cross2 AS MATERIALIZED (SELECT source, target, w FROM w2 WHERE source <> target),
vol20 AS MATERIALIZED (
  SELECT l20.community, coalesce(sum(deg2.deg), 0) AS vol
  FROM l20 LEFT JOIN deg2 ON l20.id = deg2.id GROUP BY 1
),
kvc2 AS MATERIALIZED (
  SELECT s.target AS id, l20.community AS nc, sum(s.w) AS k
  FROM cross2 s JOIN l20 ON s.source = l20.id GROUP BY 1, 2
),
base2 AS MATERIALIZED (
  SELECT l20.id, l20.community, coalesce(deg2.deg, 0) AS deg,
         coalesce(ka.k, 0) AS ka, va.vol AS vola
  FROM l20
  LEFT JOIN deg2 ON l20.id = deg2.id
  LEFT JOIN kvc2 ka ON ka.id = l20.id AND ka.nc = l20.community
  JOIN vol20 va ON va.community = l20.community
),
cand2 AS MATERIALIZED (
  SELECT b.id, k.nc,
         CAST(m2.m2 AS HUGEINT) * (k.k - b.ka)
           - CAST(b.deg AS HUGEINT) * (vb.vol - b.vola + b.deg) AS gain
  FROM base2 b
  JOIN kvc2 k ON k.id = b.id AND k.nc < b.community
  JOIN vol20 vb ON vb.community = k.nc
  CROSS JOIN m2
),
moves2 AS MATERIALIZED (
  SELECT id, nc FROM (
    SELECT id, nc, row_number()
      OVER (PARTITION BY id ORDER BY gain DESC, nc ASC) AS rn
    FROM cand2 WHERE gain > 0
  ) WHERE rn = 1
),
l21 AS MATERIALIZED (
  SELECT l20.id, coalesce(m.nc, l20.community) AS community
  FROM l20 LEFT JOIN moves2 m ON l20.id = m.id
),
int20 AS MATERIALIZED (
  SELECT coalesce(sum(s.w), 0) AS c FROM w2 s
  JOIN l20 a ON s.source = a.id JOIN l20 b ON s.target = b.id
  WHERE a.community = b.community
),
q20 AS MATERIALIZED (
  SELECT CAST(m2.m2 AS HUGEINT) * int20.c
         - (SELECT coalesce(sum(CAST(vol AS HUGEINT) * vol), 0) FROM vol20)
         AS q
  FROM m2, int20
),
vol21 AS MATERIALIZED (
  SELECT l21.community, coalesce(sum(deg2.deg), 0) AS vol
  FROM l21 LEFT JOIN deg2 ON l21.id = deg2.id GROUP BY 1
),
int21 AS MATERIALIZED (
  SELECT coalesce(sum(s.w), 0) AS c FROM w2 s
  JOIN l21 a ON s.source = a.id JOIN l21 b ON s.target = b.id
  WHERE a.community = b.community
),
q21 AS MATERIALIZED (
  SELECT CAST(m2.m2 AS HUGEINT) * int21.c
         - (SELECT coalesce(sum(CAST(vol AS HUGEINT) * vol), 0) FROM vol21)
         AS q
  FROM m2, int21
),
a2 AS MATERIALIZED (
  SELECT l21.id,
         CASE WHEN q21.q >= q20.q THEN l21.community ELSE l20.community END
           AS community
  FROM l21 JOIN l20 ON l21.id = l20.id CROSS JOIN q20 CROSS JOIN q21
),
intra2 AS MATERIALIZED (
  SELECT s.source, s.target FROM cross2 s
  JOIN a2 x ON s.source = x.id JOIN a2 y ON s.target = y.id
  WHERE x.community = y.community
),
reach2(id, lbl) AS (
  SELECT id, id FROM a2
  UNION
  SELECT i.target, r.lbl FROM reach2 r JOIN intra2 i ON i.source = r.id
),
r2 AS MATERIALIZED (SELECT id, min(lbl) AS community FROM reach2 GROUP BY id)
SELECT r1.id, CAST(r2.community AS BIGINT) AS community
FROM r1 JOIN r2 ON r1.community = r2.id
"""

    # weighted LPA: same unrolled round shape, votes are exact
    # DECIMAL(28,6) weight sums over the symmetrized simple pairs
    # (parallel edges pre-accumulated); self-vote weight 0
    _lpw = [
        "und AS (SELECT least(source, target) AS source,"
        " greatest(source, target) AS target,"
        " SUM(CAST(weight AS DECIMAL(28,6))) AS w"
        " FROM edges GROUP BY 1, 2)",
        "sym AS (SELECT source, target, w FROM und WHERE source <> target"
        " UNION ALL SELECT target, source, w FROM und"
        " WHERE source <> target)",
        "l0 AS (SELECT id, id AS community FROM nodes)",
    ]
    for _i in range(2):
        _lpw.append(
            f"v{_i + 1} AS (SELECT id, nb, SUM(v) AS n FROM ("
            f"SELECT s.target AS id, l{_i}.community AS nb, s.w AS v"
            f" FROM sym s JOIN l{_i} ON s.source = l{_i}.id"
            f" UNION ALL SELECT id, community,"
            f" CAST(0 AS DECIMAL(28,6)) FROM l{_i}"
            f") GROUP BY 1, 2)"
        )
        _lpw.append(
            f"w{_i + 1} AS (SELECT id, nb FROM (SELECT id, nb, row_number()"
            f" OVER (PARTITION BY id ORDER BY n DESC, nb ASC) AS rn"
            f" FROM v{_i + 1}) WHERE rn = 1)"
        )
        _lpw.append(
            f"l{_i + 1} AS (SELECT l{_i}.id,"
            f" coalesce(w{_i + 1}.nb, l{_i}.community) AS community"
            f" FROM l{_i} LEFT JOIN w{_i + 1} ON l{_i}.id = w{_i + 1}.id)"
        )
    o["label_propagation_weighted"] = (
        f"WITH {GRAPH_CTE}, "
        + ", ".join(_lpw)
        + " SELECT id, community FROM l2"
    )

    # weighted tf form mirrors the Spark plan exactly (sum(c*lp)/sum(c))
    o["unigram_logprob"] = f"""
WITH {TOKS_CTE.strip().rstrip()},
tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
tf AS (
  SELECT doc_id, tok, count(*) AS c FROM tok WHERE tok <> ''
  GROUP BY doc_id, tok
),
freq AS (SELECT tok, sum(c) AS n FROM tf GROUP BY tok),
total AS (SELECT sum(n) AS total FROM freq),
lp AS (
  SELECT tf.doc_id, tf.c, ln(freq.n) - ln(total.total) AS lp
  FROM tf JOIN freq USING (tok), total
),
agg AS (
  SELECT doc_id, sum(c) AS n_tokens,
         round(sum(c * lp) / sum(c), 6) AS logprob
  FROM lp GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
       agg.logprob
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""

    # CCNet bucketing: exact interpolated thirds over the non-null
    # unigram scores (quantile_cont == Spark percentile); half-open
    # boundaries so threshold ties fall to the worse bucket
    o["perplexity_buckets"] = f"""
WITH u AS ({o["unigram_logprob"]}),
th AS (
  SELECT quantile_cont(logprob, {1 / 3!r}) AS t1,
         quantile_cont(logprob, {2 / 3!r}) AS t2
  FROM u WHERE logprob IS NOT NULL
)
SELECT u.doc_id, u.n_tokens, u.logprob,
       CASE WHEN u.logprob IS NULL THEN NULL
            WHEN u.logprob > th.t2 THEN 'head'
            WHEN u.logprob > th.t1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM u, th
"""

    # Zipf head fit: 6-dp-rounded log coordinates accumulated as
    # DECIMALs (exact moment sums), one floating division at the end —
    # mirrors text.zipf_fit term-for-term
    o["zipf_fit"] = f"""
WITH {TOKS_CTE.strip().rstrip()},
tok AS (SELECT unnest(t) AS tok FROM toks),
freq AS (SELECT tok, count(*) AS n FROM tok WHERE tok <> '' GROUP BY tok),
nd AS (SELECT count(*) AS n_distinct_tokens FROM freq),
top AS (SELECT tok, n FROM freq ORDER BY n DESC, tok ASC LIMIT 1000),
ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY n DESC, tok ASC) AS INTEGER) AS rank,
         n
  FROM top
),
m AS (
  SELECT count(*) AS n_fit,
         SUM(CAST(round(ln(rank), 6) AS DECIMAL(14,6))) AS sx,
         SUM(CAST(round(ln(n), 6) AS DECIMAL(14,6))) AS sy,
         SUM(CAST(round(ln(rank), 6) AS DECIMAL(14,6))
             * CAST(round(ln(n), 6) AS DECIMAL(14,6))) AS sxy,
         SUM(CAST(round(ln(rank), 6) AS DECIMAL(14,6))
             * CAST(round(ln(rank), 6) AS DECIMAL(14,6))) AS sxx
  FROM ranked
),
d AS (
  SELECT n_fit, CAST(n_fit AS DOUBLE) AS k, CAST(sx AS DOUBLE) AS sx,
         CAST(sy AS DOUBLE) AS sy, CAST(sxy AS DOUBLE) AS sxy,
         CAST(sxx AS DOUBLE) AS sxx
  FROM m
)
SELECT nd.n_distinct_tokens, d.n_fit,
       CASE WHEN (k * sxx - sx * sx) <= 0 THEN NULL
            ELSE round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
       END AS zipf_slope,
       CASE WHEN (k * sxx - sx * sx) <= 0 THEN NULL
            ELSE round((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx)
                       / k, 6)
       END AS zipf_intercept
FROM nd, d
"""

    # BPE training, unrolled: per round, a weighted pair count, a
    # 1-row argmax (ties pair-ascending), and the merge applied with
    # the windowed-islands formulation of greedy leftmost
    # non-overlapping matching — same selection the Spark fold makes.
    _bpe_rounds = 8
    _bpe = [
        TOKS_CTE.strip().rstrip(),
        "wraw AS (SELECT unnest(t) AS word FROM toks)",
        """wf AS (
  SELECT word, count(*) AS freq FROM wraw
  WHERE word <> '' AND length(word) <= 64 GROUP BY word)""",
        "sym1 AS MATERIALIZED (SELECT word, freq, regexp_extract_all(word, '.') AS s FROM wf)",
    ]
    for _r in range(1, _bpe_rounds + 1):
        _bpe.append(
            f"""pos{_r} AS (
  SELECT word, freq, s, unnest(generate_series(1, len(s))) AS i
  FROM sym{_r})"""
        )
        _bpe.append(
            f"""pr{_r} AS MATERIALIZED (
  SELECT word, freq, i, s[i] AS a,
         CASE WHEN i < len(s) THEN s[i + 1] ELSE NULL END AS b
  FROM pos{_r})"""
        )
        _bpe.append(
            f"""pc{_r} AS (
  SELECT a, b, sum(freq) AS c FROM pr{_r}
  WHERE b IS NOT NULL GROUP BY a, b)"""
        )
        _bpe.append(
            f"""best{_r} AS MATERIALIZED (
  SELECT a AS l, b AS r, c FROM pc{_r}
  ORDER BY c DESC, a ASC, b ASC LIMIT 1)"""
        )
        _bpe.append(
            f"""mt{_r} AS (
  SELECT p.word, p.i FROM pr{_r} p, best{_r} be
  WHERE p.a = be.l AND p.b = be.r)"""
        )
        _bpe.append(
            f"""isl{_r} AS (
  SELECT word, i,
         i - row_number() OVER (PARTITION BY word ORDER BY i) AS g
  FROM mt{_r})"""
        )
        _bpe.append(
            f"""sel{_r} AS MATERIALIZED (
  SELECT word, i FROM (
    SELECT word, i,
           row_number() OVER (PARTITION BY word, g ORDER BY i) AS k
    FROM isl{_r})
  WHERE k % 2 = 1)"""
        )
        _bpe.append(
            f"""sym{_r + 1} AS MATERIALIZED (
  SELECT p.word, p.freq,
         list(CASE WHEN sl.i IS NOT NULL THEN p.a || p.b ELSE p.a END
              ORDER BY p.i) AS s
  FROM pr{_r} p
  LEFT JOIN sel{_r} sl ON sl.word = p.word AND sl.i = p.i
  LEFT JOIN sel{_r} pv ON pv.word = p.word AND pv.i = p.i - 1
  WHERE pv.i IS NULL
  GROUP BY p.word, p.freq)"""
        )
    _bpe_union = "\nUNION ALL\n".join(
        f'SELECT {_r} AS merge_rank, l AS "left", r AS "right", '
        f"CAST(c AS BIGINT) AS pair_count FROM best{_r}"
        for _r in range(1, _bpe_rounds + 1)
    )
    o["bpe_train"] = "WITH " + ",\n".join(_bpe) + "\n" + _bpe_union

    # encode = the same unrolled merge chain applied to the word
    # table (sym{R+1} is each word's final symbolization), joined
    # back per document with multiplicity
    o["bpe_encode"] = (
        "WITH "
        + ",\n".join(_bpe)
        + f""",
dw AS (SELECT doc_id, unnest(t) AS word FROM toks),
dwf AS (
  SELECT doc_id, word, count(*) AS c FROM dw
  WHERE word <> '' AND length(word) <= 64 GROUP BY doc_id, word),
enc AS (
  SELECT dwf.doc_id,
         sum(dwf.c * length(dwf.word)) AS n_chars_in_words,
         sum(dwf.c * len(s9.s)) AS n_bpe_tokens
  FROM dwf JOIN sym{_bpe_rounds + 1} s9 ON s9.word = dwf.word
  GROUP BY dwf.doc_id)
SELECT d.doc_id,
       CAST(coalesce(enc.n_chars_in_words, 0) AS BIGINT) AS n_chars_in_words,
       CAST(coalesce(enc.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,
       CASE WHEN enc.n_bpe_tokens > 0
            THEN round(CAST(enc.n_chars_in_words AS DOUBLE)
                       / enc.n_bpe_tokens, 6) END AS compression
FROM documents d LEFT JOIN enc ON d.doc_id = enc.doc_id
"""
    )

    # median/MAD fence per event type; medians rounded to 6 dp before
    # the z computation so both engines gate on the identical fence
    o["robust_outliers"] = """
WITH med AS (
  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS median_v
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.event_id, e.value, m.median_v,
         abs(e.value - m.median_v) AS ad
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, round(quantile_cont(ad, 0.5), 6) AS mad_v
  FROM dev GROUP BY event_type
)
SELECT d.event_type, d.event_id, d.value, d.median_v, m.mad_v,
       CASE WHEN m.mad_v > 0 THEN round(d.ad / m.mad_v, 6) END AS robust_z,
       CASE WHEN m.mad_v > 0 THEN d.ad / m.mad_v > 3.5
            ELSE d.ad > 0 END AS is_outlier
FROM dev d JOIN mad m USING (event_type)
"""

    # q-gram candidate join + count filter (shared >= min_len - 2 -
    # 2*3) + exact levenshtein on the 40-char prefixes of the capped
    # input; stopword-grams (df > 1000) dropped pre-join
    o["similar_strings"] = """
WITH s AS (
  SELECT doc_id AS id, substr(text, 1, 40) AS sv FROM documents
  WHERE doc_id < 500
),
g AS (
  SELECT id, sv, unnest(list_distinct(list_transform(
           generate_series(1, greatest(length(sv) - 2, 0)),
           i -> substr(sv, i, 3)))) AS gr
  FROM s
),
gf AS (SELECT gr FROM g GROUP BY gr HAVING count(*) <= 1000),
gg0 AS (SELECT g.* FROM g JOIN gf USING (gr)),
ngc AS (SELECT id, count(*) AS ng FROM gg0 GROUP BY id),
gg AS (SELECT gg0.*, ngc.ng FROM gg0 JOIN ngc USING (id)),
cand AS (
  SELECT a.id AS id_a, b.id AS id_b, a.sv AS sa, b.sv AS sb,
         a.ng AS na, b.ng AS nb, count(*) AS shared
  FROM gg a JOIN gg b ON a.gr = b.gr AND a.id < b.id
  WHERE abs(length(a.sv) - length(b.sv)) <= 2
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT id_a, id_b, CAST(levenshtein(sa, sb) AS INTEGER) AS dist
FROM cand
WHERE shared >= greatest(1, least(least(length(sa), length(sb)) - 2 - 6,
                                  least(na, nb)))
  AND levenshtein(sa, sb) <= 2
"""

    # feature hashing: the portable md5 bucket (same convention as
    # hash_sample), smooth-free idf = ln(N/df), 6 dp
    o["hashed_tfidf"] = f"""
WITH {TOKS_CTE.strip().rstrip()},
tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
tf AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok || ':42'), 1, 15))::BIGINT % 256
              AS INTEGER) AS feature,
         count(*) AS tfc
  FROM tok WHERE tok <> '' GROUP BY 1, 2
),
dfreq AS (SELECT feature, count(*) AS dfc FROM tf GROUP BY feature),
nd AS (SELECT count(*) AS n FROM documents)
SELECT tf.doc_id, tf.feature,
       round(tfc * ln(CAST(nd.n AS DOUBLE) / dfc), 6) AS weight
FROM tf JOIN dfreq USING (feature), nd
"""

    # one 1-row aggregate per profiled column, unioned
    _cp_cols = ["event_id", "user_id", "event_type"]
    o["column_profile"] = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS "column", count(*) AS n_rows,
       count(CASE WHEN {c} IS NULL THEN 1 END) AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_str,
       CAST(max({c}) AS VARCHAR) AS max_str
FROM events"""
        for c in _cp_cols
    )

    # category counts -> entropy/gini/top-share summary
    o["category_stats"] = """
WITH c AS (SELECT lang AS v, count(*) AS c FROM documents GROUP BY lang),
t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c)
SELECT t.n AS n_rows,
       (SELECT count(*) FROM c) AS n_distinct,
       round(-SUM((c.c / t.n) * log2(c.c / t.n)), 6) AS entropy_bits,
       round(1.0 - SUM((c.c / t.n) * (c.c / t.n)), 6) AS gini_impurity,
       round(MAX(c.c) / t.n, 6) AS top_share
FROM c, t GROUP BY t.n
"""

    # two count tables full-outer-joined; fan-out = product
    o["join_skew_report"] = """
WITH lc AS (SELECT o_custkey AS key, count(*) AS n_left FROM orders GROUP BY 1),
rc AS (SELECT c_custkey AS key, count(*) AS n_right FROM customer GROUP BY 1)
SELECT coalesce(lc.key, rc.key) AS key,
       coalesce(lc.n_left, 0) AS n_left,
       coalesce(rc.n_right, 0) AS n_right,
       coalesce(lc.n_left, 0) * coalesce(rc.n_right, 0) AS n_out
FROM lc FULL OUTER JOIN rc ON lc.key = rc.key
ORDER BY n_out DESC, n_left DESC, key ASC LIMIT 20
"""

    # RFM quintiles from percentile fences (no global ntile window);
    # recency inverted so recent = high score
    _rfm_pcts = [0.2, 0.4, 0.6, 0.8]

    def _rfm_cut(c):
        return ",\n         ".join(
            f"quantile_cont({c}, {p!r}) AS {c}_{i}"
            for i, p in enumerate(_rfm_pcts)
        )

    def _rfm_tile(c):
        chain = " ".join(
            f"WHEN {c} > {c}_{i} THEN {i + 2}"
            for i in reversed(range(len(_rfm_pcts)))
        )
        return f"(CASE {chain} ELSE 1 END)"

    o["rfm_segments"] = f"""
WITH per AS (
  SELECT user_id, max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_s,
         count(*) AS frequency,
         round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
           AS monetary
  FROM events GROUP BY user_id
),
cm AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS cmax FROM events),
base AS (
  SELECT user_id, cm.cmax - last_s AS recency_s, frequency, monetary
  FROM per, cm
),
cuts AS (
  SELECT {_rfm_cut("recency_s")},
         {_rfm_cut("frequency")},
         {_rfm_cut("monetary")}
  FROM base
)
SELECT b.user_id, b.recency_s, b.frequency, b.monetary,
       6 - {_rfm_tile("recency_s")} AS r_score,
       {_rfm_tile("frequency")} AS f_score,
       {_rfm_tile("monetary")} AS m_score
FROM base b, cuts
"""

    # keyed version diff: full outer join + NULL-safe compare
    o["table_diff"] = """
WITH o AS (SELECT event_id AS key, value FROM events),
n AS (
  SELECT event_id AS key,
         CASE WHEN event_id % 3 = 0 THEN round(value * 2, 2)
              ELSE value END AS value
  FROM events WHERE event_id % 5 != 0
  UNION ALL
  SELECT event_id + 1000000 AS key, value FROM events
  WHERE event_id + 1000000 <= 1000100
),
j AS (
  SELECT coalesce(o.key, n.key) AS key, o.key AS ok, n.key AS nk,
         o.value AS ov, n.value AS nv
  FROM o FULL OUTER JOIN n ON o.key = n.key
)
SELECT key,
       CASE WHEN ok IS NULL THEN 'added'
            WHEN nk IS NULL THEN 'removed'
            WHEN NOT (ov IS NOT DISTINCT FROM nv) THEN 'changed'
       END AS change
FROM j
WHERE (ok IS NULL) OR (nk IS NULL) OR NOT (ov IS NOT DISTINCT FROM nv)
"""

    # top-level JSON key census; objects only (mirrors the map parse)
    o["json_key_profile"] = """
WITH t AS (SELECT count(*) AS tot FROM events),
k AS (
  SELECT unnest(json_keys(props)) AS key FROM events
  WHERE json_valid(props) AND json_type(props) = 'OBJECT'
)
SELECT key, count(*) AS n,
       round(count(*) / t.tot, 6) AS frac
FROM k, t GROUP BY key, t.tot
"""

    # equi-width histogram via integer bin arithmetic, single pass
    o["numeric_histogram"] = """
WITH b AS (
  SELECT LEAST(19, GREATEST(0, CAST(floor((value - 0.0) / 25.0) AS INTEGER)))
           AS bin
  FROM events WHERE value IS NOT NULL
)
SELECT bin, round(0.0 + bin * 25.0, 6) AS lo_edge,
       round(0.0 + (bin + 1) * 25.0, 6) AS hi_edge,
       count(*) AS n
FROM b GROUP BY bin
"""

    # all-pairs Pearson from one conditional decimal-moment aggregate
    _pc_pairs = [("hour", "k"), ("hour", "value"), ("k", "value")]

    def _pc_block(a, b):
        both = f"({a} IS NOT NULL AND {b} IS NOT NULL)"
        xa = f"CAST(round(CAST({a} AS DOUBLE) * 1000000) AS DECIMAL(28,0))"
        xb = f"CAST(round(CAST({b} AS DOUBLE) * 1000000) AS DECIMAL(28,0))"
        t = f"{a}__{b}"
        return ",\n  ".join(
            [
                f"count(CASE WHEN {both} THEN 1 END) AS n_{t}",
                f"SUM(CASE WHEN {both} THEN {xa} ELSE CAST(0 AS DECIMAL(28,0)) END) AS sa_{t}",
                f"SUM(CASE WHEN {both} THEN {xb} ELSE CAST(0 AS DECIMAL(28,0)) END) AS sb_{t}",
                f"SUM(CASE WHEN {both} THEN {xa} * {xb} ELSE CAST(0 AS DECIMAL(38,0)) END) AS sab_{t}",
                f"SUM(CASE WHEN {both} THEN {xa} * {xa} ELSE CAST(0 AS DECIMAL(38,0)) END) AS saa_{t}",
                f"SUM(CASE WHEN {both} THEN {xb} * {xb} ELSE CAST(0 AS DECIMAL(38,0)) END) AS sbb_{t}",
            ]
        )

    def _pc_row(a, b):
        t = f"{a}__{b}"
        n = f"CAST(n_{t} AS DOUBLE)"
        sa, sb = f"CAST(sa_{t} AS DOUBLE)", f"CAST(sb_{t} AS DOUBLE)"
        sab = f"CAST(sab_{t} AS DOUBLE)"
        saa, sbb = f"CAST(saa_{t} AS DOUBLE)", f"CAST(sbb_{t} AS DOUBLE)"
        cov = f"({n} * {sab} - {sa} * {sb})"
        va = f"({n} * {saa} - {sa} * {sa})"
        vb = f"({n} * {sbb} - {sb} * {sb})"
        return (
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, n_{t} AS n, "
            f"CASE WHEN {va} > 0 AND {vb} > 0 "
            f"THEN round({cov} / sqrt({va}) / sqrt({vb}), 6) END AS r FROM m"
        )

    o["pairwise_corr"] = (
        """
WITH x AS (
  SELECT value,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
         CAST((CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24 AS INTEGER)
           AS hour
  FROM events
),
m AS (
  SELECT
  """
        + ",\n  ".join(_pc_block(a, b) for a, b in _pc_pairs)
        + "\n  FROM x\n)\n"
        + "\nUNION ALL\n".join(_pc_row(a, b) for a, b in _pc_pairs)
    )

    # JSON scalar promotion: permissive extraction, NULL on miss
    o["extract_json"] = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
"""

    # Welch z over exact decimal moments of 6-dp-quantized values;
    # arms from the k-parity variant
    o["ab_test_report"] = """
WITH x AS (
  SELECT CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant,
         CAST(round(value * 1000000) AS DECIMAL(28,0)) AS v
  FROM events
),
agg AS (
  SELECT count(CASE WHEN variant = 'A' THEN 1 END) AS n_control,
         count(CASE WHEN variant = 'B' THEN 1 END) AS n_treatment,
         SUM(CASE WHEN variant = 'A' THEN v ELSE CAST(0 AS DECIMAL(28,0)) END) AS sc,
         SUM(CASE WHEN variant = 'B' THEN v ELSE CAST(0 AS DECIMAL(28,0)) END) AS st,
         SUM(CASE WHEN variant = 'A' THEN v * v ELSE CAST(0 AS DECIMAL(38,0)) END) AS sc2,
         SUM(CASE WHEN variant = 'B' THEN v * v ELSE CAST(0 AS DECIMAL(38,0)) END) AS st2
  FROM x
),
d AS (
  SELECT n_control, n_treatment,
         CAST(n_control AS DOUBLE) AS nc, CAST(n_treatment AS DOUBLE) AS nt,
         CAST(sc AS DOUBLE) / 1e6 AS sc, CAST(st AS DOUBLE) / 1e6 AS st,
         CAST(sc2 AS DOUBLE) / 1e12 AS sc2, CAST(st2 AS DOUBLE) / 1e12 AS st2
  FROM agg
)
SELECT n_control, n_treatment,
       CASE WHEN n_control > 0 THEN round(sc / nc, 6) END AS mean_control,
       CASE WHEN n_treatment > 0 THEN round(st / nt, 6) END AS mean_treatment,
       CASE WHEN n_control > 1 AND n_treatment > 1
            THEN round(st / nt - sc / nc, 6) END AS diff,
       CASE WHEN n_control > 1 AND n_treatment > 1
                 AND ((st2 - st * st / nt) / (nt - 1) / nt
                      + (sc2 - sc * sc / nc) / (nc - 1) / nc) > 0
            THEN round((st / nt - sc / nc)
                       / sqrt((st2 - st * st / nt) / (nt - 1) / nt
                              + (sc2 - sc * sc / nc) / (nc - 1) / nc), 6)
       END AS z_score
FROM d
"""

    # the salted join's contract: bit-identical to the plain join
    o["salted_join"] = """
WITH r AS (SELECT lang, count(*) AS lang_n FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, r.lang_n FROM documents d JOIN r USING (lang)
"""

    # script composition via explicit Unicode ranges; each count is
    # length(s) - length(regexp_replace(s, class, '', 'g'))
    _sp = {
        "latin": "[A-Za-z]",
        "digit": "[0-9]",
        "space": "[ \t\n\r]",
        "cjk": "[\\x{4E00}-\\x{9FFF}]",
        "cyrillic": "[\\x{0400}-\\x{04FF}]",
    }
    _sp_counts = {
        k: f"(length(text) - length(regexp_replace(text, '{v}', '', 'g')))"
        for k, v in _sp.items()
    }
    _sp_other = (
        "(length(text) - ("
        + " + ".join(_sp_counts.values())
        + "))"
    )
    _sp_ratio = (
        lambda c: f"CASE WHEN length(text) > 0 THEN round({c} / length(text), 6) END"
    )
    o["script_profile"] = f"""
SELECT doc_id, length(text) AS n_chars,
       {_sp_ratio(_sp_counts["latin"])} AS latin_ratio,
       {_sp_ratio(_sp_counts["digit"])} AS digit_ratio,
       {_sp_ratio(_sp_counts["space"])} AS space_ratio,
       {_sp_ratio(_sp_counts["cjk"])} AS cjk_ratio,
       {_sp_ratio(_sp_counts["cyrillic"])} AS cyrillic_ratio,
       {_sp_ratio(_sp_other)} AS other_ratio
FROM documents
"""

    # A-ES weighted sampling without replacement: rank by ln(u)/w from
    # the portable md5 coin (seed 42); ties impossible across keys
    o["weighted_sample_k"] = """
WITH w AS (
  SELECT doc_id, n_chars,
         ln((('0x' || substr(md5(doc_id::VARCHAR || ':42'), 1, 15))::BIGINT
             % 1000000 + 0.5) / 1000000.0) / n_chars AS es
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars FROM w ORDER BY es DESC, doc_id ASC LIMIT 50
"""

    # fold sub-threshold categories into one bucket; membership map
    # derived from a single category aggregate
    o["group_rare_categories"] = """
WITH keep AS (
  SELECT source, 1 AS hit
  FROM documents GROUP BY source HAVING count(*) >= 30
)
SELECT d.doc_id, d.source,
       CASE WHEN k.hit IS NOT NULL THEN d.source
            ELSE '__other__' END AS source_folded
FROM documents d
LEFT JOIN keep k ON d.source IS NOT DISTINCT FROM k.source
"""

    # smoothed target encoding: decimal category/global sums, two
    # floating divisions at the end
    o["target_encoding"] = """
WITH per AS (
  SELECT lang, count(*) AS n,
         SUM(CAST(n_chars AS DECIMAL(28,6))) AS sy
  FROM documents GROUP BY lang
),
pr AS (
  SELECT CAST(SUM(CAST(n_chars AS DECIMAL(28,6))) AS DOUBLE) / count(*)
         AS prior
  FROM documents
)
SELECT per.lang, per.n,
       round((CAST(per.sy AS DOUBLE) + 20.0 * pr.prior)
             / (per.n + 20.0), 6) AS lang_te
FROM per, pr
"""

    # top event-type trigram paths over the (ts, event_id) total order;
    # deterministic cutoff ties via path ascending
    o["top_event_paths"] = """
WITH p AS (
  SELECT event_type AS s0,
         lead(event_type, 1) OVER w AS s1,
         lead(event_type, 2) OVER w AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT s0 || ' > ' || s1 || ' > ' || s2 AS path, count(*) AS n_paths
FROM p WHERE s2 IS NOT NULL
GROUP BY 1 ORDER BY n_paths DESC, path ASC LIMIT 20
"""

    # bigram mirror of the unigram oracle: per-doc bigram tf, corpus
    # bigram/context/unigram marginals, Jelinek-Mercer interpolation
    # (0.75/0.25), first token scored by unigram alone — expression
    # trees match functions/text.py::bigram_logprob_score term-for-term
    o["bigram_logprob"] = f"""
WITH {TOKS_CTE.strip().rstrip()},
bs AS (
  SELECT doc_id, t[i] AS v, t[i + 1] AS w
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 2)
  WHERE t[i] <> '' AND t[i + 1] <> ''
),
btf AS (SELECT doc_id, v, w, count(*) AS c FROM bs GROUP BY 1, 2, 3),
big AS (SELECT v, w, sum(c) AS cvw FROM btf GROUP BY 1, 2),
ctx AS (SELECT v, sum(cvw) AS cv FROM big GROUP BY 1),
tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
utf AS (
  SELECT doc_id, tok, count(*) AS uc FROM tok WHERE tok <> ''
  GROUP BY doc_id, tok
),
uni AS (SELECT tok, sum(uc) AS cw FROM utf GROUP BY tok),
total AS (SELECT sum(cw) AS total FROM uni),
bterms AS (
  SELECT btf.doc_id,
         btf.c * ln(0.75 * big.cvw / ctx.cv
                    + 0.25 * uni.cw / total.total) AS term
  FROM btf JOIN big USING (v, w) JOIN ctx USING (v)
  JOIN uni ON uni.tok = btf.w, total
),
fterms AS (
  SELECT toks.doc_id, ln(uni.cw) - ln(total.total) AS term
  FROM toks JOIN uni ON uni.tok = t[1], total
  WHERE len(t) >= 1 AND t[1] <> ''
),
nt AS (SELECT doc_id, sum(uc) AS n_tokens FROM utf GROUP BY doc_id),
sums AS (
  SELECT doc_id, sum(term) AS lpsum
  FROM (SELECT * FROM bterms UNION ALL SELECT * FROM fterms)
  GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(nt.n_tokens, 0) AS BIGINT) AS n_tokens,
       round(sums.lpsum / nt.n_tokens, 6) AS logprob
FROM documents d
LEFT JOIN nt ON d.doc_id = nt.doc_id
LEFT JOIN sums ON d.doc_id = sums.doc_id
"""

    o["embedding_clusters"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
seeds AS (
  SELECT vec_id AS sid, emb AS semb FROM e ORDER BY vec_id LIMIT 8
),
scored AS (
  SELECT e.vec_id, s.sid,
         round(list_dot_product(e.emb, s.semb)
               / (sqrt(list_dot_product(e.emb, e.emb))
                  * sqrt(list_dot_product(s.semb, s.semb))), 6) AS sim
  FROM e, seeds s
)
SELECT vec_id, sid AS cluster, sim AS cosine FROM (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY sim DESC, sid ASC) AS rn
  FROM scored
) WHERE rn = 1
"""

    # fixed-iteration HITS, unrolled like o["pagerank"]: one
    # (auth-raw, auth, hub-raw, hub) CTE quartet per round; the
    # DECIMAL(38,12) contribution sums + per-round 12-dp rounding and
    # the L1 normalizer as a scalar subquery mirror algorithms.hits
    # exactly
    hits_half = """
{out}r AS (
  SELECT e.{to_col} AS id, SUM(CAST(round(p.s, 12) AS DECIMAL(38,12))) AS raw
  FROM he e JOIN {src} p ON e.{from_col} = p.id GROUP BY e.{to_col}
),
{out} AS (
  SELECT n.id,
         CASE WHEN coalesce(r.raw, 0) = 0 THEN 0.0
              ELSE round(CAST(r.raw AS DOUBLE)
                         / CAST((SELECT SUM(raw) FROM {out}r) AS DOUBLE), 12)
         END AS s
  FROM nodes n LEFT JOIN {out}r r ON n.id = r.id
)"""
    hits_rounds, prev_h = "", "h0"
    for i in range(1, 4):
        hits_rounds += "," + hits_half.format(
            out=f"a{i}", src=prev_h, from_col="source", to_col="target"
        )
        hits_rounds += "," + hits_half.format(
            out=f"h{i}", src=f"a{i}", from_col="target", to_col="source"
        )
        prev_h = f"h{i}"
    o["hits_scores"] = f"""
WITH {GRAPH_CTE},
he AS (SELECT DISTINCT source, target FROM edges WHERE source <> target),
h0 AS (SELECT id, round(1.0 / (SELECT count(*) FROM nodes), 12) AS s
       FROM nodes)
{hits_rounds}
SELECT h3.id, round(h3.s, 6) AS hub, round(a3.s, 6) AS authority
FROM h3 JOIN a3 ON h3.id = a3.id
"""

    # sampled harmonic centrality: one recursive BFS keyed by seed,
    # 1/d terms as INTEGER quotients of 1e12 (order-independent sum)
    o["harmonic_centrality"] = f"""
WITH RECURSIVE {GRAPH_CTE},
e AS (SELECT DISTINCT source, target FROM edges),
sym AS (
  SELECT source AS a, target AS b FROM e
  UNION
  SELECT target AS a, source AS b FROM e
),
walk(seed, id, dist) AS (
  SELECT id, id, 0 FROM nodes WHERE id IN (1, 2, 3)
  UNION
  SELECT walk.seed, s.b, walk.dist + 1
  FROM walk JOIN sym s ON s.a = walk.id
  WHERE walk.dist < 30
),
d AS (SELECT seed, id, min(dist) AS dist FROM walk GROUP BY seed, id),
hsum AS (
  SELECT id, CAST(SUM(1000000000000 // dist) AS BIGINT) AS s
  FROM d WHERE dist > 0 GROUP BY id
)
SELECT n.id, round(coalesce(hsum.s, 0) / 1e12, 6) AS harmonic
FROM nodes n LEFT JOIN hsum ON n.id = hsum.id
"""

    # deterministic uniform walks: 4 unrolled steps; the neighbor pick
    # is row_number-ranked adjacency joined on the counter-hash mod
    # degree (pure bigint arithmetic — see algorithms.random_walks)
    rw_hash = (
        "(((((w{prev}.start_id % 1000003) + 1000003) % 1000003)"
        " * 1315423911 + w{prev}.rep * 2654435761 + {t} * 97)"
        " % 1000003)"
    )
    rw_steps, rw_union = "", "SELECT start_id, rep, 0 AS step, id FROM w0"
    for t in range(1, 5):
        h = rw_hash.format(prev=t - 1, t=t)
        rw_steps += f""",
w{t} AS (
  SELECT w{t - 1}.start_id, w{t - 1}.rep, a.target AS id
  FROM w{t - 1}
  JOIN deg d ON w{t - 1}.id = d.source
  JOIN adj a ON a.source = w{t - 1}.id AND a.rank = {h} % d.deg
)"""
        rw_union += (
            f"\nUNION ALL SELECT start_id, rep, {t} AS step, id FROM w{t}"
        )
    # node2vec biased walks: 3 unrolled second-order steps; weights are
    # the exact integers (4*q4, p4*q4, 4*p4) = (8, 16, 32) for
    # (p, q) = (2, 0.5); the pick inverts the cumulative weight at the
    # counter hash mod total weight (see algorithms.node2vec_walks)
    n2v_hash = (
        "(((((start_id % 1000003) + 1000003) % 1000003)"
        " * 1315423911 + rep * 2654435761 + {t} * 97)"
        " % 1000003)"
    )
    n2v_steps = ""
    n2v_union = "SELECT start_id, rep, 0 AS step, id FROM v0"
    for t in range(1, 4):
        h = n2v_hash.format(t=t)
        n2v_steps += f""",
cand{t} AS (
  SELECT v.start_id, v.rep, v.prev, v.id, a.target, a.rank,
         CASE WHEN a.target = v.prev THEN 8
              WHEN nb.s IS NOT NULL THEN 16
              ELSE 32 END AS wt
  FROM v{t - 1} v
  JOIN adj a ON a.source = v.id
  LEFT JOIN simple nb ON nb.s = v.prev AND nb.t = a.target
),
sel{t} AS (
  SELECT *,
         SUM(wt) OVER (PARTITION BY start_id, rep ORDER BY rank ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         SUM(wt) OVER (PARTITION BY start_id, rep) AS tw
  FROM cand{t}
),
v{t} AS (
  SELECT start_id, rep, id AS prev, target AS id
  FROM sel{t}
  WHERE cw - wt <= ({h} % tw) AND ({h} % tw) < cw
)"""
        n2v_union += (
            f"\nUNION ALL SELECT start_id, rep, {t} AS step, id FROM v{t}"
        )
    o["node2vec_walks"] = f"""
WITH {GRAPH_CTE},
e AS (SELECT DISTINCT source, target FROM edges),
sym AS (
  SELECT source AS s, target AS t FROM e
  UNION
  SELECT target AS s, source AS t FROM e
),
simple AS (SELECT s, t FROM sym WHERE s <> t),
adj AS (
  SELECT s AS source, t AS target,
         row_number() OVER (PARTITION BY s ORDER BY t ASC) - 1 AS rank
  FROM simple
),
v0 AS (SELECT n.id AS start_id, 0 AS rep, n.id AS prev, n.id AS id
       FROM nodes n)
{n2v_steps}
{n2v_union}
"""

    # DAG levels: 10 unrolled max-relaxation rounds over the doc-chain
    # (depth 9, so round 10 is a no-op — fixed-round twin is exact)
    _tl = [
        "ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 500)",
        "eg AS (SELECT id AS source, id + 50 AS target FROM ids"
        " WHERE id + 50 < 500)",
        "l0 AS (SELECT id, 0 AS level FROM ids)",
    ]
    for _i in range(10):
        _tl.append(
            f"l{_i + 1} AS (SELECT id, max(level) AS level FROM ("
            f"SELECT e.target AS id, l{_i}.level + 1 AS level"
            f" FROM eg e JOIN l{_i} ON e.source = l{_i}.id"
            f" UNION ALL SELECT id, level FROM l{_i}"
            f") GROUP BY id)"
        )
    o["topological_levels"] = (
        "WITH " + ", ".join(_tl) + " SELECT id, level FROM l10"
    )

    # Luby MIS, 12 unrolled synchronous rounds (post-convergence
    # rounds are no-ops: the undecided set is empty, so the winner
    # CTEs stay empty); md5('42:'||id) priorities match the Spark
    # side byte-for-byte
    _mis = [
        "e2 AS MATERIALIZED (SELECT DISTINCT least(source, target) AS a,"
        " greatest(source, target) AS b FROM edges"
        " WHERE source <> target)",
        "sym AS MATERIALIZED (SELECT a AS s, b AS t FROM e2"
        " UNION ALL SELECT b AS s, a AS t FROM e2)",
        "u0 AS MATERIALIZED (SELECT id FROM nodes)",
        "m0 AS MATERIALIZED (SELECT id FROM nodes WHERE 1 = 0)",
    ]
    for _i in range(1, 13):
        _p = _i - 1
        _mis.append(
            f"w{_i} AS MATERIALIZED (SELECT u.id FROM u{_p} u WHERE NOT EXISTS ("
            f"SELECT 1 FROM sym s JOIN u{_p} n ON s.t = n.id"
            f" WHERE s.s = u.id"
            f" AND md5('42:' || n.id) < md5('42:' || u.id)))"
        )
        _mis.append(
            f"m{_i} AS MATERIALIZED (SELECT id FROM m{_p} UNION SELECT id FROM w{_i})"
        )
        _mis.append(
            f"u{_i} AS MATERIALIZED (SELECT u.id FROM u{_p} u"
            f" WHERE u.id NOT IN (SELECT id FROM w{_i})"
            f" AND NOT EXISTS (SELECT 1 FROM sym s JOIN w{_i} w"
            f" ON s.s = w.id WHERE s.t = u.id))"
        )
    o["maximal_independent_set"] = (
        f"WITH {GRAPH_CTE}, "
        + ", ".join(_mis)
        + " SELECT n.id, m12.id IS NOT NULL AS in_mis"
        " FROM nodes n LEFT JOIN m12 ON n.id = m12.id"
    )

    # deterministic non-edge sampling: counter-hash candidate ranks
    # mapped through the dense (ORDER BY id) node index, anti-joined
    # against the symmetrized edge set (see
    # algorithms.sample_negative_edges)
    o["sample_negative_edges"] = f"""
WITH {GRAPH_CTE},
idx AS (SELECT id, row_number() OVER (ORDER BY id) - 1 AS rk FROM nodes),
nn AS (SELECT count(*) AS n FROM nodes),
cand AS (
  SELECT i.id AS source, t.id AS target, r.rep
  FROM idx i
  CROSS JOIN (SELECT unnest([0, 1]) AS rep) r
  CROSS JOIN nn
  JOIN idx t
    ON t.rk = ((i.rk::BIGINT * 1315423911 + r.rep * 2654435761 + 7)
               % nn.n + nn.n) % nn.n
  WHERE i.id <> t.id
),
e AS (SELECT DISTINCT source, target FROM edges),
sym AS (
  SELECT source AS s, target AS t FROM e
  UNION
  SELECT target AS s, source AS t FROM e
)
SELECT c.source, c.target, min(c.rep) AS rep
FROM cand c
WHERE NOT EXISTS (
  SELECT 1 FROM sym WHERE sym.s = c.source AND sym.t = c.target
)
GROUP BY 1, 2
"""

    o["random_walks"] = f"""
WITH {GRAPH_CTE},
e AS (SELECT DISTINCT source, target FROM edges),
sym AS (
  SELECT source AS s, target AS t FROM e
  UNION
  SELECT target AS s, source AS t FROM e
),
simple AS (SELECT s, t FROM sym WHERE s <> t),
adj AS (
  SELECT s AS source, t AS target,
         row_number() OVER (PARTITION BY s ORDER BY t ASC) - 1 AS rank
  FROM simple
),
deg AS (SELECT source, count(*) AS deg FROM adj GROUP BY source),
w0 AS (
  SELECT n.id AS start_id, r.rep, n.id AS id
  FROM nodes n CROSS JOIN (SELECT unnest([0, 1]) AS rep) r
)
{rw_steps}
{rw_union}
"""

    # cohort retention triangle: integer period index (days since
    # epoch div 7) — no date_trunc week-start convention in play
    o["retention_cohorts"] = """
WITH act AS (
  SELECT DISTINCT user_id AS u,
         CAST(floor(datediff('day', DATE '1970-01-01',
                             CAST(ts AS DATE)) / 7.0) AS BIGINT) AS period
  FROM events
),
coh AS (SELECT u, min(period) AS cohort_period FROM act GROUP BY u),
cells AS (
  SELECT coh.cohort_period,
         act.period - coh.cohort_period AS period_offset,
         count(DISTINCT act.u) AS n_users
  FROM act JOIN coh ON act.u = coh.u
  GROUP BY 1, 2
),
base AS (
  SELECT cohort_period, n_users AS b FROM cells WHERE period_offset = 0
)
SELECT c.cohort_period, c.period_offset, c.n_users,
       round(c.n_users / base.b, 6) AS retention
FROM cells c JOIN base ON c.cohort_period = base.cohort_period
"""

    # percentile clamping per event type: quantile_cont == F.percentile
    # (both ANSI lerp); fences round to 6 dp before the gate
    o["winsorize"] = """
WITH fences AS (
  SELECT event_type,
         round(quantile_cont(value, 0.05), 6) AS lo,
         round(quantile_cont(value, 0.95), 6) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       CASE WHEN e.value < f.lo THEN f.lo
            WHEN e.value > f.hi THEN f.hi
            ELSE e.value END AS value_wins,
       e.value IS NOT NULL AND (e.value < f.lo OR e.value > f.hi)
         AS was_clamped
FROM events e JOIN fences f USING (event_type)
"""

    # prototype-distance pruning: per-label centroid (6-dp dim means)
    # reassembled as a list ordered by position, sequential-fold cosine
    # (list_dot_product == dot_expr), 5% quantile fence per label
    o["embedding_outliers"] = """
WITH longf AS (
  SELECT vec_id, label,
         CAST(unnest(range(0, len(embedding))) AS INTEGER) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings WHERE label IS NOT NULL
),
cent AS (
  SELECT label, pos, round(avg(val), 6) AS c FROM longf GROUP BY 1, 2
),
cvec AS (
  SELECT label, list(c ORDER BY pos) AS centroid FROM cent GROUP BY label
),
scored AS (
  SELECT e.vec_id, e.label,
         round(list_dot_product((e.embedding::DOUBLE[]), cv.centroid)
           / (sqrt(list_dot_product((e.embedding::DOUBLE[]),
                                    (e.embedding::DOUBLE[])))
              * sqrt(list_dot_product(cv.centroid, cv.centroid))), 6)
           AS cos_centroid
  FROM embeddings e JOIN cvec cv USING (label)
  WHERE e.label IS NOT NULL
),
fences AS (
  SELECT label, round(quantile_cont(cos_centroid, 0.05), 6) AS fence
  FROM scored GROUP BY label
)
SELECT s.vec_id, s.label, s.cos_centroid, f.fence,
       s.cos_centroid < f.fence AS is_outlier
FROM scored s JOIN fences f USING (label)
"""

    # trailing z-score over the 20 PRECEDING rows (current excluded):
    # decimal windowed moments, (n*s2 - s1^2)/(n*(n-1)) variance,
    # NULL z on < 5 priors / zero variance / NULL value
    o["anomaly_zscore"] = """
WITH m AS (
  SELECT user_id, event_id, CAST(value AS DOUBLE) AS value,
         count(CAST(value AS DECIMAL(18,6))) OVER w AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,6))
                        * CAST(value AS DECIMAL(18,6))
                        AS DECIMAL(38,12))) OVER w AS DOUBLE) AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT user_id, event_id, value, n,
         CASE WHEN n >= 5 AND value IS NOT NULL
                   AND (n * s2 - s1 * s1) / (n * (n - 1)) > 0
              THEN round((value - s1 / n)
                         / sqrt((n * s2 - s1 * s1) / (n * (n - 1))), 6)
         END AS z
  FROM m
)
SELECT user_id, event_id, value, n AS n_window, z,
       coalesce(abs(z) >= 3.0, false) AS is_anomaly
FROM z
"""

    # trailing ROWS frame over the (ts, event_id) total order; the
    # windowed sum runs on DECIMAL(18,6) in both engines
    o["rolling_stats"] = """
SELECT user_id, event_id,
       count(*) OVER w AS n_window,
       round(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / (count(*) OVER w), 6) AS mean_v,
       CAST(min(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS min_v,
       CAST(max(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS max_v
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""

    # per-doc character histogram -> H = (ln n - sum(c ln c)/n)/ln 2
    o["char_entropy"] = """
WITH cf AS (
  SELECT doc_id, ch, count(*) AS c FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch
    FROM documents
  ) GROUP BY doc_id, ch
),
per AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
         SUM(c * ln(c)) AS clogc
  FROM cf GROUP BY doc_id
)
SELECT d.doc_id, coalesce(per.n, 0) AS n_chars_counted,
       round((ln(per.n) - per.clogc / per.n) / ln(2), 6) AS char_entropy
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
"""

    # sampled Brandes betweenness, unrolled: the recursive BFS dist
    # table gates per-level sigma (exact integer path counts), then
    # the backward dependency levels replay algorithms.
    # betweenness_approx's 12-dp-term DECIMAL sums verbatim
    bt_hops = 3
    bt_fwd = ""
    for lvl in range(1, bt_hops + 1):
        bt_fwd += f""",
s{lvl} AS (
  SELECT p.seed, s.b AS id, CAST(SUM(p.sigma) AS BIGINT) AS sigma
  FROM s{lvl - 1} p
  JOIN bsym s ON s.a = p.id
  JOIN bd ON bd.seed = p.seed AND bd.id = s.b AND bd.dist = {lvl}
  GROUP BY p.seed, s.b
)"""
    bt_bwd = f",\ndel{bt_hops} AS (SELECT seed, id, 0.0 AS delta FROM s{bt_hops})"
    for lvl in range(bt_hops - 1, -1, -1):
        bt_bwd += f""",
t{lvl} AS (
  SELECT v.seed, v.id,
         CAST(round(v.sigma / w.sigma * (1 + dw.delta), 12)
              AS DECIMAL(38,12)) AS term
  FROM s{lvl} v
  JOIN bsym s ON s.a = v.id
  JOIN s{lvl + 1} w ON w.seed = v.seed AND w.id = s.b
  JOIN del{lvl + 1} dw ON dw.seed = w.seed AND dw.id = w.id
),
del{lvl} AS (
  SELECT v.seed, v.id, round(CAST(coalesce(ts.s, 0) AS DOUBLE), 12) AS delta
  FROM s{lvl} v
  LEFT JOIN (SELECT seed, id, SUM(term) AS s FROM t{lvl} GROUP BY seed, id) ts
    ON ts.seed = v.seed AND ts.id = v.id
)"""
    bt_union = " UNION ALL ".join(
        f"SELECT * FROM del{lvl}" for lvl in range(bt_hops, -1, -1)
    )
    o["betweenness_approx"] = f"""
WITH RECURSIVE {GRAPH_CTE},
be AS (SELECT DISTINCT source, target FROM edges),
bsym0 AS (
  SELECT source AS a, target AS b FROM be
  UNION
  SELECT target AS a, source AS b FROM be
),
bsym AS (SELECT a, b FROM bsym0 WHERE a <> b),
walk(seed, id, dist) AS (
  SELECT id, id, 0 FROM nodes WHERE id IN (1, 2, 3)
  UNION
  SELECT walk.seed, s.b, walk.dist + 1
  FROM walk JOIN bsym s ON s.a = walk.id
  WHERE walk.dist < {bt_hops}
),
bd AS (SELECT seed, id, min(dist) AS dist FROM walk GROUP BY seed, id),
s0 AS (SELECT seed, id, CAST(1 AS BIGINT) AS sigma FROM bd WHERE dist = 0)
{bt_fwd}
{bt_bwd},
alld AS ({bt_union}),
sc AS (
  SELECT id, SUM(CAST(round(delta, 12) AS DECIMAL(38,12))) AS b
  FROM alld WHERE id <> seed GROUP BY id
)
SELECT n.id, round(CAST(coalesce(sc.b, 0) AS DOUBLE), 6) AS betweenness
FROM nodes n LEFT JOIN sc ON n.id = sc.id
"""

    # community-quality report over the misaligned doc-clique labels;
    # volumes via endpoint union, conductance/modularity as explicit
    # double ratios of exact integer counts (no pow — IEEE multiply)
    o["community_quality"] = """
WITH pairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM documents a JOIN documents b
    ON a.doc_id % 7 = b.doc_id % 7 AND a.doc_id < b.doc_id
  WHERE a.doc_id < 450 AND b.doc_id < 450
),
labels AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id < 450 THEN doc_id % 3 ELSE doc_id END AS community
  FROM documents
),
tagged AS (
  SELECT p.u, p.v, la.community AS ca, lb.community AS cb
  FROM pairs p
  LEFT JOIN labels la ON p.u = la.id
  LEFT JOIN labels lb ON p.v = lb.id
),
m AS (SELECT count(*) AS m FROM tagged),
internal AS (
  SELECT ca AS community, count(*) AS internal_edges
  FROM tagged WHERE ca = cb GROUP BY ca
),
vol AS (
  SELECT community, count(*) AS volume FROM (
    SELECT ca AS community FROM tagged
    UNION ALL SELECT cb FROM tagged
  ) WHERE community IS NOT NULL GROUP BY community
),
sizes AS (SELECT community, count(*) AS n_nodes FROM labels GROUP BY community),
agg AS (
  SELECT s.community, s.n_nodes,
         coalesce(vol.volume, 0) AS volume,
         coalesce(internal.internal_edges, 0) AS internal_edges,
         coalesce(vol.volume, 0) - 2 * coalesce(internal.internal_edges, 0)
           AS cut_edges,
         (SELECT m FROM m) AS m
  FROM sizes s
  LEFT JOIN vol ON s.community = vol.community
  LEFT JOIN internal ON s.community = internal.community
)
SELECT community, n_nodes, volume, internal_edges, cut_edges,
       CASE WHEN least(volume, 2 * m - volume) <= 0 THEN 0.0
            ELSE round(cut_edges / least(volume, 2 * m - volume), 6)
       END AS conductance,
       round(internal_edges / m
             - (volume / (2.0 * m)) * (volume / (2.0 * m)), 6)
         AS modularity_part
FROM agg
"""

    # single-pass corpus profile; token count is the per-row filtered
    # whitespace split (no explode), dup rate from the md5 key
    o["corpus_describe"] = """
SELECT count(*) AS n_docs,
       CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_empty,
       CAST(SUM(len(list_filter(
         regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')))
            AS BIGINT) AS total_tokens,
       round(SUM(len(list_filter(
         regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')))
             / count(*), 6) AS avg_tokens,
       round(SUM(length(text)) / count(*), 6) AS avg_chars,
       count(DISTINCT md5(text)) AS n_distinct_texts,
       round(1.0 - count(DISTINCT md5(text)) / count(*), 6)
         AS exact_dup_rate
FROM documents
"""

    # reciprocal-rank fusion of two deterministic top-100 rankings
    # (longest docs; highest quality) — 12-dp reciprocal terms summed
    # as DECIMAL like functions/search.py rrf_fuse
    o["rrf_fuse"] = f"""
WITH qs AS ({o["quality_score"]}),
ra AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents QUALIFY rank <= 100
),
rb AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY quality_score DESC, doc_id ASC) AS rank
  FROM qs QUALIFY rank <= 100
),
u AS (
  SELECT doc_id,
         CAST(round(1.0 / (60 + rank), 12) AS DECIMAL(38,12)) AS term
  FROM ra
  UNION ALL
  SELECT doc_id, CAST(round(1.0 / (60 + rank), 12) AS DECIMAL(38,12))
  FROM rb
)
SELECT doc_id, count(*) AS n_lists,
       round(CAST(SUM(term) AS DOUBLE), 6) AS rrf_score
FROM u GROUP BY doc_id
"""

    o["kfold_split"] = f"""
SELECT doc_id,
       CAST(({BUCKET}) % 5 AS INTEGER) AS fold
FROM documents
"""

    o["bipartite_project"] = f"""
WITH {GRAPH_CTE},
e AS (SELECT DISTINCT source, target FROM edges),
keep AS (
  SELECT source FROM e GROUP BY source HAVING count(*) <= 60
),
ek AS (SELECT e.source, e.target FROM e JOIN keep ON e.source = keep.source)
SELECT a.target AS a, b.target AS b, count(*) AS n_shared
FROM ek a JOIN ek b ON a.source = b.source AND a.target < b.target
GROUP BY a.target, b.target
"""

    # greedy earliest-completion k-step funnel, unrolled: each step
    # pins min(ts) of qualifying events after the previous completion
    o["funnel_steps"] = """
WITH typed AS (
  SELECT event_type AS t, user_id AS u,
         epoch_us(ts) AS ts
  FROM events
),
s1 AS (SELECT u, min(ts) AS ts FROM typed WHERE t = 'view' GROUP BY u),
s2 AS (
  SELECT c.u, min(c.ts) AS ts
  FROM typed c JOIN s1 ON c.u = s1.u
  WHERE c.t = 'click' AND c.ts > s1.ts AND c.ts - s1.ts <= 7200000000
  GROUP BY c.u
),
s3 AS (
  SELECT c.u, min(c.ts) AS ts
  FROM typed c JOIN s2 ON c.u = s2.u
  WHERE c.t = 'purchase' AND c.ts > s2.ts AND c.ts - s2.ts <= 7200000000
  GROUP BY c.u
),
summary AS (
  SELECT 1 AS step, 'view' AS event_type, (SELECT count(*) FROM s1) AS n_users
  UNION ALL
  SELECT 2, 'click', (SELECT count(*) FROM s2)
  UNION ALL
  SELECT 3, 'purchase', (SELECT count(*) FROM s3)
)
SELECT step, event_type, n_users,
       CASE WHEN first_value(n_users) OVER (ORDER BY step
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) = 0
            THEN 0.0
            ELSE round(n_users / first_value(n_users) OVER (ORDER BY step
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6)
       END AS conversion_overall,
       CASE WHEN lag(n_users) OVER (ORDER BY step) IS NULL THEN 1.0
            WHEN lag(n_users) OVER (ORDER BY step) = 0 THEN 0.0
            ELSE round(n_users / lag(n_users) OVER (ORDER BY step), 6)
       END AS conversion_from_prev
FROM summary
"""

    # per-entity OLS trend on CENTERED time (exact decimal moments)
    o["trend_slope"] = """
WITH t0 AS (
  SELECT user_id, min(floor(epoch(ts))::BIGINT) AS t0 FROM events GROUP BY user_id
),
c AS (
  SELECT e.user_id,
         CAST(floor(epoch(e.ts))::BIGINT - t0.t0 AS DECIMAL(20,0)) AS t,
         CAST(e.value AS DECIMAL(18,6)) AS v
  FROM events e JOIN t0 ON e.user_id = t0.user_id
),
m AS (
  SELECT user_id, count(*) AS n_events,
         SUM(t) AS st, SUM(v) AS sv, SUM(t * v) AS stv, SUM(t * t) AS stt
  FROM c GROUP BY user_id
)
SELECT user_id, n_events,
       CASE WHEN CAST(n_events AS DOUBLE) * CAST(stt AS DOUBLE)
                 - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) <= 0 THEN NULL
            ELSE round(
              (CAST(n_events AS DOUBLE) * CAST(stv AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
              / (CAST(n_events AS DOUBLE) * CAST(stt AS DOUBLE)
                 - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) * 3600, 6)
       END AS slope_per_hour,
       CASE WHEN CAST(n_events AS DOUBLE) * CAST(stt AS DOUBLE)
                 - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) <= 0 THEN NULL
            ELSE round(
              (CAST(sv AS DOUBLE)
               - (CAST(n_events AS DOUBLE) * CAST(stv AS DOUBLE)
                  - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
                 / (CAST(n_events AS DOUBLE) * CAST(stt AS DOUBLE)
                    - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                 * CAST(st AS DOUBLE))
              / CAST(n_events AS DOUBLE), 6)
       END AS intercept
FROM m
"""

    o["attribute_mixing"] = f"""
WITH {GRAPH_CTE},
t AS (
  SELECT na.nationkey AS attr_a, nb.nationkey AS attr_b,
         count(*) AS n_edges
  FROM edges e
  JOIN nodes na ON e.source = na.id
  JOIN nodes nb ON e.target = nb.id
  GROUP BY 1, 2
)
SELECT attr_a, attr_b, n_edges,
       round(n_edges / (SELECT SUM(n_edges) FROM t), 6) AS fraction
FROM t
"""

    o["attribute_assortativity"] = f"""
WITH {GRAPH_CTE},
t AS (
  SELECT na.nationkey AS attr_a, nb.nationkey AS attr_b, count(*) AS c
  FROM edges e
  JOIN nodes na ON e.source = na.id
  JOIN nodes nb ON e.target = nb.id
  GROUP BY 1, 2
),
r AS (SELECT attr_a, SUM(c) AS ra FROM t GROUP BY attr_a),
cl AS (SELECT attr_b, SUM(c) AS cb FROM t GROUP BY attr_b),
s AS (
  SELECT SUM(CAST(r.ra AS DECIMAL(38,0)) * CAST(cl.cb AS DECIMAL(38,0)))
           AS S
  FROM r JOIN cl ON r.attr_a = cl.attr_b
),
b AS (
  SELECT CAST(SUM(c) AS DECIMAL(38,0)) AS m,
         CAST(SUM(CASE WHEN attr_a = attr_b THEN c ELSE 0 END)
              AS DECIMAL(38,0)) AS T
  FROM t
)
SELECT CAST(m AS BIGINT) AS n_edges,
       CASE WHEN CAST(m * m - S AS DOUBLE) = 0 THEN NULL
            ELSE round(CAST(m * T - S AS DOUBLE)
                       / CAST(m * m - S AS DOUBLE), 6)
       END AS assortativity
FROM b, s
"""

    o["dedup_corpus"] = f"""
WITH qc AS ({o["dedup_clusters"]})
SELECT d.doc_id, qc.cluster_id
FROM documents d JOIN qc ON d.doc_id = qc.doc_id
WHERE qc.doc_id = qc.cluster_id
"""

    # persisted-index one-call dedup: minhash_index_dup's estimate
    # pairs (threshold 0.25) folded through the same recursive reach +
    # min-id keep as dedup_corpus
    o["dedup_corpus_index"] = f"""
WITH RECURSIVE {SHINGLE_CTE},
hashed AS (
  SELECT id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_PRIME} AS h
  FROM sh
),
sigs AS (SELECT id, {sig_cols} FROM hashed GROUP BY id),
banded AS (
  SELECT id, h0, h1, h2, h3,
         0 AS band, h0::VARCHAR || '_' || h1::VARCHAR AS key FROM sigs
  UNION ALL
  SELECT id, h0, h1, h2, h3,
         1 AS band, h2::VARCHAR || '_' || h3::VARCHAR AS key FROM sigs
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
  WHERE a.id < b.id
    AND round(((a.h0 = b.h0)::INT + (a.h1 = b.h1)::INT
             + (a.h2 = b.h2)::INT + (a.h3 = b.h3)::INT) / 4.0, 6) >= 0.25
),
sym AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r
),
qc AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
SELECT d.doc_id, qc.cluster_id
FROM documents d JOIN qc ON d.doc_id = qc.doc_id
WHERE qc.doc_id = qc.cluster_id
"""

    # GraphSAGE fanout sampling, two unrolled hops: per-source
    # md5-coin rank windows over the symmetrized adjacency
    o["neighbor_sample"] = f"""
WITH {GRAPH_CTE},
e0 AS (
  SELECT DISTINCT least(source, target) AS u, greatest(source, target) AS v
  FROM edges
),
adj AS (
  SELECT u AS a, v AS b FROM e0 WHERE u <> v
  UNION ALL
  SELECT v, u FROM e0 WHERE u <> v
),
hop1 AS (
  SELECT a AS source, b AS target FROM (
    SELECT a, b, row_number() OVER (
      PARTITION BY a
      ORDER BY md5(CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR) || ':42')
               ASC, b ASC
    ) AS r
    FROM adj WHERE a IN (1, 2, 3)
  ) WHERE r <= 3
),
f2 AS (SELECT DISTINCT target AS id FROM hop1),
hop2 AS (
  SELECT a AS source, b AS target FROM (
    SELECT a, b, row_number() OVER (
      PARTITION BY a
      ORDER BY md5(CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR) || ':42')
               ASC, b ASC
    ) AS r
    FROM adj WHERE a IN (SELECT id FROM f2)
  ) WHERE r <= 2
)
SELECT 1 AS hop, source, target FROM hop1
UNION ALL
SELECT 2 AS hop, source, target FROM hop2
"""

    o["degree_distribution"] = f"""
WITH {GRAPH_CTE},
e0 AS (
  SELECT DISTINCT least(source, target) AS u, greatest(source, target) AS v
  FROM edges
),
sym AS (
  SELECT u AS a, v AS b FROM e0 WHERE u <> v
  UNION ALL
  SELECT v, u FROM e0 WHERE u <> v
),
deg AS (SELECT a AS id, count(*) AS degree FROM sym GROUP BY a),
alldeg AS (
  SELECT degree FROM deg
  UNION ALL
  SELECT CAST(0 AS BIGINT) FROM nodes n
  WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.id = n.id)
)
SELECT degree, count(*) AS n_nodes FROM alldeg GROUP BY degree
"""

    o["build_vocab"] = f"""
WITH {TOKS_CTE},
tf AS (
  SELECT tok, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok <> '' GROUP BY tok
),
total AS (SELECT SUM(n_occurrences) AS total FROM tf),
top AS (
  SELECT * FROM tf ORDER BY n_occurrences DESC, tok ASC LIMIT 50
)
SELECT CAST(row_number() OVER
         (ORDER BY n_occurrences DESC, tok ASC) AS INTEGER) AS rank,
       tok AS token, n_occurrences, n_docs,
       round(SUM(n_occurrences) OVER (
               ORDER BY n_occurrences DESC, tok ASC
               ROWS UNBOUNDED PRECEDING)
             / (SELECT total FROM total), 6) AS coverage
FROM top
"""

    o["pmi_bigrams"] = f"""
WITH {TOKS_CTE},
t2 AS (SELECT list_filter(t, x -> x <> '') AS t FROM toks),
uni AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(t) AS w FROM t2) GROUP BY w
),
nu AS (SELECT SUM(c) AS n FROM uni),
bg AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM (
    SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
    FROM t2 WHERE len(t) >= 2
  )
),
bc AS (SELECT w1, w2, count(*) AS n_pair FROM bg GROUP BY w1, w2),
nb AS (SELECT SUM(n_pair) AS nb FROM bc),
f AS (SELECT * FROM bc WHERE n_pair >= 5)
SELECT f.w1, f.w2, f.n_pair,
       round(ln(f.n_pair / (SELECT nb FROM nb))
             - ln(u1.c / (SELECT n FROM nu))
             - ln(u2.c / (SELECT n FROM nu)), 6) AS pmi
FROM f
JOIN uni u1 ON f.w1 = u1.w
JOIN uni u2 ON f.w2 = u2.w
"""

    # per-entity OHLC downsample: integer epoch bucketing + struct
    # min/max as the deterministic arg-min (lexicographic struct
    # ordering matches Spark's)
    o["resample_events"] = """
SELECT user_id,
       CAST(to_timestamp(
         (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600
       ) AS TIMESTAMP) AS bucket_start,
       count(*) AS n_events,
       (min(struct_pack(t := ts, i := event_id, v := value))).v AS open_v,
       (max(struct_pack(t := ts, i := event_id, v := value))).v AS close_v,
       min(value) AS min_v,
       max(value) AS max_v,
       round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_v
FROM events
GROUP BY 1, 2
"""

    # MRL truncation: first 16 dims re-normalized to unit L2; engines
    # compare posexploded scalars
    o["truncate_embeddings"] = """
WITH e AS (
  SELECT vec_id, (embedding::DOUBLE[])[1:16] AS t FROM embeddings
),
n AS (
  SELECT vec_id, t, sqrt(list_dot_product(t, t)) AS nrm FROM e
),
idx AS (
  SELECT n.*, unnest(generate_series(1, 16)) AS i FROM n
)
SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
       CASE WHEN nrm = 0 THEN t[i] ELSE round(t[i] / nrm, 6) END AS x
FROM idx
"""

    # product quantization with the first_ids codebook: per (vector,
    # subspace), nearest of 16 centroid subvectors by squared L2
    # (dot-product identity, 6-dp round before the argmin, ties to
    # the lowest code) — mirrors pq_encode's Arrow path
    o["pq_encode"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INTEGER) AS code,
         emb
  FROM (SELECT * FROM e ORDER BY vec_id ASC LIMIT 16)
),
js AS (SELECT unnest(generate_series(0, 3)) AS j),
sub AS (SELECT vec_id, j, emb[j*16+1 : j*16+16] AS sv FROM e, js),
cb AS (SELECT code, j, emb[j*16+1 : j*16+16] AS cv FROM seeds, js),
d AS (
  SELECT s.vec_id, s.j, c.code,
         round(list_dot_product(s.sv, s.sv)
               - 2 * list_dot_product(s.sv, c.cv)
               + list_dot_product(c.cv, c.cv), 6) AS d2
  FROM sub s JOIN cb c ON c.j = s.j
),
best AS (
  SELECT vec_id, j, code FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, j ORDER BY d2 ASC, code ASC) AS rn
    FROM d) WHERE rn = 1
)
SELECT vec_id, array_to_string(list(code ORDER BY j ASC), ',') AS codes
FROM best GROUP BY vec_id
"""

    # ADC search over the first_ids codes: per-query lookup table of
    # 6-dp-rounded subspace distances summed as exact DECIMALs
    o["pq_search"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INTEGER) AS code,
         emb
  FROM (SELECT * FROM e ORDER BY vec_id ASC LIMIT 16)
),
js AS (SELECT unnest(generate_series(0, 3)) AS j),
sub AS (SELECT vec_id, j, emb[j*16+1 : j*16+16] AS sv FROM e, js),
cb AS (SELECT code, j, emb[j*16+1 : j*16+16] AS cv FROM seeds, js),
d AS (
  SELECT s.vec_id, s.j, c.code,
         round(list_dot_product(s.sv, s.sv)
               - 2 * list_dot_product(s.sv, c.cv)
               + list_dot_product(c.cv, c.cv), 6) AS d2
  FROM sub s JOIN cb c ON c.j = s.j
),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, j ORDER BY d2 ASC, code ASC) AS rn
    FROM d) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, emb FROM e WHERE vec_id < 5),
qsub AS (SELECT query_id, j, emb[j*16+1 : j*16+16] AS qv FROM q, js),
lut AS (
  SELECT qs.query_id, qs.j, c.code,
         CAST(round(list_dot_product(qs.qv, qs.qv)
                    - 2 * list_dot_product(qs.qv, c.cv)
                    + list_dot_product(c.cv, c.cv), 6)
              AS DECIMAL(18,6)) AS dd
  FROM qsub qs JOIN cb c ON c.j = qs.j
),
scored AS (
  SELECT l.query_id, cd.vec_id, CAST(SUM(l.dd) AS DOUBLE) AS approx_d2
  FROM codes cd JOIN lut l ON l.j = cd.j AND l.code = cd.code
  GROUP BY 1, 2
)
SELECT query_id, vec_id,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY approx_d2 ASC, vec_id ASC)
       AS INTEGER) AS rank,
       approx_d2
FROM scored QUALIFY rank <= 5
"""

    # IVF-PQ with exhaustive probes == pure ADC over the same
    # first_ids codebook: cell routing never changes a no-residual
    # ADC score, so probing every cell IS pq_search — same oracle
    # (the cosine_topk_ivf / ivf_index_search trick)
    o["ivfpq_search"] = o["pq_search"]

    # chunked exhaustive-probe search: per-query independence makes
    # the 2-query batches union to exactly the one-shot result, and
    # exhaustive no-residual probing IS pq_search
    o["ivfpq_batched"] = o["pq_search"]

    # post-add IVF-PQ ≡ pq_search with the even-half first_ids
    # codebook over the full corpus (add encodes against the STORED
    # manifests; exhaustive probe makes routing irrelevant)
    o["ivfpq_add_search"] = o["pq_search"].replace(
        "FROM (SELECT * FROM e ORDER BY vec_id ASC LIMIT 16)",
        "FROM (SELECT * FROM e WHERE vec_id % 2 = 0"
        " ORDER BY vec_id ASC LIMIT 16)",
    )

    # OPQ: exhaustive no-residual probe over the rotated corpus IS
    # pq_search on x @ R — replay the Givens rotation (theta=0.6,
    # dim i paired with i+32) as two-term expressions; float64
    # literals round-trip exactly and the sparse matmul is
    # bit-identical to this form (zero terms are FP-neutral)
    import math as _math

    _c, _s = _math.cos(0.6), _math.sin(0.6)
    o["ivfpq_opq"] = o["pq_search"].replace(
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb"
        " FROM embeddings),",
        f"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS emb0
  FROM embeddings),
e AS (
  SELECT vec_id,
         list_transform(generate_series(1, 64), i ->
           CASE WHEN i <= 32 THEN {_c!r} * emb0[i] - {_s!r} * emb0[i+32]
                ELSE {_s!r} * emb0[i-32] + {_c!r} * emb0[i] END) AS emb
  FROM e0),""",
    )

    # IVF-PQ recall under genuine pruning: full pipeline replay —
    # first_ids coarse routing (8 cells, ties to the lowest list),
    # first_ids PQ codes (same CTEs as pq_search), each query probes
    # its 2 nearest cells, ADC-scores only vectors assigned to probed
    # cells, top-5 vs the exact 6-dp squared-L2 truth (self included:
    # ivfpq_search does not self-exclude and neither does the report)
    o["ivfpq_recall"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
coarse AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INTEGER)
           AS list_id,
         emb
  FROM (SELECT * FROM e ORDER BY vec_id ASC LIMIT 8)
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT v.vec_id, c.list_id,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             list_dot_product(v.emb, v.emb)
             - 2 * list_dot_product(v.emb, c.emb)
             + list_dot_product(c.emb, c.emb) ASC,
             c.list_id ASC) AS rn
    FROM e v, coarse c) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, emb FROM e WHERE vec_id < 10),
probes AS (
  SELECT query_id, list_id FROM (
    SELECT q.query_id, c.list_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             list_dot_product(q.emb, q.emb)
             - 2 * list_dot_product(q.emb, c.emb)
             + list_dot_product(c.emb, c.emb) ASC,
             c.list_id ASC) AS rn
    FROM q, coarse c) WHERE rn <= 2
),
seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INTEGER) AS code,
         emb
  FROM (SELECT * FROM e ORDER BY vec_id ASC LIMIT 16)
),
js AS (SELECT unnest(generate_series(0, 3)) AS j),
sub AS (SELECT vec_id, j, emb[j*16+1 : j*16+16] AS sv FROM e, js),
cb AS (SELECT code, j, emb[j*16+1 : j*16+16] AS cv FROM seeds, js),
d AS (
  SELECT s.vec_id, s.j, c.code,
         round(list_dot_product(s.sv, s.sv)
               - 2 * list_dot_product(s.sv, c.cv)
               + list_dot_product(c.cv, c.cv), 6) AS d2
  FROM sub s JOIN cb c ON c.j = s.j
),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, j ORDER BY d2 ASC, code ASC) AS rn
    FROM d) WHERE rn = 1
),
qsub AS (SELECT query_id, j, emb[j*16+1 : j*16+16] AS qv FROM q, js),
lut AS (
  SELECT qs.query_id, qs.j, c.code,
         CAST(round(list_dot_product(qs.qv, qs.qv)
                    - 2 * list_dot_product(qs.qv, c.cv)
                    + list_dot_product(c.cv, c.cv), 6)
              AS DECIMAL(18,6)) AS dd
  FROM qsub qs JOIN cb c ON c.j = qs.j
),
scored AS (
  SELECT l.query_id, cd.vec_id, CAST(SUM(l.dd) AS DOUBLE) AS approx_d2
  FROM codes cd
  JOIN assign a ON a.vec_id = cd.vec_id
  JOIN probes p ON p.list_id = a.list_id
  JOIN lut l ON l.query_id = p.query_id AND l.j = cd.j AND l.code = cd.code
  GROUP BY 1, 2
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY approx_d2 ASC, vec_id ASC) AS rk
    FROM scored) WHERE rk <= 5
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             round(list_dot_product(q.emb, q.emb)
               - 2 * list_dot_product(q.emb, c.emb)
               + list_dot_product(c.emb, c.emb), 6) ASC,
             c.vec_id ASC) AS rk
    FROM q, e c) WHERE rk <= 5
),
hits AS (
  SELECT t.query_id, count(*) AS n_hit
  FROM truth t JOIN approx a USING (query_id, vec_id)
  GROUP BY 1
),
perq AS (SELECT query_id, count(*) AS n_truth FROM truth GROUP BY 1)
SELECT perq.query_id,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       round(coalesce(n_hit, 0) / n_truth, 6) AS recall
FROM perq LEFT JOIN hits USING (query_id)
"""

    # residual IVFADC recall: same shape as ivfpq_recall but codes
    # and the ADC table are computed over RESIDUALS — corpus residual
    # = emb − coarse[assigned cell], query residual = emb − coarse[
    # probed cell] (one per probe), codebook seeds = the 16
    # smallest-id residuals.  Element-wise list arithmetic via
    # list_transform over generate_series.
    o["ivfpq_residual_recall"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
coarse AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INTEGER)
           AS list_id,
         emb
  FROM (SELECT * FROM e ORDER BY vec_id ASC LIMIT 8)
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT v.vec_id, c.list_id,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             list_dot_product(v.emb, v.emb)
             - 2 * list_dot_product(v.emb, c.emb)
             + list_dot_product(c.emb, c.emb) ASC,
             c.list_id ASC) AS rn
    FROM e v, coarse c) WHERE rn = 1
),
resid AS (
  SELECT v.vec_id, a.list_id,
         list_transform(generate_series(1, 64),
                        i -> v.emb[i] - c.emb[i]) AS emb
  FROM e v
  JOIN assign a ON a.vec_id = v.vec_id
  JOIN coarse c ON c.list_id = a.list_id
),
cseeds AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INTEGER) AS code,
         emb
  FROM (SELECT * FROM resid ORDER BY vec_id ASC LIMIT 16)
),
js AS (SELECT unnest(generate_series(0, 3)) AS j),
sub AS (SELECT vec_id, j, emb[j*16+1 : j*16+16] AS sv FROM resid, js),
cb AS (SELECT code, j, emb[j*16+1 : j*16+16] AS cv FROM cseeds, js),
d AS (
  SELECT s.vec_id, s.j, c.code,
         round(list_dot_product(s.sv, s.sv)
               - 2 * list_dot_product(s.sv, c.cv)
               + list_dot_product(c.cv, c.cv), 6) AS d2
  FROM sub s JOIN cb c ON c.j = s.j
),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, j ORDER BY d2 ASC, code ASC) AS rn
    FROM d) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, emb FROM e WHERE vec_id < 10),
probes AS (
  SELECT query_id, list_id FROM (
    SELECT q.query_id, c.list_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             list_dot_product(q.emb, q.emb)
             - 2 * list_dot_product(q.emb, c.emb)
             + list_dot_product(c.emb, c.emb) ASC,
             c.list_id ASC) AS rn
    FROM q, coarse c) WHERE rn <= 2
),
qres AS (
  SELECT p.query_id, p.list_id,
         list_transform(generate_series(1, 64),
                        i -> q.emb[i] - c.emb[i]) AS emb
  FROM probes p
  JOIN q ON q.query_id = p.query_id
  JOIN coarse c ON c.list_id = p.list_id
),
qsub AS (
  SELECT query_id, list_id, j, emb[j*16+1 : j*16+16] AS qv FROM qres, js
),
lut AS (
  SELECT qs.query_id, qs.list_id, qs.j, c.code,
         CAST(round(list_dot_product(qs.qv, qs.qv)
                    - 2 * list_dot_product(qs.qv, c.cv)
                    + list_dot_product(c.cv, c.cv), 6)
              AS DECIMAL(18,6)) AS dd
  FROM qsub qs JOIN cb c ON c.j = qs.j
),
scored AS (
  SELECT l.query_id, cd.vec_id, CAST(SUM(l.dd) AS DOUBLE) AS approx_d2
  FROM codes cd
  JOIN assign a ON a.vec_id = cd.vec_id
  JOIN lut l ON l.list_id = a.list_id AND l.j = cd.j AND l.code = cd.code
  GROUP BY 1, 2
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY approx_d2 ASC, vec_id ASC) AS rk
    FROM scored) WHERE rk <= 5
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             round(list_dot_product(q.emb, q.emb)
               - 2 * list_dot_product(q.emb, c.emb)
               + list_dot_product(c.emb, c.emb), 6) ASC,
             c.vec_id ASC) AS rk
    FROM q, e c) WHERE rk <= 5
),
hits AS (
  SELECT t.query_id, count(*) AS n_hit
  FROM truth t JOIN approx a USING (query_id, vec_id)
  GROUP BY 1
),
perq AS (SELECT query_id, count(*) AS n_truth FROM truth GROUP BY 1)
SELECT perq.query_id,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       round(coalesce(n_hit, 0) / n_truth, 6) AS recall
FROM perq LEFT JOIN hits USING (query_id)
"""

    # oversampled IVF-PQ + exact rerank: REUSES ivfpq_recall's CTE
    # chain (same first_ids router + codes + pruned ADC `scored`
    # table), takes the ADC top-15 as candidates, re-scores each
    # (query, vec) pair with the exact 6-dp squared-L2 brute
    # expression and keeps the top-5 — the SQL twin of
    # ann_rerank(ivfpq_search(k=15, n_probe=2), k=5)
    o["ivfpq_rerank"] = o["ivfpq_recall"].split(",\napprox AS (")[0] + """,
cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY approx_d2 ASC, vec_id ASC) AS rk
    FROM scored) WHERE rk <= 15
),
rer AS (
  SELECT cd.query_id, cd.vec_id,
         round(list_dot_product(q.emb, q.emb)
               - 2 * list_dot_product(q.emb, v.emb)
               + list_dot_product(v.emb, v.emb), 6) AS d2
  FROM cand cd
  JOIN q ON q.query_id = cd.query_id
  JOIN e v ON v.vec_id = cd.vec_id
)
SELECT query_id, vec_id, d2,
       CAST(row_number() OVER (PARTITION BY query_id
         ORDER BY d2 ASC, vec_id ASC) AS INTEGER) AS rank
FROM rer QUALIFY rank <= 5
"""

    # multilayer flatten: tagged union of the two customer layers,
    # shared nodes keep min(layer)'s attrs, out-degree counts the
    # UNIONED edges (overlap nodes emit one edge per layer — flatten
    # dedups nodes, never edges)
    o["multilayer_flatten"] = """
WITH c AS (
  SELECT CAST(c_custkey AS BIGINT) AS id, c_nationkey, c_acctbal
  FROM customer
),
east AS (
  SELECT id, round(c_acctbal, 2) AS score FROM c WHERE c_nationkey < 12
),
west AS (
  SELECT id, round(c_acctbal * 2, 2) AS score FROM c WHERE c_nationkey >= 5
),
tagged AS (
  SELECT 'east' AS layer, id, score FROM east
  UNION ALL
  SELECT 'west' AS layer, id, score FROM west
),
keep AS (SELECT id, min(layer) AS layer FROM tagged GROUP BY id),
nodes AS (
  SELECT t.id, t.score
  FROM tagged t JOIN keep k ON k.id = t.id AND k.layer = t.layer
),
srcs AS (
  SELECT id AS source FROM east UNION ALL SELECT id AS source FROM west
),
deg AS (SELECT source, count(*) AS out_degree FROM srcs GROUP BY source)
SELECT n.id, n.score,
       CAST(coalesce(d.out_degree, 0) AS BIGINT) AS out_degree
FROM nodes n LEFT JOIN deg d ON d.source = n.id
"""

    # kNN label vote: brute top-5 (self-excluded, 6-dp cosine ranks),
    # max-votes argmax with lowest-label ties
    o["knn_label_check"] = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings
  WHERE vec_id < 200
),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, c.label AS nl,
         round(list_dot_product(q.emb, c.emb)
           / (sqrt(list_dot_product(q.emb, q.emb))
              * sqrt(list_dot_product(c.emb, c.emb))), 6) AS w
  FROM e q, e c
  WHERE q.vec_id <> c.vec_id
),
ranked AS (
  SELECT qid, cid, nl,
         row_number() OVER (PARTITION BY qid ORDER BY w DESC, cid ASC) AS rk
  FROM scored
),
nb AS (
  SELECT qid, nl, count(*) AS votes FROM ranked
  WHERE rk <= 5 GROUP BY qid, nl
),
tp AS (SELECT qid, max(votes) AS t FROM nb GROUP BY qid),
win AS (
  SELECT nb.qid, min(nb.nl) AS knn_label
  FROM nb JOIN tp ON tp.qid = nb.qid AND nb.votes = tp.t
  GROUP BY nb.qid
)
SELECT e.vec_id, e.label, win.knn_label,
       coalesce(ag.votes, 0) AS n_agree,
       (win.knn_label IS NOT NULL AND win.knn_label <> e.label)
         AS is_suspect
FROM e
LEFT JOIN win ON win.qid = e.vec_id
LEFT JOIN nb ag ON ag.qid = e.vec_id AND ag.nl = e.label
"""

    # latest-wins upsert: incoming (src=1) beats existing on exact
    # (ts, tiebreak) ties; one struct-max aggregate
    o["merge_incremental"] = """
WITH inc AS (
  SELECT event_id, user_id, ts + INTERVAL 1 HOUR AS ts, event_type,
         round(value * 2, 2) AS value, 1 AS src
  FROM events WHERE event_id % 2 = 0
),
un AS (
  SELECT event_id, user_id, ts, event_type, value, 0 AS src FROM events
  UNION ALL SELECT * FROM inc
),
w AS (
  SELECT event_id,
         max(struct_pack(t := ts, u := user_id, s := src,
                         pu := user_id, pts := ts, pe := event_type,
                         pv := value)) AS m
  FROM un GROUP BY event_id
)
SELECT event_id, (m).pu AS user_id, (m).pts AS ts,
       (m).pe AS event_type, (m).pv AS value
FROM w
"""

    # bounded k-truss peel, unrolled: per round, per-edge triangle
    # support = common-neighbor count through the symmetric closure
    # (the oracle may be naive; Spark uses the oriented O(m^1.5)
    # enumeration — same semantics), then edges below k-2 drop.
    # Round count and k mirror the registered query exactly.
    _kt_k, _kt_rounds = 5, 3
    _kt = [
        "ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 450)",
        """e0 AS (SELECT DISTINCT u, v FROM (
  SELECT a.id AS u, b.id AS v FROM ids a
  JOIN ids b ON a.id % 7 = b.id % 7 AND a.id < b.id
  UNION ALL
  SELECT a.id AS u, b.id AS v FROM ids a JOIN ids b ON b.id = a.id + 1))""",
    ]
    for _i in range(_kt_rounds):
        _kt.append(
            f"und{_i} AS (SELECT u AS a, v AS b FROM e{_i} "
            f"UNION ALL SELECT v, u FROM e{_i})"
        )
        _kt.append(
            f"""sup{_i} AS (
  SELECT e.u, e.v, count(*) AS c FROM e{_i} e
  JOIN und{_i} x ON x.a = e.u
  JOIN und{_i} y ON y.a = e.v AND y.b = x.b
  GROUP BY e.u, e.v)"""
        )
        _kt.append(
            f"""e{_i + 1} AS (
  SELECT e.u, e.v FROM e{_i} e
  LEFT JOIN sup{_i} s ON s.u = e.u AND s.v = e.v
  WHERE coalesce(s.c, 0) >= {_kt_k - 2})"""
        )
    _kt.append(
        f"undF AS (SELECT u AS a, v AS b FROM e{_kt_rounds} "
        f"UNION ALL SELECT v, u FROM e{_kt_rounds})"
    )
    _kt.append(
        f"""supF AS (
  SELECT e.u, e.v, count(*) AS c FROM e{_kt_rounds} e
  JOIN undF x ON x.a = e.u
  JOIN undF y ON y.a = e.v AND y.b = x.b
  GROUP BY e.u, e.v)"""
    )
    o["k_truss"] = (
        "WITH "
        + ",\n".join(_kt)
        + f"""
SELECT e.u AS source, e.v AS target, coalesce(s.c, 0) AS support
FROM e{_kt_rounds} e LEFT JOIN supF s ON s.u = e.u AND s.v = e.v
"""
    )

    # edge jaccard: naive common-neighbor count twin (Spark uses the
    # oriented enumeration; same semantics) + degree joins
    o["edge_jaccard"] = """
WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 450),
e0 AS (SELECT DISTINCT u, v FROM (
  SELECT a.id AS u, b.id AS v FROM ids a
  JOIN ids b ON a.id % 7 = b.id % 7 AND a.id < b.id
  UNION ALL
  SELECT a.id AS u, b.id AS v FROM ids a JOIN ids b ON b.id = a.id + 1)),
nbt AS (SELECT u AS a, v AS b FROM e0 UNION ALL SELECT v, u FROM e0),
sup AS (
  SELECT e.u, e.v, count(*) AS c
  FROM e0 e JOIN nbt x ON x.a = e.u JOIN nbt y ON y.a = e.v AND y.b = x.b
  GROUP BY e.u, e.v
),
deg AS (SELECT a AS id, count(*) AS deg FROM nbt GROUP BY a)
SELECT e.u AS source, e.v AS target,
       coalesce(s.c, 0) AS n_common,
       round(coalesce(s.c, 0)
             / (du.deg + dv.deg - coalesce(s.c, 0)), 6) AS jaccard
FROM e0 e
LEFT JOIN sup s ON s.u = e.u AND s.v = e.v
JOIN deg du ON du.id = e.u
JOIN deg dv ON dv.id = e.v
"""

    # per-doc tf -> type/token/hapax aggregate
    o["lexical_diversity"] = f"""
WITH {TOKS_CTE.strip().rstrip()},
tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
tf AS (
  SELECT doc_id, tok, count(*) AS c FROM tok
  WHERE tok <> '' GROUP BY 1, 2
),
agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         count(*) AS n_types,
         count(CASE WHEN c = 1 THEN 1 END) AS hap
  FROM tf GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(agg.n_tokens, 0) AS n_tokens,
       coalesce(agg.n_types, 0) AS n_types,
       CASE WHEN agg.n_tokens > 0
            THEN round(agg.n_types / agg.n_tokens, 6) END AS ttr,
       CASE WHEN agg.n_types > 0
            THEN round(hap / agg.n_types, 6) END AS hapax_frac
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""

    # sentence segmentation: split on [.!?]+ runs, trim, drop empties
    o["sentence_stats"] = r"""
WITH segs AS (
  SELECT doc_id,
         list_filter(list_transform(
           regexp_split_to_array(text, '[.!?]+'), s -> trim(s)),
           s -> s <> '') AS ss
  FROM documents
),
tc AS (
  SELECT doc_id, ss,
         list_transform(ss, s -> len(regexp_split_to_array(s, '\s+'))) AS tk
  FROM segs
)
SELECT doc_id, len(ss) AS n_sentences,
       CASE WHEN len(ss) > 0
            THEN round(list_sum(tk) / len(ss), 6) END AS mean_sentence_tokens,
       CASE WHEN len(ss) > 0 THEN list_max(tk) END AS max_sentence_tokens
FROM tc
"""

    # hour-of-day profile from integer epoch arithmetic (tz-free)
    o["time_profile"] = """
WITH cells AS (
  SELECT event_type,
         CAST((CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24 AS INTEGER)
           AS hour,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
),
t AS (
  SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS tot
  FROM cells GROUP BY 1
)
SELECT c.event_type, c.hour, c.n_events,
       round(c.n_events / t.tot, 6) AS share
FROM cells c JOIN t USING (event_type)
"""

    # bounded h-index core decomposition, unrolled: per round, join
    # estimates onto the adjacency, windowed h-index per node
    _cn_rounds = 4
    _cn = [
        "ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 450)",
        """e0 AS (SELECT DISTINCT u, v FROM (
  SELECT a.id AS u, b.id AS v FROM ids a
  JOIN ids b ON a.id % 7 = b.id % 7 AND a.id < b.id
  UNION ALL
  SELECT a.id AS u, b.id AS v FROM ids a JOIN ids b ON b.id = a.id + 1))""",
        "nbt AS (SELECT u AS id, v AS nb FROM e0 UNION ALL SELECT v, u FROM e0)",
        "est0 AS (SELECT id, count(*) AS est FROM nbt GROUP BY id)",
    ]
    for _i in range(1, _cn_rounds + 1):
        _cn.append(
            f"""rk{_i} AS (
  SELECT n.id, e.est AS nb_est,
         row_number() OVER (
           PARTITION BY n.id ORDER BY e.est DESC, n.nb ASC) AS rk
  FROM nbt n JOIN est{_i - 1} e ON e.id = n.nb)"""
        )
        _cn.append(
            f"""est{_i} AS (
  SELECT id, max(least(rk, nb_est)) AS est FROM rk{_i} GROUP BY id)"""
        )
    o["core_numbers"] = (
        "WITH "
        + ",\n".join(_cn)
        + f"""
SELECT d.doc_id AS id, coalesce(e.est, 0) AS core_number
FROM documents d LEFT JOIN est{_cn_rounds} e ON e.id = d.doc_id
"""
    )

    # per-entity time grid via generate_series (distributed sequence()
    # in Spark), bucket-last via struct max, forward fill via
    # last_value IGNORE NULLS over the same ROWS frame
    o["fill_gaps"] = """
WITH pb AS (
  SELECT user_id,
         (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS b,
         (max(struct_pack(t := ts, i := event_id, v := value))).v AS v_last,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
),
span AS (SELECT user_id, min(b) AS b0, max(b) AS b1 FROM pb GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(b0, b1, 3600)) AS b FROM span
)
SELECT g.user_id,
       CAST(to_timestamp(g.b) AS TIMESTAMP) AS bucket_start,
       (last_value(CASE WHEN pb.cnt IS NOT NULL
                        THEN struct_pack(v := pb.v_last) END IGNORE NULLS)
        OVER (PARTITION BY g.user_id ORDER BY g.b ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)).v
         AS v_filled,
       pb.cnt IS NULL AS is_gap
FROM grid g LEFT JOIN pb ON pb.user_id = g.user_id AND pb.b = g.b
"""

    # trailing halving EWMA over 8 rows: exact integer numerator /
    # denominator (value honored to 6 dp, weights 1*2^(7-j)), one
    # floating division at the end — mirrors temporal.ewma verbatim
    _ew_lags = ",\n         ".join(
        f"lag(xi, {j}) OVER w AS x{j}" for j in range(8)
    )
    _ew_wts = [2 ** (7 - j) for j in range(8)]
    _ew_num = " + ".join(
        f"coalesce(x{j}, 0) * {w}" for j, w in enumerate(_ew_wts)
    )
    _ew_den = " + ".join(
        f"(CASE WHEN x{j} IS NOT NULL THEN {w} ELSE 0 END)"
        for j, w in enumerate(_ew_wts)
    )
    _ew_nw = " + ".join(
        f"(CASE WHEN x{j} IS NOT NULL THEN 1 ELSE 0 END)" for j in range(8)
    )
    o["ewma"] = f"""
WITH x AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 1000000) AS BIGINT) AS xi
  FROM events
),
l AS (
  SELECT user_id, event_id,
         {_ew_lags}
  FROM x
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id, event_id,
       {_ew_nw} AS n_window,
       round(CAST({_ew_num} AS DOUBLE) / ({_ew_den}) / 1e6, 6) AS ewma_v
FROM l
"""

    o["top_k_per_group"] = """
SELECT lang, doc_id, n_chars,
       CAST(row_number() OVER (
         PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC
       ) AS INTEGER) AS rank
FROM documents
QUALIFY rank <= 5
"""

    # exact ntile over the (score, id) total order + md5 stage shuffle;
    # composes the quality_score oracle verbatim
    o["curriculum_order"] = f"""
WITH qs AS ({o["quality_score"]})
SELECT doc_id, quality_score,
       CAST(ntile(4) OVER (ORDER BY quality_score ASC, doc_id ASC)
            AS INTEGER) AS stage,
       md5(CAST(doc_id AS VARCHAR) || ':42') AS shuffle_key
FROM qs
"""

    # chi2 identity sum_cells o^2/e - N with e = ra*cb/N; the per-cell
    # term is the same floor(o^2*1e15/(ra*cb)) scaled-integer quotient
    # (HUGEINT here, DECIMAL(38,0) `div` in Spark), so the sum is
    # exact and order-independent in both engines
    o["chi2_independence"] = """
WITH obs AS (
  SELECT lang, source, count(*)::HUGEINT AS o
  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY 1, 2
),
ra AS (SELECT lang, sum(o) AS ra FROM obs GROUP BY lang),
cb AS (SELECT source, sum(o) AS cb FROM obs GROUP BY source),
agg AS (
  SELECT sum((o * o * 1000000000000000) // (ra * cb)) AS s,
         sum(o) AS n,
         count(DISTINCT obs.lang) AS r,
         count(DISTINCT obs.source) AS c
  FROM obs JOIN ra USING (lang) JOIN cb USING (source)
)
SELECT round(n::DOUBLE * (s::DOUBLE / 1e15) - n::DOUBLE, 6) AS chi2,
       ((r - 1) * (c - 1))::BIGINT AS dof,
       round(CASE WHEN n > 0 AND least(r, c) > 1 THEN
         sqrt(greatest(n::DOUBLE * (s::DOUBLE / 1e15) - n::DOUBLE, 0)
              / (n::DOUBLE * (least(r, c) - 1))) END, 6) AS cramers_v,
       n::BIGINT AS n
FROM agg
"""

    # exact-integer running sums over distinct values (window here,
    # two-phase range scheme in Spark — same numbers); Kolmogorov
    # p-value with the identical two-regime 100-term series
    o["ks_test_2samp"] = """
WITH f AS (
  SELECT value,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')
  GROUP BY value
),
c AS (
  SELECT sum(ca) OVER (ORDER BY value) AS cuma,
         sum(cb) OVER (ORDER BY value) AS cumb
  FROM f
),
t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM f),
d AS (
  SELECT max(abs(cuma::DOUBLE / t.na - cumb::DOUBLE / t.nb)) AS ds
  FROM c, t
),
l AS (
  SELECT ds, ds * sqrt(t.na * t.nb / (t.na + t.nb)::DOUBLE) AS lam,
         t.na AS na, t.nb AS nb
  FROM d, t
)
SELECT round(ds, 6) AS d_stat, na::BIGINT AS n_a, nb::BIGINT AS n_b,
  round(least(greatest(CASE
    WHEN ds <= 0 THEN 1.0
    WHEN lam < 1.18 THEN
      1.0 - (sqrt(2 * pi()) / lam) *
      (SELECT sum(exp(-((2 * k - 1) * (2 * k - 1)) * pi() * pi()
                      / (8 * lam * lam)))
       FROM generate_series(1, 100) AS gs(k))
    ELSE
      2.0 * (SELECT sum(pow(-1.0, k - 1) * exp(-2.0 * k * k * lam * lam))
             FROM generate_series(1, 100) AS gs(k))
  END, 0.0), 1.0), 6) AS p_value
FROM l
"""

    # exact HALF-unit midranks from running sums over distinct
    # values; tie-corrected continuity-corrected normal z with the
    # identical A&S 7.1.26 polynomial
    o["mann_whitney_u"] = """
WITH f AS (
  SELECT value,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')
  GROUP BY value
),
c AS (
  SELECT ca, cb, ca + cb AS nv,
         sum(ca + cb) OVER (ORDER BY value) AS lcum
  FROM f
),
t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM f),
agg AS (
  SELECT sum(ca * (2 * (lcum - nv) + nv + 1)) AS r2a,
         sum(nv * nv * nv - nv) AS ties
  FROM c
),
s AS (
  SELECT (agg.r2a - t.na * (t.na + 1)) AS u2,
         (agg.r2a - t.na * (t.na + 1)) - t.na * t.nb AS diff2,
         (t.na * t.nb / 12.0)
           * ((t.na + t.nb + 1)
              - agg.ties / ((t.na + t.nb) * (t.na + t.nb - 1) * 1.0))
           AS var,
         t.na AS na, t.nb AS nb
  FROM agg, t
),
zrow AS (
  SELECT u2, na, nb,
         CASE WHEN var > 0 THEN
           (CASE WHEN diff2 > 0 THEN diff2 - 1
                 WHEN diff2 < 0 THEN diff2 + 1
                 ELSE 0 END) / (2.0 * sqrt(var))
         END AS z
  FROM s
)
SELECT u2 / 2.0 AS u_stat, na::BIGINT AS n_a, nb::BIGINT AS n_b,
       round(z, 6) AS z,
       round(least(1.0,
         2.0 * exp(-0.5 * abs(z) * abs(z)) / 2.5066282746310002
             * (0.319381530 * tt - 0.356563782 * tt * tt
                + 1.781477937 * tt * tt * tt
                - 1.821255978 * tt * tt * tt * tt
                + 1.330274429 * tt * tt * tt * tt * tt)), 6) AS p_value
FROM (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(z)) AS tt FROM zrow)
"""

    # Poisson(1) replicate weights from md5-hex string thresholds
    # (pure string compares — no float RNG anywhere); exact sums,
    # one double division per replicate mean
    from networkframe_spark.functions.stats import _poisson1_thresholds

    _thr = _poisson1_thresholds()
    _wcase = "CASE " + " ".join(
        f"WHEN h < '{t}' THEN {i}" for i, t in enumerate(_thr)
    ) + f" ELSE {len(_thr)} END"
    o["bootstrap_ci_mean"] = f"""
WITH base AS (
  SELECT event_id AS id, CAST(value AS DECIMAL(28,6)) AS v
  FROM events WHERE value IS NOT NULL
),
rep AS (
  SELECT v, r.b, md5('42:' || id || ':' || r.b) AS h
  FROM base, (SELECT unnest(range(0, 50)) AS b) r
),
means AS (
  SELECT b,
         CAST(sum(w * v) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS m
  FROM (SELECT v, b, {_wcase} AS w FROM rep)
  GROUP BY b
),
fences AS (
  SELECT round(quantile_cont(m, 0.025), 6) AS ci_lo,
         round(quantile_cont(m, 0.975), 6) AS ci_hi
  FROM means
),
overall AS (
  SELECT round(CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
           AS mean,
         count(*) AS n
  FROM base
)
SELECT mean, ci_lo, ci_hi, n::BIGINT AS n, 50::BIGINT AS n_boot
FROM overall, fences
"""

    # baseline-quantile bin edges (quantile_cont == Spark percentile,
    # both rounded 6 dp), literal-comparison binning, eps-floored
    # shares; total = sum of the ROUNDED per-bin terms (same
    # convention as the Spark side)
    o["psi_drift"] = """
WITH base AS (
  SELECT value AS v FROM events
  WHERE event_type = 'view' AND value IS NOT NULL
),
cur AS (
  SELECT value AS v FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
),
edges AS (
  SELECT DISTINCT unnest([
    round(quantile_cont(v, 0.1), 6), round(quantile_cont(v, 0.2), 6),
    round(quantile_cont(v, 0.3), 6), round(quantile_cont(v, 0.4), 6),
    round(quantile_cont(v, 0.5), 6), round(quantile_cont(v, 0.6), 6),
    round(quantile_cont(v, 0.7), 6), round(quantile_cont(v, 0.8), 6),
    round(quantile_cont(v, 0.9), 6)]) AS e
  FROM base
),
bb AS (
  SELECT 1 + (SELECT count(*) FROM edges WHERE edges.e < b.v) AS bin,
         count(*) AS cnt
  FROM base b GROUP BY 1
),
bc AS (
  SELECT 1 + (SELECT count(*) FROM edges WHERE edges.e < c.v) AS bin,
         count(*) AS cnt
  FROM cur c GROUP BY 1
),
allb AS (
  SELECT CAST(t.bin AS INTEGER) AS bin
  FROM (VALUES (1), (2), (3), (4), (5),
               (6), (7), (8), (9), (10)) AS t(bin)
  WHERE t.bin <= (SELECT count(*) + 1 FROM edges)
),
j AS (
  SELECT a.bin,
         coalesce(bb.cnt, 0) AS base_count,
         coalesce(bc.cnt, 0) AS cur_count
  FROM allb a LEFT JOIN bb ON a.bin = bb.bin
              LEFT JOIN bc ON a.bin = bc.bin
),
tot AS (SELECT sum(base_count) AS tb, sum(cur_count) AS tc FROM j),
per_bin AS (
  SELECT j.bin, j.base_count::BIGINT AS base_count,
         j.cur_count::BIGINT AS cur_count,
         round(j.base_count / tot.tb, 6) AS base_share,
         round(j.cur_count / tot.tc, 6) AS cur_share,
         round((greatest(j.cur_count / tot.tc, 1e-6)
                - greatest(j.base_count / tot.tb, 1e-6))
               * ln(greatest(j.cur_count / tot.tc, 1e-6)
                    / greatest(j.base_count / tot.tb, 1e-6)), 6)
           AS contribution
  FROM j, tot
)
SELECT p.*, (SELECT round(sum(contribution), 6) FROM per_bin) AS psi
FROM per_bin p
"""

    # per-query RRF: same 12-dp decimal-term convention as the
    # existing o["rrf_fuse"], grouped by (query, doc) with a
    # tie-broken fused rank
    o["rrf_fusion"] = """
WITH r1 AS (
  SELECT lang AS query_id, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents
),
r2 AS (
  SELECT lang AS query_id, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id ASC) AS rank
  FROM documents
),
u AS (
  SELECT query_id, doc_id,
         CAST(round(1.0 / (60 + rank), 12) AS DECIMAL(38,12)) AS term
  FROM r1 WHERE rank <= 20
  UNION ALL
  SELECT query_id, doc_id,
         CAST(round(1.0 / (60 + rank), 12) AS DECIMAL(38,12)) AS term
  FROM r2 WHERE rank <= 20
),
fused AS (
  SELECT query_id, doc_id, count(*) AS n_lists,
         round(CAST(sum(term) AS DOUBLE), 6) AS rrf_score
  FROM u GROUP BY 1, 2
)
SELECT query_id, doc_id, n_lists::BIGINT AS n_lists, rrf_score,
       row_number() OVER (
         PARTITION BY query_id
         ORDER BY rrf_score DESC, doc_id ASC
       ) AS fused_rank
FROM fused
"""

    # 3 unrolled greedy MMR steps over the cosine-top-8 candidates:
    # step 1 = lam*rel argmax; steps 2-3 subtract (1-lam) * the
    # 6-dp-rounded max cosine to the already-picked set.  All CTEs
    # MATERIALIZED (each step references the previous twice).
    o["mmr_rerank"] = """
WITH scored AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         round(list_dot_product((q.embedding::DOUBLE[]), (c.embedding::DOUBLE[]))
           / (sqrt(list_dot_product((q.embedding::DOUBLE[]), (q.embedding::DOUBLE[])))
              * sqrt(list_dot_product((c.embedding::DOUBLE[]), (c.embedding::DOUBLE[])))), 6) AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
),
cand AS MATERIALIZED (
  SELECT s.query_id, s.vec_id,
         CAST(round(s.cosine * 1000000) AS BIGINT) AS rel6,
         (e.embedding::DOUBLE[]) AS emb,
         sqrt(list_dot_product((e.embedding::DOUBLE[]),
                               (e.embedding::DOUBLE[]))) AS nrm
  FROM (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id ASC) AS rank
    FROM scored
  ) s JOIN embeddings e ON s.vec_id = e.vec_id
  WHERE s.rank <= 8
),
s1 AS MATERIALIZED (
  SELECT query_id, vec_id, rel6, emb, nrm,
         70 * rel6 AS mmr, 1 AS mmr_rank
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY 70 * rel6 DESC, vec_id ASC) AS rn
    FROM cand
  ) WHERE rn = 1
),
c1 AS MATERIALIZED (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM s1
                    WHERE s1.query_id = c.query_id
                      AND s1.vec_id = c.vec_id)
),
sc2 AS MATERIALIZED (
  SELECT c.query_id, c.vec_id, c.rel6, c.emb, c.nrm,
         70 * c.rel6 - 30 * max(
           CAST(round(round(list_dot_product(c.emb, s.emb)
                            / (c.nrm * s.nrm), 6) * 1000000) AS BIGINT)
         ) AS mmr
  FROM c1 c JOIN s1 s ON c.query_id = s.query_id
  GROUP BY c.query_id, c.vec_id, c.rel6, c.emb, c.nrm
),
s2 AS MATERIALIZED (
  SELECT query_id, vec_id, rel6, emb, nrm, mmr, 2 AS mmr_rank
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY mmr DESC, vec_id ASC) AS rn
    FROM sc2
  ) WHERE rn = 1
),
c2 AS MATERIALIZED (
  SELECT c.* FROM c1 c
  WHERE NOT EXISTS (SELECT 1 FROM s2
                    WHERE s2.query_id = c.query_id
                      AND s2.vec_id = c.vec_id)
),
sel2 AS MATERIALIZED (
  SELECT query_id, vec_id, emb, nrm FROM s1
  UNION ALL SELECT query_id, vec_id, emb, nrm FROM s2
),
sc3 AS MATERIALIZED (
  SELECT c.query_id, c.vec_id, c.rel6, c.emb, c.nrm,
         70 * c.rel6 - 30 * max(
           CAST(round(round(list_dot_product(c.emb, s.emb)
                            / (c.nrm * s.nrm), 6) * 1000000) AS BIGINT)
         ) AS mmr
  FROM c2 c JOIN sel2 s ON c.query_id = s.query_id
  GROUP BY c.query_id, c.vec_id, c.rel6, c.emb, c.nrm
),
s3 AS MATERIALIZED (
  SELECT query_id, vec_id, rel6, emb, nrm, mmr, 3 AS mmr_rank
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY mmr DESC, vec_id ASC) AS rn
    FROM sc3
  ) WHERE rn = 1
)
SELECT query_id, vec_id, mmr / 100000000.0 AS mmr_score, mmr_rank FROM s1
UNION ALL
SELECT query_id, vec_id, mmr / 100000000.0 AS mmr_score, mmr_rank FROM s2
UNION ALL
SELECT query_id, vec_id, mmr / 100000000.0 AS mmr_score, mmr_rank FROM s3
"""

    # nDCG/MRR/recall@10 over the cosine_topk prediction shape;
    # truth = same-label corpus vectors (self excluded)
    o["retrieval_metrics"] = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         round(list_dot_product((q.embedding::DOUBLE[]), (c.embedding::DOUBLE[]))
           / (sqrt(list_dot_product((q.embedding::DOUBLE[]), (q.embedding::DOUBLE[])))
              * sqrt(list_dot_product((c.embedding::DOUBLE[]), (c.embedding::DOUBLE[])))), 6) AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
),
pred AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, doc_id ASC) AS rank
    FROM scored
  ) WHERE rank <= 10
),
truth AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
    AND q.label = c.label
),
h AS (
  SELECT p.query_id, p.rank, 1.0 / log2(p.rank + 1) AS dcg_term
  FROM pred p JOIN truth t USING (query_id, doc_id)
),
perq AS (
  SELECT query_id, count(*) AS hits, min(rank) AS first,
         sum(dcg_term) AS dcg
  FROM h GROUP BY 1
),
ideal AS (
  SELECT query_id, count(*) AS n_rel,
         sum(CASE WHEN irank <= 10 THEN 1.0 / log2(irank + 1) END) AS idcg
  FROM (
    SELECT query_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY doc_id ASC) AS irank
    FROM truth
  ) GROUP BY 1
),
qs AS (SELECT DISTINCT query_id FROM pred)
SELECT qs.query_id,
       coalesce(n_rel, 0)::BIGINT AS n_rel,
       coalesce(hits, 0)::BIGINT AS hits,
       round(coalesce(hits, 0) / 10.0, 6) AS precision_at_k,
       round(CASE WHEN n_rel > 0 THEN coalesce(hits, 0) / n_rel END, 6)
         AS recall_at_k,
       round(coalesce(1.0 / first, 0.0), 6) AS mrr,
       round(coalesce(dcg, 0.0), 6) AS dcg,
       round(idcg, 6) AS idcg,
       round(CASE WHEN idcg > 0 THEN coalesce(dcg, 0.0) / idcg END, 6)
         AS ndcg
FROM qs LEFT JOIN perq USING (query_id) LEFT JOIN ideal USING (query_id)
"""

    # hard-sigmoid classifier: replay the ENTIRE training loop in SQL.
    # Every quantity is an exact scaled integer (features 1e-6,
    # weights/probabilities 1e-9), and DuckDB HUGEINT `//` truncates
    # toward zero exactly like Spark `div`, so the unrolled CTE chain
    # reproduces training bit-for-bit.
    def _clf_oracle(n_iter: int, lr_num: int, lr_den: int) -> str:
        u, wu = 1_000_000, 1_000_000_000
        n_chars = "GREATEST(length(text), 1)"
        n_words = (
            "GREATEST(length(string_split_regex(trim(text), '\\s+')), 1)"
        )
        feats = f"""f AS (
  SELECT CAST((n_chars > 300) AS BIGINT) AS y,
         CAST({u} AS HUGEINT) AS x0,
         CAST((LEAST({n_words}, 200) * {u}) // 200 AS HUGEINT) AS x1,
         CAST((length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))
               * {u}) // {n_chars} AS HUGEINT) AS x2,
         CAST((length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
               * {u}) // {n_chars} AS HUGEINT) AS x3,
         CAST((LEAST(length(text) // {n_words}, 20) * {u}) // 20
              AS HUGEINT) AS x4,
         CAST((length(regexp_replace(text, '[^ ]', '', 'g')) * {u})
              // {n_chars} AS HUGEINT) AS x5
  FROM documents
)"""

        def p_expr() -> str:
            z = " + ".join(f"wt.w{j} * f.x{j}" for j in range(6))
            return (
                f"LEAST(GREATEST(CAST(500000000 AS HUGEINT)"
                f" + (({z}) // {4 * u}), CAST(0 AS HUGEINT)),"
                f" CAST({wu} AS HUGEINT))"
            )

        ctes = [feats]
        ctes.append(
            "w_0 AS (SELECT "
            + ", ".join(f"CAST(0 AS HUGEINT) AS w{j}" for j in range(6))
            + ")"
        )
        for it in range(1, n_iter + 1):
            p = p_expr()
            gsums = ", ".join(
                f"SUM(({p} - CAST(f.y AS HUGEINT) * {wu}) * f.x{j}) AS g{j}"
                for j in range(6)
            )
            ctes.append(
                f"g_{it} AS (SELECT {gsums}, COUNT(*) AS n"
                f" FROM f CROSS JOIN w_{it - 1} wt)"
            )
            upds = ", ".join(
                f"wt.w{j} - (({lr_num} * g.g{j})"
                f" // ({lr_den} * CAST(g.n AS HUGEINT) * {u})) AS w{j}"
                for j in range(6)
            )
            ctes.append(
                f"w_{it} AS (SELECT {upds}"
                f" FROM w_{it - 1} wt CROSS JOIN g_{it} g)"
            )
        p = p_expr()
        fin = (
            f"fin AS (SELECT COUNT(*) AS n,"
            f" SUM(CASE WHEN (CASE WHEN {p} >= 500000000 THEN 1 ELSE 0 END)"
            f" = f.y THEN 1 ELSE 0 END) AS correct,"
            f" SUM({p}) AS psum FROM f CROSS JOIN w_{n_iter} wt)"
        )
        ctes.append(fin)
        wouts = ", ".join(
            f"CAST(wt.w{j} AS DOUBLE) / {wu} AS w{j}" for j in range(6)
        )
        return (
            "WITH " + ",\n".join(ctes) + "\n"
            "SELECT CAST(fin.n AS BIGINT) AS n,"
            " round(fin.correct / fin.n, 6) AS accuracy,"
            f" round(CAST(fin.psum AS DOUBLE) / (CAST(fin.n AS DOUBLE) * {wu}.0), 6)"
            " AS mean_p, "
            + wouts
            + f"\nFROM fin CROSS JOIN w_{n_iter} wt"
        )

    o["train_quality_classifier"] = _clf_oracle(4, 4, 1)

    # fixed-weight hard-sigmoid scoring (same feature map, literal
    # integer weights) shared by the two classifier-eval oracles
    def _clf_score_sql(weights_1e9: list[int]) -> str:
        u = 1_000_000
        n_chars = "GREATEST(length(text), 1)"
        n_words = (
            "GREATEST(length(string_split_regex(trim(text), '\\s+')), 1)"
        )
        xs = [
            f"CAST({u} AS HUGEINT)",
            f"CAST((LEAST({n_words}, 200) * {u}) // 200 AS HUGEINT)",
            f"CAST((length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))"
            f" * {u}) // {n_chars} AS HUGEINT)",
            f"CAST((length(regexp_replace(lower(text), '[^a-z]', '', 'g'))"
            f" * {u}) // {n_chars} AS HUGEINT)",
            f"CAST((LEAST(length(text) // {n_words}, 20) * {u}) // 20"
            " AS HUGEINT)",
            f"CAST((length(regexp_replace(text, '[^ ]', '', 'g')) * {u})"
            f" // {n_chars} AS HUGEINT)",
        ]
        z = " + ".join(
            f"CAST({int(w)} AS HUGEINT) * ({x})"
            for w, x in zip(weights_1e9, xs)
        )
        return (
            f"LEAST(GREATEST(CAST(500000000 AS HUGEINT) + (({z}) // {4 * u}),"
            " CAST(0 AS HUGEINT)), CAST(1000000000 AS HUGEINT))"
        )

    _w9 = [200000000, 4000000000, 0, -2000000000, 0, 0]
    _pint = _clf_score_sql(_w9)

    o["classification_report"] = f"""
WITH s AS (
  SELECT CAST((n_chars > 300) AS BIGINT) AS y,
         CASE WHEN {_pint} >= 500000000 THEN 1 ELSE 0 END AS pred
  FROM documents
),
agg AS (
  SELECT count(*) AS n,
         SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS fn,
         SUM(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) AS tn
  FROM s
)
SELECT CAST(n AS BIGINT) AS n, CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
       CAST(tn AS BIGINT) AS tn,
       round((tp + tn) / n, 6) AS accuracy,
       CASE WHEN tp + fp > 0 THEN round(tp / (tp + fp), 6) END AS precision,
       CASE WHEN tp + fn > 0 THEN round(tp / (tp + fn), 6) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN round(2 * tp / (2 * tp + fp + fn), 6) END AS f1
FROM agg
"""

    o["calibration_bins"] = f"""
WITH s AS (
  SELECT CAST((n_chars > 300) AS BIGINT) AS y,
         CAST({_pint} AS DOUBLE) / 1000000000.0 AS p
  FROM documents
)
SELECT LEAST(CAST(floor(p * 10) AS INT), 9) AS bin,
       count(*)::BIGINT AS n,
       round(CAST(SUM(CAST(p AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6)
         AS mean_p,
       round(SUM(y) / count(*), 6) AS pos_rate
FROM s GROUP BY 1
"""

    o["rolling_origin_splits"] = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
),
folds AS (SELECT UNNEST([1, 2, 3]) AS fold)
SELECT f.fold, e.event_id,
       CASE WHEN epoch_us(e.ts) <= b.mn + ((b.mx - b.mn) * f.fold) // 4
              THEN 'train'
            WHEN epoch_us(e.ts) <= b.mn + ((b.mx - b.mn) * (f.fold + 1)) // 4
              THEN 'test' END AS role
FROM events e CROSS JOIN b CROSS JOIN folds f
WHERE CASE WHEN epoch_us(e.ts) <= b.mn + ((b.mx - b.mn) * f.fold) // 4
             THEN 'train'
           WHEN epoch_us(e.ts) <= b.mn + ((b.mx - b.mn) * (f.fold + 1)) // 4
             THEN 'test' END IS NOT NULL
"""

    # cosine-cell pruned ANN search + recall@5 vs brute-force truth:
    # seeds = 8 smallest-id vectors (the embedding_clusters first_ids
    # convention), corpus cell = argmax 6-dp cosine (ties -> lowest
    # seed id), queries probe their 2 nearest cells; recall joins the
    # pruned top-5 against exact top-5.
    o["ann_recall_cell_pruned"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
seeds AS (
  SELECT vec_id AS sid, emb AS semb FROM e ORDER BY vec_id LIMIT 8
),
casg AS (
  SELECT vec_id, emb, cell FROM (
    SELECT e.vec_id, e.emb, s.sid AS cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             round(list_dot_product(e.emb, s.semb)
               / (sqrt(list_dot_product(e.emb, e.emb))
                  * sqrt(list_dot_product(s.semb, s.semb))), 6) DESC,
             s.sid ASC) AS rn
    FROM e, seeds s
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, q_emb, cell FROM (
    SELECT q.vec_id AS query_id, q.emb AS q_emb, s.sid AS cell,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             round(list_dot_product(q.emb, s.semb)
               / (sqrt(list_dot_product(q.emb, q.emb))
                  * sqrt(list_dot_product(s.semb, s.semb))), 6) DESC,
             s.sid ASC) AS rn
    FROM e q, seeds s WHERE q.vec_id < 10
  ) WHERE rn <= 2
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT p.query_id, c.vec_id,
           row_number() OVER (PARTITION BY p.query_id ORDER BY
             round(list_dot_product(p.q_emb, c.emb)
               / (sqrt(list_dot_product(p.q_emb, p.q_emb))
                  * sqrt(list_dot_product(c.emb, c.emb))), 6) DESC,
             c.vec_id ASC) AS rk
    FROM probes p JOIN casg c ON c.cell = p.cell
    WHERE c.vec_id <> p.query_id
  ) WHERE rk <= 5
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             round(list_dot_product(q.emb, c.emb)
               / (sqrt(list_dot_product(q.emb, q.emb))
                  * sqrt(list_dot_product(c.emb, c.emb))), 6) DESC,
             c.vec_id ASC) AS rk
    FROM e q, e c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
  ) WHERE rk <= 5
),
hits AS (
  SELECT t.query_id, count(*) AS n_hit
  FROM truth t JOIN approx a USING (query_id, vec_id)
  GROUP BY 1
),
perq AS (SELECT query_id, count(*) AS n_truth FROM truth GROUP BY 1)
SELECT perq.query_id,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       round(coalesce(n_hit, 0) / n_truth, 6) AS recall
FROM perq LEFT JOIN hits USING (query_id)
"""

    # LSH recall report: replay the 2-table x 4-plane banding with
    # the SAME deterministic md5-seeded Rademacher planes inlined as
    # +-1.0 literal arrays (signature_col computes dot(signs, emb)
    # left-to-right exactly like list_dot_product), bucket = sum of
    # (1<<j) sign bits, candidates = same-bucket pairs in any table,
    # then cosine top-5 and recall vs the brute-force truth.
    from networkframe_spark.functions.similarity import _hyperplane_signs

    def _plane_lit(row):
        return "[" + ", ".join(f"{float(s):.1f}" for s in row) + "]"

    def _bucket_expr(planes):
        return " + ".join(
            f"CASE WHEN list_dot_product(emb, {_plane_lit(row)}) >= 0"
            f" THEN {1 << j} ELSE 0 END"
            for j, row in enumerate(planes)
        )

    _lsh_tables = [
        _hyperplane_signs(4, 64, seed=42 + 1000 * t) for t in range(2)
    ]
    _banded_cte = " UNION ALL ".join(
        f"SELECT vec_id, emb, {t} AS tbl, {_bucket_expr(planes)} AS bucket"
        " FROM e"
        for t, planes in enumerate(_lsh_tables)
    )
    o["lsh_recall_report"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cb AS ({_banded_cte}),
qb AS (SELECT * FROM cb WHERE vec_id < 10),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
  FROM qb q JOIN cb c ON q.tbl = c.tbl AND q.bucket = c.bucket
  WHERE c.vec_id <> q.vec_id
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT cand.query_id, cand.vec_id,
           row_number() OVER (PARTITION BY cand.query_id ORDER BY
             round(list_dot_product(qe.emb, ce.emb)
               / (sqrt(list_dot_product(qe.emb, qe.emb))
                  * sqrt(list_dot_product(ce.emb, ce.emb))), 6) DESC,
             cand.vec_id ASC) AS rk
    FROM cand
    JOIN e qe ON qe.vec_id = cand.query_id
    JOIN e ce ON ce.vec_id = cand.vec_id
  ) WHERE rk <= 5
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             round(list_dot_product(q.emb, c.emb)
               / (sqrt(list_dot_product(q.emb, q.emb))
                  * sqrt(list_dot_product(c.emb, c.emb))), 6) DESC,
             c.vec_id ASC) AS rk
    FROM e q, e c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
  ) WHERE rk <= 5
),
hits AS (
  SELECT t.query_id, count(*) AS n_hit
  FROM truth t JOIN approx a USING (query_id, vec_id)
  GROUP BY 1
),
perq AS (SELECT query_id, count(*) AS n_truth FROM truth GROUP BY 1)
SELECT perq.query_id,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       round(coalesce(n_hit, 0) / n_truth, 6) AS recall
FROM perq LEFT JOIN hits USING (query_id)
"""

    # multi-probe LSH recall: corpus buckets as in lsh_recall_report;
    # query buckets expand to the Hamming-1 ball via xor() with
    # masks {0, 1, 2, 4, 8}; the rest (candidate cosine top-5 vs
    # brute-force truth) is identical
    o["lsh_multiprobe_recall"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cb AS ({_banded_cte}),
qb AS (
  SELECT vec_id, emb, tbl, xor(bucket, m.m) AS bucket
  FROM cb, (VALUES (0), (1), (2), (4), (8)) AS m(m)
  WHERE vec_id < 10
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
  FROM qb q JOIN cb c ON q.tbl = c.tbl AND q.bucket = c.bucket
  WHERE c.vec_id <> q.vec_id
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT cand.query_id, cand.vec_id,
           row_number() OVER (PARTITION BY cand.query_id ORDER BY
             round(list_dot_product(qe.emb, ce.emb)
               / (sqrt(list_dot_product(qe.emb, qe.emb))
                  * sqrt(list_dot_product(ce.emb, ce.emb))), 6) DESC,
             cand.vec_id ASC) AS rk
    FROM cand
    JOIN e qe ON qe.vec_id = cand.query_id
    JOIN e ce ON ce.vec_id = cand.vec_id
  ) WHERE rk <= 5
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             round(list_dot_product(q.emb, c.emb)
               / (sqrt(list_dot_product(q.emb, q.emb))
                  * sqrt(list_dot_product(c.emb, c.emb))), 6) DESC,
             c.vec_id ASC) AS rk
    FROM e q, e c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
  ) WHERE rk <= 5
),
hits AS (
  SELECT t.query_id, count(*) AS n_hit
  FROM truth t JOIN approx a USING (query_id, vec_id)
  GROUP BY 1
),
perq AS (SELECT query_id, count(*) AS n_truth FROM truth GROUP BY 1)
SELECT perq.query_id,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       round(coalesce(n_hit, 0) / n_truth, 6) AS recall
FROM perq LEFT JOIN hits USING (query_id)
"""

    # banded embedding near-dup: replay the 4-plane x 2-table banding
    # (same inlined plane literals / seeds as lsh_recall_report),
    # candidate pairs = same-(table, bucket) collisions with
    # id_a < id_b, then exact 6-dp cosine with the threshold applied
    # to the ROUNDED value — matching _embedding_duplicates_lsh,
    # which scores before deduplicating and filters post-round
    o["embedding_dedup_lsh"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cb AS ({_banded_cte}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM cb a JOIN cb b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM (
  SELECT cand.id_a, cand.id_b,
         round(list_dot_product(ea.emb, eb.emb)
           / (sqrt(list_dot_product(ea.emb, ea.emb))
              * sqrt(list_dot_product(eb.emb, eb.emb))), 6) AS cosine
  FROM cand
  JOIN e ea ON ea.vec_id = cand.id_a
  JOIN e eb ON eb.vec_id = cand.id_b
) WHERE cosine >= 0.42
"""

    # auto-plane policy twin: threshold 0.42 pins planes=4 at every
    # corpus size (recall cap), so the SQL banding is identical
    o["embedding_dedup_auto"] = o["embedding_dedup_lsh"]


    # semantic-decontamination LSH recall: truth = exhaustive
    # train x eval cosine pairs at the 0.42 threshold; pred = the
    # same pairs restricted to 2-table x 4-plane band collisions
    # (planes inlined exactly as lsh_recall_report's); per-eval
    # recall = kept / true contamination
    _sdr_banded = " UNION ALL ".join(
        f"SELECT vec_id, emb, {t} AS tbl, {_bucket_expr(planes)} AS bucket"
        " FROM e"
        for t, planes in enumerate(_lsh_tables)
    )
    o["semantic_decon_recall"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
truth AS (
  SELECT t.vec_id AS train_id, q.vec_id AS eval_id
  FROM e t, e q
  WHERE t.vec_id % 20 <> 0 AND q.vec_id % 20 = 0
    AND round(list_dot_product(t.emb, q.emb)
          / (sqrt(list_dot_product(t.emb, t.emb))
             * sqrt(list_dot_product(q.emb, q.emb))), 6) >= 0.42
),
bb AS ({_sdr_banded}),
cand AS (
  SELECT DISTINCT t.vec_id AS train_id, q.vec_id AS eval_id
  FROM bb t JOIN bb q ON t.tbl = q.tbl AND t.bucket = q.bucket
  WHERE t.vec_id % 20 <> 0 AND q.vec_id % 20 = 0
),
pred AS (SELECT * FROM truth INNER JOIN cand USING (train_id, eval_id)),
hits AS (
  SELECT eval_id, count(*) AS n_hit FROM pred GROUP BY 1
),
perq AS (SELECT eval_id, count(*) AS n_truth FROM truth GROUP BY 1)
SELECT perq.eval_id,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       round(coalesce(n_hit, 0) / n_truth, 6) AS recall
FROM perq LEFT JOIN hits USING (eval_id)
"""

    # temporal split: integer-microsecond time-range cutoff at 4/5
    # plus a 3600 s embargo band (truncating div on nonnegative span)
    o["time_split"] = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
),
c AS (SELECT mn + ((mx - mn) * 4) // 5 AS cutoff FROM b)
SELECT e.event_id,
       CASE WHEN e.ts IS NULL THEN NULL
            WHEN epoch_us(e.ts) <= c.cutoff THEN 'train'
            WHEN epoch_us(e.ts) <= c.cutoff + 3600000000 THEN 'embargo'
            ELSE 'test' END AS split
FROM events e CROSS JOIN c
"""

    return o
