"""Corpus-pipeline operator tests: deterministic sampling/splits,
leakage detection, repetition scoring, quality filtering, TF-IDF."""

import os

import pytest
from pyspark.sql import functions as F

from networkframe_spark.functions.pipeline import (
    add_repetition_score,
    filter_quality,
    hash_sample,
    leakage_report,
    stratified_sample,
    tf_idf_top_terms,
    token_histogram,
    train_test_split,
)

SF_DIR = "/root/testdata/sf0.001"

fixture = pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="fixtures absent")


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"doc number {i} " + ("spam spam spam " * (i % 3)) + "tail content here")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hash_sample_deterministic_and_composable(docs):
    s1 = {r["doc_id"] for r in hash_sample(docs, 0.5, seed=1).collect()}
    s2 = {r["doc_id"] for r in hash_sample(docs, 0.5, seed=1).collect()}
    assert s1 == s2  # rerun-stable
    # smaller fraction with same seed is a subset (threshold semantics)
    s_small = {r["doc_id"] for r in hash_sample(docs, 0.2, seed=1).collect()}
    assert s_small <= s1
    # partitioning must not change membership
    s_repart = {
        r["doc_id"] for r in hash_sample(docs.repartition(7), 0.5, seed=1).collect()
    }
    assert s_repart == s1
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_hash_sample_xxhash_variant(docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.5, seed=1, method="xxhash64").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 0.5, seed=1, method="xxhash64").collect()}
    assert a == b
    with pytest.raises(ValueError):
        hash_sample(docs, 0.5, method="sha9000")


def test_train_test_split_partition(docs):
    out = train_test_split(docs, test_fraction=0.25, seed=2).collect()
    splits = {r["doc_id"]: r["split"] for r in out}
    assert set(splits.values()) <= {"train", "test"}
    assert len(splits) == 40  # every row assigned exactly once
    # append-stability: splitting a subset gives the same assignments
    sub = docs.filter("doc_id < 20")
    sub_splits = {
        r["doc_id"]: r["split"]
        for r in train_test_split(sub, test_fraction=0.25, seed=2).collect()
    }
    assert all(splits[k] == v for k, v in sub_splits.items())


def test_stratified_sample(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(
        df, {"de": 1.0}, strata_col="lang", seed=3
    ).collect()
    # de kept fully, en dropped (default_fraction=0)
    assert {r["lang"] for r in out} == {"de"}
    assert len(out) == 50


def test_leakage_report_finds_planted_dup(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "unique train doc")],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(10, "  Alpha   Beta GAMMA "), (11, "unique test doc")],
        "doc_id long, text string",
    )
    out = leakage_report(train, test).collect()
    assert [(r["train_id"], r["test_id"]) for r in out] == [(1, 10)]


def test_repetition_score(spark):
    df = spark.createDataFrame(
        [
            (0, "a b a b a b"),          # bigrams: ab,ba,ab,ba,ab -> 3 dup / 5
            (1, "all words differ here"),
            (2, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["dup_ngram_frac"]
        for r in add_repetition_score(df, n=2).collect()
    }
    assert got[0] == pytest.approx(0.6)
    assert got[1] == 0.0
    assert got[2] == 0.0


def test_filter_quality_drops_spam(docs):
    kept = filter_quality(
        docs, min_quality=0.0, min_tokens=1, max_dup_ngram_frac=0.3
    )
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # i % 3 == 2 docs repeat "spam spam spam" twice -> high dup fraction
    assert all(i not in kept_ids for i in range(2, 40, 3) if i % 3 == 2) or kept_ids
    assert kept.columns == docs.columns  # original schema preserved


def test_token_histogram(spark):
    df = spark.createDataFrame(
        [(0, "one two three"), (1, "a b c d e f g"), (2, "")],
        "doc_id long, text string",
    )
    got = {r["token_bucket"]: r["n_docs"] for r in token_histogram(df, bucket_width=5).collect()}
    assert got == {0: 2, 5: 1}  # 3 and 0 tokens -> bucket 0; 7 -> bucket 5


def test_tfidf_top_terms(spark):
    df = spark.createDataFrame(
        [
            (0, "spark spark spark shuffle"),
            (1, "common common words words"),
            (2, "common shuffle words appear"),
        ],
        "doc_id long, text string",
    )
    out = tf_idf_top_terms(df, k=2, min_token_len=3)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    # 'spark' is unique to doc 0 and tf=3: must be its top term
    assert sorted(by_doc[0])[0][1] == "spark"
    assert all(len(v) <= 2 for v in by_doc.values())
    assert all(r["rank"] in (1, 2) for r in rows)


@fixture
def test_pipeline_on_fixture(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    sampled = hash_sample(docs, 0.25, seed=7).count()
    # md5 buckets are uniform: 25% +- a generous band
    assert 0.1 * n < sampled < 0.45 * n
    hist_total = (
        token_histogram(docs).agg(F.sum("n_docs").alias("s")).collect()[0]["s"]
    )
    assert hist_total == n


def test_dedup_chunks(spark):
    """Chunk-level exact dedup: a chunk repeated across docs survives
    only at its first (doc_id, pos) occurrence; unique text is kept
    verbatim; a fully-duplicated doc empties out."""
    from networkframe_spark.functions.pipeline import dedup_chunks

    boiler = " ".join(f"b{i}" for i in range(4))  # one whole chunk
    u1 = " ".join(f"x{i}" for i in range(4))
    u2 = " ".join(f"y{i}" for i in range(4))
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} {u1}"),   # chunks: [boiler, u1]
            (2, f"{u2} {boiler}"),   # boiler already seen -> dropped
            (3, boiler),             # fully duplicated -> empty
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_chunks(docs, chunk_tokens=4).collect()
    }
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["text_deduped"] == f"{boiler} {u1}"
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["text_deduped"] == u2
    assert out[3]["n_chunks"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["text_deduped"] == ""


def test_ngram_decontaminate(spark):
    """A planted eval quote inside a corpus doc is flagged; clean docs
    are not; counts are distinct-gram / distinct-eval-doc."""
    from networkframe_spark.functions.pipeline import ngram_decontaminate

    quote = "the quick brown fox jumps"
    corpus = spark.createDataFrame(
        [
            (1, f"intro words then {quote} and an outro"),
            (2, "completely unrelated content with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, quote), (101, f"{quote} again here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_decontaminate(corpus, eval_df, n=4).collect()}
    assert set(out) == {1}
    # 5-token quote -> two 4-grams, both shared; both eval docs contain them
    assert out[1]["n_shared_grams"] == 2
    assert out[1]["n_eval_docs"] == 2


def test_cap_per_group(spark):
    """Quota per group, deterministic, append-stable across groups."""
    from networkframe_spark.functions.pipeline import cap_per_group

    rows = [(i, "a") for i in range(10)] + [(100 + i, "b") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_group(df, "source", 4, key_col="doc_id")
    by_group = {}
    for r in out.collect():
        by_group.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_group["a"]) == 4
    assert by_group["b"] == {100, 101, 102}  # under quota: all kept
    # deterministic: same selection on re-run
    again = {r["doc_id"] for r in cap_per_group(df, "source", 4).collect()}
    assert again == by_group["a"] | by_group["b"]
    # append-stability: growing group b never changes group a's picks
    more = df.unionAll(
        spark.createDataFrame([(200 + i, "b") for i in range(5)], "doc_id long, source string")
    )
    out2 = {
        r["doc_id"]
        for r in cap_per_group(more, "source", 4).collect()
        if r["source"] == "a"
    }
    assert out2 == by_group["a"]


def test_dedup_chunks_hash_key_identical(spark):
    """key='hash' (128-bit md5 shuffle keys) must reproduce the
    text-key output exactly on the real fixture."""
    from networkframe_spark.functions.pipeline import dedup_chunks
    from networkframe_spark.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    a = {r["doc_id"]: (r["n_chunks"], r["n_kept"], r["text_deduped"])
         for r in dedup_chunks(docs).collect()}
    b = {r["doc_id"]: (r["n_chunks"], r["n_kept"], r["text_deduped"])
         for r in dedup_chunks(docs, key="hash").collect()}
    assert a == b


def test_split_by_cluster_no_straddle(spark):
    """Near-duplicate pairs must always land on the same side; every
    doc is assigned; cluster reps drive the bucket."""
    from networkframe_spark.functions.pipeline import split_by_cluster

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(30)], "doc_id long, text string"
    )
    # chain 0~1~2 one cluster; 10~11 another; rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r for r in split_by_cluster(docs, pairs, test_fraction=0.5).collect()}
    assert len(out) == 30
    assert out[0]["cluster_id"] == out[1]["cluster_id"] == out[2]["cluster_id"] == 0
    assert out[0]["split"] == out[1]["split"] == out[2]["split"]
    assert out[10]["split"] == out[11]["split"]
    # singletons bucket on their own id; with fraction 0.5 both sides occur
    assert {r["split"] for r in out.values()} == {"train", "test"}


# ---------------------------------------------------------------------------
# round-5 ops: line dedup, chunking, domain mixing, shuffle, percentile gate
# ---------------------------------------------------------------------------
def test_dedup_lines_removes_boilerplate(spark):
    from networkframe_spark.functions.pipeline import dedup_lines

    rows = [
        (1, "COOKIE BANNER\nreal content one\nfooter"),
        (2, "cookie banner\nreal content two\nfooter"),
        (3, "cookie banner\nunique text\nFOOTER"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df, min_docs=3).collect()}
    # "cookie banner" and "footer" normalize identically across all 3
    assert out[1]["text"] == "real content one"
    assert out[2]["text"] == "real content two"
    assert out[3]["text"] == "unique text"
    assert all(out[i]["n_removed"] == 2 and out[i]["n_lines"] == 3 for i in (1, 2, 3))


def test_dedup_lines_keeps_order_and_empty_lines_safe(spark):
    from networkframe_spark.functions.pipeline import dedup_lines

    rows = [(1, "a\n\nb\n\nc"), (2, "x\n\ny\n\nz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in dedup_lines(df, min_docs=2).collect()}
    # empty lines appear in both docs but are never boilerplate-removed
    assert out[1] == "a\n\nb\n\nc" and out[2] == "x\n\ny\n\nz"


def test_chunk_documents_overlap_and_coverage(spark):
    from networkframe_spark.functions.pipeline import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = {
        r["chunk_id"]: r for r in chunk_documents(df, chunk_size=4, stride=3).collect()
    }
    # starts 0,3,6,9 -> 4 chunks; last is the 1-token tail
    assert sorted(chunks) == [0, 1, 2, 3]
    assert chunks[0]["chunk_text"] == "t0 t1 t2 t3"
    assert chunks[1]["chunk_text"] == "t3 t4 t5 t6"  # 1-token overlap
    assert chunks[3]["chunk_text"] == "t9" and chunks[3]["n_tokens"] == 1
    # every token appears in at least one chunk
    seen = set()
    for r in chunks.values():
        seen |= set(r["chunk_text"].split())
    assert seen == {f"t{i}" for i in range(10)}


def test_mix_domains_targets_and_determinism(spark):
    from networkframe_spark.functions.pipeline import mix_domains

    rows = [(i, "a" if i < 400 else "b") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # target 1:1 from a 2:1 corpus -> domain b (200 rows) binds; a
    # keeps ~200 of 400 via the hash filter
    out = mix_domains(df, {"a": 1.0, "b": 1.0}, domain_col="source")
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts["b"] == 200
    assert abs(counts["a"] - 200) < 40  # hash-bucket granularity
    # rerun-stable
    again = mix_domains(df, {"a": 1.0, "b": 1.0}, domain_col="source")
    assert {r["doc_id"] for r in out.collect()} == {
        r["doc_id"] for r in again.collect()
    }
    # unknown domains are dropped
    assert mix_domains(df, {"a": 1.0}, domain_col="source").filter(
        "source = 'b'").count() == 0


def test_global_shuffle_deterministic_full_permutation(spark):
    from networkframe_spark.functions.pipeline import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    o1 = [r["doc_id"] for r in global_shuffle(df, seed=1).collect()]
    o2 = [r["doc_id"] for r in global_shuffle(df, seed=1).collect()]
    o3 = [r["doc_id"] for r in global_shuffle(df, seed=2).collect()]
    assert o1 == o2  # reproducible epoch
    assert sorted(o1) == list(range(100))  # a permutation, nothing lost
    assert o1 != o3  # different seed, different order
    assert o1 != list(range(100))  # actually shuffled


def test_filter_by_percentile_above_below(spark):
    from networkframe_spark.functions.pipeline import filter_by_percentile

    df = spark.createDataFrame([(i, float(i)) for i in range(101)],
                               "doc_id long, score double")
    top = filter_by_percentile(df, "score", pct=0.9, keep="above")
    assert top.count() == 11  # scores 90..100 (exact percentile = 90.0)
    bot = filter_by_percentile(df, "score", pct=0.1, keep="below")
    assert bot.count() == 11
    with pytest.raises(ValueError):
        filter_by_percentile(df, "score", keep="middle")


def test_semantic_dedup_finds_planted_pairs(spark):
    from networkframe_spark.functions.dedup import semantic_dedup

    # seeds (first_ids) are vectors 0 and 1 — one per axis group, so
    # each group's near-dup lands in its seed's cell (a near-dup that
    # IS itself a seed would straddle cells: the SemDeDup tradeoff)
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 0
        (3, [0.01, 0.999, 0.0]),   # near-dup of 1
        (4, [0.0, 0.0, 1.0]),      # isolated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = semantic_dedup(df, n_clusters=2, threshold=0.95, init="first_ids")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(0, 2), (1, 3)}


def test_semantic_dedup_cluster_guard(spark):
    from networkframe_spark.functions.dedup import semantic_dedup

    rows = [(i, [1.0, 0.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="refused"):
        semantic_dedup(df, n_clusters=1, exact_max_cluster_rows=10).collect()


def test_semantic_dedup_kmeans_init_runs(spark):
    from networkframe_spark.functions.dedup import semantic_dedup

    rows = [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)])
            for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = semantic_dedup(df, n_clusters=3, threshold=0.99, init="kmeans")
    # identical vectors within each residue class must pair up inside
    # their cell
    assert pairs.count() > 0
    for r in pairs.collect():
        assert r["id_a"] % 3 == r["id_b"] % 3


def test_semantic_dedup_arrow_matches_expr(spark):
    """The Arrow matmul scoring path must produce the same pair set
    and 6-dp cosines as the SQL-expression fold on the real fixture
    embeddings (threshold away from float-noise boundaries)."""
    import os

    from networkframe_spark.functions.dedup import semantic_dedup
    from networkframe_spark.sources import read_embeddings

    if not os.path.isdir("/root/testdata/sf0.001"):
        import pytest as _pytest

        _pytest.skip("fixtures absent")
    emb = read_embeddings(spark, "/root/testdata/sf0.001")
    kw = dict(n_clusters=8, threshold=0.35, init="first_ids")
    expr = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semantic_dedup(emb, score="expr", **kw).collect()
    }
    arrow = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semantic_dedup(emb, score="arrow", **kw).collect()
    }
    assert expr.keys() == arrow.keys() and len(expr) > 0
    for k in expr:
        assert abs(expr[k] - arrow[k]) < 2e-6, k


def test_dedup_lines_literal_separator(spark):
    """sep is a literal delimiter, not a regex: '|' and '.' must not
    split on every character."""
    from networkframe_spark.functions.pipeline import dedup_lines

    rows = [(1, "keep me|common"), (2, "also kept|common")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df, min_docs=2, sep="|").collect()}
    assert out[1]["text"] == "keep me" and out[2]["text"] == "also kept"
    assert out[1]["n_lines"] == 2 and out[1]["n_removed"] == 1


def test_mix_domains_missing_weighted_domain_raises(spark):
    from networkframe_spark.functions.pipeline import mix_domains

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="absent"):
        mix_domains(df, {"a": 1.0, "typo_domain": 1.0}, domain_col="source")


def test_semantic_dedup_rejects_bad_score(spark):
    from networkframe_spark.functions.dedup import semantic_dedup

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="score"):
        semantic_dedup(df, score="arow")


def test_filter_by_percentile_quoted_identifier_and_pct_validation(spark):
    from networkframe_spark.functions.pipeline import filter_by_percentile

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "doc_id long, `my score` double"
    )
    kept = filter_by_percentile(df, "my score", pct=0.5, keep="above")
    assert kept.count() == 5
    import pytest as _pytest

    with _pytest.raises(ValueError):
        filter_by_percentile(df, "my score", pct=1.5)
    with _pytest.raises(ValueError):
        filter_by_percentile(df, "my score", pct=-0.1)


def test_dedup_lines_sep_containing_regex_quote_terminator(spark):
    from networkframe_spark.functions.pipeline import dedup_lines

    sep = "\\E|"  # raw backslash-E then pipe: breaks naive \Q...\E quoting
    docs = [
        (1, sep.join(["boiler", "alpha"])),
        (2, sep.join(["boiler", "beta"])),
        (3, sep.join(["boiler", "gamma"])),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df, min_docs=3, sep=sep).collect()}
    assert out[1]["text"] == "alpha" and out[1]["n_removed"] == 1
    assert out[2]["text"] == "beta" and out[2]["n_lines"] == 2


def test_curriculum_order_stages_and_determinism(spark):
    """ntile semantics (larger stages first: 10 rows / 3 stages ->
    4,3,3), easy-first ordering by score, md5-shuffled within stage,
    and bit-identical across runs."""
    from networkframe_spark.functions.pipeline import curriculum_order

    docs = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "doc_id long, score double"
    )
    out = curriculum_order(docs, "score", n_stages=3, key_col="doc_id")
    rows = out.collect()
    sizes = {}
    for r in rows:
        sizes[r["stage"]] = sizes.get(r["stage"], 0) + 1
    assert sizes == {1: 4, 2: 3, 3: 3}
    # stage 1 holds the 4 lowest scores (curriculum: easy first)
    assert {r["doc_id"] for r in rows if r["stage"] == 1} == {0, 1, 2, 3}
    # returned order: stage-major, md5 shuffle key within stage
    seq = [(r["stage"], r["shuffle_key"]) for r in rows]
    assert seq == sorted(seq)
    again = curriculum_order(docs, "score", n_stages=3, key_col="doc_id")
    assert [r["doc_id"] for r in again.collect()] == [
        r["doc_id"] for r in rows
    ]
    # anti-curriculum flips stage 1 to the hardest docs
    hard = curriculum_order(
        docs, "score", n_stages=3, key_col="doc_id", ascending=False
    )
    assert {r["doc_id"] for r in hard.collect() if r["stage"] == 1} == {
        6, 7, 8, 9,
    }


def test_corpus_describe_profile(spark):
    """Four docs: one empty, two identical -> dup rate 0.25 (4 docs, 3
    distinct texts); token/char averages straightforward."""
    from networkframe_spark.functions.pipeline import corpus_describe

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y"), (4, "")],
        "doc_id long, text string",
    )
    r = corpus_describe(docs).collect()[0]
    assert r["n_docs"] == 4 and r["n_empty"] == 1
    assert r["total_tokens"] == 8
    assert r["avg_tokens"] == 2.0
    assert r["n_distinct_texts"] == 3
    assert r["exact_dup_rate"] == 0.25


def test_kfold_split_partition_and_balance(spark):
    """Every row gets exactly one fold in [0, k); assignment is
    deterministic and append-stable (a subset keeps its folds)."""
    import pytest
    from networkframe_spark.functions.pipeline import kfold_split

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(200)], "doc_id long, text string"
    )
    out = kfold_split(docs, k=4).collect()
    folds = {r["doc_id"]: r["fold"] for r in out}
    assert set(folds.values()) <= {0, 1, 2, 3}
    # roughly balanced (md5 uniformity): each fold within [20, 80]
    from collections import Counter

    counts = Counter(folds.values())
    assert all(20 <= counts[f] <= 80 for f in range(4))
    sub = kfold_split(docs.filter("doc_id < 50"), k=4).collect()
    assert all(folds[r["doc_id"]] == r["fold"] for r in sub)
    with pytest.raises(ValueError):
        kfold_split(docs, k=1)


def test_perplexity_buckets_thirds(spark):
    """Non-empty docs split into head/middle/tail by fluency; the
    common-token doc outranks the rare-token doc; empty doc gets a
    NULL bucket; approx mode agrees on this tiny corpus."""
    from networkframe_spark.functions.pipeline import perplexity_buckets

    docs = spark.createDataFrame(
        [
            (0, "the the the the the"),        # most corpus-common tokens
            (1, "the the alpha beta"),          # mixed
            (2, "zeta qoph xylem vug"),         # corpus-rare tokens
            (3, ""),                            # empty -> NULL bucket
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(docs).collect()}
    assert got[0] == "head"
    assert got[2] == "tail"
    assert got[3] is None
    approx = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(docs, approx=True).collect()
    }
    assert approx[0] == "head" and approx[2] == "tail" and approx[3] is None


def test_weighted_sample_k_properties(spark):
    """Exactly k rows, deterministic across calls, zero-weight rows
    excluded, and heavier rows win on average (a weight-10^6 row is
    effectively always picked over weight-1 rows)."""
    from networkframe_spark.functions.pipeline import weighted_sample_k

    rows = [(i, 1.0) for i in range(100)] + [(100, 1e6), (101, 0.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    s1 = {r["doc_id"] for r in weighted_sample_k(df, "w", 10).collect()}
    s2 = {r["doc_id"] for r in weighted_sample_k(df, "w", 10).collect()}
    assert s1 == s2 and len(s1) == 10
    assert 100 in s1  # the heavy row
    assert 101 not in s1  # zero weight excluded


def test_group_rare_categories_fold(spark):
    from networkframe_spark.functions.pipeline import group_rare_categories

    df = spark.createDataFrame(
        [(i, "big") for i in range(10)] + [(10, "tiny"), (11, None)],
        "doc_id long, cat string",
    )
    got = {
        r["doc_id"]: r["cat_folded"]
        for r in group_rare_categories(df, "cat", min_count=5).collect()
    }
    assert got[0] == "big"
    assert got[10] == "__other__"
    assert got[11] == "__other__"  # null folds too


def test_dup_ngram_fraction_boilerplate(spark):
    """Two docs sharing a boilerplate half score ~0.5; a unique doc
    scores 0; an empty doc scores NULL; internal repetition alone does
    NOT raise the score (cross-document signal only)."""
    from networkframe_spark.functions.pipeline import dup_ngram_fraction

    boiler = " ".join(f"b{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + " ".join(f"x{i}" for i in range(10))),
            (2, boiler + " " + " ".join(f"y{i}" for i in range(10))),
            (3, " ".join(f"z{i}" for i in range(20))),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_ngram_fraction(docs, n=4).collect()}
    # 20 tokens -> 17 4-grams; the 7 grams fully inside the boilerplate
    # prefix are shared between docs 1 and 2
    assert got[1]["n_grams"] == 17 and abs(got[1]["dup_frac"] - 7 / 17) < 1e-6
    assert got[2]["dup_frac"] == got[1]["dup_frac"]
    assert got[3]["dup_frac"] == 0.0
    assert got[4]["n_grams"] == 0 and got[4]["dup_frac"] is None


def test_exact_substring_decontaminate_pigeonhole(spark):
    """A corpus doc embedding a 50-token eval run at an arbitrary
    offset is always flagged at (window=25, stride=26) — the
    pigeonhole guarantee — while disjoint text is not; short docs
    match whole-text."""
    from networkframe_spark.functions.pipeline import (
        exact_substring_decontaminate,
    )

    eval_tokens = [f"e{i}" for i in range(50)]
    noise = [f"x{i}" for i in range(40)]
    corpus = spark.createDataFrame(
        [
            # the 50-token eval run at offset 17 — awkward alignment
            (1, " ".join(noise[:17] + eval_tokens + noise[17:])),
            (2, " ".join(f"y{i}" for i in range(80))),  # clean
            (3, "tiny shared doc"),  # short doc, whole-text window
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, " ".join(eval_tokens)), (101, "tiny shared doc")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in exact_substring_decontaminate(corpus, ev).collect()
    }
    assert 1 in got and got[1]["n_eval_docs"] == 1
    assert 2 not in got
    assert 3 in got and got[3]["n_eval_docs"] == 1


def test_group_rare_categories_frequent_null_kept(spark):
    """A NULL category whose count clears min_count is a KEPT
    category (stays NULL in the folded column), not other_label — the
    membership test rides an indicator column, not the NULL-valued
    join key itself."""
    from networkframe_spark.functions.pipeline import group_rare_categories

    df = spark.createDataFrame(
        [(i, None) for i in range(10)] + [(10, "tiny")],
        "doc_id long, cat string",
    )
    got = {
        r["doc_id"]: r["cat_folded"]
        for r in group_rare_categories(df, "cat", min_count=5).collect()
    }
    assert got[0] is None  # frequent NULL kept as NULL
    assert got[10] == "__other__"


def test_target_encoding_shrinks_to_prior(spark):
    """A 1-row category lands near the prior; a large category stays
    near its own mean; exact decimal arithmetic."""
    from networkframe_spark.functions.pipeline import target_encoding

    rows = [(i, "big", 10.0) for i in range(100)] + [(100, "small", 100.0)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    got = {
        r["cat"]: r["cat_te"]
        for r in target_encoding(df, "cat", "y", smoothing=20.0).collect()
    }
    prior = (100 * 10.0 + 100.0) / 101
    assert got["big"] == round((100 * 10.0 + 20 * prior) / 120.0, 6)
    assert got["small"] == round((100.0 + 20 * prior) / 21.0, 6)
    assert abs(got["small"] - prior) < abs(100.0 - prior)  # shrunk


def test_salted_join_matches_plain_join(spark):
    """Inner and left salted joins are row-identical to the unsalted
    joins, including unmatched-left rows and a hot key."""
    from networkframe_spark.functions.pipeline import salted_join

    left = spark.createDataFrame(
        [(i, "hot" if i < 50 else f"k{i}") for i in range(60)],
        "id long, k string",
    )
    right = spark.createDataFrame(
        [("hot", 1.0), ("k55", 2.0)], "k string, v double"
    )

    def norm(df):
        return sorted(tuple(r) for r in df.select("id", "k", "v").collect())

    assert norm(salted_join(left, right, "k", n_salt=4)) == norm(
        left.join(right, on="k")
    )
    assert norm(salted_join(left, right, "k", n_salt=4, how="left")) == norm(
        left.join(right, on="k", how="left")
    )


def test_extract_json_typed_and_permissive(spark):
    """Typed extraction with nested paths; malformed JSON and missing
    keys yield NULL rather than errors."""
    from networkframe_spark.functions.pipeline import extract_json

    df = spark.createDataFrame(
        [
            (1, '{"k": 7, "s": "x", "nest": {"d": 1.5}}'),
            (2, '{"s": "y"}'),
            (3, "not json"),
        ],
        "id long, props string",
    )
    got = {
        r["id"]: (r["k"], r["s"], r["d"])
        for r in extract_json(
            df, "props", {"k": "int", "s": "string", "d": ("$.nest.d", "double")}
        ).collect()
    }
    assert got[1] == (7, "x", 1.5)
    assert got[2] == (None, "y", None)
    assert got[3] == (None, None, None)


def test_ab_test_report_welch_z(spark):
    """Hand-computed Welch z on two small arms; degenerate arm yields
    NULL z."""
    import math

    from networkframe_spark.functions.pipeline import ab_test_report

    rows = [(i, "A", 10.0 + i) for i in range(4)] + [
        (10 + i, "B", 14.0 + i) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "id long, variant string, value double")
    r = ab_test_report(df, "variant", "value").collect()[0]
    assert r["n_control"] == 4 and r["n_treatment"] == 4
    assert r["mean_control"] == 11.5 and r["mean_treatment"] == 15.5
    # both arms var = 5/3; se = sqrt(2*(5/3)/4)
    z = 4.0 / math.sqrt(2 * (5 / 3) / 4)
    assert abs(r["z_score"] - round(z, 6)) < 1e-6

    one = spark.createDataFrame(
        [(1, "A", 1.0), (2, "B", 2.0)], "id long, variant string, value double"
    )
    r1 = ab_test_report(one, "variant", "value").collect()[0]
    assert r1["z_score"] is None and r1["mean_control"] == 1.0


def test_table_diff_classifies(spark):
    from networkframe_spark.functions.pipeline import table_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 21.0), (4, 40.0), (5, None)], "k long, v double"
    )
    got = {r["key"]: r["change"] for r in table_diff(old, new, "k").collect()}
    # key 1 unchanged -> absent; NULL-safe compare keeps 3 as removed
    assert got == {2: "changed", 3: "removed", 4: "added", 5: "added"}


def test_json_key_profile_census(spark):
    from networkframe_spark.functions.pipeline import json_key_profile

    df = spark.createDataFrame(
        [
            (1, '{"a": 1, "b": 2}'),
            (2, '{"a": 3}'),
            (3, "not json"),
            (4, "[1,2]"),
        ],
        "event_id long, props string",
    )
    got = {r["key"]: (r["n"], r["frac"]) for r in json_key_profile(df, "props").collect()}
    assert got["a"] == (2, 0.5)
    assert got["b"] == (1, 0.25)
    assert set(got) == {"a", "b"}


def test_select_under_budget_prefix_semantics(spark):
    """The kept set is the maximal score-DESC prefix whose inclusive
    cumulative token count fits the budget: budget respected, the
    next-best excluded doc would overflow it, and every kept score
    >= every dropped score (ties broken by id)."""
    from networkframe_spark.functions.pipeline import select_under_budget
    from networkframe_spark.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    budget = 5_000
    kept = select_under_budget(docs, budget=budget, score_col="n_chars")
    rows = kept.orderBy("cum_tokens").collect()
    assert 0 < len(rows) < docs.count()
    assert rows[-1]["cum_tokens"] <= budget
    # inclusive cumulative sum is consistent
    acc = 0
    for r in rows:
        acc += r["n_tokens"]
        assert r["cum_tokens"] == acc
    # the best excluded doc would overflow the budget
    kept_ids = {r["doc_id"] for r in rows}
    from pyspark.sql import functions as F
    from networkframe_spark.functions.text import tokens_col

    dropped = (
        docs.filter(~F.col("doc_id").isin(list(kept_ids)))
        .select(
            "doc_id",
            F.col("n_chars").cast("double").alias("s"),
            F.size(tokens_col("text")).alias("nt"),
        )
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .first()
    )
    assert rows[-1]["cum_tokens"] + dropped["nt"] > budget
    # prefix property: min kept score >= max dropped score
    min_kept = min(r["n_chars"] for r in rows)
    assert min_kept >= dropped["s"]


def test_dsir_weights_directional(spark):
    """Docs in the target language score a higher mean log-ratio than
    docs in other languages (the weights point toward the target
    distribution), every source doc gets a row, and token counts match
    the tokenizer."""
    from pyspark.sql import functions as F

    from networkframe_spark.functions.pipeline import dsir_weights
    from networkframe_spark.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    target = docs.filter("lang = 'en'")
    w = dsir_weights(docs, target)
    assert w.count() == docs.count()
    j = w.join(docs.select("doc_id", "lang"), on="doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("log_ratio_mean").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_gumbel_topk_sample_properties(spark):
    """Gumbel-top-k: deterministic across runs, returns exactly n
    distinct rows ranked by perturbed key, and is genuinely
    weight-biased — sampling with a huge weight offset on one slice
    always includes that slice."""
    from pyspark.sql import functions as F

    from networkframe_spark.functions.pipeline import gumbel_topk_sample
    from networkframe_spark.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", (F.col("n_chars") / 100.0).alias("weight")
    )
    a = gumbel_topk_sample(docs, n=20).collect()
    b = gumbel_topk_sample(docs, n=20).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 20 == len({r["doc_id"] for r in a})
    assert [r["rank"] for r in a] == list(range(1, 21))
    keys = [r["gumbel_key"] for r in a]
    assert keys == sorted(keys, reverse=True)
    # weight dominance: +1000 on doc_id < 10 forces all ten in
    boosted = docs.withColumn(
        "weight",
        F.col("weight") + F.when(F.col("doc_id") < 10, 1000.0).otherwise(0.0),
    )
    top = {r["doc_id"] for r in gumbel_topk_sample(boosted, n=10).collect()}
    assert top == set(range(10))
