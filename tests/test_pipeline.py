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
