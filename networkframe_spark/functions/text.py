"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting.

Everything here is a pure ``pyspark.sql.functions`` column expression —
JVM-side, whole-stage-codegen'd, no Python in the hot path — and each
formula is deliberately portable to ANSI SQL so the DuckDB oracle can
replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A compact multilingual stopword table for the language-ID heuristic.
# (Public knowledge; top function words per language.)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was", "with"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "una", "en", "que", "por", "del"],
    "it": ["il", "la", "di", "che", "e", "un", "per", "una", "sono", "con", "non"],
}

_EN_STOPWORDS = STOPWORDS["en"]


def tokens_col(col: str | Column = "text") -> Column:
    """Whitespace tokenization of lowercased text → array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def word_tokens_col(col: str | Column = "text") -> Column:
    """BPE-ish regex tokenization: words, numbers, and single
    punctuation marks as separate tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)


def add_token_count(
    df: DataFrame, text_col: str = "text", out_col: str = "n_tokens"
) -> DataFrame:
    """Whitespace token count (empty text → 0)."""
    return df.withColumn(
        out_col,
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
            F.size(tokens_col(text_col))
        ),
    )


def add_quality_score(
    df: DataFrame, text_col: str = "text", out_col: str = "quality_score"
) -> DataFrame:
    """Heuristic document quality in [0, 1] from cheap surface features:

    - length factor: ``least(n_chars / 1000, 1)``
    - punctuation ratio penalty (non-alphanumeric-space chars / chars)
    - stopword ratio reward (fraction of tokens in a small EN stopword
      list, saturating at 0.4)
    - mean word length sanity band (penalize <2 or >12)

    score = 0.4*length + 0.3*stopword + 0.2*(1-punct) + 0.1*wordlen

    Tokens are materialized to a column first so the regex split runs
    once per row, not once per referencing sub-expression.
    """
    c = F.col(text_col)
    toks = F.col("__q_toks")
    n_chars = F.length(c)
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    punct = F.length(F.regexp_replace(F.lower(c), r"[a-z0-9\s]", ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_arr = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    n_stop = F.size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    )
    stop_ratio = F.least(n_stop / n_tokens / F.lit(0.4), F.lit(1.0))
    mean_wl = (
        F.length(F.regexp_replace(c, r"\s+", "")) / n_tokens
    )
    wl_ok = F.when((mean_wl >= 2) & (mean_wl <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(n_chars / F.lit(1000.0), F.lit(1.0))
        + F.lit(0.3) * stop_ratio
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.1) * wl_ok
    )
    return (
        df.withColumn("__q_toks", tokens_col(text_col))
        .withColumn(out_col, F.round(score, 6))
        .drop("__q_toks")
    )


def add_language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Heuristic language ID: character-range detection for non-Latin
    scripts, then stopword voting among Latin-script languages.

    Pure column expressions (greatest/when chains over per-language
    stopword hit counts); ties break by fixed language order.
    """
    c = F.lower(F.col(text_col))
    toks = tokens_col(text_col)
    scores = {}
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    best = None
    for lang in STOPWORDS:
        if best is None:
            best = F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
        else:
            cand = F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            best = F.when(cand["score"] > best["score"], cand).otherwise(best)
    latin_pick = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("unknown"))
    pred = (
        F.when(c.rlike("[\\u4e00-\\u9fff]"), F.lit("zh"))
        .when(c.rlike("[\\u3040-\\u30ff]"), F.lit("ja"))
        .when(c.rlike("[\\uac00-\\ud7af]"), F.lit("ko"))
        .when(c.rlike("[\\u0400-\\u04ff]"), F.lit("ru"))
        .when(c.rlike("[\\u0600-\\u06ff]"), F.lit("ar"))
        .otherwise(latin_pick)
    )
    return df.withColumn(out_col, pred)


def normalized_text_col(col: str | Column = "text") -> Column:
    """Dedup normalization: lowercase, collapse whitespace, strip."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint_col(col: str | Column = "text") -> Column:
    """128-bit content fingerprint: md5 hex of normalized text.

    md5 is identical across Spark and DuckDB, making the fingerprint an
    engine-portable document key.
    """
    return F.md5(normalized_text_col(col))


def fingerprint64_col(col: str | Column = "text") -> Column:
    """60-bit integer fingerprint: first 15 hex chars of the md5 parsed
    base-16 (fits a signed 64-bit integer; portable to DuckDB via
    ``('0x' || substr(md5(x),1,15))::BIGINT``)."""
    return F.conv(F.substring(fingerprint_col(col), 1, 15), 16, 10).cast("long")


def add_fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "fingerprint"
) -> DataFrame:
    return df.withColumn(out_col, fingerprint_col(text_col))


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
# Patterns restricted to syntax Java regex and RE2 (DuckDB) agree on —
# no lookbehind, no backreferences — so the oracle reproduces them
# exactly.  Order matters (email before phone: an address's digits must
# not be half-eaten first); applied sequentially in dict order.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d\-\s]{7,}\d",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    patterns: dict[str, str] | None = None,
    token_fmt: str = "[{name}]",
) -> DataFrame:
    """Scrub PII-shaped spans from ``text_col``: each pattern is
    counted (``n_<name>`` columns) then replaced with its redaction
    token, sequentially.  The standard pre-release / pre-training
    compliance pass.

    Pure JVM ``regexp_count`` / ``regexp_replace`` column expressions —
    single scan, codegen'd, no shuffle; at corpus scale this is
    IO-bound like any map-only pass.  Counts are computed on the
    ORIGINAL text (before any replacement), so they are independent of
    pattern order even when matches of different patterns overlap.
    """
    pats = patterns or PII_PATTERNS
    out = df
    red = F.col(text_col)
    for name, pat in pats.items():
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
        red = F.regexp_replace(red, pat, token_fmt.format(name=name.upper()))
    return out.withColumn(out_col, red)


def unigram_logprob_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-relative fluency score (KenLM-lite): per document, the
    mean natural-log unigram probability of its tokens under the
    corpus's own empirical distribution — ``(id_col, n_tokens,
    logprob)``, rounded to 6 dp.  Empty documents score NULL.

    Low scores flag documents made of corpus-rare tokens (gibberish,
    encoding noise, foreign-to-the-corpus text); the standard cheap
    proxy for LM-perplexity filtering when no external model is
    available.

    Scale design: the raw explode is consumed ONCE, into the per-doc
    term-frequency table ``(doc, tok, cnt)`` (far smaller than the
    token stream); the corpus unigram table and the per-doc weighted
    average both derive from it — the tf exchange appears identically
    in both branches, so Catalyst's ReusedExchange serves the second
    read from the first shuffle's output.  Corpus total is a 1-row
    broadcast.  All shuffles key on uniform values; no UDF.
    """
    tf = (
        df.select(
            F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    freq = tf.groupBy("tok").agg(F.sum("__c").alias("__n"))
    total = freq.agg(F.sum("__n").alias("__total"))
    scored = (
        tf.join(freq, on="tok")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("__c"),
            (F.log(F.col("__n")) - F.log(F.col("__total"))).alias("__lp"),
        )
    )
    return (
        df.select(id_col)
        .join(
            scored.groupBy(id_col).agg(
                F.sum("__c").alias("n_tokens"),
                F.round(
                    F.sum(F.col("__c") * F.col("__lp")) / F.sum("__c"), 6
                ).alias("logprob"),
            ),
            on=id_col,
            how="left",
        )
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "logprob",
        )
    )
