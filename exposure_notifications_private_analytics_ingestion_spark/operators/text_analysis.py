"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side (split / filter / aggregate over array columns — whole-stage
codegen, zero Python): language-ID by stopword-hit ratio, quality scoring,
token counting, and document fingerprinting (full-text md5 + min-shingle
rolling fingerprint, the 1-window case of winnowing [Schleimer et al. 2003]).

Scale: every op is a narrow map over the scan (no shuffle); Catalyst prunes
to the two columns used. At 100 TB these run at IO speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword sets (public common-word lists)
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "for", "on", "a"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "ich"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "es", "un", "una", "por"],
}


def words_col(text: str = "text") -> Column:
    return F.split(F.col(text), " ")


def _hit_count(words: Column, vocab: list[str]) -> Column:
    lit = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(words, lambda w: F.array_contains(lit, w)))


def token_count(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (chars/4 heuristic,
    the public rule-of-thumb for byte-pair-encoded English)."""
    w = words_col(text)
    return df.select(
        F.col(id_col),
        F.size(w).alias("n_tokens"),
        F.length(text).alias("n_chars_calc"),
        F.ceil(F.length(text) / 4).cast("long").alias("bpe_token_estimate"),
    )


def quality_score(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / mean-word-length / stopword-ratio quality gates (the standard
    C4/Gopher-style heuristics, re-expressed as one codegen'd projection).
    The word array is materialized once per row — the score expressions
    reference it ~7 times and inlining would re-split per reference."""
    df = df.select(F.col(id_col), F.col(text), words_col(text).alias("_qs_ws"))
    w = F.col("_qs_ws")
    n_tok = F.size(w)
    mean_wl = F.round(
        (F.length(text) - (n_tok - 1)) / n_tok, 6
    )  # total chars minus single separators
    stop_ratio = F.round(_hit_count(w, STOPWORDS["en"]) / n_tok, 6)
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        mean_wl.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        (
            (n_tok >= 5)
            & (mean_wl >= 2.0)
            & (mean_wl <= 12.0)
        ).alias("passes_quality"),
    )


def lang_id(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit-ratio language ID; deterministic argmax (score desc,
    lang asc). One split per row (materialized), 2·n_langs references."""
    base = df.select(F.col(id_col), words_col(text).alias("_li_ws"))
    w = F.col("_li_ws")
    scores = [
        F.round(_hit_count(w, v) / F.size(w), 6).alias(f"score_{k}")
        for k, v in sorted(STOPWORDS.items())
    ]
    scored = base.select(F.col(id_col), *scores)
    langs = sorted(STOPWORDS)
    # tiebreak: score desc, lang asc — greatest() then first lang reaching it
    best_score = F.greatest(*[F.col(f"score_{k}") for k in langs])
    lang_pick = F.coalesce(
        *[
            F.when(F.col(f"score_{k}") == best_score, F.lit(k))
            for k in langs
        ]
    )
    return scored.select(
        id_col, *[f"score_{k}" for k in langs], lang_pick.alias("lang_pred")
    )


def fingerprint(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", shingle: int = 3
) -> DataFrame:
    """Full-text md5 + rolling min-shingle fingerprint (word ``shingle``-grams,
    min of md5 — robust to local edits; the 1-selection case of winnowing).

    The word array is materialized ONCE per row (``_w`` projection) before
    the per-position lambda: inlining ``words_col`` into
    ``try_element_at(w, i+j)`` re-evaluates the split per array ELEMENT
    (the position-dependent index defeats Catalyst's common-subexpression
    elimination) — measured 10x slower at sf0.1 (5.4s → 0.54s)."""
    base = df.select(F.col(id_col), F.col(text)).withColumn("_w", words_col(text))
    w = F.col("_w")
    n = F.size(w)
    idx = F.sequence(F.lit(1), F.greatest(n - (shingle - 1), F.lit(1)))
    shingles = F.transform(
        idx,
        lambda i: F.md5(
            F.concat_ws(
                " ", *[F.try_element_at(w, i + F.lit(j)) for j in range(shingle)]
            )
        ),
    )
    return base.select(
        F.col(id_col),
        F.md5(F.col(text)).alias("fingerprint"),
        F.array_min(shingles).alias("min_shingle_fp"),
    )


def ngram_doc_frequency(
    df: DataFrame, n: int = 2, k: int = 20, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k word n-grams by DOCUMENT frequency (the DF table behind IDF /
    vocabulary pruning). Distinct shingles per doc → one hash-agg per shingle
    → distributed top-k (`orderBy(...).limit(k)` plans TakeOrderedAndProject:
    per-partition partial top-k, no global sort)."""
    from pyspark.sql import Window

    from .doc_dedup import shingles_df

    counts = (
        shingles_df(df, n, text, id_col)
        .groupBy("shingle")
        .agg(F.count("*").alias("doc_freq"))
    )
    topk = counts.orderBy(F.col("doc_freq").desc(), F.col("shingle").asc()).limit(k)
    w = Window.orderBy(F.col("doc_freq").desc(), F.col("shingle").asc())
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(F.col("shingle").alias("ngram"), "doc_freq", "rank")
    )


def repetition_stats(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition signals (the Gopher repetition filters):
    duplicate-word fraction, most-frequent-word mass, duplicate-bigram
    fraction. High values flag boilerplate / spam / degenerate generations.

    One explode over words+bigrams tagged by gram order, then two hash-aggs
    keyed by doc — partial aggregation makes the first agg map-side-heavy, so
    cost is O(tokens) with doc-sized groups regardless of document length
    (an ``array_distinct`` formulation would be O(len·distinct) per ROW and
    die on 100 KB documents; this one does not).

    ``dup_bigram_frac`` is NULL for documents with fewer than two words.
    """
    w = words_col(text)
    n = F.size(w)
    bigrams = F.zip_with(
        F.slice(w, 1, n - 1),
        F.slice(w, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    grams = F.concat(
        F.transform(w, lambda x: F.struct(F.lit(1).alias("n"), x.alias("g"))),
        F.transform(bigrams, lambda x: F.struct(F.lit(2).alias("n"), x.alias("g"))),
    )
    exploded = df.select(F.col(id_col), F.explode(grams).alias("e")).select(
        id_col, F.col("e.n").alias("n"), F.col("e.g").alias("g")
    )
    counts = exploded.groupBy(id_col, "n", "g").agg(F.count("*").alias("cnt"))
    is1, is2 = F.col("n") == 1, F.col("n") == 2
    tot1 = F.sum(F.when(is1, F.col("cnt")))
    dis1 = F.sum(F.when(is1, 1))
    max1 = F.max(F.when(is1, F.col("cnt")))
    tot2 = F.sum(F.when(is2, F.col("cnt")))
    dis2 = F.sum(F.when(is2, 1))
    return counts.groupBy(id_col).agg(
        tot1.cast("long").alias("n_words"),
        dis1.cast("long").alias("n_distinct_words"),
        F.round(F.lit(1.0) - dis1 / tot1, 6).alias("dup_word_frac"),
        F.round(max1 / tot1, 6).alias("top_word_frac"),
        F.coalesce(tot2.cast("long"), F.lit(0)).alias("n_bigrams"),
        F.coalesce(dis2.cast("long"), F.lit(0)).alias("n_distinct_bigrams"),
        F.round(F.lit(1.0) - dis2 / tot2, 6).alias("dup_bigram_frac"),
    )


# PII patterns kept to the regex subset with identical semantics in Java
# (Spark) and RE2 (DuckDB oracle): ASCII classes, \b word boundaries, no
# backreferences/lookaround. Order matters: emails are scrubbed before IPv4
# so a host part like user@10.0.0.1 never double-matches.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("id9", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
]


def pii_scrub(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact email / IPv4 / SSN-shaped identifiers and count each class —
    the pre-training PII scrubbing pass, as one codegen'd projection (three
    ``regexp_count`` + three chained ``regexp_replace``, zero Python, no
    shuffle; at 100 TB this runs at scan speed like the other text ops).

    Output: (id_col, n_email, n_ipv4, n_id9, n_pii, redacted_md5,
    redacted_len) — the md5 pins the full redacted text for the oracle
    without hauling document bodies through the comparison.
    """
    cnt = {
        name: F.regexp_count(F.col(text), F.lit(pat)).cast("long")
        for name, pat, _repl in PII_PATTERNS
    }
    red = F.col(text)
    for _name, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    n_pii = cnt["email"] + cnt["ipv4"] + cnt["id9"]
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in cnt.items()],
        n_pii.alias("n_pii"),
        F.md5(red).alias("redacted_md5"),
        F.length(red).alias("redacted_len"),
    )


def corpus_stats_by_lang(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-language corpus rollup (doc count, token mass, quality pass count)
    — lang-ID + quality heuristics composed into ONE narrow projection (no
    join: both derive from the same row) followed by one hash-agg. The word
    array is materialized once per row (many score references)."""
    df = df.select(F.col(text), words_col(text).alias("_cs_ws"))
    w = F.col("_cs_ws")
    n_tok = F.size(w)
    mean_wl = F.round((F.length(text) - (n_tok - 1)) / n_tok, 6)
    langs = sorted(STOPWORDS)
    scores = {
        k: F.round(_hit_count(w, v) / n_tok, 6) for k, v in sorted(STOPWORDS.items())
    }
    best = F.greatest(*scores.values())
    pick = F.coalesce(*[F.when(scores[k] == best, F.lit(k)) for k in langs])
    passes = (n_tok >= 5) & (mean_wl >= 2.0) & (mean_wl <= 12.0)
    base = df.select(
        pick.alias("lang_pred"), n_tok.alias("n_tokens"), passes.alias("passes")
    )
    return base.groupBy("lang_pred").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum("n_tokens") / F.count("*"), 6).alias("mean_tokens"),
        F.sum(F.when(F.col("passes"), 1).otherwise(0)).alias("n_pass_quality"),
    )


def length_percentiles(df: DataFrame, text: str = "text") -> DataFrame:
    """Exact char-length distribution of the corpus (one row): p50/p90/p99 +
    max + count. Exact `percentile` (not approx) — bit-stable across engines
    and still a single partial+final aggregation."""
    ln = F.length(text)
    return df.agg(
        F.count("*").alias("n_docs"),
        F.round(F.expr(f"percentile(length({text}), 0.5D)"), 6).alias("p50_chars"),
        F.round(F.expr(f"percentile(length({text}), 0.9D)"), 6).alias("p90_chars"),
        F.round(F.expr(f"percentile(length({text}), 0.99D)"), 6).alias("p99_chars"),
        F.max(ln).alias("max_chars"),
    )


def normalize_text(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Web-corpus text normalization as one codegen'd projection (the
    cleanup pass every crawl pipeline runs before dedup/quality): strip
    HTML-ish tags, drop C0 control characters (tab/newline → space),
    collapse whitespace runs, trim. No Python, no shuffle — scan-speed at
    100 TB like `pii_scrub`.

    Output: (id_col, norm_md5, norm_len, removed_chars) — the md5 pins the
    full normalized text for the oracle without hauling bodies through the
    comparison; `removed_chars` = original minus normalized length.

    Patterns stay in the Java/RE2-portable subset shared with the DuckDB
    oracle (no lookbehind, no \\p classes)."""
    steps = [
        ("<[^>]*>", " "),                       # tags
        ("[\\x00-\\x1f]", " "),                 # control chars
        ("  +", " "),                           # whitespace runs
    ]
    norm = F.col(text)
    for pat, repl in steps:
        norm = F.regexp_replace(norm, pat, repl)
    norm = F.trim(norm)
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("norm_md5"),
        F.length(norm).alias("norm_len"),
        (F.length(F.col(text)) - F.length(norm)).cast("long").alias("removed_chars"),
    )
