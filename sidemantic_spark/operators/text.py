"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure DataFrame transformations built on JVM-side
built-in functions (no Python UDFs in the hot path), so they stay
inside whole-stage codegen and scale linearly with partitions: at
100 TB these are embarrassingly parallel map stages with zero shuffle.

Beyond the reference's surface (sidemantic has no row-level text ops);
part of the north-star LLM-data-pipeline operator set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists. Heuristic language ID by
# stopword hits — intentionally simple (LIKE-matchable) so the exact
# semantics can be mirrored in ANSI SQL oracles.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "los", "es"],
    "fr": ["le", "les", "des", "est"],
    "de": ["der", "die", "und", "ist"],
    "zh": ["的", "是", "了", "在"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish pre-tokenization proxy)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


# GPT-2-style pre-tokenizer split pattern, restricted to constructs both
# Java regex (Spark) and RE2 (DuckDB oracle) support — no lookahead, so
# trailing-space runs merge into the following token's optional leading
# space. Verified token-count parity on the full corpus.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer
    regex (contractions, letter runs, digit runs, punctuation runs).
    A closer LLM-token proxy than whitespace counting — e.g.
    "don't stop!" is 2 whitespace tokens but 4 BPE-ish tokens."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))


def char_classes(text: Column) -> dict[str, Column]:
    """Character-class counts used by quality scoring."""
    n = F.length(text)
    return {
        "n_chars": n,
        "n_alpha": n - F.length(F.regexp_replace(text, r"[A-Za-z]", "")),
        "n_digit": n - F.length(F.regexp_replace(text, r"[0-9]", "")),
        "n_punct": n - F.length(F.regexp_replace(text, r"[.,;:!?]", "")),
        "n_space": n - F.length(F.regexp_replace(text, r" ", "")),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, low punctuation
    and digit density, reasonable word length. Deterministic arithmetic
    only (portable to an ANSI-SQL oracle)."""
    c = char_classes(text)
    n = c["n_chars"]
    nz = F.when(n == 0, F.lit(1)).otherwise(n).cast("double")
    len_score = F.least(n.cast("double") / F.lit(500.0), F.lit(1.0))
    punct_penalty = F.least(
        c["n_punct"].cast("double") * 10.0 / nz, F.lit(1.0)
    )
    digit_penalty = F.least(c["n_digit"].cast("double") * 5.0 / nz, F.lit(1.0))
    alpha_ratio = c["n_alpha"].cast("double") / nz
    return F.round(
        (len_score * 0.4 + alpha_ratio * 0.4 + (1.0 - punct_penalty) * 0.1 + (1.0 - digit_penalty) * 0.1),
        6,
    )


def language_id(text: Column) -> Column:
    """n-gram/stopword-heuristic language ID.

    Counts marker-word hits per language over the padded lowercase text
    and returns the argmax (ties broken by language code order,
    deterministically)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = []
    for lang, words in sorted(LANG_MARKERS.items()):
        hits = None
        for w in words:
            h = F.when(padded.contains(f" {w} "), 1).otherwise(0)
            hits = h if hits is None else hits + h
        scores.append((lang, hits))
    # argmax with deterministic tie-break: iterate langs in order and
    # keep the first with the max score
    best_score = scores[0][1]
    for _, s in scores[1:]:
        best_score = F.greatest(best_score, s)
    result = F.lit("und")
    for lang, s in reversed(scores):
        result = F.when(s == best_score, F.lit(lang)).otherwise(result)
    return F.when(best_score == 0, F.lit("und")).otherwise(result)


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized lowercase
    text. md5 is identical across engines, so exact-dup detection on
    the fingerprint is portable."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(normalized)


# PII patterns shared by Java regex (Spark) and RE2 (DuckDB oracle):
# no lookaround/backrefs, \b supported by both. Order matters: emails
# carry digits and dots, so they are redacted before IPs and phones.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\-\s()]{6,}\d", "<PHONE>"),
]


def pii_scrub(text: Column) -> Column:
    """Redact emails, IPv4s and phone-shaped digit runs with typed
    placeholder tokens.  Pure ``regexp_replace`` chain — JVM-side,
    whole-stage codegen, zero shuffle; at corpus scale this is a free
    rider on whatever scan already touches the text column."""
    out = text
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-document match counts for each PII class (audit metric)."""
    return {
        "n_email": F.size(F.regexp_extract_all(text, F.lit(PII_PATTERNS[0][0]), F.lit(0))),
        "n_ip": F.size(F.regexp_extract_all(text, F.lit(PII_PATTERNS[1][0]), F.lit(0))),
    }


def repetition_score(text: Column, n: int = 3) -> Column:
    """Within-document repetition: fraction of duplicate word n-grams
    (Gopher-style repetition filter signal).  0.0 = all n-grams unique,
    higher = more internally repetitive; documents shorter than n words
    score 0.0.

    Built from array higher-order functions over the split word array —
    no Python, no shuffle.  HOF lambdas evaluate interpreted (no
    codegen), so the per-row cost is the n-gram materialization itself;
    the words array is built once in its own projection rather than
    re-split inside the lambda."""
    words = F.split(F.trim(text), r"\s+")
    cnt = F.size(words) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    frac_dup = F.lit(1.0) - (
        F.size(F.array_distinct(grams)).cast("double")
        / F.size(grams).cast("double")
    )
    return F.when(cnt < 1, F.lit(0.0)).otherwise(F.round(frac_dup, 6))


# Gopher's rule-7 stopword list (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", appendix A1.1): a document must contain at least
# two of these to pass.
GOPHER_STOPWORDS: list[str] = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.10,
    max_ellipsis_frac: float = 0.30,
    min_alpha_word_frac: float = 0.80,
    stopwords: list[str] | None = None,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, A1.1) as
    one projection: per-document measurements, one boolean per rule and
    a final ``keep`` conjunction.

    Measurements are built-in column expressions over the split word /
    line arrays — ratios are exact int/int double divisions, so results
    are bit-identical across engines and partitionings.  The two array
    predicates (words containing a letter, bullet/ellipsis lines) use
    ``filter`` higher-order functions: interpreted, but O(words) with no
    regex re-evaluation — the dominant cost stays the split itself.  At
    100 TB this is an embarrassingly parallel map stage with zero
    shuffle, a free rider on whatever scan already reads the text.

    Rules (each also surfaced as a column so downstream can re-weight):
    word count in [min_words, max_words]; mean word length in
    [min_mean_word_len, max_mean_word_len]; '#'/'...' symbol-to-word
    ratio <= max_symbol_ratio; <= max_bullet_frac of lines start with a
    bullet; <= max_ellipsis_frac of lines end with '...'; >=
    min_alpha_word_frac of words contain a letter; >= min_stopword_hits
    distinct stopwords present."""
    sw = GOPHER_STOPWORDS if stopwords is None else stopwords
    t = F.col(text_col)
    trimmed = F.trim(t)
    words = F.split(trimmed, r"\s+")
    wc = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(F.size(words))
    wc_nz = F.greatest(wc, F.lit(1)).cast("double")
    # mean word length = non-whitespace chars / words (exact division)
    n_word_chars = F.length(F.regexp_replace(trimmed, r"\s+", ""))
    mean_word_len = F.round(n_word_chars.cast("double") / wc_nz, 6)
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    # ASCII '...' or the Unicode ellipsis '…' — Gopher's symbol rule
    # counts both forms
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\.|…"), F.lit(0)))
    symbol_ratio = F.round((n_hash + n_ellipsis).cast("double") / wc_nz, 6)
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_word_frac = F.round(n_alpha_words.cast("double") / wc_nz, 6)
    lines = F.split(t, r"\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = F.round(
        F.size(F.filter(lines, lambda l: F.ltrim(l).rlike(r"^[-*•]"))).cast("double")
        / n_lines,
        6,
    )
    ellipsis_line_frac = F.round(
        F.size(
            F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))
        ).cast("double")
        / n_lines,
        6,
    )
    # distinct-stopword hits against the split word array (lowercased,
    # non-letters stripped) so 'of.', 'The' and 'the\n' all count —
    # a substring match over space-padded text misses punctuation- and
    # newline-adjacent stopwords.  Still a zero-shuffle projection;
    # array_intersect dedups, matching the "distinct stopwords" rule.
    clean_words = F.transform(
        words, lambda w: F.regexp_replace(F.lower(w), r"[^a-z]", "")
    )
    hits: Column = F.size(
        F.array_intersect(clean_words, F.array(*[F.lit(x) for x in sw]))
    )

    flags = df.select(
        "*",
        wc.alias("word_count"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_word_frac.alias("alpha_word_frac"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_line_frac.alias("ellipsis_line_frac"),
        hits.alias("stopword_hits"),
    )
    rules = {
        "rule_word_count": (F.col("word_count") >= min_words)
        & (F.col("word_count") <= max_words),
        "rule_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "rule_symbol_ratio": F.col("symbol_ratio") <= max_symbol_ratio,
        "rule_bullet_lines": F.col("bullet_line_frac") <= max_bullet_frac,
        "rule_ellipsis_lines": F.col("ellipsis_line_frac") <= max_ellipsis_frac,
        "rule_alpha_words": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "rule_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }
    keep = F.lit(True)
    for expr in rules.values():
        keep = keep & expr
    return flags.select(
        "*", *[expr.alias(name) for name, expr in rules.items()], keep.alias("keep")
    )


def profile_numeric(
    df: DataFrame, value_col: str, by: list[str] | None = None
) -> DataFrame:
    """Data-QA numeric profile per group: count, nulls, min/max, exact
    mean, population stddev and interpolated median/p90.

    One shuffle (the groupBy); every statistic is a partial-aggregable
    built-in, so map-side combine keeps the shuffle at group
    cardinality.  Mean and stddev route integer inputs through exact
    DECIMAL sums (sum and sum-of-squares), so results are bit-identical
    across engines and partitionings — the same determinism rule the
    monetary metrics follow."""
    v = F.col(value_col)
    dec = v.cast("decimal(28,6)")
    n = F.count(v)
    s = F.sum(dec)
    ss = F.sum(dec * dec)
    mean = (s.cast("double") / n)
    # population variance from exact sums: (ss - s^2/n) / n
    var = (ss.cast("double") - s.cast("double") * s.cast("double") / n) / n
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - n).alias("n_null"),
        F.min(v).cast("double").alias("min_v"),
        F.max(v).cast("double").alias("max_v"),
        F.round(mean, 6).alias("mean_v"),
        F.round(F.sqrt(var), 6).alias("stddev_pop_v"),
        F.percentile(v, F.lit(0.5)).alias("median_v"),
        F.percentile(v, F.lit(0.9)).alias("p90_v"),
    ]
    return (df.groupBy(*by) if by else df.groupBy()).agg(*aggs)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per document with the full text-analysis feature set."""
    t = F.col(text_col)
    c = char_classes(t)
    return df.select(
        "*",
        token_count(t).alias("token_count"),
        c["n_chars"].alias("char_count"),
        quality_score(t).alias("quality_score"),
        language_id(t).alias("detected_lang"),
        fingerprint(t).alias("fingerprint"),
    )


def vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 100,
) -> DataFrame:
    """Corpus vocabulary: the top-``k`` terms by document frequency,
    with term frequency as tiebreak — the vocabulary-building /
    Zipf-curve primitive of corpus analysis.

    Plan shape: explode to (term, doc) pairs, aggregate per (term, doc)
    FIRST and then per term — two narrow map-side-combinable shuffles
    instead of one COUNT DISTINCT (whose Expand would replicate every
    pair once per distinct aggregate, see the fan-out routing note in
    sql/generator.py). Top-k is a TakeOrdered, no global sort. At 100 TB
    the (term, doc) shuffle is the corpus' token stream — combiner-
    friendly (terms repeat within partitions) and skew-tolerant (the
    hot term rows collapse map-side).
    """
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.split(F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "), " ")
        ).alias("term"),
    ).where(F.col("term") != "")
    per_doc = toks.groupBy("term", "__id").agg(F.count("*").alias("__n"))
    tf = per_doc.groupBy("term").agg(
        F.count("*").alias("doc_freq"), F.sum("__n").alias("term_freq")
    )
    return tf.orderBy(
        F.desc("doc_freq"), F.desc("term_freq"), F.asc("term")
    ).limit(k)
