"""Text-analysis operators (brief: language-ID, quality scoring, token
counting, document fingerprinting). All pure Column math — JVM-side,
whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny per-language stopword profiles (n-gram-free heuristic: hit counts
# of high-frequency function words; good enough for a deterministic,
# cheap language id over web text)
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une"],
    "es": ["el", "la", "los", "que", "es", "un", "una", "para"],
}


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a crude BPE-ish subword estimate
    (chars/3.3 is the common byte-pair heuristic for web text)."""
    ws = F.size(F.split(F.col(text_col), " "))
    return df.withColumn("n_tokens_ws", ws).withColumn(
        "n_tokens_bpe_est", F.ceil(F.length(text_col) / F.lit(3.3)).cast("long")
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a
    composite [0,1] score (heuristics of the usual web-corpus filters)."""
    length = F.length(text_col)
    n_tokens = F.size(F.split(F.col(text_col), " "))
    n_space = length - F.length(F.regexp_replace(F.col(text_col), " ", ""))
    n_punct = length - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    en_hits = sum(
        F.size(F.split(F.concat(F.lit(" "), F.col(text_col), F.lit(" ")), f" {w} ")) - 1
        for w in _STOPWORDS["en"]
    )
    mean_word_len = (length - n_space) / F.greatest(n_tokens, F.lit(1))
    score = (
        F.when(length >= 64, 0.25).otherwise(0.0)
        + F.when((mean_word_len >= 3) & (mean_word_len <= 12), 0.25).otherwise(0.0)
        + F.when(n_punct / F.greatest(length, F.lit(1)) < 0.2, 0.25).otherwise(0.0)
        + F.when(en_hits > 0, 0.25).otherwise(0.0)
    )
    return (
        df.withColumn("n_chars_measured", length)
        .withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", F.round(n_punct / F.greatest(length, F.lit(1)), 6))
        .withColumn("stopword_hits", en_hits)
        .withColumn("quality", score)
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language id: argmax of per-language hit counts
    (deterministic heuristic; 'und' = undetermined when all zero)."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    hit_cols = []
    for lang, words in _STOPWORDS.items():
        hits = sum(F.size(F.split(padded, f" {w} ")) - 1 for w in words)
        hit_cols.append(hits.alias(f"hits_{lang}"))
    scored = df.select("*", *hit_cols)
    best = F.greatest(*[F.col(f"hits_{l}") for l in _STOPWORDS])
    lang_expr = F.when(best <= 0, "und")
    for lang in _STOPWORDS:
        lang_expr = lang_expr.when(F.col(f"hits_{lang}") == best, lang)
    return scored.withColumn("lang_pred", lang_expr)


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Position-weighted rolling token-hash fingerprint (bounded integer
    space; matches queries.q_doc_fingerprint)."""
    toks = df.select(
        "doc_id", F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word")
    )
    th = F.conv(F.substring(F.md5(F.col("word")), 1, 15), 16, 10).cast("long")
    return (
        toks.withColumn("th", th)
        .groupBy("doc_id")
        .agg((F.sum((F.col("th") % 1000003) * (F.col("pos") + 1)) % 2147483647).alias("fingerprint"))
    )
