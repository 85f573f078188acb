"""Text-analysis operators for training-data pipelines.

All pure-SQL (JVM-side, whole-stage codegen; no Python in the hot
path) and expressible 1:1 in DuckDB for the oracle gate. Float
outputs are derived from integer counts by scalar division only —
never float SUM aggregation — so results are bit-stable across
engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "un", "una"],
}


def tokens_expr(text_col):
    return F.filter(F.split(text_col, " "), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + a BPE-ish proxy: ceil(chars/4) summed
    per token (common subword-cost heuristic), both integer-exact."""
    toks = tokens_expr(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"),
            lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
        ).alias("n_subwords"),
    )


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language heuristic: argmax of per-language stopword
    occurrences (with multiplicity); deterministic tiebreak = language
    code ascending; no hits at all -> 'und' (undetermined)."""
    toks = tokens_expr(F.col(text_col))
    scores = []
    for lang in sorted(LANG_STOPWORDS):
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        cnt = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        scores.append((lang, cnt))
    best_score = scores[0][1]
    best_lang = F.lit(scores[0][0])
    for lang, cnt in scores[1:]:
        cond = cnt > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, cnt).otherwise(best_score)
    return df.select(
        F.col(id_col),
        F.when(best_score > 0, best_lang).otherwise(F.lit("und"))
        .alias("pred_lang"),
        best_score.cast("int").alias("stopword_hits"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality in [0,1]:
    0.4 * min(1, n_tokens/50) + 0.3 * distinct-token ratio +
    0.3 * mean-token-length/8 capped at 1. Integer counts -> one
    scalar expression (engine-stable)."""
    toks = tokens_expr(F.col(text_col))
    n = F.size(toks).cast("double")
    nd = F.size(F.array_distinct(toks)).cast("double")
    chars = F.length(F.regexp_replace(F.col(text_col), " ", "")).cast("double")
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n / 50.0)
        + F.lit(0.3) * F.when(n > 0, nd / n).otherwise(F.lit(0.0))
        + F.lit(0.3) * F.least(F.lit(1.0),
                               F.when(n > 0, chars / n / 8.0).otherwise(F.lit(0.0)))
    )
    return df.select(F.col(id_col), score.alias("quality"))


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of the sorted distinct token set —
    order/whitespace-insensitive content hash (engine-stable)."""
    toks = tokens_expr(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
        .alias("fingerprint"),
    )
