"""Text-analysis operators for training-data pipelines: language-ID heuristic,
quality scoring, tokenizer-style counting, and document fingerprinting.

All pure column expressions (whole-stage codegen, zero shuffles until the
final aggregate) — at 100 TB these are scan-bound map passes whose cost is
the parquet read itself. Each has an exact DuckDB SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny function-word inventory: presence/ratio of these is the classic
# n-gram-free language-ID heuristic for English
EN_STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "on", "for", "with")

# word-ish / number / single punctuation — a BPE-ish pre-tokenizer split
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"

FP_MULT = 1_000_003
FP_MOD = 2_147_483_647  # 2^31 − 1; acc*mult + term < 2^52 — ANSI-safe


def _words(text: str = "text"):
    return F.split(F.col(text), " ")


def lang_id(docs: DataFrame, text: str = "text", threshold: float = 0.05) -> DataFrame:
    """Stopword-ratio language ID: fraction of words in the EN function-word
    set; ``lang_pred = 'en'`` above the threshold."""
    w = _words(text)
    stop_cnt = F.size(F.filter(w, lambda x: x.isin(*EN_STOPWORDS)))
    ratio = F.round(stop_cnt / F.size(w), 6)
    return docs.select(
        "doc_id",
        ratio.alias("stop_ratio"),
        F.when(ratio > threshold, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


def quality_score(docs: DataFrame, text: str = "text") -> DataFrame:
    """Heuristic document quality: word count, mean word length, stopword
    ratio, repetition (1 − distinct/total words), punctuation density.
    ``quality = stop_ratio·2 + uniq_ratio − punct_ratio`` (weights are
    config, the point is the measurable features)."""
    w = _words(text)
    n_words = F.size(w)
    n_chars = F.length(F.col(text))
    stop_ratio = F.size(F.filter(w, lambda x: x.isin(*EN_STOPWORDS))) / n_words
    uniq_ratio = F.size(F.array_distinct(w)) / n_words
    punct = F.length(F.regexp_replace(F.col(text), "[a-z0-9 ]", ""))
    punct_ratio = punct / n_chars
    mean_wlen = (n_chars - (n_words - 1)) / n_words  # chars excl. separators
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio * 2 + uniq_ratio - punct_ratio, 6).alias("quality"),
    )


def token_counts(docs: DataFrame, text: str = "text") -> DataFrame:
    """Tokenizer-style counting per source: whitespace tokens and BPE-ish
    regex tokens, aggregated per source (exact integers)."""
    n_ws = F.size(_words(text))
    n_re = F.size(F.regexp_extract_all(F.col(text), F.lit(TOKEN_REGEX), 0))
    per_doc = docs.select("source", n_ws.alias("ws"), n_re.alias("re"))
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws").alias("ws_tokens"),
        F.sum("re").alias("regex_tokens"),
    )


def fingerprint(docs: DataFrame, text: str = "text") -> DataFrame:
    """Rolling polynomial content fingerprint over words (Karp–Rabin style):
    ``h ← (h·1000003 + (len(w)·131 + ascii(w[0]))) mod (2³¹−1)``.
    A left-fold ``aggregate`` — order-dependent by design (it's a sequence
    fingerprint, not a bag hash), identical in SQL via ``list_reduce``
    (which seeds with the first element, so the fold here runs over
    ``terms[2:]`` seeded with ``terms[1]``)."""
    w = _words(text)
    terms = F.transform(w, lambda x: (F.length(x) * 131 + F.ascii(x)).cast("long"))
    h = F.aggregate(
        F.slice(terms, 2, F.greatest(F.size(terms) - 1, F.lit(0))),
        F.element_at(terms, 1),
        lambda acc, t: (acc * FP_MULT + t) % FP_MOD,
    )
    return docs.select("doc_id", h.alias("fingerprint"))


def tokens_from_text(docs: DataFrame, text: str = "text", vocab: int = 50_257, extra_cols: tuple[str, ...] = ()):
    """Derive the input_hint token-table shape from a text corpus: tokens =
    per-word 32-bit md5-derived ids, n_tok = len. Used to exercise the engine
    end-to-end on driver test data (documents.parquet)."""
    w = _words(text)
    tok = F.transform(
        w, lambda s: (F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % vocab).cast("int")
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        tok.alias("tokens"),
        F.size(w).cast("int").alias("n_tok"),
        "source",
        *extra_cols,
    )
