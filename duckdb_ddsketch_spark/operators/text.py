"""Text-analysis operators for large-scale training-data pipelines.

All computations are pure Catalyst expressions (no UDFs): tokenization via
``split``, n-gram shingles via ``transform``/``sequence`` over the token
array, hashes via ``md5``. Every operator is therefore whole-stage-codegen'd
and partially aggregated — per-row work is embarrassingly parallel and the
only shuffles are the final (small) per-group aggregations, so the designs
hold at 100 TB: scans prune columns to ``text`` + keys, and no driver-side
collection happens anywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "tokens",
    "word_ngrams",
    "token_stats",
    "stopword_ratio",
    "quality_score",
    "language_id",
    "fingerprint",
    "DEFAULT_STOPWORDS",
    "LANG_MARKERS",
]

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic (a real pipeline would plug a model here; the *operator shape* —
# per-row scoring + argmax, no shuffle — is what matters at scale)
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "et", "est"),
    "es": ("el", "la", "y", "es"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (collapsing runs of spaces)."""
    return F.split(F.trim(text), " +")


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    ``transform(sequence(1, ntok-n+1), i -> tokens[i-1..i+n-2] joined)`` —
    native, per-row, no shuffle.
    """
    toks = tokens(text)
    ntok = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(ntok - (n - 1), F.lit(0)))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(gram)


def token_stats(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token counts and lengths (BPE-ish proxy included:
    ceil(chars/4) is the standard rough token estimate)."""
    t = tokens(F.col(text))
    nchars = F.length(F.col(text))
    return df.select(
        id_col,
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        nchars.alias("n_chars"),
        F.ceil(nchars / F.lit(4)).cast("int").alias("est_bpe_tokens"),
        (nchars.cast("double") / F.size(t)).alias("avg_token_len"),
    )


def stopword_ratio(
    text: Column, stopwords: Sequence[str] = DEFAULT_STOPWORDS
) -> Column:
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda w: w.isin(list(stopwords))))
    return hits.cast("double") / F.size(toks)


def quality_score(text: Column, stopwords: Sequence[str] = DEFAULT_STOPWORDS) -> Column:
    """Composite [0,1] quality heuristic: length band + lexical diversity +
    stopword presence (the standard cheap pre-filter for web corpora)."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    sw = F.size(F.filter(toks, lambda w: w.isin(list(stopwords)))).cast("double") / n
    length_ok = F.when((n >= 10) & (n <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    return (length_ok + diversity + F.least(sw * F.lit(5.0), F.lit(1.0))) / F.lit(3.0)


def language_id(text: Column) -> Column:
    """Marker-lexicon language guess: score per language = fraction of
    marker hits; argmax with deterministic tie-break by language code."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    scored = F.array(
        *[
            F.struct(
                (
                    F.size(F.filter(toks, lambda w: w.isin(list(markers)))).cast(
                        "double"
                    )
                    / n
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, markers in sorted(LANG_MARKERS.items())
        ]
    )
    # max over (score, lang): ties resolve to the lexicographically larger
    # language code; callers wanting 'unknown' can threshold on the score.
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("unknown"))


def fingerprint(text: Column) -> Column:
    """Order-insensitive bag-of-words fingerprint: md5 of the sorted distinct
    token list — the classic cheap canonicalization for shuffle-dup detection.
    """
    toks = F.array_sort(F.array_distinct(tokens(F.lower(text))))
    return F.md5(F.concat_ws(" ", toks))
