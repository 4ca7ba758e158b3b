"""Text-analysis functions for the LLM-data-pipeline surface.

Tokenization, quality scoring, language-ID heuristics, and document
fingerprinting — all as JVM-side column expressions (split / higher-order
functions / md5), so they vectorize and need no Python workers. The MinHash
machinery built on these lives in ``operators.dedup``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny marker-word tables for the heuristic language scorer
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "est", "les"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space split, matching SQL string_split)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def stopword_count(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(tokens(text), lambda w: w.isin(*stopwords))).cast("long")


def chars_per_token(text: Column, n_chars: Column) -> Column:
    """Mean token length proxy: chars / tokens (double)."""
    return n_chars.cast("double") / F.size(tokens(text)).cast("double")


def lang_score(text: Column, lang: str) -> Column:
    """Marker-word hit count for one language."""
    return F.size(F.filter(tokens(text), lambda w: w.isin(*LANG_MARKERS[lang]))).cast("long")


def lang_guess(text: Column) -> Column:
    """Pick the language whose marker set hits most (ties: en > de > fr).

    A deliberately simple n-gram-free heuristic; deterministic, so it is
    fully oracle-expressible as nested CASE on the same scores.
    """
    s_en, s_de, s_fr = (lang_score(text, l) for l in ("en", "de", "fr"))
    guess = (
        F.when((s_en >= s_de) & (s_en >= s_fr), "en")
        .when(s_de >= s_fr, "de")
        .otherwise("fr")
    )
    # NULL text → NULL: the bare otherwise() confidently classified a
    # null document as French (every NULL score comparison skipped its
    # when(); r10 review) — the oracle mirrors via s_en IS NULL
    return F.when(text.isNotNull(), guess)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of lowercased text."""
    return F.md5(F.lower(text))


#: BPE-ish tokenizer regex: word runs or single non-space symbols
BPE_PATTERN = r"\w+|[^\w\s]"


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish regex (words + punctuation symbols)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)).cast("long")


def rolling_fingerprint(text: Column, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over the token stream (Karp-Rabin style).

    Per-token value = len(w)*256 + ascii(first char); fold h = (h*131 + v)
    mod p. Pure integer column arithmetic → exact, order-defined, and
    reproducible by the oracle (DuckDB list_reduce over the same values).
    """
    vals = F.transform(
        tokens(text),
        lambda w: (F.length(w).cast("long") * 256 + F.ascii(w).cast("long")),
    )
    return F.aggregate(
        vals, F.lit(0).cast("long"),
        lambda acc, v: (acc * 131 + v) % F.lit(mod),
    )


def shingles(text: Column, k: int = 3) -> Column:
    """All k-token shingles of the text, in document order (array<string>).
    Documents shorter than k tokens yield an empty array.

    Implementation note: built by zip_with-ing the token array against its
    own k−1 shifted slices, then filtering the null tail. This is O(n) per
    document — the naive transform-over-indices form re-evaluates the
    tokenizer per element under codegen (no hoisting across a lambda
    boundary), which profiled ~6× slower.
    """
    toks = tokens(text)
    n = F.size(toks)
    acc = toks
    for j in range(1, k):
        shifted = F.slice(toks, j + 1, F.greatest(n - j, F.lit(0)))
        acc = F.zip_with(
            acc, shifted,
            lambda x, y: F.when(x.isNotNull() & y.isNotNull(), F.concat_ws(" ", x, y)),
        )
    return F.filter(acc, lambda s: s.isNotNull())
