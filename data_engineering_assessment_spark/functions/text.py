"""Text-analysis expression builders — all native Columns, no UDFs.

Everything here emits ``pyspark.sql.functions`` expressions so the
hot path stays inside whole-stage codegen; at 100 TB these run at
scan speed with zero Python involvement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English stopword set used by quality scoring / lang-id.
STOPWORDS_EN: tuple[str, ...] = ("the", "a", "of", "and", "to", "in")

# BPE-ish tokenizer: runs of letters, runs of digits, or single
# non-alphanumeric marks — a coarse public approximation of byte-pair
# pretokenization.
TOKEN_PATTERN = r"[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.split(text, " ")


def word_count(text: Column | str) -> Column:
    return F.size(words(text))


def uniq_word_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(words(text)))


def stopword_count(text: Column | str, stop: tuple[str, ...] = STOPWORDS_EN) -> Column:
    stop_arr = F.array(*[F.lit(s) for s in stop])
    return F.size(F.filter(words(text), lambda w: F.array_contains(stop_arr, w)))


def bpe_ish_token_count(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def shingles_of(ws: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a words array.

    PERF: pass ``ws`` as a materialized column *attribute* (select the
    split into its own projection first) — the gram lambda reads the
    array 3× per element, and inlining a full ``split()`` there makes
    the operator quadratic in practice (measured 20× slowdown).
    CollapseProject keeps the producing projection separate because
    the non-cheap split is referenced more than once.

    Guard upstream with ``word_count >= n`` — ``sequence`` with a
    negative stop would otherwise produce a descending range.
    """
    idx = F.sequence(F.lit(0), F.size(ws) - n)
    gram = lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j + 1) for j in range(n)])  # noqa: E731
    return F.array_distinct(F.transform(idx, gram))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles straight from text — convenience
    form for single-use contexts; hot paths use :func:`shingles_of`."""
    return shingles_of(words(text), n)


def fingerprint_exact(text: Column | str) -> Column:
    """MD5 of the raw text — exact-duplicate fingerprint."""
    text = F.col(text) if isinstance(text, str) else text
    return F.md5(text.cast("binary"))


def fingerprint_bag(text: Column | str) -> Column:
    """MD5 of the sorted distinct word bag — order-insensitive
    near-exact fingerprint (word-permutation duplicates collide)."""
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(words(text))), " ").cast("binary")
    )


def lang_guess(text: Column | str, lang_col: Column | str | None = None) -> Column:
    """Heuristic language ID: CJK codepoints → 'zh'; Latin text with
    English stopword hits → 'en'; otherwise 'und'.  A real pipeline
    swaps in a trained n-gram model; the *shape* (pure expression,
    no shuffle, no UDF) is the scalable part."""
    text = F.col(text) if isinstance(text, str) else text
    return (
        F.when(text.rlike(r"[一-鿿]"), F.lit("zh"))
        .when(stopword_count(text) >= 1, F.lit("en"))
        .otherwise(F.lit("und"))
    )


# PII patterns, applied in this order on progressively scrubbed text
# (card first so a digit run never double-counts as a phone).  Kept in
# the RE2-compatible subset so the DuckDB oracle executes the exact
# same automaton.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("<CARD>", r"\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}"),
    ("<PHONE>", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"),
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
)


def scrub_pii(text: Column | str) -> tuple[Column, Column]:
    """(scrubbed_text, n_redactions) after the :data:`PII_PATTERNS`
    redaction chain — each pattern counted on the text as it stands
    when that pattern applies, then replaced globally."""
    cur = F.col(text) if isinstance(text, str) else text
    n_total = F.lit(0)
    for token, pat in PII_PATTERNS:
        n_total = n_total + F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, token)
    return cur, n_total.cast("long")
