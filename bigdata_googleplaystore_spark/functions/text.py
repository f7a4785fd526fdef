"""Text-analysis Column builders: tokenization, quality signals, language
ID, shingling, winnowing fingerprints.

All pure built-in-function expression trees (split/filter/transform/
aggregate/md5) — no UDFs, so they vectorize inside whole-stage codegen and
scale linearly with no Python overhead. The reference has no text operators
(SURVEY.md §2.7); these are the north-star LLM-pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small marker vocabularies for the n-gram/stopword language heuristic.
# Deliberately tiny and hard-coded: the operator contract is "deterministic
# heuristic", not "good model" — swap in fastText et al. via the pandas-UDF
# slow path when real language ID is needed.
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "for"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("的", "是", "了", "在", "我"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased, trimmed text -> array<string>."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer shape, simplified to the RE2/Java-regex common
# subset: common contractions, letter runs, digit runs, symbol runs. Both
# Spark (Java regex) and DuckDB (RE2) use leftmost-first alternation here,
# so counts agree exactly across engines.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"


def bpe_like_tokens(text: Column) -> Column:
    """Subword-ish tokens via the BPE pre-tokenizer regex -> array<string>.
    A deterministic stand-in for a real BPE vocab: the regex performs the
    pre-tokenization split every BPE implementation starts from, which is
    the part that matters for corpus token-count estimation."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0))


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_like_tokens(text))


def punct_count(text: Column) -> Column:
    """Count of non-alphanumeric, non-space characters (quality signal)."""
    stripped = F.regexp_replace(text, r"[^A-Za-z0-9\s]", "")
    return F.length(text) - F.length(stripped)


def stopword_count(text: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Occurrences of stopwords among tokens (higher-order filter, JVM-side)."""
    sw = list(stopwords)
    return F.size(F.filter(tokens(text), lambda t: t.isin(sw)))


def _membership(markers: tuple[str, ...]):
    # single-arg lambda: a 2-arg lambda would make F.filter pass the array
    # index as the second argument
    ms = list(markers)
    return lambda t: t.isin(ms)


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language."""
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, _membership(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """Argmax language with a fixed precedence order (en,de,es,fr,zh);
    'und' when no marker hits. The CASE order IS the tiebreak contract —
    any SQL oracle must compare in the same order."""
    s = lang_scores(text)
    langs = list(LANG_MARKERS)
    best = None
    for lang in langs:
        cond = (s[lang] > 0) & F.greatest(*[s[o] for o in langs]).eqNullSafe(s[lang])
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return best.otherwise(F.lit("und"))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a *materialized* token-array
    column -> array<string>.

    IMPORTANT: pass a bound attribute (a real column), not an inline
    `tokens(text)` expression — Catalyst's project-collapse would inline
    the tokenization into every element_at of the lambda, turning shingling
    O(tokens²) per document (observed: 17s for 5k docs before the fix).
    Materialize tokens behind an exchange or use `token_shingles` only on
    small inputs.
    """
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(sh)


def token_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles straight from text (convenience form;
    see shingles_from_tokens for the scale caveat)."""
    return shingles_from_tokens(tokens(text), n)


def char_grams_lowered(t: Column, k: int = 8) -> Column:
    """Character k-gram shingles from an *already-lowered, bound* text
    column -> array<string>.

    Pass a real attribute: an inline `lower(text)` expression is spliced
    into the per-gram substring lambda and re-lowercases the whole document
    once per gram — O(len²) characters per doc. `operators.dedup.winnow_rows`
    materializes the lowered column behind a projection first."""
    idx = F.when(
        F.length(t) >= k, F.sequence(F.lit(1), F.length(t) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.substring(t, i.cast("int"), k))


def char_shingles(text: Column, k: int = 8) -> Column:
    """Character k-gram shingles of the lowercased text (convenience form;
    see char_grams_lowered for the scale caveat)."""
    return char_grams_lowered(F.lower(text), k)


def window_min_hashes(hashes: Column, w: int = 4) -> Column:
    """Winnowing window minima from a *bound* hash-array column: slide a
    window of w hashes, keep each window's min; distinct, sorted.

    Same bound-attribute contract as shingles_from_tokens: an inline hash
    expression would be re-evaluated in full for every window (quadratic —
    observed >400 s for 5k docs at k=8 before staging)."""
    n_win = F.size(hashes) - (w - 1)
    idx = F.when(n_win >= 1, F.sequence(F.lit(1), n_win)).otherwise(
        F.array().cast("array<int>")
    )
    mins = F.transform(idx, lambda i: F.array_min(F.slice(hashes, i, w)))
    # short docs (< w hashes but >= 1): fall back to the global min
    short = F.when(
        (F.size(hashes) > 0) & (n_win < 1), F.array(F.array_min(hashes))
    ).otherwise(F.array().cast("array<string>"))
    return F.array_sort(F.array_distinct(F.concat(mins, short)))


def winnow_fingerprints(text: Column, k: int = 8, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 scheme):
    hash every char k-gram, slide a window of w hashes, keep each window's
    minimum; return the distinct fingerprint set -> array<string>.

    Hashes are md5 hex strings: fixed-length lowercase hex makes the
    lexicographic min equal the numeric min, and md5 is identical across
    engines (exact SQL oracle possible, unlike xxhash64).

    SMALL INPUTS ONLY: this single-expression form re-evaluates the whole
    hash array per window (quadratic md5s per doc). The scale path is
    `operators.dedup.winnow_rows`, which stages lowered text / grams /
    hashes as separate bound projections.
    """
    hashes = F.transform(char_shingles(text, k), F.md5)
    return window_min_hashes(hashes, w)
