"""Reusable Column-expression builders.

Everything here returns `pyspark.sql.Column` trees built from built-in
functions — JVM-side, whole-stage-codegen-friendly, zero Python in the row
path. These are the engine's "custom functions, not custom rules"
(SURVEY.md §7.2).
"""

from .text import (  # noqa: F401
    LANG_MARKERS,
    STOPWORDS_EN,
    char_grams_lowered,
    char_shingles,
    lang_scores,
    predict_lang,
    punct_count,
    stopword_count,
    shingles_from_tokens,
    token_shingles,
    tokens,
    window_min_hashes,
    winnow_fingerprints,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
