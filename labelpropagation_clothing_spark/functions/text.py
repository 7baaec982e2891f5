"""Text-cleaning expression library (reference operators T1-T7).

Re-expresses the pandas string pipeline of
``/root/reference/src/clean_most_common.py:42-72`` and
``/root/reference/src/Word_vectors.py:42-57`` as native Spark SQL
expressions so Catalyst sees every step (whole-stage codegen; no Python
in the hot path).

Reference semantics preserved exactly:

* T1 lowercase           (clean_most_common.py:59)
* T2 digits -> ""        (clean_most_common.py:61)  -- empty, NOT space
* T3 punct  -> " "       (clean_most_common.py:64)  -- space, NOT empty
* T4 stopword removal    (clean_most_common.py:15-39,66-70)
* T5/T7 whitespace tokenize (clean_most_common.py:107-108, Word_vectors.py:311)

Order matters: lower -> digits -> punct -> stopwords.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .stopwords import ENGLISH_STOP_WORDS

__all__ = [
    "lower_expr",
    "strip_digits_expr",
    "strip_punct_expr",
    "clean_text_expr",
    "tokens_expr",
    "remove_stopwords_expr",
    "clean_tokens_expr",
]


def lower_expr(col: Column) -> Column:
    """T1: lowercase (clean_most_common.py:59)."""
    return F.lower(col)


def strip_digits_expr(col: Column) -> Column:
    """T2: delete digits — replaced with the EMPTY string
    (clean_most_common.py:61; asymmetric with T3 on purpose)."""
    return F.regexp_replace(col, r"\d", "")


def strip_punct_expr(col: Column) -> Column:
    """T3: replace non-word/non-space chars with a SPACE
    (clean_most_common.py:64)."""
    return F.regexp_replace(col, r"[^\w\s]", " ")


def clean_text_expr(col: Column) -> Column:
    """T1+T2+T3 composed in reference order (lower -> digits -> punct),
    then whitespace normalized to single spaces and trimmed.

    The reference keeps raw whitespace until tokenization; we normalize
    here so the cleaned string is stable for hashing/fingerprints. Token
    output is identical because T5 splits on whitespace runs.
    """
    cleaned = strip_punct_expr(strip_digits_expr(lower_expr(col)))
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def tokens_expr(col: Column) -> Column:
    """T5/T7: whitespace tokenization of already-cleaned text.

    After T1-T3 the text is ``[a-z_ ]`` only, so NLTK punkt (reference
    clean_most_common.py:107-108) degenerates to a whitespace split —
    documented divergence, observably identical on cleaned input.
    Empty tokens are dropped (split of "" yields [""]).
    """
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def remove_stopwords_expr(tokens: Column, stopwords: list[str] | None = None) -> Column:
    """T4: drop tokens in the stop set (clean_most_common.py:66-70).

    The stop set defaults to the sklearn ENGLISH_STOP_WORDS list the
    reference uses (clean_most_common.py:15-39). Implemented as a native
    array filter over a literal array — no UDF, no broadcast needed
    (the set is a compile-time constant folded into the plan).
    """
    stop = F.array(*[F.lit(w) for w in (stopwords or sorted(ENGLISH_STOP_WORDS))])
    return F.filter(tokens, lambda t: ~F.array_contains(stop, t))


def clean_tokens_expr(col: Column, stopwords: list[str] | None = None) -> Column:
    """Full T1-T5 pipeline: raw string -> cleaned token array."""
    return remove_stopwords_expr(tokens_expr(clean_text_expr(col)), stopwords)
