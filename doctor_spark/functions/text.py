"""Text-analysis column functions for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring, token counting, and
document fingerprinting — each a pure Column expression over built-in
functions so Catalyst codegens the whole thing (no Python in the plan).
Every function has an exact ANSI-SQL mirror used as the DuckDB oracle in
``__spark_entry__.py``; keep the two in sync.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# stopword inventories for the language-ID heuristic (tiny by design: this
# is an n-gram/stopword-hit scorer, not a model)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that"),
    "fr": ("le", "la", "les", "et", "de", "un", "est"),
    "es": ("el", "los", "y", "de", "que", "es", "una"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
}

_PUNCT_CLASS = r"[.,;:!?'\"()\[\]-]"


def tokens(col: Column) -> Column:
    """Whitespace tokens of lower-cased trimmed text."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_count(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are punctuation (rounded 4dp — per-row
    arithmetic, so exact across engines)."""
    n = F.length(col)
    stripped = F.length(F.regexp_replace(col, _PUNCT_CLASS, ""))
    return F.round(
        F.when(n == 0, F.lit(0.0)).otherwise((n - stripped) / n), 4
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    words = LANG_STOPWORDS[lang]
    toks = tokens(col)
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*words))
    )
    return F.round(
        F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks)), 4
    )


def mean_word_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, v: a + v
    )
    return F.round(
        F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(total / F.size(toks)), 4
    )


def quality_score(col: Column) -> Column:
    """Composite quality score in [0,1]: length factor, low punctuation,
    reasonable stopword density — the shape of C4-style web-text quality
    filters, deterministic and SQL-mirrorable."""
    n_tok = token_count(col)
    len_factor = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 5)
    stop = stopword_ratio(col, "en")
    stop_factor = F.least(stop * 4, F.lit(1.0))
    return F.round((len_factor + punct_pen + stop_factor) / 3, 4)


def lang_stop_hits(col: Column, lang: str) -> Column:
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda t: t.isin(*words)))


def lang_guess(col: Column) -> Column:
    """argmax over per-language stopword hits; ties break in the fixed
    order en > fr > es > de; zero hits everywhere → 'und' (undetermined)."""
    hits = {lg: lang_stop_hits(col, lg) for lg in LANG_STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.when(best == 0, F.lit("und"))
    for lg in LANG_STOPWORDS:  # insertion order = tie-break order
        expr = expr.when(hits[lg] == best, F.lit(lg))
    return expr.otherwise(F.lit("und"))


# GPT-2-style pre-tokenizer shape (public pattern family): contractions,
# letter runs, digit runs, punctuation runs, whitespace runs — expressed in
# RE2/Java-compatible syntax so the DuckDB oracle matches byte-for-byte
BPE_TOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (the approximation of tokenizer cost a
    training-data pipeline budgets by)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_PATTERN), 0))


def normalized_text(col: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lower-cased text (the exact-dedup key)."""
    return F.md5(normalized_text(col).cast("binary"))


# --------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, §A1.1) — the standard web-text
# filter set for LLM training corpora.  Pure Column expressions; the exact
# SQL mirror lives in __spark_entry__._gopher_sql.
# --------------------------------------------------------------------------


def _lines(col: Column) -> Column:
    return F.split(col, "\n")


def word_count(col: Column) -> Column:
    return token_count(col)


def symbol_word_ratio(col: Column) -> Column:
    """(# + ellipsis) symbols per word — Gopher drops docs above 0.1.
    Counts both the ASCII '...' and the Unicode '…' form, consistent with
    ellipsis_line_ratio."""
    n_sym = (
        F.length(col) - F.length(F.regexp_replace(col, r"#", ""))
        + (F.length(col) - F.length(F.regexp_replace(col, r"\.\.\.", ""))) / F.lit(3)
        + (F.length(col) - F.length(F.regexp_replace(col, r"…", "")))
    )
    return F.round(
        F.when(token_count(col) == 0, F.lit(0.0)).otherwise(
            n_sym / token_count(col)
        ),
        4,
    )


def bullet_line_ratio(col: Column) -> Column:
    """Fraction of lines starting with a bullet — Gopher drops above 0.9."""
    lines = _lines(col)
    bullets = F.size(
        F.filter(lines, lambda ln: F.trim(ln).startswith("•")
                 | F.trim(ln).startswith("-") | F.trim(ln).startswith("*"))
    )
    return F.round(
        F.when(F.size(lines) == 0, F.lit(0.0)).otherwise(
            bullets / F.size(lines)
        ),
        4,
    )


def ellipsis_line_ratio(col: Column) -> Column:
    """Fraction of lines ending in an ellipsis — Gopher drops above 0.3."""
    lines = _lines(col)
    ell = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).endswith("...")
                 | F.rtrim(ln).endswith("…"))
    )
    return F.round(
        F.when(F.size(lines) == 0, F.lit(0.0)).otherwise(ell / F.size(lines)),
        4,
    )


def duplicate_line_fraction(col: Column) -> Column:
    """1 - distinct/total lines (empty lines excluded) — repetition gate."""
    lines = F.filter(_lines(col), lambda ln: F.length(F.trim(ln)) > 0)
    return F.round(
        F.when(F.size(lines) == 0, F.lit(0.0)).otherwise(
            F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines)
        ),
        4,
    )


def alpha_word_ratio(col: Column) -> Column:
    """Fraction of words containing at least one alphabetic character —
    Gopher requires ≥ 0.8."""
    toks = tokens(col)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    return F.round(
        F.when(token_count(col) == 0, F.lit(0.0)).otherwise(
            n_alpha / token_count(col)
        ),
        4,
    )


def gopher_passes(col: Column) -> Column:
    """The composite Gopher gate: word count in [50, 100k], mean word
    length in [3, 10], symbol ratio ≤ 0.1, bullets ≤ 0.9, ellipses ≤ 0.3,
    alpha words ≥ 0.8, ≥ 2 stopword hits, duplicate lines ≤ 0.3.

    Scale note: the component higher-order expressions are interpreted
    (not codegen'd) and Catalyst re-inlines each reference, so this
    composite re-tokenizes the text several times per row — fine for the
    gate/oracle contract; a 100 TB filtering run should hoist the whole
    row into one Arrow kernel (see the minhash band kernel for the
    pattern)."""
    return (
        token_count(col).between(50, 100_000)
        & mean_word_len(col).between(3.0, 10.0)
        & (symbol_word_ratio(col) <= 0.1)
        & (bullet_line_ratio(col) <= 0.9)
        & (ellipsis_line_ratio(col) <= 0.3)
        & (alpha_word_ratio(col) >= 0.8)
        & (lang_stop_hits(col, "en") >= 2)
        & (duplicate_line_fraction(col) <= 0.3)
    )
