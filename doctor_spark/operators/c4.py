"""C4 cleaning stages (Raffel et al. 2020, §2.2) — the canonical
web-corpus cleaning recipe, re-expressed Spark-first.

Two stages:

- :func:`c4_line_filter` — the per-page LINE-retention rules plus the
  page-level poison gates.  Entirely pure Column expressions (split →
  higher-order filter → rejoin): zero Python, zero shuffles, whole-stage
  codegen — a 10^12-page corpus pays exactly one map pass.
- :func:`c4_span_dedup` — C4's corpus-level "three-span" dedup: any
  n-line span occurring more than once corpus-wide survives only at its
  FIRST occurrence; every other occurrence's lines are removed from
  their pages.  (C4 §2.2 phrases the unit as a three-SENTENCE span; this
  operator's documented dialect is three LINES, the unit every other
  line-level stage here shares — sentence-unit callers can pre-split
  with kernels/sentences.py and feed one sentence per line.)

Reference anchor: freelawproject/doctor is a per-document extraction
service with no corpus-level cleaning stage (doctor/tasks.py extracts
one payload at a time); C4's recipe is the standard cleaning pass the
extraction tier feeds, so it is implemented here as a first-class
operator like the Gopher/CCNet/Dolma stages.

Line-retention spec (C4 keeps a line only if ALL hold):

- after trimming ASCII spaces/tabs at both ends, the line ends in a
  terminal punctuation mark: ``.``, ``!``, ``?``, or ``"``;
- it has at least ``min_line_words`` (default 5) space-separated words;
- it does not contain the word "javascript" (case-insensitive substring
  — C4 dropped any line with the word Javascript).

Page-poison gates (C4 drops the whole page if ANY hold), evaluated on
the ORIGINAL page text, reported as ``drop_reason`` in first-match
order:

- ``lorem_ipsum``: the page contains "lorem ipsum" (case-insensitive);
- ``brace``: the page contains ``{`` (code, not prose);
- ``banned_word``: any whitespace-separated lowercase token equals a
  member of ``banned_words`` (production plugs in the LDNOOBW "List of
  Dirty, Naughty, Obscene..." inventory C4 used; the default here is
  empty — this repo ships no such list);
- ``too_few_lines``: fewer than ``min_kept_lines`` (default 3) retained
  lines — C4's "at least 3 sentences" rule in this dialect's unit.

Span-dedup scale shape: the exploded span stream carries only
``(doc_id, start, hash60)`` — the page text NEVER rides the span
exchange.  One exchange on the 8-byte span hash (first-occurrence
window), one exchange on doc_id (removed-index aggregation), one keyed
join back to the corpus.  Overlap semantics are mark-then-remove: every
line covered by any non-first duplicated span occurrence is removed,
including lines a doc's own kept span shares with a removed one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TERMINAL_PUNCT = (".", "!", "?", '"')
MIN_LINE_WORDS = 5
MIN_KEPT_LINES = 3

# line-trim spec: ASCII space/tab at either end (a line cannot contain
# the newline that delimited it; the page text is the unit of record)
_TRIM_RE = r"^[ \t]+|[ \t]+$"


def _trimmed(ln):
    return F.regexp_replace(ln, _TRIM_RE, "")


def _line_kept(ln, min_line_words: int):
    t = _trimmed(ln)
    words = F.filter(F.split(t, " "), lambda w: w != "")
    return (
        F.substring(t, -1, 1).isin(*TERMINAL_PUNCT)
        & (F.size(words) >= min_line_words)
        & (F.instr(F.lower(t), "javascript") == 0)
    )


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = MIN_LINE_WORDS,
    min_kept_lines: int = MIN_KEPT_LINES,
    banned_words: tuple[str, ...] = (),
) -> DataFrame:
    """C4 line-retention + page-poison pass; see the module docstring.

    Output: ``(id_col, n_lines, n_kept, drop_reason, page_ok,
    cleaned_text)`` — ``cleaned_text`` is the retained lines rejoined by
    newline (reported even for poisoned pages; a training pipeline
    filters ``WHERE page_ok``).  Pure Column expressions throughout:
    zero shuffles at any corpus size.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, "\n")
    kept = F.filter(lines, lambda ln: _line_kept(ln, min_line_words))
    low = F.lower(text)
    if banned_words:
        toks = F.filter(F.split(low, r"[ \t\n\x0b\f\r]"),
                        lambda w: w != "")
        banned_hit = F.arrays_overlap(
            toks, F.array(*[F.lit(w) for w in sorted(banned_words)])
        )
    else:
        banned_hit = F.lit(False)
    reason = (
        F.when(F.instr(low, "lorem ipsum") > 0, F.lit("lorem_ipsum"))
        .when(F.instr(text, "{") > 0, F.lit("brace"))
        .when(banned_hit, F.lit("banned_word"))
        .when(F.size(kept) < min_kept_lines, F.lit("too_few_lines"))
    )
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        reason.alias("drop_reason"),
        reason.isNull().alias("page_ok"),
        F.array_join(
            F.transform(kept, lambda ln: _trimmed(ln)), "\n"
        ).alias("cleaned_text"),
    )


def _hash60(col):
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10) \
            .cast("long")


def c4_span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """C4 corpus-level n-line-span dedup; see the module docstring.

    Any n-line span (trim-normalized, newline-joined, 60-bit md5 key)
    occurring more than once corpus-wide keeps only its FIRST occurrence
    — ordered by ``(doc_id, start)`` — and every line covered by a
    non-first occurrence is removed from its page.  Pages shorter than
    ``n`` lines emit no spans and survive untouched.

    Output: ``(id_col, n_lines, n_removed, cleaned_text)``.

    Plan: span hashing is a per-row higher-order expression over the
    line array (no Python); the exploded stream carries ``(doc_id,
    start, h)`` only.  Exchange 1: window on ``h`` (count + first
    occurrence).  Exchange 2: groupBy ``doc_id`` collecting the removed
    line-index set (bounded by the page's own length).  Exchange 3: the
    keyed join back to the corpus; reassembly is an index-filtered
    transform, again pure codegen.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(F.col(id_col), text.alias("__text"))

    lines = F.split(F.col("__text"), "\n")
    norm = F.transform(lines, _trimmed)
    # sequence(1, 0) DESCENDS in Spark, so pages shorter than n lines
    # must short-circuit to an empty span array instead
    spans = F.when(
        F.size(norm) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(norm) - (n - 1)),
            lambda i: F.struct(
                i.alias("start"),
                _hash60(F.concat_ws("\n", F.slice(norm, i, n))).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<start:int,h:bigint>>"))
    occ = base.select(
        F.col(id_col), F.explode(spans).alias("s")
    ).select(id_col, F.col("s.start").alias("start"), F.col("s.h").alias("h"))

    w = Window.partitionBy("h")
    marked = occ.select(
        id_col,
        "start",
        (
            (F.count(F.lit(1)).over(w) > 1)
            & (
                F.struct(F.col(id_col), F.col("start"))
                != F.min(F.struct(F.col(id_col), F.col("start"))).over(w)
            )
        ).alias("removed"),
    )
    removed_idx = (
        marked.where("removed")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (n - 1))
            ).alias("idx"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("idx").alias("__removed"))
    )

    out = base.join(removed_idx, on=id_col, how="left")
    rem = F.coalesce(F.col("__removed"), F.array().cast("array<int>"))
    lines2 = F.split(F.col("__text"), "\n")
    kept = F.filter(
        F.transform(lines2, lambda ln, i: F.struct(
            (i + 1).alias("pos"), ln.alias("ln"))),
        lambda s: ~F.array_contains(rem, s["pos"]),
    )
    return out.select(
        F.col(id_col),
        F.size(lines2).cast("long").alias("n_lines"),
        F.size(rem).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(kept, lambda s: s["ln"]), "\n"
        ).alias("cleaned_text"),
    )
