"""Boundary-aware document chunking — the pretraining/RAG segmentation
stage downstream of extraction: split a document into chunks of at most
``max_tokens`` whitespace tokens, breaking at the strongest structural
boundary available (paragraph, then sentence, then hard token split),
so a chunk almost never severs a sentence and never severs a token.

Deterministic greedy spec (the contract the oracle and tests replay):

1. Paragraphs = the document split on blank-line runs
   (``\\n[ \\t]*\\n`` separators, i.e. ``\\n\\s*\\n`` without
   consuming a following paragraph's leading newline structure);
   leading/trailing whitespace of each paragraph is stripped; empty
   paragraphs are dropped.  Token count = whitespace tokens.
2. Greedy paragraph packing in document order: a paragraph joins the
   current chunk when ``cur_tokens + para_tokens <= max_tokens``,
   else the current chunk is flushed.
3. A paragraph that alone exceeds ``max_tokens`` is split into
   sentences (:func:`..kernels.sentences.split_sentences` — the
   repo's deterministic boundary spec) and the same greedy packing
   runs over sentences (never mixing into a paragraph-level chunk:
   the oversize paragraph always starts fresh).
4. A sentence that alone exceeds ``max_tokens`` is hard-split into
   consecutive ``max_tokens``-token pieces (the last piece may be
   short).  Hard pieces never share a chunk with anything else.
5. Chunk text joins paragraphs with ``"\\n\\n"`` and sentences/hard
   pieces with ``" "``.  Every chunk records its 1-based index, its
   token count, and its break kind: ``para`` (ends at a paragraph
   boundary), ``sent`` (sentence packing), ``hard`` (token split).

Blank/None documents produce no chunks.  Pure Python over one string —
O(len) — run as an Arrow batch per partition by the operator.
"""

from __future__ import annotations

import re

from .sentences import split_sentences

_PARA_SPLIT = re.compile(r"\n[ \t]*\n+")
_WS = re.compile(r"\s+")


def _ntok(s: str) -> int:
    s = s.strip()
    return len(_WS.split(s)) if s else 0


def chunk_text(
    text: str | None, max_tokens: int = 256
) -> list[tuple[int, int, str, str]]:
    """``[(chunk_idx, n_tokens, kind, chunk_text), ...]`` per the
    module spec.  ``max_tokens`` must be >= 1."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if text is None:
        return []
    paras = [p.strip() for p in _PARA_SPLIT.split(text)]
    paras = [p for p in paras if p]
    out: list[tuple[int, int, str, str]] = []
    cur: list[str] = []
    cur_n = 0

    def flush(kind: str) -> None:
        nonlocal cur, cur_n
        if cur:
            sep = "\n\n" if kind == "para" else " "
            out.append((len(out) + 1, cur_n, kind, sep.join(cur)))
            cur, cur_n = [], 0

    for p in paras:
        pn = _ntok(p)
        if pn <= max_tokens:
            if cur_n + pn > max_tokens:
                flush("para")
            cur.append(p)
            cur_n += pn
            continue
        # oversize paragraph: flush, then sentence-pack it
        flush("para")
        for s in split_sentences(p):
            sn = _ntok(s)
            if sn <= max_tokens:
                if cur_n + sn > max_tokens:
                    flush("sent")
                cur.append(s)
                cur_n += sn
                continue
            # oversize sentence: flush, then hard token pieces
            flush("sent")
            toks = _WS.split(s.strip())
            for i in range(0, len(toks), max_tokens):
                piece = toks[i : i + max_tokens]
                out.append(
                    (len(out) + 1, len(piece), "hard", " ".join(piece))
                )
        flush("sent")
    flush("para")
    return out
