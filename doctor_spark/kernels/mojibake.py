"""pdffactory mojibake repair.

Certain ca9 PDFs produced by pdfFactory encode Latin text with a shifted
symbol font; the reference repairs them with a fixed character map
(doctor/lib/mojibake.py:4-99), applied only when the extracted text contains
no ``"e"`` (doctor/tasks.py:218-221 — the most common English letter being
absent is the corruption tell).

Same mapping, re-expressed as a ``str.translate`` table (vectorizable via
``pandas.Series.str.translate`` inside Arrow UDF batches).
"""

from __future__ import annotations

# source char -> replacement (1- or 2-char); unknown chars pass through.
_PAIRS: tuple[tuple[str, str], ...] = (
    # lowercase a-z: ¿ down through ¦ (with two irregulars: k=μ, s=-)
    ("¿", "a"), ("¾", "b"), ("½", "c"), ("¼", "d"), ("»", "e"), ("º", "f"),
    ("¹", "g"), ("¸", "h"), ("·", "i"), ("¶", "j"), ("μ", "k"), ("´", "l"),
    ("µ", "k"),  # U+00B5 micro sign — the cp1252 byte behind the reference's
                 # U+03BC entry (lib/mojibake.py:18); both map to k
    ("³", "m"), ("²", "n"), ("±", "o"), ("°", "p"), ("¯", "q"), ("®", "r"),
    ("-", "s"), ("¬", "t"), ("«", "u"), ("ª", "v"), ("©", "w"), ("¨", "x"),
    ("§", "y"), ("¦", "z"),
    # uppercase A-Z: ß down through Æ (Q and X glyphs missing in the wild)
    ("ß", "A"), ("Þ", "B"), ("Ý", "C"), ("Ü", "D"), ("Û", "E"), ("Ú", "F"),
    ("Ù", "G"), ("Ø", "H"), ("×", "I"), ("Ö", "J"), ("Õ", "K"), ("Ô", "L"),
    ("Ó", "M"), ("Ò", "N"), ("Ñ", "O"), ("Ð", "P"), ("Î", "R"), ("Í", "S"),
    ("Ì", "T"), ("Ë", "U"), ("Ê", "V"), ("É", "W"), ("Ç", "Y"), ("Æ", "Z"),
    # digits 0-9: ð down through ç
    ("ð", "0"), ("ï", "1"), ("î", "2"), ("í", "3"), ("ì", "4"), ("ë", "5"),
    ("ê", "6"), ("é", "7"), ("è", "8"), ("ç", "9"),
    # punctuation
    ("ò", "."), ("ô", ","), ("æ", ":"), ("å", ";"), ("Ž", "'"),
    ("•", "'"),   # double quote in the original font; identical to single
    ("Œ", "'"),   # double quote in the original font; identical to single
    ("ó", "-"), ("Š", "-"), ("‰", "--"), ("ú", "&"), ("ö", "*"), ("ñ", "/"),
    ("÷", ")"), ("ø", "("), ("Å", "["), ("Ã", "]"), ("‹", "•"),
)

TRANSLATE_TABLE: dict[int, str] = {ord(src): dst for src, dst in _PAIRS}


def fix_mojibake(text: str) -> str:
    """Remap pdffactory-corrupted text to sane text; unmapped chars pass
    through unchanged (reference falls back to ``smart_str``, an identity on
    already-decoded str — doctor/lib/mojibake.py:88-99).
    """
    return text.translate(TRANSLATE_TABLE)


def looks_mojibake(text: str) -> bool:
    """The reference's corruption gate: no ``"e"`` anywhere in the content
    (doctor/tasks.py:218-219).  Applied only on the no-OCR path.
    """
    return "e" not in text
