"""PDF font model: glyph widths, encodings, ToUnicode CMaps.

Built from the public PDF 1.7 spec (ISO 32000-1 §9) to support the real-
world PDF path — the reference gets all of this for free via poppler/
pdfplumber (doctor/tasks.py:75-89, doctor/lib/text_extraction.py:32-69).

Covers:
- simple fonts (Type1/TrueType/Type3): /FirstChar + /Widths +
  /MissingWidth, /Encoding base + /Differences (glyph-name → unicode via a
  compact Adobe-Glyph-List subset), cp1252/WinAnsi fallback;
- composite Type0/CID fonts with Identity two-byte codes, /W width ranges
  and /DW default width;
- /ToUnicode CMaps (bfchar + bfrange, both scalar and array forms).

Width units are em/1000 as in the spec; ``Font.decode`` yields
(unicode_text, width_em1000, code) per glyph.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# Adobe Glyph List subset: names that appear in /Differences arrays of
# Latin-text documents (letters map to themselves and are generated).
_AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•",
    "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
    "fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ", "ffi": "ﬃ",
    "ffl": "ﬄ", "perthousand": "‰", "trademark": "™",
    "copyright": "©", "registered": "®", "degree": "°",
    "section": "§", "paragraph": "¶", "cent": "¢",
    "sterling": "£", "yen": "¥", "florin": "ƒ",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "guillemotleft": "«", "guillemotright": "»",
    "exclamdown": "¡", "questiondown": "¿",
    "nbspace": " ", "minus": "−", "multiply": "×",
    "divide": "÷", "plusminus": "±", "mu": "µ",
    "adieresis": "ä", "odieresis": "ö", "udieresis": "ü",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "aacute": "á", "eacute": "é", "iacute": "í",
    "oacute": "ó", "uacute": "ú", "ntilde": "ñ",
    "agrave": "à", "egrave": "è", "ccedilla": "ç",
    "germandbls": "ß", "oslash": "ø", "aring": "å",
    "ae": "æ", "oe": "œ", "AE": "Æ", "OE": "Œ",
}
for _c in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ":
    _AGL[_c] = _c


def glyph_to_unicode(name: str) -> str:
    if name in _AGL:
        return _AGL[name]
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4})", name)
    if m:
        return chr(int(m.group(1), 16))
    m = re.fullmatch(r"u([0-9A-Fa-f]{4,6})", name)
    if m:
        return chr(int(m.group(1), 16))
    # gXX / cidXX / unnamed glyphs: unknown
    return ""


# shared single-byte decode base: cp1252, undecodable codes → ""
_CP1252_TEXTS: list = []
for _code in range(256):
    _t = bytes([_code]).decode("cp1252", errors="replace")
    _CP1252_TEXTS.append("" if _t == "�" else _t)


@dataclass
class Font:
    name: str = ""
    two_byte: bool = False
    widths: dict[int, float] = field(default_factory=dict)  # code → em/1000
    default_width: float = 500.0
    to_unicode: dict[int, str] = field(default_factory=dict)
    differences: dict[int, str] = field(default_factory=dict)  # code → char
    has_metrics: bool = False  # real /Widths (or /W) present
    fixed_pitch_600: bool = False  # Courier-family / synthetic-corpus model
    _tbl1: list | None = field(default=None, repr=False, compare=False)
    _ltbl: dict = field(default_factory=dict, repr=False, compare=False)

    def table1(self) -> list:
        """Memoized single-byte decode table: code → (text, width).  The
        per-glyph generator + two dict lookups was the hottest line of the
        real-PDF interpreter (profiled: ~260k resumptions per 24 docs);
        one 256-entry list lookup replaces all of it.  Built by overlaying
        the font's differences/ToUnicode/widths onto a shared cp1252 base
        (same precedence as the old per-code chain: ToUnicode, then
        Differences, then cp1252)."""
        tbl = self._tbl1
        if tbl is None:
            texts = _CP1252_TEXTS.copy()
            for code, t in self.differences.items():
                if 0 <= code < 256:
                    texts[code] = t
            for code, t in self.to_unicode.items():
                if 0 <= code < 256:
                    texts[code] = t
            w = [self.default_width] * 256
            for code, v in self.widths.items():
                if 0 <= code < 256:
                    w[code] = v
            tbl = list(zip(texts, w))
            self._tbl1 = tbl
        return tbl

    def layout_table(self, size: float, t_h: float) -> list:
        """Memoized per-(size, Tz) layout table: code → (text, w_text,
        glyph_width) with the size/Tz arithmetic baked in: ``w_text =
        w1000 / 1000.0 * size`` and ``width = w_text * Tz``.  Tc/Tw stay
        OUT of the table — documents kern by resetting Tc per show op, so
        a Tc-keyed cache would miss on almost every call (measured), and
        IEEE ordering forbids factoring them out of ``(w_text+Tc)*Tz``.
        Cached on the font, which persists across a document's pages via
        font_cache, so a 30-page brief builds each table once."""
        key = (size, t_h)
        tbl = self._ltbl.get(key)
        if tbl is None:
            if len(self._ltbl) > 64:  # hostile doc cycling text states
                self._ltbl.clear()
            base = self.table1()
            tbl = []
            for code in range(256):
                text, w1000 = base[code]
                w_text = w1000 / 1000.0 * size
                tbl.append((text, w_text, w_text * t_h))
            self._ltbl[key] = tbl
        return tbl

    def layout_table2(self, size: float, t_h: float) -> dict:
        """Two-byte (CID) analog of :meth:`layout_table`: a lazily-filled
        dict code → (text, w_text, width) memoizing the decode+width
        arithmetic per glyph code actually seen.  The caller fills
        misses with exactly the scalar chain: ``text =
        to_unicode.get(code)`` (``""`` for 0, ``"�"`` otherwise when
        absent); ``w_text = widths.get(code, default_width) / 1000.0 *
        size``; ``width = w_text * Tz``."""
        key = (size, t_h, 2)
        tbl = self._ltbl.get(key)
        if tbl is None:
            if len(self._ltbl) > 64:
                self._ltbl.clear()
            tbl = {}
            self._ltbl[key] = tbl
        return tbl

    def decode(self, raw: bytes):
        """Yield (text, width_em1000, code) per glyph code in ``raw``."""
        if self.two_byte:
            for i in range(0, len(raw) - 1, 2):
                code = (raw[i] << 8) | raw[i + 1]
                text = self.to_unicode.get(code)
                if text is None:
                    text = "" if code == 0 else "�"
                yield text, self.widths.get(code, self.default_width), code
            return
        tbl = self.table1()
        for code in raw:
            text, width = tbl[code]
            yield text, width, code

    def text_of(self, raw: bytes) -> str:
        # fast path for metric-less simple fonts (the synthetic corpus):
        # plain cp1252, no per-glyph work
        if not self.two_byte and not self.to_unicode and not self.differences:
            return raw.decode("cp1252", errors="replace")
        return "".join(t for t, _w, _c in self.decode(raw))


_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_RANGE_ITEM_RE = re.compile(
    rb"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f\s]+>)"
)


def _hex_bytes(s: bytes) -> bytes:
    hx = re.sub(rb"\s", b"", s)
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode())


def _dst_text(b: bytes) -> str:
    if len(b) % 2:
        b += b"\x00"
    return b.decode("utf-16-be", errors="replace")


def parse_tounicode(cmap: bytes) -> dict[int, str]:
    """Parse a /ToUnicode CMap's bfchar/bfrange sections → code → text."""
    out: dict[int, str] = {}
    for block in _BFCHAR_RE.findall(cmap):
        toks = _HEX_RE.findall(block)
        for i in range(0, len(toks) - 1, 2):
            src = _hex_bytes(toks[i])
            dst = _hex_bytes(toks[i + 1])
            out[int.from_bytes(src, "big")] = _dst_text(dst)
    for block in _BFRANGE_RE.findall(cmap):
        for m in _RANGE_ITEM_RE.finditer(block):
            lo = int.from_bytes(_hex_bytes(m.group(1)), "big")
            hi = int.from_bytes(_hex_bytes(m.group(2)), "big")
            dst = m.group(3)
            if hi < lo or hi - lo > 1 << 16:
                continue
            if dst.startswith(b"["):
                items = _HEX_RE.findall(dst)
                for off, item in enumerate(items):
                    if lo + off <= hi:
                        out[lo + off] = _dst_text(_hex_bytes(item))
            else:
                base = _hex_bytes(dst[1:-1] if dst.startswith(b"<") else dst)
                base_i = int.from_bytes(base, "big")
                # widen if the increment overflows the declared width
                # (malformed CMaps like <0000><00FF> → <FFFF> otherwise
                # raise OverflowError and poison the whole document)
                nbytes = max(
                    2, len(base), ((base_i + hi - lo).bit_length() + 7) // 8
                )
                for off in range(hi - lo + 1):
                    out[lo + off] = _dst_text(
                        (base_i + off).to_bytes(nbytes, "big")
                    )
    return out


def parse_w_array(w: list) -> dict[int, float]:
    """CIDFont /W array → cid → width (ISO 32000-1 §9.7.4.3)."""
    out: dict[int, float] = {}
    i = 0
    n = len(w)
    while i < n:
        first = w[i]
        if not isinstance(first, (int, float)) or i + 1 >= n:
            break
        nxt = w[i + 1]
        if isinstance(nxt, list):
            for off, width in enumerate(nxt):
                if isinstance(width, (int, float)):
                    out[int(first) + off] = float(width)
            i += 2
        elif isinstance(nxt, (int, float)) and i + 2 < n and isinstance(
            w[i + 2], (int, float)
        ):
            last, width = int(nxt), float(w[i + 2])
            if last >= int(first) and last - int(first) <= 1 << 16:
                for cid in range(int(first), last + 1):
                    out[cid] = width
            i += 3
        else:
            break
    return out
