"""Punycode (RFC 3492) codec and IDN host decoding — from scratch.

Internationalized domain names reach a crawl as ASCII ``xn--`` labels;
anything that reasons about host identity (homograph detection, mirror
grouping, per-host quality) must first decode them.  This is a clean-
room implementation of the public RFC 3492 bootstring algorithm with
the IDNA parameters (base 36, tmin 1, tmax 26, skew 38, damp 700,
initial_bias 72, initial_n 128) — no stdlib ``punycode`` codec in the
operator path (the tests use it only as a differential oracle).

Reference scope: doctor has no IDN handling; this supports the
training-data-pipeline host-identity operators (operators/idn.py).
"""

from __future__ import annotations

BASE = 36
TMIN = 1
TMAX = 26
SKEW = 38
DAMP = 700
INITIAL_BIAS = 72
INITIAL_N = 128


class PunycodeError(ValueError):
    """Malformed punycode input."""


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((BASE - TMIN) * TMAX) // 2:  # 455
        delta //= BASE - TMIN
        k += BASE
    return k + ((BASE - TMIN + 1) * delta) // (delta + SKEW)


def _digit(ch: str) -> int:
    o = ord(ch)
    if 0x41 <= o <= 0x5A:  # A-Z
        return o - 0x41
    if 0x61 <= o <= 0x7A:  # a-z
        return o - 0x61
    if 0x30 <= o <= 0x39:  # 0-9
        return o - 0x30 + 26
    raise PunycodeError(f"invalid punycode digit {ch!r}")


def punycode_decode(s: str) -> str:
    """Decode one punycode string (the part after ``xn--``)."""
    if not s.isascii():
        raise PunycodeError("punycode input must be ASCII")
    pos = s.rfind("-")
    if pos > 0:
        output = list(s[:pos])
        rest = s[pos + 1 :]
    else:
        output = []
        rest = s[1:] if pos == 0 else s
    n, i, bias = INITIAL_N, 0, INITIAL_BIAS
    idx = 0
    while idx < len(rest):
        oldi, w, k = i, 1, BASE
        while True:
            if idx >= len(rest):
                raise PunycodeError("truncated variable-length integer")
            digit = _digit(rest[idx])
            idx += 1
            i += digit * w
            if i > 0x10FFFF * 1000:  # overflow guard, far past Unicode
                raise PunycodeError("punycode integer overflow")
            t = min(max(k - bias, TMIN), TMAX)
            if digit < t:
                break
            w *= BASE - t
            k += BASE
        bias = _adapt(i - oldi, len(output) + 1, oldi == 0)
        n += i // (len(output) + 1)
        i %= len(output) + 1
        if n > 0x10FFFF:
            raise PunycodeError("codepoint out of Unicode range")
        output.insert(i, chr(n))
        i += 1
    return "".join(output)


def punycode_encode(s: str) -> str:
    """Encode a Unicode string to punycode (RFC 3492 §6.3)."""
    basic = [c for c in s if ord(c) < 0x80]
    output = basic.copy()
    if basic:
        output.append("-")
    n, delta, bias = INITIAL_N, 0, INITIAL_BIAS
    h = b = len(basic)
    cps = sorted({ord(c) for c in s if ord(c) >= 0x80})
    for m in cps:
        delta += (m - n) * (h + 1)
        n = m
        for c in s:
            cp = ord(c)
            if cp < n:
                delta += 1
            elif cp == n:
                q = delta
                k = BASE
                while True:
                    t = min(max(k - bias, TMIN), TMAX)
                    if q < t:
                        break
                    output.append(_to_digit(t + (q - t) % (BASE - t)))
                    q = (q - t) // (BASE - t)
                    k += BASE
                output.append(_to_digit(q))
                bias = _adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(output)


def _to_digit(d: int) -> str:
    if d < 26:
        return chr(ord("a") + d)
    return chr(ord("0") + d - 26)


def decode_idn_host(host: str) -> str:
    """Decode every ``xn--`` label of a (lowercased, ASCII) hostname;
    non-IDN labels pass through.  A malformed ``xn--`` label passes
    through UNDECODED (fail-open per label: a crawl must not drop a
    host because one label is mangled)."""
    labels = []
    for label in host.split("."):
        if label.startswith("xn--"):
            try:
                labels.append(punycode_decode(label[4:]))
            except PunycodeError:
                labels.append(label)
        else:
            labels.append(label)
    return ".".join(labels)
