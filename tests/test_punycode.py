"""Punycode kernel — RFC 3492 fixed vectors, stdlib differential,
malformed-input contract, IDN host decode fail-open."""

import random

import pytest

from doctor_spark.kernels.punycode import (
    PunycodeError,
    decode_idn_host,
    punycode_decode,
    punycode_encode,
)


FIXED = [
    # (unicode, punycode) — lowercase U-labels; encodings verified
    # against the CPython 'punycode' codec (itself RFC 3492).
    ("münchen", "mnchen-3ya"),
    ("bücher", "bcher-kva"),
    ("пример", "e1afmkfd"),
    ("рф", "p1ai"),
    ("中文", "fiq228c"),
    ("例え", "r8jz45g"),
    ("café-crème", "caf-crme-60ag"),
    # RFC 3492 §7.1 sample strings (subset, lowercase)
    ("ليهمابتكلموشعربي؟", "egbpdaj6bu4bxfgehfvwxn"),
    ("他们为什么不说中文", "ihqwcrb4cv8a8dqg056pqjye"),
    ("pročprostěnemluvíčesky", "proprostnemluvesky-uyb24dma41a"),
]


class TestCodec:
    def test_fixed_vectors(self):
        for uni, puny in FIXED:
            assert punycode_encode(uni) == puny
            assert punycode_decode(puny) == uni

    def test_ascii_only_roundtrip(self):
        # all-basic input: encode appends the delimiter, decode strips it
        assert punycode_decode(punycode_encode("abc")) == "abc"

    def test_stdlib_differential(self):
        rng = random.Random(7)
        alphabets = [
            "abcdefghij",
            "абвгдежзик",
            "αβγδεζηθικ",
            "一二三四五六七八九十",
            "abcа-оx0",
        ]
        n = 0
        for _ in range(1500):
            alpha = rng.choice(alphabets) + rng.choice(alphabets)
            s = "".join(
                rng.choice(alpha) for _ in range(rng.randint(0, 12))
            )
            enc = s.encode("punycode").decode("ascii")
            assert punycode_encode(s) == enc, s
            assert punycode_decode(enc) == s
            n += 1
        assert n == 1500

    def test_malformed_raises_punycode_error(self):
        with pytest.raises(PunycodeError):
            punycode_decode("!!!")  # invalid digit
        with pytest.raises(PunycodeError):
            punycode_decode("mnchen-9")  # truncated varint
        with pytest.raises(PunycodeError):
            punycode_decode("münchen")  # non-ASCII input
        with pytest.raises(PunycodeError):
            # forces n past U+10FFFF in one step
            punycode_decode("99999999")


class TestHostDecode:
    def test_decodes_every_idn_label(self):
        assert decode_idn_host("xn--mnchen-3ya.de") == "münchen.de"
        assert (
            decode_idn_host("xn--e1afmkfd.xn--p1ai") == "пример.рф"
        )

    def test_non_idn_labels_pass_through(self):
        assert decode_idn_host("plain.example.org") == "plain.example.org"
        assert decode_idn_host("xn--mnchen-3ya.example.org") == (
            "münchen.example.org"
        )

    def test_malformed_label_fails_open(self):
        # one mangled label must not drop the host
        assert decode_idn_host("xn--!!!.com") == "xn--!!!.com"
        assert (
            decode_idn_host("xn--!!!.xn--p1ai") == "xn--!!!.рф"
        )
