"""IDN operator — decode table, mixed-script flag, skeleton,
homograph pairing against the corpus's ASCII hosts."""

from doctor_spark.operators.idn import (
    homograph_pairs,
    host_skeleton,
    idn_host_table,
)


HOSTS = [
    ("xn--mnchen-3ya.de",),       # honest IDN, no Latin lookalike
    ("xn--80ak6aa92e.com",),      # pure-Cyrillic apple lookalike
    ("xn--pple-43d.com",),        # Cyrillic а + Latin pple → mixed
    ("xn--e1afmkfd.xn--p1ai",),   # пример.рф — no collision
    ("apple.com",),               # the imitated ASCII host
    ("example.org",),
    ("xn--!!!.com",),             # malformed label: fails open
    (None,),
]


class TestHostTable:
    def test_decode_and_flags(self, spark):
        d = spark.createDataFrame(HOSTS, "host string")
        out = {r.host: r for r in idn_host_table(d).collect() if r.host}
        m = out["xn--mnchen-3ya.de"]
        assert m.unicode_host == "münchen.de" and m.is_idn
        assert not m.mixed_script and m.skeleton == "münchen.de"
        a = out["xn--80ak6aa92e.com"]
        assert a.unicode_host == "аррӏе.com"
        assert a.skeleton == "apple.com" and not a.mixed_script
        x = out["xn--pple-43d.com"]
        assert x.unicode_host == "аpple.com" and x.mixed_script
        assert x.skeleton == "apple.com"
        p = out["apple.com"]
        assert not p.is_idn and p.skeleton == "apple.com"
        bad = out["xn--!!!.com"]
        assert bad.unicode_host == "xn--!!!.com" and bad.is_idn

    def test_skeleton_identity_on_ascii(self):
        assert host_skeleton("example.org") == "example.org"
        assert host_skeleton("аррӏе.com") == "apple.com"
        assert host_skeleton("αρρle.com") == "apple.com"


class TestHomographPairs:
    def test_pairs_only_idn_x_ascii(self, spark):
        d = spark.createDataFrame(HOSTS * 2, "host string")  # dups ok
        rows = homograph_pairs(d).collect()
        got = {(r.idn_host, r.ascii_host) for r in rows}
        assert got == {
            ("xn--80ak6aa92e.com", "apple.com"),
            ("xn--pple-43d.com", "apple.com"),
        }
        by_idn = {r.idn_host: r for r in rows}
        assert by_idn["xn--pple-43d.com"].mixed_script
        assert not by_idn["xn--80ak6aa92e.com"].mixed_script

    def test_no_ascii_side_no_pairs(self, spark):
        d = spark.createDataFrame(
            [("xn--80ak6aa92e.com",)], "host string"
        )
        assert homograph_pairs(d).count() == 0
