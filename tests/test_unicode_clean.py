"""unicode_clean: spec-row edges, a direct Python-vs-DuckDB NFC
differential on hostile strings, and the zero-shuffle plan."""

import unicodedata

import duckdb
from pyspark.sql import functions as F

from doctor_spark.functions.text import (
    UC_CONTROLS,
    UC_SPACE_LIKE,
    UC_ZERO_WIDTH,
    unicode_clean_row,
    unicode_clean_udf,
)
from doctor_spark.plans.checks import count_exchanges, physical_plan


def test_sets_are_disjoint_and_exclude_kept_whitespace():
    all_sets = UC_SPACE_LIKE + UC_ZERO_WIDTH + UC_CONTROLS
    assert len(set(all_sets)) == len(all_sets)
    for kept in " \t\n\r":
        assert kept not in all_sets


def test_nfc_composition_and_counts():
    clean, n_sp, n_zw, n_ctl, changed = unicode_clean_row(
        "Cafe\u0301\u200b X\u00a0Y\x01Z"
    )
    # e+acute composed, ZWSP dropped, NBSP -> space, \x01 dropped
    assert clean == "Caf\u00e9 X YZ"
    assert (n_sp, n_zw, n_ctl, changed) == (1, 1, 1, True)


def test_nfc_keeps_compatibility_chars():
    # fi ligature and fullwidth are CONTENT under NFC (not NFKC)
    clean, *_ , changed = unicode_clean_row("ﬁle Ａ")
    assert clean == "ﬁle Ａ" and changed is False


def test_hangul_jamo_composes():
    clean, *_ = unicode_clean_row("가")
    assert clean == "가"


def test_none_and_plain():
    assert unicode_clean_row(None) == (None,) * 5
    assert unicode_clean_row("plain") == ("plain", 0, 0, 0, False)


def test_counts_measured_after_nfc():
    # ANGSTROM SIGN U+212B -> NFC U+00C5; no set members involved
    clean, n_sp, n_zw, n_ctl, changed = unicode_clean_row("Å")
    assert clean == "Å" and changed is True
    assert (n_sp, n_zw, n_ctl) == (0, 0, 0)


def test_differential_vs_duckdb_on_hostile_strings():
    """Python unicodedata NFC vs DuckDB utf8proc NFC + the RE2-class
    replay, directly on strings the sf corpus never carries."""
    cls = {
        name: "[" + "".join(f"\\x{{{ord(c):x}}}" for c in chars) + "]"
        for name, chars in
        (("sp", UC_SPACE_LIKE), ("zw", UC_ZERO_WIDTH), ("ctl", UC_CONTROLS))
    }
    con = duckdb.connect()
    hostile = [
        "ṩ",            # dot-below + dot-above reordering
        "q̣̇",            # canonical reorder the other way
        "ṩ",                   # precomposed target of the above
        "Å‍́",  # ring + ZWJ + acute (ZWJ blocks)
        "\U0001f600\u200b\U0001f600",  # astral + ZWSP
        "　  ",       # space-likes only
        "\x1b[31mANSI\x1b[0m",      # terminal escapes
        "﻿BOM at start",
        "é" * 50,             # long combining run
        "ÅÅÅ",  # three spellings of Å
    ]
    for s in hostile:
        py = unicode_clean_row(s)
        q = f"""
        WITH nfc AS (SELECT nfc_normalize(?) AS t1)
        SELECT regexp_replace(regexp_replace(regexp_replace(t1,
                 '{cls["sp"]}', ' ', 'g'), '{cls["zw"]}', '', 'g'),
                 '{cls["ctl"]}', '', 'g'),
               length(t1) - length(regexp_replace(t1, '{cls["sp"]}', '', 'g')),
               length(t1) - length(regexp_replace(t1, '{cls["zw"]}', '', 'g')),
               length(t1) - length(regexp_replace(t1, '{cls["ctl"]}', '', 'g'))
        FROM nfc
        """
        duck = con.execute(q, [s]).fetchone()
        assert py[:4] == (duck[0], duck[1], duck[2], duck[3]), (s, py, duck)
        # and the NFC forms agree outright
        assert unicodedata.normalize("NFC", s) == con.execute(
            "SELECT nfc_normalize(?)", [s]).fetchone()[0], s


def test_operator_plan_zero_exchanges(spark):
    df = spark.createDataFrame(
        [(1, "Café​ x")], "doc_id bigint, text string"
    )
    k = unicode_clean_udf()(F.col("text"))
    q = df.select("doc_id", k.getField("clean").alias("clean"))
    assert q.collect()[0]["clean"] == "Café x"
    assert count_exchanges(q) == 0, physical_plan(q)
    assert physical_plan(q).count("ArrowEvalPython (") == 1
