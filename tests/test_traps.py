"""Crawler-trap detection — per-URL signals, thresholds, host rollup,
plan shape (zero exchanges on signals, one on the rollup)."""

from pyspark.sql import functions as F

from doctor_spark.operators.traps import host_trap_table, url_trap_signals
from doctor_spark.plans.checks import count_exchanges


def _sig(spark, url):
    d = spark.createDataFrame([(url,)], "url string")
    return url_trap_signals(d).collect()[0]


class TestSignals:
    def test_calendar_needs_depth(self, spark):
        deep = _sig(spark, "http://a.com/blog/2019/5/7/post-1")
        assert deep.has_calendar and deep.depth == 5 and deep.is_trap
        shallow = _sig(spark, "http://a.com/2019/5/7")
        assert shallow.has_calendar and shallow.depth == 3
        assert not shallow.is_trap

    def test_path_cycle(self, spark):
        r = _sig(spark, "http://a.com/forum/thread/forum/thread/view")
        assert r.depth == 5 and r.repeat_excess == 2 and r.is_trap
        clean = _sig(spark, "http://a.com/forum/thread/view")
        assert clean.repeat_excess == 0 and not clean.is_trap

    def test_deep_path(self, spark):
        r = _sig(spark, "http://a.com/a/b/c/d/e/f/g/h/i")
        assert r.depth == 9 and r.is_trap
        assert not _sig(spark, "http://a.com/a/b/c/d/e/f/g").is_trap

    def test_session_ids_both_forms(self, spark):
        q = _sig(spark, "http://a.com/login?phpsessid=deadbeef01")
        assert q.has_session and q.is_trap
        p = _sig(spark, "http://a.com/cart;jsessionid=0123456789ab")
        assert p.has_session and p.is_trap
        # <8 hex chars: an ordinary short id, not minting
        assert not _sig(spark, "http://a.com/x?sid=ab12").has_session

    def test_param_explosion_and_fragment(self, spark):
        r = _sig(spark, "http://a.com/i?a=1&b=2&c=3&d=4&e=5&f=6")
        assert r.n_params == 6 and r.is_trap
        # fragment stripped before counting
        f = _sig(spark, "http://a.com/i?a=1&b=2#c=3&d=4&e=5&f=6")
        assert f.n_params == 2 and not f.is_trap

    def test_signals_are_map_only(self, spark):
        d = spark.createDataFrame([("http://a.com/x",)], "url string")
        assert count_exchanges(url_trap_signals(d)) == 0


class TestHostRollup:
    def test_rollup_and_flag(self, spark):
        rows = [
            ("http://trap.com/forum/thread/forum/thread/view",),
            ("http://trap.com/a/b/c/d/e/f/g/h/i",),
            ("http://trap.com/ok",),
            ("http://clean.com/about",),
            ("http://clean.com/blog/2019/5/7/post",),
            ("http://clean.com/contact",),
            ("http://clean.com/x",),
        ]
        d = spark.createDataFrame(rows, "url string")
        out = {r.host: r for r in host_trap_table(d).collect()}
        t = out["trap.com"]
        assert (t.n_urls, t.n_trap, t.n_repeat, t.n_deep) == (3, 2, 1, 1)
        assert t.trap_micro == 666_666 and t.flagged
        c = out["clean.com"]
        assert (c.n_urls, c.n_trap, c.n_calendar) == (4, 1, 1)
        assert c.trap_micro == 250_000 and not c.flagged

    def test_one_exchange(self, spark):
        d = spark.createDataFrame([("http://a.com/x",)], "url string")
        assert count_exchanges(host_trap_table(d)) == 1
