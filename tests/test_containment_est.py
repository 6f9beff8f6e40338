"""MinHash-estimated containment — estimator formula, directionality,
and estimation quality bounded against the exact operator."""


def containment_est_pairs(*a, **kw):
    from doctor_spark.operators.dedup import containment_est_pairs as f

    return f(*a, **kw)


def containment_pairs(*a, **kw):
    from doctor_spark.operators.dedup import containment_pairs as f

    return f(*a, **kw)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
]


class TestContainmentEst:
    def test_identical_docs_estimate_full_containment(self, spark):
        t = " ".join(WORDS)
        out = {
            (r["src_id"], r["dst_id"]): r
            for r in containment_est_pairs(
                _docs(spark, [(1, t), (2, t)]), threshold=0.9,
            ).collect()
        }
        # all 128 positions match -> J=1 -> c_est exactly 1.0 both ways
        assert out[(1, 2)]["m"] == 128
        assert out[(1, 2)]["c_est_micro"] == 1_000_000
        assert out[(2, 1)]["c_est_micro"] == 1_000_000

    def test_inclusion_direction_scores_higher(self, spark):
        small = " ".join(WORDS[:10])
        big = small + " " + " ".join(w + "x" for w in WORDS)
        out = {
            (r["src_id"], r["dst_id"]): r["c_est_micro"]
            for r in containment_est_pairs(
                _docs(spark, [(1, small), (2, big)]), threshold=0.0,
                min_shingles=1,
            ).collect()
        }
        if out:  # band collision not guaranteed at J≈0.3, but if
            # candidates surface the asymmetry must hold
            assert out[(1, 2)] > out[(2, 1)]

    def test_estimate_tracks_exact_on_near_dups(self, spark):
        # near-dup family: copies with small tail edits — high J, so the
        # 16-band LSH surfaces them all; estimator must track the exact
        # containment within MinHash error (~1/sqrt(128) ≈ 0.09 per
        # side, use 0.15 slack)
        base = " ".join(WORDS * 3)
        rows = [
            (1, base),
            (2, base + " extra tail words here"),
            (3, base + " different ending entirely now"),
        ]
        est = {
            (r["src_id"], r["dst_id"]): r["c_est_micro"] / 1e6
            for r in containment_est_pairs(
                _docs(spark, rows), threshold=0.0, min_shingles=1,
            ).collect()
        }
        exact = {
            (r["src_id"], r["dst_id"]): r["containment"]
            for r in containment_pairs(
                _docs(spark, rows), threshold=0.0, min_shingles=1,
            ).collect()
        }
        assert est, "LSH failed to surface planted near-dups"
        for k, v in est.items():
            assert abs(v - exact[k]) <= 0.15, (k, v, exact[k])

    def test_min_shingles_floor(self, spark):
        t = " ".join(WORDS[:3])  # exactly one shingle
        out = containment_est_pairs(
            _docs(spark, [(1, t), (2, t)]), threshold=0.5, min_shingles=5,
        ).collect()
        assert out == []
