"""Broder containment pairs — directionality, inclusion vs resemblance,
the min-shingle floor, and the DF cap."""


def containment_pairs(*a, **kw):
    from doctor_spark.operators.dedup import containment_pairs as f

    return f(*a, **kw)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


class TestContainment:
    def test_inclusion_is_directional(self, spark):
        # doc 2 = doc 1's text embedded in a much longer page: c(1->2)=1,
        # c(2->1) well below 1, and Jaccard would be low both ways
        small = " ".join(WORDS[:8])
        big = small + " " + " ".join(w + "x" for w in WORDS)
        out = {
            (r["src_id"], r["dst_id"]): r["containment"]
            for r in containment_pairs(
                _docs(spark, [(1, small), (2, big)]), threshold=0.0,
                min_shingles=1,
            ).collect()
        }
        assert out[(1, 2)] == 1.0
        assert out[(2, 1)] < 0.5

    def test_threshold_gates_direction_independently(self, spark):
        small = " ".join(WORDS[:8])
        big = small + " " + " ".join(w + "x" for w in WORDS)
        out = containment_pairs(
            _docs(spark, [(1, small), (2, big)]), threshold=0.9,
            min_shingles=1,
        ).collect()
        assert [(r["src_id"], r["dst_id"]) for r in out] == [(1, 2)]

    def test_min_shingles_floor_drops_stub_sources(self, spark):
        # a 3-token doc has exactly ONE 3-shingle: fully contained in
        # anything sharing it, which the floor must suppress
        stub = " ".join(WORDS[:3])
        big = " ".join(WORDS[:10])
        out = containment_pairs(
            _docs(spark, [(1, stub), (2, big)]), threshold=0.5,
            min_shingles=5,
        ).collect()
        assert [(r["src_id"], r["dst_id"]) for r in out] == []
        # with the floor relaxed the stub direction appears
        out2 = containment_pairs(
            _docs(spark, [(1, stub), (2, big)]), threshold=0.5,
            min_shingles=1,
        ).collect()
        assert (1, 2) in {(r["src_id"], r["dst_id"]) for r in out2}

    def test_identical_docs_contain_both_ways(self, spark):
        t = " ".join(WORDS)
        out = {
            (r["src_id"], r["dst_id"]): r["containment"]
            for r in containment_pairs(
                _docs(spark, [(1, t), (2, t)]), threshold=0.99,
            ).collect()
        }
        assert out == {(1, 2): 1.0, (2, 1): 1.0}

    def test_df_cap_drops_boilerplate_shingles(self, spark):
        # one shingle shared by every doc; cap=1 removes it, so no pair
        # reaches the threshold through boilerplate alone
        rows = [
            (i, " ".join(WORDS[:3]) + f" unique{i} only{i} tok{i}")
            for i in range(1, 5)
        ]
        capped = containment_pairs(
            _docs(spark, rows), threshold=0.2, min_shingles=1,
            max_shingle_df=1,
        ).collect()
        assert capped == []
        uncapped = containment_pairs(
            _docs(spark, rows), threshold=0.2, min_shingles=1,
        ).collect()
        assert len(uncapped) > 0

    def test_disjoint_docs_emit_nothing(self, spark):
        out = containment_pairs(
            _docs(
                spark,
                [(1, " ".join(WORDS[:7])), (2, " ".join(WORDS[7:]))],
            ),
            threshold=0.0, min_shingles=1,
        ).collect()
        assert out == []
