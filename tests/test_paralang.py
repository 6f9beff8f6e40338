"""Paragraph-level language segmentation — mixed pages, plurality
tie-break, micro fraction, blank/NULL handling."""


def paragraph_langs(*a, **kw):
    from doctor_spark.operators.paralang import paragraph_langs as f

    return f(*a, **kw)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


EN = "the cat and the dog are in the house with the mouse"
DE = "der hund und die katze sind in dem haus mit der maus"
RU = "привет мир это тест на русском языке сегодня"


class TestParaLang:
    def test_mixed_page_profile(self, spark):
        out = paragraph_langs(
            _docs(spark, [(1, EN + "\n" + DE + "\n" + EN)])
        ).collect()[0]
        assert out["n_paras"] == 3 and out["n_langs"] == 2
        assert out["major_lang"] == "en" and out["mixed"] is True
        assert out["major_frac_micro"] == 2 * 1_000_000 // 3

    def test_monolingual_page(self, spark):
        out = paragraph_langs(
            _docs(spark, [(1, DE + "\n\n" + DE)])
        ).collect()[0]
        assert out["n_paras"] == 2 and out["n_langs"] == 1
        assert out["major_lang"] == "de" and out["mixed"] is False
        assert out["major_frac_micro"] == 1_000_000

    def test_plurality_tie_breaks_lang_ascending(self, spark):
        # one EN paragraph, one DE paragraph: tie -> 'de' < 'en'
        out = paragraph_langs(
            _docs(spark, [(1, EN + "\n" + DE)])
        ).collect()[0]
        assert out["major_lang"] == "de"
        assert out["major_frac_micro"] == 500_000

    def test_script_routed_paragraph(self, spark):
        out = paragraph_langs(
            _docs(spark, [(1, RU + "\n" + EN)])
        ).collect()[0]
        assert out["n_langs"] == 2 and out["mixed"] is True

    def test_blank_paragraphs_not_counted(self, spark):
        out = paragraph_langs(
            _docs(spark, [(1, "\n\n  \n" + EN + "\n \n")])
        ).collect()[0]
        assert out["n_paras"] == 1 and out["major_lang"] == "en"

    def test_null_and_all_blank_docs_produce_no_row(self, spark):
        out = paragraph_langs(
            _docs(spark, [(1, None), (2, " \n \n "), (3, EN)])
        ).collect()
        assert [r["doc_id"] for r in out] == [3]
