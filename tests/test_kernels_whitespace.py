"""Goldens ported verbatim from reference doctor/tests.py:730-834
(TestWhiteSpaceRemoval, TestCleanupContent) — the byte-identical contract for
the whitespace algebra kernels."""

from unittest.mock import patch

from doctor_spark.kernels.whitespace import (
    adjust_caption_lines,
    cleanup_content,
    remove_excess_whitespace,
)


class TestWhiteSpaceRemoval:
    def test_left_shift(self):
        document = """
        foo
    bar
    foo
    bar"""
        expected = """    foo
bar
foo
bar"""
        assert remove_excess_whitespace(document) == expected

    def test_left_shift_when_artifact_exists(self):
        document = """
        foo
    bar
 |  foo
    bar"""
        expected = """       foo
   bar
|  foo
   bar"""
        assert remove_excess_whitespace(document) == expected


class TestCleanupContent:
    """Reference patches adjust_caption_lines / remove_excess_whitespace to
    identity for these cases (doctor/tests.py:760-773)."""

    def _cleanup(self, content, page_number):
        with (
            patch(
                "doctor_spark.kernels.whitespace.adjust_caption_lines",
                side_effect=lambda x: x,
            ),
            patch(
                "doctor_spark.kernels.whitespace.remove_excess_whitespace",
                side_effect=lambda x: x,
            ),
        ):
            return cleanup_content(content, page_number)

    def test_remove_floating_pipes(self):
        content = "This is a test line     | \nAnother line"
        assert self._cleanup(content, 2) == "This is a test line\nAnother line\n"

    def test_remove_floating_artifacts_right_side(self):
        content = "This is a test line          e \nAnother line"
        assert self._cleanup(content, 2) == "This is a test line\nAnother line\n"

    def test_remove_floating_pipes_and_artifacts(self):
        content = (
            "This is a test line     | and the content continues\n"
            "This is another test line              e \nFinal line"
        )
        expected = (
            "This is a test line     | and the content continues\n"
            "This is another test line\nFinal line\n"
        )
        assert self._cleanup(content, 2) == expected

    def test_no_floating_pipes_or_artifacts(self):
        content = "This is a test line                     JW-6\nAnother line\n"
        expected = "This is a test line                     JW-6\nAnother line\n\n"
        assert self._cleanup(content, 2) == expected

    def test_adjust_caption(self):
        content = """             10
                 LESLIE MASSEY,                    )  Case No.:  2:16-cv-05001 GJS
                                                       )
                                 oe                    )  PROPOSED} ORDER AWARDING
             12               Plaintiff,                    )   EQUAL ACCESS TO JUSTICE ACT
                                                )    ATTORNEY FEES AND EXPENSES
             13         VS.                              )  PURSUANT TO 28 U.S.C. § 2412(d)
                 NANCY A. BERRYHILL, Acting      )  AND COSTS PURSUANT TO 28
             14 || Commissioner of Social Security,       )  U.S.C. §  1920
             15               Defendant                 )
             16                                         ) """

        expected = """             10
                 LESLIE MASSEY,                             )  Case No.:  2:16-cv-05001 GJS
                                                            )
                                 oe                         )  PROPOSED} ORDER AWARDING
             12               Plaintiff,                    )   EQUAL ACCESS TO JUSTICE ACT
                                                            )    ATTORNEY FEES AND EXPENSES
             13         VS.                                 )  PURSUANT TO 28 U.S.C. § 2412(d)
                 NANCY A. BERRYHILL, Acting                 )  AND COSTS PURSUANT TO 28
             14 || Commissioner of Social Security,         )  U.S.C. §  1920
             15               Defendant                     )
             16                                             ) """
        assert adjust_caption_lines(content) == expected
