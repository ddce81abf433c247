"""Merge-predicate matrix + header re-eval scoring, ported verbatim from the
reference's ``tests/unit/test_line_wrapping.py:12-259`` — the conformance
suite for the fold operators."""

from pdf_extraction_and_query_spark.core.lines import (
    page_font_mode,
    reconstruct_wrapped_lines,
    reevaluate_header_status,
    should_merge_lines,
)


def _line(text, page=1, font_size=12.0, is_bold=False, **kw):
    d = {"text": text, "page": page, "font_size": font_size, "is_bold": is_bold}
    d.update(kw)
    return d


class TestMergePredicate:
    def test_should_merge_same_formatting(self):  # ref :12-32
        assert should_merge_lines(
            _line("This is a long sentence that was broken across"),
            _line("multiple lines in the PDF document"),
        )

    def test_no_merge_across_pages(self):  # ref :34-53
        assert not should_merge_lines(
            _line("Text at end of page one that continues", page=1),
            _line("onto page two", page=2),
        )

    def test_no_merge_different_bold(self):  # ref :55-74
        assert not should_merge_lines(
            _line("This is normal text that ends without", is_bold=False),
            _line("BOLD HEADER TEXT", is_bold=True),
        )

    def test_no_merge_different_font_sizes(self):  # ref :76-95
        assert not should_merge_lines(
            _line("This is body text in normal size", font_size=12.0),
            _line("Large header text", font_size=16.0),
        )

    def test_font_size_tolerance_inclusive(self):  # constants.py:39 boundary
        assert should_merge_lines(
            _line("This is body text in normal size", font_size=12.0),
            _line("continues with slightly different size", font_size=13.0),
        )

    def test_no_merge_after_sentence_terminator(self):  # ref :97-116
        assert not should_merge_lines(
            _line("This is a complete sentence."),
            _line("This is the next sentence"),
        )

    def test_all_terminators_block_merge(self):  # constants.py:49
        for term in ".:!?;":
            assert not should_merge_lines(
                _line(f"Some reasonably long line{term}"),
                _line("continuation text here"),
            ), term

    def test_no_merge_short_headers(self):  # ref :118-137
        assert not should_merge_lines(
            _line("Introduction", font_size=14.0, is_bold=True),
            _line("The following section describes the process", font_size=12.0),
        )

    def test_merge_with_lowercase_continuation(self):  # ref :139-158
        assert should_merge_lines(
            _line("The employee shall maintain all confidential information and"),
            _line("shall not disclose such information to third parties"),
        )

    def test_merge_with_conjunction_continuations(self):  # ref :160-188
        prev = _line("This agreement shall be binding upon the parties")
        for cont in (
            "and further requirements",
            "or alternatively",
            "with additional provisions",
            "for the purpose of",
            "of the agreement",
        ):
            assert should_merge_lines(prev, _line(cont)), cont

    def test_no_merge_uppercase_noncontinuation(self):
        assert not should_merge_lines(
            _line("This agreement shall be binding upon the parties"),
            _line("Secondly there are other terms"),
        )


class TestHeaderReeval:
    def test_requires_bold_or_caps(self):  # ref :194-209
        block = _line(
            "This is just normal text", is_all_caps=False, is_larger=False
        )
        assert reevaluate_header_status(block)["is_likely_header"] is False

    def test_bold_with_multiple_signals(self):  # ref :211-226
        block = _line(
            "Introduction:", font_size=14.0, is_bold=True,
            is_all_caps=False, is_larger=True,
        )
        assert reevaluate_header_status(block)["is_likely_header"] is True

    def test_rejects_list_items(self):  # ref :228-243
        block = _line(
            "John Smith, Jane Doe, Bob Johnson", is_bold=True,
            is_all_caps=False, is_larger=False,
        )
        assert reevaluate_header_status(block)["is_likely_header"] is False

    def test_accepts_short_bold_phrase(self):  # ref :245-259
        block = _line(
            "Benefits and Compensation", font_size=13.0, is_bold=True,
            is_all_caps=False, is_larger=True,
        )
        assert reevaluate_header_status(block)["is_likely_header"] is True

    def test_list_item_signal_is_decisive(self):  # constants.py:24-26
        # With only the length signal otherwise, the list-item patterns
        # (bullet / numbered / Name Surname,) decide header vs not.
        bullet = _line(
            "- a bullet item with a rather long tail, over forty characters",
            is_bold=True, is_all_caps=False, is_larger=False,
        )
        assert reevaluate_header_status(bullet)["is_likely_header"] is False
        plain = _line(
            "A phrase with no commas padded to be over forty characters long",
            is_bold=True, is_all_caps=False, is_larger=False,
        )
        assert reevaluate_header_status(plain)["is_likely_header"] is True

    def test_short_bold_bullet_still_scores_two(self):
        # Reference semantics: a short comma-free bullet earns the length and
        # short-phrase signals, so it IS flagged a header (score 2).
        block = _line("- bullet item here", is_bold=True,
                      is_all_caps=False, is_larger=False)
        assert reevaluate_header_status(block)["is_likely_header"] is True


class TestReconstructionFold:
    def test_buffer_grows_and_uses_grown_text(self):
        # After one merge the buffer exceeds the 15-char minimum and ends
        # without a terminator -> next lowercase line merges too.
        blocks = [
            _line("The parties agree that all notices shall"),
            _line("be delivered in writing and"),
            _line("acknowledged by the receiving party"),
        ]
        out = reconstruct_wrapped_lines(blocks)
        assert len(out) == 1
        assert out[0]["text"] == (
            "The parties agree that all notices shall be delivered in "
            "writing and acknowledged by the receiving party"
        )

    def test_terminator_on_grown_buffer_blocks_merge(self):
        blocks = [
            _line("This wrapped sentence continues here and"),
            _line("now it ends with a period."),
            _line("so this lowercase line must NOT merge"),
        ]
        out = reconstruct_wrapped_lines(blocks)
        assert len(out) == 2

    def test_segment_boundary_blocks_merge(self):  # interleave contract
        blocks = [
            _line("Text before the figure continues and", seg=0),
            _line("would merge if not for the media boundary", seg=1),
        ]
        out = reconstruct_wrapped_lines(blocks)
        assert len(out) == 2

    def test_empty_input(self):
        assert reconstruct_wrapped_lines([]) == []

    def test_headers_reevaluated_on_emission(self):
        blocks = [
            _line("INTRODUCTION AND SCOPE", is_bold=True, is_all_caps=True,
                  is_larger=True),
            _line("Body text follows here with more words."),
        ]
        out = reconstruct_wrapped_lines(blocks)
        assert out[0]["is_likely_header"] is True
        assert out[1]["is_likely_header"] is False


class TestPageFontMode:
    def test_most_common_wins(self):
        assert page_font_mode([12.0, 12.0, 14.0]) == 12.0

    def test_tie_breaks_to_smallest(self):  # documented divergence
        assert page_font_mode([14.0, 12.0, 14.0, 12.0]) == 12.0

    def test_default_when_empty(self):
        assert page_font_mode([]) == 11.0
