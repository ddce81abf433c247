"""Cleaning kernel tests, ported from the reference's
``tests/unit/test_text_cleaning.py`` (file:line cited per case)."""

from pdf_extraction_and_query_spark.core.textclean import (
    clean,
    normalize_whitespace,
    remove_page_markers,
    validate_cleaned_text,
)


class TestPageMarkerRemoval:
    def test_remove_single_page_marker(self):  # ref :12-20
        result = remove_page_markers("Some content.\n--- Page 1 ---\nMore content.")
        assert "--- Page 1 ---" not in result
        assert "Some content." in result
        assert "More content." in result

    def test_remove_multiple_markers_case_insensitive(self):  # ref :22-52
        text = (
            "--- Page 1 ---\nFirst page content\n"
            "--- Page 2 ---\nSecond page content\n"
            "--- PAGE 3 ---\nThird page content\n"
        )
        result = remove_page_markers(text)
        for marker in ("--- Page 1 ---", "--- Page 2 ---", "--- PAGE 3 ---"):
            assert marker not in result
        for content in ("First page content", "Second page content", "Third page content"):
            assert content in result

    def test_long_dash_runs(self):  # FIXTURES trait; pattern constants.py:21
        result = remove_page_markers("-------- Page 99 --------\ncontent\n")
        assert "Page 99" not in result
        assert "content" in result

    def test_preserves_prose_containing_page(self):  # ref :54-72
        text = (
            "The page layout is important.\n--- Page 5 ---\n"
            "This page number is 42.\n--- Page 6 ---\n"
        )
        result = remove_page_markers(text)
        assert "--- Page 5 ---" not in result
        assert "--- Page 6 ---" not in result
        assert "page layout" in result
        assert "page number" in result

    def test_marker_requires_trailing_newline(self):  # ref :308-316
        assert remove_page_markers("--- Page 1 ---") == "--- Page 1 ---"
        assert remove_page_markers("--- Page 1 ---\n") == ""


class TestWhitespaceNormalization:
    def test_collapse_multiple_spaces(self):  # ref :78-84
        assert (
            normalize_whitespace("word    word     another  word")
            == "word word another word"
        )

    def test_limit_consecutive_newlines(self):  # ref :86-95
        result = normalize_whitespace("Line 1\n\n\n\n\nLine 2")
        assert "\n\n\n" not in result
        assert "Line 1" in result and "Line 2" in result

    def test_strip_line_whitespace(self):  # ref :97-106
        result = normalize_whitespace("  leading\ntrailing   \n  both  ")
        for line in result.split("\n"):
            assert line == line.strip()

    def test_preserve_paragraph_breaks(self):  # ref :108-114
        assert "\n\n" in normalize_whitespace("Para one.\n\n\n\nPara two.")

    def test_tabs_survive_space_collapse_but_strip_at_ends(self):  # ref :116-130
        result = normalize_whitespace("a\tb    c\n\td\t")
        assert "a\tb c" in result
        assert "d" in result.split("\n")[1]
        assert not result.split("\n")[1].startswith("\t")


class TestValidation:
    def test_no_warning_without_loss(self):  # ref :222-232
        assert validate_cleaned_text("same text", "same text") == []

    def test_warning_on_content_loss(self):  # ref :234-245
        warnings = validate_cleaned_text("short", "x" * 1000)
        assert warnings and "content loss" in warnings[0].lower()

    def test_validation_ignores_whitespace(self):  # ref :259-272
        assert validate_cleaned_text("a b c\nd e", "a    b c\n\n\n\nd   e") == []

    def test_empty_original(self):  # ref :247-257
        assert validate_cleaned_text("", "") == []


class TestCleanComposition:
    def test_clean_full(self):  # ref :136-163
        text = "--- Page 1 ---\nFirst page content   with spaces.\n\n\n\nSecond page\n--- Page 2 ---\n"
        cleaned, warnings = clean(text)
        assert "--- Page 1 ---" not in cleaned
        assert "--- Page 2 ---" not in cleaned
        assert "    " not in cleaned
        assert "\n\n\n" not in cleaned
        assert "First page content with spaces." in cleaned
        assert "Second page" in cleaned
        assert isinstance(warnings, list)

    def test_clean_without_validation(self):  # ref :165-176
        cleaned, warnings = clean("--- Page 1 ---\ncontent\n", validate=False)
        assert "--- Page 1 ---" not in cleaned
        assert warnings == []

    def test_clean_empty_string(self):  # ref :291-297
        cleaned, warnings = clean("")
        assert cleaned == ""
        assert isinstance(warnings, list)

    def test_preserves_content_order(self):  # ref :200-216
        cleaned, _ = clean("alpha first\n--- Page 1 ---\nbeta second\ngamma third\n")
        assert (
            cleaned.find("alpha") < cleaned.find("beta") < cleaned.find("gamma")
        )

    def test_clean_only_page_markers(self):  # ref :308-316
        cleaned, _ = clean("--- Page 1 ---\n--- Page 2 ---\n")
        assert "--- Page" not in cleaned
