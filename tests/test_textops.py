"""Unit tests for T1/T2/T3 text operators (semantics of
tesseract_engine.py:24-88 and tesseract_claude_engine.py:15-57)."""

import pyarrow as pa

from norsk_historisk_avis_ocr_ray.functions.textops import (
    clean_batch,
    clean_divider_noise,
    readable_diff,
    reflow_text,
    whitespace_token_counts,
)


class TestCleanDividerNoise:
    def test_trailing_pipe_with_bleed(self):
        assert clean_divider_noise("hadde | k") == "hadde"
        assert clean_divider_noise("text|g") == "text"

    def test_leading_pipe_with_bleed(self):
        assert clean_divider_noise("-| text") == "text"
        assert clean_divider_noise('"|sjonene') == "sjonene"

    def test_standalone_pipes(self):
        assert clean_divider_noise("|midt|") == "midt"

    def test_short_garbage_lines_dropped(self):
        assert clean_divider_noise("en linje\na)\nneste linje") == "en linje\nneste linje"

    def test_short_lines_dropped_not_blanked(self):
        # dropping (not blanking) keeps hyphen-rejoin possible in reflow
        out = clean_divider_noise("vin-\nx\nteren")
        assert out == "vin-\nteren"
        assert reflow_text(out) == "vinteren"

    def test_blank_run_collapse(self):
        assert clean_divider_noise("a linje\n\n\n\nb linje") == "a linje\n\nb linje"

    def test_empty(self):
        assert clean_divider_noise("") == ""

    def test_three_char_line_kept(self):
        assert clean_divider_noise("abc") == "abc"


class TestReflow:
    def test_hyphen_rejoin(self):
        assert reflow_text("vin-\nteren kom") == "vinteren kom"

    def test_hyphen_rejoin_with_indent(self):
        assert reflow_text("vin-\n   teren") == "vinteren"

    def test_newlines_to_spaces(self):
        assert reflow_text("en\nto\n\ntre") == "en to tre"

    def test_multispace_collapse(self):
        assert reflow_text("en  to   tre") == "en to tre"

    def test_empty(self):
        assert reflow_text("   \n  ") == ""


class TestReadableDiff:
    def test_no_changes(self):
        assert readable_diff("a b c", "a b c") == "No changes detected."

    def test_replace(self):
        out = readable_diff("en fodt mann", "en født mann")
        assert "«fodt» → «født»" in out
        assert "1 edits" in out

    def test_insert_delete(self):
        assert "(deleted)" in readable_diff("a b c", "a c")
        assert "(inserted)" in readable_diff("a c", "a b c")


def test_clean_batch_arrow():
    tbl = pa.table({"text": ["hadde | k", None, "-| tekst her"]})
    out = clean_batch(tbl)
    assert out["text"].to_pylist() == ["hadde", None, "tekst her"]


def test_whitespace_token_counts():
    arr = pa.chunked_array([pa.array(["en to tre", "  ", "", "ett"])])
    assert list(whitespace_token_counts(arr)) == [3, 0, 0, 1]
