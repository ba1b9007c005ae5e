"""HTML main-content extraction: DOM-heuristic boilerplate strip.

Covers the three signal families separately (link density, semantic hints,
word-count floor), the exact-recovery contract over the synthetic corpus,
and boilerplate non-leakage (no nav/promo/comment token survives)."""

import pyarrow.parquet as pq
import pytest

from norsk_historisk_avis_ocr_ray.functions import htmlextract as hx


def test_link_dense_block_dropped():
    page = ("<body><div>"
            '<a href="/a">Home</a> <a href="/b">About</a> <a href="/c">More</a>'
            "</div><div>" + "plain words " * 10 + "</div></body>")
    blocks = hx.extract_main_blocks(page)
    assert len(blocks) == 1
    assert blocks[0].startswith("plain words")


def test_negative_hint_beats_length():
    long_text = "word " * 50
    page = f'<body><div class="sidebar"><p>{long_text}</p></div></body>'
    assert hx.extract_main_blocks(page) == []


def test_innermost_hint_wins():
    # A comment box nested inside an article is still boilerplate, and a
    # content div inside a hinted-negative wrapper is still content.
    page = ('<article><p>real content here with enough words to stand alone'
            '</p><div class="comment"><p>Nice post!</p></div></article>')
    blocks = hx.extract_main_blocks(page)
    assert blocks == ["real content here with enough words to stand alone"]
    page2 = ('<div class="ads"><div class="content"><p>kept short</p>'
             "</div></div>")
    assert hx.extract_main_blocks(page2) == ["kept short"]


def test_short_unhinted_block_dropped():
    page = "<body><p>Read more</p><p>" + "substantial " * 12 + "</p></body>"
    blocks = hx.extract_main_blocks(page)
    assert len(blocks) == 1 and blocks[0].startswith("substantial")


def test_script_style_payload_invisible():
    page = ("<body><script>var x = '<p>fake</p>';</script>"
            "<style>p{color:red}</style>"
            "<p>" + "visible " * 10 + "</p></body>")
    blocks = hx.extract_main_blocks(page)
    assert len(blocks) == 1 and "fake" not in blocks[0]
    assert "color" not in blocks[0]


def test_inline_markup_and_entities_flattened():
    page = ("<article><p>an <em>emphasised</em> word &amp; an entity"
            " plus some more words here</p></article>")
    assert hx.extract_main_blocks(page) == [
        "an emphasised word & an entity plus some more words here"]


def test_render_page_is_deterministic():
    a = hx.render_page(7, "some words here " * 6, "en", "src1")
    b = hx.render_page(7, "some words here " * 6, "en", "src1")
    assert a == b
    c = hx.render_page(8, "some words here " * 6, "en", "src1")
    assert a != c


def test_exact_recovery_and_no_leak_corpus():
    df = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    leak_markers = ("Subscribe", "Trending", "Nice article", "rights reserved",
                    "Comments", "Politics", "Privacy")
    for _, r in df.head(100).iterrows():
        page = hx.render_page(r.doc_id, r.text, r.lang, r.source)
        got = hx.extract_main_text(page)
        assert got == r.text
        for m in leak_markers:
            assert m not in got


def test_ray_query_matches_documents(ray_session):
    out = hx.html_main_content("/root/testdata/sf0.001")
    docs = (pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["doc_id", "text"]).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == list(docs["doc_id"])
    assert list(out["main_text"]) == list(docs["text"])
