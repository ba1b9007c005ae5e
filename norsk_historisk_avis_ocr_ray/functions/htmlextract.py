"""HTML main-content extraction: boilerplate strip via DOM heuristics.

The web-document flavour of the engine's extraction contract (the scanned
newspaper path lives in ``stages/``): given a raw HTML page, segment the DOM
into text blocks and keep only the main content, dropping navigation,
sidebars, comments, footers, ads and script/style payloads. The block
classifier combines the two standard published signal families:

* **link density** (Boilerpipe-style): fraction of a block's characters that
  sit inside ``<a>`` — menus and "related" lists are nearly all link text;
* **semantic hints** (Readability-style): HTML5 sectioning tags and
  class/id tokens, ``article``/``content``/``main`` positive,
  ``nav``/``sidebar``/``comment``/``promo``… negative, with the *innermost*
  hinted ancestor winning so a comment box inside an article is still
  dropped;
* a **word-count floor** for unhinted blocks, so captions and button labels
  don't survive on density alone.

Parsing is stdlib ``html.parser`` (no external deps) and is inherently
per-document Python — like OCR, this is the compute-bound payload stage, run
as a task-pool ``map_batches`` over Arrow batches with all regexes/sets
compiled at module import.

The oracled query renders a deterministic boilerplate-laden page around each
``documents.text`` (nav, sidebar, comments, footer, inline ``<em>`` markup,
entity escaping) and must recover the original text exactly — so the DuckDB
oracle is simply ``SELECT doc_id, text AS main_text FROM documents`` and the
extractor is graded by the driver's exact value-hash gate end-to-end.

No reference counterpart file: the reference repo extracts from page images
only; this module covers the HTML half of the north-star main-content
contract.
"""

from __future__ import annotations

import html
import random
import re
from html.parser import HTMLParser

import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

# --- DOM vocabulary -----------------------------------------------------------

BLOCK_TAGS = frozenset(
    "p div section article li ul ol h1 h2 h3 h4 h5 h6 td th tr table "
    "blockquote pre header footer nav aside main body figure figcaption "
    "dd dt dl".split()
)
SKIP_TAGS = frozenset("script style noscript template svg iframe head title".split())
VOID_TAGS = frozenset("br hr img input meta link area base col embed source wbr".split())

NEG_TAG = frozenset("nav aside footer form button".split())
POS_TAG = frozenset("article main".split())
NEG_TOKENS = frozenset(
    "nav navbar menu sidebar footer header comment comments promo ad ads "
    "advert advertisement social share subscribe related breadcrumb banner "
    "widget byline meta pagination".split()
)
POS_TOKENS = frozenset("article content main post entry story text body-copy".split())

_TOKEN_SPLIT = re.compile(r"[\s_-]+")

MAX_LINK_DENSITY = 0.4
MIN_UNHINTED_WORDS = 8


class _BlockCollector(HTMLParser):
    """Single streaming pass: emits (text, link_chars, total_chars, hint)
    per DOM text block. ``hint`` is the innermost non-neutral ancestor's
    sign (+1 content, -1 boilerplate, 0 unhinted)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[tuple[str, int]] = []
        self.skip_depth = 0
        self.link_depth = 0
        self._text: list[str] = []
        self._link_chars = 0
        self.blocks: list[tuple[str, int, int, int]] = []

    @staticmethod
    def _hint(tag: str, attrs) -> int:
        tokens: set[str] = set()
        for k, v in attrs:
            if k in ("class", "id") and v:
                tokens.update(_TOKEN_SPLIT.split(v.lower()))
        if tag in NEG_TAG or tokens & NEG_TOKENS:
            return -1
        if tag in POS_TAG or tokens & POS_TOKENS:
            return 1
        return 0

    def _ctx_hint(self) -> int:
        for _tag, h in reversed(self.stack):
            if h:
                return h
        return 0

    def _flush(self) -> None:
        raw = "".join(self._text)
        text = " ".join(raw.split())
        if text:
            self.blocks.append((text, self._link_chars, len(raw), self._ctx_hint()))
        self._text = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return
        if tag == "a":
            self.link_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()
            self.stack.append((tag, self._hint(tag, attrs)))

    def handle_startendtag(self, tag, attrs):
        if tag in SKIP_TAGS or self.skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return
        if tag == "a":
            self.link_depth = max(0, self.link_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()
            for i in range(len(self.stack) - 1, -1, -1):
                if self.stack[i][0] == tag:
                    del self.stack[i:]
                    break

    def handle_data(self, data):
        if self.skip_depth:
            return
        self._text.append(data)
        if self.link_depth:
            self._link_chars += len(data)


def _keep(text: str, link_chars: int, total_chars: int, hint: int) -> bool:
    if hint < 0:
        return False
    density = link_chars / max(total_chars, 1)
    if density > MAX_LINK_DENSITY:
        return False
    if hint > 0:
        return True
    return density <= 0.2 and len(text.split()) >= MIN_UNHINTED_WORDS


def extract_main_blocks(page_html: str) -> list[str]:
    """Main-content text blocks of an HTML page, in document order."""
    p = _BlockCollector()
    p.feed(page_html)
    p.close()
    p._flush()
    return [t for t, lc, tc, h in p.blocks if _keep(t, lc, tc, h)]


def extract_main_text(page_html: str) -> str:
    """Space-joined main content (block order preserved)."""
    return " ".join(extract_main_blocks(page_html))


# --- deterministic synthetic page renderer ------------------------------------

_NAV_WORDS = ["Politics", "Economy", "Culture", "Sports", "Science", "Travel",
              "Opinion", "Weather"]
_PROMOS = ["Subscribe to our newsletter", "Trending this week",
           "Download the app", "Follow us everywhere",
           "Exclusive member offers"]
_COMMENTS = ["Nice article!", "Totally disagree with this take",
             "Thanks for sharing", "First!", "Interesting perspective"]


def render_page(doc_id: int, text: str, lang: str, source: str) -> str:
    """Deterministic boilerplate-laden page whose main content is exactly
    ``text`` (escaped, chunked into paragraphs, with seeded inline markup)."""
    rng = random.Random((int(doc_id) * 2654435761) & 0xFFFFFFFF)
    words = text.split()
    paras: list[str] = []
    i = 0
    while i < len(words):
        n = rng.randint(12, 30)
        chunk = [html.escape(w) for w in words[i:i + n]]
        if len(chunk) > 2 and rng.random() < 0.5:
            j = rng.randrange(len(chunk))
            chunk[j] = f"<em>{chunk[j]}</em>"
        paras.append(f"<p>{' '.join(chunk)}</p>")
        i += n
    nav = "".join(
        f'<li><a href="/{source}/{w.lower()}">{w}</a></li>'
        for w in rng.sample(_NAV_WORDS, rng.randint(4, 7)))
    promos = "".join(
        f'<div class="promo"><a href="#">{p}</a></div>'
        for p in rng.sample(_PROMOS, rng.randint(2, 4)))
    comments = "".join(
        f'<div class="comment"><span class="byline"><a href="/u{k}">user{k}</a>'
        f"</span><p>{rng.choice(_COMMENTS)}</p></div>"
        for k in range(rng.randint(2, 4)))
    return (
        "<!doctype html><html><head>"
        f"<title>{source} · doc {doc_id}</title>"
        "<style>body{margin:0}</style>"
        f"<script>var docId={doc_id};</script></head><body>"
        f'<header class="site-header"><h1>{source.upper()} News ({lang})</h1>'
        f"<nav><ul>{nav}</ul></nav></header>"
        f'<div class="layout"><aside class="sidebar">{promos}</aside>'
        f'<article class="article-body">{"".join(paras)}</article></div>'
        f'<section class="comments"><h3>Comments</h3>{comments}</section>'
        f'<footer><p>&copy; 2026 {source} &mdash; All rights reserved. '
        f'<a href="/terms">Terms</a> <a href="/privacy">Privacy</a></p>'
        "</footer></body></html>"
    )


# --- Ray pipeline -------------------------------------------------------------

def _docs(sf_dir: str) -> Dataset:
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"])
    # Parsing is per-document Python (~1 ms/doc), so parallelism = block
    # count. A single-file test input yields one block → one task; split it.
    # At real scale the table arrives as many files/row-groups and this is a
    # cheap no-op-ish rebalance of small text rows, never the media bytes.
    if len(ds.input_files()) < 32:
        ds = ds.repartition(32)
    return ds


def _render_batch(t: pa.Table) -> pa.Table:
    ids = t["doc_id"].to_pylist()
    pages = [render_page(i, x, l, s) for i, x, l, s in zip(
        ids, t["text"].to_pylist(), t["lang"].to_pylist(),
        t["source"].to_pylist())]
    return pa.table({"doc_id": t["doc_id"].combine_chunks(),
                     "page_html": pa.array(pages, pa.string())})


def _extract_batch(t: pa.Table) -> pa.Table:
    texts = [extract_main_text(h) for h in t["page_html"].to_pylist()]
    return pa.table({"doc_id": t["doc_id"].combine_chunks(),
                     "main_text": pa.array(texts, pa.string())})


def html_main_content(sf_dir: str):
    """Render each document as a boilerplate-laden HTML page, then strip the
    boilerplate back off with the DOM-heuristic extractor. Exact oracle:
    the recovered ``main_text`` must equal ``documents.text`` per row."""
    df = (_docs(sf_dir)
          .map_batches(_render_batch, batch_format="pyarrow", batch_size=256)
          .map_batches(_extract_batch, batch_format="pyarrow", batch_size=256)
          .to_pandas())
    if df.empty:  # schema-stable empty output
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "main_text": pd.Series([], dtype="object")})
    return df.sort_values("doc_id").reset_index(drop=True)
