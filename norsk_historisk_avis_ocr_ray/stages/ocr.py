"""OCR engines and the fused layout+OCR actor stage.

Engine plugin surface (the analogue of the reference's engine registry,
``engines/__init__.py:4-16`` + the ``process_file`` protocol, ``CLAUDE.md``):
an ``OcrEngine`` has ``load()`` (called once per actor — model/language data
is per-worker state, reference M1/M2) and ``ocr_region(img) -> str``.

``LayoutOcrStage`` is the hot stateful stage: a callable class passed to
``map_batches(..., concurrency=N)`` so Ray runs it as an actor pool. Per
batch it resolves media payloads, runs layout analysis (``stages.layout``),
crops regions and OCRs each — emitting *text-only* region rows so no image
bytes ever enter the downstream stream or the ``groupby(doc_id)`` shuffle
(the reference's per-file sequential loop is ``tesseract_engine.py:152-178``).

Error policy (fixes reference behavior where one API error aborts the whole
file, ``claude_vision_engine.py:320-321``): any per-row failure emits a row
with an ``error`` message and empty text — the job never aborts, and lineage
counts errors per partition.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa

from ..sources.codec import decode_image, decode_with_band_profiles
from ..synth import barcode
from .layout import DARK_THRESHOLD, OVERLAP_PX, split_columns


class MockBarcodeOcr:
    """Deterministic OCR: reads the pixel barcode of synthetic pages."""

    name = "mock-barcode"

    def load(self) -> None:  # nothing to load; real engines load models here
        pass

    def ocr_region(self, img: np.ndarray, **_) -> str:
        return barcode.read_barcode(img)


class TesseractOcr:
    """Adapter for a real tesseract engine (reference M1).

    Not usable in this container (no tesseract binary / pytesseract); the
    adapter exists so the actor-pool plumbing is identical for a real engine:
    ``load`` resolves the binary + language data once per actor
    (reference ``tesseract_engine.py:119-123``), ``ocr_region`` runs one region.
    """

    name = "tesseract"

    def __init__(self, lang: str = "nor"):
        self.lang = lang
        self._pytesseract = None

    @staticmethod
    def check_dependencies() -> list[str]:
        """Missing-dependency list, empty when runnable — the behavioral
        mirror of reference ``tesseract_engine.py:100-112``
        (check_dependencies): the binary is resolved with ``shutil.which``,
        the Python binding by import probe. Called by ``load()`` so a pool
        actor fails fast with the full shopping list instead of a bare
        ImportError mid-batch."""
        import shutil

        missing = []
        if not shutil.which("tesseract"):
            missing.append("tesseract binary (apt install tesseract-ocr + "
                           "the language pack, e.g. tesseract-ocr-nor)")
        try:
            import pytesseract  # type: ignore # noqa: F401
        except ImportError:
            missing.append("pytesseract (pip install pytesseract)")
        return missing

    def load(self) -> None:
        missing = self.check_dependencies()
        if missing:  # pragma: no cover - environment-dependent
            raise NotImplementedError(
                "TesseractOcr is missing dependencies: " + "; ".join(missing)
                + ". Use MockBarcodeOcr for deterministic runs, or see "
                "docs/TESSERACT.md for setup.")
        import pytesseract  # type: ignore

        self._pytesseract = pytesseract

    def ocr_region(self, img: np.ndarray, **_) -> str:  # pragma: no cover
        return self._pytesseract.image_to_string(img, lang=self.lang)


# Engine registry — the analogue of the reference's lazy engine registry
# (``engines/__init__.py:4-16``): name → factory, injected into the OCR
# stages via ``engine_factory``.
ENGINES: dict[str, Callable[[], Any]] = {}


def register_engine(name: str, factory: Callable[[], Any]) -> None:
    ENGINES[name] = factory


def get_engine(name: str) -> Callable[[], Any]:
    try:
        return ENGINES[name]
    except KeyError:
        raise KeyError(f"unknown OCR engine {name!r}; known: {sorted(ENGINES)}")


OUT_FIELDS = [
    ("doc_id", pa.string()),
    ("in_offset", pa.int32()),
    ("region_idx", pa.int32()),
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("error", pa.string()),
    ("n_cols", pa.int32()),
]
OUT_SCHEMA = pa.schema(OUT_FIELDS)


class LayoutOcrStage:
    """Actor-pool stage: exploded span rows → OCR'd region rows.

    Parameters
    ----------
    engine_factory : callable returning an OcrEngine (constructed + loaded
        once per actor).
    pages_ref : ``ray.ObjectRef`` of a dict ``media_ref -> (bytes, w, h, codec)``
        (broadcast media resolution: ``ray.put`` once on the driver, fetched
        zero-copy from the local object store per actor), or None when the
        batch already carries ``image/width/height/codec`` columns (join-based
        resolution for page tables too big to broadcast).
    """

    def __init__(
        self,
        engine_factory: Callable[[], Any] = MockBarcodeOcr,
        pages_ref: Any = None,
        page_index_ref: Any = None,
        overlap_px: int = OVERLAP_PX,
    ):
        self.engine = engine_factory()
        self.engine.load()
        self.overlap_px = overlap_px
        self.pages: dict[str, tuple[bytes, int, int, str]] | None = None
        self.store = None
        if pages_ref is not None:
            import ray

            self.pages = ray.get(pages_ref)
        elif page_index_ref is not None:
            import ray

            from ..sources.pagestore import PageStore

            self.store = PageStore(ray.get(page_index_ref))

    # -- helpers -------------------------------------------------------------

    def _payload(self, row: dict) -> tuple[bytes, int, int, str]:
        ref = row["media_ref"]
        if self.pages is not None:
            if ref not in self.pages:
                raise KeyError(f"media_ref not found: {ref!r}")
            return self.pages[ref]
        if self.store is not None:
            return self.store.get(ref)
        if row.get("image") is None:
            raise KeyError(f"media_ref unresolved (no image payload): {ref!r}")
        return row["image"], row["width"], row["height"], row.get("codec") or "raw-zlib"

    def _process_media(self, row: dict, out: "_RowSink") -> None:
        buf, width, height, codec = self._payload(row)
        img, profiles = decode_with_band_profiles(
            buf, width, height, codec, threshold=DARK_THRESHOLD)
        layout = split_columns(img, overlap_px=self.overlap_px,
                               band_profiles=profiles)
        for region_idx, (kind, (x0, y0, x1, y1)) in enumerate(layout.regions):
            text = self.engine.ocr_region(img[y0:y1, x0:x1],
                                          region_kind=kind,
                                          n_cols=layout.n_cols)
            out.add(row["doc_id"], row["in_offset"], region_idx, "text", text,
                    row["media_ref"], None, layout.n_cols)

    # -- batch entry ----------------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = _RowSink()
        cols = {name: batch[name].to_pylist() for name in batch.column_names}
        n = batch.num_rows
        for i in range(n):
            row = {name: cols[name][i] for name in cols}
            kind = row["kind"]
            if kind == "media":
                try:
                    self._process_media(row, out)
                except Exception as e:  # per-row error column, never job abort
                    out.add(row["doc_id"], row["in_offset"], 0, "text", "",
                            row["media_ref"], f"{type(e).__name__}: {e}", 0)
            elif kind == "empty":
                out.add(row["doc_id"], row["in_offset"], 0, "empty", "", "", None, 0)
            else:  # passthrough text span
                out.add(row["doc_id"], row["in_offset"], 0, "text",
                        row["text"] or "", "", None, 0)
        return out.table()


PAGE_OUT_FIELDS = [
    ("media_ref", pa.string()),
    ("region_idx", pa.int32()),
    ("kind", pa.string()),
    ("text", pa.string()),
    ("error", pa.string()),
    ("n_cols", pa.int32()),
]
PAGE_OUT_SCHEMA = pa.schema(PAGE_OUT_FIELDS)


class PageOcrStage:
    """Actor-pool stage over the *pages* dataset itself (the dataflow media
    mode): each batch row carries its own image bytes (zero-copy from the
    object store), so no broadcast table and no keyed lookups — the scalable
    default. Emits text-only region rows keyed by ``media_ref``; the pipeline
    joins them back to the documents' media spans (a text-only hash join).
    """

    def __init__(self, engine_factory: Callable[[], Any] = MockBarcodeOcr,
                 overlap_px: int = OVERLAP_PX):
        self.engine = engine_factory()
        self.engine.load()
        self.overlap_px = overlap_px

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        imgs = batch["image"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        codecs = batch["codec"].to_pylist()
        cols: list[list] = [[] for _ in PAGE_OUT_FIELDS]

        def add(*values):
            for c, v in zip(cols, values):
                c.append(v)

        for ref, buf, w, h, codec in zip(refs, imgs, widths, heights, codecs):
            try:
                img, profiles = decode_with_band_profiles(
                    buf, w, h, codec or "raw-zlib", threshold=DARK_THRESHOLD)
                layout = split_columns(img, overlap_px=self.overlap_px,
                                       band_profiles=profiles)
                for region_idx, (kind, (x0, y0, x1, y1)) in enumerate(layout.regions):
                    text = self.engine.ocr_region(img[y0:y1, x0:x1],
                                                  region_kind=kind,
                                                  n_cols=layout.n_cols)
                    add(ref, region_idx, "text", text, None, layout.n_cols)
            except Exception as e:  # per-row error, never job abort
                add(ref, 0, "text", "", f"{type(e).__name__}: {e}", 0)
        arrays = [pa.array(c, type=f[1]) for c, f in zip(cols, PAGE_OUT_FIELDS)]
        return pa.Table.from_arrays(arrays, schema=PAGE_OUT_SCHEMA)


_PROCESS_PAGE_STAGE: dict[tuple, PageOcrStage] = {}


def page_ocr_batch(batch: pa.Table,
                   engine_factory: Callable[[], Any] = MockBarcodeOcr,
                   overlap_px: int = OVERLAP_PX) -> pa.Table:
    """Task-form PageOcrStage: per-worker-process cached engine.

    Same semantics as the actor-pool form, but scheduled as elastic Ray
    tasks — OCR work shares the session's CPUs with the dataflow operators
    (read / join / groupby aggregators) instead of carving out a static
    actor pool, so no pool-size tuning and no starvation clamp. The engine
    loads once per worker *process* (cache keyed by factory class), exactly
    the `correct_batch` pattern in stages/correct.py.

    Engine factories that are not plain classes (closures, partials) don't
    key a stable per-process cache across task deserializations — use the
    actor-pool form for those, or for engines whose setup is too heavy to
    pay once per worker process.
    """
    key = (engine_factory if isinstance(engine_factory, type) else None,
           overlap_px)
    stage = _PROCESS_PAGE_STAGE.get(key) if key[0] is not None else None
    if stage is None:
        stage = PageOcrStage(engine_factory, overlap_px)
        if key[0] is not None:
            _PROCESS_PAGE_STAGE[key] = stage
    return stage(batch)


class _RowSink:
    def __init__(self):
        self.cols: list[list] = [[] for _ in OUT_FIELDS]

    def add(self, *values) -> None:
        for c, v in zip(self.cols, values):
            c.append(v)

    def table(self) -> pa.Table:
        arrays = [pa.array(c, type=f[1]) for c, f in zip(self.cols, OUT_FIELDS)]
        return pa.Table.from_arrays(arrays, schema=OUT_SCHEMA)


register_engine(MockBarcodeOcr.name, MockBarcodeOcr)
register_engine(TesseractOcr.name, TesseractOcr)


def _register_llm_engine() -> None:
    # optional-import registration: the vision engine needs no SDK to be
    # constructed/tested (client injected), but keep import failures soft
    try:
        from .llm_ocr import AnthropicVisionOcr
    except Exception:  # pragma: no cover
        return
    register_engine(AnthropicVisionOcr.name, AnthropicVisionOcr)


_register_llm_engine()
