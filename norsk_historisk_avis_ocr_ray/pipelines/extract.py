"""The flagship extraction pipeline, Ray-Data-native.

Dataset-level composition (SURVEY.md §3.4):

    documents (doc_id, spans)
      └─ map_batches(explode_spans)                    stateless, Arrow kernels
      └─ map_batches(LayoutOcrStage, concurrency=N)    actor pool: media resolve
           │                                           + layout + OCR fused, so
           │                                           image bytes never enter
           │                                           the downstream stream
      └─ map_batches(clean_batch)                      stateless T1 cleanup
      └─ groupby(doc_id).map_groups(repack_group)      THE one shuffle (text-only)
      └─ map_batches(CorrectorStage, concurrency=M)    actor pool: normalizer

Media resolution strategies:
- ``broadcast`` (default): the pages table is ``ray.put`` once on the driver;
  each OCR actor fetches it zero-copy from the local object store in
  ``__init__``. Right when the media side fits in the object store (tests,
  or per-shard page groups at scale).
- ``join``: ``Dataset.join`` of media-span rows with the pages table on
  ``media_ref`` (hash-partitioned), for page tables too big to broadcast.
  Text/empty rows bypass the join and are unioned back.
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa

import ray
from ray.data import Dataset

from ..functions.textops import clean_batch
from ..stages.correct import CorrectorStage
from ..stages.explode import explode_spans
from ..stages.ocr import LayoutOcrStage, MockBarcodeOcr
from ..stages.repack import repack_group


def pages_to_dict(pages: "pa.Table | Dataset | None") -> dict[str, tuple[bytes, int, int, str]]:
    """Materialize a pages table into the broadcast lookup dict."""
    if pages is None:
        return {}
    if isinstance(pages, Dataset):
        batches = pages.select_columns(
            ["media_ref", "image", "width", "height", "codec"]
        ).iter_batches(batch_format="pyarrow", batch_size=256)
    else:
        batches = [pages]
    out: dict[str, tuple[bytes, int, int, str]] = {}
    for b in batches:
        for ref, img, w, h, codec in zip(
            b["media_ref"].to_pylist(), b["image"].to_pylist(),
            b["width"].to_pylist(), b["height"].to_pylist(),
            b["codec"].to_pylist(),
        ):
            out[ref] = (img, w, h, codec)
    return out


def extract(
    docs: Dataset,
    pages: "pa.Table | Dataset | None" = None,
    *,
    engine_factory: Callable[[], Any] = MockBarcodeOcr,
    ocr_concurrency: int | tuple[int, int] = 4,
    ocr_batch_size: int = 32,
    corrector_concurrency: int | tuple[int, int] = 2,
    correction: bool = True,
    emit_diff: bool = True,
    media_resolution: str = "broadcast",
) -> Dataset:
    """documents + pages → output Dataset (doc_id, spans, combined,
    transcribed, corrected, diff, n_errors)."""
    exploded = docs.map_batches(explode_spans, batch_format="pyarrow")

    if media_resolution == "broadcast":
        pages_ref = ray.put(pages_to_dict(pages))
        regions = exploded.map_batches(
            LayoutOcrStage,
            fn_constructor_kwargs={"engine_factory": engine_factory,
                                   "pages_ref": pages_ref},
            batch_format="pyarrow",
            batch_size=ocr_batch_size,
            concurrency=ocr_concurrency,
            num_cpus=1,
        )
    elif media_resolution == "join":
        if pages is None:
            raise ValueError("join resolution requires a pages Dataset")
        if not isinstance(pages, Dataset):
            pages = ray.data.from_arrow(pages)
        pages = pages.select_columns(["media_ref", "image", "width", "height", "codec"])
        # Split media rows from pass-through rows; only media rows join.
        exploded = exploded.materialize()  # consumed twice below
        media = exploded.filter(expr="kind == 'media'")
        rest = exploded.filter(expr="kind != 'media'")
        media = media.join(pages, join_type="inner", num_partitions=max(
            2, pages.num_blocks()), on=("media_ref",))
        for col, typ in (("image", pa.binary()), ("width", pa.int32()),
                         ("height", pa.int32()), ("codec", pa.string())):
            rest = rest.map_batches(
                _add_null_column(col, typ), batch_format="pyarrow")
        regions = media.union(rest).map_batches(
            LayoutOcrStage,
            fn_constructor_kwargs={"engine_factory": engine_factory},
            batch_format="pyarrow",
            batch_size=ocr_batch_size,
            concurrency=ocr_concurrency,
            num_cpus=1,
        )
    else:
        raise ValueError(f"unknown media_resolution {media_resolution!r}")

    cleaned = regions.map_batches(clean_batch, batch_format="pyarrow")

    repacked = cleaned.groupby("doc_id").map_groups(
        repack_group, batch_format="pyarrow")

    return repacked.map_batches(
        CorrectorStage,
        fn_constructor_kwargs={"enabled": correction, "emit_diff": emit_diff},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=corrector_concurrency,
        num_cpus=1,
    )


def _add_null_column(col: str, typ: pa.DataType):
    def fn(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(col, pa.nulls(tbl.num_rows, typ))
    return fn
