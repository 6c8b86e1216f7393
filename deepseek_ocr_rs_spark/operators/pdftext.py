"""Real PDF text-layer extraction + XY-cut reading order over media rows.

Couples the minimal real PDF codec (functions/pdf.py — object scan,
FlateDecode, content-stream tokenizer) to the existing layout machinery
(functions/pdflayout.py xy_cut_order), giving the text-layer analog of
the reference's document-to-markdown product surface: digitally-born
PDFs extract by parsing; only scanned images need the OCR model the
reference wraps.

* :func:`pdf_text_blocks` — one row per text-show operator:
  ``(doc_id, ord, x, y, text)`` with document-order ordinals and
  text-line origins in PDF user space.
* :func:`pdf_reading_order` — blocks re-ordered by the Nagy-Seth
  recursive XY-cut (so two-column pages read column-major, not
  interleaved): ``(doc_id, read_pos, text)``.  PDF user space is
  y-up; boxes convert to top-down with the page height, with width
  estimated from text length at the fixture's fixed 12pt metrics —
  the estimate only has to preserve gutter separation, which the
  XY-cut needs, not exact glyph metrics.

Scale shape: both are single mapInPandas passes (parse + in-memory
XY-cut per document), zero shuffles; rows stay partition-aligned with
their source documents.  Tolerant contract: undecodable payloads raise
(curated-media path, like decoded_pixel_grid) — wrap with a try/fallback
upstream for crawl-grade sweeps.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

from deepseek_ocr_rs_spark.functions.pdf import extract_pdf_text

__all__ = ["pdf_text_blocks", "pdf_reading_order"]

PAGE_H = 792.0  # the writer's MediaBox height (US Letter)
_CHAR_W = 6.0   # nominal 12pt Helvetica advance for gutter math
_LINE_H = 12.0


def pdf_text_blocks(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, PDF payload) -> one row per text-show event."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {"doc_id": [], "ord": [], "x": [], "y": [], "text": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for order, x, y, text in extract_pdf_text(bytes(payload)):
                    out["doc_id"].append(doc_id)
                    out["ord"].append(order)
                    out["x"].append(x)
                    out["y"].append(y)
                    out["text"].append(text)
            yield pd.DataFrame(out)

    return media.select(id_col, payload_col).mapInPandas(
        run, schema="doc_id string, ord int, x double, y double, text string"
    )


def pdf_reading_order(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, PDF payload) -> blocks in XY-cut reading order."""
    import pandas as pd

    from deepseek_ocr_rs_spark.functions.pdflayout import xy_cut_order

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {"doc_id": [], "read_pos": [], "text": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                boxes = [
                    (x, PAGE_H - y, _CHAR_W * len(text), _LINE_H, text)
                    for _o, x, y, text in extract_pdf_text(bytes(payload))
                ]
                for pos, box in enumerate(xy_cut_order(boxes)):
                    out["doc_id"].append(doc_id)
                    out["read_pos"].append(pos)
                    out["text"].append(box[4])
            yield pd.DataFrame(out)

    return media.select(id_col, payload_col).mapInPandas(
        run, schema="doc_id string, read_pos int, text string"
    )
