"""Pure deterministic kernels used inside Arrow-batched pandas UDFs."""

from deepseek_ocr_rs_spark.functions.normalize import (
    SENTINEL,
    earliest_divergence,
    normalize_text,
)
from deepseek_ocr_rs_spark.functions.tokenizer import HtmlTokenizer, tokenize_html
from deepseek_ocr_rs_spark.functions.dom import Block, build_blocks
from deepseek_ocr_rs_spark.functions.classify import classify_blocks, link_density
from deepseek_ocr_rs_spark.functions.markdown import render_blocks
from deepseek_ocr_rs_spark.functions.pdflayout import parse_pdf_payload
from deepseek_ocr_rs_spark.functions.extract_core import (
    extract_payload,
    sniff_payload_kind,
)

__all__ = [
    "SENTINEL",
    "normalize_text",
    "earliest_divergence",
    "HtmlTokenizer",
    "tokenize_html",
    "Block",
    "build_blocks",
    "classify_blocks",
    "link_density",
    "render_blocks",
    "parse_pdf_payload",
    "extract_payload",
    "sniff_payload_kind",
]
