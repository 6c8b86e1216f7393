"""deepseek_ocr_rs_spark — a from-scratch PySpark-native re-expression of the
document-to-text extraction surface of ``TimmyOVO/deepseek-ocr.rs``.

The reference (read-only at /root/reference) is a Rust vision-OCR inference
engine whose data-processing pipeline is: load document -> deterministic
preprocessing / tiling -> feature extraction -> layout-aware token assembly ->
decode -> normalize -> golden-fixture JSON.  This package re-expresses the
same *semantic surface* Spark-first: a batched main-content extraction
pipeline over a table of multi-turn transcripts
``(conv_id, turn_idx, role, text, tool, ts)`` where vectorized pandas/Arrow
UDFs parse each turn's embedded HTML/PDF payload with a streaming byte-level
tokenizer, build a lightweight DOM-node array, apply Readability-style
boilerplate classification plus PDF layout-block reading-order
reconstruction, and emit normalized markdown / plain text plus span offsets
under a stable ``(conv_id, turn_idx)`` ordering — checked by per-turn text
equality against golden fixtures, resumable via MERGE-style checkpointing.

Layout:
  functions/   pure, deterministic kernels (tokenizer, DOM, classifier,
               markdown assembly, PDF layout, normalization, text stats)
  operators/   DataFrame-level operators (extraction mapInPandas, compaction
               window, dedup family, similarity search, multimodal stubs)
  sources/     synthetic transcript generator + parquet/iceberg readers
  plans/       job topology: salted repartition, quarantine, metrics,
               lineage, MERGE checkpoint/resume
  streaming/   Structured Streaming variant (foreachBatch MERGE)

Design rules (see SURVEY.md §4, §7):
  * DataFrame/Catalyst everywhere; custom logic only inside Arrow-batched
    pandas UDFs ("no per-row Python on the hot path").
  * Every kernel is bit-deterministic: no wall clock, no dict-order
    dependence, fixed seeds; identical output at any partitioning.
  * Skew (long conversations) handled by salted repartitioning on
    (conv_id, turn_idx); ordering restored by a range-partitioned sort.
"""

__version__ = "0.1.0"

SENTINEL = "<｜end▁of▁sentence｜>"  # <｜end▁of▁sentence｜>
