"""Readability/Trafilatura-style boilerplate classification.

The reference selects which parts of the document reach the output through
deterministic scoring and thresholds (tiling predicate preprocess.rs:73-81,
repetition penalty sampling.rs:120-139).  Here the analog is a per-block
keep/drop decision over the DOM-node array:

  drop if  in_drop_subtree          (nav/header/footer/aside/script/style/…)
  drop if  text is empty after normalization
  drop if  link_density > LINK_DENSITY_MAX   (link farms / nav lists)
  drop if  tag == 'p' and n_chars < MIN_P_CHARS and link_density > 0
           (tiny link-only fragments)

All thresholds are fixed constants — bit-deterministic, no data-dependent
tuning — so output is identical across partitionings and batch sizes.
Ratios are computed in float64 (the reference upcasts unstable math to f32:
model/mod.rs:74-88); comparisons use wide margins so no block in the golden
corpus sits near a threshold.
"""

from __future__ import annotations

from typing import List

from deepseek_ocr_rs_spark.functions.dom import Block

LINK_DENSITY_MAX = 0.5
MIN_P_CHARS = 8


def link_density(block: Block) -> float:
    if block.n_chars <= 0:
        return 0.0
    return float(block.n_link_chars) / float(block.n_chars)


def keep_block(block: Block) -> bool:
    if block.in_drop_subtree:
        return False
    if block.n_chars == 0:
        return False
    ld = link_density(block)
    if ld > LINK_DENSITY_MAX:
        return False
    if block.tag == "p" and block.n_chars < MIN_P_CHARS and ld > 0.0:
        return False
    return True


def classify_blocks(blocks: List[Block]) -> List[Block]:
    """Return content blocks in document order (block_idx preserved)."""
    return [b for b in blocks if keep_block(b)]
