"""XY-cut reading order for PDF layout blocks (Spark-free).

Pins the layout-analysis contract of functions/pdflayout.py:

  * multi-column pages read column-major (a naive (y, x) sort would
    interleave the columns row-major — the bug XY-cut exists to fix);
  * widest-gap-first cut selection: the column gutter beats the line
    spacing, the heading band is peeled off before the grid;
  * order is shuffle-invariant (splits depend only on coordinates);
  * degenerate geometry (any block missing w/h) falls back to the flat
    (y, x, font, text) sort, keeping point-block payloads byte-stable;
  * the generator's golden fixtures agree with the extractor for every
    seed (the per-turn text-equality contract at its source).

Reference analog: row-major tile->token ordering with explicit breaks
(vision/preprocess.rs:119-127) — the 1-D serialization of a 2-D plane.
"""
import json
import random

import numpy as np
import pytest

from deepseek_ocr_rs_spark.functions.pdflayout import (
    parse_pdf_payload,
    xy_cut_order,
)


def _pay(blocks, page=1):
    return json.dumps({"kind": "pdf", "pages": [{"page": page,
                                                 "blocks": blocks}]})


def _grid():
    return [
        {"x": 0, "y": 10, "w": 240, "h": 12, "font": 10, "text": "L1"},
        {"x": 260, "y": 10, "w": 240, "h": 12, "font": 10, "text": "R1"},
        {"x": 0, "y": 30, "w": 240, "h": 12, "font": 10, "text": "L2"},
        {"x": 260, "y": 30, "w": 240, "h": 12, "font": 10, "text": "R2"},
    ]


def test_two_columns_read_column_major():
    got = [b.text for b in parse_pdf_payload(_pay(_grid()))]
    assert got == ["L1", "L2", "R1", "R2"]


def test_heading_peels_before_grid():
    blocks = _grid() + [
        {"x": 0, "y": -40, "w": 500, "h": 24, "font": 24, "text": "Head"},
    ]
    got = [(b.tag, b.text) for b in parse_pdf_payload(_pay(blocks))]
    assert got == [("h1", "Head"), ("p", "L1"), ("p", "L2"),
                   ("p", "R1"), ("p", "R2")]


def test_shuffle_invariance():
    blocks = _grid() + [
        {"x": 0, "y": -40, "w": 500, "h": 24, "font": 24, "text": "Head"},
        {"x": 0, "y": 100, "w": 500, "h": 12, "font": 10, "text": "tail"},
    ]
    rng = random.Random(7)
    want = [b.text for b in parse_pdf_payload(_pay(blocks))]
    for _ in range(20):
        rng.shuffle(blocks)
        assert [b.text for b in parse_pdf_payload(_pay(blocks))] == want


def test_three_columns():
    blocks = [
        {"x": 170 * c, "y": 20 * r, "w": 150, "h": 12, "font": 10,
         "text": f"c{c}r{r}"}
        for c in range(3) for r in range(2)
    ]
    got = [b.text for b in parse_pdf_payload(_pay(blocks))]
    assert got == ["c0r0", "c0r1", "c1r0", "c1r1", "c2r0", "c2r1"]


def test_degenerate_geometry_falls_back_to_flat_sort():
    # no w/h: the old (y, x) order, with furniture dropped
    blocks = [
        {"x": 5, "y": 20, "font": 10, "text": "body"},
        {"x": 0, "y": 10, "font": 24, "text": "head"},
        {"x": 0, "y": 99, "font": 10, "text": "42"},
        {"x": 0, "y": 98, "font": 6, "text": "footer"},
    ]
    got = [(b.tag, b.text) for b in parse_pdf_payload(_pay(blocks))]
    assert got == [("h1", "head"), ("p", "body")]
    # ONE degenerate block poisons the page into fallback (no partial cuts)
    mixed = _grid() + [{"x": 0, "y": 50, "font": 10, "text": "flat"}]
    got = [b.text for b in parse_pdf_payload(_pay(mixed))]
    assert got == ["L1", "R1", "L2", "R2", "flat"]  # row-major (y, x)


def test_touching_blocks_are_not_a_gap():
    # intervals that share an edge (end == next start) must not split —
    # a zero-width band is not whitespace
    boxes = [
        (0.0, 0.0, 100.0, 10.0, 10.0, "a"),
        (0.0, 10.0, 100.0, 10.0, 10.0, "b"),
        (100.0, 0.0, 100.0, 20.0, 10.0, "c"),
    ]
    got = [b[5] for b in xy_cut_order(boxes)]
    assert got == ["a", "c", "b"]  # leaf sort (y, x), no cuts fired


def test_duplicate_page_numbers_merge():
    pages = [
        {"page": 1, "blocks": [
            {"x": 0, "y": 30, "w": 500, "h": 12, "font": 10, "text": "two"},
        ]},
        {"page": 1, "blocks": [
            {"x": 0, "y": 0, "w": 500, "h": 12, "font": 10, "text": "one"},
        ]},
    ]
    payload = json.dumps({"kind": "pdf", "pages": pages})
    assert [b.text for b in parse_pdf_payload(payload)] == ["one", "two"]


@pytest.mark.parametrize("seed_base", [0, 5000])
def test_generator_fixtures_agree_with_extractor(seed_base):
    from deepseek_ocr_rs_spark.sources.transcripts import _gen_pdf_payload

    for seed in range(seed_base, seed_base + 500):
        rng = np.random.default_rng(seed)
        payload, expected = _gen_pdf_payload(rng)
        got = parse_pdf_payload(payload)
        assert [(b.tag, b.text) for b in got] == \
            [(b.tag, b.text) for b in expected], f"seed {seed}"
