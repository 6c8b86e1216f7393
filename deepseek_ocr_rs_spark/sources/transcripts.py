"""Deterministic synthetic transcript corpus + golden extraction fixtures.

Plays the role of the reference's golden-baseline assets
(crates/infer-deepseek/tests/baseline.rs:24-72, baselines/sample/): every
generated turn carries a payload AND the expected extraction computed *by
construction* — the generator knows which blocks are content and renders the
expected markdown/spans through the same ``render_blocks`` contract the
engine uses, while the engine must recover those blocks from the messy
payload (boilerplate interleave, shuffled PDF blocks, entities, CRLF,
sentinel).  Nothing here runs the extractor, so fixture equality is a real
test of the parse/classify path.

Determinism: every conversation is generated from
``sha256(f"{seed}:{conv_id}")`` — independent of partitioning, so the
distributed generator (mapInPandas over conv ordinals) and the local
generator produce byte-identical corpora (FIXTURES.md §1 requirements,
including the skewed conversation-length distribution).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import json
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from deepseek_ocr_rs_spark.functions.dom import Block
from deepseek_ocr_rs_spark.functions.markdown import render_blocks
from deepseek_ocr_rs_spark.functions.normalize import SENTINEL, normalize_text

_EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

# vocabulary: ASCII + multibyte words (UTF-8 boundary coverage per FIXTURES §1)
_VOCAB = (
    "the quick brown fox jumps over lazy dog data spark table query scan merge "
    "join filter window batch stream shuffle partition skew salt broadcast "
    "column row schema parquet iceberg token span block heading content text "
    "naïve café résumé Zürich 日本語 한국어 émigré piñata Москва 北京 🙂 ✓ "
    "alpha beta gamma delta epsilon extract pipeline lineage metric resume"
).split()

_TOOL_NAMES = ["search", "browser", "calculator", "compiler", "shell"]

_ROLES_CYCLE = ["user", "assistant"]


def _rng_for(seed: int, conv_id: str) -> np.random.Generator:
    h = hashlib.sha256(f"{seed}:{conv_id}".encode("utf-8")).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "big"))


def _words(rng: np.random.Generator, lo: int, hi: int) -> str:
    n = int(rng.integers(lo, hi + 1))
    idx = rng.integers(0, len(_VOCAB), size=n)
    return " ".join(_VOCAB[i] for i in idx)


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


# --------------------------------------------------------------------- HTML

def _gen_html_payload(rng: np.random.Generator) -> Tuple[str, List[Block]]:
    """Build one HTML payload + its expected content blocks (in order)."""
    expected: List[Block] = []
    body: List[str] = []

    def add(tag: str, text: str) -> None:
        expected.append(Block(tag=tag, depth=0, block_idx=len(expected),
                              text=normalize_text(text)))

    # site chrome (must all be dropped)
    body.append("<header><h1>Example Site</h1><p>tagline slogan</p></header>")
    nav_items = "".join(
        f'<li><a href="/s{i}">Section {i}</a></li>' for i in range(int(rng.integers(2, 6)))
    )
    body.append(f"<nav><ul>{nav_items}</ul></nav>")
    body.append('<div><p><a href="/x">ad one</a> <a href="/y">ad two two</a> '
                '<a href="/z">ad three three</a></p></div>')  # link farm, density ~1
    # class/id-hinted chrome: plain divs/spans named as boilerplate must be
    # dropped by the Readability-style hint, not by tag or link density
    body.append('<div class="sidebar"><p>trending now weekly digest</p>'
                '<ul><li>item a</li><li>item b</li></ul></div>')
    body.append('<div id="cookie-consent"><p>we use cookies accept all</p></div>')

    body.append('<div class="main">')
    n_pieces = int(rng.integers(2, 7))
    for _ in range(n_pieces):
        kind = rng.choice(
            ["h", "p", "p_inline", "p_link", "ul", "table", "pre", "quote"],
            p=[0.12, 0.28, 0.14, 0.10, 0.14, 0.10, 0.06, 0.06],
        )
        if kind == "h":
            lvl = int(rng.integers(1, 4))
            t = _words(rng, 2, 5).title()
            add(f"h{lvl}", t)
            body.append(f"<h{lvl}>{_esc(t)}</h{lvl}>")
        elif kind == "p":
            t = _words(rng, 8, 40)
            if rng.random() < 0.15:  # CRLF edge case inside a paragraph
                mid = len(t) // 2
                sp = t.find(" ", mid)
                if sp > 0:
                    t = t[:sp] + "\r\n" + t[sp + 1 :]
            if rng.random() < 0.1:  # sentinel embedded mid-text (must vanish)
                t = t + SENTINEL
            add("p", t)
            body.append(f"<p>{_esc(t)}</p>")
        elif kind == "p_inline":
            # inline markup + entities: expected text is the decoded flat run
            w1, w2, w3 = _words(rng, 3, 6), _words(rng, 2, 4), _words(rng, 3, 8)
            t = f"{w1} {w2} & {w3} <ok>"
            add("p", t)
            body.append(f"<p>{_esc(w1)} <b>{_esc(w2)}</b> &amp; "
                        f"<em>{_esc(w3)}</em> &lt;ok&gt;</p>")
        elif kind == "p_link":
            # content paragraph with ONE short link (density << 0.5 -> kept)
            w1, anchor, w2 = _words(rng, 6, 12), "docs", _words(rng, 6, 12)
            t = f"{w1} {anchor} {w2}"
            add("p", t)
            body.append(f'<p>{_esc(w1)} <a href="/d">{anchor}</a> {_esc(w2)}</p>')
        elif kind == "ul":
            items = [_words(rng, 2, 6) for _ in range(int(rng.integers(2, 5)))]
            body.append("<ul>")
            for it in items:
                add("li", it)
                body.append(f"<li>{_esc(it)}</li>")
            body.append("</ul>")
        elif kind == "table":
            ncol = int(rng.integers(2, 4))
            body.append("<table>")
            for _r in range(int(rng.integers(1, 4))):
                cells = [_words(rng, 1, 3) for _ in range(ncol)]
                add("tr", " | ".join(cells))
                body.append("<tr>" + "".join(f"<td>{_esc(c)}</td>" for c in cells)
                            + "</tr>")
            body.append("</table>")
        elif kind == "pre":
            t = _words(rng, 3, 8)
            add("pre", t)
            body.append(f"<pre>{_esc(t)}</pre>")
        else:  # quote
            t = _words(rng, 5, 15)
            add("blockquote", t)
            body.append(f"<blockquote>{_esc(t)}</blockquote>")
        if rng.random() < 0.2:  # interleaved boilerplate between content pieces
            body.append('<aside><p>related promo text</p></aside>')
        if rng.random() < 0.15:  # hinted chrome interleaved with content
            body.append('<div class="social share"><p>share this article</p>'
                        '</div>')
    body.append("</div>")
    body.append("<footer><p>© 2024 example corp · privacy · terms</p></footer>")
    body.append("<script>trackPageview('<p>fake</p>');</script>")

    html = ("<html><head><title>t</title><style>p{margin:0}</style></head>"
            "<body>" + "".join(body) + "</body></html>")
    return html, expected


# ---------------------------------------------------------------------- PDF

def _gen_pdf_payload(rng: np.random.Generator) -> Tuple[str, List[Block]]:
    expected: List[Block] = []
    pages = []
    n_pages = int(rng.integers(1, 3))
    for pno in range(1, n_pages + 1):
        blocks = []
        y = 0.0
        # heading
        t = _words(rng, 2, 5).title()
        font = 24.0 if rng.random() < 0.5 else 16.0
        blocks.append({"x": 0.0, "y": y, "w": 500.0, "h": 24.0, "font": font,
                       "text": t})
        expected.append(Block(tag="h1" if font >= 20.0 else "h2", depth=pno,
                              block_idx=len(expected), text=normalize_text(t)))
        y += 30.0
        # multi-row two-column layout: a naive (y, x) sort would interleave
        # L1 R1 L2 R2; XY-cut must read column-major (gutter gap 20 > line
        # gap 8, so the vertical cut wins)
        # the column region is isolated by 18-point bands above and below
        # (wider than the 8-point row gap, narrower than nothing else on
        # the page), so XY-cut peels it off whole before the 20-point
        # gutter beats the row gap inside it
        if rng.random() < 0.3:
            lefts = [_words(rng, 3, 8) for _ in range(2)]
            rights = [_words(rng, 3, 8) for _ in range(2)]
            for i in range(2):
                blocks.append({"x": 0.0, "y": y + 12.0 + 20.0 * i, "w": 240.0,
                               "h": 12.0, "font": 10.0, "text": lefts[i]})
                blocks.append({"x": 260.0, "y": y + 12.0 + 20.0 * i, "w": 240.0,
                               "h": 12.0, "font": 10.0, "text": rights[i]})
            for t in lefts + rights:  # expected: column-major
                expected.append(Block(tag="p", depth=pno,
                                      block_idx=len(expected),
                                      text=normalize_text(t)))
            y += 62.0
        # two-column row: same y, order by x
        if rng.random() < 0.4:
            tl, tr_ = _words(rng, 4, 10), _words(rng, 4, 10)
            blocks.append({"x": 260.0, "y": y, "w": 240.0, "h": 12.0,
                           "font": 10.0, "text": tr_})
            blocks.append({"x": 0.0, "y": y, "w": 240.0, "h": 12.0,
                           "font": 10.0, "text": tl})
            expected.append(Block(tag="p", depth=pno, block_idx=len(expected),
                                  text=normalize_text(tl)))
            expected.append(Block(tag="p", depth=pno, block_idx=len(expected),
                                  text=normalize_text(tr_)))
            y += 20.0
        for _ in range(int(rng.integers(1, 5))):
            t = _words(rng, 8, 30)
            blocks.append({"x": 0.0, "y": y, "w": 500.0, "h": 12.0,
                           "font": float(rng.choice([9.0, 10.0, 11.0])),
                           "text": t})
            expected.append(Block(tag="p", depth=pno, block_idx=len(expected),
                                  text=normalize_text(t)))
            y += 16.0
        # page furniture: page number (digits) + tiny-font running footer
        blocks.append({"x": 250.0, "y": 800.0, "w": 20.0, "h": 8.0,
                       "font": 10.0, "text": str(pno)})
        blocks.append({"x": 0.0, "y": 805.0, "w": 200.0, "h": 6.0,
                       "font": 6.0, "text": "confidential draft"})
        rng.shuffle(blocks)  # reading order must be reconstructed
        pages.append({"page": pno, "blocks": blocks})
    payload = json.dumps({"kind": "pdf", "pages": pages}, ensure_ascii=False)
    return payload, expected


# -------------------------------------------------------------------- plain

def _gen_plain_payload(rng: np.random.Generator) -> Tuple[Optional[str], str]:
    """Returns (payload, expected_text)."""
    r = rng.random()
    if r < 0.06:
        return "", ""
    if r < 0.12:
        return "   \r\n\t  ", ""
    if r < 0.16:
        return None, ""
    if r < 0.22:  # tiny payload below any segmentation threshold
        t = _words(rng, 1, 2)
        return t, normalize_text(t)
    t = _words(rng, 5, 60)
    if rng.random() < 0.3:
        t = t.replace(" ", "\r\n", 1)
    if rng.random() < 0.2:
        t = t + " " + SENTINEL + " tail"
    return t, normalize_text(t)


# ------------------------------------------------------------- conversation

def gen_conversation(
    conv_id: str, n_turns: int, seed: int
) -> Tuple[List[Dict], List[Dict]]:
    """One conversation -> (transcript rows, fixture rows)."""
    rng = _rng_for(seed, conv_id)
    t_rows: List[Dict] = []
    f_rows: List[Dict] = []
    has_system = rng.random() < 0.5
    for turn_idx in range(n_turns):
        if turn_idx == 0 and has_system:
            role = "system"
        elif rng.random() < 0.12:
            role = "tool"
        else:
            role = _ROLES_CYCLE[turn_idx % 2]
        tool = str(rng.choice(_TOOL_NAMES)) if role == "tool" else None

        kind_roll = rng.random()
        if role in ("system", "tool") or kind_roll >= 0.75:
            payload, expected_text = _gen_plain_payload(rng)
            if expected_text == "":
                fixture = _fixture(conv_id, turn_idx, "plain", "", "", [], 0, 0)
            else:
                spans = [{"start": 0, "end": len(expected_text),
                          "kind": "content", "block_idx": 0}]
                fixture = _fixture(conv_id, turn_idx, "plain", expected_text,
                                   expected_text, spans, 1, len(expected_text))
        elif kind_roll < 0.50:
            payload, blocks = _gen_html_payload(rng)
            text_md, text_plain, spans, n_blocks, n_chars = render_blocks(blocks)
            fixture = _fixture(conv_id, turn_idx, "html", text_md, text_plain,
                               spans, n_blocks, n_chars)
        else:
            payload, blocks = _gen_pdf_payload(rng)
            text_md, text_plain, spans, n_blocks, n_chars = render_blocks(blocks)
            fixture = _fixture(conv_id, turn_idx, "pdf", text_md, text_plain,
                               spans, n_blocks, n_chars)

        t_rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": turn_idx,
                "role": role,
                "text": payload,
                "tool": tool,
                "ts": _EPOCH + _dt.timedelta(seconds=turn_idx * 37),
            }
        )
        f_rows.append(fixture)
    return t_rows, f_rows


def _fixture(conv_id, turn_idx, kind, text_md, text_plain, spans, n_blocks,
             n_chars) -> Dict:
    return {
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "schema_version": 1,
        "payload_kind": kind,
        "text_md": text_md,
        "text_plain": text_plain,
        "spans": spans,
        "n_blocks": n_blocks,
        "n_chars": n_chars,
    }


def conv_plan(n_convs: int, seed: int, skew_every: int = 200,
              skew_turns: int = 400) -> List[Tuple[str, int]]:
    """Deterministic (conv_id, n_turns) plan with long-tail skew.

    Most conversations have 2-20 turns; every ``skew_every``-th has
    ``skew_turns`` (FIXTURES §1: a few 1000+-turn convs at bench scale) —
    these exercise the salting path, since a single conv would otherwise pin
    one partition.
    """
    plan = []
    for i in range(n_convs):
        conv_id = f"conv-{seed}-{i:08d}"
        if skew_every and i % skew_every == skew_every - 1:
            n_turns = skew_turns
        else:
            rng = _rng_for(seed, conv_id + ":plan")
            n_turns = int(rng.integers(2, 21))
        plan.append((conv_id, n_turns))
    return plan


# ------------------------------------------------------------ Spark drivers

def generate_local(spark, n_convs: int, seed: int = 42, skew_every: int = 200,
                   skew_turns: int = 400):
    """Driver-side generation for test tiers (t1/t2). Returns (transcripts_df,
    fixtures_df)."""
    from deepseek_ocr_rs_spark.schemas import FIXTURES_SCHEMA, TRANSCRIPTS_SCHEMA

    t_all: List[Dict] = []
    f_all: List[Dict] = []
    for conv_id, n_turns in conv_plan(n_convs, seed, skew_every, skew_turns):
        t, f = gen_conversation(conv_id, n_turns, seed)
        t_all.extend(t)
        f_all.extend(f)
    return (
        spark.createDataFrame(t_all, TRANSCRIPTS_SCHEMA),
        spark.createDataFrame(f_all, FIXTURES_SCHEMA),
    )


def generate_transcripts_df(spark, n_convs: int, seed: int = 42,
                            skew_every: int = 200, skew_turns: int = 400,
                            partitions: Optional[int] = None):
    """Distributed generation (bench scale): mapInPandas over conv ordinals.

    Output is independent of ``partitions`` (per-conv seeding), so the same
    corpus can be regenerated at any parallelism — the property the
    two-cluster-size scaling run relies on.
    """
    import pandas as pd

    from deepseek_ocr_rs_spark.schemas import TRANSCRIPTS_SCHEMA

    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    cols = [f.name for f in TRANSCRIPTS_SCHEMA.fields]

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # yield in bounded chunks (~CHUNK_CONVS convs ≈ 6.5k turns ≈ 20 MB):
        # one giant DataFrame per partition would stall the Arrow stream and
        # balloon worker memory at scale
        CHUNK_CONVS = 500
        for pdf in batches:
            ids = pdf["id"].tolist()
            for lo in range(0, len(ids), CHUNK_CONVS):
                rows: List[Dict] = []
                for i in ids[lo : lo + CHUNK_CONVS]:
                    conv_id = f"conv-{seed}-{i:08d}"
                    if skew_every and i % skew_every == skew_every - 1:
                        n_turns = skew_turns
                    else:
                        n_turns = int(
                            _rng_for(seed, conv_id + ":plan").integers(2, 21))
                    t, _ = gen_conversation(conv_id, n_turns, seed)
                    rows.extend(t)
                yield pd.DataFrame(rows, columns=cols)

    return (
        spark.range(0, n_convs, 1, parts)
        .mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
    )
