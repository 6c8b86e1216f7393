"""Pure-function tests for the extraction kernel (no Spark).

Mirrors the reference's unit layer (SURVEY.md §5.1): single-operator tests on
normalization, tokenizer streaming invariance, DOM building, classification,
PDF reading order, and span invariants.
"""

import json

from deepseek_ocr_rs_spark.functions import (
    SENTINEL,
    build_blocks,
    classify_blocks,
    earliest_divergence,
    extract_payload,
    normalize_text,
    parse_pdf_payload,
    render_blocks,
    sniff_payload_kind,
    tokenize_html,
)
from deepseek_ocr_rs_spark.functions.tokenizer import HtmlTokenizer, decode_entities


# ---------------------------------------------------------------- normalize

def test_normalize_crlf_sentinel_trim():
    assert normalize_text("  a\r\nb  ") == "a\nb"
    assert normalize_text(f"x{SENTINEL}y") == "xy"
    assert normalize_text(None) == ""
    assert normalize_text("   \r\n  ") == ""


def test_earliest_divergence():
    assert earliest_divergence("abc", "abc") is None
    assert earliest_divergence("abc", "abd") == 2
    assert earliest_divergence("abc", "abcd") == 3
    assert earliest_divergence([1, 2], [1, 3]) == 1


# ---------------------------------------------------------------- tokenizer

HTML = (
    "<html><head><title>T</title><style>p{color:red}</style></head><body>"
    "<h1>Header &amp; more</h1><p>Hello <b>world</b> &#x1F600;</p>"
    "<!-- a comment with > inside --><p>after</p>"
    "<script>var x = '<p>not text</p>';</script>"
    "<ul><li>one</li><li>two</li></ul></body></html>"
)


def test_tokenizer_chunking_invariance():
    base = tokenize_html(HTML)
    for cs in (1, 2, 3, 7, 16, 1000):
        assert tokenize_html(HTML, chunk_size=cs) == base, f"chunk {cs}"


def test_tokenizer_multibyte_boundary():
    s = "<p>naïve 日本語 🙂 café</p>"
    base = tokenize_html(s)
    for cs in (1, 2, 3, 5):
        assert tokenize_html(s, chunk_size=cs) == base
    texts = [e[1] for e in base if e[0] == "text"]
    assert texts == ["naïve 日本語 🙂 café"]


def test_tokenizer_entities():
    assert decode_entities("a &amp; b &lt;c&gt; &#65; &#x42; &nbsp;") == "a & b <c> A B  "
    assert decode_entities("&bogus; &unknown123;") == "&bogus; &unknown123;"


def test_tokenizer_html5_named_entities():
    """Full HTML5 named-entity coverage (round-3 verdict item 5): the spec
    table is ~2.2k names, case-SENSITIVE (&Ouml; is not &ouml;), while the
    legacy pipeline names stay case-insensitive and nbsp still normalizes
    to ASCII space (the fixture-pinned contract)."""
    assert decode_entities("caf&eacute;") == "café"
    assert decode_entities("&Ouml;l &ouml;l") == "Öl öl"
    assert decode_entities("&frac12; cup") == "½ cup"
    assert decode_entities("&Aacute;&agrave;&ccedil;&szlig;&euro;&deg;") == "Áàçß€°"
    assert decode_entities("&alpha;&Omega;&rarr;&times;&divide;") == "αΩ→×÷"
    # legacy overrides keep their case-insensitive behavior + nbsp→' '
    assert decode_entities("a&NbSp;b") == "a b"
    assert decode_entities("&AMP;&Amp;") == "&&"
    # unknown names still pass through untouched
    assert decode_entities("&zzznotreal;") == "&zzznotreal;"
    # spot-check table size: the stdlib spec map really is loaded
    from deepseek_ocr_rs_spark.functions.tokenizer import _NAMED_ENTITIES
    assert len(_NAMED_ENTITIES) > 2000


# Adversarial streaming corpus (round-3 verdict item 8): fuzz-shaped FIXED
# fixtures hitting every nasty chunk-boundary case — unterminated comments
# and rawtext, '>' and '->' inside comments (the fabricated-terminator bug),
# attribute quotes spanning chunks, tags around the 32-char memo threshold.
# The X5 invariant: the event stream is byte-identical under ANY chunking.
ADVERSARIAL_DOCS = [
    "<p>a</p><!-- x > b->still comment--><p>c</p>",       # ADVICE repro
    "<p>a</p><!-- never closed",                          # unterminated comment
    "<p>a</p><!-- never > closed -",                      # unterminated, with '>'
    "<!--x--><p>ok</p>",                                  # minimal comment
    "<!--->abrupt<p>t</p>",                               # abrupt close <!--->
    "<!-->abrupt2<p>t</p>",                               # abrupt close <!-->
    "<!-- a -- b --- c --><p>d</p>",                      # '--' runs inside
    "<!-- tail-dash -→--><p>z</p>",                  # multibyte near '-->'
    "<p>a</p><script>var s='</scr'+'ipt>';</script><p>b</p>",  # fake close
    "<p>a</p><script>unterminated rawtext",               # unterminated rawtext
    "<style>p{}</style><p>s</p>",                         # style rawtext
    '<a href="http://example.com/a?b=c&amp;d=e#frag-with-dashes">x</a>',
    '<a href="val>with-gt">x</a>',                        # '>' in quoted attr
    "<" + "verylongtagname" * 3 + ">x</p>",               # >32-char tag (no memo)
    "<div12345678901234567890123456789>x</div12345678901234567890123456789>",
    "<p>caf&eacute; &frac12; &#x1F600; é日本</p>",  # entities+mb
    "<p><<b>>x</b></p>",                                  # nested '<'
    "<![CDATA[not html]]><p>after</p>",                   # CDATA-ish markup
    "text before <p>mid</p> text after",                  # leading/trailing text
    "<!-- c1 --><!-- c2 --><!-- c3 -->gap<p>e</p>",       # back-to-back comments
]


def test_tokenizer_adversarial_chunking_invariance():
    for doc in ADVERSARIAL_DOCS:
        base = tokenize_html(doc)
        n = len(doc.encode("utf-8"))
        for cs in range(1, min(n, 24) + 1):
            assert tokenize_html(doc, chunk_size=cs) == base, (doc, cs)


def test_tokenizer_comment_never_leaks_text():
    """Comment bodies must never surface as text events, under any
    chunking — the fabricated '-->' bug leaked 'still comment'."""
    doc = "<p>a</p><!-- x > b->still comment--><p>c</p>"
    for cs in list(range(1, 12)) + [0]:
        evs = tokenize_html(doc, chunk_size=cs)
        texts = "".join(e[1] for e in evs if e[0] == "text")
        assert "comment" not in texts and "still" not in texts, cs
        assert texts == "ac", cs


def test_tokenizer_rawtext_and_comment():
    evs = tokenize_html(HTML)
    texts = [e[1] for e in evs if e[0] == "text"]
    assert "var x = '" not in "".join(texts)
    assert not any("not text" in t for t in texts)
    assert not any("comment" in t for t in texts)


def test_tokenizer_kept_attrs_only():
    # href (link density) + class/id (boilerplate hints) are kept; every
    # other attribute is skipped
    evs = tokenize_html(
        '<a href="http://x" class="z" id="q" title="t" data-x="1">link</a>'
    )
    opens = [e for e in evs if e[0] == "open"]
    assert opens[0] == ("open", "a", {"href": "http://x", "class": "z",
                                      "id": "q"})
    # attribute names are case-insensitive per HTML: the no-href fast path
    # must not swallow <a HREF=...>
    evs = tokenize_html('<a HREF="/x">link</a>')
    opens = [e for e in evs if e[0] == "open"]
    assert opens[0] == ("open", "a", {"href": "/x"})
    evs = tokenize_html('<a Href="/y">link</a>')
    opens = [e for e in evs if e[0] == "open"]
    assert opens[0] == ("open", "a", {"href": "/y"})


# ---------------------------------------------------------------- DOM + classify

def test_dom_blocks_and_classification():
    html = (
        "<html><body><header><h1>Site</h1></header>"
        "<nav><ul><li><a href='/'>Home</a></li></ul></nav>"
        "<div><h1>Title</h1><p>Real content paragraph here.</p>"
        "<p><a href='/a'>spam</a> <a href='/b'>spam</a> <a href='/c'>spamspam</a></p>"
        "<ul><li>alpha</li><li>beta</li></ul>"
        "<table><tr><td>c1</td><td>c2</td></tr></table></div>"
        "<footer><p>copyright</p></footer></body></html>"
    )
    blocks = build_blocks(tokenize_html(html))
    kept = classify_blocks(blocks)
    kept_texts = [b.text for b in kept]
    assert "Site" not in kept_texts           # header subtree dropped
    assert "Home" not in kept_texts           # nav subtree dropped
    assert "copyright" not in kept_texts      # footer subtree dropped
    assert "Title" in kept_texts
    assert "Real content paragraph here." in kept_texts
    assert "alpha" in kept_texts and "beta" in kept_texts
    assert "c1 | c2" in kept_texts            # tr cells joined
    assert not any("spam" in t for t in kept_texts)  # link farm dropped


def test_render_blocks_spans_invariants():
    html = ("<html><body><h2>H</h2><p>para one</p><ul><li>x1</li></ul>"
            "</body></html>")
    kept = classify_blocks(build_blocks(tokenize_html(html)))
    text_md, text_plain, spans, n_blocks, n_chars = render_blocks(kept)
    assert text_md == "## H\n\npara one\n\n- x1"
    assert text_plain == "H\npara one\nx1"
    assert n_blocks == 3 and n_chars == len(text_md)
    # FIXTURES §3 invariants
    prev_end = -1
    for s in spans:
        assert 0 <= s["start"] < s["end"] <= len(text_md)
        assert s["start"] > prev_end
        prev_end = s["end"]
    assert [text_md[s["start"]:s["end"]] for s in spans] == ["## H", "para one", "- x1"]
    assert [s["kind"] for s in spans] == ["heading", "content", "list"]


# ---------------------------------------------------------------- PDF layout

def test_pdf_reading_order_and_furniture():
    payload = json.dumps({
        "kind": "pdf",
        "pages": [
            {"page": 2, "blocks": [
                {"x": 0, "y": 10, "w": 100, "h": 10, "font": 10, "text": "p2 body"},
            ]},
            {"page": 1, "blocks": [
                {"x": 50, "y": 5, "w": 10, "h": 5, "font": 10, "text": "right"},
                {"x": 0, "y": 5, "w": 10, "h": 5, "font": 10, "text": "left"},
                {"x": 0, "y": 0, "w": 100, "h": 20, "font": 24, "text": "Big Title"},
                {"x": 40, "y": 90, "w": 5, "h": 3, "font": 10, "text": "17"},
                {"x": 40, "y": 95, "w": 5, "h": 3, "font": 6, "text": "running footer"},
            ]},
        ],
    })
    blocks = parse_pdf_payload(payload)
    assert [b.text for b in blocks] == ["Big Title", "left", "right", "p2 body"]
    assert blocks[0].tag == "h1"
    assert parse_pdf_payload("{not json") is None


# ---------------------------------------------------------------- end-to-end kernel

def test_sniff():
    assert sniff_payload_kind("<html><body></body></html>") == "html"
    assert sniff_payload_kind("  <!DOCTYPE html><html></html>") == "html"
    assert sniff_payload_kind('{"kind":"pdf","pages":[]}') == "pdf"
    assert sniff_payload_kind("just words") == "plain"
    assert sniff_payload_kind(None) == "plain"


def test_extract_payload_plain_and_edge():
    r = extract_payload("hello\r\nworld" + SENTINEL)
    assert r["text_md"] == "hello\nworld"
    assert r["spans"] == [{"start": 0, "end": 11, "kind": "content", "block_idx": 0}]
    assert extract_payload("")["text_md"] == ""
    assert extract_payload("   ")["n_blocks"] == 0
    assert extract_payload(None)["ok"] is True


def test_extract_payload_chunk_size_invariance():
    html = ("<html><body><h1>Tïtle 🙂</h1><p>body &amp; text with 日本語 chars"
            "</p></body></html>")
    results = [extract_payload(html, chunk_bytes=cb) for cb in (1, 3, 7, 4096)]
    assert all(r == results[0] for r in results)
    assert results[0]["text_md"] == "# Tïtle 🙂\n\nbody & text with 日本語 chars"


# ------------------------------------------------------------ fingerprint

def test_fingerprint_batch_matches_single_doc_model():
    """The batch kernel (one numpy pass over the whole Arrow batch) must
    agree with the direct per-document definition
    fp = ((sum cp_i * B^(n-1-i)) mod 2^64 + OFFSET) mod 2^63."""
    from deepseek_ocr_rs_spark.operators.textstats import (
        _FP_BASE,
        _FP_OFFSET,
        fingerprint_batch,
        rolling_fingerprint,
    )

    def direct(t):
        if not t:
            return 0
        h = 0
        for i, ch in enumerate(t):
            h = (h + ord(ch) * pow(int(_FP_BASE), len(t) - 1 - i, 1 << 64)) \
                % (1 << 64)
        return (h + int(_FP_OFFSET)) % (1 << 64) & ((1 << 63) - 1)

    texts = ["hello world", "", None, "a", "日本語テキスト🙂", "x" * 3000,
             " ", "\n\t", "mixed 日本 text 123", "€ sign"]
    got = list(fingerprint_batch(texts))
    assert got == [direct(t) for t in texts]
    assert got == [rolling_fingerprint(t) for t in texts]


def test_tokenizer_seeded_differential_fuzz():
    """Grammar-based differential fuzz: 200 seeded random documents, event
    stream byte-identical across hostile chunkings (the X5 invariant,
    streaming.rs:43-62).  Deterministic — failures reproduce by seed."""
    import random

    rng = random.Random(0xD0C5)
    frags = [
        "<p>", "</p>", "<div>", "</div>", "<b>", "</b>", "<a href=\"x&y\">",
        "</a>", "<br>", "<!--", "-->", "--", "-", ">", "<", "&amp;",
        "&eacute;", "&#x41;", "&bogus;", "&", ";", "<script>", "</script>",
        "<style>", "</style>", "<td>", "</td>", "<tr>", "</tr>", "<pre>",
        "</pre>", "text ", "é", "日", "\U0001F600", "\n", "  ", "<!",
        "<![CDATA[", "]]>", "'", '"', "=", "<p attr='v>w'>", "<h1>", "</h1>",
    ]
    for trial in range(200):
        doc = "".join(rng.choice(frags) for _ in range(rng.randint(1, 40)))
        base = tokenize_html(doc)
        n = max(1, len(doc.encode("utf-8")))
        for cs in (1, 2, 3, 5, 7, 13, max(1, n // 2), n):
            assert tokenize_html(doc, chunk_size=cs) == base, (trial, doc, cs)


def test_extract_payload_never_raises_fuzz():
    """C4/C5 discipline: any garbage payload yields a structured result
    (ok flag routes to quarantine), never an exception — and span
    invariants hold on whatever was extracted."""
    import json as _json
    import random

    rng = random.Random(0xFA112)
    frags = [
        "%PDF {", '{"pages":', '[{"page":0,', '"y":', '"x":', '"text":"t"',
        "}", "]", "{", "[", ",", '"', "\\", "<html>", "<p>", "</p>",
        "<!--", "-->", "&#x;", "&#xZZ;", "null", "1e999", "NaN", "\x00",
        "é", "\U0001F600", " ", "data:image/png;base64,", "!!!notb64",
    ]
    for trial in range(300):
        doc = "".join(rng.choice(frags) for _ in range(rng.randint(0, 25)))
        res = extract_payload(doc, chunk_bytes=rng.choice([3, 17, 4096]))
        assert set(res) >= {"payload_kind", "text_md", "spans", "ok"}, trial
        assert isinstance(res["ok"], bool)
        prev_end = -1
        for s in res["spans"]:
            assert 0 <= s["start"] < s["end"] <= len(res["text_md"])
            assert s["start"] > prev_end
            prev_end = s["end"]
        _json.dumps(res["spans"])  # spans stay JSON-serializable
    assert extract_payload(None)["ok"] is True  # NULL text = empty plain


# ------------------------------------------- fast-path differential parity


def test_fast_tokenizer_matches_streaming_fuzz():
    """tokenize_html_fast must be event-identical to the streaming
    tokenizer on any str input — same grammar fuzz as the X5 test, plus a
    curated hostile corpus (comment fabrication, rawtext splits,
    unterminated everything)."""
    import random

    from deepseek_ocr_rs_spark.functions.tokenizer import tokenize_html_fast

    hostile = [
        "<p>a</p><!-- x > b->still comment--><p>c</p>",
        "<!-->", "<!--->", "<!-- -->", "<!-- unterminated",
        "<script>var a='</scr'+'ipt>';</script><p>x</p>",
        "<script>no close", "<style>b{}</STYLE><p>y</p>",
        "<SCRIPT/><p>z</p>", "<p>tail<", "<p>tail<div",
        "&eacute; &Ouml; &frac12; &bogus; &#x41; &#65;",
        "<script>s</script", "<script>s</scriptx>more",
        "<script>x</script  extra>tail</p>",
        "", "<", ">", "<>", "< >", "</>", "<!>",
        "<div title='a>b'>t</div>",
    ]
    for doc in hostile:
        base = tokenize_html(doc)
        assert tokenize_html_fast(doc) == base, doc
        assert tokenize_html(doc, chunk_size=3) == base, doc

    rng = random.Random(0xFA57)
    frags = [
        "<p>", "</p>", "<div>", "</div>", "<a href=\"x&y\">", "</a>",
        "<br>", "<br/>", "<!--", "-->", "--", "-", ">", "<", "&amp;",
        "&eacute;", "&#x41;", "&bogus;", "&", ";", "<script>", "</script>",
        "<style>", "</style>", "<STYLE>", "</StYlE>", "<td>", "<tr>",
        "</tr>", "text ", "é", "日", "\U0001F600", "\n", "<!", "<h1>",
        "</h1>", "<p attr='v>w'>",
    ]
    for trial in range(300):
        doc = "".join(rng.choice(frags) for _ in range(rng.randint(1, 40)))
        assert tokenize_html_fast(doc) == tokenize_html(doc), (trial, doc)


def test_fused_builder_matches_streaming_fuzz():
    """build_blocks_fast (fused scan -> Block array) must produce the same
    blocks as folding the chunked streaming event stream."""
    import random

    from deepseek_ocr_rs_spark.functions.dom import (
        build_blocks,
        build_blocks_fast,
    )

    rng = random.Random(0xB10C)
    frags = [
        "<p>", "</p>", "<div>", "</div>", "<nav>", "</nav>", "<a href='u'>",
        "</a>", "<br>", "<!--", "-->", "<script>", "</script>", "<td>",
        "</td>", "<tr>", "</tr>", "<table>", "</table>", "<ul>", "<li>",
        "</li>", "</ul>", "<h2>", "</h2>", "word ", "é日\U0001F600",
        "&amp;", "&eacute;", "\r\n", "<pre>", "</pre>", "<b>", "</b>",
    ]
    for trial in range(300):
        doc = "".join(rng.choice(frags) for _ in range(rng.randint(1, 50)))
        expected = build_blocks(tokenize_html(doc, chunk_size=7))
        assert build_blocks_fast(doc) == expected, (trial, doc)


def test_extract_payload_fast_default_matches_streaming():
    """chunk_bytes=0 (default, fused fast path) == any streaming chunking
    through the whole kernel, including table/link/drop features."""
    html = ("<html><head><title>t</title></head><body><nav>menu</nav>"
            "<h1>Tïtle 🙂</h1><p>body &amp; <a href='u'>link 日本語</a></p>"
            "<table><tr><td>a</td><td>b&eacute;</td></tr></table>"
            "<script>drop()</script><pre>  code  </pre></body></html>")
    fast = extract_payload(html)  # default: fused fast path
    for cb in (1, 3, 7, 4096):
        assert extract_payload(html, chunk_bytes=cb) == fast
    assert "a | bé" in fast["text_plain"]  # cells joined, entity decoded
    assert "menu" not in fast["text_plain"]  # nav subtree dropped
    assert "drop()" not in fast["text_plain"]  # script body dropped
