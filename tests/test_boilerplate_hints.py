"""Class/id boilerplate hints (Readability unlikelyCandidates analog).

A plain div/span/p whose class or id names it as chrome (sidebar, share,
cookie, ad, ...) is dropped with its whole subtree — no tag, link-density,
or length rule involved.  Spark-free pins over functions/dom.py.
"""
from deepseek_ocr_rs_spark.functions.dom import (
    _BOILER_HINT_RE,
    build_blocks,
    build_blocks_fast,
)
from deepseek_ocr_rs_spark.functions.tokenizer import HtmlTokenizer


def _texts(html):
    return [b.text for b in build_blocks_fast(html)
            if not b.in_drop_subtree]


def test_hinted_subtrees_drop_and_siblings_stay():
    h = ('<body><div class="sidebar"><p>junk links</p></div>'
         '<div class="main"><p>real content here</p></div>'
         '<span id="share-bar">share me</span><p>tail text</p></body>')
    assert _texts(h) == ["real content here", "tail text"]


def test_hinted_leaf_and_void_and_nested():
    h = ('<p class="comment">drop me</p><img class="ad">'
         '<div class="related"><div class="promo"><p>x</p></div><p>y</p>'
         '</div><p>keep</p>')
    assert _texts(h) == ["keep"]


def test_malformed_close_releases_hint_level():
    # the stray outer </div> pops through the hinted div; the drop level
    # must release with it or 'ok' would be silently swallowed
    h = '<div><div class="cookie-banner"><p>gdpr</p></div><p>ok</p>'
    assert _texts(h) == ["ok"]


def test_content_class_names_never_match():
    h = '<div class="main grid container article-body"><p>content stays</p></div>'
    assert _texts(h) == ["content stays"]
    for ok in ["main", "grid", "content", "article", "post-body", "entry"]:
        assert not _BOILER_HINT_RE.search(ok), ok


def test_hint_words_match_with_wordish_boundaries():
    for bad in ["sidebar", "left-sidebar", "share_buttons", "ad",
                "ads top", "cookie-consent", "NAV", "social share",
                "comments-section", "newsletter signup"]:
        assert _BOILER_HINT_RE.search(bad), bad
    # substrings inside larger words must NOT fire
    for ok in ["badge", "download", "gradient", "roadshow", "menubar-x"[:0]]:
        if ok:
            assert not _BOILER_HINT_RE.search(ok), ok


def test_streaming_chunking_invariance_with_attrs():
    h = ('<body><div class="sidebar"><p>junk</p></div>'
         '<div class="content"><p>real émigré text</p></div>'
         '<p id="cookie-notice">cookies</p><p>tail</p></body>')
    want = [(b.tag, b.text, b.in_drop_subtree) for b in build_blocks_fast(h)]
    data = h.encode()
    for size in (1, 3, 7, 16):
        tok = HtmlTokenizer()
        evs = []
        for i in range(0, len(data), size):
            evs.extend(tok.feed(data[i:i + size]))
        evs.extend(tok.finish())
        got = [(b.tag, b.text, b.in_drop_subtree) for b in build_blocks(evs)]
        assert got == want, size


def test_generator_fixtures_agree_with_extractor():
    import numpy as np
    from deepseek_ocr_rs_spark.functions.extract_core import extract_payload
    from deepseek_ocr_rs_spark.functions.markdown import render_blocks
    from deepseek_ocr_rs_spark.sources.transcripts import _gen_html_payload

    for seed in range(300):
        rng = np.random.default_rng(seed)
        payload, expected = _gen_html_payload(rng)
        want_md = render_blocks(expected)[0]
        got = extract_payload(payload)
        assert got["text_md"] == want_md, seed
