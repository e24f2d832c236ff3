"""HTML main-content extraction: tokenizer, boilerplate classifier,
fixture goldens, fuzz totality, and the unified Ray pipeline path."""

from __future__ import annotations

import random

import pytest

from pdf_ray.fixtures.htmlcorpus import HTML_FIXTURES, build_html_corpus
from pdf_ray.htmlcore import extract_main_content
from pdf_ray.htmlcore.tokenizer import tokenize


# ---------------------------------------------------------------- tokenizer

def test_tokenizer_basic_tags_and_attrs():
    toks = list(tokenize(b'<div CLASS="Main" id=one data-x>hi</div>'))
    assert toks == [
        ("start", "div", {"class": "Main", "id": "one", "data-x": ""}, False),
        ("text", "hi"),
        ("end", "div"),
    ]


def test_tokenizer_entities_and_stray_lt():
    toks = list(tokenize(b"a &amp; b < c &#233;"))
    assert toks == [("text", "a & b < c \xe9")]


def test_tokenizer_rawtext_script_not_parsed():
    toks = list(tokenize(b"<script>if(a<b){x='</div>'}</script>t"))
    assert toks == [
        ("start", "script", {}, False),
        ("text", "if(a<b){x='</div>'}"),
        ("end", "script"),
        ("text", "t"),
    ]


def test_tokenizer_rcdata_decodes_entities():
    toks = list(tokenize(b"<title>&lt;p&gt; raw</title>"))
    assert toks[1] == ("text", "<p> raw")


def test_tokenizer_comment_cdata_doctype_silent():
    toks = list(tokenize(b"<!DOCTYPE html><!-- <p>x</p> --><![CDATA[y]]>z"))
    assert toks == [("text", "z")]


def test_tokenizer_self_closing_and_quoted_gt():
    toks = list(tokenize(b'<a href=foo baz="q>u"/>t'))
    assert toks == [
        ("start", "a", {"href": "foo", "baz": "q>u"}, True),
        ("text", "t"),
    ]


def test_tokenizer_unterminated_and_binary_total():
    assert list(tokenize(b"<a href=")) == []
    assert list(tokenize(b"tail<")) == [("text", "tail<")]
    out = list(tokenize(b"\x00\xff\xfebin<\xc3\xa9junk"))
    assert all(t[0] == "text" for t in out)


def test_tokenizer_duplicate_attr_first_wins():
    toks = list(tokenize(b"<p id=a id=b>x"))
    assert toks[0][2] == {"id": "a"}


# ------------------------------------------------------------- classifier

@pytest.mark.parametrize("name", sorted(HTML_FIXTURES))
def test_fixture_golden(name):
    """Every fixture's output equals its HAND-WRITTEN golden literal."""
    html, spans, title, n_kept, n_dropped = HTML_FIXTURES[name]
    r = extract_main_content(html)
    assert [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]] == spans
    assert [s["order"] for s in r["spans"]] == list(range(len(spans)))
    assert r["title"] == title
    assert r["n_kept"] == n_kept
    assert r["n_dropped"] == n_dropped


def test_article_mode_beats_density():
    # a 3-word positive block wins over a 40-word unmarked block
    html = (b"<article><p>Short author note.</p></article>"
            b"<div>" + b"filler word salad " * 10 + b"</div>")
    r = extract_main_content(html)
    assert [s["text"] for s in r["spans"]] == ["Short author note."]


def test_link_density_integer_boundary():
    # exactly 1/3 link words is NOT dense (3*lw > w strict)
    html = b'<article><p><a href=x>one two</a> three four five six</p></article>'
    r = extract_main_content(html)
    assert len(r["spans"]) == 1
    html2 = b'<article><p><a href=x>one two three</a> four five six</p></article>'
    r2 = extract_main_content(html2)
    assert len(r2["spans"]) == 0  # 3*3 > 6 -> dense (article has no other block)


def test_img_inside_link_skipped_and_alt_carried():
    html = (b"<main><p>Ten solid words of body text keep this page alive.</p>"
            b'<a href=u><img src="x.png"></a><img src="y.png" alt="kept"></main>')
    r = extract_main_content(html)
    imgs = [s for s in r["spans"] if s["kind"] == "image"]
    assert [(i["media_ref"], i["text"]) for i in imgs] == [("y.png", "kept")]


def test_nested_neg_marker_drops_subtree():
    html = (b'<article><p>Real body text here.</p>'
            b'<div class="related"><p>Ad-like nested prose that is long '
            b'enough to pass word count.</p></div></article>')
    r = extract_main_content(html)
    assert [s["text"] for s in r["spans"]] == ["Real body text here."]


def test_totality_fuzz():
    rng = random.Random(7)
    for _ in range(1500):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(300)))
        extract_main_content(data)
    page = HTML_FIXTURES["h01"][0]
    for _ in range(800):
        b = bytearray(page)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        extract_main_content(bytes(b))
    for _ in range(400):
        extract_main_content(page[: rng.randrange(len(page))])


def test_determinism():
    for name, (html, *_rest) in HTML_FIXTURES.items():
        assert extract_main_content(html) == extract_main_content(html)


# ---------------------------------------------------------------- pipeline

def test_unified_pipeline_matches_golden(ray_session):
    """The actor-pool pipeline (ExtractStage html:// dispatch) reproduces
    the hand-written golden spans for every doc, including mixed docs."""
    import ray
    import ray.data as rd

    from pdf_ray.pipelines.extract import extract_dataset

    docs, payloads, golden, summary = build_html_corpus(replicas=2)
    out = extract_dataset(
        rd.from_arrow(docs),
        ray.put(dict(zip(payloads.column("media_ref").to_pylist(),
                         payloads.column("bytes").to_pylist()))),
        concurrency=2,
    ).to_pandas().set_index("doc_id").sort_index()
    exp = golden.to_pandas().set_index("doc_id").sort_index()
    assert list(out.index) == list(exp.index)
    assert (out["status"] == "ok").all()
    assert out["n_spans"].tolist() == exp["n_spans"].tolist()
    for did in exp.index:
        got = [(s["kind"], s["text"], s["media_ref"], s["order"])
               for s in out.loc[did, "spans"]]
        want = [(s["kind"], s["text"], s["media_ref"], s["order"])
                for s in exp.loc[did, "spans"]]
        assert got == want, did
