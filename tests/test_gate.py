"""Unit tests for the adaptive-routing gate (pure-Python oracle).

Vectors mirror the reference's inline tests
(``/root/reference/crates/riptide-reliability/src/gate.rs:248-325``) plus
feature-extraction checks against ``pipeline.rs:769-841`` semantics.
"""

from __future__ import annotations

from riptide_spark.functions.gate import (
    GateFeatures,
    analyze_content,
    decide,
    domain_prior,
    is_pdf,
    route,
    score,
    script_bytes_of,
)


def test_score_simple_article():
    # gate.rs:253-268
    features = GateFeatures(
        html_bytes=10000,
        visible_text_chars=5000,
        p_count=10,
        article_count=1,
        h1h2_count=3,
        script_bytes=500,
        has_og=True,
        has_jsonld_article=True,
        spa_markers=0,
        domain_prior=0.7,
    )
    assert score(features) > 0.5


def test_decide_spa_headless():
    # gate.rs:271-285
    features = GateFeatures(
        html_bytes=10000,
        visible_text_chars=500,
        p_count=2,
        article_count=0,
        h1h2_count=1,
        script_bytes=8000,
        has_og=False,
        has_jsonld_article=False,
        spa_markers=3,
        domain_prior=0.5,
    )
    assert decide(features, 0.7, 0.3) == "headless"


def test_decide_thresholds():
    base = dict(
        html_bytes=10000,
        visible_text_chars=9000,
        p_count=30,
        article_count=1,
        h1h2_count=3,
        script_bytes=0,
        has_og=True,
        has_jsonld_article=True,
        spa_markers=0,
        domain_prior=0.9,
    )
    assert decide(GateFeatures(**base)) == "raw"
    mid = dict(base, visible_text_chars=2500, p_count=2, article_count=0,
               has_og=False, has_jsonld_article=False, domain_prior=0.5)
    assert decide(GateFeatures(**mid)) == "probes_first"
    low = dict(mid, visible_text_chars=300, script_bytes=6000)
    assert decide(GateFeatures(**low)) == "headless"


def test_script_bytes_matches_reference_semantics():
    html = b'<html><script src="x">var a=1;</script><p>hi</p><script>tail'
    # First segment: ' src="x">var a=1;' + '</script>' -> find gives index of
    # "</script>"; contribution end+9. Second: unterminated -> len(part)
    # (note the '>' of the opening tag stays in the split segment).
    part1 = b' src="x">var a=1;'
    part2 = b'>tail'
    assert script_bytes_of(html) == len(part1) + 9 + len(part2)
    assert script_bytes_of(b"no scripts here") == 0


def test_analyze_content_counts():
    html = (
        '<html><body><p>a</p><p>b</p><pre>x</pre><article>c</article>'
        '<main>d</main><h1>t</h1><h2>s</h2><h2>u</h2></body></html>'
    )
    f = analyze_content(html, "https://example.com/x")
    # "<p" matches <p>, <p>, <pre> — substring semantics, pinned.
    assert f.p_count == 3
    assert f.article_count == 2
    assert f.h1h2_count == 3
    assert f.html_bytes == len(html.encode())
    assert f.spa_markers == 0
    assert f.domain_prior == 0.5


def test_spa_markers():
    html = (
        "<html><body>"
        + '<script>window.__NEXT_DATA__={}</script>'
        + '<div id="root" data-reactroot></div>'
        + "<div></div>" * 25
        + "</body></html>"
    )
    f = analyze_content(html, "https://app.example.com/")
    assert f.spa_markers >= 3
    assert decide(f) == "headless"


def test_domain_priors():
    assert domain_prior("https://en.wikipedia.org/wiki/X") == 0.9
    assert domain_prior("https://github.com/foo/bar") == 0.9
    assert domain_prior("https://medium.com/@x/y") == 0.8
    assert domain_prior("https://dev.to/x") == 0.8
    assert domain_prior("https://example.com/") == 0.5


def test_pdf_bypass():
    assert is_pdf("https://example.com/doc.pdf", b"<html")
    assert is_pdf("https://example.com/doc.PDF", b"<html")
    assert is_pdf("https://example.com/doc", b"%PDF-1.7")
    assert not is_pdf("https://example.com/pdf-viewer", b"<html")
    assert route("x", "https://example.com/doc.pdf") == "pdf"


def test_visible_text_chars_excludes_control():
    f = analyze_content("ab\ncd\te", "https://example.com/")
    # \n and \t are Cc controls.
    assert f.visible_text_chars == 5
