"""Property-based robustness tests (hypothesis).

At 10^12 documents every weird input occurs; the engine's contract is that
per-row operators never raise (errors become error rows) and chunkers
maintain their span invariants on arbitrary text. These generators explore
the input space far beyond the fixture corpus.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# Bounded sizes keep each case fast; hypothesis shrinks failures.
_TEXT = st.text(max_size=2000)
_WORDY = st.lists(
    st.text(alphabet=st.characters(categories=("L", "N", "P")), min_size=1, max_size=12),
    max_size=300,
).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(_WORDY)
def test_sliding_chunker_invariants(text):
    from riptide_spark.functions.chunking import sliding_window_chunks

    spans = sliding_window_chunks(text, window_size=50, overlap=10)
    for i, s in enumerate(spans):
        assert s.chunk_index == i
        assert s.total_chunks == len(spans)
        assert s.start_pos < s.end_pos or s.content == ""
        assert s.end_pos - s.start_pos == len(s.content.encode("utf-8"))
        assert s.token_count >= 0
    # Successive spans never move backwards (overlap may rewind start but
    # not past the previous start).
    for a, b in zip(spans, spans[1:]):
        assert b.start_pos >= a.start_pos


@settings(max_examples=40, deadline=None)
@given(_WORDY, st.sampled_from(["sliding", "fixed", "sentence", "regex", "topic"]))
def test_every_strategy_total_and_deterministic(text, strategy):
    from riptide_spark.functions.chunking import chunk_text

    a = chunk_text(text, strategy)
    b = chunk_text(text, strategy)
    assert [(s.start_pos, s.end_pos, s.content) for s in a] == [
        (s.start_pos, s.end_pos, s.content) for s in b
    ]
    for s in a:
        assert s.token_count >= 0
        assert s.total_chunks == len(a)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=4096))
def test_extract_one_never_raises_on_bytes(data):
    from riptide_spark.operators.extract_udf import _extract_one

    row = _extract_one(data, "https://x.example.com/p", "article")
    # Contract: a dict row with either content or an error string — never
    # an exception (one bad row must not kill a task).
    assert isinstance(row, dict)
    assert "error" in row


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=200), st.text(max_size=200))
def test_resolve_url_total(base, href):
    from riptide_spark.html.urls import resolve_url

    out = resolve_url(base, href)
    # Either None or an absolute URL; http(s) results are normalized
    # (lowercase host, default port stripped), non-special schemes pass
    # through like Url::join (mailto:, data:, ...).
    if out is not None:
        assert ":" in out
        if out.startswith(("http://", "https://")):
            from riptide_spark.html.urls import host_of
            h = host_of(out)
            assert h is not None and h == h.lower()


@settings(max_examples=40, deadline=None)
@given(_TEXT)
def test_language_detection_total(text):
    from riptide_spark.functions.langid import detect_language_statistical

    out = detect_language_statistical(text)
    assert out is None or (isinstance(out, str) and 2 <= len(out) <= 3)


@settings(max_examples=40, deadline=None)
@given(_WORDY)
def test_topic_keywords_bounded(text):
    from riptide_spark.functions.chunking import extract_topic_keywords

    kws = extract_topic_keywords(text)
    assert len(kws) <= 5
    assert all(k and k == k.lower() for k in kws)
    assert kws == extract_topic_keywords(text)
