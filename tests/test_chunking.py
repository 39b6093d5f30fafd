"""Sliding-window chunker tests (port of chunking semantics).

Mirrors ``/root/reference/crates/riptide-extraction/src/chunking/sliding.rs:208-245``
and the 50 KB / 200 ms performance contract (``chunking/mod.rs:9,388-412``).
"""

from __future__ import annotations

import time

from riptide_spark.functions.chunking import (
    count_tokens,
    sliding_window_chunks,
    spans_for_text,
    split_sentences,
)


def test_empty_content():
    assert sliding_window_chunks("") == []
    assert spans_for_text("") == []


def test_basic_chunking():
    text = (
        "This is the first sentence. This is the second sentence. "
        "This is the third sentence. This is the fourth sentence."
    )
    chunks = sliding_window_chunks(text, 100, 20)
    assert chunks
    assert chunks[0].chunk_index == 0
    assert all(c.total_chunks == len(chunks) for c in chunks)


def test_window_splits_and_overlap():
    sentence = "The quick brown fox jumps over the lazy dog tonight."  # 10 words
    text = " ".join([sentence] * 40)  # ~400 words ≈ 520 tokens
    chunks = sliding_window_chunks(text, window_size=100, overlap=20)
    assert len(chunks) > 1
    indices = [c.chunk_index for c in chunks]
    assert indices == list(range(len(chunks)))
    for c in chunks:
        assert c.end_pos - c.start_pos == len(c.content.encode("utf-8"))
    # Overlap: successive chunks share the trailing sentence.
    assert chunks[1].content.startswith(sentence)


def test_token_approximation():
    assert count_tokens("one two three four") == int(4 * 1.3)


def test_sentence_splitting_abbreviations():
    text = "Dr. Smith arrived at the lab. He was with Mrs. Jones all day. OK."
    sentences = split_sentences(text)
    # "Dr." and "Mrs." do not end sentences; "OK." is < 3 words → dropped.
    assert sentences == [
        "Dr. Smith arrived at the lab.",
        "He was with Mrs. Jones all day.",
    ]


def test_short_sentences_filtered():
    assert split_sentences("No. Yes. Maybe not here.") == ["Maybe not here."]


def test_50kb_under_200ms():
    # chunking/mod.rs:9 hard perf gate.
    text = ("Lorem ipsum dolor sit amet, consectetur adipiscing elit sed. " * 860)[:50_000]
    start = time.perf_counter()
    chunks = sliding_window_chunks(text)
    elapsed = time.perf_counter() - start
    assert chunks
    assert elapsed < 0.2, f"50KB chunking took {elapsed*1000:.0f}ms (budget 200ms)"


# --- additional strategies (fixed / sentence / regex / html-aware) ---------

from riptide_spark.functions.chunking import (  # noqa: E402
    chunk_text,
    fixed_chunks,
    html_aware_chunks,
    regex_chunks,
    sentence_chunks,
)


def test_fixed_chunks_by_chars():
    text = ("alpha beta gamma delta. " * 40).strip()
    chunks = fixed_chunks(text, 200, by_tokens=False)
    assert len(chunks) > 1
    assert all(c.total_chunks == len(chunks) for c in chunks)
    # Sentence preservation: every non-final chunk ends at a boundary.
    assert all(c.content.rstrip().endswith(".") for c in chunks[:-1])
    # Reassembles (modulo skipped whitespace).
    assert "".join(c.content for c in chunks).replace(" ", "") == text.replace(" ", "")


def test_fixed_chunks_by_tokens_progress():
    text = "word " * 500
    chunks = fixed_chunks(text, 50, by_tokens=True)
    assert len(chunks) > 2
    assert all(chunks[i].start_pos < chunks[i + 1].start_pos for i in range(len(chunks) - 1))


def test_sentence_chunks_budget():
    text = " ".join(f"This is sentence number {i} ok." for i in range(12))
    chunks = sentence_chunks(text, max_sentences=4)
    assert len(chunks) == 3
    for c in chunks:
        assert c.content.count(".") == 4


def test_regex_chunks_paragraphs():
    paragraphs = [f"Paragraph {i} with enough text to pass the minimum size gate." for i in range(5)]
    text = "\n\n".join(paragraphs)
    chunks = regex_chunks(text, min_chunk_size=10)
    assert len(chunks) == 5
    assert [c.chunk_index for c in chunks] == list(range(5))
    # No pattern match → single chunk.
    assert len(regex_chunks("single block", min_chunk_size=10)) == 1
    # Small splits merge forward.
    merged = regex_chunks("a\n\nb\n\nc", min_chunk_size=100)
    assert len(merged) == 1 and merged[0].content == "a\n\nb\n\nc"


def test_html_aware_chunks_block_boundaries():
    html = (
        "<html><body><article>"
        + "".join(f"<p>{'block text ' * 30}end{i}.</p>" for i in range(10))
        + "</article></body></html>"
    )
    chunks = html_aware_chunks(html, max_tokens=100)
    assert len(chunks) > 1
    # Never splits inside a block: each chunk holds whole paragraphs.
    for c in chunks:
        assert c.content.startswith("block text")
        assert c.content.rstrip().endswith((".",))


def test_chunk_text_factory():
    text = "One sentence here ok. Another sentence follows fine. Third one to finish up."
    assert chunk_text(text, "sliding")
    assert chunk_text(text, "fixed", size=5)
    assert chunk_text(text, "sentence", max_sentences=1)
    assert chunk_text(text, "regex", pattern=r"\. ")
    assert chunk_text("<html><body><p>%s</p></body></html>" % text, "html_aware")
    # Topic disabled → sliding(1000,100) fallback (mod.rs:190-196).
    assert chunk_text(text, "topic", topic_chunking=False) == chunk_text(text, "sliding")
    # Unknown strategy → sliding fallback.
    assert chunk_text(text, "nope") == chunk_text(text, "sliding")


# ---------------------------------------------------------------------------
# Topic (TextTiling) chunker — mirrors topic.rs:801-958 inline tests.
# ---------------------------------------------------------------------------

from riptide_spark.functions.topic_chunking import (  # noqa: E402
    calculate_depth_scores,
    extract_vocabulary,
    identify_boundaries,
    smooth_scores,
    tokenize_pseudo_sentences,
    topic_chunks,
    topic_quality_score,
)
from riptide_spark.functions.topic_chunking import (  # noqa: E402
    _cosine_similarity,
)


def test_topic_chunking_basic():
    # topic.rs:806-826
    text = (
        "Introduction to machine learning. Machine learning is a subset of "
        "artificial intelligence. It focuses on algorithms that learn from data. "
        "Deep learning is a special case. Deep learning uses neural networks "
        "with many layers. These networks can learn complex patterns. "
        "Natural language processing is another field. NLP deals with text and "
        "speech. It helps computers understand human language."
    )
    chunks = topic_chunks(text, window_size=3, smoothing_passes=2)
    assert chunks
    for c in chunks:
        assert c.content
        assert c.end_pos - c.start_pos == len(c.content.encode("utf-8"))
    assert [c.chunk_index for c in chunks] == list(range(len(chunks)))
    assert all(c.total_chunks == len(chunks) for c in chunks)


def test_topic_short_text_single_chunk():
    # topic.rs:828-839 — fewer sentences than 2*window_size → one chunk.
    chunks = topic_chunks("Short text.", window_size=5, smoothing_passes=2)
    assert len(chunks) == 1
    assert chunks[0].content == "Short text."


def test_topic_performance_50kb():
    # topic.rs:841-884 — 50 KB topic-diverse text in <200 ms, non-empty chunks.
    topics = [
        "Machine learning algorithms and artificial intelligence systems",
        "Climate change effects on global weather patterns and ecosystems",
        "Economic policies and their impact on international trade relations",
        "Advances in quantum computing and cryptographic security measures",
        "Social media influence on modern communication and society",
    ]
    text = ""
    while len(text) < 50_000:
        for topic in topics:
            text += (
                f"{topic}. This topic involves many complex concepts and ideas. "
                "Research in this area has shown significant progress. "
                "Scientists and experts continue to explore new possibilities. "
                "The implications of these developments are far-reaching. "
            )
    start = time.monotonic()
    chunks = topic_chunks(text, window_size=3, smoothing_passes=2)
    elapsed_ms = (time.monotonic() - start) * 1000
    assert chunks
    assert elapsed_ms < 200, f"topic chunking took {elapsed_ms:.0f}ms (target <200ms)"


def test_topic_vocabulary_extraction():
    # topic.rs:886-898
    vocab = extract_vocabulary("Machine learning algorithms process data efficiently")
    assert "machine" in vocab
    assert "learning" in vocab
    assert "algorithms" in vocab
    assert "the" not in vocab


def test_topic_cosine_similarity_ordering():
    # topic.rs:900-917
    v1 = extract_vocabulary("machine learning algorithms")
    v2 = extract_vocabulary("machine learning systems")
    v3 = extract_vocabulary("weather climate patterns")
    assert _cosine_similarity(v1, v2) > _cosine_similarity(v1, v3)
    assert _cosine_similarity(v1, v2) > 0.0


def test_topic_depth_scores_shape_and_boundaries():
    # topic.rs:919-957 — window_size=2, 8 sentences → 4 depth scores.
    sentences = [
        "Machine learning is complex technology.",
        "Algorithms process data efficiently using computational methods.",
        "Neural networks learn patterns from training data sets.",
        "Deep learning uses multiple layers for feature extraction.",
        "Climate change affects weather patterns around the world.",
        "Global warming increases temperatures causing environmental shifts.",
        "Environmental policies are important for sustainable development.",
        "Green energy solutions reduce carbon emissions significantly.",
    ]
    scores = calculate_depth_scores(sentences, window_size=2)
    assert len(scores) == len(sentences) - 2 * 2
    smoothed = smooth_scores(scores, passes=1)
    assert len(smoothed) == len(scores)
    boundaries = identify_boundaries(smoothed, sentences, window_size=2)
    for b in boundaries:
        assert b < len(sentences)


def test_topic_pseudo_sentences_cap_20_words():
    # topic.rs:101-111 — unpunctuated streams break every 20 words.
    text = " ".join(["word"] * 45)
    sentences = tokenize_pseudo_sentences(text)
    assert [len(s.split()) for s in sentences] == [20, 20, 5]


def test_topic_quality_score_bounds():
    # topic.rs:654-675
    kw = ["machine", "learning"]
    content = (
        "Machine learning is great technology today. It learns from data "
        "quickly and well. Models improve with more data over time."
    )
    score = topic_quality_score(content, kw)
    assert 0.5 < score <= 1.0
    assert topic_quality_score("x", []) >= 0.5


def test_topic_deterministic():
    # Determinism contract (our deviation note): same text → same chunks.
    text = (
        "Machine learning is a field of study. It uses data to learn patterns. "
        "Algorithms improve with experience over time. "
    ) * 10 + (
        "Climate change is a global challenge. Temperatures rise every decade "
        "now. Policies must adapt to the changing environment. "
    ) * 10
    a = topic_chunks(text)
    b = topic_chunks(text)
    assert [(c.start_pos, c.end_pos, c.content) for c in a] == [
        (c.start_pos, c.end_pos, c.content) for c in b
    ]
