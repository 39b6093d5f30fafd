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
