"""Sliding-window text chunking → the ``spans`` output column.

Faithful port of the reference's default chunker
(``/root/reference/crates/riptide-extraction/src/chunking/sliding.rs:27-198``
with utilities from ``chunking/mod.rs:202-352``), defaults window=1000 tokens
/ overlap=100 (``chunking/mod.rs:97-108,195``).

Pinned conventions: token_count ≈ ``int(words * 1.3)``; ``start_pos``/
``end_pos`` are the reference's *running* byte positions over the re-joined
sentence stream (sentences joined by single spaces), exactly as the Rust code
computes them — they are chunk-local lineage, not offsets into the original
text (the original interleaves arbitrary whitespace the chunker collapses).

Per-document pure function; runs inside the extraction pandas UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_WINDOW = 1000
DEFAULT_OVERLAP = 100

_ABBREVIATIONS = frozenset(
    {
        "mr.", "mrs.", "ms.", "dr.", "prof.", "sr.", "jr.", "inc.", "ltd.",
        "corp.", "co.", "etc.", "vs.", "vol.", "no.", "pp.", "fig.", "ch.",
        "sec.", "dept.", "govt.", "u.s.", "u.k.", "e.g.", "i.e.", "a.m.", "p.m.",
    }
)  # chunking/mod.rs:343-347


@dataclass
class Span:
    start_pos: int
    end_pos: int
    chunk_index: int
    total_chunks: int
    token_count: int
    content: str


def count_tokens(text: str) -> int:
    """Word-based approximation (chunking/mod.rs:209-213)."""
    return int(len(text.split()) * 1.3)


def _is_abbreviation(word: str) -> bool:
    lower = word.lower()
    if lower in _ABBREVIATIONS:
        return True
    return len(word) <= 4 and sum(1 for c in word if c.isupper()) > 1


def split_sentences(text: str) -> list[str]:
    """Whitespace-stream sentence splitter (chunking/mod.rs:311-339):
    sentence ends at a word ending in .!? that is not an abbreviation;
    sentences with fewer than 3 words are dropped."""
    sentences: list[str] = []
    current: list[str] = []
    for word in text.split():
        current.append(word)
        if word.endswith((".", "!", "?")) and not _is_abbreviation(word):
            sentences.append(" ".join(current))
            current = []
    if current:
        remainder = " ".join(current)
        if remainder:
            sentences.append(remainder)
    return [s for s in sentences if len(s.split()) >= 3]


def _byte_len(s: str) -> int:
    return len(s.encode("utf-8"))


def _calculate_overlap(sentences: list[str], overlap_tokens: int) -> str:
    if not sentences or overlap_tokens == 0:
        return ""
    overlap = ""
    used = 0
    for sentence in reversed(sentences):
        tokens = count_tokens(sentence)
        if used + tokens <= overlap_tokens:
            overlap = f"{sentence} {overlap}" if overlap else sentence
            used += tokens
        else:
            break
    return overlap


def sliding_window_chunks(
    text: str,
    window_size: int = DEFAULT_WINDOW,
    overlap: int = DEFAULT_OVERLAP,
    preserve_sentences: bool = True,
) -> list[Span]:
    if not text:
        return []

    sentences = split_sentences(text) if preserve_sentences else text.split()

    chunks: list[Span] = []
    current = ""
    current_tokens = 0
    start_pos = 0
    chunk_index = 0
    sentence_buffer: list[str] = []

    for sentence in sentences:
        sentence_tokens = count_tokens(sentence)

        if current_tokens + sentence_tokens > window_size and current:
            chunks.append(
                Span(
                    start_pos=start_pos,
                    end_pos=start_pos + _byte_len(current),
                    chunk_index=chunk_index,
                    total_chunks=0,
                    token_count=current_tokens,
                    content=current,
                )
            )
            overlap_content = _calculate_overlap(sentence_buffer, overlap) if overlap else ""
            last_len = _byte_len(chunks[-1].content)
            if overlap_content:
                start_pos = start_pos + last_len - _byte_len(overlap_content)
            else:
                start_pos = start_pos + last_len
            current = overlap_content
            current_tokens = count_tokens(current)
            chunk_index += 1
            sentence_buffer = [overlap_content] if overlap_content else []

        if current:
            current += " "
        current += sentence
        current_tokens += sentence_tokens
        sentence_buffer.append(sentence)

    if current:
        chunks.append(
            Span(
                start_pos=start_pos,
                end_pos=start_pos + _byte_len(current),
                chunk_index=chunk_index,
                total_chunks=0,
                token_count=current_tokens,
                content=current,
            )
        )

    total = len(chunks)
    for chunk in chunks:
        chunk.total_chunks = total
    return chunks


def spans_for_text(
    text: str, window_size: int = DEFAULT_WINDOW, overlap: int = DEFAULT_OVERLAP
) -> list[dict]:
    """Rows for the ``spans`` array column (FIXTURES.md §2 schema)."""
    return [
        {
            "start_pos": c.start_pos,
            "end_pos": c.end_pos,
            "chunk_index": c.chunk_index,
            "total_chunks": c.total_chunks,
            "token_count": c.token_count,
        }
        for c in sliding_window_chunks(text, window_size, overlap)
    ]
