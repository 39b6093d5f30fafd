"""Topic-based (TextTiling) chunking strategy.

Port of the reference's TopicChunker
(``/root/reference/crates/riptide-extraction/src/chunking/topic.rs:27-798``):
pseudo-sentence tokenization, per-boundary lexical-coherence depth scores
(0.6*cosine + 0.25*Jaccard + 0.15*symmetric-KL similarity of block
vocabularies, ``topic.rs:196-219``), 3-point moving-average smoothing
(``topic.rs:376-395``), hysteresis valley detection with prominence filtering
(``topic.rs:398-474``), close-boundary and min-chunk-size filters, and chunk
assembly with running char positions (``topic.rs:583-651``).

One deliberate deviation: the reference aborts to the sliding fallback when
*wall-clock* checkpoints exceed 180 ms (``topic.rs:702-729``). Wall-clock
routing is nondeterministic — the same document could chunk differently on a
loaded executor — so we keep only the deterministic size guards (>150 KB →
sliding fallback, ``topic.rs:688-697``; >100 KB → simplified tokenizer,
``topic.rs:76-90``). Output is therefore a pure function of the text, which
a distributed, retry-prone engine requires (a retried task must reproduce
the same rows).

Per-document pure function; runs inside the extraction pandas UDF.
"""

from __future__ import annotations

import math

from .chunking import (
    Span,
    count_tokens,
    extract_topic_keywords,
    sliding_window_chunks,
    split_sentences,
)

DEFAULT_WINDOW_SIZE = 3  # sentences per block (factory callers pass theirs)
DEFAULT_SMOOTHING_PASSES = 2
MIN_CHUNK_CHARS = 100  # ChunkingConfig::default min_chunk_size (mod.rs:104)

_FALLBACK_TEXT_LEN = 150_000  # topic.rs:688
_SIMPLE_TOKENIZE_LEN = 100_000  # topic.rs:76

# topic.rs:179-186 — note this stop list differs from the topic-keyword one
# in chunking/mod.rs; the reference keeps two lists and so do we.
_STOP_WORDS = frozenset(
    "the be to of and a in that have i it for not on with he as you do at "
    "this but his by from they we say her she or an will my one all would "
    "there their what so up out if about who get which go was is are been "
    "were had has can could should may might must shall did".split()
)


def tokenize_pseudo_sentences(text: str) -> list[str]:
    """topic.rs:74-120 — sentence ends on .!?-terminated word or at 20 words.

    Texts over 100 KB use the simplified split-on-terminators path
    (>10 chars and >=3 words per sentence, capped at 500 sentences).
    """
    if len(text.encode("utf-8")) > _SIMPLE_TOKENIZE_LEN:  # Rust str::len is bytes
        out = []
        for part in _split_terminator(text):
            trimmed = part.strip()
            if len(trimmed) > 10 and len(trimmed.split()) >= 3:
                out.append(trimmed)
                if len(out) >= 500:
                    break
        return out

    sentences: list[str] = []
    current: list[str] = []
    word_count = 0
    for word in text.split():
        current.append(word)
        word_count += 1
        if word.endswith((".", "!", "?")) or word_count >= 20:
            joined = " ".join(current)
            if joined.strip():
                sentences.append(joined)
            current = []
            word_count = 0
    if current:
        joined = " ".join(current)
        if joined.strip():
            sentences.append(joined)
    return sentences


def _split_terminator(text: str) -> list[str]:
    """Rust split_terminator on any of .!? — no trailing empty piece."""
    parts: list[str] = []
    buf: list[str] = []
    for ch in text:
        if ch in ".!?":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return parts


def extract_vocabulary(text: str) -> dict[str, int]:
    """topic.rs:123-169 — strip non-alnum edges, lowercase, len>2 after
    cleaning, drop stop words; if >50 distinct terms, drop singletons."""
    vocab: dict[str, int] = {}
    for word in text.split():
        if len(word) <= 2:
            continue
        chars = list(word)
        start = next((i for i, c in enumerate(chars) if c.isalnum()), len(chars))
        end = 0
        for i in range(len(chars) - 1, -1, -1):
            if chars[i].isalnum():
                end = i + 1
                break
        if start >= end or end - start <= 2:
            continue
        cleaned = "".join(chars[start:end]).lower()
        if cleaned not in _STOP_WORDS:
            vocab[cleaned] = vocab.get(cleaned, 0) + 1
    if len(vocab) > 50:
        vocab = {w: c for w, c in vocab.items() if c > 1}
    return vocab


def _cosine_similarity(v1: dict[str, int], v2: dict[str, int]) -> float:
    if not v1 or not v2:
        return 0.0
    small, large = (v1, v2) if len(v1) <= len(v2) else (v2, v1)
    dot = 0.0
    for word, c in small.items():
        c2 = large.get(word)
        if c2 is not None:
            dot += float(c) * float(c2)
    n1 = math.sqrt(sum(float(c) * c for c in v1.values()))
    n2 = math.sqrt(sum(float(c) * c for c in v2.values()))
    if n1 == 0.0 or n2 == 0.0:
        return 0.0
    return dot / (n1 * n2)


def _jaccard_similarity(v1: dict[str, int], v2: dict[str, int]) -> float:
    s1, s2 = set(v1), set(v2)
    union = len(s1 | s2)
    return (len(s1 & s2) / union) if union else 0.0


def _tf_distribution_similarity(v1: dict[str, int], v2: dict[str, int]) -> float:
    """topic.rs:291-325 — exp(−symmetric-KL / common_words) over shared terms."""
    t1 = sum(v1.values())
    t2 = sum(v2.values())
    if t1 == 0 or t2 == 0:
        return 0.0
    kl = 0.0
    common = 0
    for word, c1 in v1.items():
        c2 = v2.get(word)
        if c2 is not None:
            p1 = c1 / t1
            p2 = c2 / t2
            kl += p1 * math.log(p1 / p2) + p2 * math.log(p2 / p1)
            common += 1
    if common == 0:
        return 0.0
    return math.exp(-kl / common)


def coherence_score(v1: dict[str, int], v2: dict[str, int]) -> float:
    """topic.rs:196-219 — 0.6 cosine + 0.25 Jaccard + 0.15 TF-distribution."""
    if not v1 or not v2:
        return 0.0
    return (
        _cosine_similarity(v1, v2) * 0.6
        + _jaccard_similarity(v1, v2) * 0.25
        + _tf_distribution_similarity(v1, v2) * 0.15
    )


def calculate_depth_scores(sentences: list[str], window_size: int) -> list[float]:
    """topic.rs:328-373 — depth = 1 − coherence(left block, right block)."""
    if len(sentences) < window_size * 2:
        return [0.0] * max(len(sentences) - 1, 0)
    vocabs = [extract_vocabulary(s) for s in sentences]
    scores: list[float] = []
    for i in range(window_size, len(sentences) - window_size):
        left: dict[str, int] = {}
        for v in vocabs[i - window_size : i]:
            for w, c in v.items():
                left[w] = left.get(w, 0) + c
        right: dict[str, int] = {}
        for v in vocabs[i : i + window_size]:
            for w, c in v.items():
                right[w] = right.get(w, 0) + c
        scores.append(1.0 - coherence_score(left, right))
    return scores


def smooth_scores(scores: list[float], passes: int) -> list[float]:
    """topic.rs:376-395 — repeated 3-point moving average, ends pinned."""
    if len(scores) < 3:
        return list(scores)
    smoothed = list(scores)
    for _ in range(passes):
        nxt = list(smoothed)
        for i in range(1, len(smoothed) - 1):
            nxt[i] = (smoothed[i - 1] + smoothed[i] + smoothed[i + 1]) / 3.0
        smoothed = nxt
    return smoothed


def _prominence(scores: list[float], peak_idx: int) -> float:
    """topic.rs:477-501 — peak minus min of the 3 neighbors on each side.
    (The Rust left window is skip(peak-3).take(3), i.e. scores[peak-3:peak];
    right is scores[peak+1:peak+4].)"""
    if peak_idx == 0 or peak_idx >= len(scores) - 1:
        return 0.0
    window = 3
    lo = max(peak_idx - window, 0)
    left = scores[lo : lo + window]
    right = scores[peak_idx + 1 : peak_idx + 1 + window]
    left_min = min(left) if left else math.inf
    right_min = min(right) if right else math.inf
    return scores[peak_idx] - min(left_min, right_min)


def identify_boundaries(
    scores: list[float],
    sentences: list[str],
    window_size: int,
    min_chunk_chars: int = MIN_CHUNK_CHARS,
) -> list[int]:
    """topic.rs:398-474 — hysteresis valley detection over the depth curve."""
    if len(scores) < 2:
        return []
    mean = sum(scores) / len(scores)
    variance = sum((x - mean) ** 2 for x in scores) / len(scores)
    std_dev = math.sqrt(variance)
    if std_dev > 0.1:
        high = mean + std_dev * 0.4
        low = mean + std_dev * 0.2
    else:
        high = mean + 0.08
        low = mean + 0.03

    boundaries: list[int] = []
    in_valley = False
    max_score = 0.0
    max_pos = 0
    for i in range(1, len(scores) - 1):
        score = scores[i]
        is_local_max = score > scores[i - 1] and score > scores[i + 1]
        if not in_valley and score >= high and is_local_max:
            in_valley = True
            max_score = score
            max_pos = i
        elif in_valley:
            if score > max_score and is_local_max:
                max_score = score
                max_pos = i
            if score < low or i == len(scores) - 2:
                if _prominence(scores, max_pos) > 0.05:
                    sentence_index = max_pos + window_size
                    if sentence_index < len(sentences):
                        boundaries.append(sentence_index)
                in_valley = False

    if not boundaries and len(scores) > 4:
        boundaries = _percentile_boundaries(scores, sentences, window_size)

    boundaries = _filter_close(boundaries, window_size)
    return _enforce_min_chunk_size(boundaries, sentences, min_chunk_chars)


def _percentile_boundaries(
    scores: list[float], sentences: list[str], window_size: int
) -> list[int]:
    """topic.rs:504-523 — local maxima in the top-25% of scores."""
    threshold = sorted(scores, reverse=True)[len(scores) // 4]
    out = []
    for i in range(1, len(scores) - 1):
        if scores[i] >= threshold and scores[i] > scores[i - 1] and scores[i] > scores[i + 1]:
            sentence_index = i + window_size
            if sentence_index < len(sentences):
                out.append(sentence_index)
    return out


def _filter_close(boundaries: list[int], window_size: int) -> list[int]:
    """topic.rs:526-543 — at least 2*window_size sentences apart."""
    if len(boundaries) <= 1:
        return boundaries
    min_distance = window_size * 2
    filtered: list[int] = []
    last = 0
    for b in boundaries:
        if b >= last + min_distance:
            filtered.append(b)
            last = b
    return filtered


def _enforce_min_chunk_size(
    boundaries: list[int], sentences: list[str], min_chars: int
) -> list[int]:
    """topic.rs:546-580 — drop boundaries creating sub-min_chars segments;
    merge an undersized final segment into the previous chunk."""
    if not boundaries:
        return boundaries
    filtered: list[int] = []
    last = 0
    for b in boundaries:
        segment = " ".join(sentences[last:b])
        if len(segment.encode("utf-8")) >= min_chars:  # topic.rs:563 (bytes)
            filtered.append(b)
            last = b
    if last < len(sentences):
        final_segment = " ".join(sentences[last:])
        if len(final_segment.encode("utf-8")) < min_chars and filtered:
            filtered.pop()
    return filtered


def _byte_len(s: str) -> int:
    return len(s.encode("utf-8"))


def topic_chunks(
    text: str,
    window_size: int = DEFAULT_WINDOW_SIZE,
    smoothing_passes: int = DEFAULT_SMOOTHING_PASSES,
    min_chunk_chars: int = MIN_CHUNK_CHARS,
) -> list[Span]:
    """Full TextTiling pipeline (topic.rs:680-745, minus wall-clock gates).

    Returns ``Span`` rows with running byte positions over the re-joined
    sentence stream — same lineage convention as the sliding chunker.
    """
    if not text or not text.strip():
        return []
    window_size = max(window_size, 2)  # topic.rs:50
    smoothing_passes = min(smoothing_passes, 5)  # topic.rs:51

    if _byte_len(text) > _FALLBACK_TEXT_LEN:  # topic.rs:688 (bytes)
        return sliding_window_chunks(text, 1000, 100)

    sentences = tokenize_pseudo_sentences(text)
    if len(sentences) < window_size * 2:  # topic.rs:707-710 → single chunk
        return [
            Span(
                start_pos=0,
                end_pos=_byte_len(text),
                chunk_index=0,
                total_chunks=1,
                token_count=count_tokens(text),
                content=text,
            )
        ]

    depth = calculate_depth_scores(sentences, window_size)
    smoothed = smooth_scores(depth, smoothing_passes)
    boundaries = identify_boundaries(smoothed, sentences, window_size, min_chunk_chars)
    return _chunks_from_boundaries(sentences, boundaries)


def _chunks_from_boundaries(sentences: list[str], boundaries: list[int]) -> list[Span]:
    """topic.rs:583-651 — join each segment's sentences with spaces; running
    positions advance by len(content)+1 (the reference counts an imaginary
    inter-chunk space)."""
    chunks: list[Span] = []
    start_idx = 0
    char_position = 0
    all_boundaries = list(boundaries) + [len(sentences)]
    for chunk_index, end_idx in enumerate(all_boundaries):
        if start_idx >= end_idx:
            continue
        content = " ".join(sentences[start_idx:end_idx])
        if not content.strip():
            start_idx = end_idx
            continue
        start_pos = char_position
        end_pos = start_pos + _byte_len(content)
        chunks.append(
            Span(
                start_pos=start_pos,
                end_pos=end_pos,
                chunk_index=chunk_index,
                total_chunks=0,
                token_count=count_tokens(content),
                content=content,
            )
        )
        char_position = end_pos + 1
        start_idx = end_idx
    total = len(chunks)
    for c in chunks:
        c.total_chunks = total
    return chunks


def topic_quality_score(content: str, topic_keywords: list[str]) -> float:
    """topic.rs:654-675 — 0.5 base + length ratio (cap 0.2) + keyword-density
    bonus (cap 0.3) + 0.2 for >=3 sentences, capped at 1.0."""
    score = 0.5
    score += min(len(content.encode("utf-8")) / 1000.0, 1.0) * 0.2
    if topic_keywords:
        words = len(content.split())
        if words:
            score += min(len(topic_keywords) / words * 10.0, 0.3)
    if len(split_sentences(content)) >= 3:
        score += 0.2
    return min(score, 1.0)


__all__ = [
    "topic_chunks",
    "topic_quality_score",
    "tokenize_pseudo_sentences",
    "extract_vocabulary",
    "coherence_score",
    "calculate_depth_scores",
    "smooth_scores",
    "identify_boundaries",
    "extract_topic_keywords",
]


# ---------------------------------------------------------------------------
# Deterministic multi-topic fixture for the driver query: four topic blocks
# whose sentences share heavy within-block vocabulary and nothing across
# blocks, so TextTiling has real valleys to find. The text is a pure
# function of (i % 4, i % 3 == 0), giving 8 enumerable input classes —
# which is what lets the driver query carry a pinned-constant oracle.
# ---------------------------------------------------------------------------

def _fixture_block(words: list[str], n: int = 5) -> str:
    out = []
    for k in range(n):
        rot = words[k % len(words):] + words[: k % len(words)]
        out.append(" ".join(rot) + " again today.")
    return " ".join(out)


_FIXTURE_BLOCKS = [
    _fixture_block(["query", "table", "partition", "index", "shuffle", "executor", "column"]),
    _fixture_block(["flour", "dough", "oven", "crust", "bread", "butter", "yeast"]),
    _fixture_block(["striker", "goal", "defender", "referee", "match", "corner", "keeper"]),
    _fixture_block(["galaxy", "telescope", "photon", "spectrum", "supernova", "orbit", "nebula"]),
]


def topic_fixture_text(i: int) -> str:
    """Two topic blocks starting at block i%4, plus a third when i%3==0."""
    blocks = [_FIXTURE_BLOCKS[i % 4], _FIXTURE_BLOCKS[(i + 1) % 4]]
    if i % 3 == 0:
        blocks.append(_FIXTURE_BLOCKS[(i + 2) % 4])
    return " ".join(blocks)
