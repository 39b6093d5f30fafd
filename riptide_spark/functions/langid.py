"""Deterministic statistical language identification (priority-5 fallback).

The reference uses the whatlang trigram model
(``/root/reference/wasm/riptide-extractor-wasm/src/extraction.rs:349-356``).
Porting that model byte-exactly is out of scope (SURVEY.md §7 hard-part 3);
the golden corpus always resolves language at deterministic priorities 1-4,
so this fallback only needs to be *deterministic and reasonable*, never
byte-parity. It combines Unicode-script detection for non-Latin scripts with
a stopword-profile vote for common Latin-script languages, mirroring the
spirit (not the math) of a trigram detector.

Also exported: ``STOPWORD_PROFILES`` reused by the relational language-ID
operator over the ``documents`` table (``operators/textops.py``).
"""

from __future__ import annotations

import re

# Small, high-frequency function-word profiles. Order inside each tuple is
# irrelevant; membership is what votes.
STOPWORD_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "für"),
    "fr": ("le", "la", "les", "des", "est", "dans", "pour", "que", "une", "avec"),
    "es": ("el", "los", "las", "es", "en", "por", "que", "una", "para", "con"),
    "it": ("il", "di", "che", "la", "per", "una", "sono", "con", "del", "non"),
    "pt": ("o", "de", "que", "em", "um", "para", "com", "uma", "os", "não"),
    "nl": ("de", "het", "een", "van", "en", "dat", "is", "voor", "met", "niet"),
}

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)

_SCRIPT_RANGES: tuple[tuple[str, int, int], ...] = (
    ("zh", 0x4E00, 0x9FFF),
    ("ja", 0x3040, 0x30FF),
    ("ko", 0xAC00, 0xD7AF),
    ("ru", 0x0400, 0x04FF),
    ("ar", 0x0600, 0x06FF),
    ("he", 0x0590, 0x05FF),
    ("hi", 0x0900, 0x097F),
    ("th", 0x0E00, 0x0E7F),
    ("el", 0x0370, 0x03FF),
)


def detect_language_statistical(text: str) -> str | None:
    if not text or not text.strip():
        return None

    # Unicode-script majority vote for non-Latin scripts.
    script_counts: dict[str, int] = {}
    letters = 0
    for ch in text:
        code = ord(ch)
        if ch.isalpha():
            letters += 1
            for lang, lo, hi in _SCRIPT_RANGES:
                if lo <= code <= hi:
                    script_counts[lang] = script_counts.get(lang, 0) + 1
                    break
    if letters == 0:
        return None
    best_script = max(script_counts.items(), key=lambda kv: kv[1], default=None)
    if best_script is not None and best_script[1] * 2 > letters:
        # Japanese pages mix kana with CJK ideographs: any kana wins over zh.
        if best_script[0] == "zh" and script_counts.get("ja"):
            return "ja"
        return best_script[0]

    # Latin scripts: Cavnar-Trenkle trigram profiles (whatlang's model
    # family), with the stopword-profile vote as tie-break when the trigram
    # margin is razor-thin (close Romance-language pairs on short text).
    from .trigram_lid import detect_trigram

    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return None
    scores: dict[str, int] = {}
    for lang, profile in STOPWORD_PROFILES.items():
        profile_set = set(profile)
        scores[lang] = sum(1 for w in words if w in profile_set)
    # Deterministic tie-break: score desc, then language code asc.
    sw_lang, sw_hits = min(scores.items(), key=lambda kv: (-kv[1], kv[0]))

    tri_lang, tri_conf = detect_trigram(text)
    if tri_lang is None:
        if sw_hits == 0:
            return "en"  # the reference's detector always answers; en is modal
        return sw_lang
    if tri_conf < 0.02 and sw_hits > 0 and sw_lang != tri_lang:
        return sw_lang
    return tri_lang
