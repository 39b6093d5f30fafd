"""Statistical language-ID fallback (E11 priority 5).

The reference path is whatlang's trigram model
(``wasm/riptide-extractor-wasm/src/extraction.rs:349-356``); ours is the
same detector family (Cavnar-Trenkle rank profiles,
``functions/trigram_lid.py``) with Unicode-script and stopword backstops
(``functions/langid.py``). No byte-parity contract here — golden pages
resolve at priorities 1-4 — so these tests pin determinism and reasonable
accuracy on held-out prose.
"""

from __future__ import annotations

import pytest

from riptide_spark.functions.langid import detect_language_statistical
from riptide_spark.functions.trigram_lid import detect_trigram

HELD_OUT = {
    "en": (
        "Researchers announced today that the new bridge will open to "
        "traffic next month after years of construction delays."
    ),
    "de": (
        "Die Forscher gaben heute bekannt, dass die neue Brücke nach "
        "jahrelangen Verzögerungen im nächsten Monat freigegeben wird."
    ),
    "fr": (
        "Les chercheurs ont annoncé aujourd'hui que le nouveau pont sera "
        "ouvert à la circulation le mois prochain après des années de retard."
    ),
    "es": (
        "Los investigadores anunciaron hoy que el nuevo puente se abrirá "
        "al tráfico el próximo mes tras años de retrasos en la construcción."
    ),
    "it": (
        "I ricercatori hanno annunciato oggi che il nuovo ponte sarà aperto "
        "al traffico il mese prossimo dopo anni di ritardi nella costruzione."
    ),
    "pt": (
        "Os pesquisadores anunciaram hoje que a nova ponte será aberta ao "
        "tráfego no próximo mês após anos de atrasos na construção."
    ),
    "nl": (
        "Onderzoekers maakten vandaag bekend dat de nieuwe brug volgende "
        "maand wordt opengesteld voor het verkeer na jaren van vertraging."
    ),
}


@pytest.mark.parametrize("lang", sorted(HELD_OUT))
def test_trigram_held_out_prose(lang):
    got, conf = detect_trigram(HELD_OUT[lang])
    assert got == lang
    assert 0.0 <= conf <= 1.0


@pytest.mark.parametrize("lang", sorted(HELD_OUT))
def test_statistical_detector_end_to_end(lang):
    assert detect_language_statistical(HELD_OUT[lang]) == lang


def test_trigram_degenerate_inputs():
    assert detect_trigram("") == (None, 0.0)
    assert detect_trigram("12345 678 90") == (None, 0.0)


def test_statistical_nonlatin_scripts_win():
    # Script vote handles non-Latin before trigrams ever run.
    assert detect_language_statistical("这是一个中文句子，用来测试语言检测。") == "zh"
    assert detect_language_statistical("これは日本語のテスト文です。") == "ja"
    assert detect_language_statistical("Это русское предложение для теста.") == "ru"


def test_statistical_deterministic():
    text = HELD_OUT["fr"]
    assert all(
        detect_language_statistical(text) == detect_language_statistical(text)
        for _ in range(5)
    )


def test_profiles_are_import_stable():
    # Profiles derive only from the embedded seeds: re-import must agree.
    import importlib

    from riptide_spark.functions import trigram_lid

    before = {k: dict(v) for k, v in trigram_lid._LANG_PROFILES.items()}
    importlib.reload(trigram_lid)
    assert before == trigram_lid._LANG_PROFILES
