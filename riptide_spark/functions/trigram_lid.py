"""Character-trigram language classifier (Cavnar–Trenkle rank profiles).

The reference's priority-5 statistical fallback is the whatlang trigram
model (``wasm/riptide-extractor-wasm/src/extraction.rs:349-356``). This is
the same family of detector — n-gram frequency profiles compared by
out-of-place rank distance (Cavnar & Trenkle 1994, "N-Gram-Based Text
Categorization") — built from seed corpora embedded below, so profiles are
a pure function of this file: every executor, run, and retry computes the
same ranks. Not a byte-level port of whatlang's trained model (SURVEY.md
§7 hard-part 3); golden assertions never reach this path because golden
pages resolve language at deterministic priorities 1-4.

Covers the Latin-script languages of the synthetic corpus; non-Latin
scripts are handled upstream by the Unicode-script vote in ``langid.py``.
"""

from __future__ import annotations

import re

# Seed corpora: a few sentences of ordinary prose per language. Profiles
# come from trigram *ranks*, which saturate quickly — a few hundred words
# of representative function-word-rich text pins the top ranks.
_SEEDS: dict[str, str] = {
    "en": (
        "The quick study of language has shown that the most common words "
        "in a text are the small ones. It is the case that when we look at "
        "the words people write, they use the same patterns over and over. "
        "This is not a surprise because all of the writing that we do has "
        "to be understood by other people. There are many ways to say the "
        "same thing and the choice between them depends on what the writer "
        "wants to express. With these words in hand, one can tell which "
        "language a text was written in by counting how often each short "
        "sequence of letters appears and comparing that with known texts."
    ),
    "de": (
        "Die schnelle Untersuchung der Sprache hat gezeigt, dass die "
        "häufigsten Wörter in einem Text die kleinen sind. Es ist der Fall, "
        "dass die Menschen beim Schreiben immer wieder die gleichen Muster "
        "verwenden. Das ist keine Überraschung, denn alles, was wir "
        "schreiben, muss von anderen Menschen verstanden werden. Es gibt "
        "viele Möglichkeiten, dasselbe zu sagen, und die Wahl zwischen "
        "ihnen hängt davon ab, was der Schreiber ausdrücken will. Mit "
        "diesen Wörtern kann man erkennen, in welcher Sprache ein Text "
        "geschrieben wurde, indem man zählt, wie oft jede kurze Folge von "
        "Buchstaben vorkommt und das mit bekannten Texten vergleicht."
    ),
    "fr": (
        "L'étude rapide de la langue a montré que les mots les plus "
        "fréquents dans un texte sont les petits mots. Il est vrai que "
        "lorsque les gens écrivent, ils utilisent les mêmes structures "
        "encore et encore. Ce n'est pas une surprise car tout ce que nous "
        "écrivons doit être compris par d'autres personnes. Il y a "
        "beaucoup de façons de dire la même chose et le choix entre elles "
        "dépend de ce que l'auteur veut exprimer. Avec ces mots, on peut "
        "savoir dans quelle langue un texte a été écrit en comptant la "
        "fréquence de chaque courte suite de lettres et en la comparant "
        "avec des textes connus."
    ),
    "es": (
        "El estudio rápido de la lengua ha demostrado que las palabras más "
        "comunes en un texto son las pequeñas. Es el caso de que cuando la "
        "gente escribe, usa los mismos patrones una y otra vez. Esto no es "
        "una sorpresa porque todo lo que escribimos tiene que ser "
        "entendido por otras personas. Hay muchas maneras de decir lo "
        "mismo y la elección entre ellas depende de lo que el escritor "
        "quiere expresar. Con estas palabras se puede saber en qué idioma "
        "se escribió un texto contando la frecuencia de cada secuencia "
        "corta de letras y comparándola con textos conocidos."
    ),
    "it": (
        "Lo studio rapido della lingua ha mostrato che le parole più "
        "comuni in un testo sono quelle piccole. È il caso che quando le "
        "persone scrivono, usano gli stessi schemi ancora e ancora. Questo "
        "non è una sorpresa perché tutto ciò che scriviamo deve essere "
        "capito da altre persone. Ci sono molti modi per dire la stessa "
        "cosa e la scelta tra di essi dipende da ciò che lo scrittore "
        "vuole esprimere. Con queste parole si può capire in quale lingua "
        "è stato scritto un testo contando quante volte appare ogni breve "
        "sequenza di lettere e confrontandola con testi conosciuti."
    ),
    "pt": (
        "O estudo rápido da língua mostrou que as palavras mais comuns em "
        "um texto são as pequenas. É o caso de que quando as pessoas "
        "escrevem, usam os mesmos padrões repetidamente. Isso não é uma "
        "surpresa porque tudo o que escrevemos tem que ser entendido por "
        "outras pessoas. Há muitas maneiras de dizer a mesma coisa e a "
        "escolha entre elas depende do que o escritor quer expressar. Com "
        "essas palavras, pode-se saber em que língua um texto foi escrito "
        "contando a frequência de cada sequência curta de letras e "
        "comparando com textos conhecidos."
    ),
    "nl": (
        "De snelle studie van de taal heeft aangetoond dat de meest "
        "voorkomende woorden in een tekst de kleine woorden zijn. Het is "
        "zo dat wanneer mensen schrijven, ze steeds dezelfde patronen "
        "gebruiken. Dat is geen verrassing, want alles wat we schrijven "
        "moet door andere mensen begrepen worden. Er zijn veel manieren "
        "om hetzelfde te zeggen en de keuze daartussen hangt af van wat "
        "de schrijver wil uitdrukken. Met deze woorden kan men zien in "
        "welke taal een tekst geschreven is door te tellen hoe vaak elke "
        "korte reeks letters voorkomt en dat met bekende teksten te "
        "vergelijken."
    ),
    # Round-4 additions (VERDICT r3 #8): the remaining top-Common-Crawl
    # Latin-script languages. Non-Latin CC leaders (ru, zh, ja, ko, ar)
    # resolve upstream via the Unicode-script vote in langid.py and never
    # reach the trigram profiles.
    "pl": (
        "Szybkie badanie języka pokazało, że najczęstsze słowa w tekście "
        "to te małe. Jest tak, że kiedy ludzie piszą, używają wciąż tych "
        "samych wzorców. Nie jest to zaskoczeniem, ponieważ wszystko, co "
        "piszemy, musi być zrozumiane przez innych ludzi. Istnieje wiele "
        "sposobów, aby powiedzieć to samo, a wybór między nimi zależy od "
        "tego, co piszący chce wyrazić. Dzięki tym słowom można "
        "rozpoznać, w jakim języku napisano tekst, licząc, jak często "
        "pojawia się każda krótka sekwencja liter, i porównując to ze "
        "znanymi tekstami."
    ),
    "sv": (
        "Den snabba studien av språket har visat att de vanligaste orden "
        "i en text är de små orden. Det är så att när människor skriver "
        "använder de samma mönster om och om igen. Det är ingen "
        "överraskning eftersom allt vi skriver måste förstås av andra "
        "människor. Det finns många sätt att säga samma sak och valet "
        "mellan dem beror på vad skribenten vill uttrycka. Med dessa ord "
        "kan man avgöra vilket språk en text är skriven på genom att "
        "räkna hur ofta varje kort följd av bokstäver förekommer och "
        "jämföra det med kända texter."
    ),
    "tr": (
        "Dilin hızlı incelenmesi, bir metindeki en yaygın kelimelerin "
        "küçük kelimeler olduğunu göstermiştir. İnsanlar yazarken aynı "
        "kalıpları tekrar tekrar kullanırlar. Bu şaşırtıcı değildir, "
        "çünkü yazdığımız her şeyin başka insanlar tarafından anlaşılması "
        "gerekir. Aynı şeyi söylemenin birçok yolu vardır ve aralarındaki "
        "seçim, yazarın ne ifade etmek istediğine bağlıdır. Bu "
        "kelimelerle, her kısa harf dizisinin ne sıklıkta geçtiğini "
        "sayarak ve bunu bilinen metinlerle karşılaştırarak bir metnin "
        "hangi dilde yazıldığı anlaşılabilir. Sabah erken saatlerde "
        "şehirde yaşayanlar işlerine giderken sokaklar yavaş yavaş "
        "canlanır. İnsanlar otobüs duraklarında bekler, çocuklar "
        "okullarına yürür ve esnaf dükkanlarını açar. Günün ilerleyen "
        "saatlerinde pazar yerlerinde sebze ve meyve satanların sesleri "
        "duyulur. Akşam olduğunda ise herkes evine dönmek için yollara "
        "koyulur. Bu gündelik hayatın akışı her mevsimde aynı şekilde "
        "devam eder ve kentin ritmini oluşturur."
    ),
    "id": (
        "Kajian cepat tentang bahasa telah menunjukkan bahwa kata yang "
        "paling umum dalam sebuah teks adalah kata kecil. Memang ketika "
        "orang menulis, mereka menggunakan pola yang sama berulang kali. "
        "Ini bukan kejutan karena semua yang kita tulis harus dipahami "
        "oleh orang lain. Ada banyak cara untuk mengatakan hal yang sama, "
        "dan pilihan di antaranya bergantung pada apa yang ingin "
        "diungkapkan oleh penulis. Dengan kata ini, orang dapat "
        "mengetahui bahasa sebuah teks dengan menghitung seberapa sering "
        "setiap urutan huruf pendek muncul dan membandingkannya dengan "
        "teks yang sudah dikenal."
    ),
}

_NON_LETTER_RE = re.compile(r"[^a-zà-öø-ÿāăąćčďđēėęěğīįıłńňōőœŕřśşšťūůűųźżž']+")

PROFILE_SIZE = 300


def _trigrams(text: str) -> dict[str, int]:
    """Word-padded trigram counts: each word contributes trigrams of
    ``' ' + word + ' '`` (the Cavnar-Trenkle padding convention)."""
    counts: dict[str, int] = {}
    for word in _NON_LETTER_RE.split(text.lower()):
        if not word:
            continue
        padded = f" {word} "
        for i in range(len(padded) - 2):
            tri = padded[i : i + 3]
            counts[tri] = counts.get(tri, 0) + 1
    return counts


def _profile(text: str, size: int = PROFILE_SIZE) -> dict[str, int]:
    """trigram → rank (0 = most frequent); ties broken lexically so the
    profile is deterministic."""
    counts = _trigrams(text)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
    return {tri: rank for rank, (tri, _) in enumerate(ranked)}


_LANG_PROFILES: dict[str, dict[str, int]] = {
    lang: _profile(seed) for lang, seed in _SEEDS.items()
}


def detect_trigram(text: str, max_chars: int = 1000) -> tuple[str | None, float]:
    """Classify by out-of-place distance against the language profiles.

    Returns ``(lang, confidence)``; confidence is the relative margin
    between the best and second-best distances in [0, 1]. Returns
    ``(None, 0.0)`` when the text yields no trigrams.
    """
    doc = _profile(text[:max_chars])
    if not doc:
        return None, 0.0
    max_oop = PROFILE_SIZE  # penalty for a trigram absent from the profile
    distances: list[tuple[float, str]] = []
    for lang, prof in _LANG_PROFILES.items():
        d = 0
        for tri, rank in doc.items():
            d += abs(rank - prof[tri]) if tri in prof else max_oop
        distances.append((d / max(len(doc), 1), lang))
    distances.sort()
    best_d, best_lang = distances[0]
    second_d = distances[1][0] if len(distances) > 1 else best_d + 1.0
    if second_d <= 0:
        return best_lang, 0.0
    confidence = max(0.0, min(1.0, (second_d - best_d) / second_d))
    return best_lang, confidence


__all__ = ["detect_trigram", "PROFILE_SIZE"]
