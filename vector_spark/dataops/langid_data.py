"""Character-trigram language profiles for Latin-script language ID.

Cavnar & Trenkle-style n-gram profiles ("N-Gram-Based Text
Categorization", 1994 — public): per language, the frequency-ranked top
trigrams computed AT IMPORT from the seed corpus below. The seeds are
short original sample sentences (common everyday vocabulary) written for
this module — they are data, not logic, and deliberately small: the
classifier needs relative trigram-rank overlap, not corpus scale.

Languages whose script already identifies them (Cyrillic, Greek, Arabic,
Hebrew, CJK, Hangul, Devanagari, Thai) are handled upstream by Unicode
range detection in `dataops/text.py` and need no profile here.
"""

from __future__ import annotations

from collections import Counter

SEED_TEXTS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog. this is a short "
        "example of everyday english text with common words that people "
        "use when they write about their work and their lives. we think "
        "that language can be detected from the letters which appear "
        "together most often in writing. there will always be more to say "
        "but this should be enough for the purpose of counting trigrams."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund. dies ist "
        "ein kurzes beispiel für deutschen text mit häufigen wörtern, die "
        "menschen verwenden, wenn sie über ihre arbeit und ihr leben "
        "schreiben. wir glauben, dass man die sprache an den buchstaben "
        "erkennen kann, die in texten am häufigsten zusammen stehen. es "
        "gibt immer mehr zu sagen, aber das sollte für das zählen der "
        "trigramme genügen."
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux. ceci "
        "est un court exemple de texte français avec des mots courants "
        "que les gens utilisent quand ils écrivent sur leur travail et "
        "leur vie. nous pensons que la langue peut être reconnue grâce "
        "aux lettres qui apparaissent le plus souvent ensemble dans les "
        "textes écrits. il y aurait toujours plus à dire mais cela devrait "
        "suffire pour compter les trigrammes."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso. este es un "
        "breve ejemplo de texto en español con palabras comunes que la "
        "gente usa cuando escribe sobre su trabajo y su vida. creemos que "
        "el idioma puede reconocerse por las letras que aparecen juntas "
        "con más frecuencia en los textos escritos. siempre habría más "
        "que decir pero esto debería bastar para contar los trigramas."
    ),
    "pt": (
        "a rápida raposa marrom salta sobre o cão preguiçoso. este é um "
        "breve exemplo de texto em português com palavras comuns que as "
        "pessoas usam quando escrevem sobre o seu trabalho e a sua vida. "
        "achamos que o idioma pode ser reconhecido pelas letras que "
        "aparecem juntas com mais frequência nos textos escritos. haveria "
        "sempre mais a dizer mas isto deve bastar para contar os "
        "trigramas."
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro. questo è un "
        "breve esempio di testo italiano con parole comuni che le persone "
        "usano quando scrivono del loro lavoro e della loro vita. "
        "pensiamo che la lingua possa essere riconosciuta dalle lettere "
        "che compaiono più spesso insieme nei testi scritti. ci sarebbe "
        "sempre altro da dire ma questo dovrebbe bastare per contare i "
        "trigrammi."
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond. dit is een kort "
        "voorbeeld van nederlandse tekst met veelgebruikte woorden die "
        "mensen gebruiken wanneer ze over hun werk en hun leven "
        "schrijven. wij denken dat de taal herkend kan worden aan de "
        "letters die het vaakst samen voorkomen in geschreven teksten. er "
        "valt altijd meer te zeggen maar dit zou genoeg moeten zijn om de "
        "trigrammen te tellen."
    ),
    "sv": (
        "den snabba bruna räven hoppar över den lata hunden. detta är ett "
        "kort exempel på svensk text med vanliga ord som människor "
        "använder när de skriver om sitt arbete och sina liv. vi tror att "
        "språket kan kännas igen på de bokstäver som oftast förekommer "
        "tillsammans i skrivna texter. det finns alltid mer att säga men "
        "detta borde räcka för att räkna trigrammen."
    ),
    "da": (
        "den hurtige brune ræv springer over den dovne hund. dette er et "
        "kort eksempel på dansk tekst med almindelige ord som folk bruger "
        "når de skriver om deres arbejde og deres liv. vi tror at sproget "
        "kan genkendes på de bogstaver der oftest optræder sammen i "
        "skrevne tekster. der ville altid være mere at sige men dette "
        "burde være nok til at tælle trigrammerne."
    ),
    "pl": (
        "szybki brązowy lis przeskakuje nad leniwym psem. to jest krótki "
        "przykład polskiego tekstu ze zwykłymi słowami których ludzie "
        "używają gdy piszą o swojej pracy i swoim życiu. uważamy że język "
        "można rozpoznać po literach które najczęściej występują razem w "
        "pisanych tekstach. zawsze byłoby więcej do powiedzenia ale to "
        "powinno wystarczyć do policzenia trigramów."
    ),
    "cs": (
        "rychlá hnědá liška skáče přes líného psa. toto je krátký příklad "
        "českého textu s běžnými slovy která lidé používají když píší o "
        "své práci a svém životě. myslíme že jazyk lze rozpoznat podle "
        "písmen která se v psaných textech nejčastěji vyskytují spolu. "
        "vždy by bylo co dodat ale tohle by mělo stačit na spočítání "
        "trigramů."
    ),
    "tr": (
        "hızlı kahverengi tilki tembel köpeğin üzerinden atlar. bu, "
        "insanların işleri ve hayatları hakkında yazarken kullandıkları "
        "yaygın kelimelerle yazılmış kısa bir türkçe metin örneğidir. "
        "dilin, yazılı metinlerde en sık birlikte görünen harflerden "
        "tanınabileceğini düşünüyoruz. söylenecek her zaman daha çok şey "
        "olurdu ama bu, üçlüleri saymak için yeterli olmalı."
    ),
    "id": (
        "rubah coklat yang cepat melompati anjing yang malas. ini adalah "
        "contoh singkat teks bahasa indonesia dengan kata kata umum yang "
        "digunakan orang ketika mereka menulis tentang pekerjaan dan "
        "kehidupan mereka. kami berpikir bahwa bahasa dapat dikenali dari "
        "huruf huruf yang paling sering muncul bersama dalam teks "
        "tertulis. selalu ada lebih banyak yang bisa dikatakan tetapi ini "
        "seharusnya cukup untuk menghitung trigram."
    ),
    "fi": (
        "nopea ruskea kettu hyppää laiskan koiran yli. tämä on lyhyt "
        "esimerkki suomenkielisestä tekstistä jossa on tavallisia sanoja "
        "joita ihmiset käyttävät kirjoittaessaan työstään ja elämästään. "
        "uskomme että kielen voi tunnistaa kirjaimista jotka esiintyvät "
        "useimmin yhdessä kirjoitetuissa teksteissä. aina olisi enemmän "
        "sanottavaa mutta tämän pitäisi riittää trigrammien laskemiseen."
    ),
}

PROFILE_SIZE = 300


def _trigrams(text: str) -> list[str]:
    t = " " + " ".join(text.lower().split()) + " "
    return [t[i : i + 3] for i in range(len(t) - 2)]


def build_profiles() -> dict[str, dict[str, int]]:
    """language → {trigram: rank} (rank 0 = most frequent), top
    PROFILE_SIZE trigrams per language."""
    out = {}
    for lang, seed in SEED_TEXTS.items():
        counts = Counter(_trigrams(seed))
        ranked = [g for g, _ in counts.most_common(PROFILE_SIZE)]
        out[lang] = {g: r for r, g in enumerate(ranked)}
    return out


LANG_PROFILES = build_profiles()
