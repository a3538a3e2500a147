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

# Second seed wave (round 4): two more original everyday-vocabulary
# paragraphs per language (travel/food + city/weather domains) so profile
# ranks come from a few paragraphs rather than one — short real-world
# snippets now rank against a broader trigram base. Same authorship
# note as SEED_TEXTS: written for this module, data not logic.
SEED_TEXTS_2: dict[str, str] = {
    "en": (
        "in the morning we walked to the market and bought fresh bread, "
        "cheese and a little fruit for the journey. the train left the "
        "station at nine and the fields outside the window were still "
        "wet from the night's rain. when we arrived in the city we found "
        "a small hotel near the river and left our bags in the room. "
        "later that evening my friend cooked dinner while i set the "
        "table, and we talked for hours about the places we wanted to "
        "see and the people we hoped to meet along the way."
    ),
    "de": (
        "am morgen gingen wir zum markt und kauften frisches brot, käse "
        "und etwas obst für die reise. der zug verließ den bahnhof um "
        "neun uhr und die felder vor dem fenster waren noch nass vom "
        "regen der nacht. als wir in der stadt ankamen, fanden wir ein "
        "kleines hotel am fluss und ließen unsere taschen im zimmer. "
        "später am abend kochte meine freundin das essen, während ich "
        "den tisch deckte, und wir sprachen stundenlang über die orte, "
        "die wir sehen wollten, und die menschen, die wir unterwegs "
        "treffen würden."
    ),
    "fr": (
        "le matin nous sommes allés au marché pour acheter du pain "
        "frais, du fromage et quelques fruits pour le voyage. le train a "
        "quitté la gare à neuf heures et les champs derrière la fenêtre "
        "étaient encore mouillés par la pluie de la nuit. en arrivant "
        "dans la ville nous avons trouvé un petit hôtel près du fleuve "
        "et laissé nos sacs dans la chambre. plus tard dans la soirée "
        "mon amie a préparé le dîner pendant que je mettais la table, et "
        "nous avons parlé pendant des heures des endroits que nous "
        "voulions voir et des gens que nous espérions rencontrer."
    ),
    "es": (
        "por la mañana fuimos al mercado y compramos pan fresco, queso y "
        "algo de fruta para el viaje. el tren salió de la estación a las "
        "nueve y los campos detrás de la ventana todavía estaban mojados "
        "por la lluvia de la noche. cuando llegamos a la ciudad "
        "encontramos un pequeño hotel cerca del río y dejamos las "
        "maletas en la habitación. más tarde mi amiga preparó la cena "
        "mientras yo ponía la mesa, y hablamos durante horas de los "
        "lugares que queríamos ver y de la gente que esperábamos "
        "conocer por el camino."
    ),
    "pt": (
        "de manhã fomos ao mercado e comprámos pão fresco, queijo e "
        "alguma fruta para a viagem. o comboio saiu da estação às nove e "
        "os campos atrás da janela ainda estavam molhados da chuva da "
        "noite. quando chegámos à cidade encontrámos um pequeno hotel "
        "perto do rio e deixámos as malas no quarto. mais tarde a minha "
        "amiga preparou o jantar enquanto eu punha a mesa, e falámos "
        "durante horas sobre os lugares que queríamos ver e as pessoas "
        "que esperávamos conhecer pelo caminho."
    ),
    "it": (
        "la mattina siamo andati al mercato e abbiamo comprato pane "
        "fresco, formaggio e un po' di frutta per il viaggio. il treno è "
        "partito dalla stazione alle nove e i campi dietro il finestrino "
        "erano ancora bagnati dalla pioggia della notte. quando siamo "
        "arrivati in città abbiamo trovato un piccolo albergo vicino al "
        "fiume e abbiamo lasciato le valigie in camera. più tardi la mia "
        "amica ha preparato la cena mentre io apparecchiavo la tavola, e "
        "abbiamo parlato per ore dei luoghi che volevamo vedere e delle "
        "persone che speravamo di incontrare lungo la strada."
    ),
    "nl": (
        "in de ochtend liepen we naar de markt en kochten vers brood, "
        "kaas en wat fruit voor de reis. de trein vertrok om negen uur "
        "van het station en de velden achter het raam waren nog nat van "
        "de regen van de nacht. toen we in de stad aankwamen vonden we "
        "een klein hotel bij de rivier en lieten onze tassen op de "
        "kamer. later die avond kookte mijn vriendin het eten terwijl ik "
        "de tafel dekte, en we praatten urenlang over de plaatsen die we "
        "wilden zien en de mensen die we onderweg hoopten te ontmoeten."
    ),
    "sv": (
        "på morgonen gick vi till marknaden och köpte färskt bröd, ost "
        "och lite frukt till resan. tåget lämnade stationen klockan nio "
        "och fälten utanför fönstret var fortfarande våta av nattens "
        "regn. när vi kom fram till staden hittade vi ett litet hotell "
        "vid floden och lämnade våra väskor på rummet. senare på kvällen "
        "lagade min vän middagen medan jag dukade bordet, och vi pratade "
        "i timmar om platserna vi ville se och människorna vi hoppades "
        "träffa på vägen."
    ),
    "da": (
        "om morgenen gik vi til markedet og købte frisk brød, ost og "
        "lidt frugt til rejsen. toget forlod stationen klokken ni og "
        "markerne uden for vinduet var stadig våde af nattens regn. da "
        "vi kom til byen fandt vi et lille hotel ved floden og lod vores "
        "tasker blive på værelset. senere på aftenen lavede min ven "
        "maden mens jeg dækkede bordet, og vi talte i timevis om de "
        "steder vi ville se og de mennesker vi håbede at møde på vejen."
    ),
    "pl": (
        "rano poszliśmy na targ i kupiliśmy świeży chleb, ser i trochę "
        "owoców na podróż. pociąg odjechał ze stacji o dziewiątej a pola "
        "za oknem były jeszcze mokre od nocnego deszczu. kiedy "
        "przyjechaliśmy do miasta znaleźliśmy mały hotel nad rzeką i "
        "zostawiliśmy torby w pokoju. później wieczorem moja przyjaciółka "
        "gotowała kolację a ja nakrywałem do stołu, i rozmawialiśmy "
        "godzinami o miejscach które chcieliśmy zobaczyć i o ludziach "
        "których mieliśmy nadzieję spotkać po drodze."
    ),
    "cs": (
        "ráno jsme šli na trh a koupili čerstvý chléb, sýr a trochu "
        "ovoce na cestu. vlak odjel ze stanice v devět hodin a pole za "
        "oknem byla ještě mokrá od nočního deště. když jsme přijeli do "
        "města našli jsme malý hotel u řeky a nechali tašky v pokoji. "
        "později večer moje kamarádka vařila večeři zatímco já jsem "
        "prostíral stůl, a povídali jsme si celé hodiny o místech která "
        "jsme chtěli vidět a o lidech které jsme doufali cestou potkat."
    ),
    "tr": (
        "sabah pazara gittik ve yolculuk için taze ekmek, peynir ve "
        "biraz meyve aldık. tren istasyondan dokuzda ayrıldı ve "
        "pencerenin dışındaki tarlalar gece yağan yağmurdan hala "
        "ıslaktı. şehre vardığımızda nehrin yanında küçük bir otel "
        "bulduk ve çantalarımızı odada bıraktık. akşam daha sonra "
        "arkadaşım yemeği pişirirken ben masayı kurdum ve görmek "
        "istediğimiz yerler ve yolda tanışmayı umduğumuz insanlar "
        "hakkında saatlerce konuştuk."
    ),
    "id": (
        "pagi hari kami pergi ke pasar dan membeli roti segar, keju dan "
        "sedikit buah untuk perjalanan. kereta berangkat dari stasiun "
        "pukul sembilan dan ladang di luar jendela masih basah karena "
        "hujan semalam. ketika kami tiba di kota kami menemukan hotel "
        "kecil di dekat sungai dan meninggalkan tas kami di kamar. "
        "malam harinya teman saya memasak makan malam sementara saya "
        "menyiapkan meja, dan kami berbicara berjam jam tentang tempat "
        "yang ingin kami lihat dan orang yang kami harap bisa kami "
        "temui di jalan."
    ),
    "fi": (
        "aamulla kävelimme torille ja ostimme tuoretta leipää, juustoa "
        "ja vähän hedelmiä matkaa varten. juna lähti asemalta yhdeksältä "
        "ja pellot ikkunan takana olivat vielä märkiä yön sateesta. kun "
        "saavuimme kaupunkiin löysimme pienen hotellin joen varrelta ja "
        "jätimme laukkumme huoneeseen. myöhemmin illalla ystäväni "
        "valmisti illallisen sillä aikaa kun minä katoin pöydän, ja "
        "puhuimme tuntikausia paikoista jotka halusimme nähdä ja "
        "ihmisistä joita toivoimme tapaavamme matkalla."
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
        seed = seed + " " + SEED_TEXTS_2.get(lang, "")
        counts = Counter(_trigrams(seed))
        ranked = [g for g, _ in counts.most_common(PROFILE_SIZE)]
        out[lang] = {g: r for r, g in enumerate(ranked)}
    return out


LANG_PROFILES = build_profiles()
