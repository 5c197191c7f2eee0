"""Cross-engine equality: each snowball_ext stemmer vs its DuckDB SQL
mirror (oracle/snowball_sql.py), over a battery of realistic words,
accented forms, marking-overlap pathologies, and the sf0.01 corpus
vocabulary.  This is the same lemma the Porter2/German/Russian mirrors
rely on: identical stem maps => identical postings => identical BM25."""

import duckdb
import pytest

from lucenenet_spark.analysis import snowball_ext as X
from lucenenet_spark.analysis.lovins import lovins_stem
from lucenenet_spark.oracle import snowball_sql as Q

COMMON = [
    "merge", "merges", "merging", "batch", "table", "tables", "scan",
    "spark", "rollup", "stream", "join", "vector", "index", "hash",
    "distributed", "segment", "a", "i", "de", "la", "le", "el",
    "buying", "paying", "ayia", "aiya", "ayyyy", "oyia", "aiia",
    "qu", "q", "y", "yy", "gua", "gue",
]

WORDS = {
    "swedish": COMMON + [
        "klubben", "jaktkarlarne", "följeslagare", "klubbens",
        "husets", "andas", "förbannat", "sorgfullt", "arbetslöst",
        "trolöst", "dag", "dagar", "dagarna", "flickorna", "flickor",
        "heterna", "verksamheten", "möjligheterna", "löst", "fullt",
        "vackraste", "vackrast", "trygghetens", "papperet", "växt",
        "skorna", "barnens", "bilarnas", "äpplet",
    ],
    "danish": COMMON + [
        "indbydelse", "kendelse", "undersøgelse", "billigst",
        "vanskeligst", "friskhed", "sikkerhed", "gyldigt",
        "mærkeligt", "afstanden", "lovene", "loven", "alderen",
        "verdens", "hallen", "klubben", "arbejdsløst", "kærlighed",
        "kærligheden", "følelsen", "følelserne", "møderne",
        "spørgsmålet", "øjeblikkets", "erklærede", "bekendtgørelse",
        "igst", "løst", "høstes", "tættere",
    ],
    "norwegian": COMMON + [
        "havnedistriktene", "heldigvis", "forlengelse",
        "avdelingens", "billigste", "epler", "erklærte", "klokken",
        "hopper", "lovene", "hetslov", "naturlig", "naturlige",
        "vanskeligere", "forskjellige", "muligheter", "mulighetene",
        "serverte", "servert", "kjærlighetens", "arbeidsledighet",
        "spørsmålet", "øyeblikkets", "størrelse", "ansvarlig",
        "egenskaper", "vitenskapelig", "eig", "slov",
    ],
    "finnish": COMMON + [
        "taloissa", "talojen", "taloja", "talo", "talon", "taloon",
        "taloihin", "taloista", "kirjastossa", "kirjastoissa",
        "puhuttaessa", "suurimmat", "suurin", "nopeammin",
        "kaupunkiin", "kaupungeissa", "tärkeimmät", "edeltäjistään",
        "edeltäjiinsä", "tekijät", "tekijänsä", "puun", "puissa",
        "ikkunassa", "ikkunoissa", "onko", "menetkö", "sanoakaan",
        "kielellä", "kielillä", "poissa", "pojista", "aurinko",
        "auringon", "taivaaseen", "huoneeseen", "niiden", "maiden",
        "ystävällisempi", "ystävällisimmät", "nopeasti", "sanoisi",
        "sanoisiko", "kirjansa", "kirjani", "kirjasi", "taloksensa",
        "vanhempi", "vanhimmat", "papot", "popot",
    ],
    "romanian": COMMON + [
        "lucrurile", "frumoasă", "absurditatea", "absurdităţile",
        "abilitate", "abilităţi", "acţiunea", "acţiunile", "copiilor",
        "copilului", "muncitorii", "românească", "româneşti",
        "vorbeşte", "vorbesc", "vorbiseră", "cântaseră", "naţional",
        "naţionale", "importantă", "dezvoltare", "dezvoltarea",
        "istoria", "istorie", "creativitate", "semnificativ",
        "semnificative", "aua", "iua", "aiua", "auia", "ează",
        "lucrează", "citească", "citind", "scriind", "băieţii",
        "fetele", "oraşului", "oraşele", "măsurători",
    ],
    "hungarian": COMMON + [
        "babakocsit", "babakocsik", "házak", "házat", "házakat",
        "könyvek", "könyveket", "asztallal", "tollal", "hosszal",
        "várral", "emberek", "embereknek", "gyerekeknek", "szépén",
        "szépen", "városában", "városaiban", "barátaim",
        "barátaimnak", "almák", "almát", "kertjükben", "tanároknak",
        "magyarországon", "lehetõségek", "dzsungel", "asszonyok",
        "képpen", "képp", "ánként", "stul", "éstül", "jaitok",
        "éjük", "ájuk", "köszönöm", "szeretettel", "falujában",
    ],
    "lovins": COMMON + [
        "nationally", "sitting", "magnesia", "magnesite",
        "involution", "believes", "induction", "assumption",
        "absorption", "matrices", "analyzable", "dangerousness",
        "happiness", "knees", "keys", "crystallizable", "receivable",
        "systems", "theses", "thesis", "maximum", "minimum",
        "alphabetical", "administrable", "symmetrical", "geometry",
        "parametrize", "suspension", "suspenders", "contender",
        "ul", "aul", "oul", "her", "pher", "ther", "end", "send",
        "ent", "ment", "et", "net",
    ],
    "dutch": COMMON + [
        "lichamelijk", "lichamelijke", "gekken", "gemen", "vuren",
        "huizen", "aardappelen", "heerlijkheden", "baarden",
        "koninginnen", "ogenblikkelijke", "bruikbaarheid", "lijken",
        "duidelijkste", "eenvoudig", "eenvoudige", "bedrijvigheid",
        "heid", "heden", "vrolijkheid", "moeilijkheden", "avonden",
        "opvoeding", "opvoedingen", "ijsjes", "ijsje", "ezelin",
        "ezelinnen", "aangekondigde", "lopen", "liepen", "geiten",
        "één", "vóór", "brieven", "getuigenissen",
    ],
    "spanish": COMMON + [
        "niñas", "canciones", "felizmente", "lógicamente", "vayamos",
        "corriendo", "atracción", "comiéndoselo", "guerra", "pague",
        "torneo", "torneos", "grandiosidad", "nacionalidades",
        "comprenderán", "comprendiéndose", "dándoselo", "búsqueda",
        "águila", "último", "cantando", "cantar", "cantáis",
        "durmiendo", "yendo", "huyendo", "oyendo", "construyendo",
        "lealtades", "generosamente", "universidades", "útiles",
        "evolución", "evoluciones", "biología", "psicología",
    ],
    "portuguese": COMMON + [
        "bonecas", "quinze", "corações", "pague", "grandeza",
        "propriedade", "nações", "nação", "amigão", "amigões",
        "falação", "cantarão", "cantariam", "felizmente",
        "possibilidade", "possibilidades", "avidamente", "guloso",
        "chegue", "cheguei", "brincalhão", "admiração", "pêssego",
        "você", "português", "ações", "intenção", "coração",
        "proteção", "direção",
    ],
    "italian": COMMON + [
        "abbandonata", "pronomi", "mangiarla", "mangiandola",
        "nazionale", "logia", "abbandonare", "abbandoneranno",
        "qualità", "quantità", "università", "velocemente",
        "atroce", "atroci", "dirigente", "dirigenti", "usione",
        "costruzione", "costruzioni", "guidare", "acquisto",
        "più", "perché", "città", "virtù", "dovuto", "piaciuto",
        "mangiò", "parlerò", "sbaglierebbero", "aiuola",
    ],
    "french": COMMON + [
        "majestueux", "continuité", "fiction", "nation", "émotions",
        "payer", "éléments", "importante", "importantes",
        "conditionnel", "traditionnelle", "chevaux", "cheveux",
        "journaux", "travailleuse", "travailleuses", "issement",
        "vraiment", "abondamment", "évidemment", "possibilité",
        "possibilités", "activités", "créatrice", "créatrices",
        "logiquement", "chrétienne", "citoyenneté", "après",
        "procède", "procèdent", "complètement", "château",
        "châteaux", "joyeux", "royaume", "moyen", "essuyer",
        "baignoire", "voyiez", "payiez", "aboiement",
    ],
}

CTES = {
    "swedish": Q.swedish_ctes,
    "danish": Q.danish_ctes,
    "norwegian": Q.norwegian_ctes,
    "finnish": Q.finnish_ctes,
    "romanian": Q.romanian_ctes,
    "hungarian": Q.hungarian_ctes,
    "lovins": Q.lovins_ctes,
    "dutch": Q.dutch_ctes,
    "spanish": Q.spanish_ctes,
    "portuguese": Q.portuguese_ctes,
    "italian": Q.italian_ctes,
    "french": Q.french_ctes,
}
STEMS = {
    "swedish": X.swedish_stem,
    "danish": X.danish_stem,
    "norwegian": X.norwegian_stem,
    "finnish": X.finnish_stem,
    "romanian": X.romanian_stem,
    "hungarian": X.hungarian_stem,
    "lovins": lovins_stem,
    "dutch": X.dutch_stem,
    "spanish": X.spanish_stem,
    "portuguese": X.portuguese_stem,
    "italian": X.italian_stem,
    "french": X.french_stem,
}


def sql_stems(lang: str, words: list[str]) -> dict[str, str]:
    con = duckdb.connect()
    vals = ", ".join(f"('{w.replace(chr(39), chr(39)*2)}')"
                     for w in sorted(set(words)))
    sql = (f"WITH tok_f(term) AS (SELECT * FROM (VALUES {vals})),\n"
           + CTES[lang]()
           + "\nSELECT term, stem FROM stemmap")
    return dict(con.execute(sql).fetchall())


@pytest.mark.parametrize("lang", sorted(WORDS))
def test_sql_mirror_matches_python(lang):
    words = sorted(set(WORDS[lang]))
    got = sql_stems(lang, words)
    bad = []
    for w in words:
        want = STEMS[lang](w)
        if got.get(w) != want:
            bad.append((w, want, got.get(w)))
    assert not bad, f"{lang}: {bad[:10]} ({len(bad)} diffs)"


def test_sql_mirror_matches_python_on_corpus_vocab():
    import re
    con = duckdb.connect()
    toks = con.execute(
        "SELECT DISTINCT unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9]+')) FROM read_parquet("
        "'/root/testdata/sf0.01/documents.parquet')").fetchall()
    vocab = sorted({t[0] for t in toks})
    assert vocab
    for lang in sorted(WORDS):
        got = sql_stems(lang, vocab)
        for w in vocab:
            assert got[w] == STEMS[lang](w), (lang, w)


ALPHABETS = {
    "swedish": "abdefghiklmnorstuvyäåö",
    "danish": "abdefghiklmnorstuvyzåæø",
    "norwegian": "abdefghiklmnorstuvyzåæø",
    "finnish": "adehijklmnoprstuvyäö",
    "romanian": "abcdeilmnoprstuvzâîăşţ",
    "hungarian": "abcdegijklmnoprstuvzáéíóõöúûü",
    "lovins": "abcdefghilmnoprstuvxyz'",
    "dutch": "abcdeghijklmnoprstuvyèáëï",
    "spanish": "abcdeghilmnopqrstuvyáéíóúüñ",
    "portuguese": "abcdeghilmnopqrstuvçãõáéêôí",
    "italian": "abcdeghilmnopqrstuvzàèìòù",
    "french": "abcdeghijlmnopqrstuvxyzéèêàâçëïû",
}


@pytest.mark.parametrize("lang", sorted(ALPHABETS))
def test_sql_mirror_fuzz(lang):
    """500 random pseudo-words per language: the mirrors must agree on
    arbitrary letter sequences, not just real vocabulary — this sweeps
    region-boundary and prelude-marking edge cases."""
    import random
    rng = random.Random(lang)  # str seed is deterministic (no PYTHONHASHSEED)
    alpha = ALPHABETS[lang]
    words = {"".join(rng.choice(alpha)
                     for _ in range(rng.randint(1, 14)))
             for _ in range(500)}
    words = sorted(words)
    got = sql_stems(lang, words)
    bad = [(w, STEMS[lang](w), got.get(w))
           for w in words if got.get(w) != STEMS[lang](w)]
    assert not bad, f"{lang}: {bad[:10]} ({len(bad)} diffs)"
