"""Oracle-side transcriptions of the engine's spec constants.

The DuckDB oracle must encode the SAME published tables as the engine
(stop sets from StopAnalyzer.cs / the contrib analyzers, Snowball suffix
tables from src/contrib/Snowball/SF/Snowball/Ext/*.cs, the
StandardTokenizer alternation re-derived from
StandardTokenizerImpl.jflex, NumberTools base-36 framing from
Document/NumberTools.cs, the minhash affine family) — but it must not
IMPORT them from the engine, or a typo in a shared table would pass both
sides.  Every constant here is a literal transcription; the helper
functions are independent re-implementations.
tests/test_oracle_drift.py asserts each copy equals its engine
counterpart, so a one-sided edit fails loudly instead of silently
passing the oracle.
"""

from __future__ import annotations

import re

ENGLISH_STOP_WORDS = frozenset(['a', 'an', 'and', 'are', 'as', 'at', 'be', 'but', 'by', 'for', 'if',
 'in', 'into', 'is', 'it', 'no', 'not', 'of', 'on', 'or', 'such',
 'that', 'the', 'their', 'then', 'there', 'these', 'they', 'this', 'to',
 'was', 'will', 'with'])

MAX_TOKEN_LENGTH = 255

STANDARD_ALTERNATION = "[a-z0-9]+(?:[._-][a-z0-9]+)*@[a-z0-9]+(?:[.-][a-z0-9]+)+|[a-z]+(?:'[a-z]+)+|[a-z]+[&@][a-z]+|(?:[a-z0-9]+[_\\-/.,])?[a-z]*[0-9][a-z0-9]*(?:[_\\-/.,][a-z0-9]+[_\\-/.,][a-z]*[0-9][a-z0-9]*)*(?:[_\\-/.,][a-z0-9]+)?|[a-z0-9]+(?:\\.[a-z0-9]+)+\\.?|[a-z0-9]+"

LANG_MARKERS = {'de': ('der', 'die', 'und', 'das', 'von', 'mit', 'den', 'für', 'ist',
        'auf'),
 'en': ('the', 'of', 'and', 'to', 'in', 'is', 'it', 'that', 'for',
        'was'),
 'es': ('el', 'la', 'de', 'que', 'y', 'en', 'los', 'del', 'las', 'por'),
 'fr': ('le', 'la', 'de', 'et', 'les', 'des', 'un', 'une', 'du', 'que')}

SB_EXC1 = {'andes': 'andes',
 'atlas': 'atlas',
 'bias': 'bias',
 'cosmos': 'cosmos',
 'dying': 'die',
 'early': 'earli',
 'gently': 'gentl',
 'howe': 'howe',
 'idly': 'idl',
 'lying': 'lie',
 'news': 'news',
 'only': 'onli',
 'singly': 'singl',
 'skies': 'sky',
 'skis': 'ski',
 'sky': 'sky',
 'tying': 'tie',
 'ugly': 'ugli'}

SB_EXC2 = {'canning', 'earring', 'exceed', 'herring', 'inning', 'outing',
 'proceed', 'succeed'}

SB_DOUBLES = ('bb', 'dd', 'ff', 'gg', 'mm', 'nn', 'pp', 'rr', 'tt')

SB_VALID_LI = {'m', 'k', 'c', 'n', 't', 'h', 'e', 'r', 'g', 'd'}

SB_STEP2 = [('ational', 'ate'), ('ization', 'ize'), ('fulness', 'ful'),
 ('ousness', 'ous'), ('iveness', 'ive'), ('tional', 'tion'),
 ('biliti', 'ble'), ('lessli', 'less'), ('entli', 'ent'),
 ('aliti', 'al'), ('alism', 'al'), ('iviti', 'ive'), ('fulli', 'ful'),
 ('ousli', 'ous'), ('ation', 'ate'), ('enci', 'ence'), ('anci', 'ance'),
 ('abli', 'able'), ('izer', 'ize'), ('ator', 'ate'), ('alli', 'al'),
 ('bli', 'ble')]

SB_STEP3 = [('ational', 'ate'), ('tional', 'tion'), ('alize', 'al'),
 ('icate', 'ic'), ('iciti', 'ic'), ('ical', 'ic'), ('ness', ''),
 ('ful', '')]

SB_STEP4 = ['ement', 'ance', 'ence', 'able', 'ible', 'ment', 'ant', 'ent', 'ism',
 'ate', 'iti', 'ous', 'ive', 'ize', 'ion', 'al', 'er', 'ic']

SB_S_ENDING = {'m', 'b', 'k', 'f', 'l', 'n', 't', 'h', 'r', 'g', 'd'}

SB_ST_ENDING = {'m', 'b', 'k', 'f', 'l', 'n', 't', 'h', 'g', 'd'}

GERMAN_STOP_WORDS = frozenset(['als', 'am', 'auf', 'aus', 'das', 'dass', 'daß', 'der', 'dich', 'die',
 'dir', 'du', 'durch', 'eine', 'einem', 'einen', 'einer', 'eines', 'er',
 'es', 'für', 'ihr', 'ihre', 'ihres', 'im', 'in', 'ist', 'kein', 'mein',
 'mich', 'mir', 'mit', 'oder', 'ohne', 'sein', 'sie', 'und', 'von',
 'war', 'was', 'wegen', 'wer', 'wie', 'wir', 'wird'])

RU_PERFECTIVE_GERUND_1 = ('в', 'вши', 'вшись')

RU_PERFECTIVE_GERUND_2 = ('ив', 'ыв', 'ивши', 'ывши', 'ившись', 'ывшись')

RU_REFLEXIVE = ('ся', 'сь')

RU_ADJECTIVE = ('ее', 'ие', 'ые', 'ое', 'ей', 'ий', 'ый', 'ой', 'ем', 'им', 'ым', 'ом',
 'их', 'ых', 'ую', 'юю', 'ая', 'яя', 'ою', 'ею', 'ими', 'ыми', 'его',
 'ого', 'ему', 'ому')

RU_PARTICIPLE_1 = ('щ', 'ем', 'нн', 'вш', 'ющ')

RU_PARTICIPLE_2 = ('ивш', 'ывш', 'ующ')

RU_VERB_1 = ('й', 'л', 'н', 'ло', 'но', 'ет', 'ют', 'ла', 'на', 'ли', 'ем', 'ны',
 'ете', 'йте', 'ть', 'ешь', 'нно')

RU_VERB_2 = ('ю', 'ую', 'ен', 'ей', 'ят', 'уй', 'ил', 'ыл', 'им', 'ым', 'ит', 'ыт',
 'ила', 'ыла', 'ена', 'ите', 'или', 'ыли', 'ило', 'ыло', 'ено', 'ует',
 'уют', 'ены', 'ить', 'ыть', 'ишь', 'ейте', 'уйте')

RU_NOUN = ('а', 'у', 'й', 'о', 'у', 'е', 'ы', 'и', 'ь', 'я', 'ев', 'ов', 'ие',
 'ье', 'ях', 'ию', 'еи', 'ии', 'ей', 'ой', 'ем', 'ам', 'ом', 'ах', 'ью',
 'ия', 'ья', 'ий', 'ям', 'ями', 'ами', 'ией', 'иям', 'ием', 'иях',
 'иями')

RU_DERIVATIONAL = ('ост', 'ость')

RU_SUPERLATIVE = ('ейш', 'ейше')

_AR_PREFIXES = ('ال', 'وال', 'بال', 'كال', 'فال', 'لل', 'و')

_AR_SUFFIXES = ('ها', 'ان', 'ات', 'ون', 'ين', 'يه', 'ية', 'ه', 'ة', 'ي')

RUSSIAN_STOP_WORDS = frozenset(['а', 'без', 'более', 'бы', 'был', 'была', 'были', 'было', 'быть', 'в',
 'вам', 'вас', 'весь', 'во', 'вот', 'все', 'всего', 'всех', 'вы', 'где',
 'да', 'даже', 'для', 'до', 'его', 'ее', 'ей', 'если', 'есть', 'еще',
 'ею', 'же', 'за', 'здесь', 'и', 'из', 'или', 'им', 'их', 'к', 'как',
 'ко', 'когда', 'кто', 'ли', 'либо', 'мне', 'может', 'мы', 'на', 'надо',
 'наш', 'не', 'него', 'нее', 'нет', 'ни', 'них', 'но', 'ну', 'о', 'об',
 'однако', 'он', 'она', 'они', 'оно', 'от', 'очень', 'по', 'под', 'при',
 'с', 'со', 'так', 'также', 'такой', 'там', 'те', 'тем', 'то', 'того',
 'тоже', 'той', 'только', 'том', 'ты', 'у', 'уже', 'хотя', 'чего',
 'чей', 'чем', 'что', 'чтобы', 'чье', 'чья', 'эта', 'эти', 'это', 'я'])

GREEK_STOP_WORDS = frozenset(['αλλα', 'αν', 'αντι', 'απο', 'αυτα', 'αυτεσ', 'αυτη', 'αυτο', 'αυτοι',
 'αυτοσ', 'αυτουσ', 'αυτων', 'για', 'δε', 'δεν', 'εαν', 'ειμαι',
 'ειμαστε', 'ειναι', 'εισαι', 'ειστε', 'εκεινα', 'εκεινεσ', 'εκεινη',
 'εκεινο', 'εκεινοι', 'εκεινοσ', 'εκεινουσ', 'εκεινων', 'ενω', 'επι',
 'η', 'θα', 'ισωσ', 'κ', 'και', 'κατα', 'κι', 'μα', 'με', 'μετα', 'μη',
 'μην', 'να', 'ο', 'οι', 'ομωσ', 'οπωσ', 'οσο', 'οτι', 'παρα', 'ποια',
 'ποιεσ', 'ποιο', 'ποιοι', 'ποιοσ', 'ποιουσ', 'ποιων', 'που', 'προσ',
 'πωσ', 'σε', 'στη', 'στην', 'στο', 'στον', 'τα', 'την', 'τησ', 'το',
 'τον', 'τοτε', 'του', 'των', 'ωσ'])

ARABIC_STOP_WORDS = frozenset(['،', 'أ', 'ا', 'اثر', 'اجل', 'احد', 'اخرى', 'اذا', 'اربعة', 'اطار',
 'اعادة', 'اعلنت', 'اف', 'اكثر', 'اكد', 'الا', 'الاخيرة', 'الان',
 'الاول', 'الاولى', 'التى', 'التي', 'الثاني', 'الثانية', 'الذاتي',
 'الذى', 'الذي', 'الذين', 'السابق', 'الف', 'الماضي', 'المقبل', 'الوقت',
 'الى', 'اليوم', 'اما', 'امام', 'امس', 'ان', 'انه', 'انها', 'او', 'اول',
 'اي', 'ايار', 'ايام', 'ايضا', 'ب', 'باسم', 'بان', 'برس', 'بسبب',
 'بشكل', 'بعد', 'بعض', 'بن', 'به', 'بها', 'بين', 'تم', 'ثلاثة', 'ثم',
 'جميع', 'حاليا', 'حتى', 'حوالى', 'حول', 'حيث', 'حين', 'خلال', 'دون',
 'ذلك', 'زيارة', 'سنة', 'سنوات', 'شخصا', 'صباح', 'صفر', 'ضد', 'ضمن',
 'عام', 'عاما', 'عدة', 'عدد', 'عدم', 'عشر', 'عشرة', 'على', 'عليه',
 'عليها', 'عن', 'عند', 'عندما', 'غدا', 'غير', 'ـ', 'ف', 'فان', 'فى',
 'في', 'فيه', 'فيها', 'قال', 'قبل', 'قد', 'قوة', 'كان', 'كانت', 'كل',
 'كلم', 'كما', 'لا', 'لدى', 'لقاء', 'لكن', 'للامم', 'لم', 'لن', 'له',
 'لها', 'لوكالة', 'ما', 'مايو', 'مساء', 'مع', 'مقابل', 'مليار', 'مليون',
 'من', 'منذ', 'منها', 'نحو', 'نفسه', 'نهاية', 'هذا', 'هذه', 'هناك',
 'هو', 'هي', 'و', 'و6', 'واحد', 'واضاف', 'واضافت', 'واكد', 'وان',
 'واوضح', 'وفي', 'وقال', 'وقالت', 'وقد', 'وقف', 'وكان', 'وكانت', 'ولا',
 'ولم', 'ومن', 'وهو', 'وهي', 'يكون', 'يمكن', 'يوم'])

CZECH_STOP_WORDS = frozenset(['a', 'aby', 'aj', 'ale', 'ani', 'asi', 'atd', 'atp', 'až', 'bez',
 'bude', 'budem', 'budeš', 'by', 'byl', 'byla', 'byli', 'bylo', 'být',
 'co', 'což', 'cz', 'další', 'dnes', 'do', 'ho', 'i', 'jak', 'jakmile',
 'jako', 'jakož', 'je', 'jeho', 'jehož', 'jej', 'jejich', 'její',
 'jelikož', 'jemu', 'jen', 'ještě', 'jež', 'ji', 'jiné', 'již', 'jsem',
 'jseš', 'jsme', 'jsou', 'jste', 'já', 'jí', 'jíž', 'k', 'kam', 'kde',
 'kdo', 'když', 'ke', 'kterou', 'která', 'které', 'který', 'kteří',
 'mezi', 'mi', 'mne', 'my', 'má', 'máte', 'mít', 'mě', 'můj', 'může',
 'na', 'nad', 'napište', 'načež', 'naši', 'nebo', 'neg', 'nejsou',
 'není', 'než', 'nic', 'nové', 'nový', 'nám', 'nás', 'němu', 'němuž',
 'o', 'od', 'on', 'ona', 'oni', 'ono', 'ony', 'pak', 'po', 'pod',
 'podle', 'pokud', 'pouze', 'pravé', 'pro', 'proto', 'protože', 'proč',
 'první', 'pta', 'před', 'přes', 'při', 'přičemž', 're', 's', 'se',
 'si', 'strana', 'své', 'svých', 'svým', 'svými', 'ta', 'tak', 'také',
 'takže', 'tato', 'tedy', 'ten', 'tento', 'teto', 'tipy', 'to', 'tohle',
 'toho', 'tohoto', 'tom', 'tomto', 'tomu', 'tomuto', 'tu', 'tuto', 'ty',
 'tyto', 'téma', 'tím', 'tímto', 'těm', 'těmu', 'u', 'už', 'v', 'vaše',
 've', 'vy', 'vám', 'vás', 'více', 'však', 'z', 'za', 'zda', 'zde',
 'ze', 'zprávy', 'zpět', 'či', 'článku', 'články'])

M30 = 1073741823

MH_PRIME = 2305843009213693951


# ---- independent helper re-implementations ---------------------------

STANDARD_TOKEN_RE = re.compile(STANDARD_ALTERNATION)
_ACRONYM_RE = re.compile(r"(?:[a-z]\.){2,}")


def std_transform(tok: str) -> str:
    """StandardFilter + invalid-acronym repair (oracle copy of
    analysis/tokenizers._std_transform): possessive strip, acronym dot
    removal, trailing-dot HOST repair."""
    if tok.endswith("'s"):
        tok = tok[:-2]
    if _ACRONYM_RE.fullmatch(tok):
        return tok.replace(".", "")
    if tok.endswith("."):
        return tok[:-1]
    return tok


def tokenize_standard(text: str) -> list[tuple[str, int]]:
    """Oracle copy of the standard chain (tokenize -> StandardFilter ->
    lowercase -> length filter -> stop filter w/ holes), used only to
    pre-tokenize QUERY text when building oracle SQL."""
    if text is None:
        return []
    out: list[tuple[str, int]] = []
    for pos, tok in enumerate(STANDARD_TOKEN_RE.findall(text.lower())):
        tok = std_transform(tok)
        if len(tok) > MAX_TOKEN_LENGTH or tok in ENGLISH_STOP_WORDS:
            continue
        out.append((tok, pos))
    return out


def gram_range(length: int) -> tuple[int, int]:
    """SpellChecker.GetMin/GetMax (SpellChecker.cs:446-470)."""
    if length > 5:
        return 3, 4
    if length == 5:
        return 2, 3
    return 1, 2


def word_grams(word: str) -> list[str]:
    """FormGrams over the query word (SpellChecker.cs:482-491),
    deduplicated + sorted — oracle copy of operators/spell.word_grams."""
    lo, hi = gram_range(len(word))
    return sorted({word[i:i + ng]
                   for ng in range(lo, hi + 1)
                   for i in range(len(word) - ng + 1)})


_NT_DIGITS = "0123456789abcdefghijklmnopqrstuvwxyz"
_NT_MIN, _NT_MAX = -(1 << 63), (1 << 63) - 1
_NT_PAYLOAD = 13  # ceil(63 bits / log2(36))


def long_to_string(l: int) -> str:
    """NumberTools.LongToString (NumberTools.cs:78-115) — oracle copy of
    functions/numbertools.long_to_string."""
    if not _NT_MIN <= l <= _NT_MAX:
        raise ValueError(f"out of int64 range: {l}")
    if l == _NT_MIN:
        return "-" + "0" * _NT_PAYLOAD
    prefix = "0"
    if l < 0:
        prefix, l = "-", _NT_MAX + l + 1
    if l == 0:
        s = "0"
    else:
        out = []
        while l:
            l, r = divmod(l, 36)
            out.append(_NT_DIGITS[r])
        s = "".join(reversed(out))
    return prefix + s.rjust(_NT_PAYLOAD, "0")


def mh_consts(num_hashes: int) -> list[tuple[int, int]]:
    """The deterministic minhash affine family (a_i, b_i) — oracle copy
    of operators/dedup.mh_consts; products stay < 2^60 for DuckDB
    BIGINTs."""
    return [
        ((1103515245 * i + 12345) % (1 << 30) | 1,
         (2654435761 * i + 99991) % (1 << 30))
        for i in range(num_hashes)
    ]


# ---- Snowball breadth (SV/NL/ES/PT/IT/FR) transcriptions ----------
# (oracle copies of analysis/snowball_ext.py's among tables; pinned
# equal by tests/test_oracle_drift.py)

SV_VOWELS = 'aeiouyäåö'

SV_S_ENDING = frozenset(['b', 'c', 'd', 'f', 'g', 'h', 'j', 'k', 'l', 'm', 'n', 'o', 'p', 'r',
 't', 'v', 'y'])

SV_MAIN = [('a', 1), ('arna', 1), ('erna', 1), ('heterna', 1), ('orna', 1),
 ('ad', 1), ('e', 1), ('ade', 1), ('ande', 1), ('arne', 1), ('are', 1),
 ('aste', 1), ('en', 1), ('anden', 1), ('aren', 1), ('heten', 1),
 ('ern', 1), ('ar', 1), ('er', 1), ('heter', 1), ('or', 1), ('s', 2),
 ('as', 1), ('arnas', 1), ('ernas', 1), ('ornas', 1), ('es', 1),
 ('ades', 1), ('andes', 1), ('ens', 1), ('arens', 1), ('hetens', 1),
 ('erns', 1), ('at', 1), ('andet', 1), ('het', 1), ('ast', 1)]

SV_PAIRS = ('dd', 'gd', 'nn', 'dt', 'gt', 'kt', 'tt')

SV_OTHER = [('ig', 1), ('lig', 1), ('els', 1), ('fullt', 3), ('löst', 2)]

DA_VOWELS = 'aeiouyåæø'

DA_S_ENDING = frozenset(['a', 'b', 'c', 'd', 'f', 'g', 'h', 'j', 'k', 'l', 'm', 'n', 'o',
 'p', 'r', 't', 'v', 'y', 'z', 'å'])

DA_MAIN = [('hed', 1), ('ethed', 1), ('ered', 1), ('e', 1), ('erede', 1),
 ('ende', 1), ('erende', 1), ('ene', 1), ('erne', 1), ('ere', 1),
 ('en', 1), ('heden', 1), ('eren', 1), ('er', 1), ('heder', 1),
 ('erer', 1), ('s', 2), ('heds', 1), ('es', 1), ('endes', 1),
 ('erendes', 1), ('enes', 1), ('ernes', 1), ('eres', 1), ('ens', 1),
 ('hedens', 1), ('erens', 1), ('ers', 1), ('ets', 1), ('erets', 1),
 ('et', 1), ('eret', 1)]

DA_PAIRS = ('gd', 'dt', 'gt', 'kt')

DA_OTHER = [('ig', 1), ('lig', 1), ('elig', 1), ('els', 1), ('løst', 2)]

NO_VOWELS = 'aeiouyåæø'

NO_S_ENDING = frozenset(['b', 'c', 'd', 'f', 'g', 'h', 'j', 'k', 'l', 'm', 'n', 'o', 'p',
 'r', 't', 'v', 'y', 'z'])

NO_MAIN = [('a', 1), ('e', 1), ('ede', 1), ('ande', 1), ('ende', 1),
 ('ane', 1), ('ene', 1), ('hetene', 1), ('erte', 3), ('en', 1),
 ('heten', 1), ('ar', 1), ('er', 1), ('heter', 1), ('s', 2),
 ('as', 1), ('es', 1), ('edes', 1), ('endes', 1), ('enes', 1),
 ('hetenes', 1), ('ens', 1), ('hetens', 1), ('ers', 1), ('ets', 1),
 ('et', 1), ('het', 1), ('ert', 3), ('ast', 1)]

NO_PAIRS = ('dt', 'vt')

NO_OTHER = [('leg', 1), ('eleg', 1), ('ig', 1), ('eig', 1), ('lig', 1),
 ('elig', 1), ('els', 1), ('lov', 1), ('elov', 1), ('slov', 1),
 ('hetslov', 1)]

FI_VOWELS = 'aeiouyäö'

FI_V_RESTR = 'aeiouäö'

FI_AEI = 'aeiä'

FI_PARTICLE_END = 'aeinotuyäö'

FI_LONG = ('aa', 'ee', 'ii', 'oo', 'uu', 'ää', 'öö')

FI_PARTICLE = [('pa', 1), ('sti', 2), ('kaan', 1), ('han', 1), ('kin', 1),
 ('hän', 1), ('kään', 1), ('ko', 1), ('pä', 1), ('kö', 1)]

FI_POSS = [('nsa', 3), ('mme', 3), ('nne', 3), ('ni', 2), ('si', 1),
 ('an', 4), ('en', 6), ('än', 5), ('nsä', 3)]

FI_A1 = ('lla', 'na', 'ssa', 'ta', 'lta', 'sta')

FI_A2 = ('llä', 'nä', 'ssä', 'tä', 'ltä', 'stä')

FI_A3 = ('lle', 'ine')

FI_CASE = [('a', 8, None), ('lla', -1, None), ('na', -1, None),
 ('ssa', -1, None), ('ta', -1, None), ('lta', -1, None),
 ('sta', -1, None), ('tta', 9, None), ('lle', -1, None),
 ('ine', -1, None), ('ksi', -1, None), ('n', 7, None),
 ('han', 1, None), ('den', -1, 'VI'), ('seen', -1, 'LONG'),
 ('hen', 2, None), ('tten', -1, 'VI'), ('hin', 3, None),
 ('siin', -1, 'VI'), ('hon', 4, None), ('hän', 5, None),
 ('hön', 6, None), ('ä', 8, None), ('llä', -1, None),
 ('nä', -1, None), ('ssä', -1, None), ('tä', -1, None),
 ('ltä', -1, None), ('stä', -1, None), ('ttä', 9, None)]

FI_OTHER = [('eja', -1), ('mma', 1), ('imma', -1), ('mpa', 1), ('impa', -1),
 ('mmi', 1), ('immi', -1), ('mpi', 1), ('impi', -1), ('ejä', -1),
 ('mmä', 1), ('immä', -1), ('mpä', 1), ('impä', -1)]

FI_TPLUR = [('mma', 1), ('imma', -1)]

RO_VOWELS = 'aeiouâîă'

RO_STEP0 = [('ea', 3),
 ('aţia', 7),
 ('aua', 2),
 ('iua', 4),
 ('aţie', 7),
 ('ele', 3),
 ('ile', 5),
 ('iile', 4),
 ('iei', 4),
 ('atei', 6),
 ('ii', 4),
 ('ului', 1),
 ('ul', 1),
 ('elor', 3),
 ('ilor', 4),
 ('iilor', 4)]

RO_COMBO = [('icala', 4),
 ('iciva', 4),
 ('ativa', 5),
 ('itiva', 6),
 ('icale', 4),
 ('aţiune', 5),
 ('iţiune', 6),
 ('atoare', 5),
 ('itoare', 6),
 ('ătoare', 5),
 ('icitate', 4),
 ('abilitate', 1),
 ('ibilitate', 2),
 ('ivitate', 3),
 ('icive', 4),
 ('ative', 5),
 ('itive', 6),
 ('icali', 4),
 ('atori', 5),
 ('icatori', 4),
 ('itori', 6),
 ('ători', 5),
 ('icitati', 4),
 ('abilitati', 1),
 ('ivitati', 3),
 ('icivi', 4),
 ('ativi', 5),
 ('itivi', 6),
 ('icităi', 4),
 ('abilităi', 1),
 ('ivităi', 3),
 ('icităţi', 4),
 ('abilităţi', 1),
 ('ivităţi', 3),
 ('ical', 4),
 ('ator', 5),
 ('icator', 4),
 ('itor', 6),
 ('ător', 5),
 ('iciv', 4),
 ('ativ', 5),
 ('itiv', 6),
 ('icală', 4),
 ('icivă', 4),
 ('ativă', 5),
 ('itivă', 6)]

RO_COMBO_REPL = {1: 'abil', 2: 'ibil', 3: 'iv', 4: 'ic', 5: 'at', 6: 'it'}

RO_STD = [('ica', 1),
 ('abila', 1),
 ('ibila', 1),
 ('oasa', 1),
 ('ata', 1),
 ('ita', 1),
 ('anta', 1),
 ('ista', 3),
 ('uta', 1),
 ('iva', 1),
 ('ic', 1),
 ('ice', 1),
 ('abile', 1),
 ('ibile', 1),
 ('isme', 3),
 ('iune', 2),
 ('oase', 1),
 ('ate', 1),
 ('itate', 1),
 ('ite', 1),
 ('ante', 1),
 ('iste', 3),
 ('ute', 1),
 ('ive', 1),
 ('ici', 1),
 ('abili', 1),
 ('ibili', 1),
 ('iuni', 2),
 ('atori', 1),
 ('osi', 1),
 ('ati', 1),
 ('itati', 1),
 ('iti', 1),
 ('anti', 1),
 ('isti', 3),
 ('uti', 1),
 ('işti', 3),
 ('ivi', 1),
 ('ităi', 1),
 ('oşi', 1),
 ('ităţi', 1),
 ('abil', 1),
 ('ibil', 1),
 ('ism', 3),
 ('ator', 1),
 ('os', 1),
 ('at', 1),
 ('it', 1),
 ('ant', 1),
 ('ist', 3),
 ('ut', 1),
 ('iv', 1),
 ('ică', 1),
 ('abilă', 1),
 ('ibilă', 1),
 ('oasă', 1),
 ('ată', 1),
 ('ită', 1),
 ('antă', 1),
 ('istă', 3),
 ('ută', 1),
 ('ivă', 1)]

RO_VERB = [('ea', 1),
 ('ia', 1),
 ('esc', 1),
 ('ăsc', 1),
 ('ind', 1),
 ('ând', 1),
 ('are', 1),
 ('ere', 1),
 ('ire', 1),
 ('âre', 1),
 ('se', 2),
 ('ase', 1),
 ('sese', 2),
 ('ise', 1),
 ('use', 1),
 ('âse', 1),
 ('eşte', 1),
 ('ăşte', 1),
 ('eze', 1),
 ('ai', 1),
 ('eai', 1),
 ('iai', 1),
 ('sei', 2),
 ('eşti', 1),
 ('ăşti', 1),
 ('ui', 1),
 ('ezi', 1),
 ('âi', 1),
 ('aşi', 1),
 ('seşi', 2),
 ('aseşi', 1),
 ('seseşi', 2),
 ('iseşi', 1),
 ('useşi', 1),
 ('âseşi', 1),
 ('işi', 1),
 ('uşi', 1),
 ('âşi', 1),
 ('aţi', 2),
 ('eaţi', 1),
 ('iaţi', 1),
 ('eţi', 2),
 ('iţi', 2),
 ('âţi', 2),
 ('arăţi', 1),
 ('serăţi', 2),
 ('aserăţi', 1),
 ('seserăţi', 2),
 ('iserăţi', 1),
 ('userăţi', 1),
 ('âserăţi', 1),
 ('irăţi', 1),
 ('urăţi', 1),
 ('ârăţi', 1),
 ('am', 1),
 ('eam', 1),
 ('iam', 1),
 ('em', 2),
 ('asem', 1),
 ('sesem', 2),
 ('isem', 1),
 ('usem', 1),
 ('âsem', 1),
 ('im', 2),
 ('âm', 2),
 ('ăm', 2),
 ('arăm', 1),
 ('serăm', 2),
 ('aserăm', 1),
 ('seserăm', 2),
 ('iserăm', 1),
 ('userăm', 1),
 ('âserăm', 1),
 ('irăm', 1),
 ('urăm', 1),
 ('ârăm', 1),
 ('au', 1),
 ('eau', 1),
 ('iau', 1),
 ('indu', 1),
 ('ându', 1),
 ('ez', 1),
 ('ească', 1),
 ('ară', 1),
 ('seră', 2),
 ('aseră', 1),
 ('seseră', 2),
 ('iseră', 1),
 ('useră', 1),
 ('âseră', 1),
 ('iră', 1),
 ('ură', 1),
 ('âră', 1),
 ('ează', 1)]

RO_VOWEL_SUF = [('a', 1), ('e', 1), ('ie', 1), ('i', 1), ('ă', 1)]

HU_VOWELS = 'aeiouáéíóõöúûü'

HU_DIGRAPHS = ('cs', 'dzs', 'gy', 'ly', 'ny', 'sz', 'ty', 'zs')

HU_DOUBLE = ('bb',
 'cc',
 'dd',
 'ff',
 'gg',
 'jj',
 'kk',
 'll',
 'mm',
 'nn',
 'pp',
 'rr',
 'ccs',
 'ss',
 'zzs',
 'tt',
 'vv',
 'ggy',
 'lly',
 'nny',
 'tty',
 'ssz',
 'zz')

HU_INSTRUM = [('al', 1), ('el', 1)]

HU_CASE = [('ba', 1),
 ('ra', 1),
 ('be', 1),
 ('re', 1),
 ('ig', 1),
 ('nak', 1),
 ('nek', 1),
 ('val', 1),
 ('vel', 1),
 ('ul', 1),
 ('nál', 1),
 ('nél', 1),
 ('ból', 1),
 ('ról', 1),
 ('tól', 1),
 ('bõl', 1),
 ('rõl', 1),
 ('tõl', 1),
 ('ül', 1),
 ('n', 1),
 ('an', 1),
 ('ban', 1),
 ('en', 1),
 ('ben', 1),
 ('képpen', 1),
 ('on', 1),
 ('ön', 1),
 ('képp', 1),
 ('kor', 1),
 ('t', 1),
 ('at', 1),
 ('et', 1),
 ('ként', 1),
 ('anként', 1),
 ('enként', 1),
 ('onként', 1),
 ('ot', 1),
 ('ért', 1),
 ('öt', 1),
 ('hez', 1),
 ('hoz', 1),
 ('höz', 1),
 ('vá', 1),
 ('vé', 1)]

HU_CASE_SPECIAL = [('án', 'a'), ('én', 'e'), ('ánként', 'a')]

HU_CASE_OTHER = [('stul', ''),
 ('astul', ''),
 ('ástul', 'a'),
 ('stül', ''),
 ('estül', ''),
 ('éstül', 'e')]

HU_FACTIVE = [('á', 1), ('é', 1)]

HU_PLURAL = [('k', ''),
 ('ak', ''),
 ('ek', ''),
 ('ok', ''),
 ('ák', 'a'),
 ('ék', 'e'),
 ('ök', '')]

HU_OWNED = [('éi', ''),
 ('áéi', 'a'),
 ('ééi', 'e'),
 ('é', ''),
 ('ké', ''),
 ('aké', ''),
 ('eké', ''),
 ('oké', ''),
 ('áké', 'a'),
 ('éké', 'e'),
 ('öké', ''),
 ('éé', 'e')]

HU_SING_OWNER = [('a', ''),
 ('ja', ''),
 ('d', ''),
 ('ad', ''),
 ('ed', ''),
 ('od', ''),
 ('ád', 'a'),
 ('éd', 'e'),
 ('öd', ''),
 ('e', ''),
 ('je', ''),
 ('nk', ''),
 ('unk', ''),
 ('ánk', 'a'),
 ('énk', 'e'),
 ('ünk', ''),
 ('uk', ''),
 ('juk', ''),
 ('ájuk', 'a'),
 ('ük', ''),
 ('jük', ''),
 ('éjük', 'e'),
 ('m', ''),
 ('am', ''),
 ('em', ''),
 ('om', ''),
 ('ám', 'a'),
 ('ém', 'e'),
 ('o', ''),
 ('á', 'a'),
 ('é', 'e')]

HU_PLUR_OWNER = [('id', ''),
 ('aid', ''),
 ('jaid', ''),
 ('eid', ''),
 ('jeid', ''),
 ('áid', 'a'),
 ('éid', 'e'),
 ('i', ''),
 ('ai', ''),
 ('jai', ''),
 ('ei', ''),
 ('jei', ''),
 ('ái', 'a'),
 ('éi', 'e'),
 ('itek', ''),
 ('eitek', ''),
 ('jeitek', ''),
 ('éitek', 'e'),
 ('ik', ''),
 ('aik', ''),
 ('jaik', ''),
 ('eik', ''),
 ('jeik', ''),
 ('áik', 'a'),
 ('éik', 'e'),
 ('ink', ''),
 ('aink', ''),
 ('jaink', ''),
 ('eink', ''),
 ('jeink', ''),
 ('áink', 'a'),
 ('éink', 'e'),
 ('aitok', ''),
 ('jaitok', ''),
 ('áitok', 'a'),
 ('im', ''),
 ('aim', ''),
 ('jaim', ''),
 ('eim', ''),
 ('jeim', ''),
 ('áim', 'a'),
 ('éim', 'e')]

LOVINS_ENDINGS = [("s'", 'A'),
 ('a', 'A'),
 ('ia', 'A'),
 ('ata', 'A'),
 ('ic', 'A'),
 ('aic', 'A'),
 ('allic', 'BB'),
 ('aric', 'A'),
 ('atic', 'B'),
 ('itic', 'H'),
 ('antic', 'C'),
 ('istic', 'A'),
 ('alistic', 'B'),
 ('aristic', 'A'),
 ('ivistic', 'A'),
 ('ed', 'E'),
 ('anced', 'B'),
 ('enced', 'A'),
 ('ished', 'A'),
 ('ied', 'A'),
 ('ened', 'E'),
 ('ioned', 'A'),
 ('ated', 'I'),
 ('ented', 'C'),
 ('ized', 'F'),
 ('arized', 'A'),
 ('oid', 'A'),
 ('aroid', 'A'),
 ('hood', 'A'),
 ('ehood', 'A'),
 ('ihood', 'A'),
 ('elihood', 'E'),
 ('ward', 'A'),
 ('e', 'A'),
 ('ae', 'A'),
 ('ance', 'B'),
 ('icance', 'A'),
 ('ence', 'A'),
 ('ide', 'L'),
 ('icide', 'A'),
 ('otide', 'A'),
 ('age', 'B'),
 ('able', 'A'),
 ('atable', 'A'),
 ('izable', 'E'),
 ('arizable', 'A'),
 ('ible', 'A'),
 ('encible', 'A'),
 ('ene', 'E'),
 ('ine', 'M'),
 ('idine', 'I'),
 ('one', 'R'),
 ('ature', 'E'),
 ('eature', 'Z'),
 ('ese', 'A'),
 ('wise', 'A'),
 ('ate', 'A'),
 ('entiate', 'A'),
 ('inate', 'A'),
 ('ionate', 'D'),
 ('ite', 'AA'),
 ('ive', 'A'),
 ('ative', 'A'),
 ('ize', 'F'),
 ('alize', 'A'),
 ('icalize', 'A'),
 ('ialize', 'A'),
 ('entialize', 'A'),
 ('ionalize', 'A'),
 ('arize', 'A'),
 ('ing', 'N'),
 ('ancing', 'B'),
 ('encing', 'A'),
 ('aging', 'B'),
 ('ening', 'E'),
 ('ioning', 'A'),
 ('ating', 'I'),
 ('enting', 'C'),
 ('ying', 'B'),
 ('izing', 'F'),
 ('arizing', 'A'),
 ('ish', 'C'),
 ('yish', 'A'),
 ('i', 'A'),
 ('al', 'BB'),
 ('ical', 'A'),
 ('aical', 'A'),
 ('istical', 'A'),
 ('oidal', 'A'),
 ('eal', 'Y'),
 ('ial', 'A'),
 ('ancial', 'A'),
 ('arial', 'A'),
 ('ential', 'A'),
 ('ional', 'A'),
 ('ational', 'B'),
 ('izational', 'A'),
 ('ental', 'A'),
 ('ful', 'A'),
 ('eful', 'A'),
 ('iful', 'A'),
 ('yl', 'R'),
 ('ism', 'B'),
 ('icism', 'A'),
 ('oidism', 'A'),
 ('alism', 'B'),
 ('icalism', 'A'),
 ('ionalism', 'A'),
 ('inism', 'J'),
 ('ativism', 'A'),
 ('um', 'U'),
 ('ium', 'A'),
 ('ian', 'A'),
 ('ician', 'A'),
 ('en', 'F'),
 ('ogen', 'A'),
 ('on', 'S'),
 ('ion', 'Q'),
 ('ation', 'B'),
 ('ication', 'G'),
 ('entiation', 'A'),
 ('ination', 'A'),
 ('isation', 'A'),
 ('arisation', 'A'),
 ('entation', 'A'),
 ('ization', 'F'),
 ('arization', 'A'),
 ('action', 'G'),
 ('o', 'A'),
 ('ar', 'X'),
 ('ear', 'Y'),
 ('ier', 'A'),
 ('ariser', 'A'),
 ('izer', 'F'),
 ('arizer', 'A'),
 ('or', 'T'),
 ('ator', 'A'),
 ('s', 'W'),
 ("'s", 'A'),
 ('as', 'B'),
 ('ics', 'A'),
 ('istics', 'A'),
 ('es', 'E'),
 ('ances', 'B'),
 ('ences', 'A'),
 ('ides', 'L'),
 ('oides', 'A'),
 ('ages', 'B'),
 ('ies', 'P'),
 ('acies', 'A'),
 ('ancies', 'A'),
 ('encies', 'A'),
 ('aries', 'A'),
 ('ities', 'A'),
 ('alities', 'A'),
 ('ivities', 'A'),
 ('ines', 'M'),
 ('nesses', 'A'),
 ('ates', 'A'),
 ('atives', 'A'),
 ('ings', 'N'),
 ('is', 'A'),
 ('als', 'BB'),
 ('ials', 'A'),
 ('entials', 'A'),
 ('ionals', 'A'),
 ('isms', 'B'),
 ('ians', 'A'),
 ('icians', 'A'),
 ('ions', 'B'),
 ('ations', 'B'),
 ('arisations', 'A'),
 ('entations', 'A'),
 ('izations', 'A'),
 ('arizations', 'A'),
 ('ars', 'O'),
 ('iers', 'A'),
 ('izers', 'F'),
 ('ators', 'A'),
 ('less', 'A'),
 ('eless', 'A'),
 ('ness', 'A'),
 ('eness', 'E'),
 ('ableness', 'A'),
 ('eableness', 'E'),
 ('ibleness', 'A'),
 ('ateness', 'A'),
 ('iteness', 'A'),
 ('iveness', 'A'),
 ('ativeness', 'A'),
 ('ingness', 'A'),
 ('ishness', 'A'),
 ('iness', 'A'),
 ('ariness', 'E'),
 ('alness', 'A'),
 ('icalness', 'A'),
 ('antialness', 'A'),
 ('entialness', 'A'),
 ('ionalness', 'A'),
 ('fulness', 'A'),
 ('lessness', 'A'),
 ('ousness', 'A'),
 ('eousness', 'A'),
 ('iousness', 'A'),
 ('itousness', 'A'),
 ('entness', 'A'),
 ('ants', 'B'),
 ('ists', 'A'),
 ('icists', 'A'),
 ('us', 'V'),
 ('ous', 'A'),
 ('eous', 'A'),
 ('aceous', 'A'),
 ('antaneous', 'A'),
 ('ious', 'A'),
 ('acious', 'B'),
 ('itous', 'A'),
 ('ant', 'B'),
 ('icant', 'A'),
 ('ent', 'C'),
 ('ement', 'A'),
 ('izement', 'A'),
 ('ist', 'A'),
 ('icist', 'A'),
 ('alist', 'A'),
 ('icalist', 'A'),
 ('ialist', 'A'),
 ('ionist', 'A'),
 ('entist', 'A'),
 ('y', 'B'),
 ('acy', 'A'),
 ('ancy', 'B'),
 ('ency', 'A'),
 ('ly', 'B'),
 ('ealy', 'Y'),
 ('ably', 'A'),
 ('ibly', 'A'),
 ('edly', 'E'),
 ('iedly', 'A'),
 ('ely', 'E'),
 ('ately', 'A'),
 ('ively', 'A'),
 ('atively', 'A'),
 ('ingly', 'B'),
 ('atingly', 'A'),
 ('ily', 'A'),
 ('lily', 'A'),
 ('arily', 'A'),
 ('ally', 'B'),
 ('ically', 'A'),
 ('aically', 'A'),
 ('allically', 'C'),
 ('istically', 'A'),
 ('alistically', 'B'),
 ('oidally', 'A'),
 ('ially', 'A'),
 ('entially', 'A'),
 ('ionally', 'A'),
 ('ationally', 'B'),
 ('izationally', 'B'),
 ('entally', 'A'),
 ('fully', 'A'),
 ('efully', 'A'),
 ('ifully', 'A'),
 ('enly', 'E'),
 ('arly', 'K'),
 ('early', 'Y'),
 ('lessly', 'A'),
 ('ously', 'A'),
 ('eously', 'A'),
 ('iously', 'A'),
 ('ently', 'A'),
 ('ary', 'F'),
 ('ery', 'E'),
 ('icianry', 'A'),
 ('atory', 'A'),
 ('ity', 'A'),
 ('acity', 'A'),
 ('icity', 'A'),
 ('eity', 'A'),
 ('ality', 'A'),
 ('icality', 'A'),
 ('iality', 'A'),
 ('antiality', 'A'),
 ('entiality', 'A'),
 ('ionality', 'A'),
 ('elity', 'A'),
 ('ability', 'A'),
 ('izability', 'A'),
 ('arizability', 'A'),
 ('ibility', 'A'),
 ('inity', 'CC'),
 ('arity', 'B'),
 ('ivity', 'A')]

LOVINS_DOUBLES = ('bb', 'dd', 'gg', 'll', 'mm', 'nn', 'pp', 'rr', 'ss', 'tt')

LOVINS_RESPELL = [('uad', 'uas', ''),
 ('vad', 'vas', ''),
 ('cid', 'cis', ''),
 ('lid', 'lis', ''),
 ('erid', 'eris', ''),
 ('pand', 'pans', ''),
 ('end', 'ens', 's'),
 ('ond', 'ons', ''),
 ('lud', 'lus', ''),
 ('rud', 'rus', ''),
 ('ul', 'l', 'aio'),
 ('her', 'hes', 'pt'),
 ('metr', 'meter', ''),
 ('istr', 'ister', ''),
 ('urs', 'ur', ''),
 ('uct', 'uc', ''),
 ('et', 'es', 'n'),
 ('mit', 'mis', ''),
 ('ent', 'ens', 'm'),
 ('umpt', 'um', ''),
 ('rpt', 'rb', ''),
 ('ert', 'ers', ''),
 ('yt', 'ys', ''),
 ('iev', 'ief', ''),
 ('olv', 'olut', ''),
 ('ax', 'ac', ''),
 ('ex', 'ec', ''),
 ('bex', 'bic', ''),
 ('dex', 'dic', ''),
 ('pex', 'pic', ''),
 ('tex', 'tic', ''),
 ('ix', 'ic', ''),
 ('lux', 'luc', ''),
 ('yz', 'ys', '')]

NL_VOWELS = 'aeiouyè'

NL_ACCENTS = {'á': 'a',
 'ä': 'a',
 'é': 'e',
 'ë': 'e',
 'í': 'i',
 'ï': 'i',
 'ó': 'o',
 'ö': 'o',
 'ú': 'u',
 'ü': 'u'}

NL_STEP1 = [('ene', 2), ('se', 3), ('en', 2), ('heden', 1), ('s', 3)]

NL_D_SUFFIX = [('end', 1), ('ig', 2), ('ing', 1), ('lijk', 3), ('baar', 4),
 ('bar', 5)]

ES_VOWELS = 'aeiouáéíóúü'

ES_PRON = ['la', 'sela', 'le', 'me', 'se', 'lo', 'selo', 'las', 'selas', 'les',
 'los', 'selos', 'nos']

ES_PRE_MARK = [('ando', 6), ('iendo', 6), ('yendo', 7), ('ándo', 2), ('iéndo', 1),
 ('ar', 6), ('er', 6), ('ir', 6), ('ár', 3), ('ér', 4), ('ír', 5)]

ES_MARK_REPL = {1: 'iendo', 2: 'ando', 3: 'ar', 4: 'er', 5: 'ir'}

ES_STD = [('ica', 1), ('encia', 5), ('adora', 2), ('osa', 1), ('ista', 1),
 ('iva', 9), ('anza', 1), ('logía', 3), ('idad', 8), ('able', 1),
 ('ible', 1), ('mente', 7), ('amente', 6), ('ación', 2), ('ución', 4),
 ('ico', 1), ('ismo', 1), ('oso', 1), ('amiento', 1), ('imiento', 1),
 ('ivo', 9), ('ador', 2), ('icas', 1), ('encias', 5), ('adoras', 2),
 ('osas', 1), ('istas', 1), ('ivas', 9), ('anzas', 1), ('logías', 3),
 ('idades', 8), ('ables', 1), ('ibles', 1), ('aciones', 2),
 ('uciones', 4), ('adores', 2), ('icos', 1), ('ismos', 1), ('osos', 1),
 ('amientos', 1), ('imientos', 1), ('ivos', 9)]

ES_A3 = [('ic', 0), ('ad', 0), ('os', 0), ('iv', 1)]

ES_A4 = [('able', 1), ('ible', 1)]

ES_A5 = [('ic', 1), ('abil', 1), ('iv', 1)]

ES_Y_VERB = [('ya', 1), ('ye', 1), ('yan', 1), ('yen', 1), ('yeron', 1),
 ('yendo', 1), ('yo', 1), ('yas', 1), ('yes', 1), ('yais', 1),
 ('yamos', 1), ('yó', 1)]

ES_VERB = [('aba', 2), ('ada', 2), ('ida', 2), ('ara', 2), ('iera', 2), ('ía', 2),
 ('aría', 2), ('ería', 2), ('iría', 2), ('ad', 2), ('ed', 2), ('id', 2),
 ('ase', 2), ('iese', 2), ('aste', 2), ('iste', 2), ('an', 2),
 ('aban', 2), ('aran', 2), ('ieran', 2), ('ían', 2), ('arían', 2),
 ('erían', 2), ('irían', 2), ('en', 1), ('asen', 2), ('iesen', 2),
 ('aron', 2), ('ieron', 2), ('arán', 2), ('erán', 2), ('irán', 2),
 ('ado', 2), ('ido', 2), ('ando', 2), ('iendo', 2), ('ar', 2),
 ('er', 2), ('ir', 2), ('as', 2), ('abas', 2), ('adas', 2), ('idas', 2),
 ('aras', 2), ('ieras', 2), ('ías', 2), ('arías', 2), ('erías', 2),
 ('irías', 2), ('es', 1), ('ases', 2), ('ieses', 2), ('abais', 2),
 ('arais', 2), ('ierais', 2), ('íais', 2), ('aríais', 2), ('eríais', 2),
 ('iríais', 2), ('aseis', 2), ('ieseis', 2), ('asteis', 2),
 ('isteis', 2), ('áis', 2), ('éis', 1), ('aréis', 2), ('eréis', 2),
 ('iréis', 2), ('ados', 2), ('idos', 2), ('amos', 2), ('ábamos', 2),
 ('áramos', 2), ('iéramos', 2), ('íamos', 2), ('aríamos', 2),
 ('eríamos', 2), ('iríamos', 2), ('emos', 1), ('aremos', 2),
 ('eremos', 2), ('iremos', 2), ('ásemos', 2), ('iésemos', 2),
 ('imos', 2), ('arás', 2), ('erás', 2), ('irás', 2), ('ís', 2),
 ('ará', 2), ('erá', 2), ('irá', 2), ('aré', 2), ('eré', 2), ('iré', 2),
 ('ió', 2)]

ES_RESIDUAL = [('a', 1), ('e', 2), ('o', 1), ('os', 1), ('á', 1), ('é', 2), ('í', 1),
 ('ó', 1)]

ES_POST = {'á': 'a', 'é': 'e', 'í': 'i', 'ó': 'o', 'ú': 'u'}

PT_VOWELS = 'aeiouáâéêíóôú'

PT_STD = [('ica', 1), ('ância', 1), ('ência', 4), ('ira', 9), ('adora', 1),
 ('osa', 1), ('ista', 1), ('iva', 8), ('eza', 1), ('logía', 2),
 ('idade', 7), ('ante', 1), ('mente', 6), ('amente', 5), ('ável', 1),
 ('ível', 1), ('ución', 3), ('ico', 1), ('ismo', 1), ('oso', 1),
 ('amento', 1), ('imento', 1), ('ivo', 8), ('aça~o', 1), ('ador', 1),
 ('icas', 1), ('ências', 4), ('iras', 9), ('adoras', 1), ('osas', 1),
 ('istas', 1), ('ivas', 8), ('ezas', 1), ('logías', 2), ('idades', 7),
 ('uciones', 3), ('adores', 1), ('antes', 1), ('aço~es', 1),
 ('icos', 1), ('ismos', 1), ('osos', 1), ('amentos', 1), ('imentos', 1),
 ('ivos', 8)]

PT_A2 = [('ic', 0), ('ad', 0), ('os', 0), ('iv', 1)]

PT_A3 = [('ante', 1), ('avel', 1), ('ível', 1)]

PT_A4 = [('ic', 1), ('abil', 1), ('iv', 1)]

PT_VERB = [('ada', 1), ('ida', 1), ('ia', 1), ('aria', 1), ('eria', 1),
 ('iria', 1), ('ara', 1), ('era', 1), ('ira', 1), ('ava', 1),
 ('asse', 1), ('esse', 1), ('isse', 1), ('aste', 1), ('este', 1),
 ('iste', 1), ('ei', 1), ('arei', 1), ('erei', 1), ('irei', 1),
 ('am', 1), ('iam', 1), ('ariam', 1), ('eriam', 1), ('iriam', 1),
 ('aram', 1), ('eram', 1), ('iram', 1), ('avam', 1), ('em', 1),
 ('arem', 1), ('erem', 1), ('irem', 1), ('assem', 1), ('essem', 1),
 ('issem', 1), ('ado', 1), ('ido', 1), ('ando', 1), ('endo', 1),
 ('indo', 1), ('ara~o', 1), ('era~o', 1), ('ira~o', 1), ('ar', 1),
 ('er', 1), ('ir', 1), ('as', 1), ('adas', 1), ('idas', 1), ('ias', 1),
 ('arias', 1), ('erias', 1), ('irias', 1), ('aras', 1), ('eras', 1),
 ('iras', 1), ('avas', 1), ('es', 1), ('ardes', 1), ('erdes', 1),
 ('irdes', 1), ('ares', 1), ('eres', 1), ('ires', 1), ('asses', 1),
 ('esses', 1), ('isses', 1), ('astes', 1), ('estes', 1), ('istes', 1),
 ('is', 1), ('ais', 1), ('eis', 1), ('areis', 1), ('ereis', 1),
 ('ireis', 1), ('áreis', 1), ('éreis', 1), ('íreis', 1), ('ásseis', 1),
 ('ésseis', 1), ('ísseis', 1), ('áveis', 1), ('íeis', 1), ('aríeis', 1),
 ('eríeis', 1), ('iríeis', 1), ('ados', 1), ('idos', 1), ('amos', 1),
 ('áramos', 1), ('éramos', 1), ('íramos', 1), ('ávamos', 1),
 ('íamos', 1), ('aríamos', 1), ('eríamos', 1), ('iríamos', 1),
 ('emos', 1), ('aremos', 1), ('eremos', 1), ('iremos', 1),
 ('ássemos', 1), ('êssemos', 1), ('íssemos', 1), ('imos', 1),
 ('armos', 1), ('ermos', 1), ('irmos', 1), ('ámos', 1), ('arás', 1),
 ('erás', 1), ('irás', 1), ('eu', 1), ('iu', 1), ('ou', 1), ('ará', 1),
 ('erá', 1), ('irá', 1)]

PT_RESIDUAL = [('a', 1), ('i', 1), ('o', 1), ('os', 1), ('á', 1), ('í', 1), ('ó', 1)]

PT_FORM = [('e', 1), ('ç', 2), ('é', 1), ('ê', 1)]

IT_VOWELS = 'aeiouàèìòù'

IT_AEIO = 'aeioàèìò'

IT_ACCENTS = {'á': 'à', 'é': 'è', 'í': 'ì', 'ó': 'ò', 'ú': 'ù'}

IT_PRON = ['la', 'cela', 'gliela', 'mela', 'tela', 'vela', 'le', 'cele', 'gliele',
 'mele', 'tele', 'vele', 'ne', 'cene', 'gliene', 'mene', 'sene', 'tene',
 'vene', 'ci', 'li', 'celi', 'glieli', 'meli', 'teli', 'veli', 'gli',
 'mi', 'si', 'ti', 'vi', 'lo', 'celo', 'glielo', 'melo', 'telo',
 'velo']

IT_PRE_MARK = [('ando', 1), ('endo', 1), ('ar', 2), ('er', 2), ('ir', 2)]

IT_STD = [('ica', 1), ('logia', 3), ('osa', 1), ('ista', 1), ('iva', 9),
 ('anza', 1), ('enza', 5), ('ice', 1), ('atrice', 1), ('iche', 1),
 ('logie', 3), ('abile', 1), ('ibile', 1), ('usione', 4), ('azione', 2),
 ('uzione', 4), ('atore', 2), ('ose', 1), ('mente', 1), ('amente', 7),
 ('iste', 1), ('ive', 9), ('anze', 1), ('enze', 5), ('ici', 1),
 ('atrici', 1), ('ichi', 1), ('abili', 1), ('ibili', 1), ('ismi', 1),
 ('usioni', 4), ('azioni', 2), ('uzioni', 4), ('atori', 2), ('osi', 1),
 ('amenti', 6), ('imenti', 6), ('isti', 1), ('ivi', 9), ('ico', 1),
 ('ismo', 1), ('oso', 1), ('amento', 6), ('imento', 6), ('ivo', 9),
 ('ità', 8), ('istà', 1), ('istè', 1), ('istì', 1)]

IT_A4 = [('ic', 0), ('abil', 0), ('os', 0), ('iv', 1)]

IT_A5 = [('ic', 1), ('abil', 1), ('iv', 1)]

IT_VERB = [('isca', 1), ('enda', 1), ('ata', 1), ('ita', 1), ('uta', 1),
 ('ava', 1), ('eva', 1), ('iva', 1), ('erebbe', 1), ('irebbe', 1),
 ('isce', 1), ('ende', 1), ('are', 1), ('ere', 1), ('ire', 1),
 ('asse', 1), ('ate', 1), ('avate', 1), ('evate', 1), ('ivate', 1),
 ('ete', 1), ('erete', 1), ('irete', 1), ('ite', 1), ('ereste', 1),
 ('ireste', 1), ('ute', 1), ('erai', 1), ('irai', 1), ('isci', 1),
 ('endi', 1), ('erei', 1), ('irei', 1), ('assi', 1), ('ati', 1),
 ('iti', 1), ('eresti', 1), ('iresti', 1), ('uti', 1), ('avi', 1),
 ('evi', 1), ('ivi', 1), ('isco', 1), ('ando', 1), ('endo', 1),
 ('Yamo', 1), ('iamo', 1), ('avamo', 1), ('evamo', 1), ('ivamo', 1),
 ('eremo', 1), ('iremo', 1), ('assimo', 1), ('ammo', 1), ('eremmo', 1),
 ('iremmo', 1), ('immo', 1), ('ano', 1), ('iscano', 1), ('avano', 1),
 ('evano', 1), ('ivano', 1), ('eranno', 1), ('iranno', 1), ('ono', 1),
 ('iscono', 1), ('arono', 1), ('erono', 1), ('irono', 1),
 ('erebbero', 1), ('irebbero', 1), ('assero', 1), ('essero', 1),
 ('issero', 1), ('ato', 1), ('ito', 1), ('uto', 1), ('avo', 1),
 ('evo', 1), ('ivo', 1), ('ar', 1), ('ir', 1), ('erà', 1), ('irà', 1),
 ('erò', 1), ('irò', 1)]

FR_VOWELS = 'aeiouyàâèéêëîïôùû'

FR_KEEP_S = 'aiosuè'

FR_STD = [('iqUe', 1), ('atrice', 2), ('ance', 1), ('ence', 5), ('logie', 3),
 ('able', 1), ('isme', 1), ('euse', 11), ('iste', 1), ('ive', 8),
 ('if', 8), ('usion', 4), ('ation', 2), ('ution', 4), ('ateur', 2),
 ('iqUes', 1), ('atrices', 2), ('ances', 1), ('ences', 5),
 ('logies', 3), ('ables', 1), ('ismes', 1), ('euses', 11), ('istes', 1),
 ('ives', 8), ('ifs', 8), ('usions', 4), ('ations', 2), ('utions', 4),
 ('ateurs', 2), ('ments', 15), ('ements', 6), ('issements', 12),
 ('ités', 7), ('ment', 15), ('ement', 6), ('issement', 12),
 ('amment', 13), ('emment', 14), ('aux', 10), ('eaux', 9), ('eux', 1),
 ('ité', 7)]

FR_A1 = [('iqU', 3), ('abl', 3), ('Ièr', 4), ('ièr', 4), ('eus', 2), ('iv', 1)]

FR_A2 = [('ic', 2), ('abil', 1), ('iv', 3)]

FR_I_VERB = [('ira', 1), ('ie', 1), ('isse', 1), ('issante', 1), ('i', 1),
 ('irai', 1), ('ir', 1), ('iras', 1), ('ies', 1), ('îmes', 1),
 ('isses', 1), ('issantes', 1), ('îtes', 1), ('is', 1), ('irais', 1),
 ('issais', 1), ('irions', 1), ('issions', 1), ('irons', 1),
 ('issons', 1), ('issants', 1), ('it', 1), ('irait', 1), ('issait', 1),
 ('issant', 1), ('iraIent', 1), ('issaIent', 1), ('irent', 1),
 ('issent', 1), ('iront', 1), ('ît', 1), ('iriez', 1), ('issiez', 1),
 ('irez', 1), ('issez', 1)]

FR_VERB = [('a', 3), ('era', 2), ('asse', 3), ('ante', 3), ('ée', 2), ('ai', 3),
 ('erai', 2), ('er', 2), ('as', 3), ('eras', 2), ('âmes', 3),
 ('asses', 3), ('antes', 3), ('âtes', 3), ('ées', 2), ('ais', 3),
 ('erais', 2), ('ions', 1), ('erions', 2), ('assions', 3), ('erons', 2),
 ('ants', 3), ('és', 2), ('ait', 3), ('erait', 2), ('ant', 3),
 ('aIent', 3), ('eraIent', 2), ('èrent', 2), ('assent', 3),
 ('eront', 2), ('ât', 3), ('ez', 2), ('iez', 2), ('eriez', 2),
 ('assiez', 3), ('erez', 2), ('é', 2)]

FR_RESIDUAL = [('e', 3), ('Ière', 2), ('ière', 2), ('ion', 1), ('Ier', 2), ('ier', 2),
 ('ë', 4)]

FR_DOUBLES = ('ell', 'eill', 'enn', 'onn', 'ett')

