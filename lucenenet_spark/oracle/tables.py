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
