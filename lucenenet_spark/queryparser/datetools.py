"""DateTools (src/Lucene.Net/Documents/DateTools.cs): dates as sortable
index strings, truncated to a resolution.

The reference formats UTC timestamps as yyyyMMddHHmmssfff prefixes
(DateTools.cs Resolution formats at :42-58) so that lexicographic term
order == chronological order — which is exactly what makes a date range
a plain TermRange over the term dictionary.  Only the formatting side is
needed here (QueryParser.GetRangeQuery rewrites both range bounds).
"""

from __future__ import annotations

from datetime import datetime

# resolution -> slice length of "yyyyMMddHHmmssfff" (DateTools.cs:42-58)
RESOLUTION_LEN = {
    "YEAR": 4, "MONTH": 6, "DAY": 8, "HOUR": 10,
    "MINUTE": 12, "SECOND": 14, "MILLISECOND": 17,
}

# accepted textual date forms for range bounds (the reference parses with
# the LOCALE's short date pattern, QueryParser.cs:765-772 /
# SetLocale :302; the default here is ISO + US short form, and a parser
# can supply its own strptime patterns — the locale hook)
_DATE_FORMATS = ("%Y-%m-%d", "%m/%d/%Y")


def parse_date(text: str,
               formats: tuple[str, ...] | None = None) -> datetime | None:
    for fmt in formats or _DATE_FORMATS:
        try:
            return datetime.strptime(text, fmt)
        except ValueError:
            continue
    return None


def date_to_string(d: datetime, resolution: str) -> str:
    n = RESOLUTION_LEN[resolution.upper()]
    full = (f"{d.year:04d}{d.month:02d}{d.day:02d}{d.hour:02d}"
            f"{d.minute:02d}{d.second:02d}{d.microsecond // 1000:03d}")
    return full[:n]


def range_bound(text: str, resolution: str, end_of_day: bool,
                formats: tuple[str, ...] | None = None) -> str | None:
    """One range bound -> DateTools string, or None if `text` is not a
    date.  end_of_day pushes an inclusive upper bound to 23:59:59.999
    (QueryParser.cs:775-782: 'the user can only specify the date, not the
    time') before truncating at the resolution.  formats: the parser's
    locale date patterns (SetLocale analogue)."""
    d = parse_date(text, formats)
    if d is None:
        return None
    if end_of_day:
        d = d.replace(hour=23, minute=59, second=59, microsecond=999000)
    return date_to_string(d, resolution)
