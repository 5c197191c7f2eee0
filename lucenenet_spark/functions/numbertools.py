"""NumberTools — lexicographically-ordered long encoding
(src/Lucene.Net/Document/NumberTools.cs:32-140).

``long_to_string(l1) < long_to_string(l2)`` iff ``l1 < l2`` under plain
string comparison, so numeric ranges work through the TERM machinery
(TermRangeQuery/filters) — the reference's pre-NumericRangeQuery path.

Encoding (NumberTools.cs:52-115): base-36 lowercase, 14 chars total —
prefix '-' for negative / '0' for positive ('-' < '0' in ASCII,
NumberTools.cs:56), negatives mapped through ``MAX + l + 1`` so their
magnitude ascends with value, payload zero-padded to 13 digits
(Long.MaxValue in base 36 = ``1y2p0ij32e8e7``).  Long.MinValue is the
special-cased MIN_STRING_VALUE (no positive counterpart exists).

Both a driver-side scalar pair (for building query bounds) and Spark
column expressions (for indexing a numeric column as keyword terms,
JVM-side via conv/lpad — no UDF) are provided.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RADIX = 36
NEGATIVE_PREFIX = "-"
POSITIVE_PREFIX = "0"   # NB: NEGATIVE_PREFIX < POSITIVE_PREFIX
STR_SIZE = 14           # prefix + 13 base-36 digits
_PAYLOAD = STR_SIZE - 1
_MIN = -(1 << 63)
_MAX = (1 << 63) - 1

MIN_STRING_VALUE = NEGATIVE_PREFIX + "0" * _PAYLOAD
MAX_STRING_VALUE = POSITIVE_PREFIX + "1y2p0ij32e8e7"

_DIGITS = "0123456789abcdefghijklmnopqrstuvwxyz"


def _to_base36(n: int) -> str:
    if n == 0:
        return "0"
    out = []
    while n:
        n, r = divmod(n, RADIX)
        out.append(_DIGITS[r])
    return "".join(reversed(out))


def long_to_string(l: int) -> str:
    """NumberTools.LongToString (NumberTools.cs:78-115)."""
    if not _MIN <= l <= _MAX:
        raise ValueError(f"out of int64 range: {l}")
    if l == _MIN:
        return MIN_STRING_VALUE  # long is not symmetric around zero
    if l < 0:
        prefix, l = NEGATIVE_PREFIX, _MAX + l + 1
    else:
        prefix = POSITIVE_PREFIX
    return prefix + _to_base36(l).rjust(_PAYLOAD, "0")


def string_to_long(s: str) -> int:
    """NumberTools.StringToLong (NumberTools.cs:120-140)."""
    if len(s) != STR_SIZE:
        raise ValueError(f"string is the wrong size: {s!r}")
    if s == MIN_STRING_VALUE:
        return _MIN
    prefix, payload = s[0], s[1:]
    l = int(payload, RADIX)
    if prefix == NEGATIVE_PREFIX:
        return l - _MAX - 1
    if prefix != POSITIVE_PREFIX:
        raise ValueError(f"string does not begin with the correct prefix: {s!r}")
    return l


def long_to_string_col(col: Column) -> Column:
    """The same encoding as a JVM column expression (conv + lpad — no
    Python in the indexing path).  Index a numeric column through
    keyword_cols with this expression to make it term-range-queryable."""
    col = col.cast("long")
    # MAX + l + 1 == l + 2^63 == l XOR signbit (two's complement) — the
    # xor form never overflows, so ANSI-mode codegen can evaluate it
    # unconditionally
    mapped = F.when(col < 0, col.bitwiseXOR(F.lit(_MIN))).otherwise(col)
    prefix = F.when(col < 0, F.lit(NEGATIVE_PREFIX)).otherwise(
        F.lit(POSITIVE_PREFIX))
    enc = F.concat(
        prefix,
        F.lpad(F.lower(F.conv(mapped.cast("string"), 10, RADIX)),
               _PAYLOAD, "0"))
    return F.when(col == F.lit(_MIN), F.lit(MIN_STRING_VALUE)).otherwise(enc)


def string_to_long_col(col: Column) -> Column:
    """Inverse column expression (query/debug side)."""
    payload = F.conv(F.substring(col, 2, _PAYLOAD), RADIX, 10).cast("long")
    return (
        F.when(col == F.lit(MIN_STRING_VALUE), F.lit(_MIN))
        .when(F.substring(col, 1, 1) == NEGATIVE_PREFIX,
              # payload - 2^63 == payload XOR signbit — overflow-free
              payload.bitwiseXOR(F.lit(_MIN)))
        .otherwise(payload))
