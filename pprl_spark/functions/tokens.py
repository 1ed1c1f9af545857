"""Pure-Python token kernels with exact reference semantics.

These are the inner loops of the vectorized pandas UDFs in
``pprl_spark.functions.features`` and double as the golden-test oracle.
Every function reproduces the corresponding reference behavior exactly
(byte parity is load-bearing: the F1 gate depends on identical feature
sets feeding identical hash indices):

- ``split_string_underscore``  -> `/root/reference/src/pprl/embedder/features.py:10-37`
- ``gen_ngram``                -> `features.py:40-65`
- ``gen_skip_grams``           -> `features.py:68-95`
- ``gen_double_metaphone``     -> `features.py:98-121`
- ``gen_features``             -> `features.py:124-163`
- ``sex_features``             -> `features.py:215-247`
- ``dob_features``             -> `features.py:250-290`
- ``misc_features``            -> `features.py:293-330`
- ``shingled_features``        -> `features.py:333-380`
- ``union_features``           -> `embedder.py:449-454`

No pandas/Spark imports here: plain ``str -> list[str]`` functions, cheap
to call row-wise over an Arrow batch inside a pandas UDF.
"""

from __future__ import annotations

import re
from itertools import chain
from typing import Iterable, Iterator

_SPLIT_RE = re.compile(r"[\s\+\-\_\,\.]+")  # features.py:34

# day<dd> month<mm> year<YYYY> parsing; reference delegates to
# pd.to_datetime(errors="coerce", dayfirst=True, yearfirst=False)
# (features.py:281). We reproduce the common FEBRL shapes without pandas:
# yyyymmdd, dd/mm/yyyy, dd-mm-yyyy, yyyy-mm-dd.
_DATE_PATTERNS = (
    re.compile(r"^(?P<y>\d{4})(?P<m>\d{2})(?P<d>\d{2})$"),
    re.compile(r"^(?P<d>\d{1,2})[/\-\.](?P<m>\d{1,2})[/\-\.](?P<y>\d{4})$"),
    re.compile(r"^(?P<y>\d{4})[/\-\.](?P<m>\d{1,2})[/\-\.](?P<d>\d{1,2})$"),
)


def split_string_underscore(string: str) -> list[str]:
    """Split on `[\\s+\\-_,.]+` and wrap each token in underscores.

    Exact reproduction of features.py:10-37 (regex at :34, wrap at :35).
    """
    return [f"_{w}_" for w in _SPLIT_RE.split(string) if w]


def gen_ngram(split_tokens: Iterable[str], ngram_length: Iterable[int]) -> Iterator[str]:
    """Character n-grams of wrapped tokens; skips the bare "_".

    Exact reproduction of features.py:40-65 including generation order
    (all n=2 grams for every token, then all n=3 grams, ...).
    """
    for n in ngram_length:
        for token in split_tokens:
            for i in range(len(token) - n + 1):
                ngram = token[i : i + n]
                if ngram != "_":
                    yield ngram


def gen_skip_grams(split_tokens: Iterable[str]) -> Iterator[str]:
    """Skip 2-grams `token[i] + token[i+2]` — features.py:68-95."""
    for token in split_tokens:
        for i in range(len(token) - 2):
            yield token[i] + token[i + 2]


def gen_double_metaphone(string: str) -> Iterator[str]:
    """Non-empty double-metaphone codes per whitespace token.

    Reproduction of features.py:98-121 using our pure-Python
    double-metaphone (the reference wraps the `metaphone` package, which
    implements the same published Lawrence Philips algorithm).
    """
    from pprl_spark.functions.phonetic import double_metaphone

    for token in string.split():
        for code in double_metaphone(token):
            if code != "":
                yield code


def gen_features(
    string: str,
    ngram_length: list[int] | None = None,
    use_gen_ngram: bool = True,
    use_gen_skip_grams: bool = False,
    use_double_metaphone: bool = False,
) -> Iterator[str]:
    """Compose lowercase -> split -> {ngrams, skip-grams, metaphones}.

    Exact reproduction of features.py:124-163 (lowercase at :155,
    composition order at :158-163).
    """
    if ngram_length is None:
        ngram_length = [2, 3]
    lower = string.lower()
    split_tokens = split_string_underscore(lower)
    if use_gen_ngram:
        yield from gen_ngram(split_tokens, ngram_length)
    if use_gen_skip_grams:
        yield from gen_skip_grams(split_tokens)
    if use_double_metaphone:
        yield from gen_double_metaphone(lower)


def name_features(
    value: str | None,
    ngram_length: list[int] | None = None,
    use_gen_ngram: bool = True,
    use_gen_skip_grams: bool = False,
    use_double_metaphone: bool = False,
) -> list[str]:
    """Per-value analog of gen_name_features (features.py:166-212)."""
    if value is None:
        value = ""  # .fillna("") at features.py:198
    return list(
        gen_features(
            value, ngram_length, use_gen_ngram, use_gen_skip_grams, use_double_metaphone
        )
    )


def sex_features(value: str | None) -> list[str]:
    """casefold -> first char -> `sex<x>`; missing -> `[""]`.

    Exact reproduction of features.py:215-247. Note the reference maps
    missing/empty to a list containing the empty string (fillna("") then
    wrap, features.py:243-244), so "" IS hashed as a feature for missing
    sex — we preserve that quirk for parity.
    """
    if value is None or not isinstance(value, str) or value == "":
        return [""]
    first = value.casefold()[0]
    return [f"sex<{first}>"]


def dob_features(
    value: str | None,
    dayfirst: bool = True,
    yearfirst: bool = False,
    default: list[str] | None = None,
) -> list[str]:
    """Parse a date string -> `["day<dd>", "month<mm>", "year<YYYY>"]`.

    Semantics of features.py:250-290 (format string at :284, default []
    at :254). The reference coerces anything
    ``pd.to_datetime(errors="coerce", dayfirst=..., yearfirst=...)``
    accepts — month names, 2-digit years, "3 Jan 2012". Fast path: the
    three numeric shapes covering FEBRL-style data, parsed with plain
    regexes (no pandas per row). Anything else falls back to a per-value
    ``pd.to_datetime`` call — byte parity with the reference by
    construction (pandas ships with pyspark executors; the lazy import
    costs nothing on the fast path). Property-tested against the pandas
    oracle over generated date strings (tests/test_tokens.py), mirroring
    the reference's random-date test (test/embedder/test_features.py:248).
    """
    if default is None:
        default = []
    if value is None or value == "":
        return list(default)
    value = value.strip()
    if value == "":
        return list(default)
    for pat in _DATE_PATTERNS:
        m = pat.match(value)
        if m:
            d, mo, y = int(m.group("d")), int(m.group("m")), int(m.group("y"))
            if pat is _DATE_PATTERNS[1]:
                if not dayfirst:
                    # dd/mm pattern reinterpreted as mm/dd
                    d, mo = mo, d
                if not (1 <= mo <= 12) and 1 <= d <= 12:
                    # pd.to_datetime(errors="coerce") tries the swap; mimic
                    d, mo = mo, d
            elif pat is _DATE_PATTERNS[2] and dayfirst:
                # pandas parses separator-form "yyyy-a-b" with dayfirst=True
                # as year-DAY-month (swap fallback when a > 12); compact
                # yyyymmdd (pattern 0) stays y-m-d regardless
                d, mo = mo, d
                if not (1 <= mo <= 12) and 1 <= d <= 12:
                    d, mo = mo, d
            if _valid_date(y, mo, d):
                return [f"day<{d:02d}>", f"month<{mo:02d}>", f"year<{y:04d}>"]
            # shape matched but not a valid date — let pandas decide
            # (it sometimes recovers, e.g. "2001-31-12" -> 2001-12-31)
            return _dob_features_lenient(value, dayfirst, yearfirst, default)
    return _dob_features_lenient(value, dayfirst, yearfirst, default)


def _valid_date(y: int, mo: int, d: int) -> bool:
    import calendar

    # fast path only for years safely inside the pandas ns-Timestamp range
    # (1677-09-21 .. 2262-04-11): the reference's pd.to_datetime coerces
    # out-of-range dates to NaT, and boundary years go to the slow path
    if not (1678 <= y <= 2261 and 1 <= mo <= 12):
        return False
    return 1 <= d <= calendar.monthrange(y, mo)[1]


def _dob_features_lenient(
    value: str, dayfirst: bool, yearfirst: bool, default: list[str]
) -> list[str]:
    """Slow path: exact pd.to_datetime per-value coercion (features.py:281)."""
    import pandas as pd

    try:
        import warnings

        with warnings.catch_warnings():
            # pandas warns on dayfirst-inconsistent inputs it parses anyway
            warnings.simplefilter("ignore")
            ts = pd.to_datetime(
                value, errors="coerce", dayfirst=dayfirst, yearfirst=yearfirst
            )
    except Exception:
        return list(default)
    if ts is pd.NaT or ts is None:
        return list(default)
    return [f"day<{ts.day:02d}>", f"month<{ts.month:02d}>", f"year<{ts.year:04d}>"]


def misc_features(value: object, label: str = "misc") -> list[str] | str:
    """`label<casefolded-value>`; missing/empty -> `""` (the SCALAR).

    Exact reproduction of features.py:293-330: non-missing values are
    stringified then casefolded and wrapped; missing data becomes the
    scalar empty string which "disappears later" at feature-union time
    (chain.from_iterable over "" yields nothing, features.py:328). The
    reference's missing sentinel is the literal string "no_data"
    (replace("" -> "no_data").fillna("no_data"), features.py:316-317), so
    a *real* value that casefolds to "no_data" is also coded as missing —
    quirk preserved for parity.
    """
    if value is None or value == "":
        return ""
    wrapped = str(value).casefold()
    if wrapped == "no_data":
        return ""
    return [f"{label}<{wrapped}>"]


def shingled_features(
    value: str | None,
    ngram_length: list[int] | None = None,
    use_gen_skip_grams: bool = False,
    label: str = "zz",
) -> list[str]:
    """n-grams wrapped `label<gram>` to namespace the hash space.

    Exact reproduction of features.py:333-380 (fillna("") at :367, label
    default "zz" at :363).
    """
    if value is None:
        value = ""
    return [
        f"{label}<{feat}>"
        for feat in gen_features(
            value, ngram_length=ngram_length, use_gen_skip_grams=use_gen_skip_grams
        )
    ]


def media_features(value: str | None) -> list[str]:
    """Opaque media reference(s) -> labelled tokens `media<ref>`.

    No reference analog (the reference has no media columns); FIXTURES.md
    §1 specifies media spans hash as opaque labelled tokens, reusing the
    misc labelling scheme (features.py:293-330). Multiple refs arrive
    whitespace-joined (one per media span, in offset order).
    """
    if value is None or value == "":
        return []
    return [f"media<{ref.casefold()}>" for ref in value.split()]


def union_features(per_column: Iterable[list[str] | str]) -> list[str]:
    """Per-row set-union of per-column feature lists.

    Exact reproduction of embedder.py:449-454:
    ``list(set(chain.from_iterable(x)))``. Scalar "" entries (missing
    misc data) iterate to nothing; ``[""]`` entries (missing sex)
    contribute the "" feature. Output order is unspecified (Python set
    order) — downstream treats features as a set, and the Bloom encoder
    dedupes again after hashing.
    """
    return list(set(chain.from_iterable(per_column)))


# registry used by the embedding operator; mirrors the reference's
# feature_factory dict keyed by column type (embedder.py:435-447)
FEATURE_KERNELS = {
    "name": name_features,
    "sex": sex_features,
    "dob": dob_features,
    "misc": misc_features,
    "shingled": shingled_features,
    "media": media_features,
}
