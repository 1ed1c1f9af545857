"""Pure-Python Double Metaphone (Lawrence Philips, 2000).

The reference delegates to the public ``metaphone`` PyPI package
(`/root/reference/src/pprl/embedder/features.py:7,118`), which implements
Philips' published Double Metaphone algorithm (C/C++ Users Journal, June
2000). That package is not available in this environment, so this module
implements the same published algorithm from its public description.
Codes are NOT truncated (matching the PyPI package, which returns
full-length codes), and the return shape matches
``metaphone.doublemetaphone``: a 2-tuple ``(primary, secondary)`` of
uppercase codes, secondary ``""`` when identical to primary.

Golden parity vectors (from the reference's own tests,
`/root/reference/test/embedder/test_features.py:120,202-204`):
``dave -> ("TF", "")``, ``wilson -> ("ALSN", "FLSN")``,
``ron -> ("RN", "")``, ``bill -> ("PL", "")``.
"""

from __future__ import annotations

VOWELS = frozenset("AEIOUY")


def _is_vowel(word: str, pos: int) -> bool:
    return 0 <= pos < len(word) and word[pos] in VOWELS


def _slavo_germanic(word: str) -> bool:
    return any(s in word for s in ("W", "K", "CZ", "WITZ"))


def double_metaphone(value: str) -> tuple[str, str]:
    """Return (primary, secondary) Double Metaphone codes for a word."""
    word = "".join(c for c in value.upper() if "A" <= c <= "Z")
    if not word:
        return ("", "")

    length = len(word)
    last = length - 1
    primary: list[str] = []
    secondary: list[str] = []

    def add(p: str, s: str | None = None) -> None:
        primary.append(p)
        secondary.append(p if s is None else s)

    pos = 0
    # skip silent letters at start
    if word[:2] in ("GN", "KN", "PN", "WR", "PS"):
        pos = 1
    # initial X is pronounced Z (e.g. Xavier), which maps to S
    if word[0] == "X":
        add("S")
        pos = 1

    while pos < length:
        c = word[pos]

        if c in VOWELS:
            if pos == 0:
                add("A")  # all initial vowels map to A
            pos += 1
            continue

        if c == "B":
            add("P")
            pos += 2 if word[pos : pos + 2] == "BB" else 1
            continue

        if c == "\xc7":
            add("S")
            pos += 1
            continue

        if c == "C":
            # various germanic
            if (
                pos > 1
                and not _is_vowel(word, pos - 2)
                and word[pos - 1 : pos + 2] == "ACH"
                and (word[pos + 2 : pos + 3] != "I"
                     and (word[pos + 2 : pos + 3] != "E"
                          or word[pos - 2 : pos + 4] in ("BACHER", "MACHER")))
            ):
                add("K")
                pos += 2
                continue
            # special case 'caesar'
            if pos == 0 and word[:6] == "CAESAR":
                add("S")
                pos += 2
                continue
            if word[pos : pos + 4] == "CHIA":  # italian 'chianti'
                add("K")
                pos += 2
                continue
            if word[pos : pos + 2] == "CH":
                if pos > 0 and word[pos : pos + 4] == "CHAE":  # michael
                    add("K", "X")
                    pos += 2
                    continue
                if pos == 0 and (
                    word[pos + 1 : pos + 6] in ("HARAC", "HARIS")
                    or word[pos + 1 : pos + 4] in ("HOR", "HYM", "HIA", "HEM")
                ) and word[:5] != "CHORE":
                    add("K")  # greek roots: chemistry, chorus
                    pos += 2
                    continue
                if (
                    word[:4] in ("VAN ", "VON ")
                    or word[:3] == "SCH"
                    or word[pos - 2 : pos + 4] in ("ORCHES", "ARCHIT", "ORCHID")
                    or word[pos + 2 : pos + 3] in ("T", "S")
                    or (
                        (pos == 0 or word[pos - 1] in "AOUE")
                        and word[pos + 2 : pos + 3] in ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ", "")
                    )
                ):
                    add("K")
                else:
                    if pos > 0:
                        if word[:2] == "MC":
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                pos += 2
                continue
            if word[pos : pos + 2] == "CZ" and word[pos - 2 : pos + 2] != "WICZ":
                add("S", "X")  # czerny
                pos += 2
                continue
            if word[pos + 1 : pos + 4] == "CIA":  # focaccia
                add("X")
                pos += 3
                continue
            if word[pos : pos + 2] == "CC" and not (pos == 1 and word[0] == "M"):
                # double C but not McClellan
                if word[pos + 2 : pos + 3] in ("I", "E", "H") and word[pos + 2 : pos + 4] != "HU":
                    if (pos == 1 and word[0] == "A") or word[pos - 1 : pos + 4] in ("UCCEE", "UCCES"):
                        add("KS")  # accident, success
                    else:
                        add("X")  # bacci
                    pos += 3
                    continue
                add("K")
                pos += 2
                continue
            if word[pos : pos + 2] in ("CK", "CG", "CQ"):
                add("K")
                pos += 2
                continue
            if word[pos : pos + 2] in ("CI", "CE", "CY"):
                if word[pos : pos + 3] in ("CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                pos += 2
                continue
            add("K")
            if word[pos + 1 : pos + 3] in (" C", " Q", " G"):
                pos += 3
            elif word[pos + 1 : pos + 2] in ("C", "K", "Q") and word[pos + 1 : pos + 3] not in ("CE", "CI"):
                pos += 2
            else:
                pos += 1
            continue

        if c == "D":
            if word[pos : pos + 2] == "DG":
                if word[pos + 2 : pos + 3] in ("I", "E", "Y"):
                    add("J")  # edge
                    pos += 3
                    continue
                add("TK")  # edgar
                pos += 2
                continue
            if word[pos : pos + 2] in ("DT", "DD"):
                add("T")
                pos += 2
                continue
            add("T")
            pos += 1
            continue

        if c == "F":
            add("F")
            pos += 2 if word[pos : pos + 2] == "FF" else 1
            continue

        if c == "G":
            nxt = word[pos + 1 : pos + 2]
            if nxt == "H":
                if pos > 0 and not _is_vowel(word, pos - 1):
                    add("K")
                    pos += 2
                    continue
                if pos == 0:
                    if word[pos + 2 : pos + 3] == "I":
                        add("J")  # ghislane
                    else:
                        add("K")  # ghoul
                    pos += 2
                    continue
                # Parker's rule: silent gh
                if (
                    (pos > 1 and word[pos - 2] in "BHD")
                    or (pos > 2 and word[pos - 3] in "BHD")
                    or (pos > 3 and word[pos - 4] in "BH")
                ):
                    pos += 2
                    continue
                if pos > 2 and word[pos - 1] == "U" and word[pos - 3] in "CGLRT":
                    add("F")  # laugh, cough
                elif pos > 0 and word[pos - 1] != "I":
                    add("K")
                pos += 2
                continue
            if nxt == "N":
                if pos == 1 and _is_vowel(word, 0) and not _slavo_germanic(word):
                    primary.append("KN")
                    secondary.append("N")
                elif word[pos + 2 : pos + 4] != "EY" and nxt != "Y" and not _slavo_germanic(word):
                    primary.append("N")
                    secondary.append("KN")
                else:
                    add("KN")
                pos += 2
                continue
            if word[pos + 1 : pos + 3] == "LI" and not _slavo_germanic(word):
                primary.append("KL")
                secondary.append("L")  # tagliaro
                pos += 2
                continue
            if pos == 0 and (nxt == "Y" or word[pos + 1 : pos + 3] in (
                "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")):
                add("K", "J")  # ges-, gep-, ...
                pos += 2
                continue
            if (word[pos + 1 : pos + 3] == "ER" or nxt == "Y") and (
                word[:6] not in ("DANGER", "RANGER", "MANGER")
                and word[pos - 1 : pos] not in ("E", "I")
                and word[pos - 1 : pos + 2] not in ("RGY", "OGY")
            ):
                add("K", "J")
                pos += 2
                continue
            if nxt in ("E", "I", "Y") or word[pos - 1 : pos + 3] in ("AGGI", "OGGI"):
                if word[:4] in ("VAN ", "VON ") or word[:3] == "SCH" or word[pos + 1 : pos + 3] == "ET":
                    add("K")
                elif word[pos + 1 : pos + 5] == "IER ":
                    add("J")
                else:
                    add("J", "K")
                pos += 2
                continue
            add("K")
            pos += 2 if nxt == "G" else 1
            continue

        if c == "H":
            # only keep if first & before vowel or between 2 vowels
            if (pos == 0 or _is_vowel(word, pos - 1)) and _is_vowel(word, pos + 1):
                add("H")
                pos += 2
            else:
                pos += 1
            continue

        if c == "J":
            if word[pos : pos + 4] == "JOSE" or word[:4] == "SAN ":
                if (pos == 0 and (pos + 4 >= length or word[pos + 4 : pos + 5] == " ")) or word[
                    :4
                ] == "SAN ":
                    add("H")
                else:
                    add("J", "H")  # Jose
                pos += 1
                continue
            if pos == 0 and word[pos : pos + 4] != "JOSE":
                add("J", "A")
            elif (
                _is_vowel(word, pos - 1)
                and not _slavo_germanic(word)
                and word[pos + 1 : pos + 2] in ("A", "O")
            ):
                add("J", "H")
            elif pos == last:
                primary.append("J")
                secondary.append("")
            elif word[pos + 1 : pos + 2] not in (
                "L", "T", "K", "S", "N", "M", "B", "Z"
            ) and word[pos - 1 : pos] not in ("S", "K", "L"):
                add("J")
            pos += 2 if word[pos + 1 : pos + 2] == "J" else 1
            continue

        if c == "K":
            add("K")
            pos += 2 if word[pos + 1 : pos + 2] == "K" else 1
            continue

        if c == "L":
            if word[pos + 1 : pos + 2] == "L":
                # spanish e.g. cabrillo, gallegos
                if (
                    pos == length - 3
                    and word[pos - 1 : pos + 3] in ("ILLO", "ILLA", "ALLE")
                ) or (
                    (word[last - 1 : last + 1] in ("AS", "OS") or word[last] in "AO")
                    and word[pos - 1 : pos + 3] == "ALLE"
                ):
                    primary.append("L")
                    secondary.append("")
                    pos += 2
                    continue
                pos += 2
            else:
                pos += 1
            add("L")
            continue

        if c == "M":
            add("M")
            if (
                word[pos - 1 : pos + 2] == "UMB"
                and (pos + 1 == last or word[pos + 2 : pos + 4] == "ER")
            ) or word[pos + 1 : pos + 2] == "M":
                pos += 2
            else:
                pos += 1
            continue

        if c == "N":
            add("N")
            pos += 2 if word[pos + 1 : pos + 2] == "N" else 1
            continue

        if c == "\xd1":
            add("N")
            pos += 1
            continue

        if c == "P":
            if word[pos + 1 : pos + 2] == "H":
                add("F")
                pos += 2
                continue
            add("P")
            pos += 2 if word[pos + 1 : pos + 2] in ("P", "B") else 1
            continue

        if c == "Q":
            add("K")
            pos += 2 if word[pos + 1 : pos + 2] == "Q" else 1
            continue

        if c == "R":
            # french e.g. rogier
            if (
                pos == last
                and not _slavo_germanic(word)
                and word[pos - 2 : pos] == "IE"
                and word[pos - 4 : pos - 2] not in ("ME", "MA")
            ):
                primary.append("")
                secondary.append("R")
            else:
                add("R")
            pos += 2 if word[pos + 1 : pos + 2] == "R" else 1
            continue

        if c == "S":
            if word[pos - 1 : pos + 2] in ("ISL", "YSL"):
                pos += 1  # silent: island, isle
                continue
            if pos == 0 and word[:5] == "SUGAR":
                add("X", "S")
                pos += 1
                continue
            if word[pos : pos + 2] == "SH":
                if word[pos + 1 : pos + 5] in ("HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")  # germanic
                else:
                    add("X")
                pos += 2
                continue
            if word[pos : pos + 3] in ("SIO", "SIA") or word[pos : pos + 4] == "SIAN":
                if _slavo_germanic(word):
                    add("S")
                else:
                    add("S", "X")
                pos += 3
                continue
            if (pos == 0 and word[pos + 1 : pos + 2] in ("M", "N", "L", "W")) or word[
                pos + 1 : pos + 2
            ] == "Z":
                add("S", "X")  # anglicisations (smith -> schmidt)
                pos += 2 if word[pos + 1 : pos + 2] == "Z" else 1
                continue
            if word[pos : pos + 2] == "SC":
                if word[pos + 2 : pos + 3] == "H":
                    if word[pos + 3 : pos + 5] in ("OO", "ER", "EN", "UY", "ED", "EM"):
                        if word[pos + 3 : pos + 5] in ("ER", "EN"):
                            add("X", "SK")  # schermerhorn
                        else:
                            add("SK")  # school
                    elif pos == 0 and not _is_vowel(word, 3) and word[3:4] != "W":
                        add("X", "S")
                    else:
                        add("X")
                elif word[pos + 2 : pos + 3] in ("I", "E", "Y"):
                    add("S")
                else:
                    add("SK")
                pos += 3
                continue
            if pos == last and word[pos - 2 : pos] in ("AI", "OI"):
                primary.append("")
                secondary.append("S")  # french: resnais, artois
            else:
                add("S")
            pos += 2 if word[pos + 1 : pos + 2] in ("S", "Z") else 1
            continue

        if c == "T":
            if word[pos : pos + 4] == "TION" or word[pos : pos + 3] in ("TIA", "TCH"):
                add("X")
                pos += 3
                continue
            if word[pos : pos + 2] == "TH" or word[pos : pos + 3] == "TTH":
                if word[pos + 2 : pos + 4] in ("OM", "AM") or word[:4] in ("VAN ", "VON ") or word[:3] == "SCH":
                    add("T")  # thomas, thames
                else:
                    add("0", "T")  # 0 = 'th' phoneme
                pos += 2
                continue
            add("T")
            pos += 2 if word[pos + 1 : pos + 2] in ("T", "D") else 1
            continue

        if c == "V":
            add("F")
            pos += 2 if word[pos + 1 : pos + 2] == "V" else 1
            continue

        if c == "W":
            if word[pos : pos + 2] == "WR":
                add("R")
                pos += 2
                continue
            if pos == 0 and (_is_vowel(word, 1) or word[:2] == "WH"):
                if _is_vowel(word, 1):
                    add("A", "F")  # wasserman
                else:
                    add("A")  # wharton
                pos += 1
                continue
            if (
                (pos == last and _is_vowel(word, pos - 1))
                or word[pos - 1 : pos + 4] in ("EWSKI", "EWSKY", "OWSKI", "OWSKY")
                or word[:3] == "SCH"
            ):
                primary.append("")
                secondary.append("F")  # polish: filipowicz
                pos += 1
                continue
            if word[pos : pos + 4] in ("WICZ", "WITZ"):
                add("TS", "FX")
                pos += 4
                continue
            pos += 1  # else skip
            continue

        if c == "X":
            if not (
                pos == last
                and (word[pos - 3 : pos] in ("IAU", "EAU") or word[pos - 2 : pos] in ("AU", "OU"))
            ):
                add("KS")  # french: breaux
            pos += 2 if word[pos + 1 : pos + 2] in ("C", "X") else 1
            continue

        if c == "Z":
            if word[pos + 1 : pos + 2] == "H":
                add("J")  # chinese pinyin: zhao
                pos += 2
                continue
            if word[pos + 1 : pos + 3] in ("ZO", "ZI", "ZA") or (
                _slavo_germanic(word) and pos > 0 and word[pos - 1] != "T"
            ):
                add("S", "TS")
            else:
                add("S")
            pos += 2 if word[pos + 1 : pos + 2] == "Z" else 1
            continue

        pos += 1  # any other character: skip

    p = "".join(primary)
    s = "".join(secondary)
    return (p, "" if s == p else s)


# ---------------------------------------------------------------------------
# American Soundex as a pure column expression (no UDF) + generated SQL twin.
# ---------------------------------------------------------------------------
# Letter -> digit map (classic Russell/American table); '7' marks the
# H/W "transparent" letters, '0' the adjacency-breaking vowels+Y. Both
# the Spark expression and the SQL twin are generated from THIS string,
# so the two implementations cannot drift.
_SX_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_SX_DIGITS = "01230127022455012623017202"


def soundex_col(col):
    """American Soundex of a string column as a codegen'd fold — the
    third phonetic blocking key next to double metaphone (kernel) and
    Jaro-Winkler (rescoring): cheap, JVM-side, join-key friendly.

    Spec (implemented identically in :func:`soundex_sql`): uppercase,
    strip non-A-Z; keep the first letter; map every letter through the
    digit table; fold left-to-right with H/W transparent (previous code
    survives across them — 'Ashcraft' -> A261, not A226), vowels
    breaking adjacency, and adjacent equal digits collapsed (the first
    letter's own code seeds the collapse: 'Pfister' -> P236); first
    three surviving digits, zero-padded. Empty/no-alpha input -> ''.

    The sequential state (previous code) rides a string accumulator in
    ``F.aggregate``: acc = prev_digit || emitted_digits.
    """
    from pyspark.sql import functions as F

    s = F.regexp_replace(F.upper(col), "[^A-Z]", "")
    digits = F.translate(s, _SX_LETTERS, _SX_DIGITS)
    chars = F.split(digits, "")
    rest = F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0)))
    _END = 1 << 20

    def fold(acc, c):
        prev = F.substring(acc, 1, 1)
        out = F.substring(acc, 2, _END)
        return (
            F.when(c == F.lit("7"), acc)
            .when(c == F.lit("0"), F.concat(F.lit("0"), out))
            .when(c == prev, acc)
            .otherwise(F.concat(c, out, c))
        )

    folded = F.aggregate(rest, F.substring(digits, 1, 1), fold)
    code = F.concat(
        F.substring(s, 1, 1), F.rpad(F.substring(folded, 2, 3), 3, "0")
    )
    return F.when(F.length(s) > 0, code).otherwise(F.lit(""))


def soundex_sql(expr: str) -> str:
    """The identical Soundex as portable SQL text (DuckDB oracle twin,
    generated from the same digit table and fold spec)."""
    return f"""(CASE WHEN length(regexp_replace(upper({expr}), '[^A-Z]', '', 'g')) = 0 THEN ''
ELSE (SELECT s[1] || rpad(f[2:4], 3, '0') FROM (
  SELECT s, list_reduce(string_split(translate(s, '{_SX_LETTERS}', '{_SX_DIGITS}'), ''),
    (a, c) -> CASE WHEN c = '7' THEN a
                   WHEN c = '0' THEN '0' || a[2:]
                   WHEN c = a[1] THEN a
                   ELSE c || a[2:] || c END) AS f
  FROM (SELECT regexp_replace(upper({expr}), '[^A-Z]', '', 'g') AS s)
)) END)"""
