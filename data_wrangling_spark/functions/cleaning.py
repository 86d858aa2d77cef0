"""Cleaning / standardization scalar ops — pure Column expressions.

Reference parity (SURVEY.md §2.5; file:line cites into /root/reference/):

- ``clean_street``     Step_2_CSV_and_Data_Cleaning.py:242-247 (config :32-53)
- ``clean_phone``      Step_2_CSV_and_Data_Cleaning.py:249-257
- ``clean_city``       Step_2_CSV_and_Data_Cleaning.py:259-267
- ``clean_postcode``   Step_2_CSV_and_Data_Cleaning.py:270-273
- ``clean_state``      Step_2_CSV_and_Data_Cleaning.py:276-279
- tag namespace split  Step_2_CSV_and_Data_Cleaning.py:201-230 (regex :20)

Every op compiles to built-in JVM expressions (regexp_extract/replace, when,
map literals) — no Python UDFs, so the whole cleaning stage stays inside
whole-stage codegen and is a narrow (shuffle-free) transformation at any
scale (SURVEY.md §4).

Total-function policy (SURVEY.md §2.9 item 5): the reference's cleaners are
*partial* — unknown street suffix raises KeyError (S2:246), postcode without
a 5-digit run raises AttributeError (S2:272). At 100 TB a per-row raise is
not an option; these ops pass through (street) or yield '' (postcode)
instead, and ``quarantine`` counters keep the deviations visible.

Faithful-semantics notes (verified against the reference source, not just
SURVEY.md):

- multi-colon tag keys: ``re_after_colon`` (S2:205) backtracks so a trailing
  non-lowercase segment is DROPPED: ``tiger:name_base:1`` → key
  ``name_base`` (not ``name_base:1``). Two lowercase segments survive:
  ``a:b:c`` → key ``b:c``; a fourth is dropped: ``a:b:c:d`` → key ``b:c``.
- phone: a 10-digit number that genuinely starts with 1 still loses that
  digit (S2:253-254 checks only the prefix); short inputs produce dangling
  dashes ('12' → '12--') exactly as Python slicing does.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# configuration as data (S2:32-53); identical values, order irrelevant
# ---------------------------------------------------------------------------

#: street suffixes that need no correction (S2:32-35)
EXPECTED_STREET_TYPES = [
    "Wren", "West", "Way", "Walk", "Trace", "Talamore", "Ridge", "Reinhardt",
    "Ravine", "Pointe", "Pine", "Path", "Pass", "Park", "North", "Maple",
    "Loop", "Landing", "Juniper", "East", "Crossing", "Cove", "Cliff",
    "CastlePath", "Castle", "Canterwood", "Bend", "Drive", "Boulevard",
    "973", "685", "619", "459", "3177", "290", "275", "138", "129", "1100",
    "Court", "Lane", "Square", "Avenue", "Trail", "Street", "Place",
    "Terrace", "Parkway", "Circle", "Road",
]

#: suffix corrections (S2:38-53)
STREET_MAPPING = {
    "St": "Street",
    "St.": "Street",
    "Ave": "Avenue",
    "Blvd": "Boulevard",
    "Rd.": "Road",
    "Rd": "Road",
    "street": "Street",
    "Trl": "Trail",
    "Ln": "Lane",
    "Dr": "Drive",
    "Cv": "Cove",
    "Ct": "Court",
    "Cc": "Cove",
    "pass": "Pass",
    "Terrance": "Terrace",
}

# regexes (Java syntax; semantics checked against the Python originals)
STREET_TYPE_RE = r"\b\S+\.?$"          # S2:26 (case-insensitive flag irrelevant: no letters)
STATE_TYPE_RE = r"[A-Za-z+]+"          # S2:27
POST_CODE_RE = r"\d{5}"                # S2:28
CITY_TYPE_RE = r"^[\w\-]+"             # S2:29
HOUSENUMBER_RE = r"\d+"                # Step_1_Audit_Values.py:16
LOWER_COLON_RE = r"^([a-z]|_)+:([a-z]|_)+"   # S2:20
PROBLEMCHARS_RE = r"""[=+/&<>;'"?%#$@,. \t\r\n]"""  # S2:21 (char class: no escaping needed)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# scalar cleaners
# ---------------------------------------------------------------------------

def street_type(col: Column | str) -> Column:
    """Last whitespace token incl. trailing dot, from the first word
    boundary ('' if none) — the audit bucket AND the mapping key (S2:243)."""
    return F.regexp_extract(_col(col), STREET_TYPE_RE, 0)


def clean_street(col: Column | str) -> Column:
    """OP-FN-STREET (S2:242-247): replace a known-bad last token via
    STREET_MAPPING; expected or unknown tokens pass through (total-fn
    deviation from the reference's KeyError, SURVEY.md §2.9.5)."""
    c = _col(col)
    token = street_type(c)
    mapping = F.create_map(
        *[F.lit(x) for kv in STREET_MAPPING.items() for x in kv]
    )
    replacement = mapping[token]
    needs_fix = (~token.isin(EXPECTED_STREET_TYPES)) & replacement.isNotNull()
    return F.when(needs_fix, F.regexp_replace(c, STREET_TYPE_RE, replacement)).otherwise(c)


def clean_phone(col: Column | str) -> Column:
    """OP-FN-PHONE (S2:249-257): strip non-digits, drop one leading '1',
    format 3-3-rest. Exact parity incl. the short-input dangling dashes."""
    digits = F.regexp_replace(_col(col), r"[^0-9]+", "")
    digits = F.when(
        F.substring(digits, 1, 1) == "1", digits.substr(F.lit(2), F.length(digits))
    ).otherwise(digits)
    return F.concat(
        F.substring(digits, 1, 3),
        F.lit("-"),
        F.substring(digits, 4, 3),
        F.lit("-"),
        digits.substr(F.lit(7), F.length(digits)),
    )


def clean_city(col: Column | str) -> Column:
    """OP-FN-CITY (S2:259-267): keep the leading word-char/hyphen run
    (drops ', TX' tails); hardcoded 'Round' → 'Round Rock' fixup."""
    c = _col(col)
    first = F.regexp_extract(c, CITY_TYPE_RE, 0)
    fixed = F.when(first == "Round", F.lit("Round Rock")).otherwise(first)
    return F.when(first == "", c).otherwise(fixed)


def clean_postcode(col: Column | str) -> Column:
    """OP-FN-POSTCODE (S2:270-273): first 5-digit run; '' when absent
    (total-fn deviation from the reference's AttributeError)."""
    return F.regexp_extract(_col(col), POST_CODE_RE, 0)


def clean_state(col: Column | str) -> Column:
    """OP-FN-STATE (S2:276-279): exact 'TX' → 'Texas', else pass-through."""
    c = _col(col)
    return F.when(c == "TX", F.lit("Texas")).otherwise(c)


#: dispatch table: post-split tag ``key`` → cleaner (S2:90-113 / :142-165)
CLEANERS = {
    "street": clean_street,
    "phone": clean_phone,
    "postcode": clean_postcode,
    "state": clean_state,
    "city": clean_city,
}


def clean_tag_value(key: Column | str, value: Column | str) -> Column:
    """Apply the per-key cleaner dispatch as one when-chain (lazy per row)."""
    k, v = _col(key), _col(value)
    out = F.when(k == "street", clean_street(v))
    for name, fn in CLEANERS.items():
        if name != "street":
            out = out.when(k == name, fn(v))
    return out.otherwise(v)


# ---------------------------------------------------------------------------
# tag namespace split (OP-TAG-SPLIT, S2:201-230)
# ---------------------------------------------------------------------------

def is_problem_key(col: Column | str) -> Column:
    """OP-FLT-PROBLEM predicate (S2:21, applied S2:80-81/:133-134)."""
    return _col(col).rlike(PROBLEMCHARS_RE)


def tag_type(col: Column | str, default: str = "regular") -> Column:
    """Namespace prefix before the first colon when the key matches
    LOWER_COLON (S2:20, S2:204), else the default type (S2:224-230)."""
    c = _col(col)
    return F.when(
        c.rlike(LOWER_COLON_RE), F.regexp_extract(c, r"^([a-z_]+):", 1)
    ).otherwise(F.lit(default))


def tag_key(col: Column | str) -> Column:
    """Post-colon key with the reference's exact backtracking semantics
    (S2:205): up to TWO lowercase segments after the first colon survive;
    trailing non-lowercase segments are dropped ('tiger:name_base:1' →
    'name_base'; 'a:b:c:d' → 'b:c'); non-matching keys stay whole."""
    c = _col(col)
    two = F.regexp_extract(c, r"^[a-z_]+:([a-z_]+:[a-z_]+)", 1)
    one = F.regexp_extract(c, r"^[a-z_]+:([a-z_]+)", 1)
    return (
        F.when(~c.rlike(LOWER_COLON_RE), c)
        .when(two != "", two)
        .otherwise(one)
    )
