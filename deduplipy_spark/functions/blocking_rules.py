"""The reference's 22 blocking rules as pure Spark Column expressions.

Reference: ``deduplipy/blocking/blocking_rules.py:4-193`` — scalar Python
``str -> Optional[str]`` functions returning ``None`` on empty/blank input.
Here each is a JVM-side Column expression (whole-stage codegen, no UDF);
semantics match the reference's pytest vectors exactly
(``tests/test_blocking/test_blocking_rules.py``), including:

- ``.strip()`` strips ALL whitespace -> regexp trim, not ``trim()``
- ``.split()`` splits on whitespace runs -> ``split(x, '\\s+')``
- ``x[-n:]`` on short strings returns the whole string
- ``sorted_integers``/``largest_integer`` int-cast (leading zeros dropped,
  numeric sort); ``first/last_integer`` keep the digits as found
- empty/blank (or no-match for integer rules) -> NULL

NULL discipline matters because Spark's ``split``/``substring`` return ``''``
not NULL on empty input (SURVEY.md §1.2) — every rule is wrapped in an
explicit blank guard.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_WS = r"\s+"


def _trimmed(x: Column) -> Column:
    return F.regexp_replace(x, r"^\s+|\s+$", "")


def _blank_guard(x: Column, expr: Column) -> Column:
    """None when input is empty/blank (reference: `if len(x_trimmed)` guard)."""
    return F.when(F.length(_trimmed(x)) > 0, expr)


def _words(x: Column) -> Column:
    return F.split(_trimmed(x), _WS)


def whole_field(x: Column) -> Column:
    return _blank_guard(x, _trimmed(x))


def first_word(x: Column) -> Column:
    return _blank_guard(x, F.element_at(_words(x), 1))


def last_word(x: Column) -> Column:
    return _blank_guard(x, F.element_at(_words(x), -1))


def first_two_words(x: Column) -> Column:
    return _blank_guard(x, F.concat_ws(" ", F.slice(_words(x), 1, 2)))


def last_two_words(x: Column) -> Column:
    w = _words(x)
    expr = F.when(F.size(w) >= 2, F.concat_ws(" ", F.slice(w, -2, 2))).otherwise(
        F.element_at(w, 1)
    )
    return _blank_guard(x, expr)


def _first_n_letters(x: Column, n: int) -> Column:
    return _blank_guard(x, F.substring(_trimmed(x), 1, n))


def _last_n_letters(x: Column, n: int) -> Column:
    t = _trimmed(x)
    # Python t[-n:]: whole string when shorter than n
    expr = F.when(F.length(t) <= n, t).otherwise(F.substring(t, -n, n))
    return _blank_guard(x, expr)


def first_three_letters(x: Column) -> Column:
    return _first_n_letters(x, 3)


def last_three_letters(x: Column) -> Column:
    return _last_n_letters(x, 3)


def first_four_letters(x: Column) -> Column:
    return _first_n_letters(x, 4)


def last_four_letters(x: Column) -> Column:
    return _last_n_letters(x, 4)


def first_five_letters(x: Column) -> Column:
    return _first_n_letters(x, 5)


def last_five_letters(x: Column) -> Column:
    return _last_n_letters(x, 5)


def _no_space(x: Column) -> Column:
    # reference uses .replace(' ', '') — literal spaces only, no strip
    return F.regexp_replace(x, " ", "")


def _first_n_no_space(x: Column, n: int) -> Column:
    s = _no_space(x)
    return F.when(F.length(s) > 0, F.substring(s, 1, n))


def _last_n_no_space(x: Column, n: int) -> Column:
    s = _no_space(x)
    expr = F.when(F.length(s) <= n, s).otherwise(F.substring(s, -n, n))
    return F.when(F.length(s) > 0, expr)


def first_three_letters_no_space(x: Column) -> Column:
    return _first_n_no_space(x, 3)


def last_three_letters_no_space(x: Column) -> Column:
    return _last_n_no_space(x, 3)


def first_four_letters_no_space(x: Column) -> Column:
    return _first_n_no_space(x, 4)


def last_four_letters_no_space(x: Column) -> Column:
    return _last_n_no_space(x, 4)


def first_five_letters_no_space(x: Column) -> Column:
    return _first_n_no_space(x, 5)


def last_five_letters_no_space(x: Column) -> Column:
    return _last_n_no_space(x, 5)


def _ints(x: Column) -> Column:
    return F.regexp_extract_all(x, F.lit(r"\d+"), 0)


def sorted_integers(x: Column) -> Column:
    nums = F.array_sort(F.transform(_ints(x), lambda v: v.cast("bigint")))
    joined = F.array_join(F.transform(nums, lambda v: v.cast("string")), " ")
    return F.when(F.size(_ints(x)) > 0, joined)


def first_integer(x: Column) -> Column:
    return F.when(F.size(_ints(x)) > 0, F.element_at(_ints(x), 1))


def last_integer(x: Column) -> Column:
    return F.when(F.size(_ints(x)) > 0, F.element_at(_ints(x), -1))


def largest_integer(x: Column) -> Column:
    nums = F.transform(_ints(x), lambda v: v.cast("bigint"))
    return F.when(F.size(_ints(x)) > 0, F.array_max(nums).cast("string"))


def three_letter_abbreviation(x: Column) -> Column:
    w = F.regexp_extract_all(x, F.lit(r"[a-zA-Z]+"), 0)
    abbrev = F.concat(
        F.substring(F.element_at(w, 1), 1, 1),
        F.substring(F.element_at(w, 2), 1, 1),
        F.substring(F.element_at(w, 3), 1, 1),
    )
    return F.when(F.size(w) >= 3, abbrev)


# Same order as the reference registry (blocking_rules.py:189-193); rule index
# in this list is the namespacing suffix of fingerprints ('value:idx').
ALL_RULES: list = [
    whole_field, first_word, last_word, first_two_words, last_two_words,
    first_three_letters, last_three_letters, first_four_letters,
    last_four_letters, first_five_letters, last_five_letters,
    first_three_letters_no_space, last_three_letters_no_space,
    first_four_letters_no_space, last_four_letters_no_space,
    first_five_letters_no_space, last_five_letters_no_space,
    sorted_integers, first_integer, last_integer, largest_integer,
    three_letter_abbreviation,
]

RULES_BY_NAME = {r.__name__: r for r in ALL_RULES}
