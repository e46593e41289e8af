"""Every assertion from the reference's rule tests, replayed through Spark.

Source vectors: /root/reference/tests/test_blocking/test_blocking_rules.py
(22 test functions). Executed as ONE Spark job: one row per (rule, input),
one column per rule expression.
"""

import pyspark.sql.functions as F
import pytest

from deduplipy_spark.functions.blocking_rules import ALL_RULES, RULES_BY_NAME

VECTORS = [
    ("whole_field", "one two 3", "one two 3"),
    ("whole_field", "one", "one"),
    ("whole_field", " ", None),
    ("whole_field", "", None),
    ("first_word", "one two", "one"),
    ("first_word", " one two", "one"),
    ("first_word", " ", None),
    ("first_word", "", None),
    ("last_word", "one two", "two"),
    ("last_word", " one two", "two"),
    ("last_word", " ", None),
    ("last_word", "", None),
    ("first_two_words", "one two three", "one two"),
    ("first_two_words", "one two", "one two"),
    ("first_two_words", "one", "one"),
    ("first_two_words", " one two three ", "one two"),
    ("first_two_words", " ", None),
    ("first_two_words", "", None),
    ("last_two_words", "one two three", "two three"),
    ("last_two_words", "one two", "one two"),
    ("last_two_words", "one", "one"),
    ("last_two_words", " one two three ", "two three"),
    ("last_two_words", " ", None),
    ("last_two_words", "", None),
    ("first_three_letters", "onetwo", "one"),
    ("first_three_letters", "one ", "one"),
    ("first_three_letters", " one", "one"),
    ("first_three_letters", " ", None),
    ("first_three_letters", "", None),
    ("last_three_letters", "onetwo", "two"),
    ("last_three_letters", "one ", "one"),
    ("last_three_letters", " one", "one"),
    ("last_three_letters", " ", None),
    ("last_three_letters", "", None),
    ("first_four_letters", "onetwo", "onet"),
    ("first_four_letters", "one ", "one"),
    ("first_four_letters", " one", "one"),
    ("first_four_letters", "12345", "1234"),
    ("first_four_letters", "12", "12"),
    ("first_four_letters", " ", None),
    ("first_four_letters", "", None),
    ("last_four_letters", "onetwo", "etwo"),
    ("last_four_letters", "four ", "four"),
    ("last_four_letters", " four", "four"),
    ("last_four_letters", "12345", "2345"),
    ("last_four_letters", "12", "12"),
    ("last_four_letters", " ", None),
    ("last_four_letters", "", None),
    ("first_five_letters", "onetwo", "onetw"),
    ("first_five_letters", "one ", "one"),
    ("first_five_letters", " one", "one"),
    ("first_five_letters", "123456", "12345"),
    ("first_five_letters", "12", "12"),
    ("first_five_letters", " ", None),
    ("first_five_letters", "", None),
    ("last_five_letters", "onetwo", "netwo"),
    ("last_five_letters", "one ", "one"),
    ("last_five_letters", " one", "one"),
    ("last_five_letters", "123456", "23456"),
    ("last_five_letters", "12", "12"),
    ("last_five_letters", " ", None),
    ("last_five_letters", "", None),
    ("first_three_letters_no_space", "on etwo", "one"),
    ("first_three_letters_no_space", "one ", "one"),
    ("first_three_letters_no_space", " one", "one"),
    ("first_three_letters_no_space", " ", None),
    ("first_three_letters_no_space", "", None),
    ("last_three_letters_no_space", "onet wo", "two"),
    ("last_three_letters_no_space", "one ", "one"),
    ("last_three_letters_no_space", " one", "one"),
    ("last_three_letters_no_space", " ", None),
    ("last_three_letters_no_space", "", None),
    ("first_four_letters_no_space", "on e two", "onet"),
    ("first_four_letters_no_space", "one ", "one"),
    ("first_four_letters_no_space", " one", "one"),
    ("first_four_letters_no_space", " ", None),
    ("first_four_letters_no_space", "", None),
    ("last_four_letters_no_space", "on e two", "etwo"),
    ("last_four_letters_no_space", "one ", "one"),
    ("last_four_letters_no_space", " one", "one"),
    ("last_four_letters_no_space", " ", None),
    ("last_four_letters_no_space", "", None),
    ("first_five_letters_no_space", "on e two", "onetw"),
    ("first_five_letters_no_space", "one ", "one"),
    ("first_five_letters_no_space", " one", "one"),
    ("first_five_letters_no_space", " ", None),
    ("first_five_letters_no_space", "", None),
    ("last_five_letters_no_space", "on e two", "netwo"),
    ("last_five_letters_no_space", "one ", "one"),
    ("last_five_letters_no_space", " one", "one"),
    ("last_five_letters_no_space", " ", None),
    ("last_five_letters_no_space", "", None),
    ("sorted_integers", "2 1 word", "1 2"),
    ("sorted_integers", "2 word 1", "1 2"),
    ("sorted_integers", "2", "2"),
    ("sorted_integers", "word", None),
    ("sorted_integers", " ", None),
    ("sorted_integers", "", None),
    ("first_integer", "2 1 word", "2"),
    ("first_integer", "word 2 1 word", "2"),
    ("first_integer", "word2 1 word", "2"),
    ("first_integer", "2", "2"),
    ("first_integer", "word", None),
    ("first_integer", " ", None),
    ("first_integer", "", None),
    ("last_integer", "2 1 word", "1"),
    ("last_integer", "word 2 1 word", "1"),
    ("last_integer", "word2 1 word", "1"),
    ("last_integer", "2", "2"),
    ("last_integer", "word", None),
    ("last_integer", " ", None),
    ("last_integer", "", None),
    ("largest_integer", "2 1 word", "2"),
    ("largest_integer", "word 2 1 word", "2"),
    ("largest_integer", "word2 1 wo99rd", "99"),
    ("largest_integer", "2", "2"),
    ("largest_integer", "word", None),
    ("largest_integer", " ", None),
    ("largest_integer", "", None),
    ("three_letter_abbreviation", "one two three", "ott"),
    ("three_letter_abbreviation", "one two three four", "ott"),
    ("three_letter_abbreviation", "one.two three", "ott"),
    ("three_letter_abbreviation", "one two", None),
    ("three_letter_abbreviation", "one", None),
    ("three_letter_abbreviation", " ", None),
    ("three_letter_abbreviation", "", None),
    # extra: leading-zero behavior (int rules keep/drop zeros like Python)
    ("first_integer", "a 007 09", "007"),
    ("sorted_integers", "010 2", "2 10"),
    ("largest_integer", "0010 2", "10"),
]


def test_all_rule_vectors_one_job(spark):
    rows = [(i, name, inp, exp) for i, (name, inp, exp) in enumerate(VECTORS)]
    df = spark.createDataFrame(rows, "i int, rule string, input string, expected string")
    sel = df.select(
        "i", "rule", "expected",
        *[RULES_BY_NAME[n](F.col("input")).alias(f"out_{n}") for n in RULES_BY_NAME],
    )
    pdf = sel.toPandas().set_index("i")
    failures = []
    for i, (name, inp, exp) in enumerate(VECTORS):
        got = pdf.loc[i, f"out_{name}"]
        got = None if got is None or (isinstance(got, float)) else got
        if got != exp:
            failures.append((name, repr(inp), "expected", exp, "got", got))
    assert not failures, failures


def test_registry_order_matches_reference():
    # fingerprint namespacing 'value:idx' depends on this order (blocking.py:189-193)
    names = [r.__name__ for r in ALL_RULES]
    assert names[0] == "whole_field"
    assert names[3] == "first_two_words"
    assert names.index("first_three_letters") == 5
    assert names[-1] == "three_letter_abbreviation"
    assert len(names) == 22
