"""PII redaction patterns on planted realistic strings — the coverage the
synthetic-seed oracle of text_pii_redact can't exercise."""

import pyspark.sql.functions as F

from curatorhadoopinterface_spark.operators.textstats import _EMAIL_RE, _PHONE_RE

CASES = [
    # (text, expected_redacted)
    ("mail john.doe+tag@sub.example.co.uk now", "mail <EMAIL> now"),
    ("x a_b%c@host.io y", "x <EMAIL> y"),
    ("call 555-123-4567 or 555.987.6543", "call <PHONE> or <PHONE>"),
    ("order 1234-567-89012 is not a phone", "order 1234-567-89012 is not a phone"),
    ("ids like 555-1234 stay", "ids like 555-1234 stay"),
    ("no pii here", "no pii here"),
    ("a@b.co and 111-222-3333", "<EMAIL> and <PHONE>"),
]


def test_redaction_patterns(spark):
    df = spark.createDataFrame([(t,) for t, _ in CASES], "text string")
    out = df.select(
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("red")
    ).collect()
    got = [r.red for r in out]
    assert got == [e for _, e in CASES], got


def test_duckdb_agrees_on_patterns():
    """The oracle engine's RE2 and Spark's Java regex must redact these
    strings identically — the cross-engine contract the query rests on."""
    import duckdb

    for text, expected in CASES:
        (got,) = duckdb.execute(
            "SELECT REGEXP_REPLACE(REGEXP_REPLACE(?, ?, '<EMAIL>', 'g'),"
            " ?, '<PHONE>', 'g')",
            [text, _EMAIL_RE, _PHONE_RE],
        ).fetchone()
        assert got == expected, (text, got)
