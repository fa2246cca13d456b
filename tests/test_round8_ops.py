"""Round-8 invariants: short-doc shingle guard, PSI integer path."""

from __future__ import annotations

import duckdb

SF = "/root/testdata/sf0.001"


def test_shingle_explode_drops_sub3_word_docs(spark):
    """Docs under 3 words have NO 3-gram: both the engine and the
    oracle recipe must emit zero shingles for them (r7 ADVICE
    dedup.py:1974 — unguarded, Spark's concat_ws emitted a degenerate
    short gram while DuckDB's || NULL-propagated into zero rows)."""
    from curatorhadoopinterface_spark.operators.dedup import (
        _SHINGLES_ORACLE,
        shingle_explode,
    )

    docs = [(1, "one two"), (2, "solo"), (3, "alpha beta gamma delta")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r.doc_id, r.shingle) for r in shingle_explode(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in docs)
        + ") t(doc_id, text)"
    )
    want = {
        tuple(r)
        for r in con.execute(
            f"WITH {_SHINGLES_ORACLE} SELECT doc_id, shingle FROM shingles"
        ).fetchall()
    }
    assert got == want
    assert got == {
        (3, "alpha beta gamma"),
        (3, "beta gamma delta"),
    }


def test_drift_psi_integer_end_to_end(spark):
    """psi_micro must stay BIGINT through the window sum — no double
    hop that would lose exactness past 2^53 (r7 ADVICE stats.py:953)."""
    from curatorhadoopinterface_spark.operators.stats import drift_psi

    df = drift_psi(spark, SF)
    dtypes = dict(df.dtypes)
    assert dtypes["psi_micro"] == "bigint"
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "cast(psi_micro" not in plan.lower()
    rows = df.collect()
    assert len(rows) >= 2
    psi = {r.psi_micro for r in rows}
    assert len(psi) == 1  # window over () -> one global PSI
