"""Production-check operators: text-integrity guard + verification re-run.

A15 — text-integrity validation (CuratorReducer.java:512-527): the
reference intends to assert that annotation left the raw text within
Levenshtein distance 10 of the input, but its implementation compares
``other`` to ``other`` and so never fires. ``validate_text_integrity``
implements the check CORRECTLY as a distributed filter.

A19 — verification re-run (CuratorClient.java:660-853 verifyRecords):
re-annotate every record from scratch with force and compare every view
map for exact equality. ``verify_records`` is that oracle pattern as a
DataFrame computation: JSON-canonicalized view maps joined on identifier,
mismatches surfaced per record.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from curatorhadoopinterface_spark.plans.provide import VIEW_COLS, provide

DEFAULT_TOLERANCE = 10


def validate_text_integrity(
    before: DataFrame,
    after: DataFrame,
    id_col: str = "identifier",
    text_col: str = "raw_text",
    tolerance: int = DEFAULT_TOLERANCE,
) -> DataFrame:
    """Rows whose text drifted beyond ``tolerance`` edits across an
    annotation run (A15, implemented correctly — the reference's
    self-compare bug meant it never fired). One equi join on the
    identifier + a codegen'd levenshtein; returns the violations with
    their distance so callers can fail or quarantine."""
    b = before.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__before"))
    a = after.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__after"))
    return (
        b.join(a, "__id")
        .withColumn("edit_distance", F.levenshtein("__before", "__after"))
        .filter(F.col("edit_distance") > tolerance)
        .select(
            F.col("__id").alias(id_col),
            "edit_distance",
            F.col("__before").alias("text_before"),
            F.col("__after").alias("text_after"),
        )
    )


def _canon_views(df: DataFrame, prefix: str) -> DataFrame:
    """Project identifier + JSON-canonicalized view maps (to_json of a
    map is key-ordered deterministically per value layout — identical
    payloads serialize identically)."""
    cols = [F.to_json(F.col(c)).alias(f"{prefix}{c}") for c in VIEW_COLS if c in df.columns]
    return df.select(F.col("identifier"), *cols)


def verify_records(
    annotated: DataFrame,
    targets: str | list[str],
    text_col: str = "raw_text",
    id_col: str = "identifier",
) -> DataFrame:
    """Re-annotate every record from raw text with force (fresh views)
    and compare all view maps against ``annotated`` (A19). Returns one
    row per record with per-family match booleans; `ok` = all match.

    At scale this is the same shape as the original annotation run (one
    UDF stage + one join on the content hash) — the reference ran it as
    a full local re-annotation on the driver machine."""
    if id_col != "identifier":
        annotated = annotated.withColumnRenamed(id_col, "identifier")
    fresh = provide(
        annotated.select("identifier", text_col), targets, text_col=text_col
    )
    left = _canon_views(annotated, "a_")
    right = _canon_views(fresh, "b_")
    joined = left.join(right, "identifier", "full")
    checks = [
        (F.coalesce(F.col(f"a_{c}"), F.lit("{}")) == F.coalesce(F.col(f"b_{c}"), F.lit("{}"))).alias(
            f"{c}_match"
        )
        for c in VIEW_COLS
    ]
    out = joined.select("identifier", *checks)
    ok = None
    for c in VIEW_COLS:
        col = F.col(f"{c}_match")
        ok = col if ok is None else (ok & col)
    return out.withColumn("ok", ok)


def enforce_failure_budget(
    annotated: DataFrame, max_fraction: float = 0.4
) -> DataFrame:
    """A7's failure budget as a gate (CuratorJob.java:280-285 tolerates
    <=40% reduce-task failures in shared mode; here the budget is per
    ROW, which is the honest unit). Raises if the error fraction of a
    best_effort run exceeds ``max_fraction``; returns only the clean
    rows otherwise — callers chain .write on the survivors."""
    if "annotation_error" not in annotated.columns:
        return annotated
    agg = annotated.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("annotation_error").alias("n_err"),
    ).first()
    n, n_err = agg["n"], agg["n_err"]
    if n and n_err / n > max_fraction:
        raise RuntimeError(
            f"annotation failure budget exceeded: {n_err}/{n} rows failed "
            f"({n_err / n:.1%} > {max_fraction:.0%})"
        )
    return annotated.filter(F.col("annotation_error").isNull()).drop(
        "annotation_error"
    )
