"""Shared element-wise array-fold expression builders (dot products,
squared distances) in the house sequential-fold form.

History (r9, measured): an unrolled 64-term straight-line twin
(``init + t_0 + ... + t_63``) of these folds was built on the theory
that HigherOrderFunction lambdas evaluate interpreted while an unrolled
sum compiles under whole-stage codegen. Idle-machine interleaved A/B at
sf0.1/local[32] (tools/qtime.py, min-of-2, two process-level passes)
REJECTED it: the fold form was faster on every affected query —
dedup_semantic 1.8-2.0 s vs 2.9-5.9 s, sim_topk 0.56-0.61 s vs
1.10-1.22 s, emb_matryoshka_recall 1.6-2.0 s vs 4.1-4.8 s,
sim_ivf_nprobe 0.75 s vs 1.4-2.6 s unrolled. A 64-term tree (~190
nodes per use, several uses per query) pushes projections past the
codegen size thresholds, so the "codegen-friendly" form itself falls
back to interpretation — while costing 3-10x in Catalyst
analysis/optimization time per query build (driver-side, paid every
call) and slower interpreted evaluation of the bigger tree. A map-only
microbench (100k rows x dim 64) showed the per-row win of a true
unroll is ~0.1 us/row — negligible at any scale where the fold's
per-row cost matters less than the shuffle around it.

These helpers keep the call-site indirection so the experiment is
reproducible, but emit the fold text. The fold handles ANY array
length (unit tests feed dim-3 corpora); ``dim`` is accepted and
ignored for signature stability.
"""

from __future__ import annotations


def dot_float_as_double(a: str, b: str, dim: int | None = None) -> str:
    """Sequential-fold dot product over float arrays, accumulated in
    double precision (deterministic left-to-right IEEE order)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double)"
        " * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"
    )


def dot_double(a: str, b: str, dim: int | None = None) -> str:
    """Sequential-fold dot product over double arrays."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )


def sqdist_double(a: str, b: str, dim: int | None = None) -> str:
    """Sequential-fold squared L2 distance over double arrays."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )


def dot_bigint(a: str, b: str, dim: int | None = None) -> str:
    """Integer dot product (exact regardless of order)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " 0L, (acc, v) -> acc + v)"
    )


def sqdist_bigint(a: str, b: str, dim: int | None = None) -> str:
    """Integer squared distance."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )
