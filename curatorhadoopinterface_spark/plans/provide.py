"""provide(df, mode): the engine's query planner for annotation requests.

Reference lifecycle (SURVEY.md section 3): JobHandler plans a list of
MapReduce jobs (one per missing dependency), each job shuffling records
by document hash and RPC-ing every document to a local Curator
(CuratorReducer.java:74-202, process boundary per view per document).

Spark-first collapse: the dependency closure is computed once
(plans/registry.dependency_closure), and ALL requested modes run in ONE
``mapInPandas`` pass — one Arrow batch boundary total, no shuffle at all
(annotation is embarrassingly per-row). Per-row memoization: views
already present in a record's maps are reused, not recomputed
(CuratorHandler.provide, :1029-1052). Stage fusion (A10) is therefore
universal, not a TOKEN/POS/CHUNK special case.

Scale: per-partition cost is pure Python over Arrow batches; heavy
models would be loaded as module-level singletons per worker
(the reference's per-node annotator servers, minus warmup sleeps).
Partition sizing is by input bytes (Spark file splits), not
file count — fixing the reference's task-per-document granularity.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType

from curatorhadoopinterface_spark.plans.registry import (
    MODES,
    VIEW_TO_MODE,
    ViewType,
    dependency_closure,
    forced_start_plan,
    invalidation_closure,
)
from curatorhadoopinterface_spark.schema import CLUSTERING, FOREST, LABELING
from curatorhadoopinterface_spark.session import ensure_min_partitions

if TYPE_CHECKING:
    import pandas as pd

from pyspark.sql.types import MapType, StringType

VIEW_COLS: dict[str, MapType] = {
    "label_views": MapType(StringType(), LABELING),
    "cluster_views": MapType(StringType(), CLUSTERING),
    "parse_views": MapType(StringType(), FOREST),
}


def _parse_views_json(raw: str | None, family: str) -> dict:
    """Decode a to_json()'d view map back to plain dicts.

    Existing view maps enter the UDF as JSON strings rather than Arrow
    maps: pyarrow's map->pandas conversion segfaults on this depth of
    nesting (map<string,struct<array<struct<...map<int,string>>>>>), and
    JSON round-trip is JVM-side + cheap relative to annotation. JSON
    stringifies the int keys of Node.children, so restore them here.
    """
    import json

    if not raw:
        return {}
    views = json.loads(raw)
    if family == "parse_views":
        for payload in views.values():
            for tree in payload.get("trees") or []:
                for node in tree.get("nodes") or []:
                    if node.get("children"):
                        node["children"] = {int(k): v for k, v in node["children"].items()}
    return views


def provide(
    df: DataFrame,
    target: str | list[str],
    text_col: str = "raw_text",
    best_effort: bool = False,
    force: bool = False,
    force_start: str | None = None,
) -> DataFrame:
    """Ensure the view(s) for ``target`` mode(s) (and every dependency)
    exist on each record; compute only what's missing, per row.

    ``force=True`` is the reference's ``provide(view, text,
    forceUpdate)`` third argument (curator-interfaces/curator.thrift:66,
    honored at CuratorHandler.java:1029-1052): the TARGET view(s) are
    recomputed even when already present — the re-annotate-with-a-
    retrained-same-version-model case — while upstream dependencies are
    still reused. Views downstream of a recomputed target are dropped
    too (cascadeRemoveStaleFields, CuratorHandler.java:628-644): a
    dependent built on the old target would silently disagree with the
    fresh one.

    ``force_start="POS"`` is JobHandler's ``[START]`` argv override
    (JobHandler.java:78-109, 264-331): re-run the pipeline from the
    named dependency stage onward, reusing only views upstream of it.
    Mutually composable with ``force`` (union of forced view sets).

    ``best_effort=True`` is the reference's failure budget
    (CuratorJob.java:280-285 tolerates <=40% reduce-task failures in
    shared mode) done right: a document whose annotation raises keeps
    its input views untouched and carries the error in an
    ``annotation_error`` column instead of failing the task — the 100 TB
    policy, where one malformed document must not kill a stage. Strict
    mode (default) propagates the exception so tests fail loud.
    """
    import pyspark.sql.functions as F

    targets = [target] if isinstance(target, str) else list(target)
    modes: list[str] = []
    for t in targets:
        for m in dependency_closure(t):
            if m not in modes:
                modes.append(m)

    # views to discard per row before the memoized annotate pass: the
    # forced targets (and their dependents) and/or everything at-or-
    # after the forced start. Plain Python set baked into the UDF
    # closure — zero plan-side cost.
    drop_views: set[str] = set()
    if force:
        forced_views = set()
        for t in targets:
            forced_views.update({MODES[t].view, *MODES[t].extra_views})
        drop_views |= invalidation_closure(forced_views)
    if force_start is not None:
        hit = False
        for t in targets:
            if force_start not in dependency_closure(t):
                continue  # multi-target: override only the paths through it
            hit = True
            _, forced_modes = forced_start_plan(t, force_start)
            for m in forced_modes:
                drop_views.update({MODES[m].view, *MODES[m].extra_views})
        if not hit:
            raise ValueError(
                f"forced start {force_start!r} is not in the dependency "
                f"closure of any target in {targets}"
            )

    fields = [f for f in df.schema.fields if f.name not in VIEW_COLS]
    passthrough = [f.name for f in fields]
    # label/cluster views leave the worker as JSON strings and are parsed
    # JVM-side by from_json (Jackson + codegen — measured ~1.7x faster
    # than pyarrow's python-dict -> nested-map conversion). parse_views
    # can't: from_json forbids non-string map keys (Node.children is
    # map<int,string>), so that family alone takes the Arrow dict path.
    out_schema = StructType(
        fields
        + [
            StructField("__label_views_json", StringType(), True),
            StructField("__cluster_views_json", StringType(), True),
            StructField("parse_views", VIEW_COLS["parse_views"], True),
        ]
        + ([StructField("annotation_error", StringType(), True)] if best_effort else [])
    )
    out_cols = [f.name for f in out_schema.fields]

    # feed existing view maps to the worker as JSON strings (see
    # _parse_views_json for why), everything else as-is.
    json_cols = {c: f"__{c}_json" for c in VIEW_COLS if c in df.columns}
    udf_input = df.select(
        *passthrough, *[F.to_json(F.col(c)).alias(alias) for c, alias in json_cols.items()]
    )

    # annotation is CPU-bound in the Python worker: a small corpus that
    # parquet packed into fewer splits than there are cores would leave
    # most executors idle (the 1-partition/1-core trap). Plan-side split
    # estimate — no RDD materialization; no-op at 100 TB.
    udf_input = ensure_min_partitions(udf_input)

    def annotate_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # worker-side import: annotator "model load" happens once per
        # worker process (module import), amortized over all batches.
        from curatorhadoopinterface_spark.annotators.light import annotate_record

        import json

        for pdf in batches:
            n = len(pdf)
            texts = pdf[text_col].tolist()
            families = {
                col: (pdf[alias].tolist() if alias in pdf.columns else [None] * n)
                for col, alias in json_cols.items()
            }
            out_label, out_cluster, out_parse, out_err = [], [], [], []
            for i in range(n):
                views: dict = {}
                for col in VIEW_COLS:
                    if col in families:
                        views.update(_parse_views_json(families[col][i], col))
                for v in drop_views:
                    views.pop(v, None)
                if best_effort:
                    try:
                        annotate_record(texts[i], views, modes)
                        out_err.append(None)
                    except Exception as exc:  # noqa: BLE001 - budget policy
                        out_err.append(f"{type(exc).__name__}: {exc}")
                else:
                    annotate_record(texts[i], views, modes)
                label, cluster, parse = {}, {}, {}
                for vname, payload in views.items():
                    vt = MODES[VIEW_TO_MODE[vname]].view_type
                    if vt is ViewType.LABEL:
                        label[vname] = payload
                    elif vt is ViewType.CLUSTER:
                        cluster[vname] = payload
                    else:
                        parse[vname] = payload
                # always dump (even "{}") so from_json yields an empty
                # map, not NULL — view-count exprs rely on map semantics
                out_label.append(json.dumps(label))
                out_cluster.append(json.dumps(cluster))
                out_parse.append(parse)
            res = pdf[passthrough].copy()
            res["__label_views_json"] = out_label
            res["__cluster_views_json"] = out_cluster
            res["parse_views"] = out_parse
            if best_effort:
                res["annotation_error"] = out_err
            yield res[out_cols]

    annotated = udf_input.mapInPandas(annotate_batches, out_schema)
    return annotated.select(
        *passthrough,
        F.from_json("__label_views_json", VIEW_COLS["label_views"]).alias("label_views"),
        F.from_json("__cluster_views_json", VIEW_COLS["cluster_views"]).alias(
            "cluster_views"
        ),
        "parse_views",
        *(["annotation_error"] if best_effort else []),
    )


def annotate(df: DataFrame, mode: str, text_col: str = "raw_text") -> DataFrame:
    """Single-mode alias of :func:`provide` (A24 annotator dispatch)."""
    return provide(df, mode, text_col=text_col)
