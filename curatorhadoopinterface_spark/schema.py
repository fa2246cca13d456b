"""Engine-native Record schema (SURVEY.md section 1.4, FIXTURES.md B).

Mirrors the reference's Thrift ``Record`` struct
(modified_files_in_curator/curator-interfaces/curator.thrift:29-44) as a
Spark ``StructType``: one row per document, open-keyed MAP columns for the
annotation view families. Span/Labeling/Clustering/Forest payloads follow
the generated Thrift base classes (SURVEY.md section 1.2).

Scale note: MapType view columns keep the reference's open keying, but
nested maps defeat Parquet column pruning — the incremental layer promotes
hot views to top-level columns when a corpus is persisted (SURVEY.md known
hard part #4).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Span: half-open character interval over raw_text
# (curator.thrift Span; Span.java:56-80 in the generated base classes).
SPAN = StructType(
    [
        StructField("start", IntegerType(), False),
        StructField("ending", IntegerType(), False),
        StructField("label", StringType(), True),
        StructField("score", DoubleType(), True),
        StructField("source", StringType(), True),
        StructField("attributes", MapType(StringType(), StringType()), True),
    ]
)

# Labeling: one flat annotation layer (Labeling.java:49-61).
LABELING = StructType(
    [
        StructField("labels", ArrayType(SPAN), True),
        StructField("source", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)

# Clustering: list of span-groups, e.g. coref chains (Clustering.java:51-63).
CLUSTERING = StructType(
    [
        StructField(
            "clusters",
            ArrayType(StructType([StructField("labels", ArrayType(SPAN), True)])),
            True,
        ),
        StructField("source", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)

# Forest/Tree/Node: tree as node array + root index (Forest.java:48-56,
# Tree.java:49-61, Node.java:53-69). children: child-node-index -> edge label.
NODE = StructType(
    [
        StructField("label", StringType(), True),
        StructField("span", SPAN, True),
        StructField("children", MapType(IntegerType(), StringType()), True),
    ]
)

TREE = StructType(
    [
        StructField("top", IntegerType(), True),
        StructField("nodes", ArrayType(NODE), True),
        StructField("score", DoubleType(), True),
    ]
)

FOREST = StructType(
    [
        StructField("trees", ArrayType(TREE), True),
        StructField("source", StringType(), True),
    ]
)

# Relation: a labeled edge between two spans of the SAME View, start/ending
# are indices into View.spans (Relation.java:42-46 TField constants).
RELATION = StructType(
    [
        StructField("start", IntegerType(), False),
        StructField("ending", IntegerType(), False),
        StructField("label", StringType(), True),
        StructField("score", DoubleType(), True),
        StructField("source", StringType(), True),
    ]
)

# View: the general spans+relations graph payload (curator.thrift:41,
# View.java:42-46: 1 spans, 2 relations, 3 rawText, 4 source, 5 score —
# per-view rawText duplicates the Record's and is dropped, like Labeling's).
VIEW = StructType(
    [
        StructField("spans", ArrayType(SPAN), True),
        StructField("relations", ArrayType(RELATION), True),
        StructField("source", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)

# The Record row: identifier = sha1("FLAG:" + whitespaced + ":" + raw_text),
# reproducing Identifier.java:63-70 exactly (see functions/hashing.py).
RECORD = StructType(
    [
        StructField("identifier", StringType(), False),
        StructField("raw_text", StringType(), False),
        StructField("whitespaced", BooleanType(), False),
        StructField("label_views", MapType(StringType(), LABELING), True),
        StructField("cluster_views", MapType(StringType(), CLUSTERING), True),
        StructField("parse_views", MapType(StringType(), FOREST), True),
        StructField("views", MapType(StringType(), VIEW), True),
    ]
)
