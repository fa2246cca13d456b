"""provide(..., force=True) — the reference's forceUpdate third argument
(curator-interfaces/curator.thrift:66, honored at
CuratorHandler.java:1029-1052) — and the JobHandler [START] forced-first-
mode override (JobHandler.java:78-109, determineDependencies :264-331)."""

import pyspark.sql.functions as F
import pytest

from curatorhadoopinterface_spark.plans.provide import provide
from curatorhadoopinterface_spark.plans.registry import forced_start_plan

# rewrite one label view's span labels to a sentinel, in-plan (no
# collect/recreate round-trip through the nested schema)
def _corrupt_view(df, view: str):
    return df.withColumn(
        "label_views",
        F.expr(
            f"""transform_values(label_views, (k, v) -> CASE WHEN k = '{view}'
            THEN struct(
              transform(v.labels, l -> struct(
                l.start as start, l.ending as ending, 'XXX' as label,
                l.score as score, l.source as source,
                l.attributes as attributes)) as labels,
              v.source as source, v.score as score)
            ELSE v END)"""
        ),
    )


def test_without_force_mutated_view_is_reused(spark, corpus):
    ann = provide(corpus, "POS")
    mutated = _corrupt_view(ann, "pos")
    again = provide(mutated, "POS").collect()
    for r in again:
        labels = [s.label for s in r.label_views["pos"].labels]
        assert labels and all(lb == "XXX" for lb in labels)


def test_force_recomputes_target_but_reuses_dependencies(spark, corpus):
    ann = provide(corpus, "POS")
    # corrupt BOTH views: force must refresh pos and keep tokens as-is
    mutated = _corrupt_view(_corrupt_view(ann, "pos"), "tokens")
    forced = {r.identifier: r for r in provide(mutated, "POS", force=True).collect()}
    direct = {r.identifier: r for r in provide(corpus, "POS").collect()}
    for ident, r in forced.items():
        pos_labels = [s.label for s in r.label_views["pos"].labels]
        assert pos_labels == [s.label for s in direct[ident].label_views["pos"].labels]
        assert "XXX" not in pos_labels
        # the TOKEN dependency was NOT recomputed: the sentinel survives
        tok_labels = [s.label for s in r.label_views["tokens"].labels]
        assert tok_labels and all(lb == "XXX" for lb in tok_labels)


def test_force_cascades_to_stale_dependents(spark, corpus):
    # chunk is built ON pos; force-refreshing pos must drop the chunk
    # copy computed from the old pos (cascadeRemoveStaleFields,
    # CuratorHandler.java:628-644) rather than keep a silently
    # inconsistent view
    ann = provide(corpus, "CHUNK")
    out = provide(ann, "POS", force=True).collect()
    for r in out:
        assert "pos" in r.label_views
        assert "chunk" not in r.label_views
    # and re-requesting CHUNK with force rebuilds the whole stale chain
    rebuilt = {
        r.identifier: r for r in provide(ann, "CHUNK", force=True).collect()
    }
    direct = {r.identifier: r for r in provide(corpus, "CHUNK").collect()}
    for ident, r in rebuilt.items():
        assert r.label_views["chunk"] == direct[ident].label_views["chunk"]


def test_force_start_reruns_from_named_stage(spark, corpus):
    ann = provide(corpus, "CHUNK")
    mutated = _corrupt_view(_corrupt_view(ann, "pos"), "tokens")
    out = {
        r.identifier: r
        for r in provide(mutated, "CHUNK", force_start="POS").collect()
    }
    direct = {r.identifier: r for r in provide(corpus, "CHUNK").collect()}
    for ident, r in out.items():
        # pos and chunk re-ran (chunk is downstream of the forced start)
        assert [s.label for s in r.label_views["pos"].labels] == [
            s.label for s in direct[ident].label_views["pos"].labels
        ]
        assert r.label_views["chunk"] == direct[ident].label_views["chunk"]
        # tokens is upstream of the forced start: reused, sentinel intact
        assert all(s.label == "XXX" for s in r.label_views["tokens"].labels)


def test_forced_start_plan_mirrors_determine_dependencies():
    order, forced = forced_start_plan("VERB_SRL", "POS")
    assert order == ["TOKEN", "POS", "CHUNK", "PARSE", "VERB_SRL"] or (
        set(order) == {"TOKEN", "POS", "CHUNK", "PARSE", "VERB_SRL"}
        and order.index("TOKEN") < order.index("POS") < order.index("CHUNK")
    )
    # POS and its transitive dependents inside the closure re-run;
    # TOKEN and PARSE (charniak depends only on TOKEN) are reusable
    assert forced == {"POS", "CHUNK", "VERB_SRL"}


def test_forced_start_outside_closure_rejected(spark, corpus):
    with pytest.raises(ValueError):
        forced_start_plan("POS", "NER")
    with pytest.raises(ValueError):
        provide(corpus, "POS", force_start="NER")


def test_record_store_force_refreshes_cache_hits(spark, tmp_path, corpus):
    from curatorhadoopinterface_spark.plans.incremental import RecordStore

    store = RecordStore(spark, str(tmp_path / "store"))
    first = store.provide_incremental(corpus, "POS")
    assert first.count() == corpus.count()
    # poison the cached pos views in the store itself
    poisoned = _corrupt_view(store.load(), "pos").localCheckpoint(eager=True)
    store.write_full(poisoned)
    # plain incremental call reuses the poisoned cache...
    reused = store.provide_incremental(corpus, "POS").collect()
    assert all(
        s.label == "XXX" for r in reused for s in r.label_views["pos"].labels
    )
    # ...force recomputes and upserts the refreshed views back
    fresh = store.provide_incremental(corpus, "POS", force=True).collect()
    assert not any(
        s.label == "XXX" for r in fresh for s in r.label_views["pos"].labels
    )
    stored = store.load().collect()
    assert not any(
        s.label == "XXX" for r in stored for s in r.label_views["pos"].labels
    )


def test_record_store_force_start_refreshes_interior_stage(spark, tmp_path, corpus):
    """provide_incremental(force_start=...) — the [START] override must
    reach the memoized store path too (r4 ADVICE __main__.py:74): a
    cache-hit record's poisoned interior view is recomputed and the
    refreshed record upserted back."""
    from curatorhadoopinterface_spark.plans.incremental import RecordStore

    store = RecordStore(spark, str(tmp_path / "store"))
    store.provide_incremental(corpus, "POS")
    poisoned = _corrupt_view(store.load(), "tokens").localCheckpoint(eager=True)
    store.write_full(poisoned)
    # plain incremental reuses the poisoned cached tokens...
    reused = store.provide_incremental(corpus, "POS").collect()
    assert all(
        s.label == "XXX" for r in reused for s in r.label_views["tokens"].labels
    )
    # ...force_start=TOKEN recomputes tokens (and downstream pos) on hits
    fresh = store.provide_incremental(corpus, "POS", force_start="TOKEN").collect()
    assert not any(
        s.label == "XXX" for r in fresh for s in r.label_views["tokens"].labels
    )
    stored = store.load().collect()  # upsert preferred the refreshed copy
    assert not any(
        s.label == "XXX" for r in stored for s in r.label_views["tokens"].labels
    )


def test_cli_annotate_store_honors_force(spark, tmp_path, capsys):
    """CLI --store + --force must thread force into provide_incremental
    (r4 ADVICE medium: it was silently dropped)."""
    from curatorhadoopinterface_spark.__main__ import main
    from curatorhadoopinterface_spark.plans.incremental import RecordStore

    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    (corpus_dir / "d1.txt").write_text("Spark reads the corpus fast.")
    (corpus_dir / "d2.txt").write_text("Hadoop wrote the original store.")
    store_dir = str(tmp_path / "store")

    main(["annotate", "--input", str(corpus_dir), "--mode", "pos", "--store", store_dir])
    capsys.readouterr()
    store = RecordStore(spark, store_dir)
    poisoned = _corrupt_view(store.load(), "pos").localCheckpoint(eager=True)
    store.write_full(poisoned)

    # without --force the poisoned cache is served back untouched
    main(["annotate", "--input", str(corpus_dir), "--mode", "pos", "--store", store_dir])
    capsys.readouterr()
    assert all(
        s.label == "XXX"
        for r in store.load().collect()
        for s in r.label_views["pos"].labels
    )
    # with --force the store is refreshed
    main(
        [
            "annotate", "--input", str(corpus_dir), "--mode", "pos",
            "--store", store_dir, "--force",
        ]
    )
    capsys.readouterr()
    assert not any(
        s.label == "XXX"
        for r in store.load().collect()
        for s in r.label_views["pos"].labels
    )
