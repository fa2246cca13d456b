"""BPE merge-training semantics on a planted vocabulary: weighted pair
counts, left-to-right NON-OVERLAPPING merges, deterministic tie-breaks."""

import os
import tempfile
from curatorhadoopinterface_spark.io import proc_scratch


def test_bpe_train_merges_planted(spark):
    from curatorhadoopinterface_spark.operators.textstats import bpe_train_merges

    # 'aaaa' x2 docs + 'ab': round 1 must pick (a,a) with weight 6
    # (3 adjacent pairs x freq 2), and merge NON-overlapping ->
    # '|aa||aa|' (a rescanning replace would give a different round 2)
    rows = [
        (1, "aaaa", "en", "web", 4),
        (2, "aaaa", "en", "web", 4),
        (3, "ab", "en", "web", 2),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out_dir = proc_scratch("test_bpe")
    df.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.pair_freq)
        for r in bpe_train_merges(spark, out_dir).collect()
    ]
    assert got == [
        (1, "a", "a", "aa", 6),
        (2, "aa", "aa", "aaaa", 2),
        (3, "a", "b", "ab", 1),
    ], got
