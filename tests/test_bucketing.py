"""Bucketed tables: identically-bucketed joins must plan WITHOUT a shuffle
Exchange on the bucketed sides — the write-time-shuffle trade that makes
repeated conv-grain joins local at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, transcripts):
    # conftest points spark.sql.warehouse.dir (static conf) at a temp dir
    from blogparser_spark.operators.storage import bucketed_join, write_bucketed

    turns = transcripts.select("conv_id", "turn_idx", "role")
    stats = transcripts.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    write_bucketed(turns, "turns_b", n_buckets=4)
    write_bucketed(stats, "stats_b", n_buckets=4, sort_col=None)

    # tiny test tables would be broadcast (which bypasses bucketing and is
    # the right plan at this size); disable it to expose the bucket join the
    # planner picks once both sides are too big to broadcast
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "turns_b", "stats_b", "conv_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # correctness: bucketed join equals plain join
    expect = turns.join(stats, "conv_id")
    assert joined.count() == expect.count()
    assert joined.exceptAll(expect).count() == 0

    spark.sql("DROP TABLE IF EXISTS turns_b")
    spark.sql("DROP TABLE IF EXISTS stats_b")


def test_minhash_index_probe_exchanges_only_new_side(spark):
    """An incremental dedup probe against the write-once bucketed band
    index must exchange ONLY the new batch: the index side's bucketed
    output partitioning already satisfies the band_hash join distribution."""
    from blogparser_spark.dataops.dedup import (
        incremental_dedup_probe,
        minhash_bands,
        probe_minhash_index,
        write_minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") < 400)
    new = docs.filter(F.col("doc_id") >= 400)
    write_minhash_index(corpus, "mh_idx_b", n_buckets=4)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cand = probe_minhash_index(spark, "mh_idx_b", new)
        plan = cand._jdf.queryExecution().executedPlan().toString()
        # the bucketed relation must actually be read bucketed...
        assert "Bucketed: true" in plan, plan
        joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
        assert joins == 1, plan
        # ...and contribute no Exchange: nothing between the join and the
        # index FileScan may shuffle (the new side, whose bands are
        # computed per batch, legitimately exchanges)
        lines = plan.splitlines()
        scan_i = next(
            i for i, l in enumerate(lines) if "FileScan" in l and "mh_idx_b" in l
        )
        join_i = next(i for i in range(scan_i, -1, -1) if "Join" in lines[i])
        assert not any("Exchange" in l for l in lines[join_i:scan_i]), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # candidate-set equivalence with the broadcast probe path
    cb = minhash_bands(corpus).withColumnRenamed("doc_id", "corpus_id")
    nb = minhash_bands(new).withColumnRenamed("doc_id", "new_id")
    expect = (
        cb.join(nb, ["band_idx", "band_hash"]).select("corpus_id", "new_id").distinct()
    )
    assert cand.exceptAll(expect).count() == 0
    assert expect.exceptAll(cand).count() == 0

    # end-to-end: verified pairs all cross the corpus/new boundary
    pairs = incremental_dedup_probe(corpus, new, threshold=0.5)
    rows = pairs.collect()
    assert all(r["corpus_id"] < 400 <= r["new_id"] for r in rows)
    assert all(r["jaccard"] >= 0.5 for r in rows)

    spark.sql("DROP TABLE IF EXISTS mh_idx_b")
