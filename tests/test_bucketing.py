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


def test_zorder_key_matches_python_interleave(spark):
    from blogparser_spark.operators.storage import zorder_key

    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 1023, 65535) for b in (0, 2, 7, 900, 65535)],
        "a long, b long",
    )
    rows = df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()

    def interleave(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        assert r.z == interleave(r.a, r.b), (r.a, r.b)
    # monotone-in-box sanity: z of (0,0) is the global min
    assert min(r.z for r in rows) == 0


def test_zorder_layout_prunes_2d_box(spark, tmp_path):
    from blogparser_spark.operators.storage import (
        candidate_files,
        file_minmax_manifest,
        write_zordered,
        zorder_key,
    )

    # deterministic uniform grid over both bucket dimensions (the shape a
    # (user, hour)-bucketized event log converges to at scale)
    ev = spark.range(0, 20000, 1, 8).select(
        F.col("id").alias("event_id"),
        F.pmod(F.col("id"), F.lit(256)).alias("ub"),
        F.pmod(F.col("id") * 7919, F.lit(256)).alias("tb"),
    )
    ev = ev.withColumn("z", zorder_key(F.col("ub"), F.col("tb")))
    zpath, lpath = str(tmp_path / "zord"), str(tmp_path / "linear")
    write_zordered(ev, zpath, key_col="z", n_files=16)
    # baseline: same file count, single-dimension sort (ub only)
    (
        ev.repartitionByRange(16, F.col("ub"))
        .sortWithinPartitions("ub")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    box = {"ub": (32, 63), "tb": (64, 127)}
    zman = file_minmax_manifest(spark, zpath, ["ub", "tb"])
    lman = file_minmax_manifest(spark, lpath, ["ub", "tb"])
    z_hit, z_all = candidate_files(zman, box).count(), zman.count()
    l_hit, l_all = candidate_files(lman, box).count(), lman.count()
    # the z layout must prune: strictly fewer candidate files than the
    # single-column sort, which carries no tb locality at all
    assert z_hit < l_hit, (z_hit, z_all, l_hit, l_all)
    # correctness: both layouts return identical box-query row sets
    pred = (
        (F.col("ub") >= 32) & (F.col("ub") <= 63)
        & (F.col("tb") >= 64) & (F.col("tb") <= 127)
    )
    zc = spark.read.parquet(zpath).where(pred).count()
    lc = spark.read.parquet(lpath).where(pred).count()
    assert zc == lc == ev.where(pred).count()
