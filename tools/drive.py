import sys; sys.path.insert(0, "/root/repo")
from blogparser_spark.session import get_spark
from blogparser_spark.sources.synthetic import transcripts_df
from blogparser_spark.operators.parse import parse_stage
from blogparser_spark.operators.enrich import enrich
from blogparser_spark.operators.route import write_routed, with_sink_id
from blogparser_spark.operators.aggregate import sink_counts

spark = get_spark(master="local[4]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
df = transcripts_df(spark, n_convs=40, turns_per_conv=6)
enriched = enrich(parse_stage(df))
write_routed(with_sink_id(enriched), "/tmp/drive/routed")
sink_counts(enriched).show(50)

# new modules end-to-end on testdata
import __spark_entry__ as E
print("entry rows:", E.entry(spark).count())
from blogparser_spark.dataops.dedup import with_simhash, minhash_lsh_candidates
from blogparser_spark.dataops.textstats import with_langid, with_quality
from blogparser_spark.dataops.similarity import brute_force_topk, ivf_topk
from blogparser_spark.operators.summary_bm25 import bm25_summary
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
print("simhash:", with_simhash(docs).select("simhash").limit(3).collect())
print("lsh buckets:", minhash_lsh_candidates(docs).count())
print("langid+quality:", with_quality(with_langid(docs)).select("lang","lang_pred","quality").limit(3).collect())
print("bf topk:", brute_force_topk(emb, 3, 3).count(), "ivf topk:", ivf_topk(emb, 3, 3).count())
print("bm25 summary:", bm25_summary(docs.selectExpr("source","text"), "source", "text", delim=" table ").count())
print("DRIVE OK")

# checkpoint + job + streaming + multimodal surfaces
import tempfile, os
from blogparser_spark.job import transform
from blogparser_spark.operators.checkpoint import run_sliced, completed_slices
from blogparser_spark.streaming.pipeline import run_available_now
from blogparser_spark.dataops.multimodal import documents_as_media, decode_features
with tempfile.TemporaryDirectory() as td:
    inp = os.path.join(td, "in"); out = os.path.join(td, "out")
    transcripts_df(spark, n_convs=10, turns_per_conv=3).write.parquet(inp)
    ms = run_sliced(spark, inp, out, transform, n_slices=2)
    print("slices:", completed_slices(out), "rows:", sum(m.rows_in for m in ms))
    sout, sck = os.path.join(td, "sout"), os.path.join(td, "sck")
    run_available_now(spark, inp, sout, sck)
    print("stream rows:", spark.read.parquet(sout).count())
    from blogparser_spark.streaming.pipeline import run_streaming_dedup_probe
    din, dout, dck = (os.path.join(td, x) for x in ("din", "dout", "dck"))
    docs.filter("doc_id >= 4").select("doc_id", "text").write.parquet(din)
    run_streaming_dedup_probe(spark, din, docs.filter("doc_id < 4").select("doc_id", "text"), dout, dck, threshold=0.3)
    print("stream probe pairs:", spark.read.parquet(dout).count())
print("media feats:", decode_features(documents_as_media(docs)).count())
print("DRIVE2 OK")

from blogparser_spark.dataops.scrub import with_pii_masked
print("scrub:", with_pii_masked(docs).filter("n_emails >= 0").count())
print("DRIVE3 OK")

from blogparser_spark.streaming.stateful import run_profiles_available_now
with tempfile.TemporaryDirectory() as td:
    inp2 = os.path.join(td, "in")
    transcripts_df(spark, n_convs=6, turns_per_conv=3).write.parquet(inp2)
    prof = run_profiles_available_now(spark, inp2, os.path.join(td, "o"), os.path.join(td, "c"))
    print("profiles:", prof.count())
print("DRIVE4 OK")

from blogparser_spark.dataops.dedup import near_dup_clusters
print("near-dup clusters:", near_dup_clusters(docs).count())
print("DRIVE5 OK")

# round-3 surfaces: codec-invariant PNG media, IVF partitioned probe,
# salted job transform on a skewed frame
from blogparser_spark.dataops.multimodal import documents_as_png_media, codec_available
from blogparser_spark.dataops.similarity import write_ivf_partitioned, ivf_probe_partitioned
from blogparser_spark.job import make_transform
png_feats = decode_features(documents_as_png_media(docs), strict=codec_available())
print("png media feats:", png_feats.filter("magic = '89504e47'").count())
with tempfile.TemporaryDirectory() as td:
    lay = os.path.join(td, "ivf")
    write_ivf_partitioned(emb, lay, n_cells=4)
    qv = [float(x) for x in emb.filter("vec_id = 9").collect()[0]["embedding"]]
    print("ivf probe:", ivf_probe_partitioned(spark, lay, qv, k=3, exclude_id=9).count())
print("salted pipeline rows:", make_transform(salt_parts=4)(df).count())
print("DRIVE7 OK")

from blogparser_spark.operators.storage import write_bucketed, bucketed_join
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
import shutil
from urllib.parse import urlparse
wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path  # cwd-relative default
for t in ("t_b", "s_b"):
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(os.path.join(wh, t), ignore_errors=True)  # stale dir from a prior run
write_bucketed(df.select("conv_id","turn_idx","role"), "t_b", n_buckets=4)
write_bucketed(df.groupBy("conv_id").count(), "s_b", n_buckets=4, sort_col=None)
jb = bucketed_join(spark, "t_b", "s_b", "conv_id")
pl = jb._jdf.queryExecution().executedPlan().toString()
print("bucketed join rows:", jb.count(), "no-exchange:", "Exchange" not in pl)
print("DRIVE6 OK")

# late-round-3 surfaces: Lloyd-refined IVF layout, SimHash exact-Hamming
# verify, cross-conv boilerplate removal, deterministic epoch shuffle
from blogparser_spark.dataops.similarity import kmeans_refine
from blogparser_spark.dataops.dedup import simhash_verified_pairs
from blogparser_spark.dataops.curation import epoch_shuffle_rank, strip_boilerplate

print("kmeans cells:", kmeans_refine(emb, n_cells=4, iters=2).count())
with tempfile.TemporaryDirectory() as td:
    lay = os.path.join(td, "ivf_r")
    write_ivf_partitioned(emb, lay, n_cells=4, refine_iters=2)
    qv = [float(x) for x in emb.filter("vec_id = 9").collect()[0]["embedding"]]
    print("refined ivf probe:", ivf_probe_partitioned(spark, lay, qv, k=3, exclude_id=9).count())
print("simhash verified pairs:", simhash_verified_pairs(docs, max_distance=8).count())
from blogparser_spark.dataops.dedup import incremental_dedup_probe, cross_doc_span_stats
print("incremental probe pairs:", incremental_dedup_probe(
    docs.filter("doc_id < 4"), docs.filter("doc_id >= 4"), threshold=0.3).count())
print("span stats docs:", cross_doc_span_stats(docs, w=8).count())
from pyspark.sql import functions as _F
turns = docs.select("doc_id", _F.col("source").alias("conv_id"),
                    _F.when(_F.col("doc_id") % 5 == 0, "canned greeting").otherwise(_F.col("text")).alias("text"))
print("boilerplate survivors:", strip_boilerplate(turns, min_groups=3).count())
from blogparser_spark.dataops.curation import quality_budget_selection
from blogparser_spark.dataops.textstats import with_quality, tokens as _toks
qb = with_quality(docs).select("doc_id", "quality", _F.size(_toks(_F.col("text"))).cast("long").alias("n_tokens"))
sel = quality_budget_selection(qb, budget=60)
assert sel.filter("selected = 1").count() >= 1
print("budget selection:", sel.count())
r1 = {r["doc_id"]: r["shuffle_rank"] for r in epoch_shuffle_rank(docs.select("doc_id"), epoch=3).collect()}
r2 = {r["doc_id"]: r["shuffle_rank"] for r in epoch_shuffle_rank(docs.select("doc_id"), epoch=3).collect()}
assert r1 == r2 and sorted(r1.values()) == list(range(1, len(r1) + 1))
print("epoch shuffle deterministic:", len(r1))
print("DRIVE8 OK")

# product quantization: train -> encode -> ADC top-k on the same embeddings
from blogparser_spark.dataops.similarity import pq_train, pq_encode, pq_adc_topk

cb = pq_train(emb, m=4, ksub=8, iters=1)
assert len(cb) == 32 and all(len(cw) == 16 for _, _, cw in cb)
codes = pq_encode(emb, cb)
assert codes.selectExpr("max(array_max(codes)) m").collect()[0]["m"] < 8
adc = pq_adc_topk(emb, cb, n_queries=3, k=3)
apl = adc._jdf.queryExecution().executedPlan().toString()
print("pq adc rows:", adc.count(), "join-free:", "Join" not in apl)
from blogparser_spark.dataops.similarity import ivfpq_topk, write_ivfpq_partitioned, ivfpq_probe_partitioned
print("ivfpq rows:", ivfpq_topk(emb, n_queries=3, k=3, n_cells=4, m=4, ksub=8).count())
with tempfile.TemporaryDirectory() as td:
    lay = os.path.join(td, "ivfpq")
    write_ivfpq_partitioned(emb, lay, n_cells=4, m=4, ksub=8)
    qv = [float(x) for x in emb.filter("vec_id = 2").collect()[0]["embedding"]]
    pr = ivfpq_probe_partitioned(spark, lay, qv, k=3, exclude_id=2)
    ppl = pr._jdf.queryExecution().executedPlan().toString()
    print("ivfpq probe rows:", pr.count(), "codegen-only:", "EvalPython" not in ppl and "MapInPandas" not in ppl)
print("DRIVE9 OK")

# sketches: HLL estimate, CMS point queries, bloom pre-join pruning
from blogparser_spark.dataops import sketches as SK

hll = SK.hll_estimate(SK.hll_registers(docs, _F.col("text"))).collect()[0]
assert hll["hll_distinct"] > 0
cms = SK.cms_counters(docs, _F.col("source"), d=2, w=64)
cand = docs.groupBy("source").agg(_F.count("*").cast("bigint").alias("exact_n"))
est = SK.cms_estimate(cms, cand, _F.col("source"), d=2, w=64).collect()
assert est and all(r["cms_est"] >= r["exact_n"] for r in est)
print("cms sources:", len(est))
dimk = docs.filter("doc_id % 3 = 0").select(_F.col("doc_id").cast("string").alias("k"))
bbits = SK.bloom_bits(dimk, _F.col("k"), n_hashes=3, n_bits=512)
kept = SK.bloom_prefilter(
    docs.select(_F.col("doc_id").cast("string").alias("k")), _F.col("k"), bbits,
    n_hashes=3, n_bits=512)
nk = kept.count()
assert nk >= dimk.count()
print("bloom kept:", nk)
print("DRIVE10 OK")

# ES weighted sampling + bigram-LM perplexity scoring
from blogparser_spark.dataops.curation import weighted_sample
from blogparser_spark.dataops import lm as LM

wdf = docs.select("doc_id", _F.greatest(_F.length("text") % 17, _F.lit(1)).alias("w"))
ws = weighted_sample(wdf, "w", 12)
assert ws.count() == 12
wpl = ws._jdf.queryExecution().executedPlan().toString()
print("weighted sample top-n local:", "TakeOrderedAndProject" in wpl)
scores = LM.lm_quality_scores(docs)
row = scores.orderBy("doc_id").first()
assert row["n_bigrams"] >= 1 and row["ppl"] > 0
print("lm scored docs:", scores.count())
print("DRIVE11 OK")

# streaming CMS: append per-batch counters, read = dedup-then-sum
from blogparser_spark.streaming.pipeline import run_streaming_cms, read_cms_state
from blogparser_spark.sources.synthetic import transcripts_df as _tdf

with tempfile.TemporaryDirectory() as td:
    sdf = _tdf(spark, n_convs=10, turns_per_conv=4)
    sin = os.path.join(td, "in"); sout = os.path.join(td, "cms")
    sdf.write.mode("overwrite").parquet(sin)
    run_streaming_cms(spark, sin, sout, os.path.join(td, "ck"), key_col="tool")
    live = read_cms_state(spark, sout)
    ref = SK.cms_counters(sdf, _F.col("tool").cast("string"), d=2, w=64)
    assert {tuple(r) for r in live.collect()} == {tuple(r) for r in ref.collect()}
    print("streaming cms counters:", live.count())
print("DRIVE12 OK")

# Misra-Gries candidates composed with CMS into bounded-shuffle heavy hitters
# (k=32 > the ~20 distinct sources: uniform keys would all prune at k<n —
# correct MG behavior, none exceeds N/(k+1) — so size k to the guarantee)
hh = SK.heavy_hitters(
    docs.select(_F.col("source").alias("k")), _F.col("k"), min_count=5, k=32)
rows_hh = hh.collect()
assert rows_hh and all(r["cms_est"] >= r["lb"] for r in rows_hh)
print("heavy hitters:", len(rows_hh))
print("DRIVE13 OK")

# SRP-LSH over embeddings: signatures -> chained candidates -> exact-cosine
# verify (the embedding-space LSH family; matmul kernel, bounded buckets)
from blogparser_spark.dataops import similarity as SIM

emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
sig = SIM.srp_band_values(emb)
assert sig.count() == emb.count() * SIM.SRP_BANDS
vp = SIM.srp_verified_pairs(emb, threshold=0.25).collect()
assert all(r["cos_sim"] >= 0.25 and r["id_a"] < r["id_b"] for r in vp)
cl = SIM.srp_near_dup_clusters(emb, threshold=0.25)
assert cl.filter("keep AND vec_id != component").count() == 0
print("srp verified pairs:", len(vp), "| cluster rows:", cl.count())
print("DRIVE14 OK")

# TF-IDF keywords + native session_window streaming sessionize
from blogparser_spark.dataops.textstats import tfidf_top_terms

kw = tfidf_top_terms(docs.select("doc_id", "text"), k=3)
assert kw.groupBy("doc_id").count().agg(_F.max("count")).first()[0] <= 3
print("tfidf rows:", kw.count())

from blogparser_spark.streaming.pipeline import streaming_sessionize

with tempfile.TemporaryDirectory() as td:
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sin = os.path.join(td, "ev")
    ev.select("user_id", "ts").write.mode("overwrite").parquet(sin)
    st = spark.readStream.schema("user_id long, ts timestamp").parquet(sin)
    q = (
        streaming_sessionize(st, gap="30 minutes", watermark=None)
        .writeStream.format("memory").queryName("drv_sessions")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    n = spark.sql("select count(*) c from drv_sessions").first()["c"]
    assert n > 0
    print("streamed sessions:", n)
print("DRIVE15 OK")

# DDSketch mergeable quantiles: slice-sketch-merge == whole-corpus sketch
from blogparser_spark.dataops.sketches import dd_histogram, dd_merge, dd_quantiles

dd_a = dd_histogram(docs.filter(_F.col("doc_id") % 2 == 0), _F.col("n_chars"), ("lang",))
dd_b = dd_histogram(docs.filter(_F.col("doc_id") % 2 == 1), _F.col("n_chars"), ("lang",))
dd_w = dd_histogram(docs, _F.col("n_chars"), ("lang",))
assert {tuple(r) for r in dd_merge(dd_a, dd_b, group_cols=("lang",)).collect()} == \
       {tuple(r) for r in dd_w.collect()}
qs = dd_quantiles(dd_w, (0.5, 0.99), ("lang",)).collect()
assert qs and all(r["est"] > 0 for r in qs)
print("dd quantiles:", len(qs))
print("DRIVE16 OK")

# point-in-interval range join: campaign windows over the events stream
import datetime as _dt

from blogparser_spark.operators.asof import range_join_points_in_intervals

ev2 = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
_t0 = _dt.datetime(2024, 1, 1)
camps = spark.createDataFrame(
    [(j, _t0 + _dt.timedelta(days=3 * j), _t0 + _dt.timedelta(days=3 * j + 4))
     for j in range(10)],
    "campaign_id long, start_ts timestamp, end_ts timestamp",
)
att = range_join_points_in_intervals(ev2.select("event_id", "ts"), camps)
n_att = att.count()
assert n_att > ev2.count()  # overlapping windows double-attribute
print("attributed pairs:", n_att)
print("DRIVE17 OK")

# sequential funnel over the events log
from blogparser_spark.operators.aggregate import funnel_counts

fc = {r["step"]: r["n_users"] for r in funnel_counts(ev2).collect()}
assert set(fc) == {"view", "click", "purchase"}
assert fc["view"] >= fc["click"] >= fc["purchase"] > 0
print("funnel:", fc)
print("DRIVE18 OK")

# sink compaction: 2-append fragmentation -> bounded files, rows preserved
from blogparser_spark.operators.route import compact_routed_sink

with tempfile.TemporaryDirectory() as td:
    frag = os.path.join(td, "frag")
    half = _F.pmod(_F.hash("conv_id"), _F.lit(2))
    routed_df = with_sink_id(enriched)
    write_routed(routed_df.filter(half == 0), frag)
    write_routed(routed_df.filter(half == 1), frag, mode="append")
    st = compact_routed_sink(spark, frag, os.path.join(td, "cmp"))
    assert st["files_after"] < st["files_before"] and st["rows"] == routed_df.count()
    print("compaction:", st)
print("DRIVE19 OK")

# retention deletes: tombstoned convs physically removed, survivors intact
from blogparser_spark.operators.route import apply_retention_deletes

with tempfile.TemporaryDirectory() as td:
    sink = os.path.join(td, "sink")
    write_routed(with_sink_id(enriched), sink)
    tomb = spark.read.parquet(sink).select("conv_id").distinct().limit(2)
    st = apply_retention_deletes(spark, sink, os.path.join(td, "scrubbed"), tomb)
    assert st["rows_deleted"] > 0 and st["rows_before"] == st["rows_deleted"] + st["rows_after"]
    print("retention:", st)
print("DRIVE20 OK")

# streaming funnel: stateful step progression == batch min-ts chain
from blogparser_spark.operators.aggregate import funnel_steps
from blogparser_spark.streaming.stateful import streaming_funnel

with tempfile.TemporaryDirectory() as td:
    sin = os.path.join(td, "ev")
    ev2.select("user_id", "event_type", "ts").coalesce(1).write.mode(
        "overwrite").parquet(sin)
    st = spark.readStream.schema("user_id long, event_type string, ts timestamp").parquet(sin)
    q = (streaming_funnel(st).writeStream.format("memory").queryName("drv_funnel")
         .outputMode("append").option("checkpointLocation", os.path.join(td, "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {tuple(r) for r in spark.sql(
        "select user_id, step_idx, step from drv_funnel").collect()}
    want = {tuple(r) for r in funnel_steps(
        ev2, user_col="user_id", ts_col="ts", type_col="event_type"
    ).select("user_id", "step_idx", "step").collect()}
    assert got == want
    print("streaming funnel steps:", len(got))
print("DRIVE21 OK")

# shadow diff: candidate = incumbent minus 1/7 of rows, 1/5 values bumped
from blogparser_spark.operators.diff import diff_datasets

base_ev = ev2.select("event_id", "value")
cand = base_ev.filter(_F.col("event_id") % 7 != 3).withColumn(
    "value",
    _F.when(_F.col("event_id") % 5 == 0, _F.round(_F.col("value") + 1.0, 2))
    .otherwise(_F.col("value")),
)
dr = diff_datasets(base_ev, cand, keys=["event_id"], compare_cols=["value"]).first()
assert dr["n_only_left"] > 0 and dr["n_only_right"] == 0 and dr["n_changed"] == dr["diff_value"]
print("shadow diff:", dict(zip(dr.__fields__, dr)))
print("DRIVE22 OK")

# deterministic dataset split: disjoint, exhaustive, subset-invariant
from blogparser_spark.dataops.curation import dataset_split

sp = dataset_split(docs)
assert sp.count() == docs.count()
assert {r["split"] for r in sp.select("split").distinct().collect()} == {"train", "val", "test"}
print("split counts:", {r["split"]: r["n"] for r in sp.groupBy("split").agg(_F.count("*").alias("n")).collect()})
print("DRIVE23 OK")

# data-quality gates: schema-wide FK audit + null/blank profile
from blogparser_spark.dataops.profile import fk_audit, null_blank_profile

ordrs = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
fk = {r["relation"]: r["orphan_frac"] for r in fk_audit(
    [(ordrs, cust, "o_custkey", "c_custkey", "orders->customer")]).collect()}
np_rows = null_blank_profile(docs, ["text", "lang"]).collect()
assert set(fk) == {"orders->customer"} and len(np_rows) == 2
print("fk audit:", fk, "| profiled cols:", [r["col"] for r in np_rows])
print("DRIVE24 OK")

# JSONL source-boundary error isolation: corrupt lines become routed rows
from blogparser_spark.sources.jsonl import read_transcripts_jsonl, route_source_errors

with tempfile.TemporaryDirectory() as td:
    feed = os.path.join(td, "feed.jsonl")
    with open(feed, "w") as f:
        f.write('{"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi", '
                '"tool": "search", "ts": "2024-01-01T00:00:00.000Z"}\n')
        f.write("NOT JSON\n")
    r = route_source_errors(read_transcripts_jsonl(spark, feed)).cache()
    stat = {x["source_status"]: 1 for x in r.select("source_status").distinct().collect()}
    assert set(stat) == {"ok", "source_error"} and r.count() == 2
    print("jsonl quarantine ok")
print("DRIVE25 OK")

# winnowing fingerprints: guarantee + bounded overlap pairs
from blogparser_spark.dataops.dedup import winnow_fingerprints, winnow_overlap_pairs

wfp = winnow_fingerprints(docs, k=16, w=4)
assert wfp.select("doc_id").distinct().count() > 0
wop = winnow_overlap_pairs(docs, min_shared=2, k=16, w=4, df_cap=10)
assert all(r["id_a"] < r["id_b"] and r["n_shared"] >= 2 for r in wop.limit(50).collect())
print("winnow prints:", wfp.count(), "| overlap pairs:", wop.count())
print("DRIVE26 OK")

# compression-ratio quality signal (Gopher-style redundancy heuristic)
from blogparser_spark.dataops.textstats import with_compression_ratio

cr = with_compression_ratio(docs.limit(50))
rows_cr = cr.select("doc_id", "compression_ratio").collect()
assert rows_cr and all(0.0 < r["compression_ratio"] <= 1.5 for r in rows_cr)
print("compression ratios:", len(rows_cr))
print("DRIVE27 OK")

# time-series + graph analytics: cohort/transitions/gap-fill, PageRank, PMI, fuzzy pairs
from blogparser_spark.dataops import graph as _graph, timeseries as _tsx

ev001 = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
ret = _tsx.cohort_retention(ev001)
tr = _tsx.event_transitions(ev001)
gf = _tsx.gap_fill_daily(ev001)
assert ret.count() > 0 and gf.count() > 0
psrc = {r["src_type"]: r["p_transition"] for r in tr.collect() if r["src_type"]}
edges_g = _graph.bipartite_edges(
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
)
pr = _graph.pagerank(edges_g, n_iter=3)
total_rank = pr.agg(_F.sum("rank")).first()[0]
assert abs(total_rank - 1.0) < 1e-6, total_rank
from blogparser_spark.dataops.textstats import pmi_collocations
from blogparser_spark.dataops.dedup import fuzzy_prefix_pairs

pmi = pmi_collocations(docs, min_count=5, top_k=10).collect()
assert pmi and all(r["n_pair"] >= 5 for r in pmi)
fz = fuzzy_prefix_pairs(docs, block_cols=("source",))
print("cohort cells:", ret.count(), "| pagerank mass:", round(total_rank, 9),
      "| top pmi:", pmi[0]["bigram"], "| fuzzy pairs:", fz.count())
print("DRIVE28 OK")

# batch-2 analytics: interarrival, anomaly, inverted index, skew distinct, winsorize, stream-stream join
from blogparser_spark.dataops.timeseries import daily_anomaly_flags, interarrival_quantiles
from blogparser_spark.dataops.textstats import inverted_postings
from blogparser_spark.operators.skew import salted_exact_distinct

ia = interarrival_quantiles(ev001).collect()
assert ia and all(r["p50_us"] <= r["p90_us"] <= r["max_us"] for r in ia)
an = daily_anomaly_flags(ev001, z_threshold=1.0)
inv = inverted_postings(docs, min_df=3, max_postings=5).collect()
assert inv and all(len(r["postings_head"].split(",")) <= 5 for r in inv)
sd = {r["event_type"]: r["n_distinct"] for r in salted_exact_distinct(ev001, ["event_type"], "user_id").collect()}
from blogparser_spark.streaming.joins import request_response_pairs, split_roles

# batch twin of the stream-stream join over the synthetic transcripts
from blogparser_spark.sources.synthetic import transcripts_df as _tdf

tdf = _tdf(spark, n_convs=10, turns_per_conv=6)
pr_req, pr_rsp = split_roles(tdf)
ssj = request_response_pairs(pr_req, pr_rsp)
assert ssj.count() > 0 and all(r["latency_us"] >= 0 for r in ssj.limit(20).collect())
print("interarrival types:", len(ia), "| anomalies:", an.count(), "| postings:", len(inv),
      "| distinct:", sd, "| rr pairs:", ssj.count())
print("DRIVE29 OK")

# batch-3 analytics: trend regression, trigram mining, chi2, entropy, CDC merge
from blogparser_spark.dataops.profile import categorical_entropy, contingency_chi2
from blogparser_spark.dataops.timeseries import daily_volume_trend, event_trigram_topk
from blogparser_spark.operators.cdc import latest_state, merge_upsert

tr = daily_volume_trend(ev001).collect()
assert tr and all(0.0 <= r["r2"] <= 1.0 for r in tr)
tg = event_trigram_topk(ev001, k=10).collect()
assert len(tg) == 10 and tg[0]["n_occurrences"] >= tg[-1]["n_occurrences"]
chi = contingency_chi2(
    ev001.select("event_type", _F.weekday("ts").alias("wd")), "event_type", "wd"
).collect()[0]
assert chi["chi2"] >= 0.0 and chi["dof"] == (chi["n_rows_a"] - 1) * (chi["n_cols_b"] - 1)
ent = categorical_entropy(ev001, ["user_id"], "event_type")
st = latest_state(ev001, ["user_id"], ["ts", "event_id"], ["event_type", "value"])
merged = merge_upsert(
    ev001.where("event_id % 2 = 0"), ev001.where("event_id % 2 = 1"),
    ["event_id"], ["ts"],
)
assert merged.count() == ev001.count()  # disjoint keys: pure insert
print("trend types:", len(tr), "| top trigram:", tg[0]["trigram"], "| chi2:", chi["chi2"],
      "| entropy rows:", ent.count(), "| state rows:", st.count())
print("DRIVE30 OK")

# batch-4 analytics: audience-overlap jaccard, per-group score normalization
from blogparser_spark.dataops.graph import set_overlap_jaccard
from blogparser_spark.dataops.curation import score_normalize

ov = set_overlap_jaccard(ev001, "event_type", "user_id").collect()
assert ov and all(0.0 < r["jaccard"] <= 1.0 for r in ov)
sn = score_normalize(
    docs.select("source", "doc_id", _F.octet_length("text").cast("long").alias("n_bytes")),
    ["source"], "n_bytes", ["doc_id"],
)
rows_sn = sn.collect()
assert all(0.0 <= r["pct_rank"] <= 1.0 for r in rows_sn)
assert all(r["minmax"] is None or 0.0 <= r["minmax"] <= 1.0 for r in rows_sn)
print("overlap pairs:", len(ov), "| normalized rows:", len(rows_sn))
print("DRIVE31 OK")

# batch-5 analytics: forward-decay engagement scoring
from blogparser_spark.dataops.timeseries import decayed_engagement

de = decayed_engagement(ev001).collect()
assert de and all(0.0 <= r["decayed_value"] <= r["raw_value"] + 1e-9 for r in de)
assert {r["user_id"] for r in de} == {r["user_id"] for r in ev001.select("user_id").distinct().collect()}
print("decayed users:", len(de))
print("DRIVE32 OK")

# batch-5b: triangle counting via degree-ordered orientation
from blogparser_spark.dataops.graph import supplier_cooccurrence_edges, triangle_stats

li001 = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
tstats = triangle_stats(supplier_cooccurrence_edges(li001)).collect()
assert tstats and all(r["triangles"] >= 0 for r in tstats)
assert all(r["clustering_coeff"] is None or 0.0 <= r["clustering_coeff"] <= 1.0 for r in tstats)
print("triangle nodes:", len(tstats), "| total/3:", sum(r["triangles"] for r in tstats) // 3)
print("DRIVE33 OK")

# batch-5c: z-order layout + manifest-stats pruning audit
import tempfile as _tf

from blogparser_spark.operators.storage import (
    candidate_files, file_minmax_manifest, write_zordered, zorder_key,
)

zev = spark.range(0, 4096, 1, 4).select(
    (_F.col("id") % 64).alias("ub"), ((_F.col("id") * 31) % 64).alias("tb")
).withColumn("z", zorder_key(_F.col("ub"), _F.col("tb")))
with _tf.TemporaryDirectory() as zd:
    write_zordered(zev, zd + "/z", key_col="z", n_files=8)
    man = file_minmax_manifest(spark, zd + "/z", ["ub", "tb"])
    hit = candidate_files(man, {"ub": (0, 15), "tb": (0, 15)}).count()
    tot = man.count()
assert 0 < hit < tot, (hit, tot)
print("zorder files hit:", hit, "of", tot)
print("DRIVE34 OK")

# batch-5d: slice-manifest column stats (Iceberg manifest analog)
from blogparser_spark.dataops.profile import slice_column_manifest

man5 = slice_column_manifest(ev001, "event_id", ["user_id", "event_type", "ts"], n_slices=8).collect()
assert man5 and all(r["n_null"] == 0 for r in man5)
assert sum(r["n_rows"] for r in man5 if r["col"] == "user_id") == ev001.count()
print("manifest cells:", len(man5))
print("DRIVE35 OK")

# batch-5e: exact set-similarity join via prefix filtering (PPJoin-style)
from blogparser_spark.dataops.dedup import prefix_filter_pairs

pfp = prefix_filter_pairs(docs, threshold=0.5).collect()
assert all(r["jaccard"] >= 0.5 and r["id_a"] < r["id_b"] for r in pfp)
print("prefix-filter pairs:", len(pfp))
print("DRIVE36 OK")

# batch-5f: large-star/small-star connected components (SoCC'14) must agree
# with label propagation on the real near-dup pipeline's verified pairs
from blogparser_spark.dataops.dedup import (
    connected_components, lsh_candidate_pairs, verify_pairs_jaccard,
)
from blogparser_spark.dataops.graph import connected_components_star

ver = verify_pairs_jaccard(docs, lsh_candidate_pairs(docs), 0.5)
star_lbl = {(r.node, r.component) for r in connected_components_star(ver).collect()}
lp_lbl = {(r.node, r.component) for r in connected_components(ver).collect()}
assert star_lbl == lp_lbl and star_lbl
print("star-CC nodes:", len(star_lbl))
print("DRIVE37 OK")

# batch-5g: sliding-window distinct via mergeable HLL buckets
from blogparser_spark.dataops.sketches import hll_estimate, hll_sliding_registers

sregs = hll_sliding_registers(
    ev001, _F.col("user_id").cast("string"), "ts", window_buckets=24, p=8
)
sest = hll_estimate(sregs, ("bucket",), p=8).collect()
assert sest and all(r["n_present"] <= 256 for r in sest)
print("sliding-HLL buckets:", len(sest))
print("DRIVE38 OK")

# batch-5h: HLL rollup cube — coarse register merge == from-scratch sketch
from blogparser_spark.dataops.sketches import hll_registers

fine = hll_registers(ev001, _F.col("user_id").cast("string"), ("event_type",), p=8)
allm = fine.groupBy("register").agg(_F.max("max_rank").alias("max_rank"))
scr = hll_registers(ev001, _F.col("user_id").cast("string"), (), p=8)
assert {(r["register"], r["max_rank"]) for r in allm.collect()} == \
       {(r["register"], r["max_rank"]) for r in scr.collect()}
print("DRIVE39 OK")

# batch-5i: KMV/theta sketch — lossless merge + pairwise set algebra
from blogparser_spark.dataops.sketches import (
    kmv_sample, kmv_merge, kmv_estimate, kmv_pairwise_overlap,
)

ksamp = kmv_sample(ev001, _F.col("user_id").cast("string"), ("event_type",), k=64)
kov = kmv_pairwise_overlap(ksamp, "event_type", k=64).collect()
assert kov and all(r["union_est"] >= r["inter_est"] for r in kov)
halves = [
    kmv_sample(ev001.filter(_F.col("event_id") % 2 == i),
               _F.col("user_id").cast("string"), (), k=64)
    for i in (0, 1)
]
merged = {r["h"] for r in kmv_merge(*halves, k=64).collect()}
scratch = {r["h"] for r in kmv_sample(ev001, _F.col("user_id").cast("string"), (), k=64).collect()}
assert merged == scratch
print("KMV pairs:", len(kov))
print("DRIVE40 OK")

# batch-5j: PSI drift gate — identical sides read 0, shifted sides alarm
from blogparser_spark.dataops.profile import psi_drift

pev = ev001.select("event_type", (_F.col("value") < 50).cast("long").alias("bin"))
zero = psi_drift(pev, pev, ("event_type",), "bin", n_bins=2).collect()
assert zero and all(r["psi"] == 0.0 for r in zero)
shift = psi_drift(
    pev, pev.withColumn("bin", 1 - _F.col("bin")), ("event_type",), "bin", n_bins=2
).collect()
assert all(r["psi"] > 0.0 for r in shift)
print("DRIVE41 OK")

# batch-5k: SCD2 intervals tile per key and end in one open row
from blogparser_spark.operators.cdc import scd2_intervals

iv = scd2_intervals(ev001, ["user_id"], "ts", ["event_type"], ["event_id"])
rows = sorted(
    ((r.user_id, r.version, r.valid_from, r.valid_to) for r in iv.collect())
)
assert rows
by_user = {}
for uid, ver, vf, vt in rows:
    by_user.setdefault(uid, []).append((ver, vf, vt))
for uid, ivs in by_user.items():
    assert [v for v, _, _ in ivs] == list(range(1, len(ivs) + 1))
    assert all(a[2] == b[1] for a, b in zip(ivs, ivs[1:]))
    assert ivs[-1][2] is None and all(x[2] is not None for x in ivs[:-1])
print("SCD2 intervals:", len(rows))
print("DRIVE42 OK")

# batch-5l: attribution — every model conserves 1.0 per attributed conversion
from blogparser_spark.dataops.timeseries import attribution_credits

att = attribution_credits(ev001, conversion_type="purchase").collect()
assert att
per_model = {}
for r in att:
    per_model[r.model] = per_model.get(r.model, 0.0) + r.credit
vals = list(per_model.values())
assert len(per_model) == 3 and all(abs(v - vals[0]) < 1e-4 for v in vals)
print("attribution total credit per model:", round(vals[0], 2))
print("DRIVE43 OK")

# batch-5m: FD profiling — the unique key is an exact FD, others violate
from blogparser_spark.dataops.profile import fd_profile

fd = {
    (r.lhs_col, r.rhs_col): r
    for r in fd_profile(
        ev001, [("event_id", "event_type"), ("user_id", "event_type")]
    ).collect()
}
assert fd[("event_id", "event_type")].n_violating_groups == 0
assert fd[("event_id", "event_type")].g3_error == 0.0
assert fd[("user_id", "event_type")].n_violating_groups > 0
print("DRIVE44 OK")

# batch-5n: content fingerprint — order-independent, change-sensitive
from blogparser_spark.operators.diff import content_fingerprint

fp1 = {r.slice_id: (r.n_rows, r.fp_xor, r.fp_sum)
       for r in content_fingerprint(docs, ["doc_id", "text"], 8).collect()}
fp2 = {r.slice_id: (r.n_rows, r.fp_xor, r.fp_sum)
       for r in content_fingerprint(
           docs.orderBy(_F.desc("doc_id")), ["doc_id", "text"], 8
       ).collect()}
assert fp1 == fp2 and fp1
fp3 = {r.slice_id: (r.n_rows, r.fp_xor, r.fp_sum)
       for r in content_fingerprint(
           docs.withColumn("text", _F.upper("text")), ["doc_id", "text"], 8
       ).collect()}
assert fp3 != fp1
print("DRIVE45 OK")

# batch-5o: equi-depth bounds — monotone per group, rank-exact count
from blogparser_spark.operators.skew import equi_depth_bounds

edb = equi_depth_bounds(ev001, ["event_type"], "value", n_buckets=8)
rows = sorted((r.event_type, r.bucket, r.boundary) for r in edb.collect())
assert rows
by_t = {}
for t, k, v in rows:
    by_t.setdefault(t, []).append(v)
for t, vs in by_t.items():
    assert len(vs) == 7 and vs == sorted(vs), t
print("DRIVE46 OK")

# batch-5p: SCD2 time travel — asof(max ts) == latest_state current rows
from blogparser_spark.operators.cdc import latest_state, scd2_asof, scd2_intervals

iv2 = scd2_intervals(ev001, ["user_id"], "ts", ["event_type"], ["event_id"])
far = ev001.agg(_F.max("ts")).collect()[0][0]
now_state = {
    (r.user_id, r.event_type) for r in scd2_asof(iv2, _F.lit(far)).collect()
}
cur = {
    (r.user_id, r.event_type)
    for r in latest_state(ev001, ["user_id"], ["ts", "event_id"], ["event_type"]).collect()
}
assert now_state == cur and now_state
print("DRIVE47 OK")

# batch-5q: fixed-k stratified sample — exact per-group counts
from blogparser_spark.dataops.curation import stratified_fixed_k

fk = stratified_fixed_k(ev001, ["event_type"], "event_id", k=4)
cnt = {r.event_type: r["n"] for r in fk.groupBy("event_type").agg(_F.count("*").alias("n")).collect()}
assert cnt and all(v == 4 for v in cnt.values())
print("DRIVE48 OK")

# batch-5r: RFM scoring — full score range, segment concatenation
from blogparser_spark.dataops.timeseries import rfm_scores

rfm = rfm_scores(ev001, n_bands=5).collect()
assert rfm and all(1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5 for r in rfm)
assert all(r.rfm_segment == f"{r.r_score}{r.f_score}{r.m_score}" for r in rfm)
print("RFM users:", len(rfm))
print("DRIVE49 OK")

# batch-5s: session paths — every path bounded, counts positive
import __spark_entry__ as _entry

sp = _entry.queries()["top_session_paths"](spark, "/root/testdata/sf0.001").collect()
assert sp and all(r.path_len <= 6 and r.n_sessions >= 1 for r in sp)
assert all(len(r.path.split(">")) == r.path_len for r in sp)
print("DRIVE50 OK")

# batch-5t: CMS join-size estimate — upper bound on the true join size
from blogparser_spark.dataops.sketches import cms_counters, cms_join_size

c_ev = cms_counters(ev001, _F.col("user_id").cast("string"), (), d=4, w=512)
est_js = cms_join_size(c_ev, c_ev, d=4, w=512).collect()[0]["est_join_size"]
exact_js = (
    ev001.groupBy("user_id").count()
    .agg(_F.sum(_F.col("count") * _F.col("count"))).collect()[0][0]
)
assert est_js >= exact_js > 0
print("join-size est vs exact F2:", est_js, exact_js)
print("DRIVE51 OK")

# batch-5u: chunking — overlap stitching and tail coverage
from blogparser_spark.dataops.curation import chunk_documents

ch = chunk_documents(docs, chunk_tokens=32, overlap=8).collect()
assert ch
by_doc = {}
for r in sorted(ch, key=lambda r: (r.doc_id, r.chunk_idx)):
    by_doc.setdefault(r.doc_id, []).append(r)
for d, chunks in by_doc.items():
    assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
    for a, b in zip(chunks, chunks[1:]):
        assert a.chunk_text.split()[-8:] == b.chunk_text.split()[:8], d
    assert all(c.n_tokens == 32 for c in chunks[:-1])
print("chunks:", len(ch))
print("DRIVE52 OK")

# batch-5v: DDSketch CDF normalize — in (0,1), monotone with the value
from blogparser_spark.dataops.sketches import dd_cdf_normalize

cdf = dd_cdf_normalize(ev001, _F.col("value"), ("event_type",)).collect()
assert cdf and all(0 < r.dd_cdf < 1 for r in cdf if r.dd_cdf is not None)
byt = {}
for r in cdf:
    if r.dd_cdf is not None:
        byt.setdefault(r.event_type, []).append((r.value, r.dd_cdf))
for t, vs in byt.items():
    vs.sort()
    assert all(a[1] <= b[1] for a, b in zip(vs, vs[1:])), t
print("DRIVE53 OK")

# batch-5w: hard negatives — thresholded exact top-k stays under the cap
from blogparser_spark.dataops.similarity import hard_negative_topk

emb001 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
hn = hard_negative_topk(emb001, n_queries=3, k=4, dup_threshold=0.9).collect()
assert hn and all(r.sim < 0.9 for r in hn)
assert all(r.qid != r.nid for r in hn)
print("DRIVE54 OK")

# batch-5x: round-robin interleave — permutation + layer-0 one-per-source
from blogparser_spark.dataops.curation import round_robin_interleave

rr = round_robin_interleave(docs.select("doc_id", "lang"), "lang", "doc_id").collect()
assert sorted(r.global_pos for r in rr) == list(range(len(rr)))
langs = sorted({r.lang for r in rr})
first_layer = sorted((r.global_pos, r.lang) for r in rr)[: len(langs)]
assert [l for _, l in first_layer] == langs
print("DRIVE55 OK")

# batch-5y: KS drift — 0 on identical sides, 1 on disjoint supports
from blogparser_spark.dataops.profile import ks_drift

kev = ev001.select("event_type", (_F.col("value") < 40).cast("long").alias("bin"))
assert all(r.ks_d == 0.0 for r in ks_drift(kev, kev, ("event_type",), "bin").collect())
shifted = kev.withColumn("bin", _F.col("bin") + 10)
assert all(r.ks_d == 1.0 for r in ks_drift(kev, shifted, ("event_type",), "bin").collect())
print("DRIVE56 OK")

# batch-5z: additive state — merge equals from-scratch exactly
from blogparser_spark.operators.aggregate import additive_state, merge_additive_states

hv = [ev001.filter(_F.col("event_id") % 2 == i) for i in (0, 1)]
m = merge_additive_states(
    additive_state(hv[0], ["event_type"], "value"),
    additive_state(hv[1], ["event_type"], "value"),
    key_cols=["event_type"],
)
sc = additive_state(ev001, ["event_type"], "value")
assert {tuple(r) for r in m.collect()} == {tuple(r) for r in sc.collect()}
print("DRIVE57 OK")

# batch-6a: temperature mixing + zipf audit
from blogparser_spark.dataops.curation import temperature_rates, temperature_rates_df
from blogparser_spark.dataops.textstats import zipf_fit

tr = {r.strata: r.keep_rate for r in temperature_rates_df(docs, "lang", 0.5).collect()}
td = temperature_rates(docs, "lang", 0.5)
assert set(tr) == set(td) and all(abs(tr[s] - min(1.0, td[s])) < 1e-6 for s in tr)
assert any(v == 1.0 for v in tr.values())
zf = zipf_fit(docs, top_n=20).collect()[0]
assert zf.n_terms == 20 and zf.slope < 0
print("zipf slope:", zf.slope)
print("DRIVE58 OK")

# batch-6b: streaming drift monitor — scores land per batch, replay-safe
import tempfile as _tf

from blogparser_spark.sources.synthetic import transcripts_df as _tdf
from blogparser_spark.streaming.pipeline import read_drift_state, run_streaming_drift

_dd = _tf.mkdtemp(prefix="drv_drift_")
_ref = _tdf(spark, n_convs=10, turns_per_conv=3)
_cur = _tdf(spark, n_convs=15, turns_per_conv=3)
_cur.write.mode("overwrite").parquet(f"{_dd}/in")
run_streaming_drift(spark, f"{_dd}/in", f"{_dd}/out", f"{_dd}/ck", _ref, ("role",))
_st = read_drift_state(spark, f"{_dd}/out", ("role",)).collect()
assert _st and all(r.psi is not None and r.n_cur > 0 for r in _st)
print("drift rows:", len(_st))
print("DRIVE59 OK")

# batch-6c: backfill ranges + funnel latency SLOs
from blogparser_spark.dataops.timeseries import missing_daily_ranges
from blogparser_spark.operators.aggregate import funnel_step_latencies

holey = ev001.filter(
    _F.expr("(unix_micros(cast(ts as timestamp)) div 86400000000) % 5 != 2")
)
gaps = missing_daily_ranges(holey, "ts").collect()
assert gaps and all(g.n_missing >= 1 and g.gap_start_day <= g.gap_end_day for g in gaps)
full = missing_daily_ranges(ev001, "ts").collect()
assert not full  # contiguous month: a gapless input must yield zero ranges
lat = funnel_step_latencies(ev001).collect()
assert lat and all(r.latency_us > 0 for r in lat)
assert {r.step for r in lat} <= {"click", "purchase"}
print("gaps:", len(gaps), "latencies:", len(lat))
print("DRIVE60 OK")

# batch-6d: OOV audit — rates in [0,1], vocab covers the common mass
from blogparser_spark.dataops.textstats import oov_rate

ov = oov_rate(docs, vocab_size=20).collect()
assert ov and all(0.0 <= r.oov_rate <= 1.0 and r.n_oov <= r.n_tokens for r in ov)
print("mean oov:", round(sum(r.oov_rate for r in ov) / len(ov), 3))
print("DRIVE61 OK")

# batch-6e: dataset card — one-row datasheet, internally consistent
import __spark_entry__ as _entry2

card = _entry2.queries()["dataset_card"](spark, "/root/testdata/sf0.001").collect()[0]
assert card.n_docs > 0 and card.total_tokens >= card.n_docs
assert card.min_chars <= card.median_chars <= card.max_chars
assert 0.0 <= card.exact_dup_rate < 1.0
print("card:", card.n_docs, "docs,", card.total_tokens, "tokens,", card.n_langs, "langs")
print("DRIVE62 OK")

# batch-6f: consistent-hash routing — balance and n->n+1 minimal movement
from blogparser_spark.operators.route import consistent_shard_assign

uids = ev001.select("user_id").distinct()
s8 = {r.user_id: r.shard for r in consistent_shard_assign(uids, "user_id", 8).collect()}
s9 = {r.user_id: r.shard for r in consistent_shard_assign(uids, "user_id", 9).collect()}
moved = sum(1 for k in s8 if s8[k] != s9[k])
# sf0.001 has ~15 distinct users — coverage/movement asserts sized to that
assert len(set(s8.values())) >= 5 and len(set(s9.values())) >= 5
assert 0 <= moved / len(s8) < 0.4
assert all(0 <= v < 8 for v in s8.values()) and all(0 <= v < 9 for v in s9.values())
print("shard movement 8->9:", round(moved / len(s8), 3))
print("DRIVE63 OK")

# batch-6g: streaming KMV — live sketch equals batch sample, replay-safe
from blogparser_spark.dataops.sketches import kmv_sample as _kmvs
from blogparser_spark.streaming.pipeline import read_kmv_state, run_streaming_kmv

_kd = _tf.mkdtemp(prefix="drv_kmv_")
_tdf(spark, n_convs=12, turns_per_conv=3).write.mode("overwrite").parquet(f"{_kd}/in")
run_streaming_kmv(spark, f"{_kd}/in", f"{_kd}/out", f"{_kd}/ck", ("role",), k=16)
live = {(r.role, r.h) for r in read_kmv_state(spark, f"{_kd}/out", ("role",), 16).collect()}
whole = {(r.role, r.h) for r in _kmvs(
    spark.read.parquet(f"{_kd}/in"), _F.col("text"), ("role",), 16
).collect()}
assert live == whole and live
print("DRIVE64 OK")

# batch-6h: Gopher rule bank — drive through the registry query + direct op
gf = _entry2.queries()["gopher_quality_flags"](spark, "/root/testdata/sf0.001").collect()
assert gf and all(
    (r.gopher_pass ==
     (r.pass_word_count and r.pass_mean_word_len and r.pass_symbol_ratio
      and r.pass_bullet and r.pass_ellipsis and r.pass_alpha and r.pass_stopwords))
    for r in gf
)
assert any(r.gopher_pass for r in gf) and any(not r.gopher_pass for r in gf)
print("gopher pass rate:", round(sum(r.gopher_pass for r in gf) / len(gf), 3))
print("DRIVE65 OK")

# batch-6i: k-anonymity audit — internal consistency of the privacy gate
ka = _entry2.queries()["k_anonymity_audit"](spark, "/root/testdata/sf0.001").collect()
assert ka and all(r.n_risky_groups <= r.n_groups for r in ka)
assert all(r.n_rows_at_risk <= r.n_rows for r in ka)
assert all(abs(r.risky_row_frac - round(r.n_rows_at_risk / r.n_rows, 6)) < 1e-9 for r in ka)
print("k-anon risky groups:", sum(r.n_risky_groups for r in ka), "/", sum(r.n_groups for r in ka))
print("DRIVE66 OK")

# batch-6j: DSIR importance weights — target-domain docs outscore the rest
dz = _entry2.queries()["dsir_importance_weights"](spark, "/root/testdata/sf0.001").collect()
assert dz and all(abs(r.logw - round(r.logw_micro / 1e6, 6)) < 1e-9 for r in dz)
assert any(r.logw > 0 for r in dz) and any(r.logw < 0 for r in dz)
print("dsir logw range:", round(min(r.logw for r in dz), 2), "..", round(max(r.logw for r in dz), 2))
print("DRIVE67 OK")

# batch-6k: conversation-structure QA + budget truncation + BM25 retrieval
rg = _entry2.queries()["conv_role_grammar"](spark, "/root/testdata/sf0.001").collect()
assert rg and all(
    (r.is_valid ==
     (r.first_role in ("system", "user")
      and r.n_same_role_runs == 0 and r.n_orphan_tool_turns == 0))
    for r in rg
)
bt = _entry2.queries()["conv_budget_stats"](spark, "/root/testdata/sf0.001").collect()
assert bt and all(r.n_turns_kept <= r.n_turns and r.n_tokens_kept <= r.n_tokens for r in bt)
assert all(r.truncated == (r.n_turns_kept < r.n_turns) for r in bt)
sf_ = _entry2.queries()["conv_sft_stats"](spark, "/root/testdata/sf0.001").collect()
assert sf_ and all(r.n_user + r.n_assistant <= r.n_turns for r in sf_)
br = _entry2.queries()["bm25_doc_retrieval"](spark, "/root/testdata/sf0.001").collect()
assert br and all(br[i].score_u >= br[i + 1].score_u for i in range(len(br) - 1))
print("conv QA:", len(rg), "convs;", sum(r.truncated for r in bt), "truncated; bm25 top:", br[0].doc_id)
print("DRIVE68 OK")

# batch-6l: SFT pair extraction + preference-pair mining
sp = _entry2.queries()["sft_pair_extraction"](spark, "/root/testdata/sf0.001").collect()
assert sp and all(r.prompt_bytes > 0 and r.response_bytes > 0 for r in sp)
pp = _entry2.queries()["preference_pair_mining"](spark, "/root/testdata/sf0.001").collect()
assert pp and all(r.score_gap > 0 and r.chosen_id != r.rejected_id for r in pp)
assert all(r.n_candidates >= 2 for r in pp)
print("sft pairs:", len(sp), "; preference pairs:", len(pp))
print("DRIVE69 OK")

# batch-6m: domain caps, padding audit, RRF fusion
dc = _entry2.queries()["domain_cap_counts"](spark, "/root/testdata/sf0.001").collect()
assert dc and all(r.n_kept <= 15 and r.n_kept <= r.n_docs for r in dc)
pe = _entry2.queries()["padding_efficiency_audit"](spark, "/root/testdata/sf0.001").collect()
assert pe and all(r.pad_tokens == r.n_rows * r.max_len - r.sum_len for r in pe)
assert all(0 <= r.pad_frac < 1 for r in pe)
rf = _entry2.queries()["rrf_fusion_topk"](spark, "/root/testdata/sf0.001").collect()
assert rf and all(r.rrf_u > 0 for r in rf)
assert any(r.rank_a is not None and r.rank_b is not None for r in rf)
print("domains:", len(dc), "; batches:", len(pe), "; fused:", len(rf))
print("DRIVE70 OK")

# batch-6n: contrastive pairs, matryoshka audit, keyword tagging
cp_ = _entry2.queries()["contrastive_chunk_pairs"](spark, "/root/testdata/sf0.001").collect()
assert cp_ and all(len(r.pair_fp) == 16 and r.anchor_bytes > 0 for r in cp_)
me = _entry2.queries()["matryoshka_energy_audit"](spark, "/root/testdata/sf0.001").collect()
assert me and all(
    0 <= r.energy_frac_4 <= r.energy_frac_8 <= r.energy_frac_16 <= 1.000001 for r in me
)
kt = _entry2.queries()["keyword_tag_docs"](spark, "/root/testdata/sf0.001").collect()
assert kt and all(r.n_keyword_hits >= 1 and r.tags == ",".join(sorted(r.tags.split(","))) for r in kt)
print("pairs:", len(cp_), "; vectors:", len(me), "; tagged:", len(kt))
print("DRIVE71 OK")

# batch-6o: conversation-level exact dedup
cd_ = _entry2.queries()["conv_exact_dup_groups"](spark, "/root/testdata/sf0.001").collect()
assert cd_ and all(r.n_convs >= 2 and not r.survivor.endswith("-dup") for r in cd_)
print("conv dup groups:", len(cd_))
print("DRIVE72 OK")

# batch-6p: T5 span-corruption mask plan
sc_ = _entry2.queries()["span_corruption_plan"](spark, "/root/testdata/sf0.001").collect()
assert sc_ and all(r.n_masked >= r.n_spans and r.n_masked <= 4 * r.n_spans for r in sc_)
assert all(0 < r.mask_frac <= 1 for r in sc_)
print("span plans:", len(sc_), "mean mask_frac:", round(sum(r.mask_frac for r in sc_) / len(sc_), 3))
print("DRIVE73 OK")

# batch-6q: GRPO advantage + SFT loss-mask accounting
ga = _entry2.queries()["group_advantage_scores"](spark, "/root/testdata/sf0.001").collect()
assert ga and any(r.advantage > 0 for r in ga) and any(r.advantage < 0 for r in ga)
lm_ = _entry2.queries()["sft_loss_mask_stats"](spark, "/root/testdata/sf0.001").collect()
assert lm_ and all(0 <= r.trainable_frac <= 1 and r.n_tokens_trainable <= r.n_tokens_total for r in lm_)
print("advantages:", len(ga), "; convs:", len(lm_))
print("DRIVE74 OK")

# batch-6r: grok DSL parse of event-built telemetry lines (typed casts +
# dead-letter flag: BOGUS-level lines route with grok_matched=False/NULLs)
gk = _entry2.queries()["grok_parse_log_lines"](spark, "/root/testdata/sf0.001").collect()
good = [r for r in gk if r.grok_matched]
bad = [r for r in gk if not r.grok_matched]
assert good and all(r.level in ("INFO", "WARN", "ERROR") for r in good)
assert all(isinstance(r.id, int) and isinstance(r.dur_ms, float) for r in good)
assert bad and all(r.id is None and r.dur_ms is None for r in bad)
print("grok lines parsed:", len(good), "dead-lettered:", len(bad))
print("DRIVE75 OK")

# batch-6s: UL2 denoiser mixture assignment
u2 = _entry2.queries()["ul2_denoiser_mix"](spark, "/root/testdata/sf0.001").collect()
assert u2 and {r.denoiser for r in u2} <= {"R", "S", "X"}
assert all(r.n_targets <= r.n_tokens for r in u2)
print("ul2 mix:", {d: sum(1 for r in u2 if r.denoiser == d) for d in ("R", "S", "X")})
print("DRIVE76 OK")

# batch-6t: distributed BPE — pair stats + learned merges
bp = _entry2.queries()["bpe_pair_counts"](spark, "/root/testdata/sf0.001").collect()
assert bp and all(bp[i].weight >= bp[i + 1].weight for i in range(len(bp) - 1))
from blogparser_spark.dataops.lm import bpe_learn_merges as _bpe
mg = _bpe(docs.limit(50), n_merges=3)
assert len(mg) == 3 and mg[0][2] >= mg[1][2] >= mg[2][2]
print("bpe top pair:", (bp[0].l, bp[0].r, bp[0].weight), "; merges:", mg)
print("DRIVE77 OK")

# batch-6u: packing curve over the budget ladder
pc2 = {r.budget: r for r in _entry2.queries()["conv_packing_curve"](spark, "/root/testdata/sf0.001").collect()}
assert set(pc2) == {500, 1000, 2000, 4000}
assert pc2[500].tokens_kept <= pc2[4000].tokens_kept <= pc2[4000].tokens_total
assert all(r.convs_fully_kept <= r.n_convs for r in pc2.values())
print("packing curve survival:", {b: r.token_survival for b, r in sorted(pc2.items())})
print("DRIVE78 OK")

# batch-6v: BPE encode + fertility audit on learned merges
from blogparser_spark.dataops.lm import bpe_fertility as _bpf
f0 = _bpf(docs.limit(40), [])
f2 = _bpf(docs.limit(40), mg)
assert f0["chars_per_token"] == 1.0 and f2["tokens_per_word"] < f0["tokens_per_word"]
print("fertility:", f0["tokens_per_word"], "->", f2["tokens_per_word"])
print("DRIVE79 OK")

# batch-6w: streaming lateness accountant
from blogparser_spark.streaming.pipeline import run_streaming_lateness, read_lateness_state
with tempfile.TemporaryDirectory() as td2:
    li, ls, lc = (os.path.join(td2, x) for x in ("in", "state", "ck"))
    os.makedirs(li)
    f1 = transcripts_df(spark, n_convs=4, turns_per_conv=2)
    f1.withColumn("ts", _F.col("ts") + _F.expr("interval 2 hours")).coalesce(1).write.mode("append").parquet(li)
    import time as _t; _t.sleep(1.1)
    f1.withColumn("turn_idx", _F.col("turn_idx") + _F.lit(50)).coalesce(1).write.mode("append").parquet(li)
    run_streaming_lateness(spark, li, ls, lc, delay_seconds=600)
    la = read_lateness_state(spark, ls).collect()
    assert len(la) == 2 and la[1].late_rows == la[1].rows and la[0].late_rows == 0
    print("lateness audit:", [(r.batch_id, r.rows, r.late_rows) for r in la])
print("DRIVE80 OK")

# batch-6x: Fellegi-Sunter record linkage
rl = _entry2.queries()["record_linkage_topk"](spark, "/root/testdata/sf0.001").collect()
assert rl and all(rl[i].score_u >= rl[i + 1].score_u for i in range(len(rl) - 1))
assert all(r.lev_entno >= 0 for r in rl)
print("linkage top score:", rl[0].score_u, "pairs:", len(rl))
print("DRIVE81 OK")

# batch-6y: retractable incremental view maintenance
iv = _entry2.queries()["ivm_refresh_counts"](spark, "/root/testdata/sf0.001").collect()
assert iv and all(r.cnt > 0 for r in iv)
print("ivm groups:", len(iv), "rows:", sum(r.cnt for r in iv))
print("DRIVE82 OK")

# batch-6z: linkage matches -> entity clusters
lc_ = _entry2.queries()["linkage_entity_clusters"](spark, "/root/testdata/sf0.001").collect()
assert lc_ and all(r.n_members == r.n_customers + r.n_suppliers for r in lc_)
assert all(r.n_members >= 2 for r in lc_)
print("entity clusters:", len(lc_), "largest:", max(r.n_members for r in lc_))
print("DRIVE83 OK")

# batch-7a: extremum IVM ledger (delete-the-max promotes next candidate)
ex = _entry2.queries()["ivm_extremum_refresh"](spark, "/root/testdata/sf0.001").collect()
assert ex and all(not r.needs_recompute and r.max_value is not None for r in ex)
print("extremum keys:", len(ex), "max of maxes:", max(r.max_value for r in ex))
print("DRIVE84 OK")

# batch-7b: grok dead-letter routing counts
gm = _entry2.queries()["grok_mismatch_route_counts"](spark, "/root/testdata/sf0.001").collect()
gmd = {r.grok_matched: (r.n, r.n_typed_ok) for r in gm}
assert gmd[True][0] == gmd[True][1] and gmd[False][1] == 0
print("grok route counts:", gmd)
print("DRIVE85 OK")

# batch-7c: incremental BPE merge learning (delta-maintained pair counts)
bl = _entry2.queries()["bpe_learned_merges"](spark, "/root/testdata/sf0.001").collect()
assert len(bl) == 4 and all(bl[i].weight >= bl[i + 1].weight for i in range(len(bl) - 1))
from blogparser_spark.dataops.lm import bpe_learn_merges as _bpe_classic
assert [(r.l, r.r, r.weight) for r in bl] == _bpe_classic(
    __import__("blogparser_spark.queries", fromlist=["_docs"])._docs(spark, "/root/testdata/sf0.001"), 4)
print("learned merges:", [(r.l, r.r) for r in bl])
print("DRIVE86 OK")

# batch-7d: IVF nprobe recall sweep (one plan, monotone curve)
sw = _entry2.queries()["ann_recall_nprobe_sweep"](spark, "/root/testdata/sf0.001").collect()
curve = {}
for r in sw:
    curve.setdefault(r.qid, {})[r.nprobe] = r.recall
assert curve and all(c[1] <= c[2] <= c[4] for c in curve.values())
print("recall curves:", {q: [c[1], c[2], c[4]] for q, c in sorted(curve.items())})
print("DRIVE87 OK")

# batch-7e: EM-learned Fellegi-Sunter m/u weights
em = _entry2.queries()["linkage_em_weights"](spark, "/root/testdata/sf0.001").collect()
assert len(em) == 2 and all(0 <= r.u <= 1 and 0 <= r.m <= 1 and 0 < r.p < 1 for r in em)
print("em params:", [(r.field, r.m, r.u) for r in em])
print("DRIVE88 OK")

# batch-7f: single-pass BPE encode (min-rank) == sequential fold, at dict scale
be = _entry2.queries()["bpe_encoded_dict"](spark, "/root/testdata/sf0.001").collect()
assert be and all(r.n_tokens >= 1 and r.toks.count("|") == r.n_tokens - 1 for r in be)
assert any(len(t) > 1 for r in be for t in r.toks.split("|"))
print("encoded dict words:", len(be))
print("DRIVE89 OK")

# batch-7g: extremum IVM lifecycle (exhaust -> flag -> targeted repair)
xr = _entry2.queries()["ivm_extremum_repair"](spark, "/root/testdata/sf0.001").collect()
assert xr and all(not r.needs_recompute and r.max_value is not None for r in xr)
print("repaired keys:", len(xr))
print("DRIVE90 OK")

# batch-7h: Logstash match-array routing (first pattern wins, union fields)
mp = _entry2.queries()["grok_multi_pattern_route"](spark, "/root/testdata/sf0.001").collect()
mpc = {0: 0, 1: 0, None: 0}
for r in mp:
    mpc[r.grok_pattern_idx] += 1
assert mpc[0] > 0 and mpc[1] > 0 and mpc[None] > 0
assert all(r.id is not None for r in mp if r.grok_pattern_idx is not None)
assert all(r.dur_ms is None for r in mp if r.grok_pattern_idx != 0)
print("pattern routing counts:", mpc)
print("DRIVE91 OK")

# batch-7i: SemDeDup semantic duplicate groups (keep = least prototypical)
sd = _entry2.queries()["semantic_dedup_groups"](spark, "/root/testdata/sf0.001").collect()
sdg = {}
for r in sd:
    sdg.setdefault(r.component, []).append(r)
assert sdg and all(sum(m.keep for m in ms) == 1 and len(ms) >= 2 for ms in sdg.values())
print("semantic dup groups:", len(sdg), "members:", len(sd))
print("DRIVE92 OK")

# batch-7j: int8 embedding quantization audit
iq = _entry2.queries()["int8_quant_audit"](spark, "/root/testdata/sf0.001").collect()
assert iq and all(r.cos_recon > 0.99 and r.max_abs_err >= 0 for r in iq)
print("int8 audit vecs:", len(iq), "worst cos:", min(r.cos_recon for r in iq))
print("DRIVE93 OK")

# batch-7k: trainable quality linear probe (exact-integer GD)
lp = _entry2.queries()["quality_linear_probe_weights"](spark, "/root/testdata/sf0.001").collect()
assert len(lp) == 17 and any(r.w_u != 0 for r in lp)
print("probe weights:", sorted((r.bucket, r.w_u) for r in lp)[:4], "...")
print("DRIVE94 OK")

# batch-7l: streaming CDC incremental view maintenance (replay-safe fold)
from blogparser_spark.streaming.pipeline import read_ivm_state, run_streaming_ivm

_sivm = _tf.mkdtemp(prefix="drv_sivm_")
_sch = "event_type string, value double, op string"
spark.createDataFrame(
    [("click", 2.0, "I"), ("click", 3.0, "I"), ("view", 1.0, "I")], _sch
).coalesce(1).write.mode("overwrite").parquet(f"{_sivm}/in")
spark.createDataFrame(
    [("click", 2.0, "D"), ("view", 1.0, "D"), ("buy", 9.0, "I")], _sch
).coalesce(1).write.mode("append").parquet(f"{_sivm}/in")
run_streaming_ivm(spark, f"{_sivm}/in", f"{_sivm}/out", f"{_sivm}/ck", _sch)
_ivm_live = {(r.event_type, r.cnt, float(r.vsum)) for r in read_ivm_state(spark, f"{_sivm}/out").collect()}
assert _ivm_live == {("click", 1, 3.0), ("buy", 1, 9.0)}
print("streaming ivm state:", sorted(_ivm_live))
print("DRIVE95 OK")

# batch-7m: streaming extremum ledger (snapshot-per-batch, delete-the-max)
from blogparser_spark.streaming.pipeline import read_extremum_state, run_streaming_extremum

_sx = _tf.mkdtemp(prefix="drv_sext_")
_sch2 = "event_type string, value double, op string"
spark.createDataFrame(
    [("click", float(v), "I") for v in (1, 3, 5, 7, 9)], _sch2
).coalesce(1).write.mode("overwrite").parquet(f"{_sx}/in")
spark.createDataFrame(
    [("click", 9.0, "D")], _sch2
).coalesce(1).write.mode("append").parquet(f"{_sx}/in")
run_streaming_extremum(spark, f"{_sx}/in", f"{_sx}/st", f"{_sx}/ck", _sch2, k=3)
_sx_rows = read_extremum_state(spark, f"{_sx}/st").collect()
assert len(_sx_rows) == 1 and _sx_rows[0].extremum == 7.0 and not _sx_rows[0].needs_recompute
print("streaming extremum promoted:", _sx_rows[0].extremum)
print("DRIVE96 OK")

# batch-7n: probe serve path - scored docs separate the weak-label classes
ps = _entry2.queries()["quality_probe_doc_scores"](spark, "/root/testdata/sf0.001").collect()
_pos = [r.score_u for r in ps if r.y == 1]
_neg = [r.score_u for r in ps if r.y == 0]
assert _pos and _neg and sum(_pos) / len(_pos) > sum(_neg) / len(_neg)
print("probe scores: pos mean", sum(_pos) // len(_pos), "neg mean", sum(_neg) // len(_neg))
print("DRIVE97 OK")

# batch-7o: snapshot-log table format — time travel, MoR delete, incremental
from blogparser_spark.operators import tablelog as _tl

_tlt = _tf.mkdtemp(prefix="drv_tablelog_") + "/t"
_b = spark.range(0, 10).selectExpr("id AS event_id", "id % 7 AS user_id")
_tl.append(spark, _tlt, _b)
_tl.delete_where(spark, _tlt, "event_id < 5", key_cols=["event_id"])
_tl.append(spark, _tlt, spark.range(0, 3).selectExpr("id AS event_id", "id % 7 AS user_id"))
_live = sorted(r.event_id for r in _tl.read_snapshot(spark, _tlt).collect())
assert _live == [0, 1, 2, 5, 6, 7, 8, 9], _live  # re-append survives the delete
assert sorted(r.event_id for r in _tl.read_snapshot(spark, _tlt, version=1).collect()) == list(range(10))
_inc = _tl.incremental_append_scan(spark, _tlt, from_version=2)
assert sorted(r.event_id for r in _inc.collect()) == [0, 1, 2]
_tl.compact(spark, _tlt)
assert sorted(r.event_id for r in _tl.read_snapshot(spark, _tlt).collect()) == _live
print("tablelog lineage:", [(c["version"], c["operation"]) for c in _tl.snapshot_lineage(_tlt)])
print("DRIVE98 OK")

# batch-7p: routing onto the snapshot-log format — idempotent markers, pruned sink reads
from blogparser_spark.operators.route import route_commit_tablelog as _rct, read_routed_tablelog as _rrt

_rtl = _tf.mkdtemp(prefix="drv_routelog_") + "/t"
_enr2 = enrich(parse_stage(transcripts_df(spark, n_convs=20, turns_per_conv=4)))
_v, _did = _rct(_enr2, _rtl, marker="s0")
_v2, _did2 = _rct(_enr2, _rtl, marker="s0")  # restart replay
assert _did and not _did2 and _v == _v2 == 1
_inb = _rrt(spark, _rtl, channel="inbound")
assert _inb.count() == _enr2.filter(_enr2.channel == "inbound").count()
assert _tl.read_snapshot(spark, _rtl).count() == _enr2.count()
print("routed tablelog: sinks pruned, replay no-op,", _inb.count(), "inbound rows")
print("DRIVE99 OK")

# batch-7q: atomic merge-upsert, rollback, CDC changelog → IVM view refresh
from blogparser_spark.operators.aggregate import (
    retractable_state as _rsT, apply_retractable_delta as _ardT,
)

_mt = _tf.mkdtemp(prefix="drv_mrg_") + "/t"
_evm = spark.range(0, 40).select(
    _F.col("id").alias("k"), (_F.col("id") % 3).cast("string").alias("g"),
    (_F.col("id") * 2.0).alias("v"),
)
_tl.append(spark, _mt, _evm.filter("k % 2 = 0"))
_view0 = _rsT(_tl.read_snapshot(spark, _mt), ["g"], "v").localCheckpoint()
_tl.merge_upsert(spark, _mt, _evm.filter("k % 5 = 0").withColumn("v", _F.col("v") + 100), ["k"])
_tl.delete_where(spark, _mt, _F.col("k") % 8 == 0, ["k"])
_deltaT = _tl.changelog_scan(spark, _mt, from_version=1).withColumn(
    "op", _F.when(_F.col("_change_type") == "insert", _F.lit("I")).otherwise("D"))
_refr = sorted((r.g, r.cnt, r.vsum) for r in _ardT(_view0, _deltaT, ["g"], "v").collect())
_fullT = sorted((r.g, r.cnt, r.vsum) for r in _rsT(_tl.read_snapshot(spark, _mt), ["g"], "v").collect())
assert _refr == _fullT
_vroll = _tl.rollback_to(_mt, 1)
assert sorted(r.k for r in _tl.read_snapshot(spark, _mt).collect()) == list(range(0, 40, 2))
print("merge+CDC-IVM+rollback:", len(_refr), "groups refreshed; rollback v", _vroll)
print("DRIVE100 OK")

# batch-7r: streaming exactly-once tablelog sink (lost-checkpoint restart is a no-op)
from blogparser_spark.streaming.pipeline import run_streaming_tablelog_route as _rstr

_sld = _tf.mkdtemp(prefix="drv_slog_")
transcripts_df(spark, n_convs=10, turns_per_conv=3).write.parquet(_sld + "/in")
_rstr(spark, _sld + "/in", _sld + "/t", _sld + "/ck1")
_sn = _tl.read_snapshot(spark, _sld + "/t").count()
_sv = _tl.current_version(_sld + "/t")
_rstr(spark, _sld + "/in", _sld + "/t", _sld + "/ck2")
assert _tl.current_version(_sld + "/t") == _sv
assert _tl.read_snapshot(spark, _sld + "/t").count() == _sn
print("streaming tablelog sink exactly-once:", _sn, "rows at v", _sv)
print("DRIVE101 OK")

# batch-7s: tablelog maintenance — binpack small-file rewrite + orphan sweep
_bpt = _tf.mkdtemp(prefix="drv_bp_") + "/t"
_tl.append(spark, _bpt, spark.range(0, 20000).selectExpr("id AS k", "id * 1.0 AS v").coalesce(1))
for _lo in (0, 1, 2):
    _tl.append(spark, _bpt, spark.range(30000 + _lo, 30001 + _lo).selectExpr("id AS k", "id * 1.0 AS v"))
_, _pre_bp = _tl._state_at(_bpt)
_bw = max(e["bytes"] for e in _pre_bp["data"].values())
_bv = _tl.compact_binpack(spark, _bpt, target_bytes=_bw)
_, _post_bp = _tl._state_at(_bpt)
assert _bv and len(_post_bp["data"]) < len(_pre_bp["data"])
assert _tl.read_snapshot(spark, _bpt).count() == 20003
_tl._write_data_files(spark.range(5).selectExpr("id AS k", "id * 1.0 AS v"), _bpt, 99, (), "data")
_orph = _tl.remove_orphans(_bpt)
assert _orph > 0 and _tl.read_snapshot(spark, _bpt).count() == 20003
print("binpack:", len(_pre_bp["data"]), "->", len(_post_bp["data"]), "files; orphans swept:", _orph)
print("DRIVE102 OK")

# batch-7t: write-audit-publish — staged files invisible, gate, atomic publish
_wt = _tf.mkdtemp(prefix="drv_wap_") + "/t"
_tl.append(spark, _wt, spark.range(0, 10).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS g"))
_sid = _tl.stage_append(spark, _wt, spark.range(10, 20).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS g"))
assert _tl.read_snapshot(spark, _wt).count() == 10  # staged rows invisible
assert _tl.remove_orphans(_wt) == 0                 # and not orphans
assert _tl.read_staged(spark, _wt, _sid).count() == 10
_tl.publish_staged(_wt, _sid)
assert _tl.read_snapshot(spark, _wt).count() == 20
_sbad = _tl.stage_append(spark, _wt, spark.range(50, 55).selectExpr("id AS k", "CAST(NULL AS STRING) AS g"))
assert _tl.read_staged(spark, _wt, _sbad).filter("g IS NULL").count() == 5
_tl.discard_staged(_wt, _sbad)
assert _tl.read_snapshot(spark, _wt).count() == 20 and _tl.staged_ids(_wt) == []
print("WAP: staged->audited->published 10 rows; bad batch discarded pre-snapshot")
print("DRIVE103 OK")

# batch-7u: hidden partitioning — transform specs, predicate projection pruning,
# per-file spec evolution, MoR composition
_ht = _tf.mkdtemp(prefix="drv_hid_") + "/t"
_hev = spark.range(0, 2000).selectExpr(
    "id AS k",
    "concat('g-', CAST(id % 13 AS STRING)) AS grp",
    "to_timestamp(concat('2026-08-', lpad(CAST(id % 9 + 1 AS STRING), 2, '0'), ' 10:00:00')) AS ts",
)
_tl.append(spark, _ht, _hev.filter("k % 2 = 0"), partition_spec=("days(ts)",))
_tl.append(spark, _ht, _hev.filter("k % 2 = 1"),
           partition_spec=("days(ts)", "bucket(4, grp)"))
_tl.delete_where(spark, _ht, _F.col("k") % 5 == 0, key_cols=["k"])
_hp = {"ts": ("between", "2026-08-02 00:00:00", "2026-08-03 23:59:59"),
       "grp": ("=", "g-5")}
_hkeep, _hskip = _tl.prune_files_where(_ht, _hp)
assert _hskip > 0
_hgot = sorted(r.k for r in _tl.scan_where(spark, _ht, _hp).collect())
_hexp = sorted(
    r.k
    for r in _hev.filter(
        _F.col("ts").between(*_hp["ts"][1:]) & (_F.col("grp") == "g-5") & (_F.col("k") % 5 != 0)
    ).collect()
)
assert _hgot == _hexp and _hgot
print("hidden partitioning: kept", len(_hkeep), "files, skipped", _hskip,
      "; scan_where exact on", len(_hgot), "rows across evolved specs + MoR delete")
print("DRIVE104 OK")

# batch-7v: named refs — branch isolation, tag expiry pin, fast-forward publish
_rt = _tf.mkdtemp(prefix="drv_ref_") + "/t"
_tl.append(spark, _rt, spark.range(0, 10).selectExpr("id AS k"))          # v1 main
_tl.create_tag(_rt, "t0")
_tl.create_branch(_rt, "stage")
_tl.append(spark, _rt, spark.range(10, 20).selectExpr("id AS k"), branch="stage")  # v2
_tl.append(spark, _rt, spark.range(100, 103).selectExpr("id AS k"))       # v3 main
assert _tl.read_snapshot(spark, _rt).count() == 13                         # branch invisible
assert _tl.read_snapshot(spark, _rt, ref="stage").count() == 20            # main post-fork invisible
assert sorted(_tl.list_refs(_rt)) == ["stage", "t0"]
_ffv = _tl.fast_forward(_rt, "stage")
assert sorted(r.k for r in _tl.read_snapshot(spark, _rt).collect()) == list(range(20))
_res = _tl.expire_snapshots(_rt, keep_last=1)                              # tag pins v1
assert _tl.read_snapshot(spark, _rt, ref="t0").count() == 10
print("refs: branch isolated, fast-forward v%d re-pointed main, tag survived expiry (%d versions swept)"
      % (_ffv, _res["versions_removed"]))
print("DRIVE105 OK")

# batch-7w: field-id schema evolution — rename/widen/add metadata-only,
# delete translation across the rename, drop/re-add non-resurrection
_et = _tf.mkdtemp(prefix="drv_evo_") + "/t"
_tl.append(spark, _et, spark.range(0, 10).selectExpr(
    "cast(id as int) AS k", "concat('v', id) AS v"))                       # v1
_tl.delete_where(spark, _et, _F.col("k") == 3, key_cols=["k"])             # v2, keyed pre-rename
_files_pre = sorted(_tl._state_at(_et)[1]["data"])
_tl.evolve_schema(_et, rename={"k": "key", "v": "label"},
                  widen={"k": "bigint"}, add=[("src", "string")])          # v3 metadata-only
assert sorted(_tl._state_at(_et)[1]["data"]) == _files_pre                 # no rewrite
_tl.append(spark, _et, spark.createDataFrame(
    [(50, "v50", "new")], "key bigint, label string, src string"))         # v4
_edf = _tl.read_snapshot(spark, _et)
assert _edf.columns == ["key", "label", "src"]
assert dict(_edf.dtypes)["key"] == "bigint"
_erows = {r.key: (r.label, r.src) for r in _edf.collect()}
assert 3 not in _erows and _erows[50] == ("v50", "new") and _erows[0] == ("v0", None)
assert _tl.read_snapshot(spark, _et, version=1).columns == ["k", "v"]      # time travel pre-evolve
_tl.evolve_schema(_et, drop=("label",))
_tl.evolve_schema(_et, add=[("label", "string")])                          # fresh id: no resurrection
assert _tl.read_snapshot(spark, _et).filter("label IS NOT NULL").count() == 0
print("schema evolution: rename/widen/add metadata-only over", len(_files_pre),
      "files, pre-rename delete translated, time travel kept old schema, re-added column stayed dark")
print("DRIVE106 OK")

# batch-7x: position deletes — predicate delete without keys, exact dedup of
# identical rows, seq scoping, composition with schema evolution
_pt = _tf.mkdtemp(prefix="drv_pos_") + "/t"
_pd = spark.range(0, 8).selectExpr("id % 4 AS k", "concat('d', id % 4) AS v")
_tl.append(spark, _pt, _pd)                                                # v1: each (k,v) twice
_tl.append(spark, _pt, _pd)                                                # v2: four copies each
_tl.dedup_keep_first(spark, _pt, ["k", "v"])                               # v3: positional dedup
assert _tl.read_snapshot(spark, _pt).count() == 4
_tl.delete_where_positions(spark, _pt, _F.col("k") % 2 == 0)               # v4: no key cols
assert sorted(r.k for r in _tl.read_snapshot(spark, _pt).collect()) == [1, 3]
_tl.evolve_schema(_pt, rename={"k": "key"})                                # v5: positional deletes immune
_tl.append(spark, _pt, spark.createDataFrame([(0, "back")], "key bigint, v string"))  # v6 survives v4
assert sorted(r.key for r in _tl.read_snapshot(spark, _pt).collect()) == [0, 1, 3]
_pcl = _tl.changelog_scan(spark, _pt, from_version=3)
assert _pcl.filter("_change_type = 'delete'").count() == 2                 # exact pre-images
print("position deletes: 4-copy dedup to 1, keyless predicate delete, rename-immune, seq-scoped re-append")
print("DRIVE107 OK")

# batch-7y: copy-on-write UPDATE — partial-file rewrite, delete folding, CDC
_ut = _tf.mkdtemp(prefix="drv_upd_") + "/t"
_tl.append(spark, _ut, spark.range(0, 40).selectExpr("id AS k", "id * 2 AS v")
           .repartitionByRange(4, "k"), stats_cols=("k",))
_uf1 = set(_tl._state_at(_ut)[1]["data"])
_tl.update_where(spark, _ut, _F.col("k").between(0, 9), {"v": _F.col("v") + 500})
assert len(_uf1 & set(_tl._state_at(_ut)[1]["data"])) == 3                 # 3 of 4 untouched
_tl.delete_where(spark, _ut, _F.col("k") == 5, key_cols=["k"])
_urows = {r.k: r.v for r in _tl.read_snapshot(spark, _ut).collect()}
assert _urows[3] == 506 and _urows[20] == 40 and 5 not in _urows and len(_urows) == 39
_ucl = _tl.changelog_scan(spark, _ut, from_version=2)
assert sorted((r.k, r.v) for r in _ucl.filter("_change_type='delete'").collect()) == [(5, 510)]
_ucl1 = _tl.changelog_scan(spark, _ut, from_version=1)
assert _ucl1.filter("_change_type='delete' AND _commit_version = 2").count() == 10  # update pre-images
print("CoW update: 1-of-4 file rewrite, neighbors intact, delete over rewrite, CDC net diff exact")
print("DRIVE108 OK")

# batch-7z: metadata inspection tables — history / files / refs as DataFrames
_mt = _tf.mkdtemp(prefix="drv_meta_") + "/t"
_tl.append(spark, _mt, spark.range(0, 10).selectExpr("id AS k"))
_tl.create_tag(_mt, "pin")
_tl.delete_where_positions(spark, _mt, _F.col("k") == 5)
_tl.create_branch(_mt, "dev")
_tl.append(spark, _mt, spark.range(10, 12).selectExpr("id AS k"), branch="dev")
_mh = {(r.version, r.operation, r.branch) for r in _tl.table_history(spark, _mt).collect()}
assert _mh == {(1, "append", "main"), (2, "delete", "main"), (3, "append", "dev")}
_mf = _tl.table_files(spark, _mt)
assert _mf.filter("kind = 'delete' AND positional").count() == 1
assert _mf.filter("kind = 'data'").agg(_F.sum("rows")).first()[0] == 10
_mr = {r.name: (r.kind, r.version) for r in _tl.table_refs(spark, _mt).collect()}
assert _mr == {"main": ("branch", 2), "pin": ("tag", 1), "dev": ("branch", 3)}
print("metadata tables: history lineage, file/delete-debt tallies, derived branch heads")
print("DRIVE109 OK")

# batch-8a: add_files by-reference import
_afb = _tf.mkdtemp(prefix="drv_af_")
_afsrc, _aft = _afb + "/ext", _afb + "/t"
spark.range(0, 20).selectExpr("id AS k", "id * 3 AS v").repartitionByRange(2, "k").write.parquet(_afsrc)
_tl.append(spark, _aft, spark.range(100, 105).selectExpr("id AS k", "id * 3 AS v"))
_tl.add_files(spark, _aft, _afsrc, stats_cols=("k",))
assert _tl.read_snapshot(spark, _aft).count() == 25
assert any(p.startswith(_afsrc) for p in _tl._state_at(_aft)[1]["data"])  # no copy
_afk, _afs = _tl.prune_files(_aft, "k", 0, 5)
assert _afs >= 1
_tl.delete_where(spark, _aft, _F.col("k") % 2 == 0, key_cols=["k"])
assert _tl.read_snapshot(spark, _aft).count() == 12
print("add_files: by-reference import, footer stats prune, MoR over imported files")
print("DRIVE110 OK")

# batch-8b: checkpointed consumer — exactly-once relay with crash-replay
_cxb = _tf.mkdtemp(prefix="drv_cx_")
_cxs, _cxk, _cxp = _cxb + "/src", _cxb + "/sink", _cxb + "/cp"
_tl.append(spark, _cxs, spark.range(0, 6).selectExpr("id AS k"))
_cdf, _cf, _ct, _cack = _tl.consume_incremental(spark, _cxs, _cxp)
_tl.append_idempotent(spark, _cxk, _cdf, marker=f"v{_ct}")
_cack()
_tl.append(spark, _cxs, spark.range(6, 9).selectExpr("id AS k"))
_cdf1, _x, _ct1, _lost = _tl.consume_incremental(spark, _cxs, _cxp)
_tl.append_idempotent(spark, _cxk, _cdf1, marker=f"v{_ct1}")      # processed, then "crash" pre-ack
_cdf2, _x2, _ct2, _cack2 = _tl.consume_incremental(spark, _cxs, _cxp)  # re-delivered
_v, _did = _tl.append_idempotent(spark, _cxk, _cdf2, marker=f"v{_ct2}")
assert not _did and _ct2 == _ct1                                   # replay is a no-op
_cack2()
assert sorted(r.k for r in _tl.read_snapshot(spark, _cxk).collect()) == list(range(9))
_cnone, _a, _b, _nop = _tl.consume_incremental(spark, _cxs, _cxp)
assert _cnone is None
print("consumer: offset redelivery + marker-ledger replay no-op = exactly-once relay")
print("DRIVE111 OK")

# batch-8c: partitions metadata table + position-delete compaction
import json as _json
_ppt = _tf.mkdtemp(prefix="drv_pp_") + "/t"
_ppd = spark.range(0, 30).selectExpr("id AS k", "concat('s', id % 3) AS sink")
_tl.append(spark, _ppt, _ppd, partition_by=("sink",))
_tl.append(spark, _ppt, _ppd.filter("id % 3 = 0"), partition_by=("sink",))
_ppr = {r.partition: (r.rows, r.min_seq, r.max_seq)
        for r in _tl.table_partitions(spark, _ppt).collect()}
assert _ppr[_json.dumps({"sink": "s0"})] == (20, 1, 2)
assert _ppr[_json.dumps({"sink": "s2"})] == (10, 1, 1)
_rpt = _tf.mkdtemp(prefix="drv_rp_") + "/t"
_tl.append(spark, _rpt, spark.range(0, 20).selectExpr("id AS k", "id AS v").repartitionByRange(2, "k"))
_tl.delete_where_positions(spark, _rpt, _F.col("k") == 1)
_tl.delete_where_positions(spark, _rpt, _F.col("k") == 15)
_tl.update_where(spark, _rpt, _F.col("k") == 2, {"v": _F.lit(0)})   # dangles k=1's identity
_rb = sorted(r.k for r in _tl.read_snapshot(spark, _rpt).collect())
_rv = _tl.rewrite_position_deletes(spark, _rpt)
_rp = [e for e in _tl._state_at(_rpt)[1]["deletes"].values() if e.get("positional")]
assert len(_rp) == 1 and _rp[0]["rows"] == 1                         # folded + dangling dropped
assert sorted(r.k for r in _tl.read_snapshot(spark, _rpt).collect()) == _rb
assert _tl.changelog_scan(spark, _rpt, from_version=_rv - 1).count() == 0
print("partitions table + position-delete rewrite: manifest-only stats, 2->1 fold, no-op commit")
print("DRIVE112 OK")

# batch-8d: maintenance planner — manifests-only recommendations that clear
_mpt = _tf.mkdtemp(prefix="drv_mp_") + "/t"
for _lo in range(0, 40, 10):
    _tl.append(spark, _mpt, spark.range(_lo, _lo + 10).selectExpr("id AS k").coalesce(1))
_tl.delete_where_positions(spark, _mpt, _F.col("k") == 1)
_tl.delete_where_positions(spark, _mpt, _F.col("k") == 2)
_mp = {r.action: r.n for r in _tl.maintenance_plan(spark, _mpt).collect()}
assert _mp.get("compact_binpack") == 4 and _mp.get("rewrite_position_deletes") == 2
_tl.rewrite_position_deletes(spark, _mpt)
_tl.compact_binpack(spark, _mpt, target_bytes=1 << 30)
_mp2 = {r.action for r in _tl.maintenance_plan(spark, _mpt).collect()}
assert "rewrite_position_deletes" not in _mp2 and "compact_binpack" not in _mp2
assert _tl.read_snapshot(spark, _mpt).count() == 38
print("maintenance planner: backlog detected from manifests, cleared by the recommended actions")
print("DRIVE113 OK")

# batch-8e: unigram-LM tokenizer — hard-EM train + Viterbi parity twin
from blogparser_spark.dataops import unigram as _ug
from blogparser_spark.dataops.lm import word_freq_dict as _wfd
_ud = spark.createDataFrame(
    [(0, "abab abc cab"), (1, "abab abab cab b"), (2, "cc abc abab")],
    ["doc_id", "text"])
_uw = _wfd(_ud)
_usc = _ug.piece_scores(_ug.seed_pieces(_uw, 3))
_useg = {r.word: (r.toks, r.n_pieces) for r in
         _ug.viterbi_segments(_uw, _usc, 3, 8).collect()}
assert _useg["abab"] == ("ab|ab", 2) and _useg["abc"] == ("abc", 1)
_ufin = _ug.train_hard_em(_ud, vocab_size=4, n_rounds=2, max_piece_len=3)
_up = {r.piece for r in _ufin.collect()}
assert "ab" in _up and {"a", "b", "c"} <= _up     # winner piece + coverage singles
print("unigram: seed->viterbi->2xEM, ab|ab segmentation, singles kept")
print("DRIVE114 OK")

# batch-8f: multinomial NB classifier — hash-split train/predict round trip
from blogparser_spark.dataops import nbayes as _nb
_nd = spark.createDataFrame(
    [(i, ["en", "de"][i % 2], f"tok{i % 5} tok{i % 3} common") for i in range(40)],
    ["doc_id", "lang", "text"])
_nw, _npr = _nb.nb_train(_nd)
assert _nw.count() == 2 * _nb.NB_BUCKETS                     # full label x bucket spine
_npred = _nb.nb_predict(_nd, _nw, _npr)
_nc = _nb.nb_confusion(_npred)
assert _npred.count() == _nc.agg(_F.sum("n_docs")).collect()[0][0] > 0
print("nbayes: spine-complete weights, fold-0 predictions, confusion totals")
print("DRIVE115 OK")

# batch-8g: two-stage PQ serving — ADC shortlist + exact re-rank
from blogparser_spark.dataops import similarity as _sim
_pe = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
_pcb = _sim.pq_train(_pe, m=4, ksub=8, iters=1)
_psh = {(r.qid, r.nid) for r in _sim.pq_adc_topk(_pe, _pcb, n_queries=2, k=8).collect()}
_prr = _sim.pq_rerank_topk(_pe, _pcb, n_queries=2, k=2, shortlist_mult=4).collect()
assert len(_prr) == 4 and {(r.qid, r.nid) for r in _prr} <= _psh
assert all(r.dist >= 0 for r in _prr)
print("pq-rerank: exact-L2 re-rank drawn from the ADC shortlist")
print("DRIVE116 OK")

# batch-8h: clustering rewrite — sort + z-order file skipping on the log format
_cst = _tf.mkdtemp(prefix="drv_cs_") + "/t"
_tl.append(spark, _cst, spark.range(0, 100).selectExpr("id AS k", "id % 7 AS v").repartition(4))
_tl.delete_where_positions(spark, _cst, _F.col("k") == 50)
assert _tl.prune_files_where(_cst, {"k": ("=", 10)})[1] == 0   # hash layout: nothing prunes
_tl.compact_sort(spark, _cst, ("k",), n_files=4)
_csk, _css = _tl.prune_files_where(_cst, {"k": ("=", 10)})
assert len(_csk) == 1 and _css == 3 and _tl.read_snapshot(spark, _cst).count() == 99
_czt = _tf.mkdtemp(prefix="drv_cz_") + "/t"
_tl.append(spark, _czt, spark.range(0, 256).selectExpr("id % 16 AS a", "cast(id / 16 AS long) AS b", "id AS p").repartition(4))
_tl.compact_sort(spark, _czt, ("a", "b"), n_files=4, zorder=True)
assert _tl.prune_files_where(_czt, {"a": ("between", 0, 3), "b": ("between", 0, 3)})[1] >= 2
print("compact_sort: range clustering 4->1 files on point lookup; z-order prunes the 2-D box")
print("DRIVE117 OK")

# batch-8i: manifest bloom filters — point-lookup skipping on scattered keys
_blt = _tf.mkdtemp(prefix="drv_bl_") + "/t"
_bld = spark.range(0, 400).selectExpr("(id * 2654435761) % 1000000 AS k", "id AS v")
_tl.append(spark, _blt, _bld.repartition(8), stats_cols=("k",), bloom_cols=("k",))
_blk = int(_bld.filter("v = 123").collect()[0].k)
assert _tl.prune_files_where(_blt, {"k": ("=", _blk)})[1] >= 5
assert [r.v for r in _tl.scan_where(spark, _blt, {"k": ("=", _blk)}).collect()] == [123]
assert _tl.prune_files_where(_blt, {"k": ("=", 999999999)})[1] == 8
print("manifest blooms: present key opens ~1 file, absent key opens none")
print("DRIVE118 OK")

# batch-8j: clustering-depth health metric drives the sort-rewrite loop
_cdt = _tf.mkdtemp(prefix="drv_cd_") + "/t"
_tl.append(spark, _cdt, spark.range(0, 100).selectExpr("id AS k").repartition(4), stats_cols=("k",))
assert _tl.clustering_depth(_cdt, "k")["avg_depth"] == 4.0
assert "compact_sort" in {r.action for r in _tl.maintenance_plan(spark, _cdt, cluster_col="k").collect()}
_tl.compact_sort(spark, _cdt, ("k",), n_files=4)
assert _tl.clustering_depth(_cdt, "k")["avg_depth"] <= 1.5
assert "compact_sort" not in {r.action for r in _tl.maintenance_plan(spark, _cdt, cluster_col="k").collect()}
print("clustering depth: scattered 4.0 -> recommended rewrite -> ~1.0, recommendation clears")
print("DRIVE119 OK")

# batch-8k: privacy l-diversity gate + DoReMi-style mixture reweighting
from blogparser_spark.dataops.profile import l_diversity_audit as _lda
_ldf = spark.createDataFrame(
    [("a", 1, i % 5) for i in range(10)] + [("b", 1, 7)] * 6,
    ["seg", "sub", "diag"])
_ldo = {r.seg: r for r in _lda(_ldf, ["seg", "sub"], "diag", l_min=3, by="seg").collect()}
assert _ldo["a"].n_risky_groups == 0 and _ldo["b"].min_diversity == 1
from blogparser_spark.dataops.lm import domain_excess_reweight as _der
_ddf = spark.createDataFrame(
    [(i, "easy", "a b a b a b") for i in range(10)]
    + [(100 + i, "hard", f"z{i} q{i} x{i} y{i}") for i in range(10)],
    ["doc_id", "source", "text"])
_ddo = {r.domain: r for r in _der(_ddf, eta=1, budget_tokens=1000).collect()}
assert _ddo["hard"].weight > _ddo["easy"].weight
assert abs(_ddo["easy"].weight + _ddo["hard"].weight - 1.0) < 2e-6
print("l-diversity flags homogeneous groups; hard domain upweighted under the budget")
print("DRIVE120 OK")

# batch-8l: conversation point-lookup through the routed lakehouse table
from blogparser_spark.operators.route import route_commit_tablelog as _rct
_rlt = _tf.mkdtemp(prefix="drv_rl_") + "/t"
_rle = enrich(parse_stage(transcripts_df(spark, n_convs=12, turns_per_conv=5)))
_rct(_rle, _rlt, marker="m0", stats_cols=("conv_id",), bloom_cols=("conv_id",))
_rlc = _rle.select("conv_id").first().conv_id
_rlo = _tl.scan_where(spark, _rlt, {"conv_id": ("=", _rlc)})
assert _rlo.count() == 5 and {r.turn_idx for r in _rlo.collect()} == set(range(5))
_, _rls = _tl._state_at(_rlt)
assert all("conv_id" in e.get("bloom", {}) for e in _rls["data"].values())
print("routed conv lookup: bloom'd sink manifests serve one conv's turns back exactly")
print("DRIVE121 OK")

# batch-8m: manifest NDV column stats — KMV sketches, layout-independent merge
_nvt = _tf.mkdtemp(prefix="drv_nv_") + "/t"
_nvd = spark.range(0, 2000).selectExpr("id % 37 AS few", "id AS many")
_tl.append(spark, _nvt, _nvd.repartition(4), ndv_cols=("few", "many"))
assert _tl.column_ndv(_nvt, "few")["ndv_est"] == 37.0
_nvm = _tl.column_ndv(_nvt, "many")
assert _nvm["n_mins"] == 64 and 1000 < _nvm["ndv_est"] < 4000
print("column NDV from manifests: exact below k, KMV estimate above, no data read")
print("DRIVE122 OK")

# batch-8n: cross-table join-size estimate from manifest KMV sketches
_ja = _tf.mkdtemp(prefix="drv_ja_") + "/t"; _jb = _tf.mkdtemp(prefix="drv_jb_") + "/t"
_tl.append(spark, _ja, spark.range(0, 1200).selectExpr("id AS k"), ndv_cols=("k",))
_tl.append(spark, _jb, spark.range(600, 1800).selectExpr("id AS k"), ndv_cols=("k",))
_jov = _tl.column_ndv_overlap(_ja, _jb, "k")
assert 0.15 < _jov["jaccard"] < 0.55 and 250 < _jov["inter_est"] < 1100
print("join-size estimate from manifests: J=%.3f inter≈%.0f (true 600)" % (_jov["jaccard"], _jov["inter_est"]))
print("DRIVE123 OK")

# batch-9a: two-level manifests — chunked commit, summary skip, parity
_c2t = _tf.mkdtemp(prefix="drv_c2_") + "/t"
_c2d = spark.range(0, 400).selectExpr(
    "id AS k", "cast(id % 8 AS string) AS day")
_tl.append(spark, _c2t, _c2d.repartition("day"), partition_spec=("day",),
           stats_cols=("k",), bloom_cols=("k",), manifest_chunk_files=2)
_c2l = _tl._state_at(_c2t, expand=False)[1]
assert _c2l.get("chunks") and not _c2l["data"]
_c2p = _tl.plan_scan(_c2t, {"day": ("=", "3")})
assert _c2p["n_chunks_opened"] < _c2p["n_chunks_total"]
assert _tl.scan_where(spark, _c2t, {"day": ("=", "3")}).count() == 50
assert _tl.read_snapshot(spark, _c2t).count() == 400
_c2a = _tl.plan_scan(_c2t, {"k": ("=", 999999)})
assert _c2a["n_chunks_opened"] == 0 and _c2a["paths"] == []
print("two-level manifests: %d/%d chunks skipped on point scan, absent key opens none"
      % (_c2p["n_chunks_skipped"], _c2p["n_chunks_total"]))
print("DRIVE124 OK")

# batch-9b: sliced job routes through the tablelog sink with ledger resume
from blogparser_spark.job import transform as _jtf
from blogparser_spark.operators.checkpoint import run_sliced as _rsl
_j5i = _tf.mkdtemp(prefix="drv_j5_")
transcripts_df(spark, n_convs=20, turns_per_conv=4).write.mode(
    "overwrite").parquet(_j5i + "/in")
_j5o = _j5i + "/out"
_j5m = _rsl(spark, _j5i + "/in", _j5o, _jtf, n_slices=2,
            table_format="tablelog")
assert [m.slice_id for m in _j5m] == [0, 1]
assert all(m.table_version for m in _j5m)
_j5n = spark.read.parquet(_j5i + "/in").count()
assert _tl.read_snapshot(spark, _j5o + "/table").count() == _j5n
import shutil as _sh
_sh.rmtree(_j5o + "/_manifests")  # ledger alone must still resume
assert _rsl(spark, _j5i + "/in", _j5o, _jtf, n_slices=2,
            table_format="tablelog") == []
print("sliced job -> tablelog sink: atomic slice commits, marker-ledger resume without manifests")
print("DRIVE125 OK")

# batch-9c: fused unigram Viterbi — one-shuffle DP, exact segmentation
from blogparser_spark.dataops import unigram as _ug
from blogparser_spark.dataops.lm import word_freq_dict as _wfd
_ugd = spark.createDataFrame(
    [(i, "abab abc cab abab") for i in range(6)], ["doc_id", "text"])
_ugw = _wfd(_ugd, "text")
_ugs = _ug.piece_scores(_ug.seed_pieces(_ugw, 3))
_ugo = {r.word: (r.toks, r.n_pieces)
        for r in _ug.viterbi_segments(_ugw, _ugs, 3, 8).collect()}
# every segmentation reconstructs its word and its piece count is exact
assert all(t.replace("|", "") == w for w, (t, _n) in _ugo.items())
assert all(n == len(t.split("|")) for t, n in _ugo.values())
assert _ugo["abc"] == ("abc", 1)  # 3-char word fits one seed piece
_uge = _ug.em_round(_ugw, _ugs, vocab_size=4, max_piece_len=3)
assert _uge.count() >= 4  # top-V + single-char coverage
print("fused unigram DP: one-shuffle Viterbi segments + EM round over %d words" % len(_ugo))
print("DRIVE126 OK")

# batch-9d: morphology lexicons — compound/okurigana/particle-split twins
from blogparser_spark.functions.jpos import lemma_py as _lpy, tokenize_pos_py as _tpy
assert _lpy("勉強しました") == "勉強する" and _lpy("話しました") == "話す"
assert _lpy("できました") == "できる"
assert [t for t, _p, _w in _tpy("手続きをしました")] == ["手続き", "する"]
assert "晴れ" in [t for t, _p, _w in _tpy("明後日は晴れです")]
print("morphology lexicons: suru-compounds, okurigana nouns, particle split all resolve")
print("DRIVE127 OK")
