"""Tests for curation operators: decontamination, stratified sampling,
sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_decontaminate(spark):
    from blogparser_spark.dataops.curation import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (0, "we saw the quick brown fox jumps over it"),  # overlap
            (1, "completely fresh words only here today"),     # clean
            (2, "too short"),                                  # < n tokens
            (3, "the quick brown fox jumps the quick brown fox jumps"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=3).collect()}
    assert len(out) == 4  # short doc survives with zeros
    # doc 0: 9 tokens → 7 trigrams, 3 of them inside the bench 5-gram window
    assert out[0]["n_ngrams"] == 7 and out[0]["n_contaminated"] == 3
    assert out[0]["contaminated"] is True
    assert out[1]["n_contaminated"] == 0 and out[1]["contaminated"] is False
    assert out[2]["n_ngrams"] == 0 and out[2]["contaminated"] is False
    assert out[2]["contaminated_frac"] == 0.0
    # doc 3: every trigram occurrence that exists in bench counts per occurrence
    assert out[3]["n_contaminated"] > out[0]["n_contaminated"]


def test_decontaminate_broadcasts_benchmark(spark):
    from blogparser_spark.dataops.curation import decontaminate

    bench = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    plan = (
        decontaminate(docs, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_stratified_sample_deterministic_and_calibrated(spark):
    from blogparser_spark.dataops.curation import stratified_sample

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("ja").alias("lang"),
    )
    rates = {"en": 0.25, "ja": 1.0}
    a = stratified_sample(df, rates)
    ids1 = sorted(r["doc_id"] for r in a.collect())
    ids2 = sorted(r["doc_id"] for r in stratified_sample(df, rates).collect())
    assert ids1 == ids2  # deterministic
    kept_en = a.filter("lang = 'en'").count()
    assert abs(kept_en - 500) < 90  # 2000 * 0.25, ±>4σ
    assert a.filter("lang = 'ja'").count() == 2000  # rate 1.0 keeps all
    # rate 0 keeps nothing; unlisted stratum gets default_rate
    assert stratified_sample(df, {"en": 0.0}, default_rate=0.0).count() == 0
    assert (
        stratified_sample(df, {"en": 0.0}, default_rate=1.0).count() == 2000
    )
    # no shuffle: pure filter, zero exchanges
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_temperature_rates(spark):
    from blogparser_spark.dataops.curation import temperature_rates

    df = spark.createDataFrame(
        [("en",)] * 900 + [("ja",)] * 100 + [("de",)] * 10, "lang string"
    )
    r1 = temperature_rates(df, alpha=1.0)
    assert r1 == {"en": 1.0, "ja": 1.0, "de": 1.0}
    r = temperature_rates(df, alpha=0.5)
    assert r["de"] == 1.0  # smallest stratum keeps everything
    assert r["de"] > r["ja"] > r["en"]  # bigger → more downsampled
    # expected kept counts move toward balance: c_s * rate_s ∝ sqrt(c_s)
    assert abs((900 * r["en"]) / (100 * r["ja"]) - 3.0) < 1e-9


def test_pack_sequences(spark):
    from blogparser_spark.dataops.curation import pack_sequences

    rows = [
        (0, "en", "w " * 60),   # 60 tokens → pack 0, pos 0
        (1, "en", "w " * 60),   # starts at 60 → pack 0
        (2, "en", "w " * 60),   # starts at 120 → pack 1 (budget 100)
        (3, "en", "w " * 250),  # oversized doc: owns pack at its start
        (4, "en", "w " * 10),   # starts at 430 → pack 4
        (5, "ja", "w " * 10),   # other stratum restarts at 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=100).collect()}
    assert out[0]["pack_id"] == 0 and out[0]["pack_pos"] == 0
    assert out[1]["pack_id"] == 0 and out[1]["pack_pos"] == 60
    assert out[2]["pack_id"] == 1 and out[2]["pack_pos"] == 20
    assert out[3]["pack_id"] == 1 and out[3]["pack_pos"] == 80
    assert out[4]["pack_id"] == 4 and out[4]["pack_pos"] == 30
    assert out[5]["pack_id"] == 0 and out[5]["pack_pos"] == 0


def test_pack_sequences_sharded(spark):
    from blogparser_spark.dataops.curation import pack_sequences

    rows = [(i, "en", "w " * 30) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        r["doc_id"]: r
        for r in pack_sequences(df, budget=100, shard_size=5).collect()
    }
    # shard boundary at id 5 restarts the running total
    assert out[4]["shard"] == 0 and out[5]["shard"] == 1
    assert out[5]["pack_id"] == 0 and out[5]["pack_pos"] == 0
    assert out[9]["pack_pos"] == out[4]["pack_pos"]


def test_epoch_shuffle_rank(spark):
    from blogparser_spark.dataops.curation import epoch_shuffle_rank

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = epoch_shuffle_rank(df, epoch=1)
    rows = out.select("doc_id", "shuffle_key", "shuffle_rank").collect()
    # ranks are a permutation of 1..n
    assert sorted(r["shuffle_rank"] for r in rows) == list(range(1, 501))
    # rank order == key order (the global ORDER BY equivalence)
    by_rank = [r["shuffle_key"] for r in sorted(rows, key=lambda r: r["shuffle_rank"])]
    assert by_rank == sorted(by_rank)
    # a different epoch produces a different permutation
    other = {
        r["doc_id"]: r["shuffle_rank"]
        for r in epoch_shuffle_rank(df, epoch=2).collect()
    }
    assert other != {r["doc_id"]: r["shuffle_rank"] for r in rows}
    # an INDEPENDENT recomputation agrees exactly — the bucket is a pure
    # function of the row, so correctness never depends on Spark reusing
    # the exchange between the offsets branch and the main branch
    again = {r["doc_id"]: r["shuffle_rank"]
             for r in epoch_shuffle_rank(df, epoch=1).collect()}
    assert again == {r["doc_id"]: r["shuffle_rank"] for r in rows}
    # distributed shape: partitioned on the prefix bucket, never 1 reducer,
    # never a sampled range exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan
    assert "hashpartitioning(_bkt" in plan


def test_boilerplate_flags(spark):
    """Cross-conv repeated text is boilerplate; within-conv repeats and
    unique turns are not; normalization folds case/whitespace variants of
    the same canned text into one hash."""
    from blogparser_spark.dataops.curation import boilerplate_flags, strip_boilerplate

    rows = [
        ("c1", 0, "Hello! How can I help you today?"),
        ("c2", 0, "hello!  how can I help you   today?"),  # variant, same norm
        ("c3", 0, "Hello! How can I help you today?"),
        ("c1", 1, "my unique question about spark"),
        ("c4", 0, "repeated inside one conv only"),
        ("c4", 1, "repeated inside one conv only"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {(r["conv_id"], r["turn_idx"]): r
           for r in boilerplate_flags(df, min_groups=3).collect()}
    assert out[("c1", 0)]["is_boilerplate"] is True
    assert out[("c2", 0)]["is_boilerplate"] is True  # normalization folded it
    assert out[("c1", 0)]["text_hash"] == out[("c2", 0)]["text_hash"]
    assert out[("c1", 0)]["n_groups"] == 3
    assert out[("c1", 1)]["is_boilerplate"] is False
    # repeats confined to one conversation are content, not boilerplate
    assert out[("c4", 0)]["is_boilerplate"] is False
    assert out[("c4", 0)]["n_groups"] == 1

    kept = strip_boilerplate(df, min_groups=3)
    assert kept.columns == df.columns  # original schema preserved
    assert kept.count() == 3


def test_boilerplate_keeps_null_text_rows(spark):
    """NULL text hashes to NULL; the flags join must keep the row
    (n_groups 0, not boilerplate) so the every-input-row contract holds."""
    from blogparser_spark.dataops.curation import boilerplate_flags

    rows = [("c1", 0, "hello"), ("c2", 0, None), ("c3", 0, "hello"), ("c4", 0, "hello")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {r["conv_id"]: r for r in boilerplate_flags(df, min_groups=3).collect()}
    assert len(out) == 4
    assert out["c2"]["text_hash"] is None
    assert out["c2"]["n_groups"] == 0 and out["c2"]["is_boilerplate"] is False
    assert out["c1"]["is_boilerplate"] is True


def test_library_surface_survives_ansi_on(spark):
    """CLAUDE-rule-6 inverse: queries() get the _prepare shim, but direct
    library callers may hand us an ANSI-on session. Map/array lookups with
    missing keys must yield NULL→default, not MAP_KEY_DOES_NOT_EXIST /
    INVALID_ARRAY_INDEX."""
    from pyspark.sql import functions as F

    from blogparser_spark.dataops.curation import stratified_sample
    from blogparser_spark.functions.jpos import lemma_of
    from blogparser_spark.functions.text import pick_date

    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame(
            [(1, "ja"), (2, "en")], "doc_id long, lang string"
        )
        kept = stratified_sample(df, {"en": 1.0}, default_rate=1.0).count()
        assert kept == 2  # 'ja' missing from rates → default, no ANSI error

        toks = spark.createDataFrame([("xyz",), ("run",)], "t string")
        assert toks.select(lemma_of(F.col("t")).alias("l")).count() == 2

        dates = spark.createDataFrame([("not a date",)], "s string")
        got = dates.select(
            pick_date(F.array(F.col("s"))).alias("d")
        ).collect()
        assert got[0]["d"] is None  # empty parse set → NULL, no error

        # round-3 surfaces: PQ / IVF-PQ (map-literal + array indexing),
        # budget selection (bucket arithmetic), span stats (lead windows)
        from blogparser_spark.dataops.curation import quality_budget_selection
        from blogparser_spark.dataops.dedup import cross_doc_span_stats
        from blogparser_spark.dataops.similarity import (
            ivfpq_topk,
            pq_adc_topk,
            pq_train,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cb = pq_train(emb, m=4, ksub=8, iters=1)
        assert pq_adc_topk(emb, cb, n_queries=2, k=2).count() == 4
        assert ivfpq_topk(emb, n_queries=2, k=2, n_cells=4, m=4, ksub=8).count() > 0
        docs = spark.createDataFrame(
            [(0, "a b c d e f g h i"), (1, "a b c d e f g h j"), (2, "x")],
            "doc_id long, text string",
        )
        assert cross_doc_span_stats(docs, w=8).count() == 3
        qb = spark.createDataFrame(
            [(0, 1.0, 3), (1, 0.5, 4)], "doc_id long, quality double, n_tokens long"
        )
        assert quality_budget_selection(qb, budget=5).count() == 2
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


def test_quality_budget_selection_greedy_prefix(spark):
    """The bucketed two-pass prefix sum must equal the naive global
    (quality DESC, id ASC) scan: selection is a strict greedy prefix of
    that order, including ties broken by id and docs straddling bucket
    boundaries."""
    from blogparser_spark.dataops.curation import quality_budget_selection

    rows = [
        # (id, quality, n_tokens) — includes a quality tie (3 vs 4) and
        # values on both sides of the 1/64-wide bucket boundaries
        (0, 1.0, 5),
        (1, 0.984375, 4),   # exactly (1-q)*64 = 1.0 -> bucket 1
        (2, 0.984374, 6),
        (3, 0.75, 3),
        (4, 0.75, 10),      # tie with 3 -> id order
        (5, 0.2, 2),
        (6, 0.0, 7),        # (1-q)*64 = 64 -> clamps to bucket 63
    ]
    df = spark.createDataFrame(rows, "doc_id long, quality double, n_tokens long")
    got = {
        r["doc_id"]: (r["tokens_before"], r["selected"])
        for r in quality_budget_selection(df, budget=18).collect()
    }
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    run = 0
    for i, q, n in order:
        assert got[i] == (run, 1 if run + n <= 18 else 0)
        run += n
    # greedy prefix: 0(5) 1(4) 2(6) -> 15, 3(+3)=18 fits, 4 overflows
    assert [i for i, (_, s) in sorted(got.items()) if s] == [0, 1, 2, 3]


# ------------------------------------------------- ES weighted sampling ---


def test_weighted_sample_deterministic_across_parallelism(spark):
    from blogparser_spark.dataops.curation import weighted_sample

    rows = [(i, 1 + (i % 10)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = weighted_sample(df.repartition(2), "w", 20).collect()
    b = weighted_sample(df.repartition(16), "w", 20).collect()
    assert [(r["doc_id"], r["es_key"]) for r in a] == [
        (r["doc_id"], r["es_key"]) for r in b
    ]
    assert len(a) == 20


def test_weighted_sample_drops_nonpositive_and_favors_heavy(spark):
    from blogparser_spark.dataops.curation import weighted_sample

    # ids 0-99 weight 1, ids 100-119 weight 1000, id 200 weight 0
    rows = [(i, 1) for i in range(100)] + [(i, 1000) for i in range(100, 120)] + [(200, 0)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample(df, "w", 20).collect()
    ids = [r["doc_id"] for r in got]
    assert 200 not in ids
    # with a 1000:1 weight ratio the heavy block should dominate the sample
    assert sum(1 for i in ids if 100 <= i < 120) >= 15


def test_weighted_sample_plan_is_take_ordered(spark):
    from blogparser_spark.dataops.curation import weighted_sample

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("w")
    )
    plan = (
        weighted_sample(df, "w", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # local top-n + driver merge, not a global sort shuffle
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_dataset_split_disjoint_stable_and_growth_invariant(spark):
    from blogparser_spark.dataops.curation import dataset_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dataset_split(docs)
    # exhaustive + disjoint by construction: one split value per row
    n = docs.count()
    assert out.count() == n
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # ~10% each with md5-uniform keys (loose bound at n=500)
    assert 0.04 * n < counts["val"] < 0.2 * n
    assert 0.04 * n < counts["test"] < 0.2 * n
    # growth-stable: assignments on a SUBSET are identical to the full run
    sub = dataset_split(docs.filter(F.col("doc_id") < 100))
    full = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    assert all(full[r["doc_id"]] == r["split"]
               for r in sub.select("doc_id", "split").collect())


def test_stratified_fixed_k_exact_counts_and_stability(spark):
    import hashlib

    from blogparser_spark.dataops.curation import stratified_fixed_k

    rows = [(i, ["en", "ja", "de"][i % 3]) for i in range(90)] + [
        (1000, "rare")  # group smaller than k
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = stratified_fixed_k(df, ["lang"], "doc_id", k=5).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert {g: len(v) for g, v in by_lang.items()} == {
        "en": 5, "ja": 5, "de": 5, "rare": 1
    }
    # python twin: k smallest md5("fixk:"||id) per group
    for lang in ("en", "ja", "de"):
        ids = [i for i, l in rows if l == lang]
        want = set(
            sorted(
                ids,
                key=lambda i: (hashlib.md5(f"fixk:{i}".encode()).hexdigest(), i),
            )[:5]
        )
        assert by_lang[lang] == want, lang
    # adding rows to ONE group leaves other groups byte-identical
    df2 = df.unionByName(
        spark.createDataFrame([(5000 + j, "en") for j in range(50)],
                              "doc_id long, lang string")
    )
    got2 = {}
    for r in stratified_fixed_k(df2, ["lang"], "doc_id", k=5).collect():
        got2.setdefault(r.lang, set()).add(r.doc_id)
    assert got2["ja"] == by_lang["ja"] and got2["de"] == by_lang["de"]


def test_chunk_documents_python_twin(spark):
    import math

    from blogparser_spark.dataops.curation import chunk_documents

    texts = {
        1: " ".join(f"w{i}" for i in range(150)),   # 150 toks -> 3+ chunks
        2: " ".join(f"x{i}" for i in range(64)),    # exactly one chunk
        3: "only three  tokens   here",             # short, multi-space
        4: " ".join(f"y{i}" for i in range(65)),    # one token past: 2 chunks
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, chunk_tokens=64, overlap=16).collect():
        got[(r.doc_id, r.chunk_idx)] = (r.start_tok, r.n_tokens, r.chunk_text)

    C, O, S = 64, 16, 48
    want = {}
    for d, text in texts.items():
        t = text.split()
        n = len(t)
        n_chunks = 1 if n <= C else math.ceil((n - C) / S) + 1
        for i in range(n_chunks):
            seg = t[i * S : i * S + C]
            want[(d, i)] = (i * S, len(seg), " ".join(seg))
    assert got == want
    # overlap property: consecutive chunks share exactly `overlap` tokens
    c0, c1 = got[(1, 0)][2].split(), got[(1, 1)][2].split()
    assert c0[-16:] == c1[:16]
    # full coverage: union of chunk tokens (dedup by position) == doc tokens
    assert {(1, i) in got for i in range(3)} == {True}


def test_temperature_rates_df_matches_dict_twin(spark):
    from blogparser_spark.dataops.curation import (
        temperature_rates,
        temperature_rates_df,
    )

    langs = ["en"] * 8 + ["ja"] * 3 + ["de"]
    rows = [langs[i % 12] for i in range(240)]
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(rows)], "doc_id long, lang string"
    )
    want = temperature_rates(df, "lang", alpha=0.5)
    got = {
        r.strata: (r.n_rows, r.keep_rate, r.expected_kept)
        for r in temperature_rates_df(df, "lang", alpha=0.5).collect()
    }
    import math

    counts = {}
    for l in rows:
        counts[l] = counts.get(l, 0) + 1
    for s, rate in want.items():
        n, kr, ek = got[s]
        assert n == counts[s]
        assert kr == round(min(1.0, rate), 6)
        # expected_kept uses the UNROUNDED rate (more accurate than kr * n)
        assert ek == round(min(1.0, rate) * n, 6)
    # the smallest stratum keeps everything
    smallest = min(counts, key=counts.get)
    assert got[smallest][1] == 1.0


def test_dsir_importance_prefers_target_like_docs(spark):
    import math

    from blogparser_spark.dataops.curation import (
        dsir_bucket_counts,
        dsir_importance,
        dsir_log_ratios,
    )

    # target domain: python-flavored text; raw corpus: half python, half cooking
    target = spark.createDataFrame(
        [(i, "def spark job runs fast python code") for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "def spark job runs fast python code"),
         (2, "python code def spark job runs fast"),
         (3, "bake the cake with sugar and butter"),
         (4, "butter sugar cake bake slowly in oven")],
        "doc_id long, text string",
    )
    lr = dsir_log_ratios(target, raw, n_buckets=64)
    lrc = lr.collect()
    assert len(lrc) == 64  # full spine, absent buckets included for smoothing
    out = {r["doc_id"]: r for r in dsir_importance(raw, lr, n_buckets=64).collect()}
    # python docs must outscore cooking docs under the python target
    assert min(out[1]["logw"], out[2]["logw"]) > max(out[3]["logw"], out[4]["logw"])
    # integer micro-sum is the exact source; logw is its round-6 view
    for r in out.values():
        assert abs(r["logw"] - round(r["logw_micro"] / 1e6, 6)) < 1e-9

    # log-ratio replay: one bucket checked against the closed form
    t_tot = sum(r["tc"] for r in lrc)
    r_tot = sum(r["rc"] for r in lrc)
    b0 = lrc[0]
    expect = round(
        (math.log((b0["tc"] + 1) / (t_tot + 64))
         - math.log((b0["rc"] + 1) / (r_tot + 64))) * 1e6
    )
    assert b0["lr_micro"] == expect

    # dim join must broadcast — the corpus never shuffles on text
    plan = (
        dsir_importance(raw, lr, n_buckets=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan

    # bucket counts are occurrence counts: 7 unigrams + 6 bigrams per doc
    total = sum(r["cnt"] for r in dsir_bucket_counts(raw, n_buckets=64).collect())
    assert total == 4 * (7 + 6)


def test_chunk_documents_uses_canonical_tokenizer(spark):
    # chunk token counts must agree with textstats.tokens (TOKEN_SPLIT),
    # not a private \s+ split — tabs/newlines stay inside a token on both
    from blogparser_spark.dataops.curation import chunk_documents
    from blogparser_spark.dataops.textstats import tokens

    df = spark.createDataFrame(
        [(1, "a\tb " + " ".join(f"w{i}" for i in range(9)))], "doc_id long, text string"
    )
    n_tok = df.select(F.size(tokens(F.col("text"))).alias("n")).collect()[0].n
    chunks = chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    assert n_tok == 10  # 'a\tb' is ONE canonical token
    assert sum(c.n_tokens for c in chunks) >= n_tok  # overlap double-counts
    assert chunks[0].chunk_text.startswith("a\tb ")


def test_conv_role_grammar(spark):
    from blogparser_spark.dataops.curation import conv_role_grammar

    rows = [
        # c1: well-formed — opens system, no repeats, tool follows assistant
        ("c1", 0, "system"), ("c1", 1, "user"), ("c1", 2, "assistant"),
        ("c1", 3, "tool"),
        # c2: opens assistant + a same-role run; its tool follows assistant
        ("c2", 0, "assistant"), ("c2", 1, "assistant"), ("c2", 2, "tool"),
        # c3: orphan tool (follows user) and an orphan opening tool in c4
        ("c3", 0, "user"), ("c3", 1, "tool"),
        ("c4", 0, "tool"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    out = {r["conv_id"]: r for r in conv_role_grammar(df).collect()}
    c1 = out["c1"]
    assert (c1["n_turns"], c1["first_role"], c1["last_role"]) == (4, "system", "tool")
    assert c1["n_same_role_runs"] == 0 and c1["n_orphan_tool_turns"] == 0
    assert c1["is_valid"] is True
    c2 = out["c2"]
    assert c2["n_same_role_runs"] == 1 and c2["n_orphan_tool_turns"] == 0
    assert c2["is_valid"] is False  # opens with assistant
    assert out["c3"]["n_orphan_tool_turns"] == 1 and out["c3"]["is_valid"] is False
    c4 = out["c4"]  # a lone tool turn: orphan via NULL prev
    assert c4["n_orphan_tool_turns"] == 1 and c4["first_role"] == "tool"


def test_conv_budget_truncate_and_stats(spark):
    from blogparser_spark.dataops.curation import (
        conv_budget_stats,
        conv_budget_truncate,
    )

    rows = [
        ("c1", 0, "a b c"),        # 3 tokens, cum 3
        ("c1", 1, "d e f g"),      # 4 tokens, cum 7
        ("c1", 2, "h i j k l"),    # 5 tokens, cum 12 > 8 → dropped
        ("c2", 0, "x y"),          # fits whole
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    kept = conv_budget_truncate(df, budget_tokens=8).collect()
    got = sorted((r["conv_id"], r["turn_idx"], r["cum_tokens"]) for r in kept)
    assert got == [("c1", 0, 3), ("c1", 1, 7), ("c2", 0, 2)]
    stats = {r["conv_id"]: r for r in conv_budget_stats(df, budget_tokens=8).collect()}
    c1 = stats["c1"]
    assert (c1["n_turns"], c1["n_tokens"], c1["n_turns_kept"], c1["n_tokens_kept"]) == (
        3, 12, 2, 7,
    )
    assert c1["truncated"] is True
    assert stats["c2"]["truncated"] is False
    assert stats["c2"]["n_tokens_kept"] == 2


def test_conv_sft_stats_byte_semantics(spark):
    from blogparser_spark.dataops.curation import conv_sft_stats

    rows = [
        ("c1", 0, "user", "あい", "none"),       # 6 BYTES (multibyte), 2 chars
        ("c1", 1, "assistant", "abcd", "search"),  # 4 bytes
        ("c1", 2, "system", "sys", "none"),
        ("c2", 0, "assistant", "zz", "none"),      # no user turn → NULL ratio
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    out = {r["conv_id"]: r for r in conv_sft_stats(df).collect()}
    c1 = out["c1"]
    assert (c1["n_user"], c1["n_assistant"], c1["n_tool_turns"]) == (1, 1, 1)
    assert (c1["user_bytes"], c1["assistant_bytes"]) == (6, 4)  # octet, not chars
    assert c1["assistant_user_ratio"] == round(4 / 6, 6)
    assert out["c2"]["assistant_user_ratio"] is None  # no division by zero


def test_bm25_retrieval_exact_scores(spark):
    import math

    from blogparser_spark.dataops.lm import bm25_retrieval

    docs = spark.createDataFrame(
        [
            (1, "hash join hash"),
            (2, "join vector"),
            (3, "scan table"),
        ],
        "doc_id long, text string",
    )
    out = bm25_retrieval(docs, ["hash", "join"], top_k=10).collect()

    # independent recomputation of the Robertson/Lucene formula
    def term_u(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        tfp = (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
        return int(round(round(idf * tfp, 6) * 1e6))

    n, avgdl = 3, (3 + 2 + 2) / 3
    want = {
        1: (2, term_u(2, 1, n, 3, avgdl) + term_u(1, 2, n, 3, avgdl)),
        2: (1, term_u(1, 2, n, 2, avgdl)),  # only "join" is queried
    }
    got = {r["doc_id"]: (r["n_terms_hit"], r["score_u"]) for r in out}
    assert got == want
    # ordering: score desc, id asc
    assert [r["doc_id"] for r in out] == sorted(
        want, key=lambda d: (-want[d][1], d)
    )


def test_preference_pairs(spark):
    from blogparser_spark.dataops.curation import preference_pairs

    rows = [
        ("g1", 1, 0.9), ("g1", 2, 0.3), ("g1", 3, 0.6),   # pair (1, 2)
        ("g2", 4, 0.5), ("g2", 5, 0.5),                     # zero gap → dropped
        ("g3", 6, 0.8),                                     # singleton → dropped
        ("g4", 7, 0.2), ("g4", 8, 0.2), ("g4", 9, 0.7),    # tie on min: lowest id
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, quality double")
    out = {r["source"]: r for r in preference_pairs(df).collect()}
    assert set(out) == {"g1", "g4"}
    g1 = out["g1"]
    assert (g1["chosen_id"], g1["rejected_id"], g1["n_candidates"]) == (1, 2, 3)
    assert g1["score_gap"] == round(0.9 - 0.3, 6)
    g4 = out["g4"]  # rejected tie (7, 8 both 0.2) → deterministic lowest id
    assert (g4["chosen_id"], g4["rejected_id"]) == (9, 7)


def test_sft_pairs_adjacency(spark):
    from blogparser_spark.dataops.curation import sft_pairs

    rows = [
        ("c1", 0, "user", "hi"),          # → paired with turn 1
        ("c1", 1, "assistant", "hello!"),
        ("c1", 2, "user", "q2"),          # followed by tool → NO pair
        ("c1", 3, "tool", "result"),
        ("c1", 4, "assistant", "a2"),     # assistant not preceded by user
        ("c1", 5, "user", "trailing"),    # last turn → NO pair
        ("c2", 0, "user", "あい"),         # multibyte prompt, 6 bytes
        ("c2", 1, "assistant", "ok"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["prompt_bytes"], r["response_bytes"])
        for r in sft_pairs(df).collect()
    )
    assert got == [("c1", 0, 2, 6), ("c2", 0, 6, 2)]


def test_domain_cap_deterministic(spark):
    from blogparser_spark.dataops.curation import domain_cap

    rows = [(f"s{i % 3}", i) for i in range(60)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    a = domain_cap(df, cap=5)
    kept1 = sorted(r["doc_id"] for r in a.filter("kept").collect())
    kept2 = sorted(
        r["doc_id"] for r in domain_cap(df, cap=5).filter("kept").collect()
    )
    assert kept1 == kept2 and len(kept1) == 15  # 3 domains × cap 5
    # each domain contributes exactly cap rows; ranks are 1..n per domain
    per = domain_cap(df, cap=5).groupBy("source").agg(
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("k"),
        F.max("domain_rank").alias("mx"),
    )
    assert all(r["k"] == 5 and r["mx"] == 20 for r in per.collect())
    # a domain smaller than the cap keeps everything
    small = spark.createDataFrame([("tiny", 1), ("tiny", 2)], "source string, doc_id long")
    assert domain_cap(small, cap=5).filter("kept").count() == 2


def test_padding_efficiency(spark):
    from blogparser_spark.dataops.curation import padding_efficiency

    # 5 docs in one length bucket (width 100 → bucket 0), batch size 2:
    # batches in (len, id) order: [3,4], [5,7], [9]
    rows = [
        (1, "w " * 3), (2, "w " * 4), (3, "w " * 5), (4, "w " * 7),
        (5, "w " * 9),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["batch_id"]: r
        for r in padding_efficiency(df, batch_size=2, bucket_width=100).collect()
    }
    assert out[0]["max_len"] == 4 and out[0]["pad_tokens"] == 1  # 2*4-7
    assert out[1]["max_len"] == 7 and out[1]["pad_tokens"] == 2  # 2*7-12
    assert out[2]["n_rows"] == 1 and out[2]["pad_tokens"] == 0   # lone row
    assert out[1]["pad_frac"] == round(2 / 14, 6)


def test_rank_fusion_rrf(spark):
    from blogparser_spark.dataops.lm import rank_fusion_rrf

    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 5.0), (4, 4.0), (1, 3.0)], "doc_id long, score double"
    )
    out = {r["doc_id"]: r for r in rank_fusion_rrf(a, b, n=10).collect()}
    assert set(out) == {1, 2, 3, 4}

    def u(rank):
        return round(round(1.0 / (60 + rank), 6) * 1e6)

    assert out[1]["rrf_u"] == u(1) + u(3)  # rank 1 in a, rank 3 in b
    assert out[3]["rrf_u"] == u(3) + u(1)
    assert out[2]["rrf_u"] == u(2)  # only in list a
    assert out[4]["rrf_u"] == u(2)  # only in list b
    assert out[2]["rank_b"] is None and out[4]["rank_a"] is None
    # doc in both lists beats single-list docs of comparable rank
    assert out[1]["rrf_u"] > out[2]["rrf_u"]


def test_contrastive_chunk_pairs(spark):
    from blogparser_spark.dataops.curation import (
        chunk_documents,
        contrastive_chunk_pairs,
    )

    # 100 tokens → chunks at 0 and 48 (64/16 chunker): exactly one pair
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100))), (2, "short doc only")],
        "doc_id long, text string",
    )
    ch = chunk_documents(docs, chunk_tokens=64, overlap=16)
    out = contrastive_chunk_pairs(ch).collect()
    assert len(out) == 1  # single-chunk doc 2 yields no pair
    r = out[0]
    assert r["doc_id"] == 1 and r["anchor_idx"] == 0
    assert r["anchor_bytes"] > 0 and r["positive_bytes"] > 0
    assert len(r["pair_fp"]) == 16
    # the pair shares the 16-token overlap: both texts contain w48..w63
    texts = {c["chunk_idx"]: c["chunk_text"] for c in ch.filter("doc_id = 1").collect()}
    assert texts[0].split()[48:] == texts[1].split()[:16]


def test_matryoshka_energy(spark):
    from blogparser_spark.dataops.similarity import matryoshka_energy

    # vector with ALL energy in the first 4 dims vs spread evenly
    front = [2.0, 2.0, 2.0, 2.0] + [0.0] * 12
    flat = [1.0] * 16
    df = spark.createDataFrame(
        [(1, front), (2, flat)], "vec_id long, embedding array<float>"
    )
    out = {r["vec_id"]: r for r in matryoshka_energy(df, dims=(4, 8)).collect()}
    assert out[1]["energy_frac_4"] == 1.0 and out[1]["energy_frac_8"] == 1.0
    assert out[2]["energy_frac_4"] == 0.25 and out[2]["energy_frac_8"] == 0.5
    assert out[1]["energy_total"] == 16.0 and out[2]["n_dims"] == 16


def test_keyword_tags(spark):
    from blogparser_spark.dataops.textstats import keyword_tags

    docs = spark.createDataFrame(
        [
            (1, "Hash JOIN hash again"),   # case-folded, dup keyword
            (2, "nothing matches here"),
            (3, "stream processing stream stream"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in keyword_tags(
            docs, {"hash": "indexing", "join": "relational", "stream": "streaming"}
        ).collect()
    }
    assert set(out) == {1, 3}  # unmatched docs absent
    assert out[1]["n_keyword_hits"] == 3
    assert out[1]["tags"] == "indexing,relational"  # sorted, distinct
    assert out[3]["tags"] == "streaming" and out[3]["n_keyword_hits"] == 3


def test_span_corruption_plan(spark):
    from blogparser_spark.dataops.curation import span_corruption_plan

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(100))),  # 100 tokens → 5 spans
            (2, "a b c"),                                 # 3 tokens → 1 span
            (3, "x y"),                                   # < mean_span → absent
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_corruption_plan(docs).collect()}
    assert set(out) == {1, 2}
    d1 = out[1]
    assert d1["n_spans"] == 5  # round(100 * 0.15 / 3)
    # spans are 2-4 long, overlaps merge, clipped at doc end
    assert 5 * 2 <= d1["n_masked"] <= 5 * 4
    assert d1["mask_frac"] == round(d1["n_masked"] / 100, 6)
    d2 = out[2]
    assert d2["n_spans"] == 1 and 2 <= d2["n_masked"] <= 3  # clipped at 3
    # determinism: identical plan on rerun
    again = {r["doc_id"]: r["n_masked"] for r in span_corruption_plan(docs).collect()}
    assert again == {k: v["n_masked"] for k, v in out.items()}


def test_group_advantage(spark):
    import math

    from blogparser_spark.dataops.curation import group_advantage

    rows = [
        ("g1", 1, 1.0), ("g1", 2, 2.0), ("g1", 3, 3.0),  # mean 2, pop std
        ("g2", 4, 5.0), ("g2", 5, 5.0),                    # zero variance
        ("g3", 6, 7.0),                                     # singleton
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, quality double")
    out = {r["doc_id"]: r["advantage"] for r in group_advantage(df).collect()}
    std = math.sqrt(2 / 3)  # population std of [1,2,3]
    assert out[1] == round(-1 / std, 6) and out[3] == round(1 / std, 6)
    assert out[2] == 0.0
    assert out[4] == 0.0 and out[5] == 0.0  # zero variance → 0
    assert out[6] == 0.0  # singleton → 0


def test_sft_loss_mask_stats(spark):
    from blogparser_spark.dataops.curation import sft_loss_mask_stats

    rows = [
        ("c1", "user", "one two three four"),     # 4 context tokens
        ("c1", "assistant", "five six"),           # 2 trainable
        ("c1", "tool", "seven"),                   # masked
        ("c2", "user", "only prompts here"),       # nothing trainable
    ]
    df = spark.createDataFrame(rows, "conv_id string, role string, text string")
    out = {r["conv_id"]: r for r in sft_loss_mask_stats(df).collect()}
    c1 = out["c1"]
    assert (c1["n_tokens_total"], c1["n_tokens_trainable"]) == (7, 2)
    assert c1["trainable_frac"] == round(2 / 7, 6)
    assert out["c2"]["n_tokens_trainable"] == 0 and out["c2"]["trainable_frac"] == 0.0


def test_span_corruption_mean_span_one_never_masks_backwards(spark):
    from blogparser_spark.dataops.curation import span_corruption_plan

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(30)))], "doc_id long, text string"
    )
    out = span_corruption_plan(docs, mean_span=1).collect()[0]
    # lengths clamp to >= 1: each span masks at least its anchor, never a
    # negative position, so n_masked stays within [n_spans, 3 * n_spans]
    assert out["n_spans"] <= out["n_masked"] <= 3 * out["n_spans"]
    assert out["n_masked"] <= out["n_tokens"]


def test_denoiser_mix_plan(spark):
    from blogparser_spark.dataops.curation import denoiser_mix_plan

    df = spark.createDataFrame(
        [(i, "w " * 40) for i in range(300)], "doc_id long, text string"
    )
    rows = denoiser_mix_plan(df).collect()
    by_den = {}
    for r in rows:
        by_den.setdefault(r["denoiser"], []).append(r)
    # all three regimes drawn; X (weight .5) dominates
    assert set(by_den) == {"R", "S", "X"}
    assert len(by_den["X"]) > len(by_den["R"]) and len(by_den["X"]) > len(by_den["S"])
    for r in rows:
        want_rate = {"R": 0.15, "S": 0.25, "X": 0.5}[r["denoiser"]]
        assert r["corruption_rate"] == want_rate
        assert r["n_targets"] == round(40 * want_rate)
    # deterministic across reruns
    again = {r["doc_id"]: r["denoiser"] for r in denoiser_mix_plan(df).collect()}
    assert again == {r["doc_id"]: r["denoiser"] for r in rows}


def test_bpe_learn_merges_matches_python_twin(spark):
    from collections import Counter

    from blogparser_spark.dataops.lm import bpe_learn_merges

    texts = ["low lower lowest low low", "new newer newest new", "low new"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    # pure-Python BPE twin (Sennrich-style, word-frequency weighted,
    # deterministic (weight desc, l, r) argmax)
    words = Counter(w for t in texts for w in t.lower().split())
    vocab = {w: list(w) for w in words}

    def twin(n):
        out = []
        for _ in range(n):
            pc = Counter()
            for w, syms in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += words[w]
            if not pc:
                break
            (l, r), wt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((l, r, wt))
            for w, syms in vocab.items():
                res = []
                for x in syms:
                    if res and res[-1] == l and x == r:
                        res[-1] = l + r
                    else:
                        res.append(x)
                vocab[w] = res
        return out

    got = bpe_learn_merges(df, n_merges=4)
    assert got == twin(4)
    assert len(got) == 4 and all(w > 0 for _, _, w in got)
    # the first merge must be a pair from 'low'/'new' stems (highest mass)
    assert got[0][2] >= got[1][2] >= got[2][2] >= got[3][2]


def test_bpe_incremental_matches_classic_and_shrinks_scans(spark):
    """The delta-maintained learner must produce IDENTICAL merges
    (including tie-breaks) to the per-round-recount learner, while each
    round's pair recount touches only the affected-candidate subset of
    the dictionary — the observe() metric proves the O(vocab)-per-round
    scan is gone."""
    from blogparser_spark.dataops.lm import (
        bpe_learn_merges,
        bpe_learn_merges_incremental,
    )

    texts = [
        "low low low lower lowest newer newest wider wide new",
        "apple apply appalling zebra zone quiz jazz fuzz",
        "banana bandana cabana can ban nan anna",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    classic = bpe_learn_merges(df, 8)
    stats: list[dict] = []
    inc = bpe_learn_merges_incremental(df, 8, round_stats=stats)
    assert inc == classic and len(inc) == 8

    n_vocab = (
        df.selectExpr("explode(split(lower(text), ' ')) AS w")
        .filter("w != ''")
        .distinct()
        .count()
    )
    # every round's delta recount covers strictly less than the dictionary
    assert all(0 < s["n_affected"] < n_vocab for s in stats)
    assert max(s["n_affected"] for s in stats) <= n_vocab // 2

    # exhaustion: single-char words only → no pairs → empty merge list
    tiny = spark.createDataFrame([("a b c",)], "text string")
    assert bpe_learn_merges_incremental(tiny, 3) == []


def test_bpe_encode_fast_equals_sequential(spark):
    """Min-rank single-pass encode (bpe_encode_fast) must equal the
    sequential per-merge fold (bpe_encode) on a well-formed learned list
    — the classic BPE equivalence — including words untouched by any
    merge and the empty/one-char edge."""
    from blogparser_spark.dataops.lm import (
        bpe_encode,
        bpe_encode_fast,
        bpe_learn_merges,
        word_freq_dict,
    )

    texts = [
        "low low low lower lowest newer newest wider wide new",
        "banana bandana cabana can ban nan anna a",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = bpe_learn_merges(df, 10)
    assert len(merges) == 10
    wd = word_freq_dict(df)
    sym = wd.select("word", F.split("word", "").alias("s"))
    slow = {r["word"]: list(r["s"]) for r in bpe_encode(sym, merges).collect()}
    fast = {
        r["word"]: list(r["s"]) for r in bpe_encode_fast(sym, merges).collect()
    }
    assert fast == slow
    # at least one word actually merged into a multi-char symbol
    assert any(len(t) > 1 for toks in fast.values() for t in toks)


def test_conv_packing_curve_consistency(spark):
    """The curve query must agree with conv_budget_stats at each budget."""
    import blogparser_spark.queries as Q
    from blogparser_spark.dataops.curation import conv_budget_stats

    sf = "/root/testdata/sf0.001"
    curve = {r["budget"]: r for r in Q.QUERIES["conv_packing_curve"](spark, sf).collect()}
    assert set(curve) == {500, 1000, 2000, 4000}
    t = Q.documents_as_transcripts(spark, sf)
    for b in (500, 2000):
        stats = conv_budget_stats(t, budget_tokens=b).collect()
        assert curve[b]["turns_kept"] == sum(r["n_turns_kept"] for r in stats)
        assert curve[b]["tokens_kept"] == sum(r["n_tokens_kept"] for r in stats)
        assert curve[b]["convs_fully_kept"] == sum(
            1 for r in stats if not r["truncated"]
        )
    # monotone: larger budget never keeps fewer tokens
    assert (
        curve[500]["tokens_kept"]
        <= curve[1000]["tokens_kept"]
        <= curve[2000]["tokens_kept"]
        <= curve[4000]["tokens_kept"]
    )


def test_bpe_encode_and_fertility(spark):
    from blogparser_spark.dataops.lm import (
        bpe_encode,
        bpe_fertility,
        bpe_learn_merges,
        word_freq_dict,
    )

    texts = ["low low low lower lowest", "new newer newest"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_learn_merges(df, n_merges=3)
    assert len(merges) == 3

    # encode twin: apply merges greedily in order, word by word
    def enc_twin(word):
        syms = list(word)
        for l, r, _ in merges:
            res = []
            for x in syms:
                if res and res[-1] == l and x == r:
                    res[-1] = l + r
                else:
                    res.append(x)
            syms = res
        return syms

    sym = word_freq_dict(df).select("word", "cnt", F.split("word", "").alias("s"))
    got = {r["word"]: list(r["s"]) for r in bpe_encode(sym, merges).collect()}
    assert got == {w: enc_twin(w) for w in got}
    assert any(len(v) < len(w) for w, v in got.items())  # merges actually fired

    # fertility falls as merges accumulate; chars/token rises
    f0 = bpe_fertility(df, [])
    f3 = bpe_fertility(df, merges)
    assert f3["tokens_per_word"] < f0["tokens_per_word"]
    assert f3["chars_per_token"] > f0["chars_per_token"]
    assert f0["chars_per_token"] == 1.0  # no merges = one char per token


def test_bpe_fertility_empty_corpus(spark):
    from blogparser_spark.dataops.lm import bpe_fertility

    empty = spark.createDataFrame([], "doc_id long, text string")
    blank = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
    for df in (empty, blank):
        f = bpe_fertility(df, [])
        assert f["n_token_occurrences"] == 0
        assert f["tokens_per_word"] == 0.0


def test_linear_probe_gd_learns_and_is_exact(spark):
    """The integer-GD linear probe must (a) reduce squared training loss
    round over round, (b) separate the classes (mean score of positive
    docs above negative), and (c) match a pure-Python twin bit-for-bit
    (same integer-micro arithmetic)."""
    import math

    from blogparser_spark.dataops.curation import (
        linear_probe_gd,
        linear_probe_score,
    )

    rows = [
        (i, ("good join fast join " if i % 3 == 0 else "slow scan noise ") * 3
         + "word%d" % i)
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    label = F.col("text").contains("join")

    # python twin over the same hashed features
    import hashlib

    def bucket(tok, nb=16):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % nb

    feats, ys = {}, {}
    for i, t in rows:
        ys[i] = 1 if "join" in t else 0
        f: dict[int, int] = {16: 1}
        for tok in t.lower().split():
            if tok:
                b = bucket(tok)
                f[b] = f.get(b, 0) + 1
        feats[i] = f
    lr_den = float(sum(c * c for f in feats.values() for c in f.values()))

    def run_twin(iters):
        w = {b: 0 for b in range(17)}
        losses = []
        for _ in range(iters):
            g = {b: 0 for b in range(17)}
            loss = 0.0
            for i, f in feats.items():
                m_u = sum(w[b] * c for b, c in f.items())
                r_u = m_u - ys[i] * 1_000_000
                loss += (r_u / 1e6) ** 2
                for b, c in f.items():
                    g[b] += r_u * c
            losses.append(loss)
            for b in range(17):
                w[b] -= math.floor(g[b] / lr_den + 0.5)
        return w, losses

    w2, losses = run_twin(2)
    _, losses3 = run_twin(3)
    assert losses3[1] < losses3[0] and losses3[2] < losses3[1]

    got = {r["bucket"]: r["w_u"] for r in linear_probe_gd(docs, label, iters=2).collect()}
    assert got == w2

    # the trained scorer separates the classes
    wdf = spark.createDataFrame(sorted(w2.items()), "bucket int, w_u bigint")
    scores = {r["doc_id"]: r["score_u"] for r in linear_probe_score(docs, wdf).collect()}
    pos = [scores[i] for i in scores if ys[i] == 1]
    neg = [scores[i] for i in scores if ys[i] == 0]
    assert sum(pos) / len(pos) > sum(neg) / len(neg)
