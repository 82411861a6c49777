"""Bigram language-model quality scoring — the CCNet idea (Wenzek et al.,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl Data",
LREC 2020: train a small LM, keep low-perplexity documents) with the LM
itself trained distributed ON the corpus, so no external model artifact is
needed and every number is reproducible from the input table.

Model: add-one-smoothed bigram probabilities
    P(w2 | w1) = (c(w1,w2) + 1) / (c(w1·) + V)
where c(w1·) is the CONTEXT count (bigrams starting with w1 — derivable
from the bigram table itself, no second scan) and V the token vocabulary.
A document's score is the mean log-probability of its bigrams; perplexity
is exp(-mean).

Shape / scale (the repetition_signals pattern, CLAUDE.md rule 1):
  - bigrams are built relationally — posexplode once, lead() over the
    per-doc window (range-partitioned on the id BEFORE the fan-out, rule
    4), never an array HOF;
  - counting is two partial hash aggs: (w1, w2) then w1 — shuffle keyed on
    bigram vocabulary, not token volume;
  - scoring joins the count tables back BROADCAST (a web-scale bigram
    table above the broadcast threshold would bucket-join on w1 instead —
    the tables are still corpus-vocabulary-sized, orders of magnitude
    below token volume) and partial-aggregates straight back to one row
    per doc.

Determinism / oracle portability: counts are exact ints; each bigram's
log-probability is a function of three ints rounded to 6 decimals; the
per-doc mean and perplexity round to 6 (module convention — functions of
exact integers, round-6 absorbs libm ulp skew between engines).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from blogparser_spark.dataops.textstats import tokens


def doc_token_stream(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos, w) lowercase token stream, range-partitioned on the id so
    the downstream per-doc window reuses the exchange (rule 4: a
    single-file scan's fan-out must not inherit 1 partition)."""
    from blogparser_spark.operators.skew import range_partition_for_windows

    parts = df.sparkSession.sparkContext.defaultParallelism
    return range_partition_for_windows(df, parts, id_col).select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "w"),
    )


def doc_bigrams(stream: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, w1, w2) one row per bigram occurrence via lead() over the
    per-doc window — relational, codegen-native, no array HOF."""
    win = Window.partitionBy(id_col).orderBy("pos")
    return (
        stream.select(
            F.col(id_col),
            F.col("w").alias("w1"),
            F.lead("w").over(win).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )


def bigram_lm(bigrams: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Train: (w1, w2, cnt2) and the context table (w1, cnt1) where cnt1 =
    Σ_w2 cnt2 — derived from the bigram counts, no extra corpus scan. Both
    are partial hash aggs keyed on (bigram) vocabulary."""
    c2 = bigrams.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("cnt2"))
    c1 = c2.groupBy("w1").agg(F.sum("cnt2").cast("bigint").alias("cnt1"))
    return c2, c1


def score_with_lm(
    bigrams: DataFrame,
    c2: DataFrame,
    c1: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc mean bigram log-probability against a trained LM. LEFT
    joins + coalesce(0) so documents with bigrams/contexts UNSEEN at
    training time still score (the add-one smoothing is exactly what makes
    that finite) — the path a held-out corpus takes. `vocab` is a one-row
    (vocab bigint) DataFrame riding in broadcast."""
    lp = F.round(
        F.log(
            (F.coalesce(F.col("cnt2"), F.lit(0)) + F.lit(1)).cast("double")
            / (F.coalesce(F.col("cnt1"), F.lit(0)) + F.col("vocab")).cast("double")
        ),
        6,
    )
    return (
        bigrams.join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(c1), ["w1"], "left")
        .join(F.broadcast(vocab))
        .select(F.col(id_col), lp.alias("lp"))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
            F.round(F.exp(-F.avg("lp")), 6).alias("ppl"),
        )
    )


def lm_quality_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Self-scored corpus: train the bigram LM on `df` and score every
    document of `df` against it (the CCNet in-domain calibration run).
    Returns (id, n_bigrams, avg_logprob, ppl); docs with < 2 tokens have
    no bigrams and are absent (nothing to score)."""
    stream = doc_token_stream(df, text_col, id_col)
    bg = doc_bigrams(stream, id_col)
    c2, c1 = bigram_lm(bg)
    vocab = stream.agg(F.countDistinct("w").cast("bigint").alias("vocab"))
    return score_with_lm(bg, c2, c1, vocab, id_col)


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_retrieval(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Corpus-level BM25 document retrieval for a fixed query-term set —
    the search-index primitive (Robertson idf: ln(1 + (N-df+0.5)/(df+0.5)),
    Lucene's non-negative variant) as one relational plan. This is the
    DOCUMENT-retrieval sibling of summary_bm25's sentence scorer
    (parser/summary.go:28-60 semantics, corpus-scoped instead of
    doc-scoped).

    Scale shape:
      - doc length is a per-row F.size — no explode for dl;
      - only tokens IN the query set survive the explode (the filter sits
        directly on the generator output, so the shuffled volume is
        |hits|, not token volume);
      - tf = one partial hash agg on (doc, term); df = a second agg over
        the tf table (term cardinality ≤ |query|, trivially broadcast
        back);
      - corpus N / avgdl ride a 1-row broadcast;
      - top-k is TakeOrdered (global sort never materializes).

    Determinism: each (doc, term) score is a function of four exact ints
    (tf, df, N, dl) and avgdl; round-6 then integer-quantize (×1e6) per
    term so the per-doc sum is order-independent and engine-exact
    (module convention). Returns (doc_id, n_terms_hit, score_u) with
    score_u = sum of per-term micro-scores."""
    # tokenize ONCE per row per scan (the chunk_documents pattern): later
    # projections reference the materialized `_t` column instead of
    # re-running the interpreted filter-HOF tokenizer per expression
    base = docs.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("_t")
    ).select(F.col(id_col), F.size("_t").alias("dl"), F.col("_t"))
    stats = base.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    # dl rides each hit row through the explode (dl is functionally
    # dependent on the doc id, so grouping on it is free) — no second
    # corpus-sized join just to re-attach document length
    hits = base.select(
        F.col(id_col), F.col("dl"), F.explode("_t").alias("term")
    ).filter(F.col("term").isin(*query_terms))
    tf = hits.groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").join(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    term_u = F.round(F.round(idf * tf_part, 6) * 1e6, 0).cast("bigint")
    return (
        scored.select(F.col(id_col), term_u.alias("_u"))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_terms_hit"),
            F.sum("_u").cast("bigint").alias("score_u"),
        )
        .orderBy(F.desc("score_u"), F.asc(id_col))
        .limit(top_k)
    )


RRF_K = 60  # Cormack et al. 2009 reciprocal-rank-fusion constant


def rank_fusion_rrf(
    scored_a: DataFrame,
    scored_b: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    n: int = 100,
    k: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of
    two ranked shortlists: rrf(d) = Σ_lists 1/(k + rank_d), the standard
    way to merge retrieval signals (e.g. BM25 and embedding similarity)
    without score calibration. Each input is (id, score), higher = better.

    Scale: each list is first cut to its top-n via orderBy+limit —
    TakeOrderedAndProject, a per-partition local top-n + n-row merge,
    never a global sort — so the rank windows that follow run over
    BOUNDED ≤n-row frames (whitelisted single-partition windows, bounded
    by construction like zipf_token_slope). The fusion join is between
    two ≤n-row sides. micro-quantized rrf so cross-engine sums are
    exact."""

    def ranked(df: DataFrame, tag: str) -> DataFrame:
        top = df.select(
            F.col(id_col), F.col(score_col).alias("_s")
        ).orderBy(F.desc("_s"), F.asc(id_col)).limit(n)
        w = Window.orderBy(F.desc("_s"), F.asc(id_col))
        return top.select(
            F.col(id_col), F.row_number().over(w).alias(f"rank_{tag}")
        )
    a, b = ranked(scored_a, "a"), ranked(scored_b, "b")
    fused = a.join(b, id_col, "full_outer")
    contrib_a = F.when(
        F.col("rank_a").isNotNull(),
        F.round(F.lit(1.0) / (k + F.col("rank_a")), 6) * 1e6,
    ).otherwise(0)
    contrib_b = F.when(
        F.col("rank_b").isNotNull(),
        F.round(F.lit(1.0) / (k + F.col("rank_b")), 6) * 1e6,
    ).otherwise(0)
    return fused.select(
        id_col,
        "rank_a",
        "rank_b",
        F.round(contrib_a + contrib_b, 0).cast("bigint").alias("rrf_u"),
    ).orderBy(F.desc("rrf_u"), F.asc(id_col))


def word_freq_dict(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) frequency dictionary — the classic BPE training input:
    corpus-scale token volume collapses to a VOCABULARY-scale table in one
    partial hash agg, and everything downstream (pair counting, merge
    application) operates on the dictionary weighted by cnt, never on the
    corpus again. This reduction is what makes distributed BPE cheap."""
    return (
        docs.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def _adjacent_pairs(sym_col):
    """array<string> → array<struct(l, r)> of adjacent symbol pairs."""
    n = F.size(sym_col)
    return F.arrays_zip(
        F.slice(sym_col, 1, n - 1).alias("l"),
        F.slice(sym_col, 2, n - 1).alias("r"),
    )


def _pair_weights(sym: DataFrame) -> DataFrame:
    """(cnt, s) symbol dictionary → (l, r, weight) adjacent-pair counts,
    ordered by (weight desc, l, r) — the ONE definition of the BPE
    pair-ranking rule, shared by the reported statistics
    (bpe_pair_counts) and the learner's per-round argmax so the two can
    never disagree on which pair wins."""
    pairs = sym.filter(F.size("s") >= 2).select(
        "cnt", F.explode(_adjacent_pairs(F.col("s"))).alias("p")
    )
    return (
        pairs.groupBy(F.col("p")["l"].alias("l"), F.col("p")["r"].alias("r"))
        .agg(F.sum("cnt").cast("bigint").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("l"), F.asc("r"))
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """First-iteration BPE pair statistics (Sennrich et al., ACL 2016):
    adjacent character-pair frequencies over the word dictionary, weighted
    by word count — the table whose argmax IS the first learned merge.
    Shape: corpus → word dict (one partial agg) → character explode and
    pair counting over VOCAB-sized rows → TakeOrdered top-k with a
    deterministic (l, r) tie-break."""
    wd = word_freq_dict(docs, text_col)
    sym = wd.select("cnt", F.split("word", "").alias("s"))
    return _pair_weights(sym).limit(top_k)


def _apply_merge(sym_col, left, right):
    """Greedy left-to-right merge of adjacent (left, right) symbol pairs
    in one array — the BPE merge step as a fold. Interpreted HOF, but it
    runs over the VOCAB-sized dictionary, not the corpus."""
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left)
            & (x == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Learn the first n_merges BPE merges distributed (Sennrich et al.,
    ACL 2016): per round, count weighted adjacent pairs over the symbol
    dictionary, take the global argmax (ONE row to the driver — bounded
    like kmeans centroid state), apply the merge to every word, repeat.
    Returns [(left, right, weight)] in merge order.

    localCheckpoint per round truncates the growing lineage (the
    connected-components convention); per-round cost is vocab-sized."""
    wd = word_freq_dict(docs, text_col)
    sym = wd.select("cnt", F.split("word", "").alias("s")).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = _pair_weights(sym).limit(1).collect()
        if not top:
            break
        l, r, w = top[0]["l"], top[0]["r"], int(top[0]["weight"])
        merges.append((l, r, w))
        sym = sym.select(
            "cnt", _apply_merge(F.col("s"), l, r).alias("s")
        ).localCheckpoint()
    return merges


def _signed_pairs(sym_df: DataFrame, sign: int) -> DataFrame:
    """Adjacent-pair rows of a symbol dict slice with a signed weight —
    the retraction/insert halves of the incremental pair-count delta."""
    return (
        sym_df.filter(F.size("s") >= 2)
        .select(
            (F.col("cnt") * F.lit(sign)).cast("bigint").alias("w"),
            F.explode(_adjacent_pairs(F.col("s"))).alias("p"),
        )
        .select(F.col("p")["l"].alias("l"), F.col("p")["r"].alias("r"), "w")
    )


def bpe_learn_merges_incremental(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    round_stats: list[dict] | None = None,
) -> list[tuple[str, str, int]]:
    """bpe_learn_merges with DELTA-MAINTAINED pair counts — the
    production-learner shape (Sennrich's own fast path): instead of
    recounting every adjacent pair over the whole symbol dictionary each
    round (O(n_merges × vocab) total work — infeasible for a 32k-merge
    vocab over a 100-TB corpus dictionary), the pair-weight table is a
    persistent state folded with signed deltas, the same IVM algebra as
    operators/aggregate.apply_retractable_delta:

      per round: argmax over the MAINTAINED pair table (pair-type-sized,
      one row to the driver) → candidate words via a codegen-native
      array_contains(l) AND array_contains(r) prefilter (a SUPERSET of
      the truly affected words is sound — a word whose pairs don't change
      retracts and re-inserts the identical multiset, netting zero) →
      retract the candidates' old pairs, insert their merged pairs, fold
      into the state, swap the candidate slice of the dictionary.

    Per-round cost is O(|affected words|) explode+agg instead of
    O(vocab); the two codegen filter passes over the dictionary carry no
    shuffle. Returns [(left, right, weight)] identical (including the
    (weight desc, l, r) tie-break) to bpe_learn_merges — pinned by test.
    `round_stats`, when given, receives per-round observe() metrics
    ({l, r, weight, n_affected}) so the shrinkage is measurable."""
    from pyspark.sql import Observation

    wd = word_freq_dict(docs, text_col)
    sym = wd.select("cnt", F.split("word", "").alias("s")).localCheckpoint()
    state = _pair_weights(sym).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            state.orderBy(F.desc("weight"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, w = top[0]["l"], top[0]["r"], int(top[0]["weight"])
        merges.append((l, r, w))
        cand = F.array_contains(F.col("s"), l) & F.array_contains(
            F.col("s"), r
        )
        affected = sym.filter(cand)
        obs = None
        if round_stats is not None:
            obs = Observation()
            affected = affected.observe(
                obs, F.count(F.lit(1)).alias("n_affected")
            )
        affected = affected.localCheckpoint()
        merged = affected.select(
            "cnt", _apply_merge(F.col("s"), l, r).alias("s")
        )
        delta = _signed_pairs(affected, -1).unionByName(
            _signed_pairs(merged, 1)
        )
        state = (
            state.unionByName(
                delta.groupBy("l", "r").agg(
                    F.sum("w").cast("bigint").alias("weight")
                )
            )
            .groupBy("l", "r")
            .agg(F.sum("weight").cast("bigint").alias("weight"))
            .filter(F.col("weight") > 0)
            .localCheckpoint()
        )
        sym = sym.filter(~cand).unionByName(merged).localCheckpoint()
        if round_stats is not None:
            round_stats.append(
                {
                    "l": l,
                    "r": r,
                    "weight": w,
                    "n_affected": int(obs.get["n_affected"]),
                }
            )
    return merges


def bpe_encode(
    sym: DataFrame,
    merges: list[tuple[str, str, int]],
    sym_col: str = "s",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Apply a learned merge list to a symbol dictionary in merge order —
    the deterministic encode step (other columns pass through). Each merge
    is one vocab-sized fold; the composition is exactly what the reference
    BPE encoder does word-by-word, batched over the dictionary.

    Every `checkpoint_every` merges the (vocab-sized) frame is
    localCheckpointed: real merge lists run to thousands, and composing
    that many interpreted folds into ONE projection sends Catalyst
    analysis quadratic and stacks N interpreted passes per row (CLAUDE.md
    rules 1 and 9 — the same reason bpe_learn_merges truncates each
    round)."""
    for i, (left, right, _w) in enumerate(merges, start=1):
        sym = sym.withColumn(
            sym_col, _apply_merge(F.col(sym_col), left, right)
        )
        if checkpoint_every and i % checkpoint_every == 0:
            sym = sym.localCheckpoint()
    return sym


def bpe_encode_fast(
    sym: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    sym_col: str = "s",
) -> DataFrame:
    """BPE encode for LONG merge lists: bpe_encode composes one
    interpreted fold per merge — fine for dozens, but a real 32k-merge
    vocabulary would mean 32k passes over the dictionary (the encode-side
    twin of the learning-loop problem bpe_learn_merges_incremental
    fixes). This variant applies ALL merges in one Arrow-batched pass per
    word with the canonical rank-dict algorithm (Sennrich's apply_bpe /
    the GPT-2 encoder): repeatedly merge the lowest-rank adjacent pair
    present, left-to-right across its occurrences, until none remains —
    O(|word| · merges_present) per word instead of O(n_merges) dictionary
    scans.

    Requires a WELL-FORMED learned list (compound symbols appear only
    after the merges that build them — what both learners produce); under
    that invariant min-rank iteration is exactly equivalent to sequential
    application, pinned by test against bpe_encode. Python executes only
    at the Arrow batch boundary over the VOCAB-sized dictionary, never
    the corpus; the rank dict ships once per executor in the UDF
    closure."""
    from pyspark.sql.types import ArrayType, StringType

    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(col: pd.Series) -> pd.Series:
        def one(word):
            w = list(word)
            while len(w) >= 2:
                best = None
                for i in range(len(w) - 1):
                    rk = ranks.get((w[i], w[i + 1]))
                    if rk is not None and (best is None or rk < best):
                        best = rk
                if best is None:
                    break
                l, r = merges[best][0], merges[best][1]
                out = []
                i = 0
                while i < len(w):
                    if i < len(w) - 1 and w[i] == l and w[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(w[i])
                        i += 1
                w = out
            return w

        return col.apply(one)

    return sym.withColumn(sym_col, enc(F.col(sym_col)))


def bpe_fertility(
    docs: DataFrame, merges: list[tuple[str, str, int]], text_col: str = "text"
) -> dict[str, float]:
    """Corpus tokenizer-fertility audit after a merge list: weighted
    tokens-per-word and chars-per-token — the number that says how much a
    vocabulary actually compresses the corpus (fertility falls from 1
    symbol/char toward word-level as merges accumulate). Everything runs
    over the vocab-sized dictionary; the corpus is touched once for word
    counts."""
    wd = word_freq_dict(docs, text_col)
    sym = wd.select(
        "cnt", F.split("word", "").alias("s"), F.length("word").alias("chars")
    )
    enc = bpe_encode(sym, merges)
    # ONE agg over the encoded dictionary: `chars` rode through the encode
    # (columns pass through), so no second corpus/vocab scan; coalesce
    # guards the empty/token-free corpus where the sums come back NULL
    row = enc.agg(
        F.coalesce(F.sum(F.col("cnt") * F.size("s")), F.lit(0)).alias(
            "tok_occ"
        ),
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("word_occ"),
        F.coalesce(F.sum(F.col("cnt") * F.col("chars")), F.lit(0)).alias(
            "char_occ"
        ),
    ).collect()[0]
    tokens_per_word = row["tok_occ"] / max(row["word_occ"], 1)
    chars_per_token = row["char_occ"] / max(row["tok_occ"], 1)
    return {
        "tokens_per_word": round(tokens_per_word, 6),
        "chars_per_token": round(chars_per_token, 6),
        "n_token_occurrences": int(row["tok_occ"]),
    }


def domain_excess_reweight(
    docs: DataFrame,
    eta: int = 1,
    budget_tokens: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """Domain mixture reweighting from excess LM difficulty — the DoReMi
    idea (Xie et al. 2023: upweight domains where the proxy model's
    excess loss is high) collapsed to ONE deterministic pass with the
    corpus-trained bigram LM standing in for the proxy/reference pair
    (documented deviation: no iterative Group-DRO loop, the reference
    loss is the corpus mean): per domain,
        excess_d  = corpus_mean_logprob − domain_mean_logprob   (≥ 0 ⇔ harder)
        w_d       ∝ exp(eta · excess_d),   normalized over domains
        planned_tokens_d = tie-free round of budget · w_d
    Returns (domain, n_docs, dom_logprob, excess, weight, planned_tokens)
    — the sampling plan a mixture loader consumes.

    Shape / scale: per-doc scores come from lm_quality_scores (LM tables
    vocabulary-sized, token volume only crosses map-side partial aggs);
    the domain rollup is one partial agg to a |domains|-row frame; corpus
    mean and weight normalizer ride back as broadcast 1-row dims — no
    window, no collect. Floats are round-6 at every boundary (module
    convention); eta is an integer so exp's argument parses identically
    in the DuckDB oracle (bare decimal literals are DECIMAL there)."""
    scores = lm_quality_scores(docs, text_col, id_col)
    dd = docs.select(F.col(id_col), F.col(domain_col).alias("domain")).join(
        scores, id_col
    )
    dom = dd.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.avg("avg_logprob"), 6).alias("dom_logprob"),
    )
    corpus = dd.agg(F.round(F.avg("avg_logprob"), 6).alias("corp_logprob"))
    w = (
        dom.crossJoin(F.broadcast(corpus))
        .withColumn(
            "excess", F.round(F.col("corp_logprob") - F.col("dom_logprob"), 6)
        )
        .withColumn("w_raw", F.round(F.exp(F.lit(eta) * F.col("excess")), 6))
    )
    tot = w.agg(F.round(F.sum("w_raw"), 6).alias("w_tot"))
    return w.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_docs",
        "dom_logprob",
        "excess",
        F.round(F.col("w_raw") / F.col("w_tot"), 6).alias("weight"),
        F.floor(
            F.lit(budget_tokens) * F.round(F.col("w_raw") / F.col("w_tot"), 6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("planned_tokens"),
    )
