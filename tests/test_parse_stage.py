"""Parity: the vectorized Spark parse stage vs the pure-Python oracle,
row by row under stable (conv_id, turn_idx) ordering (the BASELINE.json
per-turn text-equality invariant)."""

from __future__ import annotations

from blogparser_spark.oracle.pyref import parse_record


def test_parse_stage_matches_oracle(parsed):
    rows = parsed.orderBy("conv_id", "turn_idx").collect()
    assert len(rows) > 500
    mismatches = []
    for r in rows:
        want = parse_record(r["text"])
        got = {
            "parse_status": r["parse_status"],
            "title": r["title"],
            "slug": r["slug"],
            "body": r["body"],
            "summary": r["summary"],
            "categories": list(r["categories"] or []),
            "tags": list(r["tags"] or []),
            "created_at": r["created_at"],
            "first_image": r["first_image"],
        }
        exp = {
            "parse_status": want.parse_status,
            "title": want.title,
            "slug": want.slug,
            "body": want.body,
            "summary": want.summary,
            "categories": want.categories,
            "tags": want.tags,
            "created_at": want.created_at,
            "first_image": want.first_image,
        }
        if got != exp:
            diffs = {k: (got[k], exp[k]) for k in got if got[k] != exp[k]}
            mismatches.append((r["conv_id"], r["turn_idx"], diffs))
    assert not mismatches, f"{len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"


def test_all_statuses_exercised(parsed):
    statuses = {r["parse_status"] for r in parsed.select("parse_status").distinct().collect()}
    assert statuses == {
        "ok",
        "no_title",
        "invalid_title",
        "no_content",
        "empty_after_clean",
        "short_content",
    } - (set() if len(statuses) == 6 else set()), statuses


def test_stable_turn_ordering(parsed, transcripts):
    """Input rows arrive shuffled; (conv_id, turn_idx) must reconstruct the
    conversation exactly — per-turn text equality under stable ordering."""
    got = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in parsed.select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]
    want = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in transcripts.select("conv_id", "turn_idx", "text").collect()
    )
    assert got == want


def test_content_fast_path_defers_to_balanced_semantics():
    """The vectorized lazy fast path must agree with the balanced oracle on
    its three blind spots: an alternation selector closed by a DIFFERENT
    tag, the wildcard itemprop selector closed by a different tag, and a
    self-closed open followed by a later real close."""
    import pandas as pd

    from blogparser_spark.operators.parse import _extract_content_vec
    from blogparser_spark.oracle import pyref

    pad = "word " * 40  # ≥100 bytes of plain body
    payloads = [
        f'<div id="content">{pad}</main>tail after mismatched close {pad}',
        f'<span itemprop="articleBody">{pad}</div>trailing {pad}',
        f'<div class="entry-content"/>{pad}</div>extra {pad}',
        f"<DIV id='content'>{pad}</SECTION>cased mismatch {pad}",
    ]
    got = _extract_content_vec(pd.Series(payloads))
    for i, p in enumerate(payloads):
        want = pyref.extract_content(p)
        g = got.iloc[i]
        assert (pd.isna(g) and want is None) or g == want, (i, g, want)


def test_null_text_routes_per_record(spark):
    """Per-record error isolation: a NULL text row must ROUTE (no_title),
    never poison its Arrow batch — `~NA` over the plain-text-fallback gate
    used to raise TypeError and kill the task for every row in the batch."""
    from blogparser_spark.operators.parse import parse_stage

    pad = "word " * 30
    df = spark.createDataFrame(
        [
            ("c", 0, None),
            ("c", 1, f"<h1>Title</h1><article>{pad}</article>"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    rows = {r["turn_idx"]: r for r in parse_stage(df).collect()}
    assert rows[0]["parse_status"] == "no_title"
    assert rows[1]["parse_status"] == "ok"


def test_published_time_only_date_reaches_extractor(spark):
    """A document whose ONLY date source is the OGP article:published_time
    meta (no literal 'date', no <time>) must still get created_at — the
    vectorized gate needs its own needle for this key."""
    from blogparser_spark.operators.parse import parse_stage
    from blogparser_spark.oracle import pyref

    pad = "word " * 30
    text = (
        '<meta property="article:published_time" content="2023-05-01T10:00:00Z">'
        f"<h1>Title</h1><article>{pad}</article>"
    )
    assert "date" not in text.lower() and "<time" not in text.lower()
    want = pyref.extract_date(text)
    assert want is not None
    df = spark.createDataFrame([("c", 0, text)], "conv_id string, turn_idx int, text string")
    got = parse_stage(df).collect()[0]
    assert got["parse_status"] == "ok"
    assert got["created_at"] == want


def test_clean_content_needle_spliced_by_comment_removal():
    """Comment removal can splice a remove-bank needle into existence
    ('goo<!-- x -->gle-auto-placed' → 'google-auto-placed'); the oracle
    applies the bank AFTER comment removal, so the vectorized gate must
    too — gating on the original text skips the removal."""
    import pandas as pd

    from blogparser_spark.operators.parse import _clean_content_vec
    from blogparser_spark.oracle import pyref

    pad = "keep " * 30
    payloads = [
        f'<div class="goo<!-- x -->gle-auto-placed">AD</div>{pad}',
        f'<div class="google-auto-placed">AD</div>{pad}',  # plain needle
        pad,  # bank-free row
    ]
    got = _clean_content_vec(pd.Series(payloads))
    for i, p in enumerate(payloads):
        want = pyref.clean_content(p)
        assert got.iloc[i] == want, (i, got.iloc[i], want)
    assert "AD" not in got.iloc[0]
