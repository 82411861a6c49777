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
