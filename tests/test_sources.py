"""Source-boundary error isolation: PERMISSIVE JSONL quarantine."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_jsonl_per_record_error_isolation(spark, tmp_path):
    """One corrupt line costs one routed row; clean lines parse typed; the
    full pipeline parse stage runs on the survivors unchanged."""
    from blogparser_spark.operators.parse import parse_stage
    from blogparser_spark.sources.jsonl import (
        read_transcripts_jsonl,
        route_source_errors,
    )

    lines = [
        '{"conv_id": "c1", "turn_idx": 0, "role": "user", '
        '"text": "<html><head><title>t</title></head></html>", '
        '"tool": "search", "ts": "2024-01-01T00:00:00.000Z"}',
        "this is not json at all {{{",
        '{"conv_id": "c1", "turn_idx": 1, "role": "assistant", '
        '"text": "reply", "tool": "search", "ts": "2024-01-01T00:00:30.000Z"}',
        '{"broken": tru',  # truncated mid-token
    ]
    p = tmp_path / "feed.jsonl"
    p.write_text("\n".join(lines) + "\n")

    routed = route_source_errors(read_transcripts_jsonl(spark, str(p))).cache()
    counts = {r["source_status"]: r["n"] for r in
              routed.groupBy("source_status").agg(F.count("*").alias("n")).collect()}
    assert counts == {"ok": 2, "source_error": 2}
    quarantined = {r["raw"] for r in
                   routed.filter(F.col("source_status") == "source_error").collect()}
    assert quarantined == {lines[1], lines[3]}  # raw lines preserved verbatim

    clean = routed.filter(F.col("source_status") == "ok").drop("source_status", "raw")
    parsed = parse_stage(clean)
    assert parsed.count() == 2
    ok = parsed.filter(F.col("conv_id") == "c1").orderBy("turn_idx").collect()
    assert ok[0]["turn_idx"] == 0 and ok[1]["turn_idx"] == 1
    assert ok[0]["title"] == "t"  # typed rows flow through the real parser
