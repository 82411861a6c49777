"""spark-submit entry point for the full pipeline.

    spark-submit --py-files blogparser_spark.zip blogparser_spark/job.py \
        --input /path/transcripts --output /path/out [--resume] \
        [--slices 64] [--key-col conv_id] [--salt-parts 0] \
        [--table-format tablelog|parquet]

Runs the sliced, resumable parse→enrich pipeline (checkpoint manifests per
slice), then the aggregate reports over the routed output. The default sink
is the snapshot-log table format (one atomic idempotent commit per slice
into {output}/table, partitioned by sink keys, conv_id stats + blooms —
the north rule's per-sink Iceberg tables; resume rides the commit-marker
ledger as well as the slice manifests). --table-format parquet keeps the
plain per-slice directory fallback. On a cluster the same file is
submitted unchanged; local runs honor SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import sys


def transform(df):
    from blogparser_spark.operators.enrich import enrich
    from blogparser_spark.operators.parse import parse_stage
    from blogparser_spark.operators.route import with_sink_id

    return with_sink_id(enrich(parse_stage(df))).drop("images")


def make_transform(salt_parts: int = 0, salt_k: int = 16):
    """Job transform with optional salted repartition before the parse UDF.
    Use when the INPUT layout clusters hot conv_ids (e.g. conv-bucketed
    slices): parse is per-row/order-free, so spreading a hot conv across
    (conv_id, salt) buckets evens executor load with no correctness impact
    (operators/skew.py). salt_parts=0 skips the extra shuffle — right when
    the scan's splits are already balanced."""

    def t(df):
        if salt_parts:
            from blogparser_spark.operators.skew import salted_repartition

            df = salted_repartition(df, salt_parts, salt_k=salt_k)
        return transform(df)

    return t


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet dir")
    ap.add_argument("--output", required=True, help="output base dir")
    ap.add_argument("--slices", type=int, default=8)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--key-col", default="conv_id")
    ap.add_argument(
        "--salt-parts",
        type=int,
        default=0,
        help="salted repartition width before parse (0 = off; use when the "
        "input layout clusters hot conv_ids)",
    )
    ap.add_argument(
        "--table-format",
        choices=("tablelog", "parquet"),
        default="tablelog",
        help="routed sink: snapshot-log table (atomic idempotent commit "
        "per slice; default) or plain per-slice parquet dirs",
    )
    args = ap.parse_args(argv)

    from blogparser_spark.operators import aggregate as agg
    from blogparser_spark.operators.checkpoint import run_sliced
    from blogparser_spark.session import get_spark

    spark = get_spark(app_name="blogparser-job")
    manifests = run_sliced(
        spark,
        args.input,
        args.output,
        make_transform(salt_parts=args.salt_parts),
        n_slices=args.slices,
        key_col=args.key_col,
        resume=args.resume,
        table_format=args.table_format,
    )
    report = {
        "slices_run": [m.slice_id for m in manifests],
        "rows_in": sum(m.rows_in for m in manifests),
        "wall_seconds": round(sum(m.wall_seconds for m in manifests), 3),
    }
    if args.table_format == "tablelog":
        from blogparser_spark.operators import tablelog as tl

        table = f"{args.output}/table"
        # the snapshot IS the run's routed row set: slice commits are
        # atomic and stale generations were replaced during the run
        routed = tl.read_snapshot(spark, table)
        report["table_version"] = tl.current_version(table)
    else:
        # read exactly THIS run's slice set — a bare slice=* glob would
        # also pick up stale slice dirs left by an earlier run with a
        # larger --slices value, double-counting every row they hold
        routed = spark.read.parquet(
            *[f"{args.output}/slice={s}" for s in range(args.slices)]
        )
    report.update(
        {
            "sink_counts": {
                f"{r['channel']}/{r['tool_category']}/{r['parse_status']}": r["n"]
                for r in agg.sink_counts(routed).collect()
            },
            "n_convs": agg.conv_stats(routed).count(),
        }
    )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
