"""JSON-lines transcript source with per-RECORD error isolation.

The reference isolates errors per FILE (sample/main.go:35-37: a file that
fails to parse is logged and skipped, the loop continues). A distributed
log pipeline needs the same property per RECORD at the source boundary:
one corrupt line in a 10^12-line feed must cost one routed row, never a
task retry storm or a dropped partition. Spark's PERMISSIVE JSON mode is
exactly that contract — malformed lines land in a designated
`_corrupt_record` column with every schema field NULL — and this module
turns it into the pipeline's routing convention: `parse_status =
'source_error'` rows carry the raw line for the quarantine sink, clean
rows flow on schema-typed.

Scale notes: schema is EXPLICIT (inference would scan the corpus twice and
race against ragged feeds); the JSON parse is JVM-side Jackson inside the
scan operator (no Python); the corrupt column costs nothing on clean data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CORRUPT_COL = "_corrupt_record"

TRANSCRIPT_JSON_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
        StructField(CORRUPT_COL, StringType()),
    ]
)


def read_transcripts_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """PERMISSIVE JSONL scan: clean rows typed, malformed lines quarantined
    in `_corrupt_record` (never a thrown task). Spark requires the corrupt
    column to be materialized (cache or a subsequent action over it) before
    filtering on it alone — callers get the full frame and route."""
    return (
        spark.read.schema(TRANSCRIPT_JSON_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def route_source_errors(df: DataFrame) -> DataFrame:
    """Attach the source-boundary status: 'source_error' rows keep the raw
    line in `raw`; clean rows drop the corrupt column and flow on. The
    quarantine is a ROUTE (same parse_status convention as operators/parse),
    not an exception path — counts land in the same sink metrics."""
    corrupt = F.col(CORRUPT_COL).isNotNull()
    return df.select(
        *[c for c in df.columns if c != CORRUPT_COL],
        F.when(corrupt, F.lit("source_error")).otherwise(F.lit("ok")).alias(
            "source_status"
        ),
        F.when(corrupt, F.col(CORRUPT_COL)).alias("raw"),
    )
