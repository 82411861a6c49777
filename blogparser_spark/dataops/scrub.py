"""PII scrubbing for training corpora: mask emails, phone-like numbers, and
IPv4 addresses with typed placeholder tokens.

Pure regexp_replace chain — JVM-side, whole-stage codegen, no shuffle; the
patterns are deliberately conservative (precision over recall) because a
masking pass that mangles code or dates poisons training data. Counts of
masked spans per doc come from the same pass (regexp_count) so the scrub is
auditable without a second scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d\- ]{7,14}\d"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def mask_pii(col: Column) -> Column:
    c = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    c = F.regexp_replace(c, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(c, PHONE_RE, PHONE_TOKEN)


def with_pii_masked(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return (
        df.withColumn("n_emails", F.regexp_count(c, F.lit(EMAIL_RE)))
        .withColumn("n_ips", F.regexp_count(c, F.lit(IPV4_RE)))
        .withColumn("text_masked", mask_pii(c))
    )
