from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from blogparser_spark.session import get_spark

    import tempfile

    wh = tempfile.mkdtemp(prefix="spark-wh-")
    s = get_spark(
        master="local[4]",
        app_name="blogparser-tests",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts(spark):
    """Small deterministic transcript table (FIXTURES.md scale point 1)."""
    from blogparser_spark.sources.synthetic import transcripts_df

    df = transcripts_df(spark, n_convs=80, turns_per_conv=8)
    df.cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def parsed(spark, transcripts):
    from blogparser_spark.operators.parse import parse_stage

    df = parse_stage(transcripts)
    df.cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
