from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="dps-tests",
        cpus=4,
        shuffle_partitions=4,
        extra_conf={"spark.sql.files.maxPartitionBytes": "16777216"},
        arrow_max_records=256,  # media-safe Arrow batch height (multimodal.py)
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
