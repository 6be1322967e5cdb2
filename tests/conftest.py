import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# CI (or any machine without the driver-generated tables) points this at
# a dev/gen_testdata.py output dir; locally it defaults to the driver's.
SF_SMALL = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from flink_emqx_connector_spark.session import get_spark

    import tempfile

    spark = get_spark(
        "tests",
        cpus=8,
        shuffle_partitions=8,
        # keep managed-table tests (bucketed joins) out of the repo tree
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="wh-")},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
