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


def _protobuf_shim_dir() -> str | None:
    """dev/protobuf_shim if it can supply google.protobuf (pip-less
    sandboxes); None when a real protobuf is installed or no vendored
    runtime exists. See the shim's docstring for the two import traps."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return None  # real runtime present — shim unnecessary
    except ImportError:
        pass
    shim = str(REPO / "dev" / "protobuf_shim")
    src = os.environ.get(
        "PROTOBUF_SHIM_SRC",
        "/usr/lib/google-cloud-sdk/platform/google_appengine",
    )
    if os.path.isdir(os.path.join(src, "google", "protobuf")):
        return shim
    return None


@pytest.fixture(scope="session")
def spark():
    from flink_emqx_connector_spark.session import get_spark

    import tempfile

    extra = {"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="wh-")}
    shim = _protobuf_shim_dir()
    if shim is not None:
        # driver side: execute the shim file directly (a plain import
        # would hit any cached global sitecustomize module)
        import runpy

        runpy.run_path(os.path.join(shim, "sitecustomize.py"))

        # worker side: the python workers build their own PYTHONPATH; the
        # shim dir must be there so THEIR sitecustomize hook runs too
        prior = os.environ.get("PYTHONPATH", "")
        extra["spark.executorEnv.PYTHONPATH"] = (
            f"{prior}:{shim}" if prior else shim
        )
    spark = get_spark(
        "tests",
        cpus=8,
        shuffle_partitions=8,
        # keep managed-table tests (bucketed joins) out of the repo tree
        extra_conf=extra,
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
