"""Dump .explain("formatted") for named queries to a directory.

Usage: python dev/dump_plans.py <out_dir> <suffix> [names...]

Writes <out_dir>/<name>_<suffix>.txt for each query. Plan capture only —
no query execution beyond eager driver steps inside the builders.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main(argv: list[str]) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from flink_emqx_connector_spark.plans import QUERIES
    from flink_emqx_connector_spark.session import get_spark

    out_dir, suffix = argv[0], argv[1]
    names = argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    for name in names:
        df = QUERIES[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"WROTE {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
