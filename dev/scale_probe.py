"""Cold/warm per-query timing probe at an arbitrary scale directory.

The correctness gate (plans/check.py) proves hash parity; this tool
measures the per-10x cost ratios the scale story is built on. Each query
runs twice — cold (first execution in this session, pays codegen) and
warm — timed from plan CONSTRUCTION (eager driver steps inside operator
builders count; NOTES round-2 lesson 5) to the end of a count() action.

Usage:
    python dev/scale_probe.py <sf_dir> [names...]        # default: all
    python dev/scale_probe.py <sf_dir> @tagname          # all with tag

Prints one JSON object {name: [cold_s, warm_s]} on the last line, and
writes it to the path in $SCALE_PROBE_OUT when set. Run on a QUIET
machine — full-registry numbers swing ±30% under host contention
(BASELINE.md band); single-query floors are the durable signal.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main(argv: list[str]) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from flink_emqx_connector_spark.plans import QUERIES
    from flink_emqx_connector_spark.session import get_spark

    if not argv:
        print(__doc__)
        return 2
    sf_dir = argv[0]
    names = argv[1:] or list(QUERIES)
    if len(names) == 1 and names[0].startswith("@"):
        tag = names[0][1:]
        names = [n for n, q in QUERIES.items() if tag in q.tags]

    spark = get_spark("scale-probe")
    out: dict[str, list[float]] = {}
    for name in names:
        q = QUERIES[name]
        times = []
        for _ in range(2):
            t0 = time.monotonic()
            q.spark(spark, sf_dir).count()
            times.append(round(time.monotonic() - t0, 2))
        out[name] = times
        print(f"TIMED {name} ({times[0]}, {times[1]})", flush=True)
    payload = json.dumps(out)
    dest = os.environ.get("SCALE_PROBE_OUT")
    if dest:
        with open(dest, "w") as fh:
            fh.write(payload)
    print(payload)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
