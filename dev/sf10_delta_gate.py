"""sf10 DELTA gate: changed entries + a rotating sample of old ones.

The round-9 full-registry sf10 gate cost ~5 h of wall clock; running it
every round would crowd out real work while mostly re-verifying
unchanged plans. This is the institutionalized per-round recipe
(VERDICT r9 item 7): gate every NEW or CHANGED registry entry at sf10,
plus a deterministic rotating sample of older entries so the whole
registry is still re-covered every ~10 rounds.

Mechanics baked in from the round-9 gate lessons (NOTES.md):

- **per-chunk subprocess sessions** — a long 160-plan session inflates
  late queries' wall clock up to 50× (GC/codegen state); each chunk of
  ``--chunk`` queries gets a fresh interpreter + SparkSession;
- **64g driver heap + raised maxResultSize** exported per chunk
  (session.py's ordinary defaults are 8g/4g — deliberately small so
  user sessions fail fast);
- hash verdicts come from this gate; FLOORS come from
  ``dev/scale_probe.py`` in isolation — never read timings off a gate
  log.

Usage:
    python dev/sf10_delta_gate.py --round 10 --changed q1 q2 ... \
        [--sample 20] [--sf-dir .scaledata/sf10] [--chunk 20]

The rotating sample is ``sorted(registry)`` sliced at
``(round * sample) % len`` with wrap-around, changed names excluded —
deterministic per round, full coverage every ceil(len/sample) rounds.
Exit code 0 iff every gated query passes; prints a markdown table for
BASELINE.md.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rotating_sample(names: list[str], rnd: int, k: int) -> list[str]:
    names = sorted(names)
    if not names or k <= 0:
        return []
    start = (rnd * k) % len(names)
    doubled = names + names
    return doubled[start : start + min(k, len(names))]


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--changed", nargs="*", default=[])
    ap.add_argument("--sample", type=int, default=20)
    ap.add_argument("--sf-dir", default=os.path.join(_REPO, ".scaledata/sf10"))
    ap.add_argument("--chunk", type=int, default=20)
    args = ap.parse_args(argv)

    sys.path.insert(0, _REPO)
    from flink_emqx_connector_spark.plans import QUERIES

    unknown = [n for n in args.changed if n not in QUERIES]
    if unknown:
        print(f"unknown --changed names: {unknown}", file=sys.stderr)
        return 2
    pool = [n for n in QUERIES if n not in set(args.changed)]
    sample = rotating_sample(pool, args.round, args.sample)
    names = list(args.changed) + sample

    env = dict(
        os.environ,
        SPARK_GRAFT_DRIVER_MEM="64g",
        SPARK_GRAFT_MAX_RESULT="16g",
    )
    results: dict[str, bool] = {}
    for i in range(0, len(names), args.chunk):
        chunk = names[i : i + args.chunk]
        proc = subprocess.run(
            [sys.executable, "-m", "flink_emqx_connector_spark.plans.check",
             args.sf_dir, *chunk],
            cwd=_REPO, env=env, capture_output=True, text=True,
        )
        text = proc.stdout + proc.stderr
        for n in chunk:
            ok = f"OK   {n}:" in text
            results[n] = ok
            print(("OK  " if ok else "FAIL"), n, flush=True)
            if not ok:
                # surface the gate's own line for the failure
                for line in text.splitlines():
                    if f" {n}:" in line:
                        print("   ", line.strip()[:400])

    n_ok = sum(results.values())
    print(f"\n{n_ok}/{len(results)} passed at {args.sf_dir}")
    print("\n| entry | kind | sf10 |")
    print("|---|---|---|")
    for n in names:
        kind = "changed" if n in set(args.changed) else "sample"
        print(f"| {n} | {kind} | {'green' if results[n] else 'FAIL'} |")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
