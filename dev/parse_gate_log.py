"""Extract per-query results from a plans.check gate log.

The gate prints one ``OK``/``FAIL`` line per query containing the result
dict repr (with ``spark_s`` / ``duck_s`` timings since round 9's
vectorized-compare change).  Spark's stage-progress carriage returns
mean those lines are not newline-clean, so this matches the dict by
regex instead of splitting lines.

Usage: python dev/parse_gate_log.py <log> [--top N] [--csv]
"""

from __future__ import annotations

import ast
import re
import sys

_RESULT = re.compile(r"(OK|FAIL) +(\w+): (\{.*?\})(?=(?:\r|\n|$))")


def parse(path: str) -> dict[str, dict]:
    text = open(path, errors="replace").read()
    out: dict[str, dict] = {}
    for _status, name, body in _RESULT.findall(text):
        try:
            out[name] = ast.literal_eval(body)
        except (ValueError, SyntaxError):
            out[name] = {"name": name, "ok": False, "why": "unparseable log line"}
    return out


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    top = 0
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        del argv[i : i + 2]
    as_csv = "--csv" in argv
    if as_csv:
        argv.remove("--csv")
    res = parse(argv[0])
    bad = {n: r for n, r in res.items() if not r.get("ok")}
    rows = sorted(
        ((r.get("spark_s", r.get("secs", 0.0)), n, r) for n, r in res.items()),
        reverse=True,
    )
    if top:
        rows = rows[:top]
    for spark_s, name, r in rows:
        if as_csv:
            print(f"{name},{spark_s},{r.get('duck_s', '')},{r.get('secs', '')}")
        else:
            print(
                f"{name:40s} spark {spark_s:8.2f}  duck {r.get('duck_s', float('nan')):8.2f}"
                f"  total {r.get('secs', float('nan')):8.2f}  ok={r.get('ok')}"
            )
    print(f"\n{len(res) - len(bad)}/{len(res)} ok; failures: {sorted(bad) or 'none'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
