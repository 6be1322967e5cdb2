"""Regenerate QUERIES.md (the registry catalog) from the live registry."""

from __future__ import annotations


def main() -> int:
    import os

    from . import QUERIES

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    lines = [
        "# QUERIES — the registry catalog (auto-generated; do not edit)",
        "",
        "Regenerate with: `python -m flink_emqx_connector_spark.plans.catalog`",
        "",
        f"{len(QUERIES)} queries, "
        f"{sum(1 for q in QUERIES.values() if q.oracle)} with DuckDB oracles.",
        "",
        "| Query | Oracle | Tags | What it does |",
        "|---|---|---|---|",
    ]
    for name in sorted(QUERIES):
        q = QUERIES[name]
        doc = " ".join(q.doc.split())
        lines.append(
            f"| `{name}` | {'✅' if q.oracle else 'rows-only'} | "
            f"{', '.join(q.tags)} | {doc} |"
        )
    with open(os.path.join(repo, "QUERIES.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"QUERIES.md: {len(QUERIES)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
