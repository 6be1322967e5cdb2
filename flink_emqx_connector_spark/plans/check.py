"""Local mirror of the driver's t2 correctness gate.

Runs each registered query on Spark and its DuckDB oracle side-by-side,
compares row count, column names, and an order-insensitive multiset of
normalized values. Used by tests and as a CLI:

    python -m flink_emqx_connector_spark.plans.check [sf_dir] [name ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import sys
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the parquet tables as views, like the driver does."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # absorb -0.0 and representation noise below the rounding we apply
        return round(v, 9) + 0.0
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort key via repr: total order even with NULLs / mixed types
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )


def _compare_bounded(q, sf_dir: str, s_cols: list[str], s_rows: list[tuple]) -> dict:
    """Bounded-error gate for sketch queries (QueryDef.bounded contract).

    Joins the Spark output to the EXACT DuckDB values by the contract's key
    columns and asserts each bounded column within its rated error —
    ("exact", _) must match exactly, ("rel", tol) within relative tolerance.
    Rows must match 1:1 on the key. This upgrades approximate operators
    from rows-only to a failing gate when a sketch drifts outside its
    error contract.
    """
    spec = q.bounded
    key, bounds = list(spec["key"]), dict(spec["bounds"])
    con = duckdb_connect(sf_dir)
    cur = con.execute(spec["sql"])
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    con.close()

    res = {
        "name": q.name,
        "mode": "bounded-oracle",
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
    }
    s_idx = {c: i for i, c in enumerate(s_cols)}
    d_idx = {c: i for i, c in enumerate(d_cols)}
    missing = [c for c in key + list(bounds) if c not in s_idx or c not in d_idx]
    if missing:
        res.update(ok=False, why=f"bounded contract columns missing: {missing}")
        return res
    s_by_key = {tuple(_norm(r[s_idx[c]]) for c in key): r for r in s_rows}
    d_by_key = {tuple(_norm(r[d_idx[c]]) for c in key): r for r in d_rows}
    if (
        set(s_by_key) != set(d_by_key)
        or len(s_by_key) != len(s_rows)
        or len(d_by_key) != len(d_rows)  # duplicate oracle keys must FAIL too
    ):
        res.update(ok=False, why="key sets differ")
        return res
    violations = []
    for k, sr in s_by_key.items():
        dr = d_by_key[k]
        for col, bound in bounds.items():
            kind, tol, *rest = bound
            atol = rest[0] if rest else 0.0
            sv, dv = sr[s_idx[col]], dr[d_idx[col]]
            if kind == "exact":
                if _norm(sv) != _norm(dv):
                    violations.append((k, col, sv, dv))
            elif sv is None or dv is None:
                # a NULL sketch on either side is a contract violation,
                # not a crash (float(None) would TypeError out of the gate)
                if sv is not None or dv is not None:
                    violations.append((k, col, sv, dv))
            else:  # relative error vs the exact value (+ absolute slack)
                sv, dv = float(sv), float(dv)
                # A ("rel", tol) bound with no absolute term degenerates to
                # exact equality when the exact value IS 0 — any sketch
                # noise would false-fail. Default a tiny absolute slack for
                # that degenerate case ONLY (ADVICE r7: a blanket fallback
                # silently loosened every two-element rel contract by 1e-9;
                # nonzero contracts keep their declared tolerance).
                if not rest and dv == 0.0:
                    atol = 1e-9
                if abs(sv - dv) > tol * abs(dv) + atol:
                    violations.append((k, col, sv, dv))
    if violations:
        res.update(ok=False, why="error contract violated",
                   sample_diff=violations[:3])
        return res
    res["ok"] = True
    return res


def compare_query(spark, sf_dir: str, name: str) -> dict:
    """Run one query both ways; return a result dict (ok/raw details)."""
    from .registry import QUERIES

    q = QUERIES[name]
    sdf = q.spark(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    if q.oracle is None:
        if q.bounded is not None:
            return _compare_bounded(q, sf_dir, s_cols, s_rows)
        return {
            "name": name,
            "ok": len(s_rows) >= 0,
            "mode": "rows-only",
            "spark_rows": len(s_rows),
        }

    con = duckdb_connect(sf_dir)
    cur = con.execute(q.oracle)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    con.close()

    res = {
        "name": name,
        "mode": "oracle",
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
    }
    if sorted(s_cols) != sorted(d_cols):
        res["ok"] = False
        res["why"] = "columns"
        return res
    if len(s_rows) != len(d_rows):
        res["ok"] = False
        res["why"] = "rowcount"
        return res
    sn, dn = _normalize(s_rows, s_cols), _normalize(d_rows, d_cols)
    if sn != dn:
        res["ok"] = False
        res["why"] = "values"
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        res["sample_diff"] = diff
        return res
    res["ok"] = True
    return res


def main(argv: list[str]) -> int:
    from ..session import get_spark
    from .registry import QUERIES

    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    names = argv[1:] or list(QUERIES)
    spark = get_spark("oracle-check")
    failed = 0
    for name in names:
        try:
            r = compare_query(spark, sf_dir, name)
        except Exception as e:  # surface per-query, keep going
            r = {"name": name, "ok": False, "why": f"exception: {e!r}"}
        status = "OK  " if r.get("ok") else "FAIL"
        print(f"{status} {name}: {r}")
        if not r.get("ok"):
            failed += 1
    print(f"\n{len(names) - failed}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
