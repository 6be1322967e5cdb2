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


# ---------------------------------------------------------------------------
# Vectorized multiset compare for LARGE atomic-typed outputs.
#
# The sf10 campaign exposed the gate's real bottleneck: for queries whose
# output is table-sized (window families at 15M rows, full-table joins),
# the ENGINES finish in seconds while the per-value Python _norm loop +
# repr-keyed sort takes 10+ minutes per side. The fast path below applies
# only when the Spark schema is entirely atomic (no arrays/maps/structs):
# both sides are fetched as pandas frames (Arrow on the Spark side) and
# every column is canonicalized VECTORIZED into a string series —
# numerically identical normalization (9-dp float rounding, -0.0
# absorption, tz-stripped microsecond timestamps, NULL sentinel) — then
# rows are joined, sorted as one numpy array, and compared. Any
# unsupported dtype, any cross-side dtype-class disagreement, or ANY
# mismatch verdict falls back to the exact per-row path over the same
# frames, so the fast path can only ever short-circuit an all-green
# comparison, never produce a false failure by itself.
# ---------------------------------------------------------------------------

import os as _os

# below this the exact path is fast enough; env override exists so the
# validation gate can force the vectorized lane for EVERY atomic query
_FAST_MIN_ROWS = int(_os.environ.get("SPARK_GRAFT_CHECK_FAST_MIN", "200000"))


def _canon_columns(pdf, cols: list[str]):
    """Per-column canonical string Series, or None → caller falls back."""
    import numpy as np
    import pandas as pd

    out = []
    for c in cols:
        s = pdf[c]
        k = s.dtype.kind
        if k in "iu":
            canon = s.astype("int64").astype(str)
        elif k == "b":
            canon = s.astype(str)
        elif k == "f":
            canon = (s.round(9) + 0.0).astype(str)  # NaN → 'nan', both sides
        elif k == "M":
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            canon = s.astype("datetime64[us]").astype(str)
        elif k == "O":
            nn = s.dropna()
            if len(nn):
                first = nn.iloc[0]
                # strings and date objects stringify canonically; anything
                # else (bytes, Decimal, lists, dicts) → exact path
                if isinstance(first, _dt.datetime) or not isinstance(
                    first, (str, _dt.date)
                ):
                    return None
            mask = s.isna().to_numpy()
            canon = s.astype(str)
            if mask.any():
                canon = canon.copy()
                canon[mask] = "\x00NULL"
        else:
            return None
        out.append(canon.astype(str))
    return out


def _fast_multiset_equal(s_pdf, d_pdf) -> bool | None:
    """True/False when the vectorized compare is conclusive; None → the
    caller must use the exact path (unsupported dtype or dtype-class
    disagreement between the sides)."""
    import numpy as np

    cols = sorted(s_pdf.columns)
    for c in cols:  # same dtype CLASS on both sides or bail
        sk, dk = s_pdf[c].dtype.kind, d_pdf[c].dtype.kind
        grp = lambda k: "num" if k in "iuf" else k  # int-vs-float handled
        if grp(sk) != grp(dk):
            return None
        if sk in "iu" and dk == "f" or sk == "f" and dk in "iu":
            # one side nullable-widened to float: push both through float
            s_pdf = s_pdf.copy()
            d_pdf = d_pdf.copy()
            s_pdf[c] = s_pdf[c].astype("float64")
            d_pdf[c] = d_pdf[c].astype("float64")
    s_cols = _canon_columns(s_pdf, cols)
    if s_cols is None:
        return None
    d_cols = _canon_columns(d_pdf, cols)
    if d_cols is None:
        return None
    s_join = s_cols[0].str.cat(s_cols[1:], sep="\x01") if len(s_cols) > 1 else s_cols[0]
    d_join = d_cols[0].str.cat(d_cols[1:], sep="\x01") if len(d_cols) > 1 else d_cols[0]
    return bool(
        np.array_equal(
            np.sort(s_join.to_numpy()), np.sort(d_join.to_numpy())
        )
    )


def _atomic_schema(sdf) -> bool:
    from pyspark.sql import types as T

    atomic = (
        T.IntegerType, T.LongType, T.ShortType, T.ByteType, T.DoubleType,
        T.FloatType, T.StringType, T.BooleanType, T.DateType,
        T.TimestampType, T.TimestampNTZType,
    )
    return all(isinstance(f.dataType, atomic) for f in sdf.schema.fields)


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


def _pandas_rows(pdf) -> list[tuple]:
    """Pandas frame → python row tuples with UNIFORM nulls (NaT/NaN →
    None, matching what collect()/fetchall() produce), for the exact
    comparison path."""
    obj = pdf.astype(object)
    obj = obj.where(obj.notna(), None)
    return [tuple(r) for r in obj.itertuples(index=False, name=None)]


def compare_query(spark, sf_dir: str, name: str) -> dict:
    """Run one query both ways; return a result dict (ok/raw details)."""
    import time as _time

    from .registry import QUERIES

    q = QUERIES[name]
    t0 = _time.monotonic()
    sdf = q.spark(spark, sf_dir)
    s_cols = list(sdf.columns)

    # Dtype guard (r9 verdict, What's-wrong #2): the driver hashes TYPED
    # values, so a Spark DecimalType column against a DOUBLE oracle column
    # hash-mismatches even when the _norm-coerced floats agree (the
    # grouping_sets_orders bug class: a bare `/ 100.0` in spark.sql() text
    # parses as DECIMAL(4,1) and silently turns the whole expression
    # DECIMAL). Fail loudly here — before either engine runs — instead of
    # letting _norm's Decimal→float coercion mask the class. Both schemas
    # are available lazily: Spark's from the unexecuted plan, DuckDB's from
    # an unexecuted relation.
    from pyspark.sql import types as _T

    if q.oracle is not None:
        s_dec = {
            f.name for f in sdf.schema.fields
            if isinstance(f.dataType, _T.DecimalType)
        }
        _con = duckdb_connect(sf_dir)
        try:
            _rel = _con.sql(q.oracle)  # planned, never executed
            d_dec = {
                c for c, t in zip(_rel.columns, _rel.types)
                if str(t).upper().startswith("DECIMAL")
            }
        finally:
            _con.close()
        bad = sorted(s_dec ^ d_dec)  # decimal on exactly one side
        if bad:
            return {
                "name": name,
                "ok": False,
                "mode": "oracle",
                "why": (
                    "dtype: decimal on exactly one side for "
                    f"{bad} (Spark decimal: {sorted(s_dec)}, oracle "
                    "DECIMAL: "
                    f"{sorted(d_dec)}) — driver hash would fail; check "
                    "decimal literals (use 100.0D / 1e2 / CAST AS DOUBLE)"
                ),
                "secs": round(_time.monotonic() - t0, 2),
            }

    # Atomic-typed oracle outputs ride the pandas/Arrow lane: collect()'s
    # per-row Row objects and the per-value _norm loop are the gate's
    # bottleneck at table-sized outputs (15M-row window families at sf10
    # spent 10+ min in comparison against seconds of engine time).
    s_pdf = d_pdf = None
    if q.oracle is not None and _atomic_schema(sdf):
        s_pdf = sdf.toPandas()
        s_rows = None
        n_s_rows = len(s_pdf)
    else:
        s_rows = [tuple(r) for r in sdf.collect()]
        n_s_rows = len(s_rows)
    t_spark = _time.monotonic() - t0

    if q.oracle is None:
        if q.bounded is not None:
            res = _compare_bounded(q, sf_dir, s_cols, s_rows)
            res["secs"] = round(_time.monotonic() - t0, 2)
            return res
        return {
            "name": name,
            "ok": n_s_rows >= 0,
            "mode": "rows-only",
            "spark_rows": n_s_rows,
            "secs": round(_time.monotonic() - t0, 2),
        }

    t1 = _time.monotonic()
    con = duckdb_connect(sf_dir)
    cur = con.execute(q.oracle)
    d_cols = [c[0] for c in cur.description]
    if s_pdf is not None:
        d_pdf = cur.fetch_df()
        d_rows = None
        n_d_rows = len(d_pdf)
        # fetch_df widens DATE to midnight datetime64 while Spark/fetchall
        # keep datetime.date objects — coerce by the SPARK schema so both
        # sides carry the same representation the classic path compares
        from pyspark.sql import types as _T

        for f in sdf.schema.fields:
            if (
                isinstance(f.dataType, _T.DateType)
                and f.name in d_pdf.columns
                and d_pdf[f.name].dtype.kind == "M"
            ):
                d_pdf[f.name] = d_pdf[f.name].dt.date
    else:
        d_rows = cur.fetchall()
        n_d_rows = len(d_rows)
    con.close()
    t_duck = _time.monotonic() - t1

    res = {
        "name": name,
        "mode": "oracle",
        "spark_rows": n_s_rows,
        "duck_rows": n_d_rows,
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
        "secs": None,  # filled below
        "spark_s": round(t_spark, 2),
        "duck_s": round(t_duck, 2),
    }

    def _done(ok: bool, **extra) -> dict:
        res.update(ok=ok, **extra)
        res["secs"] = round(_time.monotonic() - t0, 2)
        return res

    if sorted(s_cols) != sorted(d_cols):
        return _done(False, why="columns")
    if n_s_rows != n_d_rows:
        return _done(False, why="rowcount")
    if s_pdf is not None and n_s_rows >= _FAST_MIN_ROWS:
        verdict = _fast_multiset_equal(s_pdf, d_pdf)
        if verdict is True:
            return _done(True, compare="vectorized")
        # inconclusive OR mismatch → the exact path decides (the fast
        # path alone never fails a query)
    if s_pdf is not None:
        s_rows, d_rows = _pandas_rows(s_pdf), _pandas_rows(d_pdf)
    sn, dn = _normalize(s_rows, s_cols), _normalize(d_rows, d_cols)
    if sn != dn:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return _done(False, why="values", sample_diff=diff)
    return _done(True)


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
