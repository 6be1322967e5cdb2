"""Round-12 semantic invariants.

Waterfill exactness (round-11 ADVICE): the old two-unrolled-rounds
allocator under-allocated whenever a cell exhausted DURING round 2
(leftover l2 > |open| → the ±1 rank round couldn't place l2 slots).
The rewritten closed form (sorted-prefix water level) must satisfy
sum(quota) == budget on EVERY cap distribution, including the
adversarial one that broke the old formula.

Quantile fraction guard (round-11 ADVICE): floats whose exact binary
value is not the intended rational must raise, not silently
approximate.
"""

from fractions import Fraction

import duckdb
import pytest

from flink_emqx_connector_spark.plans import QUERIES
from tests.conftest import SF_SMALL


def _run_waterfill_oracle(cells: list[tuple[str, str, int]]):
    """Run the registered oracle SQL over a synthetic documents table
    with the given (source, lang, n_docs) cells."""
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (source VARCHAR, lang VARCHAR)")
    for source, lang, n in cells:
        con.execute(
            "INSERT INTO documents "
            f"SELECT '{source}', '{lang}' FROM range({n})"
        )
    sql = QUERIES["mix_waterfill_allocation"].oracle
    return con.execute(sql).fetchall(), con


def _check_invariants(rows, cells):
    total = sum(n for _, _, n in cells)
    budget = total // 2
    cols = [
        "source", "lang", "n_docs", "water_level", "base_alloc",
        "quota", "cap_state",
    ]
    recs = [dict(zip(cols, r)) for r in rows]
    assert len(recs) == len(cells)
    # THE invariant the old formula violated: the budget is fully spent
    assert sum(r["quota"] for r in recs) == budget, (
        f"sum(quota)={sum(r['quota'] for r in recs)} != budget={budget}"
    )
    for r in recs:
        assert 0 <= r["quota"] <= r["n_docs"], r  # caps respected
        if r["cap_state"] == "open":
            # open cells sit at the water level (±1 from the rank round)
            assert r["base_alloc"] == r["water_level"], r
            assert r["quota"] - r["base_alloc"] in (0, 1), r
        else:
            assert r["base_alloc"] == r["n_docs"], r
    return recs


def test_waterfill_adversarial_round2_exhaustion():
    """20×5-doc cells + a 50-cap + a 1000-cap cell, budget 575: the old
    formula allocated 388 (the 50-cap cell exhausted in round 2, l2=188
    with one open cell → 187 slots silently dropped). The closed form
    must land exactly on 575 with water level 425."""
    cells = [("s", f"l{i:02d}", 5) for i in range(20)]
    cells += [("s", "mid", 50), ("s", "big", 1000)]
    rows, con = _run_waterfill_oracle(cells)
    recs = _check_invariants(rows, cells)
    by = {r["lang"]: r for r in recs}
    assert by["big"]["water_level"] == 425
    assert by["big"]["quota"] == 425
    assert by["mid"]["cap_state"] == "exhausted"
    assert by["mid"]["quota"] == 50
    con.close()


@pytest.mark.parametrize(
    "caps",
    [
        [1],  # single cell
        [1, 1],  # budget 1, leftover rank round
        [7, 7, 7],  # uniform, no exhaustion
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],  # staircase
        [1000, 1, 1, 1],  # one dominant cell
        [5] * 50,  # many equal cells, leftover spread
        [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37],  # primes
    ],
)
def test_waterfill_budget_exact_on_varied_caps(caps):
    cells = [("s", f"l{i:03d}", n) for i, n in enumerate(caps)]
    rows, con = _run_waterfill_oracle(cells)
    _check_invariants(rows, cells)
    con.close()


def test_waterfill_spark_budget_exact(spark):
    """Spark leg on the real sf0.001 corpus: quotas sum to exactly
    half the corpus (gate already proves Spark ≡ oracle; this pins the
    budget invariant independently of the oracle)."""
    rows = QUERIES["mix_waterfill_allocation"].spark(spark, SF_SMALL).collect()
    total = sum(r["n_docs"] for r in rows)
    assert sum(r["quota"] for r in rows) == total // 2
    for r in rows:
        assert 0 <= r["quota"] <= r["n_docs"]


def test_discrete_quantile_fraction_guard():
    """Exact small rationals pass (Fraction, tuple, int, dyadic float);
    a float like 0.1 whose binary value is NOT the intended rational
    raises instead of silently approximating."""
    from flink_emqx_connector_spark.operators.quantiles import (
        discrete_quantile_bounds,
    )

    # the conversion guard fires before any Spark work: a None df is
    # fine for the raising paths
    with pytest.raises(ValueError, match="denominator too large or value inexact"):
        discrete_quantile_bounds(None, "v", [0.1])
    with pytest.raises(ValueError, match="denominator too large or value inexact"):
        discrete_quantile_bounds(None, "v", [Fraction(1, 4), 0.3])


def test_discrete_quantile_accepts_exact_forms(spark):
    from flink_emqx_connector_spark.operators.quantiles import (
        discrete_quantile_bounds,
    )

    df = spark.range(1, 101).withColumnRenamed("id", "v")
    row = discrete_quantile_bounds(
        df, "v", [Fraction(1, 10), (1, 4), 0.5, 0.25]
    ).collect()[0]
    # type-1 order statistics over 1..100
    assert (row["q1"], row["q2"], row["q3"], row["q4"]) == (10, 25, 50, 25)


# ---------------------------------------------------------------------------
# Round-12 wave invariants: oracle-SQL property tests on synthetic inputs
# (gate proves Spark ≡ oracle; these pin the FORMULAS against independent
# brute-force recomputes, no Spark session needed)
# ---------------------------------------------------------------------------


def _duck_with(tables: dict):
    import duckdb

    con = duckdb.connect()
    for name, (cols, rows) in tables.items():
        con.execute(f"CREATE TABLE {name} ({cols})")
        placeholders = ",".join("?" * len(rows[0]))
        con.executemany(f"INSERT INTO {name} VALUES ({placeholders})", rows)
    return con


def _docs_rows(rng_rows):
    """(doc_id, lang, source, n_chars) tuples -> documents table spec."""
    return (
        "doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, "
        "n_chars BIGINT",
        [(i, "x", l, s, n) for i, (l, s, n) in enumerate(rng_rows)],
    )


def test_apportionment_seats_sum_and_quota_property():
    """Both allocators hand out exactly 16 seats; Hamilton satisfies the
    quota property (base <= seats <= base+1)."""
    import random

    rnd = random.Random(12)
    rows = [("en", f"s{rnd.randrange(7)}", 100) for _ in range(500)]
    con = _duck_with({"documents": _docs_rows(rows)})
    sql = QUERIES["apportionment_dhondt_vs_hamilton"].oracle
    recs = con.execute(sql).fetchall()
    seats_d = sum(r[2] for r in recs)
    seats_h = sum(r[3] for r in recs)
    assert seats_d == 16 and seats_h == 16, (seats_d, seats_h)
    total = sum(r[1] for r in recs)
    for _, n, _, sh in recs:
        base = n * 16 // total
        assert base <= sh <= base + 1, (n, sh, base)
    con.close()


def test_range_partition_balanced_and_complete():
    """Ranges cover every row exactly once, balanced to ±1, with
    monotone value bounds."""
    import random

    rnd = random.Random(34)
    orders = [
        (i, 1, "O", round(rnd.uniform(1000, 500000), 2), None, "1-URGENT")
        for i in range(997)  # deliberately not divisible by 16
    ]
    con = _duck_with(
        {
            "orders": (
                "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR,"
                " o_totalprice DOUBLE, o_orderdate TIMESTAMP,"
                " o_orderpriority VARCHAR",
                orders,
            )
        }
    )
    recs = con.execute(QUERIES["range_partition_plan"].oracle).fetchall()
    counts = [r[1] for r in recs]
    assert sum(counts) == 997
    assert max(counts) - min(counts) <= 1, counts
    los = [r[2] for r in recs]
    his = [r[3] for r in recs]
    for i in range(1, 16):
        assert his[i - 1] <= los[i], (his[i - 1], los[i])
    con.close()


def test_curriculum_phase_masses_near_quarter():
    """Phase token masses sum to the total and each phase is within one
    max-doc of a quarter (the doc-granularity bound)."""
    import random

    rnd = random.Random(56)
    rows = [("en", "s0", rnd.randrange(1, 600)) for _ in range(800)]
    con = _duck_with({"documents": _docs_rows(rows)})
    recs = con.execute(QUERIES["curriculum_token_phases"].oracle).fetchall()
    total = sum(r[2] for r in recs)
    assert total == sum(n for _, _, n in rows)
    max_doc = max(n for _, _, n in rows)
    for phase, n_docs, mass, _, _ in recs:
        assert abs(mass - total / 4) <= max_doc, (phase, mass, total)
    con.close()


def test_mannwhitney_matches_bruteforce():
    """2U from the census formula equals brute-force pair counting
    (wins + half-ties, doubled) on a small adversarial sample with
    heavy ties."""
    import random

    rnd = random.Random(78)
    rows = [
        (("en", "a" if rnd.random() < 0.4 else "b", rnd.randrange(1, 8)))
        for _ in range(200)
    ]
    con = _duck_with({"documents": _docs_rows(rows)})
    recs = con.execute(QUERIES["mannwhitney_auc_sources"].oracle).fetchall()
    by = {r[0]: r for r in recs}
    for src in ("a", "b"):
        mine = [n for _, s, n in rows if s == src]
        rest = [n for _, s, n in rows if s != src]
        u2_brute = sum(
            2 if x > y else (1 if x == y else 0) for x in mine for y in rest
        )
        assert by[src][2] == u2_brute, (src, by[src][2], u2_brute)
    con.close()


def test_twap_matches_bruteforce():
    import random
    from datetime import datetime, timedelta

    rnd = random.Random(90)
    base = datetime(2025, 1, 1)
    events = []
    for eid in range(300):
        events.append(
            (
                eid,
                base + timedelta(seconds=rnd.randrange(0, 10**6)),
                rnd.randrange(3),
                "view",
                round(rnd.uniform(0, 300), 2),
                "{}",
            )
        )
    con = _duck_with(
        {
            "events": (
                "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
                " event_type VARCHAR, value DOUBLE, props VARCHAR",
                events,
            )
        }
    )
    recs = con.execute(QUERIES["twap_user_value"].oracle).fetchall()
    got = {r[0]: r[2] for r in recs}
    # brute force per user
    from collections import defaultdict

    per = defaultdict(list)
    for eid, ts, uid, _, v, _ in events:
        per[uid].append((ts, eid, int(v * 100 + 0.5)))
    for uid, rows_u in per.items():
        rows_u.sort()
        num = den = 0
        for (t1, _, c), (t2, _, _) in zip(rows_u, rows_u[1:]):
            dt = int((t2 - t1).total_seconds() * 1e6)
            num += c * dt
            den += dt
        if den > 0:
            want = (num // den) * 1000 + ((num % den) * 1000) // den
            assert got[uid] == want, (uid, got[uid], want)
    con.close()


def test_trimmed_winsorized_matches_bruteforce():
    import random

    rnd = random.Random(11)
    orders = [
        (i, 1, "O", round(rnd.uniform(100, 9999), 2), None,
         "1-URGENT" if i % 2 else "2-HIGH")
        for i in range(403)
    ]
    con = _duck_with(
        {
            "orders": (
                "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR,"
                " o_totalprice DOUBLE, o_orderdate TIMESTAMP,"
                " o_orderpriority VARCHAR",
                orders,
            )
        }
    )
    recs = con.execute(
        QUERIES["trimmed_winsorized_order_stats"].oracle
    ).fetchall()
    by = {r[0]: r for r in recs}
    from collections import defaultdict

    groups = defaultdict(list)
    for key, _, _, price, _, prio in orders:
        groups[prio].append((int(price * 100 + 0.5), key))
    for prio, vals in groups.items():
        vals.sort()
        cents = [c for c, _ in vals]
        n = len(cents)
        t = n // 10
        trimmed = cents[t : n - t]
        p10 = cents[(n + 9) // 10 - 1]
        p90 = cents[(9 * n + 9) // 10 - 1]
        wins = [min(max(c, p10), p90) for c in cents]
        row = by[prio]
        assert row[1] == n
        assert row[2] == p10 and row[3] == p90, (row, p10, p90)
        assert row[4] == sum(trimmed) * 1000 // len(trimmed)
        assert row[5] == sum(wins) * 1000 // n
    con.close()


def test_simpson_bounds_and_exactness():
    from fractions import Fraction
    import random

    rnd = random.Random(22)
    rows = [
        (rnd.choice(["en", "de", "fr"]), "s0", 100) for _ in range(300)
    ] + [("en", "s1", 100)] * 50  # monolingual source → D = 0
    con = _duck_with({"documents": _docs_rows(rows)})
    recs = con.execute(QUERIES["simpson_diversity_sources"].oracle).fetchall()
    by = {r[0]: r for r in recs}
    assert by["s1"][3] == 0  # monolingual
    # exact fraction recompute for s0
    from collections import Counter

    cnt = Counter(l for l, s, _ in rows if s == "s0")
    n = sum(cnt.values())
    d = Fraction(n * (n - 1) - sum(c * (c - 1) for c in cnt.values()),
                 n * (n - 1))
    want = (d.numerator * 10**6) // d.denominator
    assert by["s0"][3] == want, (by["s0"][3], want)
    con.close()


# ---------------------------------------------------------------------------
# MQTT publish-gate timeout diagnostics (round-11 ADVICE, mqtt_wire.py)
# ---------------------------------------------------------------------------


def _gated_client():
    from flink_emqx_connector_spark.sources.mqtt_wire import Client

    c = Client(client_id="t-timeout")
    # make the condition wait return immediately so the 30 s deadline
    # logic resolves in one loop pass without real sleeping
    c._quota_cv.wait = lambda timeout=None: False
    return c


def test_publish_timeout_reports_missing_connack():
    """Timeout while the CONNACK was never processed must diagnose a
    connection failure, not flow-control exhaustion."""
    c = _gated_client()
    c._running = True
    c._quota_known = False
    with pytest.raises(TimeoutError, match="CONNACK not received"):
        c.publish("t", b"x", qos=1)


def test_publish_timeout_reports_quota_exhaustion():
    """Timeout with a known, fully-consumed quota keeps the
    Receive-Maximum exhaustion message."""
    c = _gated_client()
    c._running = True
    c._quota_known = True
    c._send_quota = 1
    c._inflight_out = 1
    with pytest.raises(TimeoutError, match="Receive-Maximum 1.*exhausted"):
        c.publish("t", b"x", qos=1)


# ---------------------------------------------------------------------------
# Hypothesis fuzz: allocator/planner invariants over random inputs
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings, strategies as st

    _HAVE_HYP = True
except Exception:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=2000), min_size=1,
                 max_size=40)
    )
    def test_waterfill_budget_exact_fuzz(caps):
        cells = [("s", f"l{i:03d}", n) for i, n in enumerate(caps)]
        rows, con = _run_waterfill_oracle(cells)
        _check_invariants(rows, cells)
        con.close()

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=5000), min_size=1,
                 max_size=12)
    )
    def test_dhondt_fuzz_seats_sum_and_divisor_optimality(counts):
        """Seats always sum to 16; the D'Hondt allocation maximizes the
        minimum quotient among awarded seats (equivalently: no source
        could justify stealing a seat — its next quotient never exceeds
        another's last awarded quotient)."""
        from fractions import Fraction

        rows = []
        for i, n in enumerate(counts):
            rows.extend([("en", f"s{i:02d}", 1)] * 0)  # placeholder
        # build documents with n docs per source
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents (doc_id BIGINT, text VARCHAR,"
            " lang VARCHAR, source VARCHAR, n_chars BIGINT)"
        )
        did = 0
        for i, n in enumerate(counts):
            con.execute(
                f"INSERT INTO documents SELECT {did} + range, 'x', 'en',"
                f" 's{i:02d}', 100 FROM range({n})"
            )
            did += n
        recs = con.execute(
            QUERIES["apportionment_dhondt_vs_hamilton"].oracle
        ).fetchall()
        seats = {r[0]: r[2] for r in recs}
        ns = {r[0]: r[1] for r in recs}
        assert sum(seats.values()) == 16
        assert sum(r[3] for r in recs) == 16  # hamilton too
        # divisor-optimality: for any pair (a with a seat to lose, b),
        # b's NEXT quotient n_b/(s_b+1) must not exceed a's LAST awarded
        # quotient n_a/s_a (ties legal — broken by name/divisor)
        for a, sa in seats.items():
            if sa == 0:
                continue
            last_a = Fraction(ns[a], sa)
            for b, sb in seats.items():
                if b == a:
                    continue
                nxt_b = Fraction(ns[b], sb + 1)
                assert nxt_b <= last_a, (a, b, last_a, nxt_b)
        con.close()

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=100, max_value=50_000_00), min_size=16,
            max_size=300,
        )
    )
    def test_range_partition_fuzz(cents_list):
        """Random (possibly heavily tied) value sets: ranges stay
        complete, ±1 balanced, and value-monotone."""
        orders = [
            (i, 1, "O", c / 100.0, None, "1-URGENT")
            for i, c in enumerate(cents_list)
        ]
        con = _duck_with(
            {
                "orders": (
                    "o_orderkey BIGINT, o_custkey BIGINT,"
                    " o_orderstatus VARCHAR, o_totalprice DOUBLE,"
                    " o_orderdate TIMESTAMP, o_orderpriority VARCHAR",
                    orders,
                )
            }
        )
        recs = con.execute(QUERIES["range_partition_plan"].oracle).fetchall()
        counts = [r[1] for r in recs]
        assert sum(counts) == len(orders)
        assert max(counts) - min(counts) <= 1, counts
        prev_hi = None
        for _, _, lo, hi in recs:
            assert lo <= hi
            if prev_hi is not None:
                assert prev_hi <= lo
            prev_hi = hi
        con.close()


# ---------------------------------------------------------------------------
# Wave-4/5 brute-force recomputes
# ---------------------------------------------------------------------------


def test_kaplan_meier_matches_manual_product():
    """Small synthetic cohort with known conversions/censoring: the KM
    oracle must equal the hand-rolled product-limit estimator."""
    from datetime import datetime, timedelta
    import math

    base = datetime(2025, 3, 1)
    events = []
    eid = 0

    def add(uid, day_offset, etype):
        nonlocal eid
        events.append(
            (eid, base + timedelta(days=day_offset), uid, etype, 1.0, "{}")
        )
        eid += 1

    # users 0..5 view on day 0; purchases at days 1,1,3 for users 0,1,2;
    # users 3,4,5 never purchase (censored at horizon = max ts)
    for u in range(6):
        add(u, 0, "view")
    add(0, 1, "purchase")
    add(1, 1, "purchase")
    add(2, 3, "purchase")
    add(5, 9, "click")  # horizon = day 9
    con = _duck_with(
        {
            "events": (
                "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
                " event_type VARCHAR, value DOUBLE, props VARCHAR",
                events,
            )
        }
    )
    recs = con.execute(
        QUERIES["kaplan_meier_time_to_purchase"].oracle
    ).fetchall()
    # day 1: 6 at risk, 2 events -> S = 4/6; day 3: 4 at risk, 1 event
    # -> S = 4/6 * 3/4 = 0.5
    by = {r[0]: r for r in recs}
    assert set(by) == {1, 3}, recs
    assert by[1][1] == 6 and by[1][2] == 2
    assert by[3][1] == 4 and by[3][2] == 1
    assert abs(by[1][4] - 4 / 6) < 1e-6
    assert abs(by[3][4] - 0.5) < 1e-6
    con.close()


def test_fano_matches_numpy():
    import numpy as np
    from datetime import datetime, timedelta

    rnd = np.random.default_rng(5)
    base = datetime(2025, 1, 1)
    events = []
    eid = 0
    for day in range(20):
        for _ in range(int(rnd.integers(1, 50))):
            events.append(
                (eid, base + timedelta(days=day, seconds=int(rnd.integers(0, 3600))),
                 1, "click", 1.0, "{}")
            )
            eid += 1
    con = _duck_with(
        {
            "events": (
                "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
                " event_type VARCHAR, value DOUBLE, props VARCHAR",
                events,
            )
        }
    )
    rec = con.execute(
        QUERIES["fano_burstiness_event_types"].oracle
    ).fetchone()
    # exact integer recompute
    from collections import Counter

    daily = Counter(e[1].date() for e in events)
    xs = list(daily.values())
    n = len(xs)
    num = n * sum(x * x for x in xs) - sum(xs) ** 2
    den = n * sum(xs)
    want = (num // den) * 1000 + ((num % den) * 1000) // den
    assert rec[3] == want, (rec, want)
    # and it equals floor(1000 * var_pop/mean) within 1 milli
    import statistics

    fano_float = statistics.pvariance(xs) / statistics.mean(xs)
    assert abs(rec[3] - fano_float * 1000) <= 1, (rec[3], fano_float * 1000)
    con.close()


def test_log2_histogram_exact_at_power_of_two_boundaries():
    """Gaps of exactly 2^k land in bucket k (the case FP floor(log2)
    gets wrong by one ulp on one engine)."""
    from datetime import datetime, timedelta

    base = datetime(2025, 1, 1)
    events = [(0, base, 1, "click", 1.0, "{}")]
    t = base
    eid = 1
    for k in (10, 20, 26, 30):  # gaps 2^k microseconds
        t = t + timedelta(microseconds=2**k)
        events.append((eid, t, 1, "click", 1.0, "{}"))
        eid += 1
    con = _duck_with(
        {
            "events": (
                "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
                " event_type VARCHAR, value DOUBLE, props VARCHAR",
                events,
            )
        }
    )
    recs = con.execute(QUERIES["log2_latency_histogram"].oracle).fetchall()
    got = {r[1]: (r[2], r[3]) for r in recs}
    assert set(got) == {10, 20, 26, 30}, recs
    for k in got:
        assert got[k][0] == 2**k  # bucket_lo is exactly the power
        assert got[k][1] == 1
    con.close()


def test_median_ci_brackets_median_and_uses_real_ranks():
    import random

    rnd = random.Random(3)
    orders = [
        (i, 1, "O", round(rnd.uniform(100, 9999), 2), None, "1-URGENT")
        for i in range(501)
    ]
    con = _duck_with(
        {
            "orders": (
                "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR,"
                " o_totalprice DOUBLE, o_orderdate TIMESTAMP,"
                " o_orderpriority VARCHAR",
                orders,
            )
        }
    )
    rec = con.execute(QUERIES["median_ci_order_statistic"].oracle).fetchone()
    priority, n, med, lo, hi, lo_rank, hi_rank = rec
    assert n == 501
    cents = sorted(int(p * 100 + 0.5) for _, _, _, p, _, _ in orders)
    assert med == cents[(n + 1) // 2 - 1]
    assert lo == cents[lo_rank - 1] and hi == cents[hi_rank - 1]
    assert lo <= med <= hi
    assert 1 <= lo_rank < hi_rank <= n
    con.close()


def test_durbin_watson_matches_float_formula():
    import numpy as np
    from datetime import datetime, timedelta

    rnd = np.random.default_rng(9)
    base = datetime(2025, 1, 1)
    events = []
    eid = 0
    for day in range(30):
        for _ in range(int(rnd.integers(5, 80))):
            events.append(
                (eid, base + timedelta(days=day, seconds=int(rnd.integers(0, 3600))),
                 1, "view", 1.0, "{}")
            )
            eid += 1
    con = _duck_with(
        {
            "events": (
                "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
                " event_type VARCHAR, value DOUBLE, props VARCHAR",
                events,
            )
        }
    )
    rec = con.execute(QUERIES["durbin_watson_daily_events"].oracle).fetchone()
    from collections import Counter

    daily = Counter(e[1].date() for e in events)
    xs = np.array([daily[d] for d in sorted(daily)], dtype=float)
    e = xs - xs.mean()
    dw = float(np.sum(np.diff(e) ** 2) / np.sum(e**2))
    assert abs(rec[2] - dw * 1000) <= 1, (rec[2], dw * 1000)
    con.close()


def test_runs_test_matches_manual_count():
    from datetime import datetime, timedelta

    base = datetime(2025, 1, 1)
    # daily counts: 5,1,5,1,5,1,9 -> median 5; strict above: only 9;
    # below: 1,1,1; ties (the 5s) dropped -> sequence B,B,B,A -> 2 runs
    counts = [5, 1, 5, 1, 5, 1, 9]
    events = []
    eid = 0
    for day, c in enumerate(counts):
        for _ in range(c):
            events.append(
                (eid, base + timedelta(days=day, seconds=eid % 3600), 1,
                 "view", 1.0, "{}")
            )
            eid += 1
    con = _duck_with(
        {
            "events": (
                "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
                " event_type VARCHAR, value DOUBLE, props VARCHAR",
                events,
            )
        }
    )
    rec = con.execute(QUERIES["runs_test_daily_events"].oracle).fetchone()
    _, runs, n_above, n_below, exp_milli = rec
    assert (runs, n_above, n_below) == (2, 1, 3), rec
    assert exp_milli == 1000 + (2 * 1 * 3 * 1000) // 4  # 1 + 1.5 -> 2500
    con.close()


def test_changepoint_finds_known_level_shift():
    """Series with an obvious level shift at a known day: the argmax
    must land exactly there, with the exact segment means."""
    from datetime import datetime, timedelta

    base = datetime(2025, 1, 1)
    events = []
    eid = 0
    counts = [10] * 12 + [40] * 8  # shift after day 11
    for day, c in enumerate(counts):
        for _ in range(c):
            events.append(
                (eid, base + timedelta(days=day, seconds=eid % 3600), 1,
                 "view", 1.0, "{}")
            )
            eid += 1
    con = _duck_with(
        {
            "events": (
                "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
                " event_type VARCHAR, value DOUBLE, props VARCHAR",
                events,
            )
        }
    )
    rec = con.execute(QUERIES["changepoint_daily_events"].oracle).fetchone()
    split_day, nb, na, mb, ma, score = rec
    day0 = (base.date() - datetime(1970, 1, 1).date()).days
    assert split_day == day0 + 11, rec  # last day of the low regime
    assert (nb, na) == (12, 8)
    assert mb == 10_000 and ma == 40_000
    con.close()


def test_capture_recapture_exact_on_known_overlap():
    # source A: 6 distinct texts; source B: 4 distinct; 2 shared
    rows = []
    for i in range(6):
        rows.append((f"t{i}", "en", "A", 10))
    for i in range(4, 8):
        rows.append((f"t{i}", "en", "B", 10))
    docs = (
        "doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR,"
        " n_chars BIGINT",
        [(j, t, l, s, n) for j, (t, l, s, n) in enumerate(rows)],
    )
    con = _duck_with({"documents": docs})
    rec = con.execute(QUERIES["capture_recapture_estimate"].oracle).fetchone()
    n1, n2, m, est = rec
    assert (n1, n2, m) == (6, 4, 2)
    assert est == 6 * 4 // 2  # 12 — the true population is 8, estimator biased high on tiny m
    con.close()


def test_chao1_exact_on_known_frequencies():
    # vocab: 'a' x3, 'b' x2, 'c' x1, 'd' x1 -> D=4, n1=2, n2=1
    docs = (
        "doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR,"
        " n_chars BIGINT",
        [(0, "a a a b", "en", "s", 7), (1, "b c d", "en", "s", 5)],
    )
    con = _duck_with({"documents": docs})
    rec = con.execute(QUERIES["chao1_vocab_richness"].oracle).fetchone()
    lang, d, n1, n2, chao_milli = rec
    assert (d, n1, n2) == (4, 2, 1)
    assert chao_milli == 4000 + (2 * 2 * 1000) // (2 * 1)  # 4 + 2 = 6.000
    con.close()
