"""datapipe29 queries (bonus staged batch, no pinned publication
round): full local verification against the DuckDB oracles — the same
comparison the driver gate runs — plus adversarial fixtures run
through BOTH engines and hand-computed expectations. A staged-scope
plan lint mirrors tests/test_plan_lint.py until publication moves
these names under the fleet-wide lint (_BNLJ_OK → BNLJ_OK; the orphan
test enforces the copy). Written in the same commit as the module
(the datapipe23 lesson)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from cqdg_etl_spark.queries.datapipe29 import (
    _EULER_GAMMA,
    _PGRAM_PERIODS,
    _PGRAM_SPINE,
    _RET_FACTOR,
    _SQRT6_OVER_PI,
    STAGED,
)
from tests.oracle_harness import canonical_rows, duckdb_conn
from tests.test_plan_lint import _global_windows


def _compare_staged(spark, name: str, sf_dir: str, con=None) -> None:
    q = STAGED[name]
    actual = q.fn(spark, sf_dir).toPandas()
    con = con or duckdb_conn(sf_dir)
    expected = con.execute(q.oracle).df()
    assert sorted(actual.columns) == sorted(expected.columns), name
    assert len(actual) == len(expected), (
        f"{name}: rows spark={len(actual)} oracle={len(expected)}"
    )
    a, e = canonical_rows(actual), canonical_rows(expected)
    if a != e:
        only_a = [r for r in a if r not in set(e)][:5]
        only_e = [r for r in e if r not in set(a)][:5]
        raise AssertionError(
            f"{name}: value mismatch.\n only-spark: {only_a}\n"
            f" only-oracle: {only_e}"
        )


def test_staged_not_published():
    """Staged names stay out of REGISTRY until a future publication
    flips them in (the datapipe13-28 staging discipline)."""
    from cqdg_etl_spark.queries import REGISTRY

    assert not (set(STAGED) & set(REGISTRY)), (
        "staged datapipe29 names leaked into the published registry"
    )


def test_staged_batch_size():
    assert len(STAGED) == 6


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_oracle_match(spark, sf_dir, name):
    _compare_staged(spark, name, sf_dir)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_oracle_match_sf_medium(spark, name):
    """Two-SF staging verification in CI (the round-8
    institutionalization)."""
    from tests.conftest import SF_MEDIUM

    _compare_staged(spark, name, SF_MEDIUM)


# ---------------------------------------------------------- plan lint

_FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin",
              "BatchEvalPython ")

# Reviewed exceptions, the fleet BNLJ_OK convention. Publication must
# move these into tests/test_plan_lint.py::BNLJ_OK (enforced by
# test_no_orphaned_staged_exceptions).
_BNLJ_OK: dict[str, str] = {
    "ev_periodogram_daily": "the 1-row (min-day, n, sum-y) scalar "
    "fanned onto the |days| daily frame; the trig spine itself joins "
    "on the (period, phase) equi-key",
    "ev_gumbel_block_maxima": "the 1-row min-day scalar fanned onto "
    "the |days| daily frame",
    "ev_bh_fdr_event_types": "the 1-row era-midpoint scalar fanned "
    "onto the events scan",
    "sk_histogram_quantile_audit": "the 1-row min/max/count scalar "
    "and 3-row quantile spine fanned onto bounded frames; the "
    "cum >= target range join runs on the <=256-bin frame",
    "pf_theil_sen_daily_revenue": "the 1-row min-day and "
    "median-slope scalars, plus the |days|^2 pair self-join on the "
    "DAILY frame — bounded by the calendar span squared, never the "
    "corpus",
}

_GLOBAL_WINDOW_OK: dict[str, str] = {
    "ev_bh_fdr_event_types": "rank/count/max windows over the "
    "|event_type|-bounded frame",
    "sk_histogram_quantile_audit": "cumulative-count window over "
    "the <=256-bin frame",
}


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_plan_lint(spark, sf_dir, name):
    df = STAGED[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "extended"
        )
    )
    for node in _FORBIDDEN:
        if node == "BroadcastNestedLoopJoin" and name in _BNLJ_OK:
            assert node in plan, (
                f"{name}: reviewed BNLJ exception no longer applies — "
                "remove it from _BNLJ_OK"
            )
            continue
        assert node not in plan, f"{name}: {node} in physical plan\n{plan}"
    gw = _global_windows(plan)
    if name in _GLOBAL_WINDOW_OK:
        assert gw, f"{name}: stale _GLOBAL_WINDOW_OK entry"
    else:
        assert gw == 0, (
            f"{name}: {gw} global (single-partition) window(s)\n{plan}"
        )


# ----------------------------------------------------- fixture helpers


def _fixture_dir(spark, tmp_path, **tables) -> str:
    d = str(tmp_path / "fx")
    for name, df in tables.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/{name}.parquet")
    return d


def _fixture_conn(d: str, *tables: str):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{d}/{t}.parquet/*.parquet'"
        )
    return con


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
_LI_SCHEMA = "l_orderkey long, l_partkey long, l_suppkey long"

_T0 = dt.datetime(2024, 1, 1)


def _events_with_daily_counts(spark, counts: list[int], value=1.0):
    """One events frame whose daily counts are exactly ``counts``
    (day i gets counts[i] events, all at distinct timestamps)."""
    rows, eid = [], 0
    for i, c in enumerate(counts):
        for j in range(c):
            rows.append(
                (eid, _T0 + dt.timedelta(days=i, seconds=j + 1), 1,
                 "view", value, "{}")
            )
            eid += 1
    return spark.createDataFrame(rows, _EV_SCHEMA)


def _q6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _type7(sorted_xs, p):
    h = (len(sorted_xs) - 1) * p
    lo = int(math.floor(h))
    if lo + 1 >= len(sorted_xs):
        return sorted_xs[lo]
    return sorted_xs[lo] + (h - lo) * (sorted_xs[lo + 1] - sorted_xs[lo])


# ------------------------------------------------- periodogram


def _pgram_expected(counts: list[int]) -> dict[int, float]:
    """Python replication of the literal-spine periodogram (float
    accumulation — the DECIMAL(38,12) term quantization is below the
    1e-6 _q6 grain for these magnitudes)."""
    n = len(counts)
    ybar = sum(counts) / n
    spine = {(p, ph): (c, s) for p, ph, c, s in _PGRAM_SPINE}
    out = {}
    for p in _PGRAM_PERIODS:
        cc = sum((y - ybar) * spine[(p, i % p)][0]
                 for i, y in enumerate(counts))
        ss = sum((y - ybar) * spine[(p, i % p)][1]
                 for i, y in enumerate(counts))
        out[p] = (cc * cc + ss * ss) / n
    return out


def test_periodogram_hand_replicated(spark, tmp_path):
    """28 days alternating 10/30 every other day (period 2): the P=2
    power dominates and every cell matches the Python replication of
    the shared literal spine."""
    counts = [10 if i % 2 == 0 else 30 for i in range(28)]
    d = _fixture_dir(
        spark, tmp_path, events=_events_with_daily_counts(spark, counts)
    )
    rows = {
        r["period_days"]: r
        for r in STAGED["ev_periodogram_daily"].fn(spark, d).collect()
    }
    exp = _pgram_expected(counts)
    assert set(rows) == set(_PGRAM_PERIODS)
    for p in _PGRAM_PERIODS:
        assert rows[p]["n_days"] == 28
        assert rows[p]["power"] == pytest.approx(_q6(exp[p]), abs=2e-6), p
    # the injected cycle dominates the spectrum
    assert max(exp, key=exp.get) == 2
    assert rows[2]["power"] > 10 * max(
        v for p, v in exp.items() if p != 2 and p % 2 != 0
    )
    _compare_staged(spark, "ev_periodogram_daily", d,
                    con=_fixture_conn(d, "events"))


def test_periodogram_flat_series_zero_power(spark, tmp_path):
    """A constant daily series has zero power at every period."""
    d = _fixture_dir(
        spark, tmp_path, events=_events_with_daily_counts(spark, [7] * 14)
    )
    for r in STAGED["ev_periodogram_daily"].fn(spark, d).collect():
        assert r["power"] == pytest.approx(0.0, abs=2e-6)
    _compare_staged(spark, "ev_periodogram_daily", d,
                    con=_fixture_conn(d, "events"))


# ------------------------------------------------- Gumbel


def test_gumbel_hand_computed(spark, tmp_path):
    """21 days → 3 weekly blocks with maxima {9, 12, 10}: method-of-
    moments Gumbel fit and the 26-block return level, hand-computed."""
    counts = (
        [5, 9, 7, 3, 6, 4, 2]      # block max 9
        + [3, 12, 4, 1, 2, 2, 2]   # block max 12
        + [8, 8, 10, 1, 1, 1, 1]   # block max 10
    )
    d = _fixture_dir(
        spark, tmp_path, events=_events_with_daily_counts(spark, counts)
    )
    r = STAGED["ev_gumbel_block_maxima"].fn(spark, d).collect()[0].asDict()
    ms = [9.0, 12.0, 10.0]
    n, sm, sq = 3, sum(ms), sum(m * m for m in ms)
    mean = sm / n
    beta = math.sqrt((sq - sm * sm / n) / (n - 1)) * _SQRT6_OVER_PI
    mu = mean - _EULER_GAMMA * beta
    assert r["n_blocks"] == 3
    assert r["block_mean"] == pytest.approx(_q6(mean), abs=1e-9)
    assert r["gumbel_beta"] == pytest.approx(_q6(beta), abs=2e-6)
    assert r["gumbel_mu"] == pytest.approx(_q6(mu), abs=2e-6)
    assert r["return_level_26w"] == pytest.approx(
        _q6(mu + beta * _RET_FACTOR), abs=2e-6
    )
    _compare_staged(spark, "ev_gumbel_block_maxima", d,
                    con=_fixture_conn(d, "events"))


def test_gumbel_single_block_null_fit(spark, tmp_path):
    """n_blocks = 1 → NULL β (and NULL-propagated μ / return level)
    on both engines, never a division error."""
    d = _fixture_dir(
        spark, tmp_path,
        events=_events_with_daily_counts(spark, [4, 6, 5]),
    )
    r = STAGED["ev_gumbel_block_maxima"].fn(spark, d).collect()[0].asDict()
    assert r["n_blocks"] == 1
    assert r["block_mean"] == 6.0
    assert r["gumbel_beta"] is None
    assert r["gumbel_mu"] is None
    assert r["return_level_26w"] is None
    _compare_staged(spark, "ev_gumbel_block_maxima", d,
                    con=_fixture_conn(d, "events"))


# ------------------------------------------------- BH FDR


def test_bh_fdr_hand_scenario(spark, tmp_path):
    """Three types: 'shift' moves hard between eras (tiny p),
    'stable' does not (z = 0 → p = 1), 'thin' has n < 2 in an era
    (p = 1 by guard). With m = 3 and q = 0.10 only 'shift' clears its
    BH threshold."""
    rows, eid = [], 0
    early = _T0
    late = _T0 + dt.timedelta(days=8)
    # 'shift': early ~10 (jittered), late ~50 (jittered)
    for j in range(10):
        rows.append((eid, early + dt.timedelta(seconds=j), 1, "shift",
                     10.0 + 0.01 * (j % 2), "{}")); eid += 1
        rows.append((eid, late + dt.timedelta(seconds=j), 1, "shift",
                     50.0 + 0.01 * (j % 2), "{}")); eid += 1
    # 'stable': identical samples in both eras
    for j in range(10):
        rows.append((eid, early + dt.timedelta(seconds=100 + j), 2,
                     "stable", 15.0 + 0.1 * (j % 3), "{}")); eid += 1
        rows.append((eid, late + dt.timedelta(seconds=100 + j), 2,
                     "stable", 15.0 + 0.1 * (j % 3), "{}")); eid += 1
    # 'thin': one event per era
    rows.append((eid, early + dt.timedelta(seconds=200), 3, "thin",
                 1.0, "{}")); eid += 1
    rows.append((eid, late + dt.timedelta(seconds=200), 3, "thin",
                 9.0, "{}")); eid += 1
    d = _fixture_dir(
        spark, tmp_path, events=spark.createDataFrame(rows, _EV_SCHEMA)
    )
    got = {
        r["event_type"]: r
        for r in STAGED["ev_bh_fdr_event_types"].fn(spark, d).collect()
    }
    assert got["shift"]["discovered"] is True
    assert got["shift"]["bh_rank"] == 1
    assert got["shift"]["p_chebyshev"] < 0.034
    assert got["stable"]["discovered"] is False
    assert got["stable"]["p_chebyshev"] == 1.0
    assert got["thin"]["discovered"] is False
    assert got["thin"]["p_chebyshev"] == 1.0
    assert got["thin"]["z_squared"] == 0.0
    # deterministic tie-break: stable < thin lexicographically at p=1
    assert got["stable"]["bh_rank"] == 2
    assert got["thin"]["bh_rank"] == 3
    _compare_staged(spark, "ev_bh_fdr_event_types", d,
                    con=_fixture_conn(d, "events"))


# ------------------------------------------------- histogram quantiles


def test_hist_quantile_hand_computed(spark, tmp_path):
    """Five orders at {0, 64, 128, 192, 256}: w = 1, bins {0, 64,
    128, 192, 255}; the CDF-inverse estimates and the type-7 exacts
    are hand-computed — including the small-n convention gap the
    docstring documents (q=0.9: est 255.5 vs exact 230.4)."""
    vals = [0.0, 64.0, 128.0, 192.0, 256.0]
    rows = [
        (i + 1, 1, "O", v, _T0 + dt.timedelta(days=i), "1-URGENT")
        for i, v in enumerate(vals)
    ]
    d = _fixture_dir(
        spark, tmp_path, orders=spark.createDataFrame(rows, _ORD_SCHEMA)
    )
    got = {
        r["q"]: r
        for r in STAGED["sk_histogram_quantile_audit"].fn(spark, d).collect()
    }
    # hand: n=5, mn=0, mx=256, w=1.0
    # q=0.5: target 2.5 → bin 128 (cum 3, before 2) → 128 + 0.5
    assert got[0.5]["est_quantile"] == pytest.approx(128.5, abs=1e-9)
    assert got[0.5]["exact_quantile"] == pytest.approx(
        _type7(vals, 0.5), abs=1e-9
    )
    # q=0.9: target 4.5 → bin 255 (cum 5, before 4) → 255.5
    assert got[0.9]["est_quantile"] == pytest.approx(255.5, abs=1e-9)
    assert got[0.9]["exact_quantile"] == pytest.approx(
        _type7(vals, 0.9), abs=1e-9
    )
    assert got[0.9]["abs_err"] == pytest.approx(
        _q6(abs(255.5 - _type7(vals, 0.9))), abs=2e-6
    )
    for q in (0.5, 0.9, 0.99):
        assert got[q]["n_rows"] == 5
        assert got[q]["bin_width"] == pytest.approx(1.0, abs=1e-9)
    _compare_staged(spark, "sk_histogram_quantile_audit", d,
                    con=_fixture_conn(d, "orders"))


def test_hist_quantile_tightens_on_real_data(spark, sf_dir):
    """On the real corpus the estimate lands within ~a bin width of
    the exact percentile (the convention gap vanishes at n ≫ bins)."""
    rows = STAGED["sk_histogram_quantile_audit"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["abs_err"] <= 1.5 * r["bin_width"], r


# ------------------------------------------------- Theil–Sen


def test_theil_sen_hand_computed(spark, tmp_path):
    """Five days of revenue {10, 12, 14, 16, 100}: the outlier day
    drags OLS but the median of the 10 pairwise slopes is exactly 2
    and the median residual intercept is exactly 10."""
    revs = [10.0, 12.0, 14.0, 16.0, 100.0]
    rows = [
        (i + 1, 1, "O", v, _T0 + dt.timedelta(days=i), "1-URGENT")
        for i, v in enumerate(revs)
    ]
    d = _fixture_dir(
        spark, tmp_path, orders=spark.createDataFrame(rows, _ORD_SCHEMA)
    )
    r = STAGED["pf_theil_sen_daily_revenue"].fn(spark, d).collect()[0]
    slopes = sorted(
        (revs[j] - revs[i]) / (j - i)
        for i in range(5) for j in range(i + 1, 5)
    )
    assert r["n_days"] == 5
    assert r["n_pairs"] == 10
    assert r["sen_slope"] == pytest.approx(_type7(slopes, 0.5), abs=1e-9)
    res = sorted(v - 2.0 * i for i, v in enumerate(revs))
    assert r["sen_intercept"] == pytest.approx(_type7(res, 0.5), abs=1e-9)
    _compare_staged(spark, "pf_theil_sen_daily_revenue", d,
                    con=_fixture_conn(d, "orders"))


def test_theil_sen_split_days_aggregate_first(spark, tmp_path):
    """Multiple orders on one day roll up BEFORE the pair
    enumeration — two half-revenue orders per day give the same line
    as one full-revenue order."""
    rows = []
    for i, v in enumerate([10.0, 12.0, 14.0]):
        rows.append((2 * i, 1, "O", v / 2,
                     _T0 + dt.timedelta(days=i, hours=1), "1-URGENT"))
        rows.append((2 * i + 1, 1, "O", v / 2,
                     _T0 + dt.timedelta(days=i, hours=2), "1-URGENT"))
    d = _fixture_dir(
        spark, tmp_path, orders=spark.createDataFrame(rows, _ORD_SCHEMA)
    )
    r = STAGED["pf_theil_sen_daily_revenue"].fn(spark, d).collect()[0]
    assert r["n_days"] == 3
    assert r["n_pairs"] == 3
    assert r["sen_slope"] == pytest.approx(2.0, abs=1e-9)
    assert r["sen_intercept"] == pytest.approx(10.0, abs=1e-9)
    _compare_staged(spark, "pf_theil_sen_daily_revenue", d,
                    con=_fixture_conn(d, "orders"))


# ------------------------------------------------- FD audit


def test_fd_audit_hand_computed(spark, tmp_path):
    """Hand-built tables where each candidate's violation count is
    known: keys hold, the plausible-but-false invariants quantify."""
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5.0, _T0, "1-URGENT"),
            (2, 10, "O", 5.0, _T0, "2-HIGH"),
            (3, 20, "O", 5.0, _T0, "2-HIGH"),
        ],
        _ORD_SCHEMA,
    )
    lineitem = spark.createDataFrame(
        [(1, 100, 7), (1, 100, 8), (2, 200, 7)], _LI_SCHEMA
    )
    events = spark.createDataFrame(
        [
            (1, _T0, 1, "view", 1.0, "{}"),
            (2, _T0, 1, "click", 1.0, "{}"),
            (3, _T0, 2, "view", 1.0, "{}"),
        ],
        _EV_SCHEMA,
    )
    d = _fixture_dir(
        spark, tmp_path, orders=orders, lineitem=lineitem, events=events
    )
    got = {
        (r["rel"], r["lhs_col"], r["rhs_col"]): r
        for r in STAGED["pf_fd_violation_audit"].fn(spark, d).collect()
    }
    exp = {
        ("orders", "o_orderkey", "o_custkey"): (3, 0, 1, True),
        ("orders", "o_custkey", "o_orderpriority"): (2, 1, 2, False),
        ("lineitem", "l_orderkey", "l_suppkey"): (2, 1, 2, False),
        ("lineitem", "l_partkey", "l_suppkey"): (2, 1, 2, False),
        ("events", "event_id", "user_id"): (3, 0, 1, True),
        ("events", "user_id", "event_type"): (2, 1, 2, False),
    }
    assert set(got) == set(exp)
    for k, (n_lhs, viol, fanout, holds) in exp.items():
        r = got[k]
        assert r["n_lhs"] == n_lhs, k
        assert r["violating_lhs"] == viol, k
        assert r["max_fanout"] == fanout, k
        assert r["fd_holds"] is holds, k
        assert r["violation_rate"] == pytest.approx(
            _q6(viol / n_lhs), abs=1e-9
        ), k
    _compare_staged(
        spark, "pf_fd_violation_audit", d,
        con=_fixture_conn(d, "orders", "lineitem", "events"),
    )


def test_fd_audit_real_keys_hold(spark, sf_dir):
    """On the real corpus the two genuine keys hold and the
    deliberate negatives do not."""
    got = {
        (r["rel"], r["lhs_col"]): r["fd_holds"]
        for r in STAGED["pf_fd_violation_audit"].fn(spark, sf_dir).collect()
    }
    assert got[("orders", "o_orderkey")] is True
    assert got[("events", "event_id")] is True
    assert got[("events", "user_id")] is False
