"""datapipe26 queries (staged for round-18 publication): full local
verification against the DuckDB oracles — the same comparison the
driver gate runs — plus adversarial fixtures run through BOTH engines
and hand-computed expectations. A staged-scope plan lint mirrors
tests/test_plan_lint.py until publication moves these names under the
fleet-wide lint (_BNLJ_OK → BNLJ_OK; the orphan test enforces the
copy). Written in the same commit as the module (the datapipe23
lesson)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest

from cqdg_etl_spark.queries.datapipe26 import STAGED
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
    """Staged names stay out of REGISTRY until the round-18 publication
    flips them in (the datapipe13-25 staging discipline)."""
    from cqdg_etl_spark.queries import REGISTRY

    assert not (set(STAGED) & set(REGISTRY)), (
        "staged datapipe26 names leaked into the published registry"
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
    "ev_lorenz_curve_deciles": "single-row (n_users, n_events) totals "
    "scalar fanned onto the rank frame and the <=10-row decile rollup",
}

_GLOBAL_WINDOW_OK: dict[str, str] = {}


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
    """duckdb conn over a fixture dir: only the tables that exist
    (Spark writes each as a directory of part files)."""
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
_EMB_SCHEMA = "vec_id long, embedding array<float>, label int"
_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
_LI_SCHEMA = "l_orderkey long, l_partkey long"
_DIM = 64


def _q6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _vec(x: float) -> list[float]:
    return [float(x)] + [0.0] * (_DIM - 1)


# ------------------------------------------------- silhouette


def test_silhouette_two_clusters(spark, tmp_path):
    """Label 0 at x ∈ {0, 2} (centroid 1), label 1 at {10, 12}
    (centroid 11): every point has a = 1; b is 11 or 9 by position —
    per-label mean s = (q6(10/11) + q6(8/9))/2, symmetric across
    labels."""
    emb = spark.createDataFrame(
        [(1, _vec(0), 0), (2, _vec(2), 0),
         (3, _vec(10), 1), (4, _vec(12), 1)],
        _EMB_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, embeddings=emb)
    out = {r["label"]: r.asDict() for r in
           STAGED["emb_silhouette_simplified"].fn(spark, d).collect()}
    expect = _q6((_q6(10 / 11) + _q6(8 / 9)) / 2)
    assert out[0]["n_vectors"] == 2
    assert out[0]["mean_silhouette"] == expect
    assert out[1]["mean_silhouette"] == expect
    _compare_staged(spark, "emb_silhouette_simplified", d,
                    con=_fixture_conn(d, "embeddings"))


def test_silhouette_degenerate_branches(spark, tmp_path):
    """One corpus-wide label → b undefined → NULL mean; two labels on
    the SAME point → a = b = 0 → s pinned to 0 on both engines."""
    emb1 = spark.createDataFrame(
        [(1, _vec(1), 0), (2, _vec(3), 0)], _EMB_SCHEMA
    )
    d1 = _fixture_dir(spark, tmp_path, embeddings=emb1)
    r = STAGED["emb_silhouette_simplified"].fn(spark, d1).collect()
    assert len(r) == 1 and r[0]["mean_silhouette"] is None

    emb2 = spark.createDataFrame(
        [(1, _vec(5), 0), (2, _vec(5), 1)], _EMB_SCHEMA
    )
    d2 = _fixture_dir(spark, tmp_path / "b", embeddings=emb2)
    out = [row.asDict() for row in
           STAGED["emb_silhouette_simplified"].fn(spark, d2).collect()]
    assert all(row["mean_silhouette"] == 0.0 for row in out)


# ------------------------------------------------- Katz


def test_katz_path_graph(spark, tmp_path):
    """Path graph 1—2—3 (orders {1,2} and {2,3}): exact decimal
    rounds at α = 0.05 give katz(2) = 0.1 + 0.005 + 0.0005 and
    katz(1) = katz(3) = 0.05 + 0.005 + 0.00025 — the middle node
    wins on sheer path volume."""
    li = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 2), (2, 3)], _LI_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, lineitem=li)
    out = {r["node"]: r["katz"] for r in
           STAGED["graph_katz_centrality"].fn(spark, d).collect()}
    assert out[1] == 0.05525
    assert out[2] == 0.1055
    assert out[3] == 0.05525
    _compare_staged(spark, "graph_katz_centrality", d,
                    con=_fixture_conn(d, "lineitem"))


# ------------------------------------------------- A/B power MDE


def _grp(u: int) -> int:
    return int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2


def test_mde_hand_computed(spark, tmp_path):
    """Four users, per-user sums {10, 20, 30, 40}: arms from the same
    md5 parity the engine uses (replicated here), pooled sample
    variance from exact sums, MDE = (z_a+z_b)·√(σ²(1/n_a+1/n_b))
    through the identical q6 chain."""
    users = [1, 2, 3, 4]
    sums = {1: 10.0, 2: 20.0, 3: 30.0, 4: 40.0}
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(u, t0, u, "A", sums[u], "{}") for u in users], _EV_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_ab_power_mde"].fn(spark, d).collect()[0].asDict()
    n_a = sum(1 for u in users if _grp(u) == 0)
    assert (r["n_users"], r["n_a"], r["n_b"]) == (4, n_a, 4 - n_a)
    s, q, n = 100.0, 3000.0, 4.0
    mean = s / n
    var = (n * q - s * s) / (n * (n - 1))
    assert r["mean_value"] == _q6(mean)
    assert r["sd_value"] == _q6(math.sqrt(var))
    if n_a in (1, 2, 3):
        n_b = 4 - n_a
        mde = (1.959964 + 0.841621) * math.sqrt(var * (1 / n_a + 1 / n_b))
        assert r["mde_abs"] == _q6(mde)
        assert r["mde_rel"] == _q6(mde / mean)
    _compare_staged(spark, "ev_ab_power_mde", d,
                    con=_fixture_conn(d, "events"))


def test_mde_degenerate_zero_variance(spark, tmp_path):
    """Identical per-user sums → σ² = 0 → sd and both MDEs NULL."""
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(u, t0, u, "A", 5.0, "{}") for u in (1, 2, 3)], _EV_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_ab_power_mde"].fn(spark, d).collect()[0].asDict()
    assert r["sd_value"] is None
    assert r["mde_abs"] is None
    assert r["mde_rel"] is None


# ------------------------------------------------- Holt forecast


def _holt_expect(xs):
    level, trend, ae6 = xs[0], 0.0, 0
    for x in xs[1:]:
        pred = level + trend
        ae6 += int(math.floor(abs(x - pred) * 1e6 + 0.5))
        nl = 0.5 * x + 0.5 * (level + trend)
        trend = 0.3 * (nl - level) + 0.7 * trend
        level = nl
    return level, trend, ae6


def test_holt_two_points(spark, tmp_path):
    """Series [1, 3]: l = 2, b = 0.3, forecast = 2 + 7·0.3 = 4.1,
    MAE = 2 exactly (one one-step error of |3−1|)."""
    rows = [(0, dt.datetime(1970, 1, 1, 6), 1, "A", 0.0, "{}")]
    rows += [(10 + k, dt.datetime(1970, 1, 2, 6), 1, "A", 0.0, "{}")
             for k in range(3)]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_holt_forecast"].fn(spark, d).collect()[0].asDict()
    assert r["n_days"] == 2
    assert (r["level"], r["trend"]) == (2.0, 0.3)
    assert r["forecast_7d"] == _q6(2.0 + 7 * 0.3)
    assert r["mae"] == 2.0
    _compare_staged(spark, "ev_holt_forecast", d,
                    con=_fixture_conn(d, "events"))


def test_holt_zero_filled_gap(spark, tmp_path):
    """Events on days 0 and 2 only → the spine inserts a 0-count day
    and the recurrence sees [2, 0, 1]; expectations replayed through
    the exact op-for-op chain."""
    rows = [(k, dt.datetime(1970, 1, 1, 6), 1, "A", 0.0, "{}")
            for k in range(2)]
    rows.append((9, dt.datetime(1970, 1, 3, 6), 1, "A", 0.0, "{}"))
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_holt_forecast"].fn(spark, d).collect()[0].asDict()
    level, trend, ae6 = _holt_expect([2.0, 0.0, 1.0])
    assert r["n_days"] == 3
    assert r["level"] == _q6(level)
    assert r["trend"] == _q6(trend)
    assert r["forecast_7d"] == _q6(level + 7 * trend)
    assert r["mae"] == _q6((ae6 / 1e6) / 2)


def test_holt_single_day(spark, tmp_path):
    """One observed day: level = the count, trend 0, MAE NULL."""
    ev = spark.createDataFrame(
        [(k, dt.datetime(1970, 1, 1, 6), 1, "A", 0.0, "{}")
         for k in range(5)],
        _EV_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_holt_forecast"].fn(spark, d).collect()[0].asDict()
    assert (r["n_days"], r["level"], r["trend"]) == (1, 5.0, 0.0)
    assert r["mae"] is None


# ------------------------------------------------- Q-Q deciles


def test_qq_uniform_shift(spark, tmp_path):
    """Era 0 values 1..10, era 1 values 11..20: every decile gap is
    exactly 10 (pure location shift), and the early median is the
    type-7 interpolated 5.5."""
    rows = []
    for k in range(10):
        rows.append((k, k, "O", float(k + 1),
                     dt.datetime(1995, 6, 1), "1-URGENT"))
        rows.append((100 + k, k, "O", float(k + 11),
                     dt.datetime(1999, 6, 1), "1-URGENT"))
    orders = spark.createDataFrame(rows, _ORD_SCHEMA)
    d = _fixture_dir(spark, tmp_path, orders=orders)
    out = {r["decile"]: r.asDict()
           for r in STAGED["pf_qq_deciles"].fn(spark, d).collect()}
    assert set(out) == set(range(1, 10))
    assert all(out[k]["gap"] == 10.0 for k in out)
    assert out[5]["q_early"] == 5.5
    assert out[5]["q_late"] == 15.5
    _compare_staged(spark, "pf_qq_deciles", d,
                    con=_fixture_conn(d, "orders"))


def test_qq_empty_era_no_rows(spark, tmp_path):
    """All orders in one era → no matched pairs → zero rows on both
    engines (never a one-sided NULL table)."""
    orders = spark.createDataFrame(
        [(k, k, "O", float(k), dt.datetime(1995, 1, 2), "1-URGENT")
         for k in range(1, 6)],
        _ORD_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, orders=orders)
    assert STAGED["pf_qq_deciles"].fn(spark, d).count() == 0
    _compare_staged(spark, "pf_qq_deciles", d,
                    con=_fixture_conn(d, "orders"))


# ------------------------------------------------- Lorenz curve


def test_lorenz_hand_computed(spark, tmp_path):
    """Ten users with counts 1..10 (total 55): one user per decile,
    cumulative event share at decile d is (Σ1..d)/55 — 45/55 at
    decile 9 (the bottom 90% carry ~82%), exactly 1 at decile 10."""
    t0 = dt.datetime(2024, 1, 1)
    rows, k = [], 0
    for u in range(1, 11):
        for _ in range(u):
            rows.append((k, t0, u, "A", 0.0, "{}")); k += 1
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    out = {r["decile"]: r.asDict()
           for r in STAGED["ev_lorenz_curve_deciles"].fn(spark, d).collect()}
    assert set(out) == set(range(1, 11))
    for dd in range(1, 11):
        assert out[dd]["users_in"] == 1
        assert out[dd]["cum_user_share"] == _q6(dd / 10)
        assert out[dd]["cum_event_share"] == _q6(
            sum(range(1, dd + 1)) / 55
        )
    _compare_staged(spark, "ev_lorenz_curve_deciles", d,
                    con=_fixture_conn(d, "events"))


def test_lorenz_fewer_users_than_deciles(spark, tmp_path):
    """Three users land in ceiling-division buckets {4, 7, 10} — the
    curve is sparse but exact, and the last point is always (1, 1)."""
    t0 = dt.datetime(2024, 1, 1)
    rows, k = [], 0
    for u, cnt in ((1, 1), (2, 2), (3, 3)):
        for _ in range(cnt):
            rows.append((k, t0, u, "A", 0.0, "{}")); k += 1
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    out = {r["decile"]: r.asDict()
           for r in STAGED["ev_lorenz_curve_deciles"].fn(spark, d).collect()}
    assert set(out) == {4, 7, 10}
    assert out[10]["cum_user_share"] == 1.0
    assert out[10]["cum_event_share"] == 1.0
