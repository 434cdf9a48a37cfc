"""datapipe25 queries (staged for round-17 publication): full local
verification against the DuckDB oracles — the same comparison the
driver gate runs — plus adversarial fixtures run through BOTH engines
and hand-computed expectations. A staged-scope plan lint mirrors
tests/test_plan_lint.py until publication moves these names under the
fleet-wide lint (_BNLJ_OK → BNLJ_OK; the orphan test enforces the
copy). Written in the same commit as the module (the datapipe23
lesson)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from cqdg_etl_spark.queries.datapipe25 import STAGED
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
    """Staged names stay out of REGISTRY until the round-17 publication
    flips them in (the datapipe13-24 staging discipline)."""
    from cqdg_etl_spark.queries import REGISTRY

    assert not (set(STAGED) & set(REGISTRY)), (
        "staged datapipe25 names leaked into the published registry"
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
    "ev_cuped_adjustment": "single-row midpoint-timestamp scalar "
    "fanned onto the event scan for the pre/post split",
    "ev_retention_halflife": "single-row max-week scalar fanned onto "
    "the (cohort, age) frame for the right-censoring filter",
    "tx_stylometric_delta": "the |sources| x top-20 dense grid cross "
    "of two tiny dims (the j6-class exception); everything downstream "
    "lives on that bounded frame",
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
_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"
_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _q6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _order(k: int, price: float, day: int):
    return (k, k, "O", price,
            dt.datetime(1970, 1, 1) + dt.timedelta(days=day, hours=6),
            "1-URGENT")


# ------------------------------------------------- Spearman rho


def test_spearman_perfect_monotone(spark, tmp_path):
    """Strictly increasing price over time → ρ = 1 exactly; the
    reversed fixture (b = const − a) gives exactly −1 (midranks
    mirror)."""
    up = spark.createDataFrame(
        [_order(k, 10.0 * (k + 1), k) for k in range(4)], _ORD_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, orders=up)
    r = STAGED["pf_spearman_rho"].fn(spark, d).collect()[0].asDict()
    assert (r["n_rows"], r["spearman_rho"]) == (4, 1.0)

    down = spark.createDataFrame(
        [_order(k, 10.0 * (4 - k), k) for k in range(4)], _ORD_SCHEMA
    )
    d2 = _fixture_dir(spark, tmp_path / "b", orders=down)
    r2 = STAGED["pf_spearman_rho"].fn(spark, d2).collect()[0].asDict()
    assert r2["spearman_rho"] == -1.0


def test_spearman_ties_midranks(spark, tmp_path):
    """Tied prices {10,20,20,30} against mirrored days: the doubled
    midranks are {2,5,5,8} vs {8,5,5,2} — b = 10 − a exactly, so the
    tie-corrected ρ is exactly −1 (the 6Σd² shortcut would NOT give
    −1 here; Pearson-on-midranks does)."""
    orders = spark.createDataFrame(
        [_order(0, 10.0, 3), _order(1, 20.0, 1), _order(2, 20.0, 1),
         _order(3, 30.0, 0)],
        _ORD_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, orders=orders)
    r = STAGED["pf_spearman_rho"].fn(spark, d).collect()[0].asDict()
    assert r["spearman_rho"] == -1.0
    _compare_staged(spark, "pf_spearman_rho", d,
                    con=_fixture_conn(d, "orders"))


def test_spearman_degenerate_constant(spark, tmp_path):
    """A constant side has zero rank variance → ρ NULL (never an
    engine-divergent 0/0)."""
    orders = spark.createDataFrame(
        [_order(k, 50.0, k) for k in range(3)], _ORD_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, orders=orders)
    r = STAGED["pf_spearman_rho"].fn(spark, d).collect()[0].asDict()
    assert r["spearman_rho"] is None


# ------------------------------------------------- CUPED


def test_cuped_perfect_covariate(spark, tmp_path):
    """Two users with post = 2·pre exactly: θ = 2 and the adjustment
    removes ALL variance (ρ² = 1). Pre/post split at the global
    midpoint timestamp."""
    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, s(1), 1, "A", 10.0, "{}"), (2, s(99), 1, "A", 20.0, "{}"),
            (3, s(2), 2, "A", 20.0, "{}"), (4, s(98), 2, "A", 40.0, "{}"),
        ],
        _EV_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_cuped_adjustment"].fn(spark, d).collect()[0].asDict()
    assert r["n_users"] == 2
    assert (r["mean_pre"], r["mean_post"]) == (15.0, 30.0)
    assert r["theta"] == 2.0
    assert r["variance_reduction"] == 1.0
    _compare_staged(spark, "ev_cuped_adjustment", d,
                    con=_fixture_conn(d, "events"))


def test_cuped_degenerate_constant_pre(spark, tmp_path):
    """Identical pre-period sums → var(X) = 0 → θ and ρ² NULL; a user
    with no pre-period events carries covariate 0, not a dropped
    row."""
    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, s(1), 1, "A", 5.0, "{}"), (2, s(99), 1, "A", 7.0, "{}"),
            (3, s(2), 2, "A", 5.0, "{}"), (4, s(98), 2, "A", 9.0, "{}"),
            (5, s(97), 3, "A", 4.0, "{}"),   # post-only user: X = 0
        ],
        _EV_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_cuped_adjustment"].fn(spark, d).collect()[0].asDict()
    assert r["n_users"] == 3   # the post-only user is counted
    assert r["theta"] is not None   # X = {5, 5, 0} has variance
    ev2 = spark.createDataFrame(
        [
            (1, s(1), 1, "A", 5.0, "{}"), (2, s(99), 1, "A", 7.0, "{}"),
            (3, s(2), 2, "A", 5.0, "{}"), (4, s(98), 2, "A", 9.0, "{}"),
        ],
        _EV_SCHEMA,
    )
    d2 = _fixture_dir(spark, tmp_path / "b", events=ev2)
    r2 = STAGED["ev_cuped_adjustment"].fn(spark, d2).collect()[0].asDict()
    assert r2["theta"] is None
    assert r2["variance_reduction"] is None


# ------------------------------------------------- Simpson diversity


def test_simpson_hand_computed(spark, tmp_path):
    """s1 'a a b': λ = 2/(3·2) = 1/3, 1/λ = 3, Berger-Parker 2/3.
    s2 'a b c' all unique: λ = 0, 1/λ NULL (infinite). s3 one token:
    N < 2 → λ NULL, dominance 1."""
    docs = spark.createDataFrame(
        [
            (1, "a a b", "en", "s1", 5),
            (2, "a b c", "en", "s2", 5),
            (3, "solo", "en", "s3", 4),
        ],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    out = {r["source"]: r.asDict()
           for r in STAGED["tx_simpson_diversity"].fn(spark, d).collect()}
    s1 = out["s1"]
    assert (s1["n_tokens"], s1["n_types"]) == (3, 2)
    assert s1["simpson_lambda"] == _q6(1 / 3)
    assert s1["inv_simpson"] == 3.0
    assert s1["berger_parker"] == _q6(2 / 3)
    s2 = out["s2"]
    assert s2["simpson_lambda"] == 0.0
    assert s2["inv_simpson"] is None
    s3 = out["s3"]
    assert s3["simpson_lambda"] is None
    assert s3["berger_parker"] == 1.0
    _compare_staged(spark, "tx_simpson_diversity", d,
                    con=_fixture_conn(d, "documents"))


# ------------------------------------------------- KMV sketch


def test_kmv_small_set_exact(spark, tmp_path):
    """Below k distinct hashes the sketch IS the exact count —
    rel_err exactly 0 for every type and the merged row."""
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(k, t0, k % 5, "A" if k % 2 else "B", 0.0, "{}")
         for k in range(20)],
        _EV_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    rows = {r["event_type"]: r.asDict()
            for r in STAGED["sk_kmv_distinct_users"].fn(spark, d).collect()}
    assert set(rows) == {"A", "B", "__all__"}
    assert rows["__all__"]["n_exact"] == 5
    for r in rows.values():
        assert r["n_kmv"] == float(r["n_exact"])
        assert r["rel_err"] == 0.0


def test_kmv_estimator_path_calibration(spark):
    """At sf0.01 (150 users) the merged row and the busy types exceed
    k=64 distinct users, exercising the (k−1)/u_k estimator (sf0.001
    has too few — hence SF_MEDIUM here). KMV with k=64 has
    σ ≈ 1/√62 ≈ 13%; a deterministic md5 draw should land well within
    5σ."""
    from tests.conftest import SF_MEDIUM

    rows = [r.asDict()
            for r in STAGED["sk_kmv_distinct_users"].fn(spark, SF_MEDIUM)
            .collect()]
    est_rows = [r for r in rows if r["n_exact"] >= 64]
    assert est_rows, "fixture too small to exercise the estimator path"
    for r in est_rows:
        assert r["n_kmv"] != float(r["n_exact"])   # genuinely estimated
        assert r["rel_err"] < 0.65
    # merged row consistency: the union estimate covers all users
    allr = next(r for r in rows if r["event_type"] == "__all__")
    assert allr["n_exact"] == max(r["n_exact"] for r in rows)


# ------------------------------------------------- retention half-life


def test_retention_halflife_exact_halving(spark, tmp_path):
    """One 4-user cohort, 2 active at age 1, 1 at age 2 — retention
    halves weekly, so the OLS slope is exactly q6(ln ½) and the
    half-life is exactly 1.0 weeks."""
    def wk(w: int) -> dt.datetime:
        return dt.datetime(1970, 1, 1) + dt.timedelta(weeks=w, hours=1)

    rows, k = [], 0
    for u in (1, 2, 3, 4):
        rows.append((k, wk(0), u, "A", 0.0, "{}")); k += 1
    for u in (1, 2):
        rows.append((k, wk(1), u, "A", 0.0, "{}")); k += 1
    rows.append((k, wk(2), 1, "A", 0.0, "{}"))
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_retention_halflife"].fn(spark, d).collect()[0].asDict()
    assert r["n_ages"] == 2
    y1, y2 = _q6(math.log(0.5)), _q6(math.log(0.25))
    assert r["decay_slope"] == _q6(y2 - y1)
    assert r["halflife_weeks"] == _q6(-math.log(2.0) / (y2 - y1))
    assert r["halflife_weeks"] == 1.0
    _compare_staged(spark, "ev_retention_halflife", d,
                    con=_fixture_conn(d, "events"))


def test_retention_halflife_not_decaying(spark, tmp_path):
    """Retention that RISES with age: slope > 0 → half-life NULL (the
    honest answer, not a negative week count); slope itself is still
    reported."""
    def wk(w: int) -> dt.datetime:
        return dt.datetime(1970, 1, 1) + dt.timedelta(weeks=w, hours=1)

    rows, k = [], 0
    for u in (1, 2):
        rows.append((k, wk(0), u, "A", 0.0, "{}")); k += 1
    rows.append((k, wk(1), 1, "A", 0.0, "{}")); k += 1
    for u in (1, 2):
        rows.append((k, wk(2), u, "A", 0.0, "{}")); k += 1
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_retention_halflife"].fn(spark, d).collect()[0].asDict()
    assert r["decay_slope"] is not None and r["decay_slope"] > 0
    assert r["halflife_weeks"] is None


def test_retention_halflife_single_week(spark, tmp_path):
    """Everyone active only in week 0 → no age ≥ 1 observations →
    n_ages 0 and both fit outputs NULL."""
    ev = spark.createDataFrame(
        [(u, dt.datetime(1970, 1, 1, 1), u, "A", 0.0, "{}")
         for u in (1, 2, 3)],
        _EV_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_retention_halflife"].fn(spark, d).collect()[0].asDict()
    assert r["n_ages"] == 0
    assert r["decay_slope"] is None
    assert r["halflife_weeks"] is None


# ------------------------------------------------- stylometric delta


def test_delta_mirrored_profiles(spark, tmp_path):
    """Two sources with mirrored 2-token profiles ('a a b' vs
    'a b b'): for each token the two-source z-scores are ±1, so
    Delta = mean(|1−(−1)|, |−1−1|) = 2 — recomputed through the exact
    q6 chain."""
    docs = spark.createDataFrame(
        [(1, "a a b", "en", "s1", 5), (2, "a b b", "en", "s2", 5)],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    rows = [r.asDict()
            for r in STAGED["tx_stylometric_delta"].fn(spark, d).collect()]
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"], r["n_words"]) == ("s1", "s2", 2)
    # replicate the engine chain: q6'd freqs -> mean/pop-var -> z -> q6
    f_hi, f_lo = _q6(2 / 3), _q6(1 / 3)
    mu = (f_hi + f_lo) / 2
    var = (f_hi * f_hi + f_lo * f_lo) / 2 - mu * mu
    z_hi = _q6((f_hi - mu) / math.sqrt(var))
    z_lo = _q6((f_lo - mu) / math.sqrt(var))
    assert r["delta"] == _q6((abs(z_hi - z_lo) * 2) / 2)
    _compare_staged(spark, "tx_stylometric_delta", d,
                    con=_fixture_conn(d, "documents"))


def test_delta_zero_variance_word_contributes_zero(spark, tmp_path):
    """A token with identical frequency in every source has zero
    cross-source variance: it contributes 0 to every pair (never a
    divide-by-zero), while the differing tokens still separate the
    sources."""
    docs = spark.createDataFrame(
        [(1, "a b", "en", "s1", 3), (2, "a c", "en", "s2", 3)],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    r = STAGED["tx_stylometric_delta"].fn(spark, d).collect()[0].asDict()
    assert r["n_words"] == 3
    # token 'a' (freq 1/2 in both) contributes 0; 'b' and 'c' are the
    # ±1-z mirror pair each → delta = (0 + 2 + 2)/3
    f_hi, f_lo = _q6(1 / 2), 0.0
    mu = (f_hi + f_lo) / 2
    var = (f_hi * f_hi + f_lo * f_lo) / 2 - mu * mu
    z_hi = _q6((f_hi - mu) / math.sqrt(var))
    z_lo = _q6((f_lo - mu) / math.sqrt(var))
    assert r["delta"] == _q6((0.0 + 2 * abs(z_hi - z_lo)) / 3)


def test_delta_identical_sources_zero(spark, tmp_path):
    """Byte-identical token profiles → every z pair coincides →
    Delta exactly 0 (the clone-source floor the triage sorts by)."""
    docs = spark.createDataFrame(
        [(1, "x y z", "en", "s1", 5), (2, "x y z", "en", "s2", 5)],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    r = STAGED["tx_stylometric_delta"].fn(spark, d).collect()[0].asDict()
    assert r["delta"] == 0.0
