"""datapipe27 queries (staged for round-19 publication): full local
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

from cqdg_etl_spark.queries.datapipe27 import STAGED
from tests.oracle_harness import canonical_rows, duckdb_conn
from tests.test_plan_lint import _global_windows

_Z = 1.959964


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
    """Staged names stay out of REGISTRY until the round-19 publication
    flips them in (the datapipe13-26 staging discipline)."""
    from cqdg_etl_spark.queries import REGISTRY

    assert not (set(STAGED) & set(REGISTRY)), (
        "staged datapipe27 names leaked into the published registry"
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
    "ev_reach_wilson_ci": "single-row distinct-user-total scalar "
    "fanned onto the |types|-bounded reach frame",
    "ds_neyman_allocation": "two 1-row scalars (weight total, "
    "leftover) fanned onto the |sources|-bounded quota frame",
    "sk_cms_error_audit": "single-row stream-size scalar fanned onto "
    "the distinct-token estimate frame for the epsilon-N bound; the "
    "sketch lookups themselves are bucket-keyed broadcast equi-joins",
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
_EMB_SCHEMA = "vec_id long, embedding array<float>, label int"
_DIM = 64


def _q6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _vec(*xs: float) -> list[float]:
    v = list(map(float, xs))
    return v + [0.0] * (_DIM - len(v))


def _wilson(k: int, n: int):
    p = k / n
    zz = _Z * _Z / n
    rad = math.sqrt(p * (1.0 - p) / n + zz * zz / 4.0 / (_Z * _Z))
    lo = (p + zz / 2.0 - _Z * rad) / (1.0 + zz)
    hi = (p + zz / 2.0 + _Z * rad) / (1.0 + zz)
    return _q6(lo), _q6(hi)


# ------------------------------------------------- Wilson CI


def test_wilson_hand_computed(spark, tmp_path):
    """4 users; type A reaches 2 (p = .5), type B reaches all 4
    (p = 1): the replicated Wilson chain matches exactly, the p = 1
    interval keeps a sub-1 lower bound and never exceeds 1 — the
    property the Wald CI fails."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [(u, t0, u, "B", 0.0, "{}") for u in (1, 2, 3, 4)]
    rows += [(10 + u, t0, u, "A", 0.0, "{}") for u in (1, 2)]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    out = {r["event_type"]: r.asDict()
           for r in STAGED["ev_reach_wilson_ci"].fn(spark, d).collect()}
    a = out["A"]
    assert (a["n_users"], a["n_reached"], a["p_hat"]) == (4, 2, 0.5)
    lo, hi = _wilson(2, 4)
    assert (a["ci_low"], a["ci_high"]) == (lo, hi)
    b = out["B"]
    assert b["p_hat"] == 1.0
    lo1, hi1 = _wilson(4, 4)
    assert b["ci_low"] == lo1 and lo1 < 1.0
    assert b["ci_high"] == hi1 and hi1 <= 1.0
    _compare_staged(spark, "ev_reach_wilson_ci", d,
                    con=_fixture_conn(d, "events"))


# ------------------------------------------------- participation ratio


def test_effective_dim_hand_computed(spark, tmp_path):
    """Variance on one dim only → PR = 1, top-1 share 1; equal
    variance on two dims → PR = 2 exactly."""
    one = spark.createDataFrame(
        [(1, _vec(1), 0), (2, _vec(-1), 0)], _EMB_SCHEMA
    )
    d1 = _fixture_dir(spark, tmp_path, embeddings=one)
    r = STAGED["emb_effective_dim_diag"].fn(spark, d1).collect()[0].asDict()
    assert (r["dims"], r["total_variance"]) == (_DIM, 1.0)
    assert r["participation_ratio"] == 1.0
    assert r["top1_var_share"] == 1.0

    two = spark.createDataFrame(
        [(1, _vec(1, 1), 0), (2, _vec(-1, -1), 0)], _EMB_SCHEMA
    )
    d2 = _fixture_dir(spark, tmp_path / "b", embeddings=two)
    r2 = STAGED["emb_effective_dim_diag"].fn(spark, d2).collect()[0].asDict()
    assert r2["participation_ratio"] == 2.0
    assert r2["top1_var_share"] == 0.5
    _compare_staged(spark, "emb_effective_dim_diag", d2,
                    con=_fixture_conn(d2, "embeddings"))


def test_effective_dim_collapsed_corpus(spark, tmp_path):
    """Identical vectors → zero variance everywhere → PR and top-1
    share NULL (never a 0/0 engine divergence)."""
    emb = spark.createDataFrame(
        [(k, _vec(3, 4), 0) for k in range(3)], _EMB_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, embeddings=emb)
    r = STAGED["emb_effective_dim_diag"].fn(spark, d).collect()[0].asDict()
    assert r["total_variance"] == 0.0
    assert r["participation_ratio"] is None
    assert r["top1_var_share"] is None


# ------------------------------------------------- CMS error audit


def test_cms_audit_sparse_corpus_exact(spark, tmp_path):
    """A handful of tokens in a 4×1024 sketch collide with nothing:
    every estimate is exact — n_exact = n_tokens, zero overestimate,
    frac_within_bound = 1."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "s", 10),
         (2, "alpha delta", "en", "s", 8)],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    r = STAGED["sk_cms_error_audit"].fn(spark, d).collect()[0].asDict()
    assert (r["n_tokens"], r["stream_size"]) == (4, 5)
    assert r["n_exact"] == 4
    assert r["max_overestimate"] == 0
    assert r["mean_overestimate"] == 0.0
    assert r["frac_within_bound"] == 1.0
    _compare_staged(spark, "sk_cms_error_audit", d,
                    con=_fixture_conn(d, "documents"))


def test_cms_audit_one_sided_and_calibrated(spark, sf_dir):
    """On real data the CMS error is one-sided (max ≥ 0 — a negative
    overestimate would be an estimator bug) and the εN guarantee
    holds for (nearly) every token: frac_within_bound ≥ 1 − e^-4."""
    r = STAGED["sk_cms_error_audit"].fn(spark, sf_dir).collect()[0].asDict()
    assert r["max_overestimate"] >= 0
    assert r["frac_within_bound"] >= 1 - math.exp(-4)


# ------------------------------------------------- Neyman allocation


def test_neyman_integer_largest_remainder(spark, tmp_path):
    """Two strata with N·σ weights in exact ratio 1:2 (lengths
    {10, 20} vs {30, 50}): replicated integer arithmetic — floor
    quotas 333/666, the single leftover unit goes to the larger
    remainder, and Σ n_alloc = 1000 exactly."""
    rows = [(1, "t", "en", "s1", 10), (2, "t", "en", "s1", 20),
            (3, "t", "en", "s2", 30), (4, "t", "en", "s2", 50)]
    docs = spark.createDataFrame(rows, _DOC_SCHEMA)
    d = _fixture_dir(spark, tmp_path, documents=docs)
    out = {r["source"]: r.asDict()
           for r in STAGED["ds_neyman_allocation"].fn(spark, d).collect()}
    # replicate: s6 = floor(sqrt(sample var)*1e6+.5); m = N*s6
    def s6(xs):
        n = len(xs)
        sx, qx = sum(xs), sum(x * x for x in xs)
        var = (n * qx - sx * sx) / (n * (n - 1))
        return int(math.floor(math.sqrt(var) * 1e6 + 0.5))

    m1, m2 = 2 * s6([10, 20]), 2 * s6([30, 50])
    tot = m1 + m2
    base1, rem1 = (1000 * m1) // tot, (1000 * m1) % tot
    base2, rem2 = (1000 * m2) // tot, (1000 * m2) % tot
    leftover = 1000 - base1 - base2
    alloc = {"s1": base1, "s2": base2}
    for src in sorted(("s1", "s2"),
                      key=lambda s: (-(rem1 if s == "s1" else rem2), s))[
                          :leftover]:
        alloc[src] += 1
    assert out["s1"]["n_alloc"] == alloc["s1"]
    assert out["s2"]["n_alloc"] == alloc["s2"]
    assert out["s1"]["n_alloc"] + out["s2"]["n_alloc"] == 1000
    _compare_staged(spark, "ds_neyman_allocation", d,
                    con=_fixture_conn(d, "documents"))


def test_neyman_budget_conservation_real_data(spark, sf_dir):
    """Σ n_alloc = B exactly on real data (the largest-remainder
    invariant), and zero-variance strata get zero."""
    rows = STAGED["ds_neyman_allocation"].fn(spark, sf_dir).collect()
    assert sum(r["n_alloc"] for r in rows) == 1000


def test_neyman_all_degenerate_empty(spark, tmp_path):
    """Every stratum a single document → Σ N·σ = 0 → empty result on
    both engines (no allocation is computable)."""
    docs = spark.createDataFrame(
        [(1, "t", "en", "s1", 10), (2, "t", "en", "s2", 20)], _DOC_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    assert STAGED["ds_neyman_allocation"].fn(spark, d).count() == 0
    _compare_staged(spark, "ds_neyman_allocation", d,
                    con=_fixture_conn(d, "documents"))


# ------------------------------------------------- Tukey fences


def test_tukey_hand_computed(spark, tmp_path):
    """Lengths 1..9 plus 100: Q1 = 3.25, Q3 = 7.75 (type-7), fences
    [−3.5, 14.5] → exactly one outlier (the 100), rate 0.1."""
    docs = spark.createDataFrame(
        [(k, "t", "en", "s1", v) for k, v in
         enumerate(list(range(1, 10)) + [100])],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    r = STAGED["pf_tukey_outlier_rates"].fn(spark, d).collect()[0].asDict()
    assert (r["n_docs"], r["q1"], r["q3"]) == (10, 3.25, 7.75)
    assert r["n_outliers"] == 1
    assert r["outlier_rate"] == 0.1
    _compare_staged(spark, "pf_tukey_outlier_rates", d,
                    con=_fixture_conn(d, "documents"))


def test_tukey_zero_iqr(spark, tmp_path):
    """≥75% of docs the same length → IQR 0 → both fences at the
    common value → anything else is an outlier (the honest robust
    answer)."""
    docs = spark.createDataFrame(
        [(1, "t", "en", "s1", 5), (2, "t", "en", "s1", 5),
         (3, "t", "en", "s1", 5), (4, "t", "en", "s1", 5),
         (5, "t", "en", "s1", 9)],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    r = STAGED["pf_tukey_outlier_rates"].fn(spark, d).collect()[0].asDict()
    assert r["q1"] == r["q3"] == 5.0
    assert r["n_outliers"] == 1
    assert r["outlier_rate"] == 0.2


# ------------------------------------------------- 3-step absorption


def test_absorption_hand_chain(spark, tmp_path):
    """u1: A→purchase, u2: A→B→purchase: P(A→P) = P(A→B) = ½,
    P(B→P) = 1 → ladder a₁(A) = .5, a₂(A) = .5 + .5·1 = 1;
    B absorbs in one step."""
    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, s(0), 1, "A", 0.0, "{}"),
            (2, s(1), 1, "purchase", 0.0, "{}"),
            (3, s(0), 2, "A", 0.0, "{}"),
            (4, s(1), 2, "B", 0.0, "{}"),
            (5, s(2), 2, "purchase", 0.0, "{}"),
        ],
        _EV_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    out = {r["start_type"]: r.asDict()
           for r in STAGED["ev_absorption_3step"].fn(spark, d).collect()}
    assert set(out) == {"A", "B"}
    a = out["A"]
    assert (a["p_within_1"], a["p_within_2"], a["p_within_3"]) == (
        0.5, 1.0, 1.0
    )
    b = out["B"]
    assert (b["p_within_1"], b["p_within_2"], b["p_within_3"]) == (
        1.0, 1.0, 1.0
    )
    _compare_staged(spark, "ev_absorption_3step", d,
                    con=_fixture_conn(d, "events"))


def test_absorption_monotone_and_bounded(spark, sf_dir):
    """First-passage mass is monotone in the horizon and a
    probability: 0 ≤ p₁ ≤ p₂ ≤ p₃ ≤ 1 for every start type."""
    rows = STAGED["ev_absorption_3step"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["p_within_1"] <= r["p_within_2"] + 1e-9
        assert r["p_within_2"] <= r["p_within_3"] + 1e-9
        assert r["p_within_3"] <= 1.0 + 1e-6


def test_absorption_unreachable_zero(spark, tmp_path):
    """A type that never reaches 'purchase' in 3 steps reads exactly
    0, not NULL (the documented convention)."""
    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, s(0), 1, "X", 0.0, "{}"), (2, s(1), 1, "Y", 0.0, "{}"),
            (3, s(2), 1, "X", 0.0, "{}"),
        ],
        _EV_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    out = {r["start_type"]: r.asDict()
           for r in STAGED["ev_absorption_3step"].fn(spark, d).collect()}
    for r in out.values():
        assert (r["p_within_1"], r["p_within_2"], r["p_within_3"]) == (
            0.0, 0.0, 0.0
        )
