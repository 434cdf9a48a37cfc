"""datapipe24 queries (staged for round-16 publication): full local
verification against the DuckDB oracles — the same comparison the
driver gate runs — plus adversarial fixtures run through BOTH engines
and hand-computed expectations. A staged-scope plan lint mirrors
tests/test_plan_lint.py until publication moves these names under the
fleet-wide lint (_BNLJ_OK → BNLJ_OK; the orphan test enforces the
copy). Written IN THE SAME COMMIT as the module — the datapipe23
lesson (VERDICT r9 #1)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from cqdg_etl_spark.queries.datapipe24 import STAGED
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
    """Staged names stay out of REGISTRY until the round-16 publication
    flips them in (the datapipe13-23 staging discipline)."""
    from cqdg_etl_spark.queries import REGISTRY

    assert not (set(STAGED) & set(REGISTRY)), (
        "staged datapipe24 names leaked into the published registry"
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

# Reviewed exceptions, the fleet BNLJ_OK convention (every build side
# is a 1-row scalar aggregate). Publication must move these into
# tests/test_plan_lint.py::BNLJ_OK (enforced by
# test_no_orphaned_staged_exceptions).
_BNLJ_OK: dict[str, str] = {
    "ev_acf_daily_counts": "single-row (mean, denominator) scalar "
    "broadcast onto the day-pair frame (bounded by the time span)",
    "ev_entropy_rate_markov": "single-row (N, n_states) scalar fanned "
    "onto the <=|types|^2 transition-cell frame",
    "tx_heaps_law_fit": "inherits tx_vocab_growth_curve's reviewed "
    "single-row total-token-count scalar (the curve IS this query's "
    "input); the OLS itself is one aggregate over <=10 rows",
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
        assert gw, (
            f"{name}: whitelisted bounded global window no longer in "
            "the plan — remove the stale _GLOBAL_WINDOW_OK entry"
        )
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


def _vec(x: float) -> list[float]:
    return [float(x)] + [0.0] * (_DIM - 1)


# ------------------------------------------------- Mann-Whitney U


def test_mann_whitney_hand_computed(spark, tmp_path):
    """A (en) lengths {1, 2}, B lengths {2, 3}: midranks 1, 2.5, 2.5,
    4 → R_A = 3.5, U_A = 0.5; ties term 2³−2 = 6 →
    σ² = (4/12)(5 − 6/12) = 1.5; z = (0.5 − 2)/√1.5;
    r_rb = 2·0.5/4 − 1 = −0.75."""
    docs = spark.createDataFrame(
        [
            (1, "t", "en", "s", 1), (2, "t", "en", "s", 2),
            (3, "t", "de", "s", 2), (4, "t", "de", "s", 3),
        ],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    r = STAGED["pf_mann_whitney_u"].fn(spark, d).collect()[0].asDict()
    assert (r["n_a"], r["n_b"], r["n_values"]) == (2, 2, 3)
    assert r["u_a"] == 0.5
    assert r["z"] == _q6((0.5 - 2.0) / math.sqrt(1.5))
    assert r["r_rank_biserial"] == -0.75
    _compare_staged(spark, "pf_mann_whitney_u", d,
                    con=_fixture_conn(d, "documents"))


def test_mann_whitney_degenerate(spark, tmp_path):
    """All rows one group (n_b = 0) and all values tied (σ² = 0):
    z and r are NULL, never a divide-by-zero engine divergence."""
    docs = spark.createDataFrame(
        [(k, "t", "en", "s", 5) for k in range(3)], _DOC_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    r = STAGED["pf_mann_whitney_u"].fn(spark, d).collect()[0].asDict()
    assert (r["n_a"], r["n_b"]) == (3, 0)
    assert r["z"] is None
    assert r["r_rank_biserial"] is None


# ------------------------------------------------- daily-count ACF


def test_acf_alternating_series(spark, tmp_path):
    """Counts 1,3,1,3,1,3 on six consecutive days (mean 2, Σ(x−m)²=6):
    the exact ACF alternates −5/6, 4/6, −3/6, 2/6, −1/6; lags 6 and 7
    have no pairs and therefore NO row on either engine."""
    rows, k = [], 0
    for day, cnt in enumerate([1, 3, 1, 3, 1, 3]):
        for _ in range(cnt):
            rows.append((k, dt.datetime(1970, 1, 1 + day, 6), 1, "A",
                         0.0, "{}"))
            k += 1
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    out = {r["lag"]: r.asDict()
           for r in STAGED["ev_acf_daily_counts"].fn(spark, d).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    expect = {1: -5 / 6, 2: 4 / 6, 3: -3 / 6, 4: 2 / 6, 5: -1 / 6}
    for lag, v in expect.items():
        assert out[lag]["n_pairs"] == 6 - lag
        assert out[lag]["acf"] == _q6(v), lag
    _compare_staged(spark, "ev_acf_daily_counts", d,
                    con=_fixture_conn(d, "events"))


def test_acf_zero_fills_missing_days(spark, tmp_path):
    """Events on days 0 and 2 only: the spine inserts day 1 with
    count 0 — series 2,0,2 (mean 4/3). Without the zero fill lag 2
    would have no pair at all; with it, acf(2) > 0 > acf(1)."""
    rows = [(k, dt.datetime(1970, 1, 1, 6), 1, "A", 0.0, "{}")
            for k in range(2)]
    rows += [(10 + k, dt.datetime(1970, 1, 3, 6), 1, "A", 0.0, "{}")
             for k in range(2)]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    out = {r["lag"]: r.asDict()
           for r in STAGED["ev_acf_daily_counts"].fn(spark, d).collect()}
    assert set(out) == {1, 2}
    m = 4.0 / 3.0
    den = (2 - m) ** 2 + (0 - m) ** 2 + (2 - m) ** 2
    num1 = _q6((2 - m) * (0 - m)) + _q6((0 - m) * (2 - m))
    num2 = _q6((2 - m) * (2 - m))
    assert out[1]["acf"] == _q6(num1 / den)
    assert out[2]["acf"] == _q6(num2 / den)


def test_acf_constant_series_null(spark, tmp_path):
    """A constant series has zero variance: acf is NULL (den = 0),
    never an engine-divergent 0/0."""
    rows = [(day * 10, dt.datetime(1970, 1, 1 + day, 6), 1, "A", 0.0, "{}")
            for day in range(3)]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    out = [r.asDict()
           for r in STAGED["ev_acf_daily_counts"].fn(spark, d).collect()]
    assert out and all(r["acf"] is None for r in out)


# ------------------------------------------------- Fano burstiness


def test_fano_hand_computed(spark, tmp_path):
    """Type A daily counts {2, 4}: mean 3, sample variance
    (2·20 − 36)/(2·1) = 2 → Fano 2/3. Type B observed one day →
    NULL (variance undefined)."""
    rows, k = [], 0
    for day, cnt in ((0, 2), (1, 4)):
        for _ in range(cnt):
            rows.append((k, dt.datetime(1970, 1, 1 + day, 6), 1, "A",
                         0.0, "{}"))
            k += 1
    rows.append((99, dt.datetime(1970, 1, 1, 6), 1, "B", 0.0, "{}"))
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    out = {r["event_type"]: r.asDict()
           for r in STAGED["ev_fano_burstiness"].fn(spark, d).collect()}
    a = out["A"]
    assert (a["n_days"], a["total"], a["mean_daily"]) == (2, 6, 3.0)
    assert a["fano"] == _q6(2.0 / 3.0)
    assert out["B"]["fano"] is None


def test_fano_poisson_like_regular(spark, tmp_path):
    """Identical daily counts → variance 0 → Fano exactly 0 (the
    unnaturally-regular floor)."""
    rows = [(day * 10 + j, dt.datetime(1970, 1, 1 + day, 6), 1, "A",
             0.0, "{}")
            for day in range(3) for j in range(2)]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_fano_burstiness"].fn(spark, d).collect()[0].asDict()
    assert r["fano"] == 0.0


# ------------------------------------------------- Heaps-law fit


def test_heaps_all_unique_tokens(spark, tmp_path):
    """Every token unique → V(N) = N at every checkpoint → the OLS
    recovers β = 1, ln K = 0, R² = 1 exactly."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{i}x{j}" for j in range(10)), "en", "s", 50)
         for i in range(4)],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    r = STAGED["tx_heaps_law_fit"].fn(spark, d).collect()[0].asDict()
    assert r["n_points"] == 10
    assert r["beta"] == 1.0
    assert r["ln_k"] == 0.0
    assert r["r2"] == 1.0
    _compare_staged(spark, "tx_heaps_law_fit", d,
                    con=_fixture_conn(d, "documents"))


def test_heaps_degenerate_single_point(spark, tmp_path):
    """A 1-token corpus lands every position in the last decile —
    one usable point → β, ln K, R² all NULL (n_points < 2 guard)."""
    docs = spark.createDataFrame(
        [(1, "solo", "en", "s", 4)], _DOC_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    r = STAGED["tx_heaps_law_fit"].fn(spark, d).collect()[0].asDict()
    assert r["n_points"] == 1
    assert r["beta"] is None
    assert r["ln_k"] is None
    assert r["r2"] is None


# ------------------------------------------------- Mahalanobis


def test_mahalanobis_hand_computed(spark, tmp_path):
    """Label 0, first-coordinate values {0, 0, 0, 4}: μ = 1,
    population σ² = 3; the x = 4 vector scores (4−1)²/3 = 3, the rest
    (0−1)²/3 = q6(1/3); every other dimension is constant (σ² = 0 →
    contributes 0 on both engines). Top-3 = the outlier, then the two
    lowest vec_ids of the tie."""
    emb = spark.createDataFrame(
        [(1, _vec(0), 0), (2, _vec(0), 0), (3, _vec(0), 0),
         (4, _vec(4), 0)],
        _EMB_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, embeddings=emb)
    rows = [(r["rnk"], r["vec_id"], r["md2"]) for r in
            STAGED["emb_mahalanobis_outliers"].fn(spark, d).collect()]
    third = _q6(1.0 / 3.0)
    assert rows == [(1, 4, 3.0), (2, 1, third), (3, 2, third)]
    _compare_staged(spark, "emb_mahalanobis_outliers", d,
                    con=_fixture_conn(d, "embeddings"))


def test_mahalanobis_per_label_isolation(spark, tmp_path):
    """Two labels with different scales: each vector is scored against
    its OWN label's moments — the label-1 cluster at x ∈ {100, 104}
    produces the same normalized distances as label 0 at {0, 4}
    (σ² = 4 each, both points 1 unit of σ² away from μ = mid)."""
    emb = spark.createDataFrame(
        [(1, _vec(0), 0), (2, _vec(4), 0),
         (3, _vec(100), 1), (4, _vec(104), 1)],
        _EMB_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, embeddings=emb)
    out = [r.asDict() for r in
           STAGED["emb_mahalanobis_outliers"].fn(spark, d).collect()]
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r["md2"])
    assert by_label[0] == by_label[1] == [1.0, 1.0]


# ------------------------------------------------- entropy rate


def test_entropy_rate_hand_computed(spark, tmp_path):
    """u1: A B A B A, u2: A A → cells A→B 2, B→A 2, A→A 1; π-weighted
    terms (2/5)ln(3/2) + (1/5)ln 3 + (2/5)ln 1, each q6'd; n_states=2
    → max = ln 2."""
    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    rows = [(k, s(k), 1, t, 0.0, "{}")
            for k, t in enumerate(["A", "B", "A", "B", "A"])]
    rows += [(10 + k, s(k), 2, "A", 0.0, "{}") for k in range(2)]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_entropy_rate_markov"].fn(spark, d).collect()[0].asDict()
    assert (r["n_states"], r["n_transitions"], r["n_cells"]) == (2, 5, 3)
    t_ab = _q6(2 / 5 * math.log(3 / 2))
    t_aa = _q6(1 / 5 * math.log(3.0))
    t_ba = _q6(2 / 5 * math.log(1.0))
    hsum = t_ab + t_aa + t_ba
    assert r["entropy_rate"] == _q6(hsum)
    assert r["max_entropy"] == _q6(math.log(2.0))
    assert r["normalized"] == _q6(hsum / math.log(2.0))
    _compare_staged(spark, "ev_entropy_rate_markov", d,
                    con=_fixture_conn(d, "events"))


def test_entropy_rate_deterministic_chain(spark, tmp_path):
    """A single-type stream is perfectly predictable: entropy rate
    exactly 0, and with one state the normalization is NULL."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [(k, t0 + dt.timedelta(seconds=k), 1, "A", 0.0, "{}")
            for k in range(4)]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_entropy_rate_markov"].fn(spark, d).collect()[0].asDict()
    assert (r["n_states"], r["entropy_rate"]) == (1, 0.0)
    assert r["max_entropy"] is None
    assert r["normalized"] is None
