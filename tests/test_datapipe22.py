"""datapipe22 queries (staged for round-14 publication): full local
verification against the DuckDB oracles — the same comparison the
driver gate runs — plus adversarial fixtures run through BOTH engines
and hand-computed expectations. A staged-scope plan lint mirrors
tests/test_plan_lint.py until publication moves these names under the
fleet-wide lint (_BNLJ_OK → BNLJ_OK; the orphan test enforces the
copy)."""

from __future__ import annotations

import math

import pytest

from cqdg_etl_spark.queries.datapipe22 import STAGED
from tests.oracle_harness import canonical_rows, duckdb_conn


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
    """Staged names stay out of REGISTRY until the round-14 publication
    flips them in (the datapipe13-21 staging discipline)."""
    from cqdg_etl_spark.queries import REGISTRY

    assert not (set(STAGED) & set(REGISTRY)), (
        "staged datapipe22 names leaked into the published registry"
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
    "mb_sequential_rules": "single-row distinct-user-count scalar "
    "broadcast onto the |types|²-bounded rule frame",
    "ds_importance_ess": "single-row corpus-count scalar joined into "
    "the ≤|mixture|-row per-language weight build",
    "graph_rich_club": "≤63-row bit-length-bucket histograms "
    "suffix-joined (b >= threshold) against the ≤63-row ladder — "
    "both sides bounded by construction",
    "ret_prf_expansion_topk": "the BM25 1-row corpus-stats scalar "
    "(N, avgdl) broadcast onto the scored terms — the ret_bm25_topk "
    "exception, inherited by both passes",
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


# ----------------------------------------------------- fixture helpers


def _fixture_dir(spark, tmp_path, **tables) -> str:
    d = str(tmp_path / "fx")
    for name, df in tables.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/{name}.parquet")
    return d


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"
_LI_SCHEMA = "l_orderkey long, l_partkey long"


def _q6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# ------------------------------------------------- one-way ANOVA


def test_anova_hand_computed(spark, tmp_path):
    """Two sources with lengths {10,14} and {20,24}: group means 12/22,
    grand mean 17 → SSB = 2·25 + 2·25 = 100, SSW = 4·4 = 16,
    F = (100/1)/(16/2) = 12.5 exactly."""
    docs = spark.createDataFrame(
        [
            (1, "t", "en", "s1", 10), (2, "t", "en", "s1", 14),
            (3, "t", "en", "s2", 20), (4, "t", "en", "s2", 24),
        ],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    r = STAGED["pf_anova_nchars"].fn(spark, d).collect()[0].asDict()
    assert (r["n_groups"], r["n_rows"], r["df1"], r["df2"]) == (2, 4, 1, 2)
    assert r["ssb"] == 100.0
    assert r["ssw"] == 16.0
    assert r["f_stat"] == 12.5


def test_anova_degenerate_single_group(spark, tmp_path):
    """One source: k=1 → SSB 0, F NULL (the Welch discipline — never a
    divide-by-zero engine divergence)."""
    docs = spark.createDataFrame(
        [(1, "t", "en", "s1", 10), (2, "t", "en", "s1", 30)], _DOC_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    r = STAGED["pf_anova_nchars"].fn(spark, d).collect()[0].asDict()
    assert r["n_groups"] == 1
    assert r["f_stat"] is None


# ------------------------------------------------- sequential rules


def test_sequential_rules_hand_graph(spark, tmp_path):
    """u1: A then B; u2: A only; u3: B then A; u4: C and D at the SAME
    instant (strict < excludes the tie). Rules: A→B support 1 of
    n_A=3 (lift 1·4/(3·2)), B→A support 1 of n_B=2."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, s(0), 1, "A", 0.0, "{}"), (2, s(9), 1, "B", 0.0, "{}"),
            (3, s(0), 2, "A", 0.0, "{}"),
            (4, s(0), 3, "B", 0.0, "{}"), (5, s(9), 3, "A", 0.0, "{}"),
            (6, s(0), 4, "C", 0.0, "{}"), (7, s(0), 4, "D", 0.0, "{}"),
        ],
        _EV_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    rows = {
        (r["antecedent"], r["consequent"]): r.asDict()
        for r in STAGED["mb_sequential_rules"].fn(spark, d).collect()
    }
    assert set(rows) == {("A", "B"), ("B", "A")}  # no C/D tie rule
    ab = rows[("A", "B")]
    assert (ab["n_users_a"], ab["n_users_b"], ab["support_users"]) == (3, 2, 1)
    assert ab["confidence"] == _q6(1 / 3)
    assert ab["lift"] == _q6(1 * 4 / (3 * 2))
    ba = rows[("B", "A")]
    assert ba["support_users"] == 1
    assert ba["confidence"] == 0.5


# ------------------------------------------------- daily p95


def test_daily_p95_rank_arithmetic(spark, tmp_path):
    """Day 1 holds values 1..20 → k = 20 − ⌊20/20⌋ = 19 → p95 = 19
    (the 19th smallest). Day 2 holds one value → p95 is that value.
    Duplicates collapse into the histogram without changing the
    rank arithmetic: day 3 = {1,1,1,9} → k = 4 − 0 = 4 → p95 = 9."""
    import datetime as dt

    rows = []
    eid = 0
    for v in range(1, 21):
        rows.append((eid, dt.datetime(2024, 1, 1, 12), 1, "a", float(v), "{}"))
        eid += 1
    rows.append((eid, dt.datetime(2024, 1, 2, 12), 1, "a", 7.5, "{}"))
    eid += 1
    for v in (1.0, 1.0, 1.0, 9.0):
        rows.append((eid, dt.datetime(2024, 1, 3, 12), 1, "a", v, "{}"))
        eid += 1
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    out = {
        r["day"]: r.asDict()
        for r in STAGED["ev_daily_value_p95"].fn(spark, d).collect()
    }
    assert out["2024-01-01"]["p95"] == 19.0
    assert out["2024-01-01"]["n_events"] == 20
    assert out["2024-01-02"]["p95"] == 7.5
    assert out["2024-01-03"]["p95"] == 9.0


# ------------------------------------------------- importance ESS


def test_importance_ess_hand_weights(spark, tmp_path):
    """4 docs in one source: 2 en, 1 fr, 1 unknown-lang (excluded by
    the inner mixture join but still in the corpus count N=4).
    w_en = 0.4·4/2 = 0.8, w_fr = 0.15·4/1 = 0.6 →
    Σw = 2.2, Σw² = 1.64, ESS = 4.84/1.64."""
    docs = spark.createDataFrame(
        [
            (1, "t", "en", "A", 5), (2, "t", "en", "A", 5),
            (3, "t", "fr", "A", 5), (4, "t", "xx", "A", 5),
        ],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    r = STAGED["ds_importance_ess"].fn(spark, d).collect()[0].asDict()
    assert r["n_docs"] == 3  # the xx doc is outside the mixture
    assert r["sum_w"] == _q6(2.2)
    assert r["ess"] == _q6(4.84 / 1.64)
    assert r["ess_frac"] == _q6(4.84 / 1.64 / 3)
    assert r["max_w_share"] == _q6(0.8 / 2.2)
    assert r["clip_frac"] == 0.0


# ------------------------------------------------- rich club


def test_rich_club_triangle_plus_pendant(spark, tmp_path):
    """Order 10 buys parts 1,2,3 (triangle); order 11 buys 1,4.
    Degrees: 1→3, 2,3→2, 4→1. Ladder (bit-length buckets): b0 (k=1):
    N=4, E=4 → φ = 8/12; b1 (k=2): N=3, E=3 → φ = 1 exactly — the
    triangle IS the rich club."""
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (11, 1), (11, 4)], _LI_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, lineitem=li)
    rows = {
        r["k_threshold"]: r.asDict()
        for r in STAGED["graph_rich_club"].fn(spark, d).collect()
    }
    assert set(rows) == {1, 2}
    assert (rows[1]["n_nodes"], rows[1]["n_edges"]) == (4, 4)
    assert rows[1]["phi"] == _q6(2 * 4 / (4 * 3))
    assert (rows[2]["n_nodes"], rows[2]["n_edges"]) == (3, 3)
    assert rows[2]["phi"] == 1.0


# ------------------------------------------------- PRF expansion


def test_prf_expansion_trace(spark, tmp_path):
    """Round one matches docs 1 and 2 (they contain query terms); the
    expansion mines alpha/beta (df 2 within the top docs, original
    terms excluded; only 2 candidates exist so LIMIT 3 yields 2).
    Round two still ranks doc 1 over doc 2 (doc 1 additionally
    matches 'scan'); doc 3 (no matching term) never scores."""
    docs = spark.createDataFrame(
        [
            (1, "merge scan alpha beta", "en", "s", 21),
            (2, "merge alpha beta", "en", "s", 16),
            (3, "gamma delta epsilon", "en", "s", 19),
        ],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    rows = (
        STAGED["ret_prf_expansion_topk"].fn(spark, d)
        .orderBy("rank").collect()
    )
    assert [r["doc"] for r in rows] == [1, 2]
    assert [r["rank"] for r in rows] == [1, 2]
    assert rows[0]["score"] > rows[1]["score"]


def test_prf_matches_oracle_on_fixture(spark, tmp_path):
    """The full two-pass pipeline (expansion selection included) must
    agree with the SQL oracle on the hand fixture, not just the
    harness corpora."""
    import duckdb

    docs = spark.createDataFrame(
        [
            (1, "merge scan alpha beta", "en", "s", 21),
            (2, "merge alpha beta", "en", "s", 16),
            (3, "window window beta gamma", "en", "s", 24),
            (4, "gamma delta epsilon", "en", "s", 19),
        ],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    q = STAGED["ret_prf_expansion_topk"]
    a = q.fn(spark, d).toPandas()
    con = duckdb.connect()
    # the Spark fixture writes a parquet DIRECTORY — glob its parts
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{d}/documents.parquet/*.parquet'"
    )
    e = con.execute(q.oracle).df()
    assert canonical_rows(a) == canonical_rows(e)
