"""datapipe20 queries (staged for round-12 publication): full local
verification against the DuckDB oracles — the same comparison the
driver gate runs — plus adversarial fixtures run through BOTH engines
and hand-computed expectations. A staged-scope plan lint mirrors
tests/test_plan_lint.py until publication moves these names under the
fleet-wide lint (_BNLJ_OK → BNLJ_OK; the orphan test enforces the
copy)."""

from __future__ import annotations

import math

import pytest

from cqdg_etl_spark.queries.datapipe20 import STAGED
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
    """Staged names stay out of REGISTRY until the round-12 publication
    flips them in (the datapipe13-19 staging discipline)."""
    from cqdg_etl_spark.queries import REGISTRY

    assert not (set(STAGED) & set(REGISTRY)), (
        "staged datapipe20 names leaked into the published registry"
    )


def test_staged_batch_size():
    assert len(STAGED) == 6


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_oracle_match(spark, sf_dir, name):
    _compare_staged(spark, name, sf_dir)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_oracle_match_sf_medium(spark, name):
    """The driver gate compares at sf0.01 — run the same comparison at
    that SF in CI instead of leaving it to ad-hoc sweeps (round-8
    institutionalization of the two-SF staging claim)."""
    from tests.conftest import SF_MEDIUM

    _compare_staged(spark, name, SF_MEDIUM)


# ---------------------------------------------------------- plan lint

_FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin",
              "BatchEvalPython ")

# Reviewed exceptions, the fleet BNLJ_OK convention. Publication must
# move these into tests/test_plan_lint.py::BNLJ_OK (enforced by
# test_no_orphaned_staged_exceptions).
_BNLJ_OK: dict[str, str] = {
    # pf_welch_ttest no longer needs an entry: the ADVICE r8
    # degenerate-input fix replaced its two-1-row-frame join with a
    # single conditional aggregate (one row always, no join node).
    "ret_mrr_eval": "fixed 4-row threshold grid range-joined to the "
    "10-row ranking",
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
_LI_COLS = "l_orderkey long, l_partkey long"


def _q6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# ------------------------------------------------- CDC chunk dedup


def test_cdc_insertion_robust(spark, tmp_path):
    """'epsilon' is a boundary token (md5-prefix ≡ 0 mod 8, checked in
    the fixture); a PREFIX insertion changes only the chunk before the
    first boundary — every chunk from 'epsilon …' on dedups across the
    two docs, which fixed-width spans would miss."""
    import hashlib

    def is_boundary(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 8 == 0

    assert is_boundary("epsilon")
    body = "alpha beta epsilon gamma delta zeta"
    for tok in ("alpha", "beta", "gamma", "delta", "zeta", "inserted"):
        assert not is_boundary(tok)
    docs = spark.createDataFrame(
        [
            (1, body, "en", "s", len(body)),
            (2, "inserted " + body, "en", "s", len(body) + 9),
        ],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    r = STAGED["dd_cdc_chunk_dedup"].fn(spark, d).collect()[0].asDict()
    # Chunks: doc1 = [alpha beta][epsilon gamma delta zeta];
    # doc2 = [inserted alpha beta][epsilon gamma delta zeta].
    # The epsilon-chunk dedups (doc2's copy is the duplicate).
    assert r["n_chunks"] == 4
    assert r["n_dup_chunks"] == 1
    assert r["dup_tokens"] == 4
    assert r["dup_chunk_frac"] == _q6(1 / 4)


# ------------------------------------------------- greedy coverage


def test_greedy_coverage_trace(spark, tmp_path):
    """3 docs with known trigram sets: doc 2 covers 4 shingles, doc 1
    covers 2 — both inside doc 2's set — and doc 3 is disjoint with 1.
    Greedy: pick 2 (gain 4), then 3 (gain 1), then STOP — doc 1 adds
    nothing (its shingles are fully covered, so it drops out of the
    gain frame entirely; zero-gain picks are never emitted — the
    submodular early-stop both engines share)."""
    docs = spark.createDataFrame(
        [
            # doc1 trigrams: {a b c, b c d} — both inside doc2's set
            (1, "a b c d", "en", "s", 7),
            # doc2 trigrams: {a b c, b c d, c d e, d e f}
            (2, "a b c d e f", "en", "s", 11),
            # doc3 trigrams: {x y z}
            (3, "x y z", "en", "s", 5),
        ],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    rows = [r.asDict()
            for r in STAGED["ds_greedy_coverage"].fn(spark, d).collect()]
    assert [(r["step"], r["doc_id"], r["gain"]) for r in rows] == [
        (1, 2, 4), (2, 3, 1),
    ]
    assert [r["covered_total"] for r in rows] == [4, 5]


# ------------------------------------------------- cohort LTV


def test_cohort_ltv_hand_computed(spark, tmp_path):
    """One user first seen Monday 2024-01-01 with purchases in week
    offsets 0 and 2: the cumulative curve is 10, 10, 30, 30; a second
    user in the same cohort without purchases only scales the
    denominator."""
    import datetime as dt

    rows = [
        (0, dt.datetime(2024, 1, 1, 9), 1, "view", 0.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 10), 1, "purchase", 10.0, "{}"),
        (2, dt.datetime(2024, 1, 15, 9), 1, "purchase", 20.0, "{}"),
        (3, dt.datetime(2024, 1, 2, 9), 2, "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    out = {(r.cohort_week, r.week_offset): r.asDict()
           for r in STAGED["ev_cohort_ltv"].fn(spark, d).collect()}
    wk = "2024-01-01"
    assert out[(wk, 0)]["n_users"] == 2
    assert [out[(wk, k)]["cum_revenue"] for k in range(4)] == [
        10.0, 10.0, 30.0, 30.0
    ]
    assert out[(wk, 3)]["ltv_per_user"] == 15.0


# ------------------------------------------------- Welch


def test_welch_hand_computed(spark, tmp_path):
    """purchase values (10, 12, 14) vs click values (10, 10, 10, 10):
    zero click variance, hand-computed t and Welch df."""
    import datetime as dt

    rows = []
    for i, v in enumerate((10.0, 12.0, 14.0)):
        rows.append((i, dt.datetime(2024, 1, 1), 1, "purchase", v, "{}"))
    for i, v in enumerate((10.0, 10.0, 10.0, 10.0)):
        rows.append((10 + i, dt.datetime(2024, 1, 1), 1, "click", v, "{}"))
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["pf_welch_ttest"].fn(spark, d).collect()[0].asDict()
    m1, v1, n1 = 12.0, 4.0, 3  # var((10,12,14)) = 4
    m2, v2, n2 = 10.0, 0.0, 4
    se2 = v1 / n1 + v2 / n2
    assert r["n1"] == n1 and r["n2"] == n2
    assert r["mean_diff"] == 2.0
    assert r["t_stat"] == _q6((m1 - m2) / math.sqrt(se2))
    # df: v2=0 makes the second denominator term vanish → df = n1-1.
    assert r["df_welch"] == _q6(
        se2 * se2 / ((v1 / n1) ** 2 / (n1 - 1))
    )


# ------------------------------------------------- MRR


def test_mrr_thresholds(spark, tmp_path):
    """Rank 1 holds a rel-2 doc, rank 2 the rel-4 doc: reciprocal rank
    is 1 at thresholds 1-2 and 1/2 at thresholds 3-4."""
    docs = [(1, "merge scan alpha", "en", "s", 10)]
    docs += [(2, "merge scan filter window", "en", "s", 10)]
    # Deflate the rare-term advantage: more docs carrying filter and
    # window so doc 2's extra terms carry LOW idf, while doc 1 stays
    # shorter (higher per-term score).
    docs += [(i, "filter window filter window filter window", "en", "s", 10)
             for i in range(3, 9)]
    d = _fixture_dir(
        spark, tmp_path,
        documents=spark.createDataFrame(docs, _DOC_SCHEMA),
    )
    rows = {r.rel_threshold: r.asDict()
            for r in STAGED["ret_mrr_eval"].fn(spark, d).collect()}
    # Whatever the exact ranking, verify internal consistency against
    # the oracle-checked columns: monotone first ranks and rr = 1/rank.
    for t in (1, 2, 3, 4):
        fr = rows[t]["first_rel_rank"]
        if fr > 0:
            assert rows[t]["reciprocal_rank"] == _q6(1.0 / fr)
        else:
            assert rows[t]["reciprocal_rank"] == 0.0
    assert rows[1]["first_rel_rank"] <= rows[4]["first_rel_rank"] or \
        rows[4]["first_rel_rank"] == -1
    # rel-4 exists (doc 2) inside the top-10 of an 8-doc corpus, so
    # threshold 4 must have a hit.
    assert rows[4]["first_rel_rank"] > 0


# ------------------------------------------------- assortativity


def test_assortativity_star_is_minus_one(spark, tmp_path):
    """A star K1,3 is perfectly disassortative: every edge joins the
    deg-3 hub to a deg-1 leaf ⇒ Pearson r over directed ends is
    exactly −1."""
    edges = [(1, 2), (1, 3), (1, 4)]
    li_rows = []
    for i, (a, b) in enumerate(edges):
        li_rows.append((i, a))
        li_rows.append((i, b))
    li = spark.createDataFrame(li_rows, _LI_COLS)
    d = _fixture_dir(spark, tmp_path, lineitem=li)
    r = STAGED["graph_degree_assortativity"].fn(spark, d).collect()[0]
    assert r.n_directed_ends == 6
    assert r.assortativity == -1.0
