"""datapipe21 queries (staged for round-13 publication): full local
verification against the DuckDB oracles — the same comparison the
driver gate runs — plus adversarial fixtures run through BOTH engines
and hand-computed expectations. A staged-scope plan lint mirrors
tests/test_plan_lint.py until publication moves these names under the
fleet-wide lint (_BNLJ_OK → BNLJ_OK; the orphan test enforces the
copy)."""

from __future__ import annotations

import math

import pytest

from cqdg_etl_spark.queries.datapipe21 import STAGED
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
    """Staged names stay out of REGISTRY until the round-13 publication
    flips them in (the datapipe13-20 staging discipline)."""
    from cqdg_etl_spark.queries import REGISTRY

    assert not (set(STAGED) & set(REGISTRY)), (
        "staged datapipe21 names leaked into the published registry"
    )


def test_staged_batch_size():
    assert len(STAGED) == 6


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_oracle_match(spark, sf_dir, name):
    _compare_staged(spark, name, sf_dir)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_oracle_match_sf_medium(spark, name):
    """Two-SF staging verification in CI, not just ad-hoc sweeps (the
    round-8 institutionalization)."""
    from tests.conftest import SF_MEDIUM

    _compare_staged(spark, name, SF_MEDIUM)


# ---------------------------------------------------------- plan lint

_FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin",
              "BatchEvalPython ")

# Reviewed exceptions, the fleet BNLJ_OK convention. Publication must
# move these into tests/test_plan_lint.py::BNLJ_OK (enforced by
# test_no_orphaned_staged_exceptions).
_BNLJ_OK: dict[str, str] = {
    "pf_chi2_independence": "two 1-row scalar fan-outs (N/r/c totals "
    "onto the observed-cell frame, then onto the 1-row chi2 sum)",
    "emb_top_pc_power_iteration": "per-iteration 1-row max-abs "
    "renormalization scalar broadcast onto the d²-bounded vector "
    "frame (8 rounds + the final λ̂ join)",
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


def _fixture_conn(d: str, *tables: str):
    """duckdb conn over a fixture dir: only the tables that exist
    (Spark writes each as a directory of part files; the full
    oracle_harness.duckdb_conn binds all ten sf tables eagerly)."""
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
_LI_SCHEMA = "l_orderkey long, l_partkey long"
_ORD_SCHEMA = "o_orderkey long, o_orderpriority string, o_orderstatus string"
_EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _q6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# ------------------------------------------ clustering coefficient


def test_clustering_coefficient_hand_graph(spark, tmp_path):
    """Nodes 1-2-3 form a triangle; node 4 hangs off node 1 (degree 1,
    excluded by the d>=2 filter). Hand values: node 1 has d=3, T=1,
    c=2/6; nodes 2,3 have d=2, T=1, c=1. All degrees are single-digit
    so everything lands in bucket 0."""
    li = spark.createDataFrame(
        # order 10 buys parts 1,2,3 (triangle); order 11 buys 1,4
        [(10, 1), (10, 2), (10, 3), (11, 1), (11, 4)],
        _LI_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, lineitem=li)
    rows = STAGED["graph_clustering_coefficient"].fn(spark, d).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["degree_bucket"] == 0
    assert r["n_nodes"] == 3  # node 4 has d=1, filtered
    assert r["total_triangles"] == 3  # one triangle counted at 3 nodes
    assert r["mean_cc"] == _q6((_q6(2 / 6) + 1.0 + 1.0) / 3)


# ------------------------------------------ chi-square independence


def test_chi2_hand_table(spark, tmp_path):
    """2x2 table [[10, 20], [30, 40]]: N=100, marginals (30, 70) and
    (40, 60). chi2 = sum (n-e)^2/e over all four cells with
    e = {12, 18, 28, 42} -> chi2 = 4/12 + 4/18 + 4/28 + 4/42.
    dof = 1; V = sqrt(chi2/N)."""
    rows = []
    k = 0
    for (pa, pb), n in [
        (("1-URGENT", "O"), 10), (("1-URGENT", "F"), 20),
        (("2-HIGH", "O"), 30), (("2-HIGH", "F"), 40),
    ]:
        for _ in range(n):
            rows.append((k, pa, pb))
            k += 1
    orders = spark.createDataFrame(rows, _ORD_SCHEMA)
    d = _fixture_dir(spark, tmp_path, orders=orders)
    r = STAGED["pf_chi2_independence"].fn(spark, d).collect()[0].asDict()
    assert (r["n_rows"], r["n_a"], r["n_b"], r["dof"]) == (100, 2, 2, 1)
    # engine form: N + sum of q6'd ((n-e)^2/e - e) terms
    terms = [
        _q6((10 - 12.0) ** 2 / 12.0 - 12.0),
        _q6((20 - 18.0) ** 2 / 18.0 - 18.0),
        _q6((30 - 28.0) ** 2 / 28.0 - 28.0),
        _q6((40 - 42.0) ** 2 / 42.0 - 42.0),
    ]
    chi2 = 100 + sum(terms)
    assert abs(r["chi2"] - chi2) < 1e-9
    assert r["cramers_v"] == _q6(math.sqrt(chi2 / (100 * 1)))
    # sanity: close to the textbook value 4/12+4/18+4/28+4/42
    assert abs(chi2 - (4 / 12 + 4 / 18 + 4 / 28 + 4 / 42)) < 1e-4


def test_chi2_degenerate_single_level(spark, tmp_path):
    """One distinct status → least(r-1, c-1) = 0: V must be NULL on
    both engines, never Spark-NULL-vs-DuckDB-Inf (ADVICE r9 guard,
    the Welch/ANOVA discipline). chi2 itself stays well-defined (and
    is ~0 — independence holds trivially)."""
    orders = spark.createDataFrame(
        [(0, "1-URGENT", "O"), (1, "1-URGENT", "O"), (2, "2-HIGH", "O")],
        _ORD_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, orders=orders)
    r = STAGED["pf_chi2_independence"].fn(spark, d).collect()[0].asDict()
    assert (r["n_a"], r["n_b"], r["dof"]) == (2, 1, 0)
    assert r["cramers_v"] is None
    assert abs(r["chi2"]) < 1e-6
    _compare_staged(spark, "pf_chi2_independence", d,
                    con=_fixture_conn(d, "orders"))


# ------------------------------------------ bigram entropy rate


def test_bigram_entropy_templated_vs_varied(spark, tmp_path):
    """Source 'tpl' repeats one deterministic chain ('a b a b ...'):
    every bigram is fully determined by its first token, so the
    conditional entropy is 0 while the unigram entropy is 1 bit
    (info_gain = 1). Source 'mix' makes 'a' ambiguous (a->b and a->c
    once each): h_cond = p(a,b)·1 + p(a,c)·1 summed via q6 terms.
    Single-token and empty docs contribute nothing."""
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b a b", "en", "tpl", 15),
            (2, "a b a b", "en", "tpl", 7),
            (3, "a b a c", "en", "mix", 7),
            (4, "solo", "en", "mix", 4),
            (5, "", "en", "mix", 0),
        ],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    out = {
        r["source"]: r.asDict()
        for r in STAGED["tx_bigram_entropy_rate"].fn(spark, d).collect()
    }
    tpl = out["tpl"]
    # bigrams: ab x5, ba x4  (doc1: ab,ba,ab,ba,ab,ba,ab; doc2: ab,ba,ab)
    assert tpl["n_bigrams"] == 10
    assert tpl["h_cond"] == 0.0
    # unigram over first tokens: a 5/10? no: ab(6)+ba(4) -> w='a' 6, 'b' 4
    hu = _q6(0.6 * math.log(10 / 6) / math.log(2)) + _q6(
        0.4 * math.log(10 / 4) / math.log(2)
    )
    assert abs(tpl["h_unigram"] - hu) < 1e-9
    assert abs(tpl["info_gain"] - hu) < 1e-9
    mix = out["mix"]
    # doc3 bigrams: ab, ba, ac -> w='a': {b:1, c:1}, w='b': {a:1}
    assert mix["n_bigrams"] == 3
    hc = _q6((1 / 3) * math.log(2) / math.log(2)) * 2  # two a-terms, b-term 0
    assert abs(mix["h_cond"] - hc) < 1e-9


# ------------------------------------------ inter-arrival statistics


def test_interarrival_hand_gaps(spark, tmp_path):
    """'tick' fires for one user at t=0s,10s,20s: two 10s gaps ->
    mean 10, std 0 -> cv=0, burstiness=(0-10)/(0+10)=-1 (regular).
    'once' has two events 5s apart -> one gap: std/cv/burstiness NULL
    (n=1, the Welch-discipline guard). Gaps never cross users."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, s(0), 1, "tick", 0.0, "{}"),
            (2, s(10), 1, "tick", 0.0, "{}"),
            (3, s(20), 1, "tick", 0.0, "{}"),
            (4, s(100), 2, "tick", 0.0, "{}"),  # other user: no gap pair
            (5, s(0), 1, "once", 0.0, "{}"),
            (6, s(5), 1, "once", 0.0, "{}"),
        ],
        _EV_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    out = {
        r["event_type"]: r.asDict()
        for r in STAGED["ev_interarrival_stats"].fn(spark, d).collect()
    }
    tick = out["tick"]
    assert tick["n_gaps"] == 2
    assert tick["mean_gap_s"] == 10.0
    assert tick["rate_per_hour"] == 360.0
    assert tick["cv"] == 0.0
    assert tick["burstiness"] == -1.0
    once = out["once"]
    assert once["n_gaps"] == 1
    assert once["mean_gap_s"] == 5.0
    assert once["rate_per_hour"] == 720.0
    assert once["cv"] is None
    assert once["burstiness"] is None


# ------------------------------------------ top principal component


def test_power_iteration_dominant_axis(spark, tmp_path):
    """Vectors varying only along dim 1 (others constant): the top PC
    must be the dim-1 axis — loading ±1 at dim 1, 0 elsewhere — and
    λ̂ the population variance along it. 64 dims to match the
    operator's fixed d."""
    import numpy as np

    rng = [(-3.0, 0), (-1.0, 1), (1.0, 2), (3.0, 3)]
    rows = []
    for val, i in rng:
        v = np.zeros(64, dtype=np.float32)
        v[1] = val
        rows.append((i, [float(x) for x in v], 0))
    emb = spark.createDataFrame(rows, _EMB_SCHEMA)
    d = _fixture_dir(spark, tmp_path, embeddings=emb)
    out = STAGED["emb_top_pc_power_iteration"].fn(spark, d).collect()
    by_dim = {r["dim"]: r.asDict() for r in out}
    assert len(by_dim) == 64
    assert abs(by_dim[1]["loading"]) == 1.0
    for i in range(64):
        if i != 1:
            assert by_dim[i]["loading"] == 0.0
    # population variance of (-3,-1,1,3) = (9+1+1+9)/4 = 5
    assert by_dim[1]["lambda_est"] == 5.0


def test_power_iteration_matches_numpy(spark, sf_dir):
    """On the real sf0.001 corpus the 8-iteration estimate must agree
    with a numpy mirror of the SAME quantized recipe — pinning that
    the decimal plumbing implements power iteration, not something
    else. No convergence assertion here: the synthetic corpus is
    near-isotropic (λ1/λ2 ≈ 1.07, so (λ2/λ1)^8 ≈ 0.57 — the top
    eigenspace mixes by design; see the query docstring's convergence
    contract). Convergence itself is proven by the separated-spectrum
    fixture above."""
    import numpy as np

    from cqdg_etl_spark.queries.registry import load as _load

    emb = np.array(
        _load(spark, sf_dir, "embeddings")
        .select("embedding").toPandas()["embedding"].tolist(),
        dtype=np.float64,
    )
    c = np.cov(emb.T, bias=True)
    cq = np.round(c, 6)  # the 6dp cell contract
    v = np.ones(cq.shape[0])
    for _ in range(8):
        s = cq @ v
        z = np.max(np.abs(s))
        v = np.floor((s / z) * 1e6 + 0.5) / 1e6
    out = (
        STAGED["emb_top_pc_power_iteration"].fn(spark, sf_dir)
        .orderBy("dim").toPandas()
    )
    got = out["loading"].to_numpy()
    # semantic mirror, not a bit mirror: float-vs-decimal rounding can
    # drift a few lsd over 8 rounds (cross-ENGINE exactness is what
    # the oracle tests pin; this test pins the ALGORITHM)
    assert np.max(np.abs(got - v)) < 5e-5
    # the estimate lives in the top eigenSPACE even when the top two
    # eigenvalues are near-degenerate: residual outside the top-8
    # subspace must be small
    w, vecs = np.linalg.eigh(c)
    proj = vecs[:, -8:].T @ (got / np.linalg.norm(got))
    assert float(np.linalg.norm(proj)) > 0.95


# ------------------------------------------ two-level shard shuffle


def test_shard_shuffle_permutation_properties(spark, tmp_path):
    """epoch_pos is a bijection onto 1..N; every block holds <=64
    consecutive storage ranks; each block's positions are contiguous
    (blocks are shuffled as units — the IO-locality contract)."""
    docs = spark.createDataFrame(
        [(i * 7 + 3, "t", "en", "s", 1) for i in range(200)], _DOC_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    rows = STAGED["ds_two_level_shard_shuffle"].fn(spark, d).collect()
    assert len(rows) == 200
    pos = sorted(r["epoch_pos"] for r in rows)
    assert pos == list(range(1, 201))
    by_block: dict[int, list] = {}
    for r in rows:
        by_block.setdefault(r["block_id"], []).append(r)
    assert set(by_block) == {0, 1, 2, 3}  # ceil(200/64) = 4 blocks
    doc_ids = sorted(r["doc_id"] for r in rows)
    for bid, rs in by_block.items():
        assert len(rs) <= 64
        # storage contiguity: the block's doc_ids are a contiguous
        # slice of the sorted doc_id sequence
        ids = sorted(r["doc_id"] for r in rs)
        lo = doc_ids.index(ids[0])
        assert doc_ids[lo:lo + len(ids)] == ids
        # position contiguity: blocks move as units
        ps = sorted(r["epoch_pos"] for r in rs)
        assert ps == list(range(ps[0], ps[0] + len(ps)))


def test_shard_shuffle_is_shuffled(spark, sf_dir):
    """The permutation must not be the identity (block order and
    intra-block order both md5-keyed)."""
    out = (
        STAGED["ds_two_level_shard_shuffle"].fn(spark, sf_dir)
        .orderBy("epoch_pos").toPandas()
    )
    ids = out["doc_id"].tolist()
    assert ids != sorted(ids)
