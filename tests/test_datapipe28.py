"""datapipe28 queries (staged for round-20 publication): full local
verification against the DuckDB oracles — the same comparison the
driver gate runs — plus adversarial fixtures run through BOTH engines
and hand-computed expectations. A staged-scope plan lint mirrors
tests/test_plan_lint.py until publication moves these names under the
fleet-wide lint (_BNLJ_OK → BNLJ_OK; the orphan test enforces the
copy). Written in the same commit as the module (the datapipe23
lesson)."""

from __future__ import annotations

import bisect
import datetime as dt
import hashlib
import math

import pytest

from cqdg_etl_spark.queries.datapipe28 import _POIS_T, STAGED
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
    """Staged names stay out of REGISTRY until the round-20 publication
    flips them in (the datapipe13-27 staging discipline)."""
    from cqdg_etl_spark.queries import REGISTRY

    assert not (set(STAGED) & set(REGISTRY)), (
        "staged datapipe28 names leaked into the published registry"
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
    "ev_poisson_bootstrap_ci": "single-row point-estimate scalar "
    "fanned onto the B-row replicate-mean frame",
    "pf_jackknife_source_sensitivity": "two 1-row scalars (corpus "
    "totals, jackknife-SE moments) fanned onto the |sources| frame",
    "tx_word_dispersion_dp": "single-row corpus-token-total scalar "
    "fanned onto the top-k postings",
    "ev_littles_law_audit": "the hour-mark spine range-joined "
    "(bucket < mark) against the two hour-bucket histograms — all "
    "three frames bounded by the time span, never the corpus; plus "
    "the 1-row span/duration scalar",
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


def _q6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# ------------------------------------------------- Poisson bootstrap


def _fmix(h0: int, b: int) -> int:
    """The engine-portable murmur3-fmix32 replicate mix
    (datapipe28._MIX_*), replicated bit-for-bit in Python."""
    x = h0 ^ ((b * 2654435761) % 2**32)
    x ^= x >> 16
    x = (x * 2246822519) % 2**32
    x ^= x >> 13
    x = (x * 3266489917) % 2**32
    x ^= x >> 16
    return x


def _pois_w(b: int, eid: int) -> int:
    h0 = int(hashlib.md5(f"boot:{eid}".encode()).hexdigest()[:8], 16)
    return bisect.bisect_right(_POIS_T, _fmix(h0, b))


def _type7(sorted_xs, p):
    h = (len(sorted_xs) - 1) * p
    lo = int(math.floor(h))
    if lo + 1 >= len(sorted_xs):
        return sorted_xs[lo]
    return sorted_xs[lo] + (h - lo) * (sorted_xs[lo + 1] - sorted_xs[lo])


def test_bootstrap_hand_replicated(spark, tmp_path):
    """Three events with values {10, 20, 30}: the 100 replicate means
    are fully determined by the md5 weights — replicate the inverse-
    CDF draw, the weighted means, and the type-7 percentile chain in
    Python and match exactly."""
    vals = {1: 10.0, 2: 20.0, 3: 30.0}
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(eid, t0, 1, "A", v, "{}") for eid, v in vals.items()], _EV_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_poisson_bootstrap_ci"].fn(spark, d).collect()[0].asDict()
    means = []
    for b in range(100):
        sw = sv = 0
        for eid, v in vals.items():
            w = _pois_w(b, eid)
            sw += w
            sv += w * v
        if sw > 0:
            means.append(sv / sw)
    means.sort()
    assert (r["n_events"], r["n_replicates"]) == (3, len(means))
    assert r["point_mean"] == 20.0
    assert r["ci_low"] == _q6(_type7(means, 0.025))
    assert r["ci_high"] == _q6(_type7(means, 0.975))
    _compare_staged(spark, "ev_poisson_bootstrap_ci", d,
                    con=_fixture_conn(d, "events"))


def test_bootstrap_brackets_point_on_real_data(spark, sf_dir):
    """The 95% CI brackets the point estimate and has positive width
    on any non-degenerate corpus."""
    r = STAGED["ev_poisson_bootstrap_ci"].fn(spark, sf_dir) \
        .collect()[0].asDict()
    assert r["ci_low"] < r["ci_high"]
    assert r["ci_low"] <= r["point_mean"] <= r["ci_high"]


# ------------------------------------------------- Good-Turing


def test_good_turing_hand_computed(spark, tmp_path):
    """s1 'a a b c': N=4, singletons {b, c} → p₀ = 0.5, r₁* = 2·1/2=1
    (one doubleton). s2 'x x y y': no singletons → unseen 0, r₁*
    NULL (saturated)."""
    docs = spark.createDataFrame(
        [(1, "a a b c", "en", "s1", 7), (2, "x x y y", "en", "s2", 7)],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    out = {r["source"]: r.asDict() for r in
           STAGED["tx_unseen_mass_good_turing"].fn(spark, d).collect()}
    s1 = out["s1"]
    assert (s1["n_tokens"], s1["n_types"], s1["n1"], s1["n2"]) == (4, 3, 2, 1)
    assert s1["unseen_mass"] == 0.5
    assert s1["r1_adjusted"] == 1.0
    s2 = out["s2"]
    assert s2["unseen_mass"] == 0.0
    assert s2["r1_adjusted"] is None
    _compare_staged(spark, "tx_unseen_mass_good_turing", d,
                    con=_fixture_conn(d, "documents"))


# ------------------------------------------------- jackknife


def test_jackknife_hand_computed(spark, tmp_path):
    """s1 lengths {10, 20}, s2 {30}: corpus mean 20; leave-out means
    30 and 15 → influences +10/−5; delete-one-group SE
    √(½·(1125 − 45²/2)) = 7.5 exactly."""
    docs = spark.createDataFrame(
        [(1, "t", "en", "s1", 10), (2, "t", "en", "s1", 20),
         (3, "t", "en", "s2", 30)],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    out = {r["source"]: r.asDict() for r in
           STAGED["pf_jackknife_source_sensitivity"].fn(spark, d).collect()}
    assert out["s1"]["mean_loo"] == 30.0
    assert out["s1"]["influence"] == 10.0
    assert out["s2"]["mean_loo"] == 15.0
    assert out["s2"]["influence"] == -5.0
    assert out["s1"]["jackknife_se"] == 7.5
    assert out["s2"]["jackknife_se"] == 7.5
    _compare_staged(spark, "pf_jackknife_source_sensitivity", d,
                    con=_fixture_conn(d, "documents"))


def test_jackknife_single_source_empty(spark, tmp_path):
    """One source covering the whole corpus: its leave-out mean is
    undefined → zero rows on both engines."""
    docs = spark.createDataFrame(
        [(1, "t", "en", "s1", 10), (2, "t", "en", "s1", 30)], _DOC_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    assert STAGED["pf_jackknife_source_sensitivity"].fn(spark, d).count() == 0
    _compare_staged(spark, "pf_jackknife_source_sensitivity", d,
                    con=_fixture_conn(d, "documents"))


# ------------------------------------------------- DP dispersion


def test_dp_hand_computed(spark, tmp_path):
    """doc1 'a a b' (3 tokens), doc2 'a b b c' (4): for 'a' both docs
    hold mass (DP = ((|⅔−3/7| + |⅓−4/7|) + 0)/2 via the q6 chain);
    for 'c' (doc2 only) the missing doc contributes its corpus share:
    DP = (|1−4/7| + (1−4/7))/2."""
    docs = spark.createDataFrame(
        [(1, "a a b", "en", "s", 5), (2, "a b b c", "en", "s", 7)],
        _DOC_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    out = {r["token"]: r.asDict() for r in
           STAGED["tx_word_dispersion_dp"].fn(spark, d).collect()}
    assert set(out) == {"a", "b", "c"}
    sh1, sh2 = _q6(3 / 7), _q6(4 / 7)
    da = _q6(abs(2 / 3 - 3 / 7)) + _q6(abs(1 / 3 - 4 / 7))
    assert out["a"]["n_occurrences"] == 3
    assert out["a"]["dp"] == _q6((da + (1.0 - (sh1 + sh2))) / 2.0)
    dc = _q6(abs(1.0 - 4 / 7))
    assert out["c"]["n_docs_with"] == 1
    assert out["c"]["dp"] == _q6((dc + (1.0 - sh2)) / 2.0)
    _compare_staged(spark, "tx_word_dispersion_dp", d,
                    con=_fixture_conn(d, "documents"))


def test_dp_perfectly_even_word(spark, tmp_path):
    """A word spread exactly like the corpus (one 'a' in each
    equal-length doc) reads DP = 0."""
    docs = spark.createDataFrame(
        [(1, "a x", "en", "s", 3), (2, "a y", "en", "s", 3)], _DOC_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    out = {r["token"]: r.asDict() for r in
           STAGED["tx_word_dispersion_dp"].fn(spark, d).collect()}
    assert out["a"]["dp"] == 0.0


# ------------------------------------------------- hash collisions


def test_hash_audit_no_collisions_small(spark, tmp_path):
    """A handful of ids in a 2³² space: zero observed collisions,
    ratio exactly 0."""
    docs = spark.createDataFrame(
        [(k, "t", "en", "s", 5) for k in range(10)], _DOC_SCHEMA
    )
    d = _fixture_dir(spark, tmp_path, documents=docs)
    r = STAGED["sk_hash_collision_audit"].fn(spark, d).collect()[0].asDict()
    assert (r["n_ids"], r["n_collisions"]) == (10, 0)
    assert r["expected_collisions"] == _q6(10 * 9 / 2 / 4294967296.0)
    assert r["observed_over_expected"] == 0.0
    _compare_staged(spark, "sk_hash_collision_audit", d,
                    con=_fixture_conn(d, "documents"))


# ------------------------------------------------- Little's law


def test_littles_law_hand_computed(spark, tmp_path):
    """Session A [00:10, 00:50] (crosses no hour mark) + session B
    [00:30, 02:30]: marks at 01:00/02:00 read level 1 each →
    L_sampled = 1; L_exact = 160min/140min = 8/7 → the hourly grid
    UNDERSTATES load by exactly 7/8 on this workload."""
    def t(h, m):
        return dt.datetime(1970, 1, 1, h, m)

    rows = []
    # session A: user 1, events every 20 min 00:10 -> 00:50
    for k, (h, m) in enumerate([(0, 10), (0, 30), (0, 50)]):
        rows.append((k, t(h, m), 1, "A", 0.0, "{}"))
    # session B: user 2, events every 20 min 00:30 -> 02:30
    for k, mm in enumerate(range(30, 151, 20)):
        rows.append((100 + k, t(0, 0) + dt.timedelta(minutes=mm), 2, "A",
                     0.0, "{}"))
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    d = _fixture_dir(spark, tmp_path, events=ev)
    r = STAGED["ev_littles_law_audit"].fn(spark, d).collect()[0].asDict()
    assert (r["n_sessions"], r["n_marks"]) == (2, 2)
    assert r["l_sampled"] == 1.0
    l_exact = (40 + 120) / 140
    assert r["l_exact"] == _q6(l_exact)
    assert r["sampling_ratio"] == _q6(1.0 / l_exact)
    _compare_staged(spark, "ev_littles_law_audit", d,
                    con=_fixture_conn(d, "events"))


def test_littles_law_markless_corpus_empty(spark, tmp_path):
    """A corpus whose whole span sits inside one hour has no hour
    marks to sample → zero rows on both engines (the documented
    need-a-mark contract)."""
    ev = spark.createDataFrame(
        [(1, dt.datetime(1970, 1, 1, 0, 10), 1, "A", 0.0, "{}"),
         (2, dt.datetime(1970, 1, 1, 0, 40), 1, "A", 0.0, "{}")],
        _EV_SCHEMA,
    )
    d = _fixture_dir(spark, tmp_path, events=ev)
    assert STAGED["ev_littles_law_audit"].fn(spark, d).count() == 0
    _compare_staged(spark, "ev_littles_law_audit", d,
                    con=_fixture_conn(d, "events"))


def test_littles_law_identity_on_real_data(spark, sf_dir):
    """On the real stream the hourly grid should sit near the exact
    time-average (many sessions per hour): ratio within [0.5, 1.5]
    and both L measures positive."""
    rows = STAGED["ev_littles_law_audit"].fn(spark, sf_dir).collect()
    if rows:   # markless tiny fixtures yield no rows
        r = rows[0].asDict()
        assert r["l_exact"] > 0
        assert r["l_sampled"] >= 0
        if r["sampling_ratio"] is not None:
            assert 0.5 <= r["sampling_ratio"] <= 1.5
