"""Tests for tools/verification_state.py — the mechanical staleness
tracker that decides _FRONT ordering (VERDICT r3 #6)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import hashlib  # noqa: E402

from tools.verification_state import (  # noqa: E402
    _BOUNDARY_RE,
    _canon_gid_line,
    _closure,
    _fn_component,
    _module_files,
    _normalize_plan,
    stale_names,
)


def _components():
    """v2 UDF-source components for the whole registry (no Spark —
    static analysis only)."""
    from cqdg_etl_spark.queries import REGISTRY

    files = _module_files()
    file_sha = {
        m: hashlib.sha256(p.read_bytes()).hexdigest()
        for m, p in files.items()
    }
    boundary = {
        m for m, p in files.items() if _BOUNDARY_RE.search(p.read_text())
    }
    cache = {}
    return {
        n: _fn_component(q.fn, files, boundary, file_sha, cache)
        for n, q in REGISTRY.items()
    }


def test_closure_follows_nested_imports():
    """Query modules import operators INSIDE function bodies; the
    closure must see those, plus their transitive deps."""
    files = _module_files()
    cl = _closure("cqdg_etl_spark.queries.datapipe9", files)
    assert "cqdg_etl_spark.functions.text" in cl  # nested import
    assert "cqdg_etl_spark.operators.similarity" in cl
    assert "cqdg_etl_spark.queries.registry" in cl  # top-level


def test_closure_resolves_from_package_import_submodule():
    """``from cqdg_etl_spark.operators import multimodal`` names a
    MODULE in the import list — the closure must include multimodal.py
    itself, not just the operators package __init__ (a UDF body edit
    there must mark the mm queries stale)."""
    files = _module_files()
    cl = _closure("cqdg_etl_spark.queries.datapipe", files)
    assert "cqdg_etl_spark.operators.multimodal" in cl


def test_normalize_plan_strips_session_varying_tokens():
    raw = (
        "Project [a#123L, udf(b#9)#44 AS c#7]\n"
        "+- Relation [x#1] parquet, "
        "file:/tmp/cqdg_e2e_ab12cd/with-ids/donor-with-ids\n"
        "+- Exchange hashpartitioning(a#123L, 32), plan_id=55\n"
        "<function band_keys at 0x7f3a2b1c>"
    )
    n1 = _normalize_plan(raw)
    n2 = _normalize_plan(
        raw.replace("#123", "#999")
        .replace("plan_id=55", "plan_id=8")
        .replace("cqdg_e2e_ab12cd", "cqdg_e2e_zz99xx")
        .replace("0x7f3a2b1c", "0x5500aa11")
    )
    assert n1 == n2
    assert "#123" not in n1 and "/tmp/cqdg_e2e_ab12cd" not in n1


def test_fn_component_scopes_to_referenced_code():
    """The v2 component must couple a query to exactly the code it can
    execute: a TPC-H scan-agg never hashes similarity.py; the embedding
    family does; and a sibling query in the same module editing its own
    body must not move other names (distinct local-grain hashes)."""
    comps = _components()
    sim = "cqdg_etl_spark.operators.similarity"
    assert sim not in comps["q1_pricing_summary"]
    assert sim not in comps["ev_sessionize"]
    assert f"mod:{sim}:" in comps["dd_embedding_cosine_pairs"]
    assert f"mod:{sim}:" in comps["dd_semantic_prune"]
    # local grain: sibling queries in datapipe.py carry their own
    # reachable-source hash, not the whole module sha
    a = comps["dd_ngram_jaccard_pairs"].splitlines()[0]
    b = comps["ds_train_val_split"].splitlines()[0]
    assert a.startswith("local:cqdg_etl_spark.queries.datapipe:")
    assert b.startswith("local:cqdg_etl_spark.queries.datapipe:")
    assert a != b


def test_fn_component_decorator_oracle_builders_excluded():
    """@query(oracle=_sql_...(...)) builders run at import time and
    their OUTPUT is hashed as the oracle component; reaching through
    the decorator would re-couple every query in a module to shared
    SQL helpers (datapipe2 imports similarity for its oracle builders —
    tx_top_bigrams must not hash it)."""
    comps = _components()
    assert "operators.similarity" not in comps["tx_top_bigrams"]


def test_fn_component_registry_dispatch_falls_back_coarse():
    """REGISTRY["..."] dispatch reaches arbitrary query fns — the
    component must forfeit the function-level refinement and fall back
    to the whole-module closure (emb_topk_recall_eval re-runs
    ann_topk_lsh, so similarity.py must be hashed even though the fn
    never names it)."""
    comps = _components()
    c = comps["emb_topk_recall_eval"]
    assert not c.startswith("local:")
    assert "mod:cqdg_etl_spark.operators.similarity:" in c


def test_lambda_renumbering_session_invariant_yet_distinct():
    """HOF lambda variables are numbered from a session-global counter;
    the normalizer must make two plans differing only by that offset
    identical, while keeping DISTINCT variables within one plan
    distinct."""
    from tools.verification_state import _renumber_lambdas

    a = ("Project [aggregate(v#x, 0.0, lambdafunction((lambda acc_3#x + "
         "lambda x_4#x), lambda acc_3#x, lambda x_4#x, false)) AS s#x]")
    b = a.replace("_3", "_17").replace("_4", "_18")
    assert _renumber_lambdas(a) == _renumber_lambdas(b)
    # swapping which variable the body references must stay visible
    c = ("Project [aggregate(v#x, 0.0, lambdafunction((lambda x_4#x + "
         "lambda x_4#x), lambda acc_3#x, lambda x_4#x, false)) AS s#x]")
    assert _renumber_lambdas(a) != _renumber_lambdas(c)


def test_canon_gid_line_absorbs_renumbering_and_order():
    """Catalyst's RewriteDistinctAggregates numbers Expand gid groups
    from session expression-id history: group literals and within-line
    list order permute across sessions. The canonical form must be
    invariant to both, yet still sensitive to which columns appear."""
    a = "   +- Expand [[a#x, null, 1], [null, b#x, 2]], [a#x, b#x, gid#x]"
    b = "   +- Expand [[null, b#x, 1], [a#x, null, 2]], [b#x, a#x, gid#x]"
    assert _canon_gid_line(a) == _canon_gid_line(b)
    c = "   +- Expand [[a#x, null, 1], [null, c#x, 2]], [a#x, c#x, gid#x]"
    assert _canon_gid_line(a) != _canon_gid_line(c)


def test_gid_plan_hash_stable_across_expression_drift():
    """VERDICT r5 #4 done-criterion: the normalized plan of the
    multi-distinct query must be byte-stable across two sessions where
    one first allocates an unrelated number of expression ids (the
    exact churn that upstream edits cause)."""
    import subprocess

    script = """
import sys; sys.path.insert(0, {repo!r})
from tools.verification_state import _normalize_plan
from cqdg_etl_spark.queries import REGISTRY
from cqdg_etl_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark()
if {burn}:
    df = spark.range(10)
    for i in range({burn}):
        df = df.select("*", (F.col("id") * i).alias(f"z{{i}}"))
    df.count()
d = REGISTRY["pf_profile_orders"].fn(spark, "/root/testdata/sf0.001")
p = _normalize_plan(d._jdf.queryExecution().optimizedPlan().toString())
print("PLANHASH", __import__("hashlib").sha256(p.encode()).hexdigest())
"""
    outs = []
    for burn in (0, 83):
        r = subprocess.run(
            [sys.executable, "-c", script.format(repo=str(REPO), burn=burn)],
            capture_output=True, text=True, timeout=300,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("PLANHASH")]
        assert line, r.stderr[-2000:]
        outs.append(line[0])
    assert outs[0] == outs[1]


def test_front_covers_mechanically_stale_names():
    """The verification debt (stale + never-verified names) must be a
    PREFIX of _FRONT, so the driver's 50-row window clears as much of
    it as fits and any overflow sits at positions 51+ where the next
    round's window picks it up first. Overflow is bounded: a debt much
    larger than one round's window means staleness is being created
    faster than it can be verified — fail loudly then."""
    state = json.loads((REPO / "verification_state.json").read_text())
    pending = state.get("pending")
    assert pending, "verification_state.json must carry pending hashes"
    stale = stale_names(pending["hashes"])

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    debt = set(stale)
    prefix = mod._FRONT[: len(debt)]
    not_in_prefix = sorted(debt - set(prefix))
    assert not not_in_prefix, (
        f"debt names not at the head of _FRONT: {not_in_prefix}"
    )
    overflow = [n for n in mod._FRONT[50 : len(debt)]]
    assert len(overflow) <= 10, (
        f"verification debt overflows the 50-row window by "
        f"{len(overflow)} — staleness is outpacing the driver: {overflow}"
    )


def test_rebase_guard_mechanics(monkeypatch, tmp_path):
    """The rebase soundness precondition is ENFORCED (ADVICE r6 #1):
    dirty tree -> refuse; clean tree without a promote stamp ->
    refuse; stamp mismatch (package drifted since promote) -> refuse;
    matching stamp -> rebases; --force overrides everything."""
    import pytest

    from tools import verification_state as vs

    monkeypatch.setattr(vs, "STATE_PATH", tmp_path / "state.json")
    vs._save_state(
        {"verified": {"q": {"round": "r01", "hash": "old"}},
         "legacy": {}, "pending": None}
    )
    monkeypatch.setattr(vs, "compute_hashes", lambda: {"q": "new"})

    monkeypatch.setattr(vs, "_git_dirty_paths", lambda: [" M x.py"])
    with pytest.raises(SystemExit, match="dirty"):
        vs.cmd_rebase()

    monkeypatch.setattr(vs, "_git_dirty_paths", lambda: [])
    with pytest.raises(SystemExit, match="no promoted_tree"):
        vs.cmd_rebase()

    st = vs._load_state()
    st["promoted_tree"] = "stampA"
    vs._save_state(st)
    monkeypatch.setattr(vs, "_pkg_tree_sha", lambda: "driftedB")
    with pytest.raises(SystemExit, match="package tree changed"):
        vs.cmd_rebase()
    assert vs._load_state()["verified"]["q"]["hash"] == "old"

    monkeypatch.setattr(vs, "_pkg_tree_sha", lambda: "stampA")
    vs.cmd_rebase()
    assert vs._load_state()["verified"]["q"]["hash"] == "new"

    # --force bypasses both checks (dirty tree AND no stamp).
    st = vs._load_state()
    st["verified"]["q"]["hash"] = "old"
    del st["promoted_tree"]
    vs._save_state(st)
    monkeypatch.setattr(vs, "_git_dirty_paths", lambda: [" M x.py"])
    vs.cmd_rebase({"--force"})
    assert vs._load_state()["verified"]["q"]["hash"] == "new"


def test_rebase_keep_stale_respected_under_guard(monkeypatch, tmp_path):
    """keep_stale names keep their old (stale) hash even when the
    guard passes — they stay in the debt queue."""
    from tools import verification_state as vs

    monkeypatch.setattr(vs, "STATE_PATH", tmp_path / "state.json")
    vs._save_state(
        {"verified": {"a": {"round": "r01", "hash": "oldA"},
                      "b": {"round": "r02", "hash": "oldB"}},
         "legacy": {}, "pending": None,
         "promoted_tree": "stampA"}
    )
    monkeypatch.setattr(vs, "compute_hashes", lambda: {"a": "newA", "b": "newB"})
    monkeypatch.setattr(vs, "_git_dirty_paths", lambda: [])
    monkeypatch.setattr(vs, "_pkg_tree_sha", lambda: "stampA")
    vs.cmd_rebase({"b"})
    state = vs._load_state()
    assert state["verified"]["a"]["hash"] == "newA"
    assert state["verified"]["b"]["hash"] == "oldB"
