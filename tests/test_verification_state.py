"""Tests for tools/verification_state.py — the mechanical staleness
tracker that decides _FRONT ordering (VERDICT r3 #6)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.verification_state import (  # noqa: E402
    _closure,
    _module_files,
    _normalize_plan,
    stale_names,
)


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
