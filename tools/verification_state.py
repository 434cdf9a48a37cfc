"""Mechanical driver-verification staleness tracking (VERDICT r3 #6).

The driver's per-round CORRECTNESS rows are the hard correctness
signal, but a row only vouches for the code that produced it. Round 3
assembled the "changed since its last driver row" set BY HAND from
commit messages — this tool replaces that with committed state:

- Each registry query gets a **verification hash**:
  sha256( normalized optimized-plan string  ||  oracle SQL ||
          sorted (path, file-sha) of UDF-bearing closure modules ).
  * The plan hash is the primary signal: it changes exactly when the
    query's logical semantics/shape change (the judge's staleness
    standard — "changed the plans of ..."), and does NOT change when
    an unrelated helper lands in the same module.
  * Plan strings embed a Python UDF only by name, so a body edit in
    e.g. pandas_ops.run() is plan-invisible — hence the second
    component: source hashes of the import-closure modules that
    contain an Arrow/Python boundary (pandas_udf / applyInPandas /
    mapInPandas / udtf / applyInPandasWithState). Over-marks queries
    importing an edited UDF module; never under-marks.
  * Expression ids (#123), plan ids, object addresses, and runtime
    stage ids are normalized out, so the hash is stable across
    sessions. One residual: Catalyst's multi-countDistinct rewrite
    numbers its Expand gid groups from session-wide expression-id
    history, so a query with several exact-distinct aggregates (e.g.
    pf_profile_orders) can re-hash when UNRELATED upstream queries
    change how many expressions they allocate. That direction is safe:
    it can only OVER-mark (the query gets an extra driver row), never
    under-mark — a real change to the query itself always changes the
    plan text too.

- ``verification_state.json`` (committed) holds:
    {"verified": {name: {"round": "r04", "hash": h}},
     "legacy":   {name: "r03"},          # pre-tool green rounds
     "pending":  {"round": "r05", "hashes": {name: h}}}

Round workflow:
  end of round N   : python tools/verification_state.py record-pending rN
                     (after the final code state; commits the hashes the
                      driver is about to verify)
  start of round N+1: python tools/verification_state.py promote
                     (reads CORRECTNESS_rN.json, moves green pending
                      hashes into verified)
                     python tools/verification_state.py front
                     (prints the recommended _FRONT ordering: stale /
                      never-verified first, then oldest rounds)

Run via ``python tools/verification_state.py <cmd>`` from the repo
root (needs a local SparkSession for plan hashes — ~1 min).
"""

from __future__ import annotations

import ast
import hashlib
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:  # runnable from any cwd
    sys.path.insert(0, str(REPO))
PKG = REPO / "cqdg_etl_spark"
STATE_PATH = REPO / "verification_state.json"
SF_DIR = "/root/testdata/sf0.001"

_BOUNDARY_RE = re.compile(
    r"pandas_udf|applyInPandas|mapInPandas|udtf|applyInPandasWithState"
)
_NORM_RES = [
    (re.compile(r"#\d+"), "#x"),
    (re.compile(r"plan_id=\d+"), "plan_id=x"),
    # Runtime-nondeterministic ids inside ALREADY-EXECUTED cached
    # subtrees (a persisted frame materialized at query-build time
    # embeds its final AQE plan): query-stage numbers and whole-stage
    # codegen ids depend on stage scheduling order, not on the query.
    (re.compile(r"QueryStage \d+"), "QueryStage x"),
    (re.compile(r"\*\(\d+\)"), "*(x)"),
    (re.compile(r"0x[0-9a-f]+"), "0xX"),
    (re.compile(r"at 0xX>"), ">"),
    # per-process staging dirs (the clinical-fixture cache stages the
    # reference TSV/NDJSON inputs under mkdtemp)
    (re.compile(r"/tmp/[\w.\-]+"), "/tmp/X"),
]


def _module_files() -> dict[str, Path]:
    """Map dotted module name -> file for every module in the package."""
    out = {}
    for p in PKG.rglob("*.py"):
        rel = p.relative_to(REPO).with_suffix("")
        dotted = ".".join(rel.parts)
        if dotted.endswith(".__init__"):
            dotted = dotted[: -len(".__init__")]
        out[dotted] = p
    return out


def _imports_of(path: Path, modules: set[str]) -> set[str]:
    """Intra-package imports (top-level AND nested in function bodies —
    this codebase imports operators inside query fns). For
    ``from pkg import name``, ``pkg.name`` is included when it is
    itself a module (``from cqdg_etl_spark.operators import
    multimodal`` must pull in multimodal.py, not just the package
    __init__)."""
    tree = ast.parse(path.read_text())
    found = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module:
            if node.module.startswith("cqdg_etl_spark"):
                found.add(node.module)
                for a in node.names:
                    sub = f"{node.module}.{a.name}"
                    if sub in modules:
                        found.add(sub)
        elif isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith("cqdg_etl_spark"):
                    found.add(a.name)
    return found


def _closure(module: str, files: dict[str, Path]) -> set[str]:
    seen: set[str] = set()
    names = set(files)
    todo = [module]
    while todo:
        m = todo.pop()
        if m in seen or m not in files:
            continue
        seen.add(m)
        todo.extend(_imports_of(files[m], names))
    return seen


_GID_TOKEN_RE = re.compile(r"[A-Za-z0-9_#.]+")


def _canon_gid_line(line: str) -> str:
    """Canonical form for a line produced by Catalyst's
    RewriteDistinctAggregates rewrite. The rewrite numbers its Expand
    gid groups from session-wide expression-id allocation order, so the
    column->gid pairing, the literal group numbers, and the ordering of
    the intermediate grouping/projection lists all permute across
    sessions with identical query code. Every affected line contains
    the ``gid#x`` token (post expression-id normalization); for those
    lines only, hash a sorted token multiset with digit literals
    collapsed — permutation/renumbering-invariant, still sensitive to
    which columns, aggregates, and aliases appear. Tree indentation is
    preserved so node position still matters."""
    indent_len = len(line) - len(line.lstrip(" +-:"))
    tokens = _GID_TOKEN_RE.findall(line)
    canon = " ".join(
        sorted("N" if t.isdigit() else t for t in tokens)
    )
    return line[:indent_len] + "GIDCANON[" + canon + "]"


def _normalize_plan(plan: str) -> str:
    for rx, repl in _NORM_RES:
        plan = rx.sub(repl, plan)
    return "\n".join(
        _canon_gid_line(ln) if "gid#x" in ln else ln
        for ln in plan.split("\n")
    )


def compute_hashes() -> dict[str, str]:
    from cqdg_etl_spark.queries import REGISTRY
    from cqdg_etl_spark.session import get_spark

    spark = get_spark()
    files = _module_files()
    file_sha = {
        m: hashlib.sha256(p.read_bytes()).hexdigest()
        for m, p in files.items()
    }
    boundary = {
        m for m, p in files.items() if _BOUNDARY_RE.search(p.read_text())
    }
    out = {}
    for name, q in REGISTRY.items():
        h = hashlib.sha256()
        try:
            df = q.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
            h.update(_normalize_plan(plan).encode())
        except Exception as ex:  # streaming-only entries etc.
            h.update(f"plan-error:{type(ex).__name__}".encode())
        h.update((q.oracle or "").encode())
        mod = q.fn.__module__
        for m in sorted(_closure(mod, files) & boundary):
            h.update(f"{m}:{file_sha[m]}".encode())
        out[name] = h.hexdigest()
    return out


def _load_state() -> dict:
    if STATE_PATH.exists():
        return json.loads(STATE_PATH.read_text())
    return {"verified": {}, "legacy": {}, "pending": None}


def _save_state(state: dict) -> None:
    STATE_PATH.write_text(json.dumps(state, indent=1, sort_keys=True) + "\n")


def _round_num(tag: str) -> int:
    return int(tag.lstrip("r"))


def cmd_record_pending(round_tag: str) -> None:
    state = _load_state()
    state["pending"] = {"round": round_tag, "hashes": compute_hashes()}
    _save_state(state)
    print(f"pending hashes recorded for {round_tag}: "
          f"{len(state['pending']['hashes'])} queries")


def cmd_promote() -> None:
    state = _load_state()
    pending = state.get("pending")
    if not pending:
        print("no pending hashes; run record-pending first")
        return
    tag = pending["round"]
    cpath = REPO / f"CORRECTNESS_{tag}.json"
    if not cpath.exists():
        print(f"{cpath.name} not found yet; nothing to promote")
        return
    rows = json.loads(cpath.read_text())
    promoted = 0
    for name, row in rows.items():
        green = (
            row.get("err") is None
            and row.get("rows_match", False)
            and row.get("schema_match", False)
            # rows-only checks have no hash_match key; treat presence
            # of a true value OR absence of the key as green
            and row.get("hash_match", True)
        )
        if green and name in pending["hashes"]:
            state["verified"][name] = {
                "round": tag,
                "hash": pending["hashes"][name],
            }
            state.get("legacy", {}).pop(name, None)
            promoted += 1
    state["pending"] = None
    _save_state(state)
    print(f"promoted {promoted} green {tag} rows into verified")


def stale_names(current: dict[str, str] | None = None) -> list[str]:
    """Names whose current hash mismatches their verified hash, or that
    have no verified entry and no legacy green round — in registry
    order."""
    from cqdg_etl_spark.queries import REGISTRY

    state = _load_state()
    cur = current or compute_hashes()
    verified = state.get("verified", {})
    legacy = state.get("legacy", {})
    out = []
    for name in REGISTRY:
        v = verified.get(name)
        if v is not None:
            if v["hash"] != cur.get(name):
                out.append(name)
        elif name not in legacy:
            out.append(name)
    return out


def cmd_front() -> None:
    """Print the recommended _FRONT ordering: the verification DEBT
    first — never-verified names (no row ever, the hardest debt),
    then hash-stale names oldest-verified-round first (a recent row
    vouches more than an old one when the window can't fit everyone) —
    then the non-debt names, legacy/verified oldest round first. When
    the debt exceeds the driver's 50-row window, this ordering makes
    the roll-over deterministic: positions 51+ are exactly the
    most-recently-verified stale names, and they stay at the head of
    the next round's front until their row lands."""
    from cqdg_etl_spark.queries import REGISTRY

    state = _load_state()
    cur = compute_hashes()
    stale = stale_names(cur)
    legacy = state.get("legacy", {})
    verified = state.get("verified", {})
    reg_pos = {n: i for i, n in enumerate(REGISTRY)}
    never = [n for n in stale if n not in verified and n not in legacy]
    changed = [n for n in stale if n in verified or n in legacy]
    changed.sort(
        key=lambda n: (
            _round_num(
                verified[n]["round"] if n in verified else legacy[n]
            ),
            reg_pos[n],
        )
    )
    rest = [n for n in REGISTRY if n not in set(stale)]
    rest.sort(
        key=lambda n: (
            _round_num(legacy.get(n) or verified[n]["round"]),
            reg_pos[n],
        )
    )
    for n in never + changed + rest:
        print(n)


def cmd_seed_legacy() -> None:
    """One-time: record each name's newest green pre-tool round from
    the committed CORRECTNESS_r*.json files (no hashes — history can't
    be re-hashed honestly; these names simply sort after hash-stale
    ones until a fresh driver row promotes them)."""
    state = _load_state()
    legacy = {}
    for cpath in sorted(REPO.glob("CORRECTNESS_r*.json")):
        tag = cpath.stem.split("_")[1]
        for name, row in json.loads(cpath.read_text()).items():
            green = (
                row.get("err") is None
                and row.get("rows_match", False)
                and row.get("schema_match", False)
                and row.get("hash_match", True)
            )
            if green and name not in state.get("verified", {}):
                legacy[name] = tag
    state["legacy"] = legacy
    _save_state(state)
    print(f"seeded legacy rounds for {len(legacy)} names")


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "stale"
    if cmd == "record-pending":
        cmd_record_pending(sys.argv[2])
    elif cmd == "promote":
        cmd_promote()
    elif cmd == "stale":
        for n in stale_names():
            print(n)
    elif cmd == "front":
        cmd_front()
    elif cmd == "seed-legacy":
        cmd_seed_legacy()
    else:
        raise SystemExit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
