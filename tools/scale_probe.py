#!/usr/bin/env python
"""Time-vs-scale curvature probe (VERDICT r4 next-round item #7).

The bench gate runs at sf0.1 — flat timings there cannot distinguish a
linear plan from a quadratic one whose constant is still small. This
probe synthesizes 2×/5×/10× corpora from the sf0.1 tables (deterministic
replication with per-replica perturbation, so duplicate DENSITY stays
constant instead of every replica pairing with its source — replicated
identical rows would grow the semantic pair OUTPUT quadratically and
mask the operational curve) and times the priciest dedup/ANN headliners
at each scale. The first superlinear curve is the next weak-at-scale
finding before it reaches a verdict.

Usage:
    python tools/scale_probe.py             # scales 1,2,5,10 of sf0.1
    python tools/scale_probe.py 1 2 5      # custom scale list

Output: a markdown table (time, output rows, and the log-log growth
exponent between successive scales; exponent ~1 = linear in corpus
size, ~2 = quadratic). One timed run per (query, scale) after a warmup
run, fresh caches between queries — the box's steal transients
(BENCH_SPREAD_r05.md) can inflate single numbers, so judge a SLOPE
here, not any one cell.
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

BASE = "/root/testdata/sf0.1"
WORK = Path("/tmp/scale_probe")

# The 5 priciest dedup/ANN bench queries of BENCH_r04 (VERDICT r4
# plan-audit list), plus the two new headliners they gate.
QUERIES = [
    "dd_tfidf_cosine_pairs",
    "dd_embedding_cosine_pairs",
    "dd_minhash_verified_pairs",
    "dd_ppjoin_pairs",
    "dd_minhash_lsh_candidates",
    "ann_topk_gemm",
    "pipe_corpus_curation_e2e",
]

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def build_scaled_dir(scale: int) -> str:
    """Materialize a scale× corpus: documents/embeddings replicated with
    per-replica perturbation, every other table copied as-is."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = WORK / f"x{scale}"
    if out.exists():
        return str(out)
    out.mkdir(parents=True)
    for t in ALL_TABLES:
        if t not in ("documents", "embeddings"):
            shutil.copy(f"{BASE}/{t}.parquet", out / f"{t}.parquet")

    docs = pq.read_table(f"{BASE}/documents.parquet")
    reps = []
    for r in range(scale):
        doc_id = np.asarray(docs["doc_id"], dtype=np.int64) + r * 10_000_000
        if r == 0:
            text = docs["text"]
        else:
            # distinct-but-similar text per replica: a replica tag token
            # keeps shingle distributions close while breaking exact
            # cross-replica duplication (constant per-capita dup rate)
            text = pa.array(
                [f"{t} zz{r}q{i % 97}" for i, t in
                 enumerate(docs["text"].to_pylist())]
            )
        reps.append(pa.table({
            "doc_id": pa.array(doc_id),
            "text": text,
            "lang": docs["lang"],
            "source": docs["source"],
            "n_chars": docs["n_chars"],
        }))
    pq.write_table(pa.concat_tables(reps), out / "documents.parquet")

    emb = pq.read_table(f"{BASE}/embeddings.parquet")
    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    vtype = emb.schema.field("embedding").type
    reps = []
    for r in range(scale):
        vec_id = np.asarray(emb["vec_id"], dtype=np.int64) + r * 10_000_000
        if r == 0:
            v = vecs
        else:
            rng = np.random.default_rng(1000 + r)
            v = vecs + rng.normal(0.0, 0.05, vecs.shape)
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
        reps.append(pa.table({
            "vec_id": pa.array(vec_id),
            "embedding": pa.array(list(v), type=vtype),
            "label": emb["label"],
        }))
    pq.write_table(pa.concat_tables(reps), out / "embeddings.parquet")
    return str(out)


def main() -> int:
    scales = [int(a) for a in sys.argv[1:]] or [1, 2, 5, 10]
    from cqdg_etl_spark.queries import REGISTRY
    from cqdg_etl_spark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    results: dict[str, list[tuple[int, float, int]]] = {q: [] for q in QUERIES}
    for scale in scales:
        sf_dir = build_scaled_dir(scale)
        for name in QUERIES:
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warmup
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            n_out = df.count()
            results[name].append((scale, dt, n_out))
            spark.catalog.clearCache()
            print(f"x{scale} {name}: {dt:.2f} s, {n_out} rows", flush=True)

    import math

    print("\n| query | " + " | ".join(f"x{s}" for s in scales) +
          " | rows@max | exponent (last step) |")
    print("|---" * (len(scales) + 3) + "|")
    for name, rows in results.items():
        cells = " | ".join(f"{dt:.2f}s" for _, dt, _ in rows)
        (s1, t1, _), (s2, t2, n2) = rows[-2], rows[-1]
        expo = math.log(t2 / t1) / math.log(s2 / s1) if t1 > 0 else 0.0
        print(f"| {name} | {cells} | {n2} | {expo:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
