"""Behavioral tests for round-3 batch 10: source KL divergence and
vocabulary overlap. (Value-level oracle parity is covered by
tests/test_correctness.py.)"""

from __future__ import annotations


def _write_docs(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": list(range(len(rows))),
            "text": [t for _, t in rows],
            "lang": ["en"] * len(rows),
            "source": [s for s, _ in rows],
            "n_chars": [len(t) for _, t in rows],
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_kl_zero_when_source_matches_corpus(spark, tmp_path):
    from cqdg_etl_spark.queries import REGISTRY

    # both sources have the identical token distribution -> each
    # source distribution equals the corpus distribution -> KL = 0
    sf = _write_docs(tmp_path, [("a", "x x y"), ("b", "x x y")])
    out = {r["source"]: r for r in
           REGISTRY["tx_source_kl_divergence"].fn(spark, sf).collect()}
    assert out["a"]["kl"] == 0.0 and out["b"]["kl"] == 0.0
    assert out["a"]["n_toks"] == 3


def test_kl_positive_for_divergent_source(spark, tmp_path):
    from cqdg_etl_spark.queries import REGISTRY

    sf = _write_docs(
        tmp_path, [("a", "x x x x"), ("b", "y y y y")]
    )
    out = {r["source"]: r for r in
           REGISTRY["tx_source_kl_divergence"].fn(spark, sf).collect()}
    # each source is fully concentrated on its own token: KL = ln 2
    import math

    assert abs(out["a"]["kl"] - round(math.log(2), 6)) < 1e-6
    assert abs(out["b"]["kl"] - round(math.log(2), 6)) < 1e-6


def test_vocab_overlap_hand_computed(spark, tmp_path):
    from cqdg_etl_spark.queries import REGISTRY

    # vocab a = {x, y, z}, vocab b = {y, z, w}: common 2, union 4
    sf = _write_docs(tmp_path, [("a", "x y z y"), ("b", "y z w")])
    rows = REGISTRY["tx_source_vocab_overlap"].fn(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src_a"], r["src_b"]) == ("a", "b")
    assert (r["nv_a"], r["nv_b"], r["n_common"]) == (3, 3, 2)
    assert r["jaccard"] == 0.5


def test_zipf_slope_near_minus_one_for_zipfian_corpus(spark, tmp_path):
    from cqdg_etl_spark.queries import REGISTRY

    # build a corpus whose token frequencies follow freq(r) = 600/r:
    # OLS on (ln r, ln freq) must recover slope ~ -1
    words = []
    for r in range(1, 31):
        words += [f"w{r:02d}"] * (600 // r)
    rows = [("s", " ".join(words))]
    _write_docs(tmp_path, rows)
    out = REGISTRY["tx_zipf_fit"].fn(spark, str(tmp_path)).collect()[0]
    assert out["n_terms"] == 30
    assert abs(out["zipf_slope"] + 1.0) < 0.02  # floor(600/r) rounding
