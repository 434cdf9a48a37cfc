"""Behavioral tests for round-3 batch 6: PPS systematic sampling,
global cumsum, token-budget selection, temperature mixture. (Value-
level oracle parity is covered by tests/test_correctness.py.)"""

from __future__ import annotations

from pyspark.sql import functions as F


# ------------------------------------------------ pps_systematic_sample


def test_pps_pin_count_conserved_and_weight_proportional(spark):
    from cqdg_etl_spark.operators.sampling import pps_systematic_sample

    # one stratum: weights 1..100; k pins total, heavy rows more likely
    df = spark.range(1, 101).select(
        F.lit("s").alias("src"),
        F.col("id").alias("doc"),
        F.col("id").alias("w"),
    )
    out = pps_systematic_sample(df, "src", "doc", "w", k=10).collect()
    assert sum(r["n_pins"] for r in out) == 10  # exactly k pins land
    # heaviest decile must be overrepresented vs lightest decile
    heavy = sum(r["n_pins"] for r in out if r["doc"] > 90)
    light = sum(r["n_pins"] for r in out if r["doc"] <= 10)
    assert heavy > light


def test_pps_giant_row_takes_multiple_pins(spark):
    from cqdg_etl_spark.operators.sampling import pps_systematic_sample

    df = spark.createDataFrame(
        [("s", 1, 97), ("s", 2, 1), ("s", 3, 1), ("s", 4, 1)],
        "src string, doc long, w long",
    )
    out = {r["doc"]: r["n_pins"] for r in
           pps_systematic_sample(df, "src", "doc", "w", k=10).collect()}
    assert out[1] >= 9  # row with 97% of the mass straddles ~9-10 pins
    assert sum(out.values()) == 10


# ------------------------------------------------------- global_cumsum


def test_global_cumsum_matches_local_prefix_sums(spark):
    from cqdg_etl_spark.operators.ranking import global_cumsum

    df = spark.range(1, 1001).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("v")
    ).repartition(13)
    out = global_cumsum(df, [F.col("k").asc()], "v", out_col="cum")
    rows = sorted(out.collect(), key=lambda r: r["k"])
    acc = 0
    for r in rows:
        acc += r["v"]
        assert r["cum"] == acc


# -------------------------------------------------- budget selection


def test_budget_select_is_prefix_of_quality_order(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = {
        1: "a b c d e",        # ttr 1.0  (5 tokens)
        2: "a a a a a a",      # ttr 1/6  (6 tokens)
        3: "x y z x",          # ttr 0.75 (4 tokens)
        4: "p q",              # ttr 1.0  (2 tokens)
    }
    docs = pa.table(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [len(t) for t in texts.values()],
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from cqdg_etl_spark.queries import REGISTRY

    out = REGISTRY["ds_quality_budget_select"].fn(
        spark, str(tmp_path)
    ).collect()
    picked = sorted(r["doc_id"] for r in out)
    # order is (ttr desc, doc_id): 1 (5 toks), 4 (2), 3 (4), 2 (6).
    # budget = 0.3 * 17 = 5.1 → doc 1 starts at 0 (<5.1), doc 4 starts
    # at 5 (<5.1), doc 3 starts at 7 (≥5.1) → picked = {1, 4}
    assert picked == [1, 4]


# ---------------------------------------------- temperature mixture


def test_temperature_mixture_flattens_toward_uniform(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [("big", i) for i in range(90)] + [("small", i) for i in range(10)]
    docs = pa.table(
        {
            "doc_id": list(range(100)),
            "text": ["t"] * 100,
            "lang": ["en"] * 100,
            "source": [s for s, _ in rows],
            "n_chars": [1] * 100,
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from cqdg_etl_spark.queries import REGISTRY

    out = {r["source"]: r for r in REGISTRY["ds_temperature_mixture"].fn(
        spark, str(tmp_path)
    ).collect()}
    assert abs(out["big"]["p"] - 0.9) < 1e-6
    # α < 1 pulls shares toward uniform: q_small > p_small, q_big < p_big
    assert out["small"]["q"] > out["small"]["p"]
    assert out["big"]["q"] < out["big"]["p"]
    assert abs(out["big"]["q"] + out["small"]["q"] - 1.0) < 1e-5


def test_global_cumsum_multi_column_single_pass(spark):
    from cqdg_etl_spark.operators.ranking import global_cumsum

    df = spark.range(1, 101).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("a"),
        (F.col("id") % 5).alias("b"),
    ).repartition(7)
    out = global_cumsum(
        df, [F.col("k").asc()], ["a", "b"], out_col=["ca", "cb"]
    )
    rows = sorted(out.collect(), key=lambda r: r["k"])
    ea = eb = 0
    for r in rows:
        ea += r["a"]
        eb += r["b"]
        assert (r["ca"], r["cb"]) == (ea, eb)
