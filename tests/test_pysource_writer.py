"""Custom Python DataSource writer: shard contents round-trip, the
_SUCCESS manifest, temp-file invisibility, and abort cleanup.
"""

from __future__ import annotations

import glob
import json
import os

import pytest


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    from cqdg_etl_spark.sources.pysource_writer import register

    register(spark)


def test_write_commit_roundtrip(spark, sf_dir, tmp_path):
    from cqdg_etl_spark.queries.registry import load

    out = str(tmp_path / "nation_shards")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nation.write.format("ndjson_shards").option("path", out).mode(
        "append"
    ).save()

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    shards = sorted(glob.glob(os.path.join(out, "part-*.ndjson")))
    assert manifest["n_shards"] == len(shards)
    rows = []
    for p in shards:
        with open(p) as f:
            rows += [json.loads(line) for line in f]
    assert manifest["n_rows"] == len(rows)
    want = {(r["n_nationkey"], r["n_name"]) for r in map(lambda r: r.asDict(), nation.collect())}
    got = {(r["n_nationkey"], r["n_name"]) for r in rows}
    assert got == want
    # no temp files survive a committed job
    assert not glob.glob(os.path.join(out, "_temp-*"))


def test_abort_leaves_no_visible_output(spark, tmp_path):
    from pyspark.sql import functions as F

    out = str(tmp_path / "aborted")
    df = spark.range(100).select(
        "id",
        # fails at write time on a late partition's rows
        F.expr("CASE WHEN id > 90 THEN raise_error('boom') ELSE 'x' END").alias("s"),
    )
    with pytest.raises(Exception):
        df.coalesce(1).write.format("ndjson_shards").option("path", out).mode(
            "append"
        ).save()
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not glob.glob(os.path.join(out, "part-*"))
