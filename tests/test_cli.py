"""CLI smoke: both subcommands run end-to-end on the clinical fixtures
(reference entry points: EtlApp.scala + commands/PreProcess.scala /
Process.scala)."""

from __future__ import annotations

import os

import pytest

from cqdg_etl_spark.pipeline.cli import main
from tests.fixtures.clinical import (
    write_clinical_fixtures,
    write_dictionary,
    write_ontology_fixtures,
)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    write_clinical_fixtures(str(root / "raw"))
    write_ontology_fixtures(str(root / "onto"))
    write_dictionary(str(root / "dictionary.json"))
    return root


def test_cli_preprocess_then_process(spark, dirs):
    main(
        [
            "pre-process",
            "--input", str(dirs / "raw"),
            "--output", str(dirs / "with-ids"),
            "--dictionary", str(dirs / "dictionary.json"),
        ]
    )
    assert os.path.isdir(dirs / "with-ids" / "donor-with-ids")

    main(
        [
            "process",
            "--input", str(dirs / "with-ids"),
            "--ontology", str(dirs / "onto"),
            "--output", str(dirs / "indexes"),
        ]
    )
    for index in ("studies", "donors", "files"):
        out = dirs / "indexes" / index
        assert os.path.isdir(out), f"missing {index} output"
        got = spark.read.json(str(out))
        assert got.count() >= 1
