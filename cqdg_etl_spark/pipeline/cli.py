"""CLI entry points (reference: EtlApp.scala + commands/*).

    python -m cqdg_etl_spark.pipeline.cli pre-process \
        --input DIR --output DIR --dictionary schema.json
    python -m cqdg_etl_spark.pipeline.cli process \
        --input DIR --ontology DIR --output DIR
"""

from __future__ import annotations

import argparse

from cqdg_etl_spark.session import get_spark


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="cqdg-etl-spark")
    sub = parser.add_subparsers(dest="command", required=True)

    pre = sub.add_parser("pre-process", help="TSV → validated parquet with IDs")
    pre.add_argument("--input", required=True)
    pre.add_argument("--output", required=True)
    pre.add_argument("--dictionary", required=True, help="dictionary schema JSON")

    proc = sub.add_parser("process", help="parquet + ontologies → index JSON")
    proc.add_argument("--input", required=True)
    proc.add_argument("--ontology", required=True)
    proc.add_argument("--output", required=True)

    args = parser.parse_args(argv)
    spark = get_spark(app_name=f"cqdg-etl-{args.command}")

    if args.command == "pre-process":
        from cqdg_etl_spark.pipeline.clients import (
            DeterministicIdResolver,
            FixtureDictionary,
        )
        from cqdg_etl_spark.pipeline.preprocess import PreProcessETL

        PreProcessETL(
            spark,
            FixtureDictionary(args.dictionary),
            DeterministicIdResolver(),
            args.input,
            args.output,
        ).run()
    else:
        from cqdg_etl_spark.pipeline.etl import ProcessETL

        ProcessETL(spark, args.input, args.ontology, args.output).run()


if __name__ == "__main__":
    main()
