"""Back-compat shim: the clinical fixture generators moved into the
package (cqdg_etl_spark/pipeline/fixtures.py) so the driver-facing E2E
registry query can build its inputs without importing tests/."""

from cqdg_etl_spark.pipeline.fixtures import (  # noqa: F401
    DICTIONARY,
    write_clinical_fixtures,
    write_dictionary,
    write_ontology_fixtures,
)
