"""Study data-access DUO-code resolution
(reference: indexes/DataAccess.scala:9-43).

access_requirements is a ';'-separated DUO code list; both it and
access_limitations resolve to display names through the DUO term table
(a tiny ontology — broadcast)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cqdg_etl_spark.functions.columns import display_name, is_not_blank


def data_access_by_entity_type(study: DataFrame, duo_terms: DataFrame) -> DataFrame:
    duo = F.broadcast(duo_terms.select("id", "name"))
    exploded = (
        study.select("study_id", "access_limitations", "access_requirements")
        .withColumn("access_requirements", F.explode(F.split("access_requirements", ";")))
        .filter(is_not_blank(F.col("access_requirements")))
        .withColumn("access_requirements", F.trim("access_requirements"))
    )
    with_limit = (
        exploded.join(duo, exploded.access_limitations == duo.id, "left")
        .select(
            "study_id",
            display_name(F.col("name"), F.col("id")).alias("access_limitations"),
            "access_requirements",
        )
    )
    with_req = (
        with_limit.join(duo, with_limit.access_requirements == duo.id, "left")
        .select(
            "study_id",
            "access_limitations",
            display_name(F.col("name"), F.col("id")).alias("access_requirements"),
        )
    )
    return (
        with_req.groupBy("study_id", "access_limitations")
        .agg(F.collect_set("access_requirements").alias("access_requirements"))
        .groupBy("study_id")
        .agg(
            F.first(
                F.struct("access_limitations", "access_requirements")
            ).alias("data_access_codes")
        )
    )
