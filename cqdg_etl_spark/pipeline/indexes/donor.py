"""Donor index: one nested document per donor
(reference: indexes/DonorIndex.scala:21-113)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cqdg_etl_spark.pipeline.indexes import summary as S
from cqdg_etl_spark.pipeline.indexes.common import file_size
from cqdg_etl_spark.pipeline.models import Metadata


def build_donor_index(
    study: DataFrame, metadata: Metadata, data: dict[str, DataFrame]
) -> DataFrame:
    donor = data["donor"]
    dx = data["diagnosisPerDonorAndStudy"]
    phen = data["phenotypesPerStudyIdAndDonor"]
    bio = data["biospecimenWithSamples"]
    file = data["file"]

    donor_per_file, _, combos = S.prepare_summary_frames(donor, file)
    by_category = S.files_by_field(donor_per_file, combos, "data_category")
    by_strategy = S.files_by_field(donor_per_file, combos, "experimental_strategy")
    available, available_only = S.clinical_data_available_per_donor(combos, data)

    keys = ["study_id", "submitter_donor_id"]
    summary_group = (
        by_category.join(by_strategy, keys)
        .join(available, keys)
        .join(available_only, keys)
        .filter(F.col("study_id").isNotNull())
        .filter(F.col("submitter_donor_id").isNotNull())
        .groupBy(*keys)
        .agg(
            F.first(
                F.struct(
                    "data_category",
                    "experimental_strategy",
                    "clinical_data_available",
                    "clinical_data_available_only",
                )
            ).alias("summary")
        )
    )

    file_renamed = (
        file.select(
            "*",
            F.col("file_name").alias("file_name_keyword"),
            F.col("file_name").alias("file_name_ngrams"),
            file_size(F.col("file_name")),
        )
        .withColumnRenamed("variant_class", "file_variant_class")
    )
    file_with_bio = file_renamed.join(bio, ["submitter_biospecimen_id"], "left")
    file_payload_cols = [
        c
        for c in file_with_bio.columns
        if c
        not in (
            "study_id",
            "submitter_donor_id",
            "file_name",
            "file_name_keyword",
            "file_name_ngrams",
        )
    ]
    files_per_donor = file_with_bio.groupBy("submitter_donor_id", "study_id").agg(
        F.collect_list(F.struct(*file_payload_cols)).alias("files_per_donor_per_study")
    )

    study_cols = study.columns
    donor_with_study = (
        donor.alias("donor")
        .join(study.alias("study"), F.col("donor.study_id") == F.col("study.study_id"))
        .select(
            "donor.*",
            F.array(F.struct(*[F.col(f"study.{c}") for c in study_cols])).alias(
                "study"
            ),
            F.col("familyConditions").alias("familyHistory"),
        )
    )

    return (
        donor_with_study.join(dx, keys, "left")
        .join(phen, keys, "left")
        .join(files_per_donor, keys, "left")
        .join(summary_group, keys, "left")
        .select(
            *[
                F.col(c)
                for c in donor_with_study.columns
            ],
            "diagnoses",
            "mondo",
            "icd",
            "observed_phenotype_tagged",
            "not_observed_phenotype_tagged",
            "observed_phenotypes",
            "non_observed_phenotypes",
            F.col("files_per_donor_per_study").alias("files"),
            "summary",
        )
        .withColumn("dictionary_version", F.lit(metadata.dictionary_version))
        .withColumn("study_version", F.lit(metadata.study_version))
        .withColumn(
            "study_version_creation_date",
            F.lit(metadata.study_version_creation_date),
        )
    )
