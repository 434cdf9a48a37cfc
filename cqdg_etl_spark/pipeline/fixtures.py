"""Synthetic clinical fixture generator for the CQDG pipeline tests.

Shapes follow FIXTURES.md (headers, quirk columns with spaces/parens that
the dictionary drops, '|chapter' ICD ids, ontology ancestor nesting).
Content is original: 2 studies, 3 donors, full entity chains on PT01.
"""

from __future__ import annotations

import gzip
import json
import os


def _tsv(path: str, header: list[str], rows: list[list[str]]) -> None:
    with open(path, "w") as fh:
        fh.write("\t".join(header) + "\n")
        for row in rows:
            fh.write("\t".join(row) + "\n")


def write_clinical_fixtures(d: str) -> None:
    os.makedirs(d, exist_ok=True)

    _tsv(
        f"{d}/study.tsv",
        [
            "study_id", "name", "short_name", "description", "keyword",
            "access_authority", "domain", "population", "access_limitations",
            "access_requirements", "nb_donors", "nb_files", "seq", "snv",
        ],
        [
            ["ST01", "Heart Cohort", "HC", "A cardio cohort", "cardio",
             "ethics-board", "cardiology", "adult", "DUO:0000005",
             "DUO:0000017; DUO:0000024", "2", "2", "1", "1"],
            ["ST02", "Growth Cohort", "GC", "A growth cohort", "growth",
             "ethics-board", "endocrinology", "pediatric", "DUO:0000005",
             "DUO:0000026", "1", "1", "0", "0"],
        ],
    )
    _tsv(
        f"{d}/donor.tsv",
        [
            "study_id", "submitter_donor_id", "dob", "age TODAY",
            "date_of_recruitment", "age at recruit", "gender", "ethnicity",
            "vital_status", "cause_of_death", "age_of_death",
            "physical_measures_available", "laboratory_measures_available",
            "lifestyle_available", "medication_available",
            "environment_exposure_available", "family_history_available",
            "genealogy_available", "is_a_proband", "is_affected",
        ],
        [
            ["ST01", "PT01", "6/9/1946", "77", "11/22/2009", "63", "Male",
             "european", "Alive", "", "", "TRUE", "TRUE", "FALSE", "TRUE",
             "FALSE", "TRUE", "FALSE", "TRUE", "TRUE"],
            ["ST01", "PT02", "", "", "3/4/2010", "", "", "african", "Alive",
             "", "", "FALSE", "FALSE", "FALSE", "FALSE", "FALSE", "FALSE",
             "FALSE", "FALSE", "FALSE"],
            ["ST02", "PT03", "1/2/2001", "23", "5/6/2015", "14", "Female",
             "asian", "Alive", "", "", "TRUE", "FALSE", "FALSE", "FALSE",
             "FALSE", "FALSE", "FALSE", "TRUE", "FALSE"],
        ],
    )
    _tsv(
        f"{d}/family.tsv",
        ["study_id", "submitter_family_id", "submitter_donor_id", "family_type",
         "is_a_proband", "relationship_to_proband"],
        [
            ["ST01", "FA01", "PT01", "trio", "TRUE", "proband"],
            ["ST01", "FA01", "PT02", "trio", "FALSE", "father"],
        ],
    )
    _tsv(
        f"{d}/family-history.tsv",
        ["study_id", "submitter_donor_id", "submitter_family_condition_id",
         "family_condition_name", "family_condition_age",
         "family_condition_relationship", "family_cancer_history", "age TODAY"],
        [["ST01", "PT01", "FC01", "hypertension", "50", "mother", "no", "88"]],
    )
    _tsv(
        f"{d}/exposure.tsv",
        ["study_id", "submitter_donor_id", "smoking_status", "smoking_pack_years",
         "alcohol_status", "FSA"],
        [
            ["ST01", "PT01", "former", "10", "occasional", "H2X"],
            ["ST02", "PT03", "never", "0", "never", "G1A"],
        ],
    )
    _tsv(
        f"{d}/diagnosis.tsv",
        ["study_id", "submitter_donor_id", "submitter_diagnosis_id",
         "diagnosis_source_text", "diagnosis_ICD_category", "diagnosis_ICD_code",
         "diagnosis_ICD_term", "diagnosis_mondo_code", "diagnosis_mondo_term",
         "age_at_diagnosis", "is_self_reported", "is_cancer",
         "is_cancer_primary", "diagnosis_type", "tumor_staging_system",
         "stage_group", "t_category", "n_category", "m_category"],
        [
            ["ST01", "PT01", "DI01", "heart attack", "IX", "I21",
             "Acute myocardial infarction", "MONDO:0005068",
             "myocardial infarction", "54", "FALSE", "FALSE", "", "clinical",
             "", "", "", "", ""],
            ["ST02", "PT03", "DI02", "short stature", "IV", "E34",
             "Short stature", "MONDO:0003847", "inherited condition", "10",
             "FALSE", "FALSE", "", "clinical", "", "", "", "", ""],
        ],
    )
    _tsv(
        f"{d}/treatment.tsv",
        ["study_id", "submitter_donor_id", "submitter_treatment_id",
         "submitter_diagnosis_id", "treatment_type", "treatment_is_primary",
         "treatment_intent", "treatment_response", "medication_name",
         "medication_code", "medication_class", " treatment_start_date",
         "treatment_end_date"],
        [["ST01", "PT01", "TX01", "DI01", "pharmaceutical", "TRUE", "curative",
          "complete", "aspirin", "B01AC06", "antithrombotic", "1/1/2001",
          "1/6/2001"]],
    )
    _tsv(
        f"{d}/follow-up.tsv",
        ["study_id", "submitter_donor_id", "submitter_diagnosis_id",
         "submitter_follow_up_id", "days_to_follow-up",
         "disease_status_at_followup", "relapse_interval"],
        [["ST01", "PT01", "DI01", "FU01", "180", "stable", ""]],
    )
    _tsv(
        f"{d}/phenotype.tsv",
        ["study_id", "submitter_donor_id", "submitter_phenotype_id",
         "phenotype_source_text", "phenotype_HPO_code", "phenotype_HPO_term",
         "phenotype_HPO_category", "age_at_phenotype", "phenotype_severity",
         "phenotype_observed"],
        [
            ["ST01", "PT01", "PH01", "myocardial infarction", "HP:0001658",
             "Myocardial infarction", "cardio", "63", "severe", "TRUE"],
            ["ST01", "PT01", "PH02", "short stature", "HP:0004322",
             "Short stature", "growth", "40", "mild", "No"],
            ["ST02", "PT03", "PH03", "short stature", "HP:0004322",
             "Short stature", "growth", "12", "moderate", "yes"],
        ],
    )
    _tsv(
        f"{d}/biospecimen.tsv",
        ["study_id", "submitter_donor_id", "submitter_biospecimen_id",
         "submitter_diagnosis_id", "date_biospecimen_collection",
         "tumor_normal_designation", "biospecimen_tissue_source",
         "biospecimen_type", "is_cancer", "biospecimen_anatomic_location",
         "biospecimen_anatomic_location(term)", "tumor_histological_type",
         "tumor_histological_type(term)", "biospecimen_processing",
         "biospecimen_storage", "biospecimen_access"],
        [
            ["ST01", "PT01", "BS01", "DI01", "2/3/2010", "Normal", "blood",
             "plasma", "FALSE", "C42.0", "Blood", "", "", "centrifuged",
             "frozen", "TRUE"],
            ["ST02", "PT03", "BS02", "DI02", "7/8/2015", "Normal", "saliva",
             "dna", "FALSE", "C06.9", "Mouth", "", "", "extracted", "frozen",
             "TRUE"],
        ],
    )
    _tsv(
        f"{d}/sample_registration.tsv",
        ["study_id", "submitter_donor_id", "submitter_biospecimen_id",
         "submitter_sample_id", "sample_type"],
        [
            ["ST01", "PT01", "BS01", "SA01", "total DNA"],
            ["ST01", "PT01", "BS01", "SA02", "total RNA"],
            ["ST02", "PT03", "BS02", "SA03", "total DNA"],
        ],
    )
    _tsv(
        f"{d}/file.tsv",
        ["submitter_biospecimen_id", "submitter_donor_id", "study_id",
         "file_name", "data_category", "data_type", "is_harmonized",
         "experimental_strategy", "data_access", "file_format", "platform",
         "variant_class"],
        [
            ["BS01", "PT01", "ST01", "f1.gvcf", "genomics", "gvcf", "TRUE",
             "WGS", "controlled", "gvcf", "illumina", "SNV"],
            ["BS01", "PT01", "ST01", "f2.cram", "genomics", "aligned reads",
             "TRUE", "WGS", "controlled", "cram", "illumina", ""],
            ["BS02", "PT03", "ST02", "f3.gvcf", "genomics", "gvcf", "TRUE",
             "WXS", "controlled", "gvcf", "illumina", "SNV"],
        ],
    )
    with open(f"{d}/study_version_metadata.json", "w") as fh:
        json.dump(
            [{"dictionaryVersion": "5.58", "studyVersionId": "1.0",
              "studyVersionDate": "2020/07/01"}],
            fh,
        )


DICTIONARY = {
    "5.58": {
        "study": ["study_id", "name", "short_name", "description", "keyword",
                  "access_authority", "domain", "population",
                  "access_limitations", "access_requirements"],
        "donor": ["study_id", "submitter_donor_id", "dob", "date_of_recruitment",
                  "gender", "ethnicity", "vital_status", "cause_of_death",
                  "age_of_death", "physical_measures_available",
                  "laboratory_measures_available", "lifestyle_available",
                  "medication_available", "environment_exposure_available",
                  "family_history_available", "genealogy_available",
                  "is_a_proband", "is_affected"],
        "family": ["study_id", "submitter_family_id", "submitter_donor_id",
                   "family_type", "is_a_proband", "relationship_to_proband"],
        "family_history": ["study_id", "submitter_donor_id",
                           "submitter_family_condition_id",
                           "family_condition_name", "family_condition_age",
                           "family_condition_relationship",
                           "family_cancer_history"],
        "exposure": ["study_id", "submitter_donor_id", "smoking_status",
                     "smoking_pack_years", "alcohol_status", "FSA"],
        "diagnosis": ["study_id", "submitter_donor_id", "submitter_diagnosis_id",
                      "diagnosis_source_text", "diagnosis_ICD_code",
                      "diagnosis_mondo_code", "age_at_diagnosis",
                      "is_self_reported", "is_cancer", "diagnosis_type",
                      "is_cancer_primary", "tumor_staging_system",
                      "stage_group", "t_category", "n_category", "m_category"],
        "treatment": ["study_id", "submitter_donor_id", "submitter_treatment_id",
                      "submitter_diagnosis_id", "treatment_type",
                      "treatment_is_primary", "treatment_intent",
                      "treatment_response", "medication_name",
                      "medication_code", "medication_class",
                      "treatment_start_date", "treatment_end_date"],
        "follow_up": ["study_id", "submitter_donor_id", "submitter_diagnosis_id",
                      "submitter_follow_up_id", "days_to_follow_up",
                      "disease_status_at_followup", "relapse_interval"],
        "phenotype": ["study_id", "submitter_donor_id", "submitter_phenotype_id",
                      "phenotype_source_text", "phenotype_HPO_code",
                      "age_at_phenotype", "phenotype_severity",
                      "phenotype_observed"],
        "biospecimen": ["study_id", "submitter_donor_id",
                        "submitter_biospecimen_id", "submitter_diagnosis_id",
                        "date_biospecimen_collection",
                        "tumor_normal_designation", "biospecimen_tissue_source",
                        "biospecimen_type", "biospecimen_anatomic_location",
                        "tumor_histological_type", "biospecimen_processing",
                        "biospecimen_storage", "biospecimen_access"],
        "sample_registration": ["study_id", "submitter_donor_id",
                                "submitter_biospecimen_id",
                                "submitter_sample_id", "sample_type"],
        "file": ["submitter_biospecimen_id", "submitter_donor_id", "study_id",
                 "file_name", "data_category", "data_type", "is_harmonized",
                 "experimental_strategy", "data_access", "file_format",
                 "platform", "variant_class"],
    }
}


def write_dictionary(path: str) -> None:
    with open(path, "w") as fh:
        json.dump(DICTIONARY, fh)


def _ndjson(path: str, rows: list[dict]) -> None:
    with open(path, "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")


def write_ontology_fixtures(d: str) -> None:
    os.makedirs(d, exist_ok=True)
    _ndjson(
        f"{d}/hpo_terms.json",
        [
            {"id": "HP:0001658", "name": "Myocardial infarction",
             "parents": ["Myocardial disease (HP:0001637)"],
             "ancestors": [
                 {"id": "HP:0001626",
                  "name": "Abnormality of the cardiovascular system",
                  "parents": ["Phenotypic abnormality (HP:0000118)"]},
                 {"id": "HP:0000118", "name": "Phenotypic abnormality",
                  "parents": ["All (HP:0000001)"]},
             ],
             "is_leaf": True},
            {"id": "HP:0004322", "name": "Short stature",
             "parents": ["Abnormal body height (HP:0000002)"],
             "ancestors": [
                 {"id": "HP:0001507", "name": "Growth abnormality",
                  "parents": ["Phenotypic abnormality (HP:0000118)"]},
                 {"id": "HP:0000118", "name": "Phenotypic abnormality",
                  "parents": ["All (HP:0000001)"]},
             ],
             "is_leaf": True},
        ],
    )
    _ndjson(
        f"{d}/mondo_terms.json",
        [
            {"id": "MONDO:0005068", "name": "myocardial infarction (disease)",
             "parents": ["myocardial disorder (MONDO:0024643)"],
             "ancestors": [
                 {"id": "MONDO:0021199", "name": "disease by anatomical system",
                  "parents": ["disease or disorder (MONDO:0000001)"]},
             ],
             "is_leaf": True},
            {"id": "MONDO:0003847", "name": "inherited genetic disease",
             "parents": ["disease or disorder (MONDO:0000001)"],
             "ancestors": [
                 {"id": "MONDO:0021198", "name": "disease by special category",
                  "parents": ["disease or disorder (MONDO:0000001)"]},
             ],
             "is_leaf": True},
        ],
    )
    _ndjson(
        f"{d}/icd_terms.json",
        [
            {"id": "I21|9", "name": "Acute myocardial infarction",
             "parents": ["Ischaemic heart diseases (I20-I25)"],
             "ancestors": [
                 {"id": "I20-I25", "name": "Ischaemic heart diseases",
                  "parents": ["Diseases of the circulatory system (IX)"]},
             ],
             "is_leaf": True},
            {"id": "E34|4", "name": "Other endocrine disorders",
             "parents": ["Disorders of other endocrine glands (E20-E35)"],
             "ancestors": [
                 {"id": "E20-E35", "name": "Disorders of other endocrine glands",
                  "parents": ["Endocrine diseases (IV)"]},
             ],
             "is_leaf": True},
        ],
    )
    _ndjson(
        f"{d}/duo_code_terms.json",
        [
            {"id": "DUO:0000005", "name": "general research use", "parents": [],
             "ancestors": [], "is_leaf": False},
            {"id": "DUO:0000017", "name": "data use permission", "parents": [],
             "ancestors": [], "is_leaf": False},
            {"id": "DUO:0000024", "name": "publication required", "parents": [],
             "ancestors": [], "is_leaf": False},
            {"id": "DUO:0000026", "name": "user specific restriction",
             "parents": [], "ancestors": [], "is_leaf": False},
        ],
    )
