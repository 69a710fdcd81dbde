"""Per-dataset instance-loader parity (S3): each dataset's realignment
quirks pinned on synthesized drift fixtures, mirroring
``Stable Schema Matching/prompt/InstanceDataHandler.py`` decision rules."""

import os

import pytest

from scalable_data_integration_with_llms_spark.sources.dataset_loaders import (
    LOADERS,
    dataset_name_from_id,
    load_bird_pair,
    load_ehr_pair,
    load_gdc_pair,
    load_synthea_pair,
    load_valentine_pair,
    parse_id_parts,
    standardize_columns,
)


def _write(path: str, text: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


def test_dataset_dispatch_from_id_shape():
    assert dataset_name_from_id("Wikidata/Musicians/musicians_joinable") == "valentine"
    assert dataset_name_from_id("books|bdb:book|bdb2:titles") == "bird"
    assert dataset_name_from_id("synthea:patients|omop:PERSON") == "synthea"
    assert dataset_name_from_id("gdc_a:cases|gdc_b:cases") == "gdc"
    assert dataset_name_from_id("mimic-iii:ADMISSIONS|omop:VISIT_OCCURRENCE") == "ehr"
    assert dataset_name_from_id("no-separators") is None
    assert set(LOADERS) == {"valentine", "ehr", "bird", "synthea", "gdc"}


def test_id_parsing_bird_and_pair():
    r = parse_id_parts("books|bdb:book|bdb2:titles")
    assert (r.domain, r.source_db, r.source_table) == ("books", "bdb", "book")
    assert (r.target_db, r.target_table) == ("bdb2", "titles")
    r2 = parse_id_parts("mimic-iii:ADMISSIONS|omop:VISIT_OCCURRENCE")
    assert r2.domain is None and r2.source_db == "mimic-iii"


def test_standardize_columns():
    assert standardize_columns([" Person ID", "birth_date", "state(code)", "a-b"]) == [
        "PersonID",
        "birthdate",
        "statecode",
        "ab",
    ]


def test_valentine_intersection_policy_and_swap(spark, tmp_path):
    base = str(tmp_path / "valentine")
    stem = "Wikidata/Musicians/musicians_joinable"
    _write(f"{base}/{stem}/musicians_joinable_source.csv", "name,age\nbob,3\n")
    _write(f"{base}/{stem}/musicians_joinable_target.csv", "title,year\nx,1999\n")
    # schema declares a column the csv lacks: valentine KEEPS the
    # intersection (no NULL back-fill), in schema order
    src, tgt = load_valentine_pair(spark, base, stem, ["age", "name", "genre"], ["title", "year"])
    assert src.columns == ["age", "name"]
    assert tgt.columns == ["title", "year"]
    # swapped exchanges the two files
    src2, _ = load_valentine_pair(
        spark, base, stem, ["title", "year"], ["age", "name"], swapped=True
    )
    assert src2.collect()[0].title == "x"


def test_ehr_quirks(spark, tmp_path):
    base = str(tmp_path / "ehr")
    # mimic-iii: uppercase filename + surrogate row_id to drop
    _write(f"{base}/mimic-iii/data/ADMISSIONS.csv", "row_id,hadm_id,ward\n1,77,icu\n")
    # omop visit table: lowercase filename + drifted column names
    _write(
        f"{base}/omop/data/visit_occurrence.csv",
        "visit_id,admitting_source_value,admitting_source_concept_id\n5,home,9\n",
    )
    src, tgt = load_ehr_pair(
        spark,
        base,
        "mimic-iii:ADMISSIONS|omop:VISIT_OCCURRENCE",
        ["hadm_id", "ward", "insurance"],
        ["visit_id", "admitted_from_source_value", "admitted_from_concept_id"],
    )
    # row_id dropped, missing schema col back-filled as NULL, schema order
    assert src.columns == ["hadm_id", "ward", "insurance"]
    row = src.collect()[0]
    assert (row.hadm_id, row.ward, row.insurance) == ("77", "icu", None)
    # drift renames applied so the schema names resolve
    trow = tgt.collect()[0]
    assert (trow.admitted_from_source_value, trow.admitted_from_concept_id) == ("home", "9")
    # every cell a string (untyped read)
    assert all(f.dataType.simpleString() == "string" for f in src.schema.fields)


def test_bird_domain_layout(spark, tmp_path):
    base = str(tmp_path / "bird")
    _write(f"{base}/books/bdb/data/book.csv", "id,title\n1,dune\n")
    _write(f"{base}/books/bdb2/data/titles.csv", "tid\n9\n")
    src, tgt = load_bird_pair(
        spark, base, "books|bdb:book|bdb2:titles", ["id", "title", "isbn"], ["tid"]
    )
    assert src.columns == ["id", "title", "isbn"]
    assert src.collect()[0].isbn is None
    assert tgt.collect()[0].tid == "9"


def test_synthea_lowercases_headers(spark, tmp_path):
    base = str(tmp_path / "synthea")
    _write(f"{base}/synthea/data/patients.csv", "Id,BIRTHDATE\np1,2001\n")
    _write(
        f"{base}/omop/data/visit_detail.csv",
        "visit_detail_id,admitting_source_value\n3,er\n",
    )
    src, tgt = load_synthea_pair(
        spark,
        base,
        "synthea:patients|omop:VISIT_DETAIL",
        ["id", "birthdate"],
        ["visit_detail_id", "admitted_from_source_value"],
    )
    assert src.collect()[0].birthdate == "2001"  # headers lowercased
    assert tgt.collect()[0].admitted_from_source_value == "er"


def test_gdc_flat_layout(spark, tmp_path):
    base = str(tmp_path / "gdc")
    _write(f"{base}/gdc_a/cases.csv", "case_id,site\nc1,lung\n")
    _write(f"{base}/gdc_b/cases.csv", "case_id\nc9\n")
    src, tgt = load_gdc_pair(
        spark, base, "gdc_a:cases|gdc_b:cases", ["case_id", "site"], ["case_id", "site"]
    )
    assert src.collect()[0].site == "lung"
    assert tgt.collect()[0].site is None  # NULL back-fill


def test_missing_file_fails_loudly(spark, tmp_path):
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        load_gdc_pair(
            spark, str(tmp_path / "nope"), "a:x|b:y", ["c"], ["c"]
        )[0].collect()
