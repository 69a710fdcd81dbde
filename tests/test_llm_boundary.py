"""LLM boundary: retry behavior and the generation→parse→validate glue."""

import pandas as pd
import pytest


def test_llm_map_retries_then_succeeds(spark):
    from scalable_data_integration_with_llms_spark.llm.boundary import llm_map

    df = spark.createDataFrame([(i,) for i in range(10)], "x int").coalesce(1)
    attempts = {"n": 0}

    def flaky(pdf: pd.DataFrame) -> pd.DataFrame:
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient inference failure")
        return pdf.assign(y=pdf.x * 2)

    out = llm_map(df, flaky, "x int, y int", max_retries=5, base_backoff_s=0.01)
    rows = {r.x: r.y for r in out.collect()}
    assert rows == {i: 2 * i for i in range(10)}


def test_llm_map_exhausts_retries(spark):
    from scalable_data_integration_with_llms_spark.llm.boundary import llm_map

    df = spark.createDataFrame([(1,)], "x int").coalesce(1)

    def always_fails(pdf):
        raise RuntimeError("permanent failure")

    out = llm_map(df, always_fails, "x int", max_retries=2, base_backoff_s=0.01)
    with pytest.raises(Exception):
        out.collect()


def test_generation_to_validation_glue(spark):
    """§3.2 end-to-end with a canned generator: prompts -> llm_map generate
    -> matches-JSON parse -> P5 validation -> alignments."""
    from pyspark.sql import functions as F

    from scalable_data_integration_with_llms_spark.catalog.cases import case_catalog_df
    from scalable_data_integration_with_llms_spark.llm.boundary import llm_map
    from scalable_data_integration_with_llms_spark.operators.validation import (
        extract_matches_json,
        parse_pairs,
        validate_pairs,
    )

    prompts = spark.createDataFrame(
        [("tpch:CUSTOMER|tpch:SUPPLIER", "s_name", "match s_name")],
        "case_id string, attr string, prompt string",
    )

    def canned_generate(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic canned model: echoes a matches block per prompt
        return pdf.assign(
            response=["{'matches': ['c_name, s_name']}"] * len(pdf)
        )[["case_id", "attr", "response"]]

    responses = llm_map(prompts, canned_generate, "case_id string, attr string, response string")
    parsed = responses.withColumn("matches", extract_matches_json("response"))
    pairs = parse_pairs(parsed)
    validated = validate_pairs(pairs, case_catalog_df(spark))
    rows = validated.collect()
    assert len(rows) == 1
    assert rows[0].pair_src == "c_name" and rows[0].pair_tgt == "s_name"
    assert rows[0].is_valid == 1
