"""LLM-response parsing and alignment validation (SURVEY §2.8 F3–F5,
§2.2 P5/P8; reference ``Stable Schema Matching/eval/eval_utils.py``).

All parsing is JVM-side (``regexp_extract(_all)`` + ``from_json``); the
validation joins run against the broadcast-sized column catalog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# _extract_JSON pattern (eval_utils.py:185-190) — escaped braces parse the
# same in Java regex and RE2
MATCHES_BLOCK_RE = r"(\{[^}]*matches[^}]*\})"


def extract_matches_json(response: Column | str) -> Column:
    """First ``{..matches..}`` block with the reference's quote fixup
    (``'`` → ``"``), parsed to ``array<string>`` of "src,tgt" pairs (F3+F4).
    """
    c = F.col(response) if isinstance(response, str) else response
    block = F.regexp_extract(c, MATCHES_BLOCK_RE, 1)
    fixed = F.regexp_replace(block, "'", '"')
    schema = T.StructType([T.StructField("matches", T.ArrayType(T.StringType()))])
    return F.from_json(fixed, schema)["matches"]


def format_pair(raw: Column, side: str) -> Column:
    """``_format_pairs`` cleanup (eval_utils.py:235-244): trim, strip
    ``<``/``>``, lowercase, drop ``source_table.``/``target_table.``
    prefixes."""
    c = F.lower(F.regexp_replace(F.trim(raw), "^<|>$", ""))
    return F.regexp_replace(c, f"{side}_table\\.", "")


def parse_pairs(parsed: DataFrame, matches_col: str = "matches") -> DataFrame:
    """Explode "src,tgt" strings into cleaned (pair_src, pair_tgt)."""
    exploded = parsed.withColumn("__pair", F.explode(F.col(matches_col)))
    split = F.split(F.col("__pair"), ",")
    return (
        exploded.withColumn("pair_src", format_pair(split[0], "source"))
        .withColumn("pair_tgt", format_pair(split[1], "target"))
        .drop("__pair")
    )


def validate_pairs(pairs: DataFrame, catalog: DataFrame) -> DataFrame:
    """P5 alignment validation (eval_utils.py:249-324): per pair, membership
    of each element in the source/target schemas (case-insensitive) and the
    reference's error classes:

    * ``valid``              — src∈source ∧ tgt∈target
    * ``invalid_attribute``  — an element in neither schema (counted per
      missing element, as the reference does)
    * ``same_schema``        — both elements resolve to one schema only
    * ``same_attribute``     — same_schema ∧ identical names
    """
    cat = catalog.select("case_id", "side", "col_name")
    src_cols = cat.filter(F.col("side") == "source").select(
        "case_id", F.col("col_name").alias("pair_src")
    ).withColumn("src_in_source", F.lit(1))
    tgt_cols_t = cat.filter(F.col("side") == "target").select(
        "case_id", F.col("col_name").alias("pair_tgt")
    ).withColumn("tgt_in_target", F.lit(1))
    src_cols_t = cat.filter(F.col("side") == "target").select(
        "case_id", F.col("col_name").alias("pair_src")
    ).withColumn("src_in_target", F.lit(1))
    tgt_cols_s = cat.filter(F.col("side") == "source").select(
        "case_id", F.col("col_name").alias("pair_tgt")
    ).withColumn("tgt_in_source", F.lit(1))
    joined = (
        pairs.join(F.broadcast(src_cols), ["case_id", "pair_src"], "left")
        .join(F.broadcast(tgt_cols_t), ["case_id", "pair_tgt"], "left")
        .join(F.broadcast(src_cols_t), ["case_id", "pair_src"], "left")
        .join(F.broadcast(tgt_cols_s), ["case_id", "pair_tgt"], "left")
        .fillna(0, ["src_in_source", "tgt_in_target", "src_in_target", "tgt_in_source"])
    )
    s_in_s, t_in_t = F.col("src_in_source") == 1, F.col("tgt_in_target") == 1
    s_in_t, t_in_s = F.col("src_in_target") == 1, F.col("tgt_in_source") == 1
    valid = s_in_s & t_in_t
    invalid_ct = (
        F.when(~s_in_s & ~s_in_t, 1).otherwise(0)
        + F.when(~t_in_t & ~t_in_s, 1).otherwise(0)
    )
    same_schema = (~valid) & (
        (s_in_s & t_in_s & ~t_in_t) | (s_in_t & t_in_t & ~s_in_s)
    )
    same_attr = same_schema & (F.col("pair_src") == F.col("pair_tgt"))
    return joined.select(
        "case_id",
        "pair_src",
        "pair_tgt",
        valid.cast("int").alias("is_valid"),
        F.when(valid, 0).otherwise(invalid_ct).alias("invalid_attribute"),
        same_schema.cast("int").alias("same_schema"),
        same_attr.cast("int").alias("same_attribute"),
    )


def parse_mcq_scores(responses: DataFrame, response_col: str = "response") -> DataFrame:
    """MCQ score extraction ``(A): 85`` (eval_MatchMaker.py:70-83):
    explode to (option_letter, score)."""
    letters = F.regexp_extract_all(F.col(response_col), F.lit(r"\(([A-Z])\): *([0-9]+)"), 1)
    scores = F.regexp_extract_all(F.col(response_col), F.lit(r"\(([A-Z])\): *([0-9]+)"), 2)
    zipped = F.arrays_zip(letters.alias("letter"), scores.alias("score"))
    return (
        responses.withColumn("__z", F.explode(zipped))
        .withColumn("option_letter", F.col("__z.letter"))
        .withColumn("mcq_score", F.col("__z.score").cast("bigint"))
        .drop("__z")
    )


def validate_mcq_list(responses: DataFrame, options: DataFrame,
                      response_col: str = "response") -> DataFrame:
    """P8 ``validate_MM_candidates`` (eval_utils.py:25-48): take the text
    after ``Refined String List:``, bracket it if needed, parse as a JSON
    list (quote fixup), reject if >5 items or any item not in the option
    universe.  ``options``: (case_id, option)."""
    c = F.col(response_col)
    after = F.when(
        c.contains("Refined String List:"),
        F.element_at(F.split(c, "Refined String List:"), 2),
    ).otherwise(c)
    bracketed = F.when(
        after.contains("[") & after.contains("]"), after
    ).otherwise(F.concat(F.lit("["), after, F.lit("]")))
    arr = F.from_json(F.regexp_replace(bracketed, "'", '"'), T.ArrayType(T.StringType()))
    parsed = responses.withColumn("candidates", arr)
    opt_arrays = options.groupBy("case_id").agg(
        F.collect_set("option").alias("option_universe")
    )
    joined = parsed.join(F.broadcast(opt_arrays), "case_id", "left")
    ok = (
        F.col("candidates").isNotNull()
        & (F.size("candidates") <= 5)
        & F.forall("candidates", lambda x: F.array_contains(F.col("option_universe"), x))
    )
    # parse failure (null candidates) rejects, not null-propagates
    return joined.withColumn(
        "accepted", F.coalesce(ok.cast("int"), F.lit(0))
    ).drop("option_universe")
