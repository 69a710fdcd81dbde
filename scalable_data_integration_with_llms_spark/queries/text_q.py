"""Text-analysis surface over ``documents``: quality features, language ID,
token budgeting with CI, fingerprints (BASELINE.json north star; SURVEY A7/A14
for the token/cost statistics shapes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import LANG_MARKERS, fingerprint, marker_hits, quality_features, token_count
from ..operators.metrics import mean_ci95
from ..sources.readers import load_table
from .registry import query

# -- quality features ---------------------------------------------------------

_QUALITY_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       length(text) AS n_chars,
       (length(text) - (len(string_split(text, ' ')) - 1)) / len(string_split(text, ' ')) AS mean_word_len,
       len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')) AS distinct_ratio,
       len(list_filter(string_split(text, ' '), t -> t IN ('the', 'and', 'of', 'a', 'is'))) / len(string_split(text, ' ')) AS stopword_ratio
FROM documents
"""


@query("q_text_quality", _QUALITY_ORACLE)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    feats = quality_features("text")
    return d.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["n_chars"].alias("n_chars"),
        feats["mean_word_len"].alias("mean_word_len"),
        feats["distinct_ratio"].alias("distinct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
    )


# -- language identification --------------------------------------------------

_LANG_ORDER = ["en", "es", "de", "fr", "zh"]


def _lang_case_sql() -> str:
    # deterministic argmax: first language (in _LANG_ORDER) with the max hits
    hits = {
        lang: f"len(list_filter(string_split(text, ' '), t -> t IN ({', '.join(repr(m) for m in LANG_MARKERS[lang])})))"
        for lang in _LANG_ORDER
    }
    greatest = f"greatest({', '.join(hits[lang] for lang in _LANG_ORDER)})"
    whens = " ".join(
        f"WHEN {hits[lang]} = {greatest} THEN '{lang}'" for lang in _LANG_ORDER
    )
    return f"CASE {whens} END"


_LANGID_ORACLE = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN predicted = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       SUM(CASE WHEN predicted = lang THEN 1 ELSE 0 END) / COUNT(*) AS lang_accuracy
FROM (SELECT lang, {_lang_case_sql()} AS predicted FROM documents)
GROUP BY lang
"""


@query("q_langid", _LANGID_ORACLE)
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-marker language ID: per-language marker hit counts → first
    max-hit language in fixed precedence order."""
    d = load_table(spark, sf_dir, "documents")
    # materialize each language's hit count once (column aliases) before the
    # argmax — inlining the token-filter expression into greatest() + every
    # CASE arm multiplies the generated code ~10x and the per-row work ~2x
    with_hits = d.select(
        "lang",
        *[marker_hits("text", LANG_MARKERS[lang]).alias(f"h_{lang}") for lang in _LANG_ORDER],
    )
    best = F.greatest(*[F.col(f"h_{lang}") for lang in _LANG_ORDER])
    predicted = F.when(F.col(f"h_{_LANG_ORDER[0]}") == best, _LANG_ORDER[0])
    for lang in _LANG_ORDER[1:]:
        predicted = predicted.when(F.col(f"h_{lang}") == best, lang)
    correct = F.sum(F.when(F.col("predicted") == F.col("lang"), 1).otherwise(0))
    return (
        with_hits.select("lang", predicted.alias("predicted"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            correct.alias("n_correct"),
            (correct / F.count(F.lit(1))).alias("lang_accuracy"),
        )
    )


# -- token budgeting with CI (A7/A14 shape) -----------------------------------

_TOKEN_ORACLE = """
SELECT source, COUNT(*) AS n_runs,
       (SUM(tok) / 1.0) / COUNT(*) AS mean_metric,
       sqrt((SUM(tok * tok) - (SUM(tok) * SUM(tok)) / COUNT(*)) / (COUNT(*) - 1) / 1.0 / 1.0) AS std_metric,
       1.96 * sqrt((SUM(tok * tok) - (SUM(tok) * SUM(tok)) / COUNT(*)) / (COUNT(*) - 1) / 1.0 / 1.0) / sqrt(COUNT(*)) AS ci95
FROM (SELECT source, len(string_split(text, ' ')) AS tok FROM documents)
GROUP BY source
"""


@query("q_token_stats", _TOKEN_ORACLE)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # token counts are already integers: scale=1 keeps sum-of-squares well
    # inside int64 at any corpus size
    with_tokens = d.withColumn("tok", token_count("text").cast("bigint"))
    return mean_ci95(with_tokens, F.col("tok"), ["source"], scale=1.0)


# -- document fingerprints ----------------------------------------------------

_FINGERPRINT_ORACLE = """
SELECT doc_id, lang,
       substr(md5(regexp_replace(lower(text), ' +', ' ', 'g')), 1, 16) AS fp
FROM documents
"""


@query("q_doc_fingerprint", _FINGERPRINT_ORACLE)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", fingerprint("text").alias("fp"))


# -- A7: token cost stats with Student-t CI -----------------------------------

def _t_values_sql() -> str:
    from ..operators.metrics import _T95

    rows = ", ".join(f"({n + 1}, {t})" for n, t in ((d, v) for d, v in _T95.items()))
    return f"(VALUES {rows}) AS tt(n_runs, t_crit)"


_TOKEN_T_ORACLE = f"""
WITH base AS (
  SELECT source, COUNT(*) AS n_runs,
         (SUM(tok) / 1.0) / COUNT(*) AS mean_metric,
         sqrt((SUM(tok * tok) - (SUM(tok) * SUM(tok)) / COUNT(*)) / (COUNT(*) - 1) / 1.0 / 1.0) AS std_metric,
         1.0 * sqrt((SUM(tok * tok) - (SUM(tok) * SUM(tok)) / COUNT(*)) / (COUNT(*) - 1) / 1.0 / 1.0) / sqrt(COUNT(*)) AS sem
  FROM (SELECT source, len(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY source
)
SELECT source, base.n_runs, mean_metric, std_metric,
       COALESCE(t_crit, 1.96) * sem AS ci95_t
FROM base LEFT JOIN {_t_values_sql()} ON base.n_runs = tt.n_runs
"""


@query("q_token_stats_t", _TOKEN_T_ORACLE)
def q_token_stats_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (computational_eval.py:11-63): mean tokens with the reference's
    small-sample Student-t confidence interval."""
    from ..operators.metrics import mean_ci95_t

    d = load_table(spark, sf_dir, "documents")
    with_tokens = d.withColumn("tok", token_count("text").cast("bigint"))
    return mean_ci95_t(with_tokens, F.col("tok"), ["source"], scale=1.0)


# -- corpus n-gram frequency table -------------------------------------------

_TOP_BIGRAMS_ORACLE = """
SELECT bigram, cnt, bigram_rank FROM (
  SELECT bigram, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, bigram ASC) AS bigram_rank
  FROM (
    SELECT ws[i] || ' ' || ws[i+1] AS bigram
    FROM (SELECT string_split(text, ' ') AS ws FROM documents),
         unnest(range(1, len(ws))) AS t(i)
  )
  GROUP BY bigram
) WHERE bigram_rank <= 20
"""


@query("q_top_bigrams", _TOP_BIGRAMS_ORACLE)
def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency table (LM-statistics shape): explode word
    bigrams, hash-aggregate with map-side combine, deterministic top-20."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - 2, F.lit(-1)))
    bigrams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, 2)))
    counts = (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    win = W.orderBy(F.desc("cnt"), F.asc("bigram"))
    return (
        counts.withColumn("bigram_rank", F.row_number().over(win))
        .filter(F.col("bigram_rank") <= 20)
    )


# -- BPE-ish token budgeting (whitespace proxy vs pre-tokenizer counts) ------

_BPE_TOKEN_ORACLE = """
SELECT source,
       CAST(SUM(CASE WHEN length(text) = 0 THEN 0 ELSE len(string_split(text, ' ')) END) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))) AS BIGINT) AS total_bpe_tokens,
       SUM(len(regexp_extract_all(text, '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))) * 1.0 / COUNT(*) AS avg_bpe_tokens,
       COUNT(*) AS n_docs
FROM documents
GROUP BY source
"""


@query("q_bpe_token_stats", _BPE_TOKEN_ORACLE)
def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting with the BPE-style pre-tokenizer (SURVEY A14/U4): the
    regex runs inside whole-stage codegen, so per-document counting costs one
    scan with map-side partial aggregation — no Python, no shuffle of text."""
    from ..functions.text import bpe_ish_token_count

    d = load_table(spark, sf_dir, "documents")
    bpe = bpe_ish_token_count("text")
    return d.groupBy("source").agg(
        F.sum(token_count("text")).alias("total_ws_tokens"),
        F.sum(bpe).alias("total_bpe_tokens"),
        (F.sum(bpe) * F.lit(1.0) / F.count(F.lit(1))).alias("avg_bpe_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# -- repetition quality signal (Gopher-style duplicate n-gram fraction) ------

_REPETITION_ORACLE = """
SELECT doc_id, n_trigrams, n_distinct,
       CASE WHEN n_trigrams = 0 THEN 0.0
            ELSE CAST(n_trigrams - n_distinct AS DOUBLE) / n_trigrams END AS dup_ratio
FROM (
  SELECT doc_id, len(tgs) AS n_trigrams, len(list_distinct(tgs)) AS n_distinct
  FROM (
    SELECT doc_id,
           list_transform(range(1, greatest(len(ws) - 1, 1)),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS tgs
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
  )
)
"""


@query("q_repetition_ratio", _REPETITION_ORACLE)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal for training-data filtering (the
    duplicate-trigram fraction used by Gopher/MassiveText-style pipelines):
    dup_ratio = 1 − distinct/total trigrams per document.  Pure map-side
    array expressions — no explode, no shuffle, embarrassingly parallel at
    corpus scale."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - 3, F.lit(-1)))
    tgs = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, 3)))
    return (
        d.select(
            "doc_id",
            F.size(tgs).alias("n_trigrams"),
            F.size(F.array_distinct(tgs)).alias("n_distinct"),
        )
        .withColumn(
            "dup_ratio",
            F.when(F.col("n_trigrams") == 0, F.lit(0.0)).otherwise(
                (F.col("n_trigrams") - F.col("n_distinct")).cast("double") / F.col("n_trigrams")
            ),
        )
    )


# -- PII scrubbing (redaction counts + scrubbed text length) -----------------

_PII_ORACLE = """
SELECT doc_id,
       len(regexp_extract_all(pii_text, '[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS n_emails,
       len(regexp_extract_all(pii_text, '\\d{3}-\\d{4}')) AS n_phones,
       length(regexp_replace(regexp_replace(pii_text,
              '[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
              '\\d{3}-\\d{4}', '<PHONE>', 'g')) AS scrubbed_len
FROM (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com or 555-' ||
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS pii_text
  FROM documents
)
"""


@query("q_pii_scrub", _PII_ORACLE)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction for training corpora: count and replace email/phone
    patterns (the synthetic corpus carries no PII, so a deterministic
    address is appended per doc first — the operator under test is the
    scrub itself).  regexp_extract_all + regexp_replace are JVM-side
    codegen'd expressions; at 100 TB this is a pure map stage."""
    email_re = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
    phone_re = "\\d{3}-\\d{4}"
    d = load_table(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(pii_text, email_re, "<EMAIL>"), phone_re, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(pii_text, F.lit(email_re), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(pii_text, F.lit(phone_re), F.lit(0))).alias("n_phones"),
        F.length(scrubbed).alias("scrubbed_len"),
    )


# -- benchmark-contamination check (shared n-grams with a held-out set) ------

_CONTAMINATION_ORACLE = """
WITH shingled AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(ws) - 2, 1)),
                                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    WHERE len(ws) >= 4
  )
),
bench AS (SELECT DISTINCT shingle FROM shingled WHERE doc_id % 100 = 0)
SELECT s.doc_id, COUNT(DISTINCT s.shingle) AS n_shared
FROM shingled s JOIN bench USING (shingle)
WHERE s.doc_id % 100 <> 0
GROUP BY s.doc_id
"""


@query("q_contamination", _CONTAMINATION_ORACLE)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: training docs sharing any 4-gram
    with a held-out eval set (docs with doc_id % 100 == 0 stand in for the
    benchmark).  Plan: distinct (doc, shingle) is one shuffle; the bench
    shingle set is small and broadcasts into a semi-join-shaped equi-join;
    the per-doc distinct count is a second, already-reduced shuffle.  The
    same max_df guard as the Jaccard pipeline applies at corpus scale."""
    d = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)  # spread doc rows pre-explode (see word_shingles)
    words = F.split("text", " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - 4, F.lit(-1)))
    shingles4 = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, 4)))
    shingled = (
        d.filter(F.size(words) >= 4)
        .select("doc_id", F.explode(F.array_distinct(shingles4)).alias("shingle"))
    )
    bench = (
        shingled.filter(F.col("doc_id") % 100 == 0).select("shingle").distinct()
    )
    return (
        shingled.filter(F.col("doc_id") % 100 != 0)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_shared"))
    )


# -- greedy sequence packing (token-budget bins for LM training) -------------

_PACK_BUDGET = 256

_PACK_ORACLE = f"""
WITH RECURSIVE docs AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS tok,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
pack AS (
  SELECT source, doc_id, tok, rn, 0 AS seq_id, tok AS acc
  FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.source, d.doc_id, d.tok, d.rn,
         CASE WHEN p.acc + d.tok > {_PACK_BUDGET} THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.acc + d.tok > {_PACK_BUDGET} THEN d.tok ELSE p.acc + d.tok END
  FROM docs d JOIN pack p ON d.source = p.source AND d.rn = p.rn + 1
)
SELECT source, doc_id, tok, seq_id FROM pack
"""


@query("q_pack_sequences", _PACK_ORACLE)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing for LM training: per source, docs in doc_id
    order are packed into consecutive sequences of ≤256 tokens (a doc that
    would overflow starts the next sequence; an oversized doc gets its own).
    Sequential state per group → ``applyInPandas`` (the corpus-scale analog
    of the reference's ICL example packing, PromptICLTemplate.py:195-219);
    parallelism comes from the source partitioning, exactly like stable
    matching parallelizes over cases.  The oracle derives the same packing
    with a recursive CTE."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    with_tok = d.select(
        "source", "doc_id", token_count("text").cast("bigint").alias("tok")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs, seq, acc = [], 0, 0
        for tok in pdf["tok"]:
            if acc > 0 and acc + tok > _PACK_BUDGET:
                seq += 1
                acc = tok
            else:
                acc += tok
            seqs.append(seq)
        pdf["seq_id"] = seqs
        return pdf

    return with_tok.groupBy("source").applyInPandas(
        pack, "source string, doc_id bigint, tok bigint, seq_id int"
    )


# -- vocabulary construction (token -> dense id) ------------------------------

_VOCAB_ORACLE = """
SELECT token, cnt, token_id FROM (
  SELECT token, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token ASC) - 1 AS token_id
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
) WHERE cnt >= 5
"""


@query("q_vocab", _VOCAB_ORACLE)
def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary table for LM preprocessing: corpus token counts → dense
    token ids by (count desc, token) with a min-frequency floor.  One
    explode + hash agg with map-side combine; the id assignment is a global
    window — at 100 TB assign ids only to the (small) surviving vocabulary,
    which fits one partition after the frequency filter."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )
    win = W.orderBy(F.desc("cnt"), F.asc("token"))
    return counts.withColumn("token_id", F.row_number().over(win) - 1)


# -- TF-IDF-style top terms per doc (integer-exact scoring) ------------------

_TFIDF_ORACLE = """
WITH tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY doc_id, token
),
lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS doc_len FROM tf GROUP BY doc_id),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         CAST((tf.tf * n.n_docs * 1000000) // (df.df * lens.doc_len) AS BIGINT) AS score_milli
  FROM tf JOIN df USING (token) JOIN lens USING (doc_id) CROSS JOIN n
)
SELECT doc_id, token, score_milli, term_rank FROM (
  SELECT scored.*,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score_milli DESC, token ASC) AS term_rank
  FROM scored
) WHERE term_rank <= 3
"""


@query("q_tfidf_top_terms", _TFIDF_ORACLE)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic terms per document, TF-IDF shape with integer-exact
    scoring: score = ⌊tf·N·1e6 / (df·doc_len)⌋ — rational TF×(N/df)
    weighting without transcendental functions, so both engines rank rows
    identically (a float ln() would differ in ulps across engines and flip
    tie-adjacent ranks).  Two shuffles: (doc, token) tf and token df; the
    doc count is a 1-row broadcast."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tf = tf.persist()
    lens = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.floor(
                (F.col("tf") * F.col("n_docs") * F.lit(1000000))
                / (F.col("df") * F.col("doc_len"))
            ).alias("score_milli"),
        )
    )
    win = W.partitionBy("doc_id").orderBy(F.desc("score_milli"), F.asc("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(win))
        .filter(F.col("term_rank") <= 3)
    )


# -- Python UDTF surface (Spark 4 table functions) ----------------------------

_UDTF_TOKENS_ORACLE = """
WITH arrs AS (
  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS arr
  FROM documents
),
toks AS (
  SELECT source, unnest(arr) AS token,
         generate_subscripts(arr, 1) - 1 AS pos
  FROM arrs
)
SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT token) AS n_distinct,
       CAST(SUM(pos) AS BIGINT) AS sum_pos
FROM toks GROUP BY source
"""


@query("q_udtf_tokens", _UDTF_TOKENS_ORACLE)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function) exploding documents into
    (token, pos) rows via a LATERAL join, rolled up per source.  This is
    the engine's one *deliberate* row-at-a-time Python surface — the API
    exists for table-generating logic that genuinely can't be an array
    expression; everything hot uses the JVM-side explode/split instead
    (q_top_bigrams, q_vocab), which is why this query stays off the bench
    headline.  The oracle reproduces position numbering exactly."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string, pos int")
    class TokenizeDocs:
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF contract
            toks = [t for t in (text or "").split(" ") if t]
            for i, t in enumerate(toks):
                yield doc_id, t, i

    spark.udtf.register("sdi_tokenize", TokenizeDocs)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("v_docs_udtf")
    return spark.sql(
        """
        SELECT d.source, COUNT(*) AS n_tokens, COUNT(DISTINCT t.token) AS n_distinct,
               SUM(t.pos) AS sum_pos
        FROM v_docs_udtf d, LATERAL sdi_tokenize(d.doc_id, d.text) t
        GROUP BY d.source
        """
    )
