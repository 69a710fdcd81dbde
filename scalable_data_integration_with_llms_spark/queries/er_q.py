"""Entity-resolution and temporal-table surface (beyond-reference, additive).

The reference does schema-level matching; record-level (instance) matching is
the natural next layer of a data-integration engine and the standard shape at
scale is *blocked* fuzzy joins: dedupe to distinct keys, compare only within
blocks, and expand candidate pairs back through per-key aggregates instead of
row-level pair explosion.  All string distance stays JVM-side
(``F.levenshtein``), so the plan is whole-stage-codegen end to end.

SCD2 validity intervals and ntile deciles round out the temporal-table and
order-statistics surface a training-data warehouse needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..caching import scoped_persist
from ..functions.determinism import cents
from ..sources.readers import load_table
from .registry import query

# -- blocked fuzzy entity-resolution join ------------------------------------

_FUZZY_ER_ORACLE = """
WITH names AS (
  SELECT p_name,
         split_part(p_name, ' ', 2) AS block_key,
         COUNT(*) AS n_parts,
         SUM(CAST(round(p_retailprice * 100, 0) AS BIGINT)) AS price_cents
  FROM part GROUP BY 1, 2
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist,
       a.n_parts AS n_a, b.n_parts AS n_b,
       a.n_parts * b.n_parts AS candidate_pairs,
       (a.price_cents + b.price_cents) / 100.0 AS combined_price
FROM names a JOIN names b
  ON a.block_key = b.block_key AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 4
"""


@query("q_fuzzy_er_names", _FUZZY_ER_ORACLE)
def q_fuzzy_er_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join on part names (record-level ER, the instance
    counterpart of the reference's schema matching — cf. `Stable Schema
    Matching/ask_StableMatcher.py:131-199` where candidates are also scored
    pairwise within a case).  Scale pattern: (1) aggregate 20k rows down to
    the distinct-name dimension BEFORE comparing, so the quadratic step is
    O(distinct²/blocks) not O(rows²); (2) block on the head noun so only
    plausible pairs are compared; (3) expand back via pre-aggregated counts
    (candidate_pairs = n_a·n_b) instead of materializing row pairs.  At
    100 TB the distinct dimension still fits a broadcast or one small
    shuffle while the naive row-pair join is infeasible."""
    p = load_table(spark, sf_dir, "part")
    names = (
        p.groupBy(
            "p_name",
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("block_key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(cents("p_retailprice")).alias("price_cents"),
        )
        # the dimension feeds both join sides: persist so the base table is
        # scanned once, not once per side (the self-join duplicates lineage)
    )
    names = scoped_persist(names)
    a = names.select(
        F.col("p_name").alias("name_a"),
        "block_key",
        F.col("n_parts").alias("n_a"),
        F.col("price_cents").alias("cents_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        "block_key",
        F.col("n_parts").alias("n_b"),
        F.col("price_cents").alias("cents_b"),
    )
    return (
        a.join(b, "block_key")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("name_a", "name_b") <= 4)
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
            "n_a",
            "n_b",
            (F.col("n_a") * F.col("n_b")).alias("candidate_pairs"),
            ((F.col("cents_a") + F.col("cents_b")) / F.lit(100.0)).alias(
                "combined_price"
            ),
        )
    )


# -- SCD2 validity intervals from a changelog --------------------------------

_SCD2_ORACLE = """
SELECT user_id, event_id, ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       ROW_NUMBER() OVER w AS version,
       (LEAD(ts) OVER w IS NULL) AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("q_scd2_intervals", _SCD2_ORACLE)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval construction: treat the
    event stream as a per-user changelog and derive [valid_from, valid_to)
    versions via LEAD — the compaction step behind every point-in-time
    (as-of) lookup.  One shuffle on user_id; the window sort is local to
    each hash partition, so the plan scales linearly with users."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


# -- Z-order clustering key (data-layout surface) -----------------------------

from ..operators.layout import zorder_key, zorder_key_sql  # noqa: E402

_ZBITS = 10

_ZORDER_ORACLE = f"""
SELECT z_bucket, COUNT(*) AS n_rows,
       MIN(px) AS min_part, MAX(px) AS max_part,
       MIN(sx) AS min_supp, MAX(sx) AS max_supp
FROM (
  SELECT ({zorder_key_sql('px', 'sx', _ZBITS)}) >> 16 AS z_bucket, px, sx
  FROM (SELECT l_partkey & 1023 AS px, l_suppkey & 1023 AS sx FROM lineitem)
)
GROUP BY z_bucket
"""


@query("q_zorder_locality", _ZORDER_ORACLE)
def q_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (partkey, suppkey) low bits,
    rolled up by the key's top nibble: each bucket's min/max on BOTH
    dimensions is a tight quadrant — the property that makes a Z-sorted
    file layout prunable on either filter column
    (operators/layout.write_zordered is the write path)."""
    l = load_table(spark, sf_dir, "lineitem")
    masked = l.select(
        (F.col("l_partkey").bitwiseAND(F.lit(1023))).alias("px"),
        (F.col("l_suppkey").bitwiseAND(F.lit(1023))).alias("sx"),
    )
    keyed = masked.select(
        F.shiftright(zorder_key("px", "sx", _ZBITS), 16).alias("z_bucket"), "px", "sx"
    )
    return keyed.groupBy("z_bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("px").alias("min_part"),
        F.max("px").alias("max_part"),
        F.min("sx").alias("min_supp"),
        F.max("sx").alias("max_supp"),
    )


# -- ntile decile statistics --------------------------------------------------

_NTILE_ORACLE = """
SELECT decile, COUNT(*) AS n_orders,
       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
       SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total
FROM (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
GROUP BY decile
"""


@query("q_ntile_deciles", _NTILE_ORACLE)
def q_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile stats of order value via NTILE over a total order
    (price, key) — deterministic tie handling, identical bucket-remainder
    semantics in Spark and DuckDB.  The single-partition window is the known
    scale limit of raw NTILE; at cluster scale the same result comes from
    percentile cutpoints + a range join, which q_price_percentiles covers —
    this query pins the exact-rank semantics."""
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            (F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("total"),
        )
    )


# -- changelog compaction (CDC upsert/tombstone materialization) -------------
# The events table is read as a changelog on user_id: every event is an
# upsert carrying (event_type, value), except 'error' events, which act as
# tombstones.  Materializing the current snapshot = latest-wins per key with
# tombstone suppression — the core of any CDC merge / incremental-view
# maintenance path (Debezium -> warehouse, or a streaming upsert sink).
# Scale shape: ONE shuffle on the key, per-partition sort, row_number == 1;
# the change-count aggregate rides the same shuffle via the window's
# partition.  Keys are uniform (no skew); at 100 TB this is the textbook
# merge-on-read compaction plan, and the same code runs inside foreachBatch
# for continuous apply.

_CDC_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_changes
  FROM events
)
SELECT user_id, event_type AS last_op,
       CAST(round(value * 1000, 0) AS BIGINT) AS last_value_milli,
       ts AS last_ts, CAST(n_changes AS BIGINT) AS n_changes
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
"""


@query("q_cdc_apply", _CDC_ORACLE)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = W.partitionBy("user_id")
    ranked = e.select(
        "user_id",
        "event_type",
        "value",
        "ts",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_changes"),
    )
    return (
        ranked.filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            cents("value", 1000).alias("last_value_milli"),
            F.col("ts").alias("last_ts"),
            F.col("n_changes").cast("bigint").alias("n_changes"),
        )
    )


# -- ER end-to-end: fuzzy pairs -> components -> canonical entity table -------
# The full record-linkage flow on part names: blocked fuzzy pairs (the
# q_fuzzy_er_names candidate step), transitive closure into entity
# clusters (the same min-label + pointer-jumping components the dedup
# pipeline uses — labels are lexicographic here), then one canonical row
# per entity rolling up every member name's pre-aggregated stats.
# Singleton names (no fuzzy partner) remain their own entity via the left
# join + coalesce.  Scale: identical shape to q_dedup_clusters; the
# entity rollup is one hash agg on the cluster id.

_ER_ENTITIES_ORACLE = """
WITH RECURSIVE names AS (
  SELECT p_name,
         split_part(p_name, ' ', 2) AS block_key,
         COUNT(*) AS n_parts,
         SUM(CAST(round(p_retailprice * 100, 0) AS BIGINT)) AS price_cents
  FROM part GROUP BY 1, 2
),
pairs AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b
  FROM names a JOIN names b
    ON a.block_key = b.block_key AND a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= 4
),
edges AS (SELECT name_a AS src, name_b AS dst FROM pairs
          UNION SELECT name_b, name_a FROM pairs),
reach AS (
  SELECT src AS nm, dst AS reach FROM edges
  UNION
  SELECT r.nm, e.dst FROM reach r JOIN edges e ON r.reach = e.src
),
clusters AS (
  SELECT nm, LEAST(nm, MIN(reach)) AS entity_id FROM reach GROUP BY nm
),
membership AS (
  SELECT n.p_name, COALESCE(c.entity_id, n.p_name) AS entity_id,
         n.n_parts, n.price_cents
  FROM names n LEFT JOIN clusters c ON n.p_name = c.nm
)
SELECT entity_id,
       COUNT(*) AS n_names,
       CAST(SUM(n_parts) AS BIGINT) AS n_parts,
       SUM(price_cents) / 100.0 AS total_price
FROM membership GROUP BY entity_id
"""


@query("q_er_entities", _ER_ENTITIES_ORACLE)
def q_er_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.determinism import cents as _cents
    from ..operators.dedup import connected_components

    p = load_table(spark, sf_dir, "part")
    names = (
        p.groupBy(
            "p_name",
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("block_key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(_cents("p_retailprice")).alias("price_cents"),
        )
    )
    names = scoped_persist(names)
    a = names.select(F.col("p_name").alias("name_a"), "block_key")
    b = names.select(F.col("p_name").alias("name_b"), "block_key")
    pairs = (
        a.join(b, "block_key")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("name_a", "name_b") <= 4)
        .select("name_a", "name_b")
    )
    clusters = connected_components(pairs, a_col="name_a", b_col="name_b")
    membership = names.join(
        clusters, names.p_name == clusters.doc, "left"
    ).select(
        F.coalesce(F.col("cluster_id"), F.col("p_name")).alias("entity_id"),
        "n_parts",
        "price_cents",
    )
    return membership.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_names"),
        F.sum("n_parts").cast("bigint").alias("n_parts"),
        (F.sum("price_cents") / F.lit(100.0)).alias("total_price"),
    )


# -- sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD 1995) -----------
# The third classic blocking family next to the engine's equi-key blocking
# (q_fuzzy_er_names, q_er_entities) and LSH banding (dedup family): sort all
# records by a blocking key and compare only records whose positions in that
# order differ by less than a window w.  Beyond-reference, additive — the
# reference resolves schemas, not records; SNM is the standard record-level
# companion a data-integration engine needs.
#
# Scale shape (the part worth getting right): the global position over an
# arbitrary sort key CANNOT be a plain row_number window (single-partition
# sort).  Instead the same two-level parallel prefix sum as
# q_concat_chunk_bins, but bucketed by a coarse PREFIX OF THE SORT KEY
# itself — a pure function of the data, so ranks are exact under any
# partitioning, task retries, and speculative re-execution (a sampled
# range-partitioner would not be) — and since the bucket is a prefix,
# bucket order + in-bucket key order == total key order.  Candidate pairs
# then come from an equi-join on rank cells of width w (each left row also
# probes the next cell), never from a rank-distance theta-join: every
# (gap < w) pair lands in the same or adjacent cell, each exactly once.
# Per-record work is O(w); the whole operator is two small aggs, one
# broadcast, and one equi-join — no all-pairs set at any scale.

_SN_W = 4  # window width: compare records < 4 positions apart
_SN_PREFIX = 24  # blocking key: first 24 chars, lowercased
_SN_BUCKET_CHARS = 3  # coarse prefix-sum bucket (pure function of the key)
_SN_EDIT_MAX = 8  # emit only candidate pairs this close in edit distance

_SN_ORACLE = f"""
WITH k AS (
  SELECT doc_id, lower(substr(text, 1, {_SN_PREFIX})) AS sk FROM documents
),
r AS (
  SELECT doc_id, sk, ROW_NUMBER() OVER (ORDER BY sk, doc_id) AS rn FROM k
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(b.rn - a.rn AS BIGINT) AS rank_gap,
       CAST(levenshtein(a.sk, b.sk) AS INTEGER) AS edit_dist
FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < {_SN_W}
WHERE levenshtein(a.sk, b.sk) <= {_SN_EDIT_MAX}
"""


def sorted_neighborhood_pairs(
    d: DataFrame,
    id_col: str,
    key: Column,
    w: int = _SN_W,
    bucket_chars: int = _SN_BUCKET_CHARS,
) -> DataFrame:
    """Candidate pairs (id_a, id_b, rank_gap) whose positions in the
    (key, id) total order differ by 0 < gap < w.  Exact global ranks via
    the key-prefix two-level prefix sum; pairs via the width-w rank-cell
    equi-join described above.  Returns sk columns for downstream match
    scoring.

    CONTRACT: rows whose blocking key is NULL are EXCLUDED up front (a
    NULL key has no position in the sort order; previously the null-unsafe
    bkt equi-join dropped them silently — ADVICE r11 asked for this to be
    explicit so callers without a downstream key predicate aren't
    surprised).  Callers needing NULL-key records must route them through
    a separate block."""
    k = d.select(
        F.col(id_col).alias("id"),
        key.alias("sk"),
    ).filter(F.col("sk").isNotNull()).withColumn(
        "bkt", F.substring("sk", 1, bucket_chars)
    )

    # level 1: per-bucket counts -> exclusive offsets (tiny frame, one
    # window over the bucket list), broadcast back
    sub = k.groupBy("bkt").agg(F.count(F.lit(1)).alias("n"))
    w_bkt = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    offsets = sub.select(
        "bkt", F.coalesce(F.sum("n").over(w_bkt), F.lit(0)).alias("off")
    )

    # level 2: row_number only WITHIN a bucket; bucket order + in-bucket
    # (sk, id) order == total (sk, id) order because bkt is a prefix of sk
    w_in = W.partitionBy("bkt").orderBy("sk", "id")
    ranked = (
        k.join(F.broadcast(offsets), "bkt")
        .select("id", "sk", (F.col("off") + F.row_number().over(w_in)).alias("rn"))
        .withColumn("cell", F.floor(F.col("rn") / F.lit(w)))
    )

    left = ranked.select(
        F.col("id").alias("id_a"), F.col("sk").alias("sk_a"),
        F.col("rn").alias("rn_a"),
        F.explode(F.array(F.col("cell"), F.col("cell") + 1)).alias("jc"),
    )
    right = ranked.select(
        F.col("id").alias("id_b"), F.col("sk").alias("sk_b"),
        F.col("rn").alias("rn_b"), F.col("cell").alias("jc"),
    )
    return (
        left.join(right, "jc")
        .filter((F.col("rn_b") > F.col("rn_a")) & (F.col("rn_b") - F.col("rn_a") < w))
        .select("id_a", "id_b", "sk_a", "sk_b", (F.col("rn_b") - F.col("rn_a")).alias("rank_gap"))
    )


@query("q_er_sorted_neighborhood", _SN_ORACLE)
def q_er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNM candidate pairs over documents (blocking key = lowercased 24-char
    text prefix, w = 4) filtered to near matches (edit distance <= 8) — the
    blocking+matching shape of a record-linkage pass.  levenshtein stays
    JVM-side and agrees exactly with DuckDB's."""
    d = load_table(spark, sf_dir, "documents")
    key = F.lower(F.substring("text", 1, _SN_PREFIX))
    pairs = sorted_neighborhood_pairs(d, "doc_id", key, w=_SN_W)
    return (
        pairs.filter(F.levenshtein("sk_a", "sk_b") <= _SN_EDIT_MAX)
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.col("rank_gap").cast("bigint").alias("rank_gap"),
            F.levenshtein("sk_a", "sk_b").alias("edit_dist"),
        )
    )
