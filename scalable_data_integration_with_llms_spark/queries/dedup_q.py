"""Deduplication surface over the ``documents`` table: exact groups, n-gram
Jaccard near-dup pairs, MinHash-LSH band signatures, SimHash fingerprints —
each oracle-checked (md5-stable hashing makes every stage reproducible in
DuckDB SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    containment_pairs,
    exact_dedup_groups,
    jaccard_pairs,
    minhash_signatures,
    simhash,
    word_shingles,
)

# Document-frequency cap for every shingle self-join on the query surface:
# shingles shared by more than MAX_DF docs are dropped BEFORE the join (the
# standard boilerplate/stop-shingle skew guard).  64 is far above the planted
# near-dup cluster sizes in the test corpus, so at test sf the results are
# unchanged — while on a real corpus this is the bound that keeps the join
# fan-out at O(max_df · n_shingles) instead of O(df²) on viral boilerplate.
MAX_DF = 64
from ..caching import scoped_persist
from ..sources.readers import load_table
from .registry import query

# -- exact dedup --------------------------------------------------------------

_EXACT_ORACLE = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


@query("q_dedup_exact", _EXACT_ORACLE)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(d, "doc_id", "text")


# -- n-gram Jaccard near-dup pairs --------------------------------------------
# word 3-gram shingles: at corpus scale shingle doc-frequency stays ~1 for
# non-duplicate content, so the shingle self-join only materializes genuinely
# overlapping pairs (measured: j >= 0.9 for planted near-dups, <= 0.07 noise).

_SHINGLE_CTE = """
WITH w AS (SELECT doc_id AS doc, string_split(text, ' ') AS ws FROM documents),
s AS (SELECT DISTINCT doc, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      FROM w, unnest(range(1, len(ws) - 1)) AS t(i))
"""

# the df-capped shingle set every self-join query reads (mirrors the Spark
# side's max_df guard in operators/dedup.py)
_DF_FILTER_CTE = """,
sdf AS (SELECT shingle FROM s GROUP BY shingle HAVING COUNT(*) <= 64),
s2 AS (SELECT s.doc, s.shingle FROM s JOIN sdf USING (shingle))
"""

_JACCARD_ORACLE = _SHINGLE_CTE + _DF_FILTER_CTE + """,
sz AS (SELECT doc, COUNT(*) AS sz FROM s2 GROUP BY doc),
i AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
      FROM s2 a JOIN s2 b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY 1, 2)
SELECT doc_a, doc_b, inter, x.sz AS sz_a, y.sz AS sz_b,
       inter / (x.sz + y.sz - inter) AS jaccard
FROM i JOIN sz x ON doc_a = x.doc JOIN sz y ON doc_b = y.doc
WHERE inter / (x.sz + y.sz - inter) >= 0.5
"""


@query("q_dedup_ngram_jaccard", _JACCARD_ORACLE)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sh = word_shingles(d, "doc_id", "text", n=3)
    return jaccard_pairs(sh, threshold=0.5, max_df=MAX_DF, materialize=True)


# -- MinHash-LSH band signatures ----------------------------------------------

_MINHASH_ORACLE = _SHINGLE_CTE + """,
perms AS (SELECT unnest(range(0, 12)) AS p),
hashed AS (SELECT doc, p, ('0x' || substr(md5(p || ':' || shingle), 1, 15))::BIGINT AS h
           FROM s CROSS JOIN perms),
minh AS (SELECT doc, p, MIN(h) AS minh FROM hashed GROUP BY doc, p),
banded AS (SELECT doc, CAST(p // 3 AS INT) AS band, p, minh FROM minh)
SELECT doc, band, md5(string_agg(p || ':' || minh, '|' ORDER BY p)) AS signature
FROM banded GROUP BY doc, band
"""


@query("q_minhash_signatures", _MINHASH_ORACLE)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sh = word_shingles(d, "doc_id", "text", n=3)
    return minhash_signatures(sh, n_perm=12, n_bands=4)


# -- SimHash fingerprints ------------------------------------------------------

_SIMHASH_BITS = 16
_SIMHASH_ORACLE = (
    """
WITH toks AS (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT doc, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
sums AS (SELECT doc, """
    + ", ".join(
        f"SUM(((h >> {b}) & 1) * 2 - 1) AS b{b}" for b in range(_SIMHASH_BITS)
    )
    + """ FROM h GROUP BY doc)
SELECT doc, CAST("""
    + " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIMHASH_BITS)
    )
    + """ AS BIGINT) AS simhash
FROM sums
"""
)


@query("q_simhash", _SIMHASH_ORACLE)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text", bits=_SIMHASH_BITS)


# SimHash → banded candidates → Hamming verify (the SimHash twin of the
# MinHash→LSH→Jaccard flow).  4 bands × 8 bits over a 32-bit fingerprint:
# pigeonhole still guarantees no false negatives at Hamming ≤ 3, but each
# band now has 256 bucket values, so bucket occupancy — and the candidate
# pair count — drops ~16× vs banding the 16-bit fingerprint (which at
# 5000 docs put ~300 docs in every bucket and exploded to millions of
# verify pairs).  Band width is the LSH recall/cost dial; at corpus scale
# you widen the fingerprint (64-bit, 8×8 bands), not the buckets.

_SIMHASH_PAIR_BITS = 32

_SIMHASH_PAIRS_ORACLE = (
    """
WITH toks AS (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT doc, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
sums AS (SELECT doc, """
    + ", ".join(
        f"SUM(((h >> {b}) & 1) * 2 - 1) AS b{b}" for b in range(_SIMHASH_PAIR_BITS)
    )
    + """ FROM h GROUP BY doc),
sh AS (SELECT doc, CAST("""
    + " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIMHASH_PAIR_BITS)
    )
    + """ AS BIGINT) AS simhash FROM sums),
banded AS (
  SELECT doc, simhash, b AS band, (simhash >> (b * 8)) & 255 AS band_sig
  FROM sh CROSS JOIN (SELECT unnest(range(0, 4)) AS b)
),
cand AS (
  SELECT DISTINCT a.doc AS doc_a, b2.doc AS doc_b,
                  a.simhash AS sig_a, b2.simhash AS sig_b
  FROM banded a
  JOIN banded b2 ON a.band = b2.band AND a.band_sig = b2.band_sig AND a.doc < b2.doc
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
"""
)


@query("q_simhash_near_dup", _SIMHASH_PAIRS_ORACLE)
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-duplicate pairs with exact Hamming verify
    (operators/dedup.simhash_near_dup)."""
    from ..operators.dedup import simhash_near_dup

    d = load_table(spark, sf_dir, "documents")
    sigs = simhash(d, "doc_id", "text", bits=_SIMHASH_PAIR_BITS)
    return simhash_near_dup(sigs, n_bands=4, band_bits=8, max_hamming=3)


# Real PNG decode, value-oracled: the Spark side synthesizes a valid PNG per
# document (chunk CRCs, zlib IDAT) and decodes it back through mapInPandas
# (operators/media_codec.py — stdlib implementation of the public spec); the
# oracle recomputes every statistic from the closed-form pixel pattern.  The
# position-weighted checksum px_wsum makes the check sensitive to framing,
# filtering, and reshape defects, not just dimensions.

_MULTIMODAL_ORACLE = """
WITH dims AS (
  SELECT doc_id AS media_id, 'png' AS fmt,
         CAST(16 + doc_id % 17 AS INT) AS width,
         CAST(16 + (doc_id * 7) % 13 AS INT) AS height
  FROM documents
),
px AS (
  SELECT media_id,
         r * (width * 3) + c * 3 + ch + 1 AS pos,
         (media_id * 31 + r * 7 + c * 3 + ch * 11) % 256 AS v
  FROM dims,
       unnest(range(0, height)) AS tr(r),
       unnest(range(0, width)) AS tc(c),
       unnest(range(0, 3)) AS tch(ch)
)
SELECT d.media_id, d.fmt, d.width, d.height,
       CAST(d.width * d.height * 3 AS BIGINT) AS n_pixels,
       CAST(SUM(p.v) AS BIGINT) AS px_sum,
       CAST(SUM(p.v * p.pos) AS BIGINT) AS px_wsum,
       CAST(MIN(p.v) AS INT) AS px_min,
       CAST(MAX(p.v) AS INT) AS px_max
FROM dims d JOIN px p USING (media_id)
GROUP BY d.media_id, d.fmt, d.width, d.height
"""


@query("q_multimodal_features", _MULTIMODAL_ORACLE)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode (north star): synthesize a real PNG per document,
    decode it back — signature, CRC-verified chunks, inflate, un-filter —
    and emit integer pixel statistics the SQL oracle recomputes from the
    generating formula.  Agreement proves the whole codec round trip."""
    from ..operators.multimodal import image_decode_stats, synthesize_png_media

    d = load_table(spark, sf_dir, "documents")
    media = synthesize_png_media(d, "doc_id")
    return image_decode_stats(media)


# Frame-sampling with a full value oracle: the per-frame roll moves source
# row r to row (r+f) mod h, so the row-position-weighted bucket sums are
# closed-form in (media_id, frame) and DuckDB recomputes them from the synth
# pixel formula.  Bucket boundaries follow numpy array_split over the w*3
# column axis: the first (L mod 8) buckets get one extra element.

_MEDIA_FRAMES_ORACLE = """
WITH dims AS (
  SELECT doc_id AS media_id,
         CAST(16 + doc_id % 17 AS INT) AS width,
         CAST(16 + (doc_id * 7) % 13 AS INT) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height, f,
         c * 3 + ch AS lin,
         ((media_id * 31 + r * 7 + c * 3 + ch * 11) % 256)
           * (((r + f) % height) + 1) AS wv
  FROM dims,
       unnest(range(0, height)) AS tr(r),
       unnest(range(0, width)) AS tc(c),
       unnest(range(0, 3)) AS tch(ch),
       unnest(range(0, 2)) AS tf(f)
),
b AS (
  SELECT media_id, width, height, CAST(f AS INT) AS frame_idx,
         CASE WHEN lin < ((width * 3) % 8) * ((width * 3) // 8 + 1)
              THEN lin // ((width * 3) // 8 + 1)
              ELSE ((width * 3) % 8)
                   + (lin - ((width * 3) % 8) * ((width * 3) // 8 + 1))
                     // ((width * 3) // 8)
         END AS bucket,
         wv
  FROM px
)
SELECT media_id, frame_idx, width, height,
""" + ",\n".join(
    f"       CAST(SUM(CASE WHEN bucket = {j} THEN wv ELSE 0 END) AS BIGINT) AS f{j}"
    for j in range(8)
) + """
FROM b GROUP BY media_id, frame_idx, width, height
"""


@query("q_media_frames", _MEDIA_FRAMES_ORACLE)
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N frame sampling through the real PNG decoder: decode → per-frame
    row roll → position-weighted 8-bucket integer features, every value
    reproduced by the SQL oracle from the generating formula (upgraded from
    rows-only in r3; the float mean-pool variant stays available as
    operators/multimodal.extract_features)."""
    from ..operators.multimodal import extract_frame_features_int, synthesize_png_media

    d = load_table(spark, sf_dir, "documents")
    media = synthesize_png_media(d, "doc_id")
    return extract_frame_features_int(media, frames_per_item=2)


# -- the production dedup flow: LSH candidates -> exact-Jaccard verify --------

_LSH_VERIFIED_ORACLE = _SHINGLE_CTE + """,
perms AS (SELECT unnest(range(0, 12)) AS p),
hashed AS (SELECT doc, p, ('0x' || substr(md5(p || ':' || shingle), 1, 15))::BIGINT AS h
           FROM s CROSS JOIN perms),
minh AS (SELECT doc, p, MIN(h) AS minh FROM hashed GROUP BY doc, p),
banded AS (SELECT doc, CAST(p // 3 AS INT) AS band, p, minh FROM minh),
sigs AS (SELECT doc, band, md5(string_agg(p || ':' || minh, '|' ORDER BY p)) AS signature
         FROM banded GROUP BY doc, band),
cands AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_shared_bands
  FROM sigs a JOIN sigs b ON a.band = b.band AND a.signature = b.signature AND a.doc < b.doc
  GROUP BY 1, 2
),
sz AS (SELECT doc, COUNT(*) AS sz FROM s GROUP BY doc),
inter AS (
  SELECT c.doc_a, c.doc_b, c.n_shared_bands, COUNT(*) AS inter
  FROM cands c JOIN s sa ON sa.doc = c.doc_a JOIN s sb ON sb.doc = c.doc_b AND sa.shingle = sb.shingle
  GROUP BY 1, 2, 3
)
SELECT doc_a, doc_b, n_shared_bands,
       inter / (x.sz + y.sz - inter) AS jaccard
FROM inter JOIN sz x ON doc_a = x.doc JOIN sz y ON doc_b = y.doc
WHERE inter / (x.sz + y.sz - inter) >= 0.7
"""


@query("q_lsh_verified_pairs", _LSH_VERIFIED_ORACLE)
def q_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end near-dup pipeline a training-data run uses: MinHash
    band signatures -> LSH candidate pairs (groupBy on (band, signature), no
    all-pairs join) -> exact shingle-Jaccard verification of candidates
    only.  At corpus scale the verify join touches just the candidate set,
    not the corpus square."""
    d = load_table(spark, sf_dir, "documents")
    # eager: the shingle frame feeds 4 plan branches (signatures, sizes,
    # both verify sides) that AQE materializes as CONCURRENT jobs — a lazy
    # persist left every branch recomputing the scan+explode on a cold run
    sh = scoped_persist(word_shingles(d, "doc_id", "text", n=3), eager=True)
    sigs = minhash_signatures(sh, n_perm=12, n_bands=4)
    from ..operators.dedup import lsh_candidate_pairs

    cands = lsh_candidate_pairs(sigs)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col("doc").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        cands.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b", "n_shared_bands")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sx = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sy = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sx, "doc_a")
        .join(sy, "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= 0.7)
        .select("doc_a", "doc_b", "n_shared_bands", "jaccard")
    )


# -- duplicate clusters: near-dup pairs -> connected components ---------------

_CLUSTERS_ORACLE = _SHINGLE_CTE.replace("WITH ", "WITH RECURSIVE ", 1) + _DF_FILTER_CTE + """,
sz AS (SELECT doc, COUNT(*) AS sz FROM s2 GROUP BY doc),
i AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
      FROM s2 a JOIN s2 b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b
  FROM i JOIN sz x ON doc_a = x.doc JOIN sz y ON doc_b = y.doc
  WHERE inter / (x.sz + y.sz - inter) >= 0.5
),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach AS (
  SELECT src AS doc, dst AS reach FROM edges
  UNION
  SELECT r.doc, e.dst FROM reach r JOIN edges e ON r.reach = e.src
)
SELECT doc, LEAST(doc, MIN(reach)) AS cluster_id FROM reach GROUP BY doc
"""

@query("q_dedup_clusters", _CLUSTERS_ORACLE)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End of the dedup pipeline: near-dup PAIRS (3-gram Jaccard ≥ 0.5)
    become duplicate GROUPS via connected components (min-label
    propagation), cluster_id = smallest doc in the component.  The oracle
    computes the same closure with a recursive CTE.  At 100 TB the iterative
    join rounds are the standard CC-on-edge-list recipe; the keep/drop
    decision is then `doc != cluster_id`."""
    from ..operators.dedup import connected_components

    d = load_table(spark, sf_dir, "documents")
    sh = word_shingles(d, "doc_id", "text", n=3)
    pairs = jaccard_pairs(sh, threshold=0.5, max_df=MAX_DF, materialize=True)
    return connected_components(pairs)


# -- multimodal metadata with an exact oracle ---------------------------------

_MEDIA_STATS_ORACLE = """
SELECT doc_id AS media_id,
       'application/octet-stream' AS mime,
       length(text) AS n_bytes,
       CAST(list_sum(list_transform(range(1, length(text) + 1),
                                    i -> ascii(substr(text, i, 1)))) AS BIGINT) AS byte_sum
FROM documents
"""


@query("q_media_metadata", _MEDIA_STATS_ORACLE)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata path with a REAL oracle: binary payloads flow
    through the decode boundary (mapInPandas over Arrow batches) and emit
    integer stats — byte length + byte checksum — that DuckDB reproduces
    from the source text (ASCII, so UTF-8 bytes == characters).  Proves the
    binary-column plumbing end-to-end, not just rows-only."""
    from ..operators.multimodal import attach_media, media_stats

    d = load_table(spark, sf_dir, "documents")
    return media_stats(attach_media(d, "text", "doc_id"))


# -- containment near-dups (subset duplication) -------------------------------

_CONTAINMENT_ORACLE = _SHINGLE_CTE + _DF_FILTER_CTE + """,
sz AS (SELECT doc, COUNT(*) AS sz FROM s2 GROUP BY doc),
i AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
      FROM s2 a JOIN s2 b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY 1, 2)
SELECT doc_a, doc_b, inter,
       CAST(inter AS DOUBLE) / LEAST(x.sz, y.sz) AS containment
FROM i JOIN sz x ON doc_a = x.doc JOIN sz y ON doc_b = y.doc
WHERE CAST(inter AS DOUBLE) / LEAST(x.sz, y.sz) >= 0.8
"""


@query("q_dedup_containment", _CONTAINMENT_ORACLE)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dups: |A∩B| / min(|A|,|B|) ≥ 0.8 — catches a short
    document embedded in a longer one, which symmetric Jaccard dilutes
    below threshold (the quote/boilerplate-inclusion case in training
    corpora).  Bounded end-to-end (operators/dedup.containment_pairs):
    max_df caps join fan-out before the self-join and the feasibility bound
    inter ≥ ceil(0.8·min(sz)) prunes in the same stage as the intersection
    aggregate — the unfiltered co-shingle pair set is never materialized."""
    d = load_table(spark, sf_dir, "documents")
    sh = word_shingles(d, "doc_id", "text", n=3)
    return containment_pairs(sh, threshold=0.8, max_df=MAX_DF)


# -- canonical selection: keep the best doc per duplicate cluster -------------

_KEEPERS_ORACLE = f"""
WITH clusters AS ({_CLUSTERS_ORACLE})
SELECT cluster_id, doc_id AS keeper_doc, n_chars, n_members FROM (
  SELECT c.cluster_id, d.doc_id, d.n_chars,
         COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
  FROM clusters c JOIN documents d ON c.doc = d.doc_id
) WHERE rk = 1
"""


@query("q_dedup_keepers", _KEEPERS_ORACLE)
def q_dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection, the final dedup decision: per
    duplicate cluster keep the LONGEST member (ties → smallest doc id) —
    the content-preserving choice a training pipeline makes, vs the
    arbitrary min-id representative.  Window over the (tiny) cluster
    assignment joined back to doc metadata."""
    from pyspark.sql import Window as W

    from ..operators.dedup import connected_components, jaccard_pairs, word_shingles

    d = load_table(spark, sf_dir, "documents")
    sh = word_shingles(d, "doc_id", "text", n=3)
    clusters = connected_components(jaccard_pairs(sh, threshold=0.5, max_df=MAX_DF, materialize=True))
    joined = clusters.join(
        d.select("doc_id", "n_chars"), clusters.doc == F.col("doc_id")
    )
    win = W.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    size_win = W.partitionBy("cluster_id")  # cluster-sized frames: bounded
    return (
        joined.withColumn("n_members", F.count(F.lit(1)).over(size_win))
        .withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") == 1)
        .select("cluster_id", F.col("doc_id").alias("keeper_doc"), "n_chars", "n_members")
    )


# -- MinHash quality: estimated vs exact Jaccard on near-dup pairs ------------

_MINHASH_EST_ORACLE = _SHINGLE_CTE + _DF_FILTER_CTE + """,
sz AS (SELECT doc, COUNT(*) AS sz FROM s2 GROUP BY doc),
i AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
      FROM s2 a JOIN s2 b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY 1, 2),
pairs AS MATERIALIZED (
  SELECT doc_a, doc_b, inter * 1.0 / (x.sz + y.sz - inter) AS true_jaccard
  FROM i JOIN sz x ON doc_a = x.doc JOIN sz y ON doc_b = y.doc
  WHERE inter * 1.0 / (x.sz + y.sz - inter) >= 0.5
),
perms AS (SELECT unnest(range(0, 12)) AS p),
hashed AS (SELECT doc, p, ('0x' || substr(md5(p || ':' || shingle), 1, 15))::BIGINT AS h
           FROM s CROSS JOIN perms),
minh AS MATERIALIZED (SELECT doc, p, MIN(h) AS minh FROM hashed GROUP BY doc, p)
SELECT pr.doc_a, pr.doc_b, pr.true_jaccard,
       CAST(SUM(CASE WHEN ma.minh = mb.minh THEN 1 ELSE 0 END) AS BIGINT) AS matching_perms,
       SUM(CASE WHEN ma.minh = mb.minh THEN 1 ELSE 0 END) / 12.0 AS est_jaccard
FROM pairs pr
JOIN minh ma ON pr.doc_a = ma.doc
JOIN minh mb ON pr.doc_b = mb.doc AND ma.p = mb.p
GROUP BY pr.doc_a, pr.doc_b, pr.true_jaccard
"""


@query("q_minhash_est_jaccard", _MINHASH_EST_ORACLE)
def q_minhash_est_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash quality harness: for every true near-dup pair (Jaccard ≥
    0.5), the fraction of the 12 permutations whose minhash components
    agree — the unbiased Jaccard estimator whose variance drives the
    n_perm choice (the dedup analog of q_ann_recall's n_planes tuning).
    Exact integer minhashes in both engines make the estimate itself
    oracle-checked."""
    from ..operators.dedup import _hash60, jaccard_pairs, word_shingles

    d = load_table(spark, sf_dir, "documents")
    sh = scoped_persist(word_shingles(d, "doc_id", "text", n=3), eager=True)
    pairs = jaccard_pairs(sh, threshold=0.5, max_df=MAX_DF, materialize=True).select(
        "doc_a", "doc_b", F.col("jaccard").alias("true_jaccard")
    )
    # wide minhash layout (one agg, 12 min columns — same shape as
    # minhash_signatures): the per-pair estimate is then a column
    # expression over two co-keyed joins, not a 12-way (doc, p) join + agg.
    # Persisted: ma and mb below both read it — without the cache the
    # 12-permutation md5 aggregation (the dominant compute) runs per side.
    # Hashing each DISTINCT shingle once + joining back (VERDICT r14 item
    # 5) was A/B'd in r15 and LOSES, despite a 9.6x shingle sharing factor:
    # the join-back pays two corpus-sized exchanges (the (doc,shingle)
    # stream shuffled by shingle, then the 12-bigint-wide rows by doc)
    # where this form pays ONE exchange bounded at |docs|x12 by map-side
    # partial_min — md5 recompute is shuffle-free map work.  Interleaved
    # fresh-process x3 at sf0.1: recompute 3.63/3.32/3.34 s best vs
    # distinct+join-back 5.24/5.46/4.88 s.
    mins = scoped_persist(
        sh.groupBy("doc").agg(
            *[
                F.min(_hash60(F.lit(p), F.col("shingle"))).alias(f"m{p}")
                for p in range(12)
            ]
        ),
        eager=True,
    )
    ma = mins.select(
        F.col("doc").alias("doc_a"), *[F.col(f"m{p}").alias(f"a{p}") for p in range(12)]
    )
    mb = mins.select(
        F.col("doc").alias("doc_b"), *[F.col(f"m{p}").alias(f"b{p}") for p in range(12)]
    )
    matches = sum(
        F.when(F.col(f"a{p}") == F.col(f"b{p}"), 1).otherwise(0) for p in range(12)
    )
    return (
        pairs.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "true_jaccard",
            matches.cast("bigint").alias("matching_perms"),
            (matches / F.lit(12.0)).alias("est_jaccard"),
        )
    )


# -- cross-source duplication matrix (round 5) --------------------------------

_CROSS_SRC_ORACLE = _SHINGLE_CTE + _DF_FILTER_CTE + """,
sz AS (SELECT doc, COUNT(*) AS sz FROM s2 GROUP BY doc),
i AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
      FROM s2 a JOIN s2 b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b, inter / (x.sz + y.sz - inter) AS jaccard
  FROM i JOIN sz x ON doc_a = x.doc JOIN sz y ON doc_b = y.doc
  WHERE inter / (x.sz + y.sz - inter) >= 0.5
),
tagged AS (
  SELECT LEAST(da.source, db.source) AS source_a,
         GREATEST(da.source, db.source) AS source_b,
         CAST(FLOOR(jaccard * 1000) AS BIGINT) AS j_milli
  FROM pairs
  JOIN documents da ON pairs.doc_a = da.doc_id
  JOIN documents db ON pairs.doc_b = db.doc_id
)
SELECT source_a, source_b,
       CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
       CAST(SUM(j_milli) // COUNT(*) AS BIGINT) AS mean_jaccard_milli
FROM tagged GROUP BY source_a, source_b
"""


@query("q_cross_source_dup_matrix", _CROSS_SRC_ORACLE)
def q_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup pairs (the q_dedup_ngram_
    jaccard machinery — df-capped shingle self-join, threshold 0.5) rolled
    up by unordered source pair — which corpora copy from each other, the
    provenance signal that drives source-level dedup/caps decisions.

    Mean Jaccard aggregates as floor-milli INTEGERS (double summation
    order differs between engines; integer sums are associative-exact).
    Source tags ride two broadcast-friendly joins against the doc
    dimension; everything upstream is the existing candidate-bounded
    near-dup plan."""
    d = load_table(spark, sf_dir, "documents")
    sh = word_shingles(d, "doc_id", "text", n=3)
    pairs = jaccard_pairs(sh, threshold=0.5, max_df=MAX_DF, materialize=True)
    src = d.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    tagged = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            F.floor(F.col("jaccard") * 1000).cast("bigint").alias("j_milli"),
        )
    )
    return tagged.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_pairs"),
        F.floor(F.sum("j_milli") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("mean_jaccard_milli"),
    )


# -- PPJoin: prefix-filtered all-pairs similarity join (round 12) --------------
# The LOSSLESS counterpart to the max_df-guarded shingle join above:
# AllPairs/PPJoin prefix filtering (Bayardo et al., WWW'07) prunes the
# candidate space with zero false negatives — if J(a,b) >= t the pair MUST
# meet in the (df-asc, element-asc)-ordered prefixes of length
# |x| - ceil(t*|x|) + 1.  Same shingle universe as q_dedup_ngram_jaccard,
# same threshold 1/2, but NO max_df drop: where the guarded join trades
# exactness for bounded fan-out, prefix filtering gets bounded fan-out
# (each doc's RAREST shingles only) for free.  Threshold 1/2 keeps every
# predicate integer-exact (2*|∩| >= |∪|; prefix ceil via (sz+1) DIV 2).
# The oracle replays the identical algorithm; losslessness itself is
# property-tested against brute force in tests/test_ppjoin_properties.py.

_PPJOIN_ORACLE = _SHINGLE_CTE + """,
dfreq AS (SELECT shingle, COUNT(*) AS df FROM s GROUP BY shingle),
ranked AS (
  SELECT s.doc, s.shingle,
         ROW_NUMBER() OVER (PARTITION BY s.doc ORDER BY d.df, s.shingle) AS pos,
         COUNT(*) OVER (PARTITION BY s.doc) AS sz
  FROM s JOIN dfreq d USING (shingle)
),
prefix AS (
  SELECT doc, shingle, sz FROM ranked
  WHERE pos <= sz - ((sz + 1) // 2) + 1
),
cand AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM prefix a JOIN prefix b ON a.shingle = b.shingle AND a.doc < b.doc
  WHERE a.sz <= 2*b.sz AND b.sz <= 2*a.sz
),
arrs AS (SELECT doc, list(shingle) AS ta FROM s GROUP BY doc)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(x.ta, y.ta)) AS INT) AS n_int,
       CAST(len(x.ta) + len(y.ta) - len(list_intersect(x.ta, y.ta)) AS INT) AS n_union,
       len(list_intersect(x.ta, y.ta)) * 1.0
         / (len(x.ta) + len(y.ta) - len(list_intersect(x.ta, y.ta))) AS jaccard
FROM cand c JOIN arrs x ON c.doc_a = x.doc JOIN arrs y ON c.doc_b = y.doc
WHERE 2 * len(list_intersect(x.ta, y.ta))
      >= (len(x.ta) + len(y.ta) - len(list_intersect(x.ta, y.ta)))
"""


@query("q_ppjoin_near_dup", _PPJOIN_ORACLE)
def q_ppjoin_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-set Jaccard >= 1/2 document pairs via prefix-filtered
    AllPairs/PPJoin (see module comment): exact, LOSSLESS, and never
    materializes an all-pairs set — the candidate join touches only each
    document's rarest shingles.  The lossless twin of
    q_dedup_ngram_jaccard's max_df-guarded join on the same universe."""
    from ..operators.dedup import ppjoin_pairs

    d = load_table(spark, sf_dir, "documents")
    sh = word_shingles(d, "doc_id", "text", n=3)
    return ppjoin_pairs(sh, t_num=1, t_den=2)
