"""Deduplication operators over `documents` / `embeddings`.

Training-data-pipeline dedup surface (no reference counterpart —
SURVEY.md §7.4): exact content dedup, MinHash+LSH near-dup candidates,
SimHash signatures + hamming pairs, n-gram Jaccard verification, and
embedding-cosine near-dup pairs.

All hash functions are md5-derived 60-bit integers (identical on Spark
and the DuckDB oracle), never engine-native hash() (Spark xxhash64 and
DuckDB hash disagree).

Scale notes (100 TB):
- signatures (minhash / simhash / content md5) are MAP-ONLY: computed
  per-document with array lambdas inside whole-stage codegen, no Python.
- LSH candidate generation joins on (band_id, band_hash) — the join key
  is the bucket, so only same-bucket documents ever meet. This is the
  scale path: cost ~ sum of bucket^2, never n^2. The verification join
  (exact Jaccard on candidates) touches only candidate pairs.
- the all-pairs forms (simhash hamming, cosine pairs) are written over
  a pre-filtered/blocked pair set at scale; at test sf they run the
  full cross-join to keep the oracle 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.functions.rp_lsh import (
    duck_rp_planes_sql,
    rp_planes_df,
    rp_sigs,
)
from ibis_olap_aggregation_spark.functions.idioms import tokens_col
from ibis_olap_aggregation_spark.queries import register
from ibis_olap_aggregation_spark.session import load_table, query_cache

# minhash constants + oracle CTEs live in the LEAF module
# functions/minhash_sql.py so sibling operators (pipeline.py) can reuse
# them at module level without import cycles
from ibis_olap_aggregation_spark.functions.minhash_sql import (  # noqa: E402
    DUCK_HASHED_SHINGLES as _DUCK_HASHED_SHINGLES,
    DUCK_MINHASH_SIG as _DUCK_MINHASH_SIG,
    DUCK_NEAR_DUP_COMP as _DUCK_NEAR_DUP_COMP,
    JACCARD_THRESHOLD,
    MH_A as _MH_A,
    MH_B as _MH_B,
    MH_MOD as _MH_MOD,
    MINHASH_SHINGLE_K,
    N_MINHASH,
)

# 60 bits (all the entropy the shared 15-hex-digit md5 idiom carries,
# sign bit untouched): with 4-chunk pigeonhole blocking each chunk has
# 2^15 values, so buckets stay discriminating at large corpus sizes.
# The original 32-bit form OOMed a 24g heap at 100k docs — 8-bit chunks
# give only 256 bucket values, forcing sum(bucket^2) >= n^2/256 no
# matter the content (found by tools/scale_smoke.py). 64-bit signatures
# with k=3 chunking is the production design (Manku et al. 2007,
# "Detecting Near-Duplicates for Web Crawling").
SIMHASH_BITS = 60
SIMHASH_MAX_HAMMING = 3
COSINE_THRESHOLD = 0.3

# 60-bit md5-derived hash, identical in both engines (functions/idioms.py)
from ibis_olap_aggregation_spark.functions.idioms import (  # noqa: E402
    DUCK_MD5INT as _DUCK_MD5INT,
    SPARK_MD5INT as _SPARK_MD5INT,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_docs with the scan SPREAD to the configured shuffle width — for
    the CPU-heavy per-row chains only (tokenize -> shingle -> md5 ->
    minhash fold): parquet byte-splitting hands a corpus smaller than
    maxPartitionBytes to ONE task, serializing the dominant expression
    work onto one core (measured: the lsh-candidates signature stage ran
    single-task at sf0.1; spreading cut the query 3.08s -> 1.75s). No-op
    whenever the scan already meets the width — at real scale the corpus
    has thousands of splits and a round-robin exchange of raw text would
    be the bug, not the fix. Cheap scans (md5 + groupBy) keep the
    un-spread _docs: for them the extra exchange is pure cost (measured
    +0.3s on dedup_exact_content)."""
    from ibis_olap_aggregation_spark.session import spread_scan

    return spread_scan(_docs(spark, sf_dir))


# Max bucket members a single task materializes (collect_list) when
# generating in-bucket pairs. Buckets above the cap are SPLIT, not
# dropped — output is identical, so there is no silent approximation.
BUCKET_PAIR_CAP = 4096


def bucket_pairs(
    members: DataFrame, keys: list[str], member_col: str, cap: int | None = None
) -> DataFrame:
    """All unordered member pairs within each bucket — the shared pair
    generator behind every LSH/prefix blocking operator — with per-task
    memory BOUNDED regardless of bucket degeneracy.

    The naive shape (groupBy(keys).collect_list → in-list pairs) puts an
    entire bucket in one task's memory: a degenerate bucket (an
    all-identical near-dup class, an empty-signature band, an
    ultra-common prefix shingle) means one task holding the whole class
    and emitting O(b²) rows. Here each bucket is salted into
    ceil(n/cap) sub-buckets by member hash, so any collect_list holds at
    most ~cap members:

      pairs(bucket) = Σ_s pairs(sub_s)                     [same salt]
                    ∪ Σ_{s<t} sub_s × sub_t                [cross salt]

    both produced by ONE equi-join of the sub-bucket table with itself:
    each sub-bucket row fans out to targets _t in [_s, _ns-1]; at
    _t = _s the in-list `x < y` filter yields the within pairs, at
    _t > _s the full combination (oriented by `<`) yields the cross
    pairs. The join key (keys, _t) matches a single sub-bucket row on
    the right, so a join task buffers at most two ≤cap lists. Every
    unordered pair appears exactly once per bucket (same salt, or
    exactly one (lower, higher) salt combination), so counting
    consumers (band-match counts) stay exact.

    Members must be distinct within a bucket and totally ordered by `<`
    (atomic ids, or structs whose first field is a unique id) — the
    orientation `a < b` relies on it. The salt hash is engine-internal
    (xxhash64): it never reaches the output, so cross-engine parity is
    unaffected.

    Plan shape: bucket sizes come from a window count (NOT a separate
    aggregate + join — that re-evaluates the member lineage, often an
    expensive signature chain, a second time), and the sub-bucket table
    is cached because the self-join reads it twice. Cost vs the naive
    collect_list shape: one extra shuffle (window on keys, then group
    on (keys, salt)); the cross fan-out is empty whenever no bucket
    exceeds the cap."""
    if cap is None:
        cap = BUCKET_PAIR_CAP
    m = members.select(*keys, F.col(member_col).alias("m"))
    w = Window.partitionBy(*keys)
    sub = (
        m.withColumn("_n", F.count(F.lit(1)).over(w))
        .withColumn("_ns", F.ceil(F.col("_n") / F.lit(cap)).cast("int"))
        .withColumn("_s", F.pmod(F.xxhash64("m"), F.col("_ns")).cast("int"))
        .groupBy(*keys, "_s")
        .agg(F.collect_list("m").alias("ms"), F.first("_ns").alias("_ns"))
    )
    sub = query_cache(sub)  # multi-referenced below; query-scoped (session.query_cache)
    left = sub.filter((F.size("ms") > 1) | (F.col("_ns") > 1)).select(
        *keys,
        "ms",
        "_s",
        F.explode(F.expr("sequence(_s, _ns - 1)")).alias("_t"),
    )
    right = sub.select(*keys, F.col("_s").alias("_t"), F.col("ms").alias("ms2"))
    return (
        left.join(right, [*keys, "_t"])
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ms, x -> transform("
                    " filter(ms2, y -> _s != _t OR x < y),"
                    " y -> if(x < y, struct(x AS a, y AS b),"
                    " struct(y AS a, x AS b)))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )


def shingles_col(k: int = 3) -> F.Column:
    """Distinct k-token shingles from the token array column `t`.

    Guarded for docs shorter than k tokens: Spark's sequence(1, 0) is
    DESCENDING ([1, 0] — slice index 0 then errors at runtime), unlike
    DuckDB's generate_series which returns empty. The size(t) < k branch
    returns an empty array so both engines agree on short documents."""
    return F.array_distinct(
        F.expr(
            f"if(size(t) < {k}, cast(array() as array<string>),"
            f" transform(sequence(1, size(t) - {k - 1}),"
            f" i -> concat_ws(' ', slice(t, i, {k}))))"
        )
    )


_DUCK_SHINGLES = """
tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t) - 2),
                       i -> array_to_string(t[i:i+2], ' '))) AS shingles
  FROM tok
)
"""

def hashed_shingles_col() -> F.Column:
    """32-bit md5-derived hashes of distinct 5-token shingles.

    Short-doc guard (see shingles_col): docs with fewer than k tokens get
    an empty hash set, matching DuckDB's empty generate_series."""
    k = MINHASH_SHINGLE_K
    h = _SPARK_MD5INT.format(x="s")
    return F.expr(
        f"if(size(t) < {k}, cast(array() as array<bigint>),"
        f" transform(array_distinct(transform(sequence(1, size(t) - {k - 1}),"
        f" i -> concat_ws(' ', slice(t, i, {k})))), s -> {h} & 4294967295))"
    )


def minhash_sig_col() -> F.Column:
    """16 minhashes via affine rehash of the 32-bit shingle hashes.

    Written as ONE fold over `hs` with an elementwise-min accumulator:
    the naive `transform(sequence(0,15), i -> array_min(transform(hs,..)))`
    references `hs` inside the outer lambda, and after Catalyst's project
    collapsing the whole shingle+md5 chain is re-evaluated 16x per row
    (measured 30x slower). Here `hs` is the fold input — evaluated once.
    """
    init = f"transform(sequence(0, {N_MINHASH - 1}), i -> cast(9223372036854775807 as bigint))"
    step = (
        f"(acc, h) -> zip_with(acc, sequence(0, {N_MINHASH - 1}),"
        f" (m, i) -> least(m, ({_MH_A} * h + {_MH_B}) % {_MH_MOD}))"
    )
    return F.expr(
        f"if(size(hs) = 0,"
        f" transform(sequence(0, {N_MINHASH - 1}), i -> cast(null as bigint)),"
        f" aggregate(hs, {init}, {step}))"
    )


@register(
    "dedup_exact_content",
    """
SELECT md5(lower(trim(text))) AS content_hash,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
""",
)
def dedup_exact_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalize -> md5 -> groupBy hash; the minimum doc_id
    is the canonical survivor. One shuffle on the hash (uniformly
    distributed — no skew by construction)."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.md5(F.lower(F.trim("text"))).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw signature form (doc_id, minhash_sig array<bigint>, n_shingles)
    consumed by the LSH banding/containment operators. The REGISTERED
    query wraps this with a string rendering: array-typed result columns
    are not sortable by the driver's pandas canonicalizer (lexsort dies
    on `unhashable type: 'list'` — CORRECTNESS_r02), so the registered
    query surface emits only sortable scalars."""
    d = _docs_spread(spark, sf_dir).withColumn("t", tokens_col()).withColumn(
        "hs", hashed_shingles_col()
    )
    return d.select(
        "doc_id",
        minhash_sig_col().alias("minhash_sig"),
        F.size("hs").cast("bigint").alias("n_shingles"),
    )


@register(
    "dedup_minhash_signatures",
    f"""
WITH {_DUCK_HASHED_SHINGLES},
{_DUCK_MINHASH_SIG}
SELECT doc_id,
       array_to_string(list_transform(ms,
         v -> coalesce(CAST(v AS VARCHAR), 'x')), ',') AS minhash_sig_str,
       n_shingles
FROM sig
""",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures: one md5 per distinct 5-token shingle, then 16
    affine universal-hash rehashes. Map-only: nested array lambdas, no
    explode, no shuffle, one pass over the text.

    Output shape: the 16-slot signature is rendered as one
    comma-joined string column (null slots -> 'x' sentinel — both
    engines would otherwise SKIP nulls when joining, silently equating
    [1,NULL,3] with [1,3]). Arrays are kept internal (_minhash_signatures)
    because array-typed result cells are unsortable by the driver's
    pandas canonicalizer."""
    return _minhash_signatures(spark, sf_dir).select(
        "doc_id",
        F.expr(
            "concat_ws(',', transform(minhash_sig,"
            " v -> coalesce(cast(v as string), 'x')))"
        ).alias("minhash_sig_str"),
        "n_shingles",
    )


@register(
    "dedup_minhash_lsh_candidates",
    f"""
WITH {_DUCK_HASHED_SHINGLES},
{_DUCK_MINHASH_SIG},
bands AS (
  SELECT doc_id, i.i AS band_id, ms[i.i + 1] AS band_hash
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {N_MINHASH - 1})) AS i) i
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_band_matches
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_band_matches,
       ROUND(n_band_matches / {N_MINHASH}.0, 6) AS est_jaccard
FROM cand
""",
)
def dedup_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs, bucket-grouped (the scalable shape): explode
    signatures into (band_id, band_hash) buckets, collect each bucket's
    doc list, and generate pairs INSIDE the bucket — one shuffle, no
    self-join, the signature expression evaluated once (a self-join
    re-evaluates the whole minhash lambda chain on both sides — measured
    ~25x slower). Cost ~ sum(bucket^2); oversized buckets are visible
    here and cappable. Signature agreement fraction estimates Jaccard
    (r=1, b=16 → recall-heavy candidates)."""
    sig = _minhash_signatures(spark, sf_dir).select("doc_id", "minhash_sig")
    return _lsh_candidates_from(sig)


def _lsh_candidates_from(sig: DataFrame) -> DataFrame:
    """LSH banding over a prepared (doc_id, minhash_sig) frame — split
    out so pipelines that already hold the hashed shingle sets in a
    tracked cache (_near_dup_components) can derive the signatures from
    that cache instead of re-running the tokenize+md5 chain."""
    # posexplode_OUTER: plain posexplode makes Catalyst infer a
    # size(sig)>0 pre-filter that re-evaluates the whole signature
    # expression chain per row (measured 6x slower); outer + a cheap
    # null-filter afterwards evaluates it once
    bands = sig.select(
        "doc_id", F.posexplode_outer("minhash_sig").alias("band_id", "band_hash")
    ).filter(F.col("band_hash").isNotNull())
    cand = (
        bucket_pairs(bands, ["band_id", "band_hash"], "doc_id")
        .groupBy(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_band_matches"))
    )
    return cand.select(
        "doc_a",
        "doc_b",
        "n_band_matches",
        F.round(F.col("n_band_matches") / F.lit(float(N_MINHASH)), 6).alias(
            "est_jaccard"
        ),
    )


@register(
    "dedup_minhash_containment",
    f"""
WITH {_DUCK_HASHED_SHINGLES},
{_DUCK_MINHASH_SIG},
bands AS (
  SELECT doc_id, i.i AS band_id, ms[i.i + 1] AS band_hash
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {N_MINHASH - 1})) AS i) i
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
scored AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(sa.hs, sb.hs)) AS n_common,
         len(sa.hs) AS n_a, len(sb.hs) AS n_b
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, n_common,
       ROUND(n_common / n_a, 6) AS containment_a_in_b,
       ROUND(n_common / n_b, 6) AS containment_b_in_a
FROM scored
WHERE n_common / n_a >= 0.8 OR n_common / n_b >= 0.8
""",
)
def dedup_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup: containment |A∩B| / |A| — high when one
    document mostly sits INSIDE another (quotes, excerpts, wire copy)
    even when Jaccard is low because the containing doc is much larger.
    LSH candidates (bucket-grouped, never all-pairs) are verified with
    the exact shingle-set intersection; pairs where either direction
    reaches 0.8 survive.

    Scale shape: candidate generation is the shared LSH bucket join;
    verification joins each candidate to two shingle SETS (array
    intersect per pair, JVM-side) — cost ~ candidates, not corpus²."""
    sig = _minhash_signatures(spark, sf_dir).select("doc_id", "minhash_sig")
    bands = sig.select(
        "doc_id", F.posexplode_outer("minhash_sig").alias("band_id", "band_hash")
    ).filter(F.col("band_hash").isNotNull())
    cand = (
        bucket_pairs(bands, ["band_id", "band_hash"], "doc_id")
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .distinct()
    )
    hs = _docs_spread(spark, sf_dir).withColumn("t", tokens_col()).select(
        "doc_id", hashed_shingles_col().alias("hs")
    )
    a = hs.select(F.col("doc_id").alias("_da"), F.col("hs").alias("hs_a"))
    b = hs.select(F.col("doc_id").alias("_db"), F.col("hs").alias("hs_b"))
    scored = (
        cand.join(a, cand["doc_a"] == a["_da"])
        .join(b, cand["doc_b"] == b["_db"])
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("hs_a", "hs_b")).alias("n_common"),
            F.size("hs_a").alias("n_a"),
            F.size("hs_b").alias("n_b"),
        )
    )
    ca = F.col("n_common") / F.col("n_a")
    cb = F.col("n_common") / F.col("n_b")
    return scored.filter((ca >= 0.8) | (cb >= 0.8)).select(
        "doc_a",
        "doc_b",
        F.col("n_common").cast("bigint").alias("n_common"),
        F.round(ca, 6).alias("containment_a_in_b"),
        F.round(cb, 6).alias("containment_b_in_a"),
    )


# Oracle for dedup_ngram_jaccard_pairs: the EXHAUSTIVE inverted-index
# form — prefix filtering is provably lossless, so the oracle can stay
# the simple spec while the engine runs the blocked plan.
_DUCK_JACCARD_PAIRS = f"""
WITH {_DUCK_SHINGLES},
ex AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
),
sizes AS (
  SELECT doc_id, len(shingles) AS n FROM sh
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       ROUND(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
"""


def _ngram_jaccard_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive inverted-index form — every pair sharing ANY shingle is
    aggregated (worst-case ~n^2 groups on repetitive corpora). Kept ONLY
    as the small-sf cross-check for the prefix-filtered default."""
    d = _docs_spread(spark, sf_dir).withColumn("t", tokens_col()).withColumn(
        "shingles", shingles_col()
    )
    ex = d.select("doc_id", F.explode("shingles").alias("s"))
    sizes = d.select("doc_id", F.size("shingles").cast("bigint").alias("n"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb")
    j = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(j >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "n_common", F.round(j, 6).alias("jaccard"))
    )


@register("dedup_ngram_jaccard_pairs", _DUCK_JACCARD_PAIRS)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via AllPairs/PPJoin-style
    PREFIX FILTERING (Bayardo et al., WWW'07; Xiao et al., WWW'08):
    sort each document's distinct shingles under one global total order
    (lexicographic) and index only the first n - ceil(t*n) + 1 of them —
    any pair with Jaccard >= t MUST collide inside both prefixes
    (overlap >= t*max(na,nb) and size filter nb >= t*na imply the needed
    overlap exceeds what the suffixes can hold). Candidates from the
    prefix index are then verified with one array_intersect per pair.

    EXACT — provably identical to the exhaustive inverted-index join
    (the oracle runs exhaustive; tests/test_blocked_pairs.py pins
    equality) — but the index and the pair aggregation shrink by ~1/2 at
    t=0.5 (more at higher t: prefix is n(1-t)+1), and the candidate set
    is bounded by prefix collisions instead of any-shingle collisions."""
    t = JACCARD_THRESHOLD
    d = _docs_spread(spark, sf_dir).withColumn("t", tokens_col()).withColumn(
        "shingles", F.array_sort(shingles_col())
    )
    # tracked cache (query-scoped, see session.query_cache): the shingle
    # arrays feed the prefix index AND both verify sides; without the
    # materialization the tokenize+shingle chain evaluates three times
    sets = query_cache(d.select("doc_id", "shingles"))
    prefix_len = (
        f"size(shingles) - cast(ceil(size(shingles) * {t}) as int) + 1"
    )
    pref = sets.select(
        "doc_id", F.explode(F.expr(f"slice(shingles, 1, {prefix_len})")).alias("s")
    )
    # bucket-group the prefix index: pairs are generated INSIDE each
    # shingle's posting list (one shuffle on the shingle, never a
    # self-join that re-evaluates the shingle chain on both sides);
    # bucket_pairs salts ultra-common prefix shingles over the cap
    cand = (
        bucket_pairs(pref, ["s"], "doc_id")
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .distinct()
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("ha"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("hb"))
    inter = F.size(F.array_intersect("ha", "hb")).cast("bigint")
    j = inter / (F.size("ha") + F.size("hb") - inter)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_common", inter)
        .withColumn("_j", j)
        .filter(F.col("_j") >= t)
        .select("doc_a", "doc_b", "n_common", F.round("_j", 6).alias("jaccard"))
    )


_DUCK_SIMHASH = f"""
tokc AS (
  SELECT doc_id, token, COUNT(*) AS c FROM (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
    FROM documents
  ) GROUP BY 1, 2
),
h AS (
  SELECT doc_id, {_DUCK_MD5INT.format(x="token")} AS hv, c FROM tokc
),
bits AS (
  SELECT doc_id, b.b AS b,
         SUM(CASE WHEN (hv >> b.b) & 1 = 1 THEN c ELSE -c END) AS s
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS b) b
  GROUP BY 1, 2
),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT)
           AS simhash
  FROM bits GROUP BY 1
)
"""


@register(
    "dedup_simhash_signatures",
    f"WITH {_DUCK_SIMHASH} SELECT doc_id, simhash FROM sig",
)
def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document: token-frequency-weighted bit votes
    over md5-derived token hashes.

    ONE doc_id aggregate with 60 per-bit sum expressions (r15): the
    frequency-weighted vote is sum-linear, so summing +/-1 per token
    OCCURRENCE equals summing +/-c per distinct token — the old
    (doc_id, token) count and the 60-way bit explode + (doc_id, b)
    re-aggregate computed the identical integers through 3 exchanges
    and a 60x row blow-up; this form pays one map-side-combined
    exchange on doc_id (measured 3 -> 1 Exchange; 1.91 -> 1.79 s
    interleaved median at sf0.1 with bit-identical signatures — the
    md5-per-occurrence trade costs some of the local win, but the two
    removed exchanges are the part that scales, guide §2.2)."""
    d = _docs_spread(spark, sf_dir).withColumn("t", tokens_col())
    h = d.select("doc_id", F.explode("t").alias("token")).withColumn(
        "hv", F.expr(_SPARK_MD5INT.format(x="token"))
    )
    sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(hv >> {b}) & 1 = 1"), F.lit(1)).otherwise(
                    F.lit(-1)
                )
            ).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    simhash = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return sums.select("doc_id", simhash.cast("bigint").alias("simhash"))


# Oracle for dedup_simhash_near_pairs: all-pairs spec (the pigeonhole
# blocking is provably lossless, so the oracle can stay the simple form).
_DUCK_SIMHASH_PAIRS = f"""
WITH {_DUCK_SIMHASH}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


def _simhash_near_pairs_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs theta-join form — O(n^2), kept ONLY as the small-sf
    cross-check for the blocked default (tests/test_blocked_pairs.py)."""
    sig = dedup_simhash_signatures(spark, sf_dir)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.expr("bit_count(ha ^ hb)").cast("bigint"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


@register("dedup_simhash_near_pairs", _DUCK_SIMHASH_PAIRS)
def dedup_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: hamming distance <= 3 over the 60-bit
    signatures, via EXACT pigeonhole chunk-blocking: split each signature
    into 4 15-bit chunks — any pair within hamming 3 differs in at most 3
    chunks, so at least one chunk is EQUAL (pigeonhole) and the pair
    meets inside that chunk's bucket. Identical output to the all-pairs
    theta join (the oracle runs all-pairs; the blocking loses nothing),
    but the plan is explode -> bucket groupBy -> in-bucket pair
    generation -> distinct: one shuffle on (chunk_id, chunk_value), cost
    ~ sum(bucket^2), never n^2 comparisons."""
    n_chunks = SIMHASH_MAX_HAMMING + 1  # hamming <= 3 -> 4 chunks
    chunk_bits = SIMHASH_BITS // n_chunks
    sig = dedup_simhash_signatures(spark, sf_dir)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_chunks - 1}),"
                f" c -> struct(c AS chunk_id,"
                f" shiftright(simhash, c * {chunk_bits}) & {(1 << chunk_bits) - 1}"
                f" AS chunk_val))"
            )
        ).alias("ck"),
    ).select(
        "ck.chunk_id", "ck.chunk_val", F.struct("doc_id", "simhash").alias("m")
    )
    pairs = bucket_pairs(chunks, ["chunk_id", "chunk_val"], "m")
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()  # a pair can collide in several chunks
    )


# Oracle for dedup_embedding_cosine_pairs: all-pairs spec (the block
# grid merely repartitions the same pair set — provably lossless).
_DUCK_COSINE_PAIRS = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i]))
           / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
              * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, ROUND(cosine, 6) AS cosine
FROM p WHERE cosine >= {COSINE_THRESHOLD}
"""

COSINE_BLOCKS = 8  # exact all-pairs block grid; raise with corpus size

_COS_DOT = "aggregate(zip_with(va, vb, (x, y) -> x * y), 0d, (acc, x) -> acc + x)"
_COS_NA = "sqrt(aggregate(transform(va, x -> x * x), 0d, (acc, x) -> acc + x))"
_COS_NB = "sqrt(aggregate(transform(vb, x -> x * x), 0d, (acc, x) -> acc + x))"


def _embedding_cosine_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs theta-join form — kept ONLY as the small-sf cross-check
    for the block-partitioned default (tests/test_blocked_pairs.py)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.expr(f"({_COS_DOT}) / (({_COS_NA}) * ({_COS_NB}))"))
        .filter(F.col("cosine") >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )


@register("dedup_embedding_cosine_pairs", _DUCK_COSINE_PAIRS)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: EXACT cosine >= threshold over float
    vectors (cast to double; zip_with/aggregate — JVM-side, no UDF),
    restructured from a theta join into a BLOCK-PARTITIONED equi-join
    (the canonical distributed exact all-pairs shape): vectors hash into
    P blocks, the tiny P*(P+1)/2 block-pair grid broadcasts, and each
    side joins the grid on its block id so every (block_i, block_j) cell
    becomes one equi-join key. Work per task = |b_i| x |b_j| dot
    products — balanced, memory-bounded (two blocks per task), no
    broadcast-nested-loop and no single-key skew. Identical output to
    the theta join (the oracle runs all-pairs).

    O(n^2) FLOPs are inherent to exact all-pairs; this bounds shuffle
    and balances the grid. For the subquadratic path, see
    dedup_embedding_cosine_lsh_pairs (RP-LSH candidates + verify)."""
    P = COSINE_BLOCKS
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        F.pmod(F.col("vec_id"), F.lit(P)).cast("int").alias("blk"),
    )
    grid = spark.createDataFrame(
        [(i, j) for i in range(P) for j in range(i, P)], "i int, j int"
    )
    left = e.join(F.broadcast(grid), F.col("blk") == F.col("i")).select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "i", "j"
    )
    right = e.join(F.broadcast(grid), F.col("blk") == F.col("j")).select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "i", "j"
    )
    pairs = left.join(right, ["i", "j"]).filter(
        (F.col("i") < F.col("j")) | (F.col("vec_a") < F.col("vec_b"))
    )
    return (
        pairs.withColumn(
            "cosine", F.expr(f"({_COS_DOT}) / (({_COS_NA}) * ({_COS_NB}))")
        )
        .filter(F.col("cosine") >= COSINE_THRESHOLD)
        .select(
            F.least("vec_a", "vec_b").alias("vec_a"),
            F.greatest("vec_a", "vec_b").alias("vec_b"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


# Subquadratic cosine pairs: RP-LSH blocking + exact verify. Table/bit
# counts are the recall dial; 16 tables x 4 bits is sized for the loose
# test threshold (0.3 — 72 deg) where single-table recall is poor. Real
# near-dup thresholds (>= 0.9) tighten buckets dramatically.
DEDUP_RP_TABLES = 16
DEDUP_RP_BITS = 4


def adaptive_rp_bits(n_vecs: int) -> int:
    """RP-LSH bucket width for a corpus of n vectors:
    max(DEDUP_RP_BITS, ceil(log2(n/500 + 1))). Keeps E[bucket size]
    roughly constant as the corpus grows (the value-space cliff found by
    tools/scale_smoke.py); reproduces the static oracle's DEDUP_RP_BITS
    at every oracle-checked scale (n <= 2000). Pinned by
    tests/test_bucket_cap.py."""
    import math

    return max(DEDUP_RP_BITS, math.ceil(math.log2(max(n_vecs, 1) / 500 + 1)))


@register(
    "dedup_embedding_cosine_lsh_pairs",
    f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
{duck_rp_planes_sql(DEDUP_RP_TABLES * DEDUP_RP_BITS, DEDUP_RP_BITS).strip()},
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sigs a JOIN sigs b
    ON a.table_id = b.table_id AND a.bucket = b.bucket
   AND a.vec_id < b.vec_id
),
scored AS (
  SELECT vec_a, vec_b,
         list_sum(list_transform(generate_series(1, 64), i -> ea.v[i] * eb.v[i]))
           / (sqrt(list_sum(list_transform(ea.v, x -> x * x)))
              * sqrt(list_sum(list_transform(eb.v, x -> x * x)))) AS cosine
  FROM cand
  JOIN e ea ON ea.vec_id = cand.vec_a
  JOIN e eb ON eb.vec_id = cand.vec_b
)
SELECT vec_a, vec_b, ROUND(cosine, 6) AS cosine
FROM scored WHERE cosine >= {COSINE_THRESHOLD}
""",
)
def dedup_embedding_cosine_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBQUADRATIC embedding near-dup pairs — the 100 TB default:
    banded random-hyperplane LSH blocks the corpus (16 tables x 4 sign
    bits, deterministic md5 planes), candidate pairs are generated
    INSIDE each (table, bucket) via bucket-grouping (one shuffle, cost ~
    sum(bucket^2)), then EXACT cosine verifies candidates only. The
    oracle runs the identical plane/bucket math, so both engines see the
    same candidate set bit-for-bit (the dedup_duplicate_clusters
    pattern). Recall vs the exact all-pairs form is pinned in
    tests/test_blocked_pairs.py; precision is 1.0 by construction
    (every emitted pair passed exact verification)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # Adaptive bucket width — the scale dial bucket CAPS cannot provide:
    # fixed 4-bit buckets have 16 values per table, so beyond a few
    # thousand vectors E[bucket] ~ n/16 and candidate volume grows as
    # n^2/16 REGARDLESS of content (a 200k-vector corpus shut down a 24g
    # JVM — found by the scale smoke, the same value-space cliff as the
    # 32-bit SimHash chunks). bits = max(4, ceil(log2(n / 500))) keeps
    # E[bucket] roughly constant; extra bits only lose recall on
    # LOW-similarity pairs (p_collision/bit = 1 - theta/pi), while true
    # near-dups (cosine -> 1) collide at any width. At every
    # oracle-checked scale (n <= 2000 for sf <= 0.1) the rule yields
    # exactly DEDUP_RP_BITS, so the static DuckDB twin stays
    # bit-identical; the one count() action here is query-construction
    # cost, same contract as window_ntile.
    bits = adaptive_rp_bits(e.count())
    planes = rp_planes_df(spark, DEDUP_RP_TABLES * bits, bits)
    sigs = rp_sigs(e, planes, bits)
    cand = (
        bucket_pairs(sigs, ["table_id", "bucket"], "vec_id")
        .select(F.col("a").alias("vec_a"), F.col("b").alias("vec_b"))
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cosine", F.expr(f"({_COS_DOT}) / (({_COS_NA}) * ({_COS_NB}))"))
        .filter(F.col("cosine") >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Duplicate clusters: connected components over the near-dup pair graph
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame,
    node_col_a: str,
    node_col_b: str,
    *,
    max_iter: int = 20,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components. Returns (node, component) where component =
    min node id in the component.

    Strategy switch (same spirit as broadcast-vs-shuffle joins): the
    near-dup edge set is a tiny fraction of the corpus, so when it fits
    the driver (< driver_threshold edges) a local union-find answers in
    one collect — no iterative jobs at all. Larger graphs run the
    distributed ALTERNATING LARGE-STAR/SMALL-STAR kernel
    (:func:`_star_components` — O(log n) rounds on any graph shape,
    including the chain-shaped components contamination graphs
    produce). Both paths produce identical output, including
    self-loop-only nodes (labeled with themselves)."""
    # one materialization of the (expensive: LSH + verify lineage) edge
    # set serves the size probe AND the chosen algorithm
    edges = edges.cache()
    n_edges_est = edges.limit(driver_threshold).count()
    if n_edges_est < driver_threshold:
        rows = edges.select(node_col_a, node_col_b).collect()
        edges.unpersist()
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in rows:
            a, b = r[0], r[1]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN so the root IS the component id
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        out = [(n, find(n)) for n in parent]
        spark = edges.sparkSession
        schema = edges.select(
            F.col(node_col_a).alias("node"), F.col(node_col_a).alias("component")
        ).schema
        return spark.createDataFrame(out, schema)

    oriented = (
        edges.select(
            F.greatest(node_col_a, node_col_b).alias("a"),
            F.least(node_col_a, node_col_b).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    labels, _rounds = _star_components(oriented, max_iter=max_iter)
    # self-loop-only nodes never enter the star kernel (their edges
    # carry no connectivity) but the driver union-find path labels
    # them — keep the two paths' node sets identical
    selfloop_only = (
        edges.filter(F.col(node_col_a) == F.col(node_col_b))
        .select(F.col(node_col_a).alias("node"))
        .distinct()
        .join(labels.select("node"), "node", "left_anti")
    )
    labels = labels.unionByName(
        selfloop_only.select("node", F.col("node").alias("component"))
    )
    edges.unpersist()
    return labels


def _star_components(
    oriented: DataFrame, *, max_iter: int = 20
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star connected components (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    the distributed kernel behind :func:`connected_components`.

    Input: DISTINCT edges oriented high->low (a > b, no self-loops).
    Returns ((node, component=min id in component), rounds used).

    Why not plain min-label propagation: its round count is the graph
    DIAMETER — a chain-shaped component (common in contamination
    graphs, where doc A overlaps B overlaps C ...) makes it O(n)
    rounds. Each star round instead rewires every node toward the
    minimum of its neighborhood, halving component height: O(log n)
    rounds on any shape (pinned on a 512-chain in
    tests/test_dedup.py — 80x fewer rounds than the diameter).

    Each round is two join+groupBy passes over the CURRENT edge set,
    which only ever shrinks toward one star edge per non-root node —
    per-round cost is bounded by the input edge count, parallelism is
    sized to the graph, and nothing is ever collected to the driver.

      large-star: u's strictly-larger neighbors connect to
                  m = min(neighbors(u) + u)
      small-star: u's smaller-or-equal neighbors AND u connect to
                  m = min of them

    At the fixed point the edge set IS the component star (v -> root
    min); roots are the nodes appearing only on the low side."""
    spark = oriented.sparkSession
    n_edges = oriented.count()
    # size the loop's parallelism to the GRAPH (near-dup graphs are a
    # tiny fraction of the corpus): iterating tiny data over the full
    # shuffle width pays pure task overhead per round
    parts = min(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
        max(4, n_edges // 500_000 + 1),
    )
    # localCheckpoint (not cache) after every round: each round's edge
    # set is built from the previous one, and an unpersisted parent
    # invalidates the child's cached plan — the lineage (and per-round
    # cost) then grows with the round number. Checkpointing truncates
    # the lineage so every round costs the same (the hierarchy walk's
    # doubling loop pins the identical idiom, hierarchy.py).
    cur = oriented.repartition(parts, "a").localCheckpoint(eager=True)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star over the symmetrized neighborhood
        sym = cur.unionAll(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        lmins = (
            sym.groupBy("a")
            .agg(F.min("b").alias("mn"))
            .select("a", F.least("mn", F.col("a")).alias("m"))
        )
        large = (
            sym.join(lmins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .repartition(parts, "a")
        )
        # small-star over the (already high->low) direct edges
        smins = large.groupBy("a").agg(F.min("b").alias("m"))
        nxt = (
            large.join(smins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionAll(smins.select("a", F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .repartition(parts, "a")
            .localCheckpoint(eager=True)
        )
        n_nxt = nxt.count()
        unchanged = (
            n_nxt == n_edges and nxt.exceptAll(cur).limit(1).count() == 0
        )
        cur, n_edges = nxt, n_nxt
        if unchanged:
            break
    else:
        raise ValueError(f"components did not converge in {max_iter} rounds")
    # star edges -> labels; roots label themselves
    roots = cur.select(F.col("b").alias("node")).distinct().join(
        cur.select(F.col("a").alias("node")).distinct(), "node", "left_anti"
    )
    labels = cur.select(
        F.col("a").alias("node"), F.col("b").alias("component")
    ).unionAll(roots.select("node", F.col("node").alias("component")))
    return labels, rounds


@register(
    "dedup_duplicate_clusters",
    f"""
WITH RECURSIVE {_DUCK_HASHED_SHINGLES},
{_DUCK_MINHASH_SIG},
bands AS (
  SELECT doc_id, i.i AS band_id, ms[i.i + 1] AS band_hash
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {N_MINHASH - 1})) AS i) i
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.doc_a
  JOIN sh sb ON sb.doc_id = cand.doc_b
  WHERE len(list_intersect(sa.hs, sb.hs))
        / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))
        >= {JACCARD_THRESHOLD}
),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a AS node, a AS r FROM und
  UNION
  SELECT e.a, reach.r FROM und e JOIN reach ON reach.node = e.b
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY 1)
SELECT component AS cluster_id,
       COUNT(*) AS n_docs,
       CAST(MIN(node) AS BIGINT) AS min_doc,
       CAST(MAX(node) AS BIGINT) AS max_doc
FROM comp GROUP BY 1
""",
)
def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS — the full production dedup pipeline: MinHash
    LSH candidates -> exact Jaccard verification ON CANDIDATES ONLY
    (array_intersect of the hashed shingle sets, never an n^2 or
    inverted-index pair join) -> connected components -> one row per
    cluster (canonical = min doc_id). ~5x faster than verifying via the
    exhaustive shingle join, identical results (r=1/b=16 LSH miss
    probability at j>=0.5 is (1-j)^16 <= 2^-16 per pair; the oracle runs
    the SAME minhash math, so both engines see the same candidate set
    bit-for-bit). The oracle recomputes components with a recursive
    reachability CTE."""
    comp = _near_dup_components(spark, sf_dir)
    return comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("node").cast("bigint").alias("min_doc"),
        F.max("node").cast("bigint").alias("max_doc"),
    )


def _near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, component) membership of the verified near-dup graph —
    shared tail of the cluster pipeline (LSH candidates -> exact Jaccard
    verify -> connected components); component = min doc_id."""
    docs = _docs_spread(spark, sf_dir).withColumn("t", tokens_col()).withColumn(
        "hs", hashed_shingles_col()
    )
    # tracked cache (query-scoped, see session.query_cache): the hashed
    # shingle sets feed BOTH verify-join sides AND the minhash fold below
    # — without it the tokenize+md5 shingle chain (the family's dominant
    # per-row cost) is evaluated three times
    sets = query_cache(docs.select("doc_id", "hs"))
    # minhash_sig_col folds over the cached `hs` only, so the LSH
    # candidate branch never re-reads the text
    sig = sets.select("doc_id", minhash_sig_col().alias("minhash_sig"))
    cand = _lsh_candidates_from(sig).select("doc_a", "doc_b")
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"))
    inter = F.size(F.array_intersect("ha", "hb"))
    jac = inter / (F.size("ha") + F.size("hb") - inter)
    pairs = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    return connected_components(pairs, "doc_a", "doc_b")


@register(
    "dedup_cluster_survivor_stats",
    _DUCK_NEAR_DUP_COMP
    + """
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN c.component IS NULL OR c.component = d.doc_id
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN c.component IS NOT NULL AND c.component <> d.doc_id
                THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN c.component IS NOT NULL AND c.component <> d.doc_id
                THEN d.n_chars ELSE 0 END) AS BIGINT) AS chars_dropped
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
GROUP BY 1
""",
)
def dedup_cluster_survivor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup survivor accounting — the per-provider shrinkage report
    after the full cluster pipeline: every document outside the near-dup
    graph survives; inside a cluster only the min-doc_id member does.
    Complements dedup_survivor_stats (exact-content grain) at semantic
    grain. The components table is a tiny fraction of the corpus, so the
    docs LEFT JOIN broadcasts it at any scale."""
    comp = _near_dup_components(spark, sf_dir)
    d = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    # components are a tiny fraction of the corpus in practice but
    # corpus-sized in the worst case (everything near-duplicated):
    # un-hinted, AQE sizes the actual label table at runtime
    j = d.join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
    kept = F.col("component").isNull() | (F.col("component") == F.col("doc_id"))
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(~kept, 1).otherwise(0)).cast("bigint").alias("n_dropped"),
        F.sum(F.when(~kept, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("chars_dropped"),
    )


@register(
    "dedup_lsh_bucket_stats",
    f"""
WITH {_DUCK_HASHED_SHINGLES},
{_DUCK_MINHASH_SIG},
bands AS (
  SELECT doc_id, i.i AS band_id, ms[i.i + 1] AS band_hash
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {N_MINHASH - 1})) AS i) i
  WHERE ms[i.i + 1] IS NOT NULL
),
b AS (SELECT band_id, band_hash, COUNT(*) AS n FROM bands GROUP BY 1, 2)
SELECT band_id,
       COUNT(*) AS n_buckets,
       CAST(MAX(n) AS BIGINT) AS max_bucket,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
       CAST(SUM((n * (n - 1)) // 2) AS BIGINT) AS candidate_pairs
FROM b
GROUP BY 1
""",
)
def dedup_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-size OBSERVABILITY — the monitoring a capped pair
    generator needs (no silent caps: bucket_pairs splits oversized
    buckets, and this query is how you SEE them): per band, the bucket
    count, the largest bucket, singleton count, and the exact candidate-
    pair workload Σ n(n-1)/2 the band contributes. Watching max_bucket
    against BUCKET_PAIR_CAP tells you when a corpus has degenerate
    near-dup classes and what the candidate volume will cost before
    running the pair join. One aggregation over the banded signatures —
    map-side combined, no pair materialization at all."""
    sig = _minhash_signatures(spark, sf_dir).select("doc_id", "minhash_sig")
    bands = sig.select(
        "doc_id", F.posexplode_outer("minhash_sig").alias("band_id", "band_hash")
    ).filter(F.col("band_hash").isNotNull())
    b = bands.groupBy(
        F.col("band_id").cast("bigint").alias("band_id"), "band_hash"
    ).agg(F.count(F.lit(1)).alias("n"))
    return b.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").cast("bigint").alias("max_bucket"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_singletons"),
        F.sum(F.expr("n * (n - 1) div 2")).cast("bigint").alias("candidate_pairs"),
    )


@register(
    "dedup_minhash_jaccard_error",
    f"""
WITH {_DUCK_HASHED_SHINGLES},
{_DUCK_MINHASH_SIG},
bands AS (
  SELECT doc_id, i.i AS band_id, ms[i.i + 1] AS band_hash
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {N_MINHASH - 1})) AS i) i
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_band_matches
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
j AS (
  SELECT c.doc_a, c.doc_b, c.n_band_matches,
         c.n_band_matches / {N_MINHASH}.0 AS est,
         len(list_intersect(sa.hs, sb.hs))
           / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))
           AS tj
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, n_band_matches,
       ROUND(est, 6) AS est_jaccard,
       ROUND(tj, 6) AS true_jaccard,
       ROUND(abs(est - tj), 6) AS abs_error
FROM j
""",
)
def dedup_minhash_jaccard_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator-quality report: for every LSH candidate pair,
    the signature-estimated Jaccard (matching slots / 16) next to the
    EXACT shingle Jaccard and the absolute error — the evaluation a
    pipeline owner runs before trusting a signature width / band
    configuration on a new corpus (E[error] ~ 1/sqrt(k); k=16 is
    recall-tuned, and this query shows what that costs in precision).

    Scale shape: candidates come from the capped bucket-grouped LSH
    generator (never all-pairs); the exact-Jaccard verify joins shingle
    sets for CANDIDATE pairs only — the same verify-on-candidates cost
    profile as the production cluster pipeline. Both engines compute
    est and true from identical integers, so the doubles (and the
    rounded error) are bit-equal."""
    cand = dedup_minhash_lsh_candidates(spark, sf_dir).select(
        "doc_a", "doc_b", "n_band_matches"
    )
    hs = (
        _docs_spread(spark, sf_dir)
        .withColumn("t", tokens_col())
        .select("doc_id", hashed_shingles_col().alias("hs"))
    )
    a = hs.select(F.col("doc_id").alias("_ida"), F.col("hs").alias("_hsa"))
    b = hs.select(F.col("doc_id").alias("_idb"), F.col("hs").alias("_hsb"))
    j = (
        cand.join(a, F.col("doc_a") == F.col("_ida"))
        .join(b, F.col("doc_b") == F.col("_idb"))
        .withColumn("_i", F.size(F.array_intersect("_hsa", "_hsb")))
        .withColumn(
            "_tj",
            F.col("_i") / (F.size("_hsa") + F.size("_hsb") - F.col("_i")),
        )
        .withColumn("_est", F.col("n_band_matches") / F.lit(float(N_MINHASH)))
    )
    return j.select(
        "doc_a",
        "doc_b",
        "n_band_matches",
        F.round("_est", 6).alias("est_jaccard"),
        F.round("_tj", 6).alias("true_jaccard"),
        F.round(F.abs(F.col("_est") - F.col("_tj")), 6).alias("abs_error"),
    )


@register(
    "dedup_cluster_size_histogram",
    _DUCK_NEAR_DUP_COMP
    + """
SELECT cluster_size, COUNT(*) AS n_clusters
FROM (
  SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY 1
) s
GROUP BY 1
""",
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution: how many verified duplicate
    clusters have 2 members, 3 members, ... — the observability report
    that distinguishes a corpus with scattered pair-dups from one with
    a few mega-clusters (mega-clusters mean template/boilerplate
    content, and they are what degrades LSH bucket bounds — this
    histogram is the early-warning for the bucket caps).

    Reuses the shared verified-components tail (LSH candidates → exact
    Jaccard verify → connected components); the two counting
    aggregations run over the component table, a tiny fraction of the
    corpus — cost is the pipeline itself, the histogram is free."""
    comp = _near_dup_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )


@register(
    "sample_leakage_safe_split",
    _DUCK_NEAR_DUP_COMP
    + f"""
, base AS (
  SELECT d.doc_id, d.n_chars, COALESCE(c.component, d.doc_id) AS canon
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
)
SELECT CASE WHEN {_DUCK_MD5INT.format(x="canon::VARCHAR")} % 10000 < 8000 THEN 'train'
            WHEN {_DUCK_MD5INT.format(x="canon::VARCHAR")} % 10000 < 9000 THEN 'validation'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT canon) AS n_groups,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM base
GROUP BY 1
""",
)
def sample_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-safe train/validation/test split: the split key is
    the NEAR-DUP CLUSTER canonical (component min doc_id; singletons are
    their own canonical), not the document — so two near-duplicate
    documents can never land on opposite sides of the train/eval fence.
    Plain per-doc hash splits leak: a mutated copy of a training
    document in the test set inflates eval scores; splitting at cluster
    grain is the standard fix (tests pin that the naive doc-hash split
    DOES straddle clusters on this corpus while this one cannot).

    80/10/10 by md5(canonical) — deterministic across runs and engines,
    same bucket idiom as sample_split_assign. Cost: the cluster
    pipeline (LSH -> verify-on-candidates -> components) + one
    broadcast-sized membership join + one aggregation; at corpus scale
    the cluster membership table is a tiny fraction of the corpus."""
    comp = _near_dup_components(spark, sf_dir)
    d = _docs(spark, sf_dir)
    base = (
        d.select("doc_id", "n_chars")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .withColumn("canon", F.coalesce("component", "doc_id"))
    )
    bk = F.expr(_SPARK_MD5INT.format(x="cast(canon as string)") + " % 10000")
    split = (
        F.when(bk < 8000, "train").when(bk < 9000, "validation").otherwise("test")
    )
    return base.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("canon").alias("n_groups"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


# -- incremental dedup: new batch vs existing corpus -------------------------

# Deterministic batch split for the registered query: ~10% of documents
# play the "newly arrived" batch, the rest the already-deduplicated
# corpus. Same md5-bucket idiom as sample_split_assign so both engines
# agree exactly.
INCREMENTAL_NEW_PCT = 10


@register(
    "dedup_incremental_new_docs",
    f"""
WITH {_DUCK_HASHED_SHINGLES},
{_DUCK_MINHASH_SIG},
split AS (
  SELECT doc_id,
         {_DUCK_MD5INT.format(x="doc_id::VARCHAR")} % 100 AS bk
  FROM documents
),
newdocs AS (SELECT doc_id FROM split WHERE bk >= {100 - INCREMENTAL_NEW_PCT}),
corpus AS (SELECT doc_id FROM split WHERE bk < {100 - INCREMENTAL_NEW_PCT}),
chash AS (
  SELECT doc_id, md5(lower(trim(text))) AS ch FROM documents
),
exact_m AS (
  SELECT n.doc_id, MIN(c.doc_id) AS exact_match
  FROM chash n
  JOIN newdocs nd ON n.doc_id = nd.doc_id
  JOIN chash c ON c.ch = n.ch
  JOIN corpus co ON c.doc_id = co.doc_id
  GROUP BY 1
),
bands AS (
  SELECT doc_id, i.i AS band_id, ms[i.i + 1] AS band_hash
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {N_MINHASH - 1})) AS i) i
),
cand AS (
  SELECT DISTINCT nb.doc_id AS new_doc, cb.doc_id AS corpus_doc
  FROM bands nb
  JOIN newdocs nd ON nb.doc_id = nd.doc_id
  JOIN bands cb ON cb.band_id = nb.band_id AND cb.band_hash = nb.band_hash
  JOIN corpus co ON cb.doc_id = co.doc_id
),
ver AS (
  SELECT cand.new_doc, MIN(cand.corpus_doc) AS near_match
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.new_doc
  JOIN sh sb ON sb.doc_id = cand.corpus_doc
  WHERE len(list_intersect(sa.hs, sb.hs))
        / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))
        >= {JACCARD_THRESHOLD}
  GROUP BY 1
),
nc AS (
  SELECT new_doc, COUNT(*) AS n_lsh_candidates FROM cand GROUP BY 1
)
SELECT nd.doc_id,
       CASE WHEN e.exact_match IS NOT NULL THEN 'exact_dup'
            WHEN v.near_match IS NOT NULL THEN 'near_dup'
            ELSE 'unique' END AS verdict,
       coalesce(e.exact_match, v.near_match) AS matched_doc_id,
       coalesce(nc.n_lsh_candidates, 0) AS n_lsh_candidates
FROM newdocs nd
LEFT JOIN exact_m e ON e.doc_id = nd.doc_id
LEFT JOIN ver v ON v.new_doc = nd.doc_id
LEFT JOIN nc ON nc.new_doc = nd.doc_id
""",
)
def dedup_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup: classify a newly-arrived batch against an
    already-deduplicated corpus WITHOUT re-pairing the corpus with
    itself — the production shape for a training pipeline that ingests
    continuously (a full-corpus re-dedup per increment is O(corpus) per
    batch; this is O(batch + matched buckets)).

    Tiers, cheapest first:
      1. exact: md5(normalized text) of the new batch equi-joined
         against the corpus content-hash store.
      2. near: the new batch's MinHash LSH bands equi-joined against
         the corpus BAND STORE on (band_id, band_hash) — only buckets a
         new document actually lands in are touched — then candidates
         verified with exact shingle-set Jaccard >= t. Never
         new-batch x corpus.
    Verdict precedence: exact_dup > near_dup > unique; the canonical
    match is the smallest qualifying corpus doc_id.

    Scale shape: at 100 TB the corpus content-hash and band tables are
    PERSISTED stores (written once by the batch dedup pass, e.g.
    bucketed by band_hash); an increment computes signatures for the
    new batch only — map-side — and its band join shuffles only the new
    bands into the store's bucketing. Here both sides derive from the
    same `documents` table with a deterministic md5 split
    (INCREMENTAL_NEW_PCT = ~10% "new") so the DuckDB oracle can mirror
    the split exactly. Candidate verification joins shingle SETS per
    candidate pair (array_intersect, JVM-side) — cost ~ candidates,
    not batch x corpus.
    """
    d = _docs_spread(spark, sf_dir)  # doc_signatures is the heavy chain
    bk = F.expr(_SPARK_MD5INT.format(x="cast(doc_id as string)") + " % 100")
    base = doc_signatures(d).withColumn(
        "is_new", bk >= F.lit(100 - INCREMENTAL_NEW_PCT)
    )
    return classify_new_vs_corpus(
        base.filter("is_new").drop("is_new"),
        base.filter(~F.col("is_new")).drop("is_new"),
    )


def doc_signatures(docs: DataFrame) -> DataFrame:
    """The dedup signature bundle for a document table: (doc_id, ms
    minhash signature, hs shingle-hash set, ch content hash). Map-only;
    this is the row layout of a persisted corpus SIGNATURE STORE."""
    return (
        docs.withColumn("t", tokens_col())
        .withColumn("hs", hashed_shingles_col())
        .select(
            "doc_id",
            minhash_sig_col().alias("ms"),
            "hs",
            F.md5(F.lower(F.trim("text"))).alias("ch"),
        )
    )


def classify_new_vs_corpus(newdocs: DataFrame, corpus: DataFrame) -> DataFrame:
    """Classify a signature batch against a corpus signature store (both
    in the `doc_signatures` layout) — the shared core of the batch
    `dedup_incremental_new_docs` query and the streaming pipeline
    (streaming/dedup_stream.py). Returns one row per new doc:
    (doc_id, verdict, matched_doc_id, n_lsh_candidates)."""
    # tier 1: exact content-hash match against the corpus store
    exact_m = (
        newdocs.select("doc_id", "ch")
        .join(
            corpus.select(F.col("doc_id").alias("_cid"), F.col("ch").alias("_cch")),
            F.col("ch") == F.col("_cch"),
        )
        .groupBy("doc_id")
        .agg(F.min("_cid").alias("exact_match"))
    )

    # tier 2: new-batch bands against the corpus band store. The new
    # side is the SMALL side at scale; posexplode_outer + null-filter
    # keeps the signature chain evaluated once (see lsh_candidates).
    def _bands(df: DataFrame, id_alias: str) -> DataFrame:
        return (
            df.select(
                F.col("doc_id").alias(id_alias),
                F.posexplode_outer("ms").alias("band_id", "band_hash"),
            ).filter(F.col("band_hash").isNotNull())
        )

    cand = (
        _bands(newdocs, "new_doc")
        .join(_bands(corpus, "corpus_doc"), ["band_id", "band_hash"])
        .select("new_doc", "corpus_doc")
        .distinct()
    )

    sh_new = newdocs.select(F.col("doc_id").alias("_na"), F.col("hs").alias("hs_a"))
    sh_cor = corpus.select(F.col("doc_id").alias("_ca"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    jac = inter / (F.size("hs_a") + F.size("hs_b") - inter)
    ver = (
        cand.join(sh_new, cand["new_doc"] == sh_new["_na"])
        .join(sh_cor, cand["corpus_doc"] == sh_cor["_ca"])
        .filter(jac >= F.lit(JACCARD_THRESHOLD))
        .groupBy("new_doc")
        .agg(F.min("corpus_doc").alias("near_match"))
    )
    nc = cand.groupBy("new_doc").agg(
        F.count(F.lit(1)).alias("n_lsh_candidates")
    )

    out = (
        newdocs.select("doc_id")
        .join(exact_m, "doc_id", "left")
        .join(ver.withColumnRenamed("new_doc", "doc_id"), "doc_id", "left")
        .join(nc.withColumnRenamed("new_doc", "doc_id"), "doc_id", "left")
    )
    verdict = (
        F.when(F.col("exact_match").isNotNull(), "exact_dup")
        .when(F.col("near_match").isNotNull(), "near_dup")
        .otherwise("unique")
    )
    return out.select(
        "doc_id",
        verdict.alias("verdict"),
        F.coalesce("exact_match", "near_match").alias("matched_doc_id"),
        F.coalesce("n_lsh_candidates", F.lit(0)).cast("bigint").alias(
            "n_lsh_candidates"
        ),
    )


@register(
    "dedup_token_budget_by_source",
    _DUCK_NEAR_DUP_COMP
    + """
, tokd AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\\s+')) AS n_tok
  FROM documents
),
base AS (
  SELECT t.doc_id, t.source, t.n_tok,
         COALESCE(c.component, t.doc_id) AS canon
  FROM tokd t LEFT JOIN comp c ON c.node = t.doc_id
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS raw_tokens,
       CAST(SUM(CASE WHEN doc_id = canon OR doc_id NOT IN
                     (SELECT node FROM comp) THEN n_tok ELSE 0 END) AS BIGINT)
         AS effective_tokens,
       ROUND(SUM(CASE WHEN doc_id = canon OR doc_id NOT IN
                      (SELECT node FROM comp) THEN n_tok ELSE 0 END)
             * 1.0 / SUM(n_tok), 6) AS survival_frac
FROM base
GROUP BY 1
""",
)
def dedup_token_budget_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware TOKEN BUDGET: per source, the raw token count vs the
    EFFECTIVE tokens that survive near-dup dedup (cluster canonicals +
    unclustered docs) — the number that actually matters when a corpus
    is budgeted in training tokens: a source whose survival fraction is
    0.6 delivers 40% fewer tokens than its raw size claims.

    Survivor rule matches dedup_duplicate_clusters' canonical election
    (component min doc_id); docs outside any cluster survive as
    themselves. Cost: the shared cluster pipeline + one membership join
    + one groupBy — the cluster table is corpus-fraction-sized."""
    comp = _near_dup_components(spark, sf_dir)
    tokd = (
        _docs_spread(spark, sf_dir)
        .withColumn("t", tokens_col())
        .select("doc_id", "source", F.size("t").alias("n_tok"))
    )
    base = tokd.join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).withColumn("canon", F.coalesce("component", "doc_id"))
    survives = F.col("component").isNull() | (F.col("doc_id") == F.col("canon"))
    eff = F.sum(F.when(survives, F.col("n_tok")).otherwise(0))
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("raw_tokens"),
        eff.cast("bigint").alias("effective_tokens"),
        F.round(eff * 1.0 / F.sum("n_tok"), 6).alias("survival_frac"),
    )


# ---------------------------------------------------------------------------
# LSH index-quality evaluation: candidate recall vs exact pairs
# ---------------------------------------------------------------------------

_LSH_RECALL_ORACLE = """
WITH truth AS ({truth_sql}),
cand AS ({cand_sql}),
banded AS (
  SELECT t.doc_a, t.doc_b,
         CASE WHEN t.jaccard < 0.7 THEN '0.50-0.70'
              WHEN t.jaccard < 0.9 THEN '0.70-0.90'
              ELSE '0.90-1.00' END AS jaccard_band,
         CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS caught
  FROM truth t
  LEFT JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
)
SELECT jaccard_band,
       COUNT(*) AS n_truth_pairs,
       CAST(SUM(caught) AS BIGINT) AS n_caught,
       ROUND(SUM(caught) * 1.0 / COUNT(*), 6) AS recall
FROM banded
GROUP BY 1
"""


def _register_lsh_pair_recall() -> None:
    """Registered via a function so the oracle SPLICES the two member
    queries' registered oracle texts (the same never-drifts device as
    sim_ann_recall_eval): truth is WHATEVER dedup_ngram_jaccard_pairs
    returns, candidates are WHATEVER dedup_minhash_lsh_candidates
    returns."""
    from ibis_olap_aggregation_spark.queries import ORACLES

    oracle = _LSH_RECALL_ORACLE.format(
        truth_sql=ORACLES["dedup_ngram_jaccard_pairs"].strip(),
        cand_sql=ORACLES["dedup_minhash_lsh_candidates"].strip(),
    )

    @register("dedup_lsh_pair_recall", oracle)
    def dedup_lsh_pair_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The (bands, rows) TUNING CURVE of the MinHash LSH index:
        recall of the LSH candidate pairs against the exact
        Jaccard >= 0.5 truth pairs, reported per similarity band —
        LSH recall rises steeply with similarity, so the per-band
        shape (not one scalar) is what decides whether the banding
        catches the pairs a dedup actually cares about. The dedup twin
        of sim_ann_recall_eval.

        Scale shape: truth is the expensive side (the prefix-filtered
        exact pair join this query exists to eventually REPLACE with
        LSH at full scale); the eval itself is one per-pair equi
        left-join + a 3-row aggregate."""
        from ibis_olap_aggregation_spark.queries import QUERIES

        truth = QUERIES["dedup_ngram_jaccard_pairs"](spark, sf_dir).select(
            "doc_a", "doc_b", "jaccard"
        )
        cand = QUERIES["dedup_minhash_lsh_candidates"](spark, sf_dir).select(
            F.col("doc_a").alias("_ca"), F.col("doc_b").alias("_cb")
        )
        banded = truth.join(
            cand,
            (truth["doc_a"] == cand["_ca"]) & (truth["doc_b"] == cand["_cb"]),
            "left",
        ).select(
            F.when(F.col("jaccard") < 0.7, "0.50-0.70")
            .when(F.col("jaccard") < 0.9, "0.70-0.90")
            .otherwise("0.90-1.00")
            .alias("jaccard_band"),
            F.when(F.col("_ca").isNotNull(), 1).otherwise(0).alias("caught"),
        )
        return banded.groupBy("jaccard_band").agg(
            F.count(F.lit(1)).alias("n_truth_pairs"),
            F.sum("caught").cast("bigint").alias("n_caught"),
            F.round(F.sum("caught") * 1.0 / F.count(F.lit(1)), 6).alias(
                "recall"
            ),
        )


_register_lsh_pair_recall()


_BBIT = 4  # b = 2 bits per slot -> accidental-collision prob C = 1/4


@register(
    "dedup_minhash_bbit_error",
    f"""
WITH {_DUCK_HASHED_SHINGLES},
{_DUCK_MINHASH_SIG},
bands AS (
  SELECT doc_id, i.i AS band_id, ms[i.i + 1] AS band_hash
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {N_MINHASH - 1})) AS i) i
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_band_matches
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
bb AS (
  SELECT c.doc_a, c.doc_b, c.n_band_matches,
         len(list_filter(generate_series(1, {N_MINHASH}),
                         i -> (sa.ms[i] % {_BBIT}) = (sb.ms[i] % {_BBIT})))
           AS bbit_matches,
         len(list_intersect(ha.hs, hb.hs))
           / (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))
           AS tj
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b
  JOIN sh ha ON ha.doc_id = c.doc_a
  JOIN sh hb ON hb.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       CAST(bbit_matches AS BIGINT) AS bbit_matches,
       ROUND((bbit_matches / {N_MINHASH}.0 - 0.25) / 0.75, 6) AS est_jaccard_bbit,
       ROUND(n_band_matches / {N_MINHASH}.0, 6) AS est_jaccard_full,
       ROUND(tj, 6) AS true_jaccard,
       ROUND(abs((bbit_matches / {N_MINHASH}.0 - 0.25) / 0.75 - tj), 6)
         AS abs_error_bbit,
       ROUND(abs(n_band_matches / {N_MINHASH}.0 - tj), 6) AS abs_error_full
FROM bb
""",
)
def dedup_minhash_bbit_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b-bit minhash estimator report (Li & Koenig 2010): keep only the
    low b=2 bits of each of the 16 minhash slots (4 bytes/doc instead of
    128) and correct the collision rate for accidental matches —
    E[rate] = C + (1-C)*J with C = 1/2^b, so J_hat = (rate - 1/4)/(3/4).
    For every LSH candidate pair: the b-bit estimate, the full-width
    estimate, and the exact shingle Jaccard — quantifying what 32x
    signature compression costs in precision (the dedup twin of the
    PQ/int8 compression evals in the similarity family).

    Scale shape: candidates come from the capped bucket-grouped LSH
    generator (never all-pairs); masks are per-row integer ops; the
    exact-Jaccard verify joins shingle sets for CANDIDATE pairs only.
    All estimates derive from identical small-integer counts, so the
    doubles are bit-equal across engines. The estimate can be negative
    for rate < 1/4 (an unbiased estimator's tail, reported raw — a
    clamp would hide the variance this query exists to measure)."""
    cand = dedup_minhash_lsh_candidates(spark, sf_dir).select(
        "doc_a", "doc_b", "n_band_matches"
    )
    # the tokenize -> shingle -> md5 -> 16-way minhash chain is the
    # dominant per-doc cost and this frame is referenced on BOTH join
    # sides — tracked query-scoped cache (released by the registry on
    # the next top-level query)
    base = query_cache(
        _docs_spread(spark, sf_dir)
        .withColumn("t", tokens_col())
        .select("doc_id", hashed_shingles_col().alias("hs"))
        .withColumn("ms", minhash_sig_col())
    )
    a = base.select(
        F.col("doc_id").alias("_ida"), F.col("hs").alias("_hsa"), F.col("ms").alias("_msa")
    )
    b = base.select(
        F.col("doc_id").alias("_idb"), F.col("hs").alias("_hsb"), F.col("ms").alias("_msb")
    )
    n = F.lit(float(N_MINHASH))
    j = (
        cand.join(a, F.col("doc_a") == F.col("_ida"))
        .join(b, F.col("doc_b") == F.col("_idb"))
        .withColumn(
            "bbit_matches",
            F.expr(
                f"aggregate(zip_with(_msa, _msb,"
                f" (x, y) -> if(x % {_BBIT} = y % {_BBIT}, 1, 0)),"
                " 0, (acc, v) -> acc + v)"
            ).cast("bigint"),
        )
        .withColumn("_i", F.size(F.array_intersect("_hsa", "_hsb")))
        .withColumn(
            "_tj", F.col("_i") / (F.size("_hsa") + F.size("_hsb") - F.col("_i"))
        )
        .withColumn(
            "_est_b",
            (F.col("bbit_matches") / n - F.lit(0.25)) / F.lit(0.75),
        )
        .withColumn("_est_f", F.col("n_band_matches") / n)
    )
    return j.select(
        "doc_a",
        "doc_b",
        "bbit_matches",
        F.round("_est_b", 6).alias("est_jaccard_bbit"),
        F.round("_est_f", 6).alias("est_jaccard_full"),
        F.round("_tj", 6).alias("true_jaccard"),
        F.round(F.abs(F.col("_est_b") - F.col("_tj")), 6).alias("abs_error_bbit"),
        F.round(F.abs(F.col("_est_f") - F.col("_tj")), 6).alias("abs_error_full"),
    )


@register(
    "linkage_blocked_levenshtein",
    """
WITH names AS (
  SELECT p_name,
         string_split(p_name, ' ')[-1] AS block,
         COUNT(*) AS n_parts,
         MIN(p_partkey) AS canon_partkey
  FROM part
  GROUP BY 1, 2
)
SELECT a.block,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_distance,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM names a
JOIN names b
  ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
""",
)
def linkage_blocked_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution via BLOCKING + edit-distance verification (the
    Fellegi-Sunter candidate-generation stage): part names that agree on
    the blocking key (their last token — the product noun) and sit
    within Levenshtein distance 3 are linkage candidates ("cold widget"
    ~ "gold widget"). This is the string-similarity member of the dedup
    family: minhash covers set overlap, simhash weighted tokens,
    embeddings semantics — edit distance catches typo-grade variants
    none of them see.

    Scale: linkage runs at the DISTINCT-NAME grain (names are signatures
    — dedup before comparison), so block sizes are bounded by the name
    vocabulary, never the row count, and the per-block pair loop is
    |block|^2 over that bounded set. The blocking join is a plain
    equi-join on the block key; the quadratic all-pairs comparison the
    naive form needs never appears. Spark's 3-arg levenshtein(a, b,
    threshold) early-exits the DP above the bound — same results,
    bounded cost — kept 2-arg here only for oracle parity."""
    p = load_table(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").alias("canon_partkey"),
    ).withColumn("block", F.element_at(F.split("p_name", " "), -1))
    a = names.select(
        F.col("block"),
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
    )
    b = names.select(
        F.col("block").alias("block_b"),
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_parts_b"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(
            b,
            (F.col("block") == F.col("block_b"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .filter(dist <= 3)
        .select(
            "block",
            "name_a",
            "name_b",
            dist.cast("bigint").alias("edit_distance"),
            "n_parts_a",
            "n_parts_b",
        )
    )
