"""MinHash constants + DuckDB oracle CTE fragments — LEAF module.

Shared by operators/dedup.py (which also implements the Spark twins)
and operators/pipeline.py (whose cross-lingual contamination oracle
reuses the near-dup component construction). Lives under functions/ so
operator modules can import it at module level without re-entering a
partially-initialized sibling (the import-cycle rule pinned by
tests/test_import_orders.py — see the leaf-idiom note in
functions/idioms.py).

Only stdlib-free constants and SQL strings: imports nothing but idioms.
"""

from __future__ import annotations

from ibis_olap_aggregation_spark.functions.idioms import DUCK_MD5INT

N_MINHASH = 16  # r=1, b=16: one band per hash -> high-recall candidates
JACCARD_THRESHOLD = 0.5

# MinHash uses 5-token shingles (3-grams collide massively on a small
# vocabulary -> degenerate LSH buckets) hashed ONCE with md5, then 16
# affine rehashes h_i = (A_i*h32 + B_i) mod M — the standard universal-
# hash construction, 16x cheaper than 16 md5 passes and identical in
# both engines (products stay < 2^52: no overflow divergence).
MINHASH_SHINGLE_K = 5
MH_MOD = 2147483647
MH_A = "(1000003 + 7919 * i)"
MH_B = "(12345 + 271 * i)"

DUCK_HASHED_SHINGLES = f"""
tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_transform(
           list_distinct(list_transform(generate_series(1, len(t) - {MINHASH_SHINGLE_K - 1}),
                         i -> array_to_string(t[i:i+{MINHASH_SHINGLE_K - 1}], ' '))),
           s -> {DUCK_MD5INT.format(x="s")} & 4294967295) AS hs
  FROM tok
)
"""

DUCK_MINHASH_SIG = f"""
sig AS (
  SELECT doc_id,
         list_transform(generate_series(0, {N_MINHASH - 1}),
           i -> list_min(list_transform(hs,
                  h -> ({MH_A} * h + {MH_B}) % {MH_MOD}))) AS ms,
         len(hs) AS n_shingles
  FROM sh
)
"""

# full near-dup component construction (LSH candidates -> exact Jaccard
# verify -> recursive reachability -> min-labelled components); the
# oracle twin of operators/dedup._near_dup_components
DUCK_NEAR_DUP_COMP = f"""WITH RECURSIVE {DUCK_HASHED_SHINGLES},
{DUCK_MINHASH_SIG},
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
vpairs AS (
  SELECT doc_a, doc_b
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.doc_a
  JOIN sh sb ON sb.doc_id = cand.doc_b
  WHERE len(list_intersect(sa.hs, sb.hs))
        / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))
        >= {JACCARD_THRESHOLD}
),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM vpairs
  UNION SELECT doc_b, doc_a FROM vpairs
),
reach AS (
  SELECT a AS node, a AS r FROM und
  UNION
  SELECT e.a, reach.r FROM und e JOIN reach ON reach.node = e.b
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY 1)"""
