"""Short-document robustness: corpora with 0-4-token docs.

Spark's sequence(1, size(t) - k + 1) DESCENDS when size(t) < k (so the
un-guarded shingle transform crashes at runtime on slice index 0), while
DuckDB's generate_series returns empty — the engines would both crash
and diverge. The shingle/bigram expressions are branch-guarded; this
suite pins every text/dedup query that shingles or n-grams against the
DuckDB oracle on a corpus built entirely of edge-case documents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tests.test_entry_oracle import normalize, run_oracle

# every registry query whose plan shingles, n-grams, or tokenizes
_TEXTUAL = [
    "text_token_stats",
    "text_quality_score",
    "text_fingerprint",
    "text_ngram_topk",
    "text_tfidf_top_terms",
    "text_lang_id_confusion",
    "dedup_exact_content",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_candidates",
    "dedup_ngram_jaccard_pairs",
    "dedup_simhash_signatures",
    "dedup_simhash_near_pairs",
    "dedup_duplicate_clusters",
]

_DOCS = [
    # (doc_id, text, lang, source) — 1..6 tokens, with exact + near dups
    (0, "word", "en", "s0"),
    (1, "two tokens", "en", "s0"),
    (2, "three tokens here", "en", "s0"),
    (3, "now four tokens here", "es", "s1"),
    (4, "five tokens are right here", "es", "s1"),
    (5, "six tokens are right here now", "es", "s1"),
    (6, "word", "en", "s2"),  # exact dup of 0
    (7, "five tokens are right here", "en", "s2"),  # exact dup of 4
    (8, "five tokens are right here today friend", "en", "s2"),  # near dup
    (9, "a the a the a the a the", "zh", "s2"),  # stopword-only
]


@pytest.fixture(scope="module")
def short_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("shortdocs")
    pdf = pd.DataFrame(_DOCS, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    # single-file parquet (like the driver's testdata), readable by both
    # engines from the same path
    pdf.to_parquet(str(d / "documents.parquet"), index=False)
    return str(d)


def _canon_cell(x):
    """Array cells round-trip differently (Arrow float-with-NaN vs duckdb
    masked int); canonicalize to plain lists with None for nulls."""
    if isinstance(x, (list, np.ndarray)):
        if isinstance(x, np.ndarray):
            x = x.tolist()  # MaskedArray.tolist() turns masked into None
        out = []
        for v in x:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                out.append(None)
            elif isinstance(v, (float, np.floating)) and float(v).is_integer():
                out.append(int(v))
            elif isinstance(v, (int, np.integer)):
                out.append(int(v))
            else:
                out.append(v)
        return tuple(out)
    return x


@pytest.mark.parametrize("name", _TEXTUAL)
def test_short_doc_query_matches_oracle(spark, short_sf_dir, name):
    sdf = entry_mod.queries()[name](spark, short_sf_dir).toPandas()
    odf = run_oracle(entry_mod.oracle_sql()[name], short_sf_dir, tables=("documents",))
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    s, o = normalize(sdf.map(_canon_cell)), normalize(odf.map(_canon_cell))
    pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
