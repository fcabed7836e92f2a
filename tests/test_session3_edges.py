"""Edge cases for the round-3 third-session operators: empty inputs,
filtered-out media, degenerate hierarchies — the shapes a long-running
pipeline hits on day one (an empty increment, a batch with no videos)
and must pass through with stable schemas, not exceptions."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.operators.allocation import weighted_closure
from ibis_olap_aggregation_spark.operators.dedup import (
    classify_new_vs_corpus,
    doc_signatures,
)
from ibis_olap_aggregation_spark.operators.multimodal import (
    FRAME_SCHEMA,
    attach_media,
    sample_video_frames,
)
from ibis_olap_aggregation_spark.session import load_table

_DOCS_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def test_classify_empty_batch(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    empty = doc_signatures(docs.limit(0))
    corpus = doc_signatures(docs.limit(50))
    out = classify_new_vs_corpus(empty, corpus)
    assert out.count() == 0
    assert out.columns == ["doc_id", "verdict", "matched_doc_id", "n_lsh_candidates"]


def test_classify_empty_corpus(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    new = doc_signatures(docs.limit(20))
    corpus = doc_signatures(docs.limit(0))
    pdf = classify_new_vs_corpus(new, corpus).toPandas()
    assert len(pdf) == 20
    assert (pdf.verdict == "unique").all()
    assert pdf.matched_doc_id.isna().all()
    assert (pdf.n_lsh_candidates == 0).all()


def test_frame_sample_no_videos(spark):
    docs = spark.createDataFrame(
        [(3, "a doc whose id is not video-typed", "en", "s", 33)], _DOCS_DDL
    )
    # doc_id 3 -> 3 % 3 == 0 -> image, never video
    out = sample_video_frames(attach_media(docs))
    assert out.count() == 0
    assert out.schema == FRAME_SCHEMA


def test_frame_sample_empty_input(spark):
    docs = spark.createDataFrame([], _DOCS_DDL)
    out = sample_video_frames(attach_media(docs))
    assert out.count() == 0


def test_weighted_closure_single_edge_and_orphan_root(spark):
    edges = spark.createDataFrame(
        [(2, 1, Decimal("0.5"))], "child bigint, parent bigint, w decimal(3,1)"
    )
    got = {
        (r["descendant"], r["ancestor"]): str(r["pw"])
        for r in weighted_closure(edges, max_depth=3).collect()
    }
    # self paths for BOTH nodes + the weighted edge; depth beyond the
    # real hierarchy adds nothing
    assert got == {
        (1, 1): "1.000000",
        (2, 2): "1.000000",
        (2, 1): "0.500000",
    }


def test_weighted_closure_weight_one_is_plain_closure(spark):
    edges = spark.createDataFrame(
        [(2, 1, Decimal("1.0")), (3, 2, Decimal("1.0"))],
        "child bigint, parent bigint, w decimal(3,1)",
    )
    rows = weighted_closure(edges, max_depth=3).collect()
    assert all(r["pw"] == Decimal("1.000000") for r in rows)
    assert {(r["descendant"], r["ancestor"]) for r in rows} == {
        (1, 1), (2, 2), (3, 3), (2, 1), (3, 2), (3, 1),
    }
