"""Plan-construction purity: building an operator's DataFrame must run
NO Spark job (no .first()/.collect()/.count() during construction).

The probe: construct every composition-style operator against an EMPTY
input. An operator that peeks at the data during construction either
raises (len(None), index error) or silently degrades — building
successfully against empty inputs proves the plan is assembled from
declared parameters only. (Driver-side TRAINING steps — IVF k-means,
PQ codebooks — are excluded by design: they are documented, capped
collect() algorithms, not plan construction.)
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id: long, text: string, lang: string")


def _empty_embs(spark):
    return spark.createDataFrame(
        [], "vec_id: long, embedding: array<double>, label: string")


def test_dedup_operators_build_on_empty(spark):
    from heracles_spark.operators import dedup

    d = _empty_docs(spark)
    e = _empty_embs(spark)
    built = [
        dedup.minhash_signatures(d),
        dedup.minhash_dedup_pairs(d),
        dedup.simhash_signatures(d),
        dedup.simhash_dup_groups(d),
        dedup.ngram_jaccard_pairs(d, unit="char"),
        dedup.ngram_jaccard_pairs(d, unit="word", max_doc_frac=0.01),
        dedup.embedding_near_dup_pairs(e, dim=64),
    ]
    for df in built:
        assert df.collect() == []


def test_similarity_operators_build_on_empty(spark):
    from heracles_spark.operators import similarity as sim

    e = _empty_embs(spark)
    q = _empty_embs(spark)
    built = [
        sim.cosine_topk_df(e, q, dim=8),
        sim.quantized_cosine_topk_df(e, q, dim=8),
        sim.cosine_all_pairs(e, threshold=0.9, dim=8),
        sim.cosine_topk_batch(
            e, q.selectExpr("vec_id AS qid", "embedding AS qvec"), dim=8),
        sim.quantize_int8(e, dim=8),
    ]
    for df in built:
        assert df.collect() == []


def test_text_and_ranking_operators_build_on_empty(spark):
    from heracles_spark.operators import text
    from heracles_spark.operators.ranking import (
        range_frame_agg, with_global_ranks)

    d = _empty_docs(spark)
    built = [
        text.decontaminate(d, d),
        text.contaminated_ids(d, d),
        text.with_lang_id(d),
        text.with_quality_score(d),
        text.term_frequencies(d),
        with_global_ranks(
            spark.createDataFrame([], "id: long, v: double"), ["v", "id"]),
        range_frame_agg(
            spark.createDataFrame([], "k: long, v: double"),
            "k", F.col("v"), preceding=10, out_col="s"),
    ]
    for df in built:
        assert df.collect() == []


def test_orderstats_and_projection_build_on_empty(spark):
    from heracles_spark.operators import similarity as sim
    from heracles_spark.operators.orderstats import (
        grouped_equidepth_histogram, grouped_mad, grouped_median)

    e = _empty_embs(spark)
    v = spark.createDataFrame([], "g: string, v: long")
    built = [
        sim.random_projection_micro(e, k=4, dim=8),
        grouped_equidepth_histogram(v, ["g"], "v", 4),
        grouped_equidepth_histogram(v, [], "v", 4),   # whole-relation
        grouped_median(v, ["g"], "v"),
        grouped_mad(v, ["g"], "v"),
    ]
    for df in built:
        assert df.collect() == []
