"""Worked example: an end-to-end training-corpus curation pass using
the Python operator API (the DataFrame-level counterpart of
examples/demo*.sql, which exercise the SQL surface).

Run directly (spark-submit / python) or via tests/test_examples.py:

    python examples/curation_pipeline.py [sf_dir]

Steps — each one a shipped operator family, composed the way a real
pipeline would:

  1. score   — quality features + language ID (operators.text)
  2. dedup   — exact text dedup, then MinHash-LSH near-dup pairs →
               connected components → keep-best (operators.dedup /
               graph)
  3. mix     — per-source cap + temperature-weighted source mix
               (operators.sampling)
  4. sample  — integer-exact stratified eval split
               (sampling.stratified_sample_n + hash_split)
  5. pack    — GPT-style sequence packing (sampling.pack_sequences)
  6. manifest— per-source accounting of what survived each gate

Everything is deterministic (hash-based, integer-exact) — re-running
on a re-partitioned copy of the corpus yields byte-identical output.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str):
    from heracles_spark.operators import dedup, sampling, text
    from heracles_spark.operators.graph import connected_components

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. score
    scored = text.with_lang_id(text.with_quality_score(docs))

    # 2a. exact dedup (hash-agg keep-min-id, no all-pairs)
    exact = dedup.exact_dedup(scored, id_col="doc_id", cols=["text"])

    # 2b. near-dup: banded MinHash candidates -> components -> keep
    #     the best-quality doc per duplicate cluster
    pairs = dedup.minhash_dedup_pairs(exact, threshold=0.5)
    comp = connected_components(pairs)
    labeled = (exact.join(comp.withColumnRenamed("id", "doc_id"),
                          "doc_id", "left")
                    .withColumn("component",
                                F.coalesce("component", "doc_id")))
    from pyspark.sql import Window
    w = (Window.partitionBy("component")
               .orderBy(F.desc("quality_score"), "doc_id"))
    kept = (labeled.withColumn("__rn", F.row_number().over(w))
                   .where(F.col("__rn") == 1).drop("__rn", "component"))

    # 3. per-source cap (no source may dominate), then a source mix
    capped = sampling.cap_per_group(kept, "source", k=2000, n_salt=16)
    mixed = sampling.corpus_mix(capped, {"web": 0.5}, source_col="source")

    # 4. deterministic eval split: 100 docs stratified by source
    eval_set = sampling.stratified_sample_n(mixed, "source", 100,
                                            "doc_id")
    train = mixed.join(eval_set.select("doc_id"), "doc_id", "left_anti")

    # 5. pack the training docs into 2048-token sequences
    with_tokens = train.withColumn(
        "n_tokens",
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).cast("long"))
    packed = sampling.pack_sequences(with_tokens, budget=2048)

    # 6. manifest: what survived each gate, per source
    manifest = (docs.groupBy("source").agg(F.count("*").alias("raw"))
        .join(kept.groupBy("source").agg(F.count("*").alias("deduped")),
              "source", "left")
        .join(train.groupBy("source").agg(F.count("*").alias("train")),
              "source", "left")
        .join(eval_set.groupBy("source").agg(F.count("*").alias("eval")),
              "source", "left")
        .orderBy("source"))
    return packed, manifest


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
    packed, manifest = run(s, sf)
    print("packed sequences:", packed.count())
    manifest.show()
