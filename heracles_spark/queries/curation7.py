"""Seventh curation/analytics batch: feature selection (Fisher
scores), nearest-neighbor classification eval (1-NN confusion
matrix), and a k-anonymity privacy audit.

Determinism discipline: distances and moments in integer
micro-coordinates; cross-label sums of rational terms go through the
repo's decimal(38,12)-cast pattern (sum of decimals is order-free);
final ratios are short double chains mirrored op-for-op.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from heracles_spark.queries.relational import _t

QUERIES: dict = {}


def _embs_micro(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                 .select("vec_id", "label",
                         F.expr("transform(embedding, "
                                "v -> CAST(ROUND(v * 1000000) AS BIGINT))")
                          .alias("m")))


def embedding_fisher_scores(spark, sf_dir):
    """Per-dimension Fisher score (between-class / within-class
    variance) — the classic filter-method feature selector run before
    training a probe on labeled embeddings. Per-(dim, label) moment
    sums are exact integer micro units; the cross-label reduction
    T = Σ_l s1_l²/n_l uses the decimal(38,12)-cast sum (each term one
    IEEE division, the sum order-free exact), then
    between = T − s1²/n, within = s2 − T close in one double chain.
    Top-10 dims by score."""
    e = _embs_micro(spark, sf_dir)
    d = e.select("label", F.posexplode("m").alias("dim", "v"))
    per = d.groupBy("dim", "label").agg(
        F.count(F.lit(1)).alias("nl"),
        F.sum("v").alias("s1l"),
        F.sum(F.col("v") * F.col("v")).alias("s2l"))
    term = ((F.col("s1l") * F.col("s1l")).cast("double")
            / F.col("nl").cast("double")).cast("decimal(38,12)")
    agg = per.groupBy("dim").agg(
        F.sum("nl").alias("n"),
        F.sum("s1l").alias("s1"),
        F.sum("s2l").alias("s2"),
        F.sum(term).alias("t"))
    fd = lambda c: F.col(c).cast("double")  # noqa: E731
    between = fd("t") - fd("s1") * fd("s1") / fd("n")
    within = fd("s2") - fd("t")
    # a zero-variance-within dim is degenerate (score undefined /
    # infinite): exclude rather than divide by zero
    return (agg.withColumn("between", between).withColumn("within", within)
               .where(F.col("within") > 0)
               .select("dim", F.round(F.col("between") / F.col("within"),
                                      6).alias("fisher"))
               .orderBy(F.desc("fisher"), "dim")
               .limit(10))


FISHER_SQL = """
WITH d AS (
  SELECT label, i - 1 AS dim,
         CAST(ROUND(embedding[i] * 1000000) AS BIGINT) AS v
  FROM embeddings, range(1, 65) t(i)),
 per AS (
  SELECT dim, label, COUNT(*) AS nl,
         CAST(SUM(v) AS BIGINT) AS s1l, SUM(v * v) AS s2l
  FROM d GROUP BY 1, 2),
 a AS (
  SELECT dim, CAST(SUM(nl) AS BIGINT) AS n,
         CAST(SUM(s1l) AS BIGINT) AS s1,
         CAST(SUM(s2l) AS HUGEINT) AS s2,
         SUM(CAST(CAST(s1l * CAST(s1l AS HUGEINT) AS DOUBLE)
                  / CAST(nl AS DOUBLE) AS DECIMAL(38,12))) AS t
  FROM per GROUP BY 1)
SELECT dim,
       ROUND((CAST(t AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                / CAST(n AS DOUBLE))
             / (CAST(s2 AS DOUBLE) - CAST(t AS DOUBLE)), 6) AS fisher
FROM a
WHERE CAST(s2 AS DOUBLE) - CAST(t AS DOUBLE) > 0
ORDER BY fisher DESC, dim LIMIT 10
"""


def embedding_knn_confusion(spark, sf_dir):
    """1-NN classification eval: vectors with vec_id < 200 are the
    held-out queries, the rest the reference set; each query takes its
    single nearest reference's label (exact integer micro-distance,
    ties by candidate id — fully deterministic) and the output is the
    confusion matrix. The broadcast query side keeps the candidate
    scan shuffle-free; at 100 TB the reference side would be the
    IVF-probed path instead of the full scan (both shipped under
    embedding_ann_*)."""
    e = _embs_micro(spark, sf_dir)
    q = (e.where(F.col("vec_id") < 200)
          .select(F.col("vec_id").alias("qid"),
                  F.col("label").alias("true_label"),
                  F.col("m").alias("qm")))
    c = (e.where(F.col("vec_id") >= 200)
          .select(F.col("vec_id").alias("cid"),
                  F.col("label").alias("pred_label"),
                  F.col("m").alias("cm")))
    d2 = F.expr("aggregate(zip_with(qm, cm, (a, b) -> (a - b) * (a - b)),"
                " 0L, (acc, x) -> acc + x)")
    j = c.crossJoin(F.broadcast(q)).withColumn("d2", d2)
    w = Window.partitionBy("qid").orderBy("d2", "cid")
    nn = (j.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") == 1))
    return (nn.groupBy("true_label", "pred_label")
              .agg(F.count(F.lit(1)).alias("n"))
              .orderBy("true_label", "pred_label"))


KNN_CONFUSION_SQL = """
WITH m AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        v -> CAST(ROUND(v * 1000000) AS BIGINT)) AS m
  FROM embeddings),
 q AS (SELECT vec_id AS qid, label AS true_label, m AS qm
       FROM m WHERE vec_id < 200),
 c AS (SELECT vec_id AS cid, label AS pred_label, m AS cm
       FROM m WHERE vec_id >= 200),
 d AS (
  SELECT q.qid, q.true_label, c.cid, c.pred_label,
         (SELECT SUM((q.qm[i] - c.cm[i]) * (q.qm[i] - c.cm[i]))
          FROM range(1, 65) t(i)) AS d2
  FROM q JOIN c ON TRUE),
 nn AS (
  SELECT qid, true_label, pred_label,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cid) AS rn
  FROM d)
SELECT true_label, pred_label, COUNT(*) AS n
FROM nn WHERE rn = 1
GROUP BY 1, 2 ORDER BY 1, 2
"""


def customer_k_anonymity(spark, sf_dir):
    """k-anonymity audit over the quasi-identifier pair
    (nation, market segment): for each policy threshold k, how many
    equivalence classes and how many ROWS sit in classes smaller than
    k — the re-identification risk screen run before releasing a
    dataset. Pure integer aggregation over the class-size relation
    (one combinable agg + a tiny literal-k cross join)."""
    c = _t(spark, sf_dir, "customer")
    g = (c.groupBy("c_nationkey", "c_mktsegment")
          .agg(F.count(F.lit(1)).alias("sz")))
    ks = spark.createDataFrame([(2,), (5,), (10,), (20,)], "k int")
    j = g.crossJoin(F.broadcast(ks))
    return (j.groupBy("k")
             .agg(F.sum((F.col("sz") < F.col("k")).cast("long"))
                   .alias("classes_below_k"),
                  F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz"))
                         .otherwise(F.lit(0))).alias("rows_below_k"),
                  F.count(F.lit(1)).alias("n_classes"))
             .orderBy("k"))


K_ANON_SQL = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS sz
  FROM customer GROUP BY 1, 2),
 ks AS (SELECT unnest([2, 5, 10, 20]) AS k)
SELECT k,
       CAST(SUM(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below_k,
       CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
         AS rows_below_k,
       COUNT(*) AS n_classes
FROM g CROSS JOIN ks
GROUP BY k ORDER BY k
"""


QUERIES.update({
    "embedding_fisher_scores": (embedding_fisher_scores, FISHER_SQL),
    "embedding_knn_confusion": (embedding_knn_confusion,
                                KNN_CONFUSION_SQL),
    "customer_k_anonymity": (customer_k_anonymity, K_ANON_SQL),
})


def lineitem_weighted_median(spark, sf_dir):
    """Exact QUANTITY-WEIGHTED median price per return flag — the
    weighted quantile every pricing/inventory analysis wants (an
    unweighted median over line items overweights small orders). Pure
    integer CDF walk: prices as cents, weights as integer quantity
    units, cumulative weight from a keyed window, and the median is
    the first price whose running weight reaches half the total
    (2·cum ≥ total in cross-multiplied integers — no halving
    division). Routed through the shared CDF-walk operator
    (operators/orderstats.grouped_median, the pattern this query
    pioneered in round 7): combinable (flag, cents) pre-aggregation,
    then the keyed cumsum window over distinct prices only — never
    buffers a group in memory (the percentile_disc
    ObjectHashAggregate hazard documented in round 7)."""
    from heracles_spark.operators.orderstats import grouped_median

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long")
         .alias("cents"),
        F.round(F.col("l_quantity")).cast("long").alias("w"))
    med = grouped_median(li, ["l_returnflag"], "cents", weight_col="w",
                         out_col="med_cents", total_col="tot")
    return (med.select(
        "l_returnflag",
        (F.col("med_cents").cast("double") / 100.0).alias("w_median"),
        F.col("tot").alias("total_weight"))
        .orderBy("l_returnflag"))


W_MEDIAN_SQL = """
WITH g AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2),
 c AS (
  SELECT l_returnflag, cents, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM g),
 med AS (
  SELECT l_returnflag, MIN(cents) AS med_cents,
         CAST(MAX(tot) AS BIGINT) AS tot
  FROM c WHERE cum * 2 >= tot GROUP BY 1)
SELECT l_returnflag, CAST(med_cents AS DOUBLE) / 100.0 AS w_median,
       tot AS total_weight
FROM med ORDER BY l_returnflag
"""


QUERIES["lineitem_weighted_median"] = (lineitem_weighted_median,
                                       W_MEDIAN_SQL)


def doc_distinctive_terms(spark, sf_dir):
    """Characteristic vocabulary per source: top-5 terms by the
    add-one-smoothed RATE RATIO (term rate inside the source vs the
    rest of the corpus) — the corpus-exploration counterpart of the
    TV-divergence drift query, answering WHICH words make a source
    different. Strength is exact integer ratio-ppm
    (c_s·(N_rest+1)·10⁶) div ((c_rest+1)·N_s) — decimal products +
    integral division, no log-odds libm; min-support 10, top-5 per
    source by a source-keyed window."""
    from heracles_spark.queries.pipeline import _docs

    d = _docs(spark, sf_dir)
    toks = d.select(
        "source",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"))
    cst = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("cs"))
    ct = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    ns = toks.groupBy("source").agg(F.count(F.lit(1)).alias("nsrc"))
    ntot = toks.agg(F.count(F.lit(1)).alias("ntot"))
    j = (cst.where(F.col("cs") >= 10)
            .join(ct, "w")
            .join(F.broadcast(ns), "source")
            .crossJoin(F.broadcast(ntot)))
    ratio = F.expr(
        "(CAST(cs AS DECIMAL(38,0))"
        " * CAST(ntot - nsrc + 1 AS DECIMAL(38,0))"
        " * CAST(1000000 AS DECIMAL(38,0)))"
        " div (CAST(c - cs + 1 AS DECIMAL(38,0))"
        " * CAST(nsrc AS DECIMAL(38,0)))")
    r = j.withColumn("ratio_ppm", ratio)
    w = Window.partitionBy("source").orderBy(F.desc("ratio_ppm"), "w")
    return (r.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") <= 5)
             .select("source", F.col("rn").cast("long").alias("rank"),
                     "w", "cs", "ratio_ppm")
             .orderBy("source", "rank"))


DISTINCTIVE_SQL = r"""
WITH toks AS (
  SELECT source,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
  FROM documents),
 cst AS (SELECT source, w, COUNT(*) AS cs FROM toks GROUP BY 1, 2),
 ct AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY 1),
 ns AS (SELECT source, COUNT(*) AS nsrc FROM toks GROUP BY 1),
 nt AS (SELECT COUNT(*) AS ntot FROM toks),
 j AS (
  SELECT cst.source, cst.w, cst.cs,
         CAST((CAST(cst.cs AS HUGEINT) * (nt.ntot - ns.nsrc + 1)
               * 1000000)
              // (CAST(ct.c - cst.cs + 1 AS HUGEINT) * ns.nsrc)
              AS BIGINT) AS ratio_ppm
  FROM cst
  JOIN ct USING (w) JOIN ns USING (source), nt
  WHERE cst.cs >= 10),
 r AS (
  SELECT source, w, cs, ratio_ppm,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY ratio_ppm DESC, w) AS rank
  FROM j)
SELECT source, rank, w, cs, ratio_ppm
FROM r WHERE rank <= 5 ORDER BY source, rank
"""


QUERIES["doc_distinctive_terms"] = (doc_distinctive_terms,
                                    DISTINCTIVE_SQL)


def multimodal_gif_decode(spark, sf_dir):
    """REAL GIF decode, value-oracled end-to-end: per doc, an 8×8
    two-color checkerboard (c1 = id·{13,37,61}, c2 = id·{3,43,29}
    mod 256) written as a real GIF89a — palette + sub-blocked LZW
    stream whose code widths step exactly as a conforming decoder's
    dictionary grows — decoded via decode_image_features(
    decoder="gif"). Mean luma of a checkerboard is analytic, so the
    oracle certifies the entire LZW walk (the dictionary-coding
    counterpart of the PNG/QOI contracts)."""
    import numpy as np
    import pandas as pd

    from heracles_spark.operators import multimodal
    from heracles_spark.operators.media_codecs import encode_gif
    from heracles_spark.queries.pipeline import _docs

    d = _docs(spark, sf_dir).where(F.col("doc_id") <= 50).select("doc_id")

    def synth(it):
        for pdf in it:
            blobs = []
            for i in pdf["doc_id"]:
                i = int(i)
                pal = np.array(
                    [[i * 13 % 256, i * 37 % 256, i * 61 % 256],
                     [i * 3 % 256, i * 43 % 256, i * 29 % 256]],
                    dtype=np.uint8)
                yy, xx = np.mgrid[0:8, 0:8]
                idx = ((xx + yy) % 2).astype(np.uint8)
                blobs.append(encode_gif(idx, pal))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": blobs})

    media = d.mapInPandas(synth, schema="doc_id long, content binary")
    feats = multimodal.decode_image_features(media, decoder="gif")
    return (feats.select("doc_id",
                         F.round("mean_luma", 6).alias("mean_luma"))
                 .orderBy("doc_id"))


MGIF_SQL = """
SELECT doc_id,
       ROUND(((0.299 * (doc_id * 13 % 256) + 0.587 * (doc_id * 37 % 256)
               + 0.114 * (doc_id * 61 % 256))
            + (0.299 * (doc_id * 3 % 256) + 0.587 * (doc_id * 43 % 256)
               + 0.114 * (doc_id * 29 % 256))) / 2 / 255.0, 6)
         AS mean_luma
FROM documents WHERE doc_id <= 50 ORDER BY doc_id
"""


QUERIES["multimodal_gif_decode"] = (multimodal_gif_decode, MGIF_SQL)
