"""LLM-data-pipeline query corpus over documents/embeddings — the
north-star operators (BASELINE.json) as driver-checkable queries.

Oracle notes: integer-comparison tricks keep cross-engine determinism —
lang-ID compares stopword *hit counts* (same denominator both sides), and
jaccard/cosine values are single IEEE divisions rounded to 6. LSH-based
operators (MinHash bands, hyperplane ANN) are not SQL-expressible in
DuckDB → rows-only checks; their correctness is covered by pytest with
planted duplicates (tests/test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heracles_spark.operators import dedup, similarity, text


def _docs(spark, sf_dir):
    from heracles_spark import plancache

    return plancache.table(spark, f"{sf_dir}/documents.parquet")


def _embs(spark, sf_dir):
    from heracles_spark import plancache

    return plancache.table(spark, f"{sf_dir}/embeddings.parquet")


# -- exact dedup ----------------------------------------------------------

def doc_dedup_exact(spark, sf_dir):
    """Exact dedup groups keyed on (lang, source) — one shuffle,
    map-side combinable (operators.dedup.exact_dup_groups)."""
    return (dedup.exact_dup_groups(_docs(spark, sf_dir), "doc_id",
                                   ["lang", "source"])
            .orderBy("content_hash"))


DDE_SQL = """
SELECT md5(CASE WHEN lang IS NULL THEN 'n' ELSE 'v' || lang END
           || chr(1) ||
           CASE WHEN source IS NULL THEN 'n' ELSE 'v' || source END)
         AS content_hash,
       COUNT(*) AS n_dups,
       MIN(doc_id) AS keep_id
FROM documents GROUP BY 1 ORDER BY content_hash
"""


def doc_dedup_exact_text(spark, sf_dir):
    """Exact text dedup: documents surviving min-id-per-content-hash."""
    return (dedup.exact_dedup(_docs(spark, sf_dir), "doc_id", ["text"])
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("lang"))


DDET_SQL = """
SELECT lang, COUNT(*) AS n_docs FROM documents d
WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
GROUP BY lang ORDER BY lang
"""


# -- text analysis --------------------------------------------------------

def doc_token_stats(spark, sf_dir):
    """Token counting per lang (whitespace tokenizer)."""
    d = _docs(spark, sf_dir)
    return (d.withColumn("n_tokens", text.token_count("text"))
             .groupBy("lang")
             .agg(F.sum("n_tokens").alias("total_tokens"),
                  F.min("n_tokens").alias("min_tokens"),
                  F.max("n_tokens").alias("max_tokens"),
                  F.count(F.lit(1)).alias("n_docs"))
             .orderBy("lang"))


DTS_SQL = """
SELECT lang,
       CAST(SUM(len(string_split_regex(trim(lower(text)), '\\s+'))) AS BIGINT) AS total_tokens,
       MIN(len(string_split_regex(trim(lower(text)), '\\s+'))) AS min_tokens,
       MAX(len(string_split_regex(trim(lower(text)), '\\s+'))) AS max_tokens,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
"""


def doc_fingerprint(spark, sf_dir):
    """MD5 content fingerprinting (cross-engine-checkable variant of the
    xxhash64 fingerprint)."""
    return (text.with_md5_fingerprint(_docs(spark, sf_dir))
            .where(F.col("doc_id") <= 50)
            .select("doc_id", "fp_md5")
            .orderBy("doc_id"))


DFP_SQL = """
SELECT doc_id, md5(text) AS fp_md5 FROM documents WHERE doc_id <= 50
ORDER BY doc_id
"""


def doc_quality_filter(spark, sf_dir):
    """Quality scoring: docs passing a token-count + digit-noise gate.
    Output sticks to integer-derived values (counts) for exact
    cross-engine hashing."""
    d = text.with_quality_features(_docs(spark, sf_dir))
    return (d.where((F.col("n_tokens") >= 20) & (F.col("digit_ratio") < 0.2))
             .groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_pass"),
                  F.sum("n_tokens").alias("tokens_kept"))
             .orderBy("lang"))


DQF_SQL = """
WITH feat AS (
  SELECT lang,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens,
         CASE WHEN length(text) > 0
              THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                   / length(text)
              ELSE 0.0 END AS digit_ratio
  FROM documents)
SELECT lang, COUNT(*) AS n_pass,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
FROM feat WHERE n_tokens >= 20 AND digit_ratio < 0.2
GROUP BY lang ORDER BY lang
"""


def doc_lang_id(spark, sf_dir):
    """Stopword-hit language ID vs the labeled lang column (confusion
    counts). Tie-break = lexicographically greatest language, encoded
    identically in the oracle via ordered CASE on integer hit counts."""
    d = text.with_lang_id(_docs(spark, sf_dir))
    return (d.groupBy("lang", "lang_pred")
             .agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy("lang", "lang_pred"))


# Distinct-presence hits (mirrors operators.text.with_lang_id's
# array_intersect scoring; DuckDB list_intersect is likewise distinct).
_HITS = {
    lang: ("len(list_intersect(string_split_regex(trim(lower(text)), "
           f"'\\s+'), {words!r}))").replace('"', "'")
    for lang, words in text.STOPWORDS.items()
}

DLI_SQL = f"""
WITH h AS (
  SELECT lang,
         {_HITS['de']} AS h_de, {_HITS['en']} AS h_en,
         {_HITS['es']} AS h_es, {_HITS['fr']} AS h_fr
  FROM documents)
SELECT lang,
       CASE WHEN h_de = 0 AND h_en = 0 AND h_es = 0 AND h_fr = 0 THEN 'und'
            WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
            WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
            WHEN h_en >= h_de THEN 'en'
            ELSE 'de' END AS lang_pred,
       COUNT(*) AS cnt
FROM h GROUP BY 1, 2 ORDER BY lang, lang_pred
"""


# -- similarity search ----------------------------------------------------

def embedding_knn_brute(spark, sf_dir):
    """Brute-force cosine top-10 to vec_id=0's embedding — the exact ANN
    baseline (operators.similarity.cosine_topk_df: the query row joins
    in-plan via broadcast; no driver action at build time)."""
    e = _embs(spark, sf_dir)
    return similarity.cosine_topk_df(
        e.where(F.col("vec_id") != 0), e.where(F.col("vec_id") == 0), k=10)


KNN_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
     dots AS (
  SELECT e.vec_id,
         SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)) AS dot,
         SQRT(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS ne,
         SQRT(SUM(CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))) AS nq
  FROM embeddings e, q, range(1, 65) t(i)
  WHERE e.vec_id != 0
  GROUP BY e.vec_id)
SELECT vec_id, ROUND(dot / (ne * nq), 6) AS cosine
FROM dots ORDER BY cosine DESC, vec_id LIMIT 10
"""


def embedding_label_stats(spark, sf_dir):
    """Per-label vector-norm statistics — decimal-exact cross-engine sums."""
    e = _embs(spark, sf_dir)
    norm = similarity.norm_expr(F.col("embedding"))
    return (e.withColumn("nrm", F.round(norm, 6))
             .groupBy("label")
             .agg(F.count(F.lit(1)).alias("n_vecs"),
                  F.sum(F.col("nrm").cast("decimal(38,6)")).cast("double")
                   .alias("sum_norm"))
             .orderBy("label"))


ELS_SQL = """
WITH norms AS (
  SELECT e.label, e.vec_id,
         ROUND(SQRT(SUM(CAST(e.embedding[i] AS DOUBLE)
                        * CAST(e.embedding[i] AS DOUBLE))), 6) AS nrm
  FROM embeddings e, range(1, 65) t(i)
  GROUP BY e.label, e.vec_id)
SELECT label, COUNT(*) AS n_vecs,
       CAST(SUM(CAST(nrm AS DECIMAL(38,6))) AS DOUBLE) AS sum_norm
FROM norms GROUP BY label ORDER BY label
"""


def _ann_recall_contract(ann_df, exact_df, min_hits: int):
    """approx_distinct's contract pattern for ANN: emit the EXACT
    brute-force top-k rows (SQL-oracle-checkable) plus a boolean pinning
    |ann ∩ exact| ≥ min_hits. The value hash certifies the ground truth
    and the approximate method's recall in one row set."""
    hits = (ann_df.select("vec_id")
                  .join(exact_df.select("vec_id"), "vec_id", "left_semi")
                  .agg(F.count(F.lit(1)).alias("__h")))
    flag = hits.select((F.col("__h") >= min_hits).alias("recall_ok"))
    return (exact_df.crossJoin(F.broadcast(flag))
                    .orderBy(F.desc("cosine"), "vec_id"))


def _knn_contract_sql(extra_col: str = "TRUE AS recall_ok") -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
     dots AS (
  SELECT e.vec_id,
         SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)) AS dot,
         SQRT(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS ne,
         SQRT(SUM(CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))) AS nq
  FROM embeddings e, q, range(1, 65) t(i)
  WHERE e.vec_id != 0
  GROUP BY e.vec_id)
SELECT vec_id, ROUND(dot / (ne * nq), 6) AS cosine, {extra_col}
FROM dots ORDER BY cosine DESC, vec_id LIMIT 10
"""


def embedding_ann_lsh(spark, sf_dir):
    """Hyperplane-LSH ANN top-10, multi-probe hamming radius 3 (36% of
    buckets). Recall contract: ≥ 2/10 vs brute force — uniform-random
    64-dim embeddings are LSH's WORST case (pairwise cosines concentrate
    around the mean, so sign patterns carry little rank signal); on
    clustered data the same setting recalls ≥0.9
    (tests/test_similarity.py planted tests)."""
    e = _embs(spark, sf_dir)
    qvec = [float(v) for v in
            e.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    cand = e.where(F.col("vec_id") != 0)
    ann = similarity.ann_topk_lsh(cand, qvec, k=10, n_planes=8, radius=3)
    return _ann_recall_contract(ann, similarity.cosine_topk(cand, qvec, k=10),
                                min_hits=2)


# -- near-dup families (LSH — rows-only driver checks) --------------------

def _doc_sample_pred():
    """Deterministic 1-in-8 doc sample (md5 bucket of doc_id — the
    engine-portable split_bucket hash, so DuckDB reproduces it
    exactly). The SAMPLED-EXACT contract pattern: ground truth is
    O(sample²), the sketch under test runs over the FULL corpus."""
    from heracles_spark.operators.sampling import split_bucket

    return split_bucket(F.col("doc_id"), 8) == 0


_SAMPLE_WHERE = ("CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), "
                 "1, 8)) AS BIGINT) % 8 = 0")


def doc_minhash_pairs(spark, sf_dir):
    """MinHash+LSH near-dup pairs with a SAMPLED RECALL-CONTRACT oracle
    (the approx_distinct pattern): the sketch values are
    engine-specific, so the query emits the EXACT word-3-gram Jaccard
    ≥ 0.7 pairs over a deterministic 1-in-8 hash-sample of docs (which
    the SQL oracle reproduces) plus a boolean pinning that the
    MinHash+LSH pipeline — run over the FULL corpus — recovered ≥ 80%
    of the sampled ground-truth pairs. The hash therefore certifies
    both the exact sampled ground truth AND the sketch's recall, while
    the O(n²) exact side stays O(sample²): the 100 TB recall-audit
    shape (before sampling, the exact side alone was 69s at sf1; the
    banded LSH under test is ~linear)."""
    d = _docs(spark, sf_dir)
    mh = dedup.minhash_dedup_pairs(d, threshold=0.5)
    # The exact relation feeds THREE consumers (recall semi-join, total
    # count, final output) — persist or the whole ground-truth pipeline
    # re-executes per consumer.
    # hash prefix order: no document-frequency pass — at sample size
    # the df pass is pure stage overhead (and ~4 extra codegen units),
    # and any fixed global order is lossless for the uncapped join.
    exact = dedup._persist(
        dedup.ngram_jaccard_pairs(d.where(_doc_sample_pred()), n=3,
                                  threshold=0.7, unit="word",
                                  max_doc_freq=1 << 60,
                                  prefix_order="hash"))
    # recall probe: semi join of the LSH output against the sampled
    # ground truth. NO forced broadcast (round-11 scale fix): the
    # ground-truth size is data-dependent — tiny on real corpora (a
    # 1-in-8 audit sample), but the sf10 synthetic's cross-replica
    # planted duplicates inflate it past driver memory, and a forced
    # broadcast died in BroadcastExchangeExec. AQE's size-based
    # decision broadcasts it when it IS small (the production case)
    # and falls back to a shuffled semi join when it isn't — never
    # force-broadcast a relation whose cardinality you don't control.
    hits = (mh.select("id_a", "id_b")
              .join(exact.select("id_a", "id_b").hint("shuffle_hash"),
                    ["id_a", "id_b"], "left_semi")
              .agg(F.count(F.lit(1)).alias("__h")))
    tot = exact.agg(F.count(F.lit(1)).alias("__t"))
    flag = (hits.crossJoin(tot)
                .select((F.col("__h") >= 0.8 * F.col("__t"))
                        .alias("recall_ok")))
    # local sort only: a global orderBy costs an extra range-sample
    # job per run, and both the driver compare and the local checker
    # are order-insensitive.
    return (exact.crossJoin(F.broadcast(flag))
                 .sortWithinPartitions("id_a", "id_b"))


MINHASH_CONTRACT_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents WHERE {_SAMPLE_WHERE}),
 grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[CAST(i AS INT):CAST(i + 2 AS INT)], ' ') AS g
  FROM toks, range(1, 20000) r(i)
  WHERE i + 2 <= len(t)),
 sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM grams GROUP BY doc_id),
 inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       ROUND(CAST(n_common AS DOUBLE)
             / (sa.set_size + sb.set_size - n_common), 6) AS jaccard,
       TRUE AS recall_ok
FROM inter JOIN sizes sa ON id_a = sa.doc_id
           JOIN sizes sb ON id_b = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / (sa.set_size + sb.set_size - n_common) >= 0.7
ORDER BY id_a, id_b
"""


def doc_simhash_groups(spark, sf_dir):
    """SimHash exact-signature duplicate groups — md5-bit flavor, so the
    WHOLE signature is engine-portable and the oracle below recomputes
    the identical 60-bit simhash per doc in SQL: a full value oracle for
    an LSH operator (the xxhash64 flavor stays the fast production
    path; same algorithm, different bit source)."""
    return (dedup.simhash_dup_groups(_docs(spark, sf_dir), hash_fn="md5")
            .orderBy("keep_id"))


def _simhash_sql_bits(n_bits: int = 60) -> tuple[str, str]:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(n_bits))
    sig = " + ".join(
        f"CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(n_bits))
    return votes, sig


_SH_VOTES, _SH_SIG = _simhash_sql_bits()

SIMHASH_SQL = f"""
WITH ex AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents),
 th AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
  FROM ex),
 votes AS (SELECT doc_id, {_SH_VOTES} FROM th GROUP BY doc_id),
 sigs AS (SELECT doc_id, {_SH_SIG} AS simhash FROM votes)
SELECT simhash, CAST(COUNT(*) AS BIGINT) AS n_dups,
       MIN(doc_id) AS keep_id
FROM sigs GROUP BY simhash HAVING COUNT(*) > 1
ORDER BY keep_id
"""


def doc_simhash_hamming(spark, sf_dir):
    """Banded SimHash hamming-≤3 near-dup pairs
    (dedup.simhash_near_dup_pairs): the signature is split into k+1
    bands, so by pigeonhole the band equi-join has recall 1 — the
    banded SCALE path must therefore EQUAL the O(n²) brute force, and
    with the md5-bit signature flavor the oracle recomputes identical
    signatures and brute-forces hamming in SQL: a full value oracle
    for an LSH-style operator."""
    return (dedup.simhash_near_dup_pairs(_docs(spark, sf_dir), k=3,
                                         hash_fn="md5")
            .orderBy("id_a", "id_b"))


def doc_dup_components(spark, sf_dir):
    """Transitive near-dup closure as a VALUE-oracle-checked query:
    SimHash hamming-≤3 pairs (md5 flavor — engine-portable signatures)
    as the edge set → graph.connected_components (alternating
    large-star/small-star contraction, O(log n) rounds) → one row per
    duplicate cluster (component = min reachable doc_id). The oracle
    recomputes the same edges in SQL and closes them with a recursive
    CTE — a full value oracle for an iterative graph operator that was
    previously pytest-only."""
    from heracles_spark.operators.graph import connected_components

    pairs = dedup.simhash_near_dup_pairs(_docs(spark, sf_dir), k=3,
                                         hash_fn="md5")
    # LSH near-dup clusters are near-cliques (diameter ≤ ~3): min-label
    # propagation converges in 2-3 cheap rounds here (3.6s vs 17.7s for
    # star contraction at sf0.01). Star remains the default for
    # unbounded-diameter graphs (crawl mirror chains).
    comp = connected_components(pairs, algorithm="label", max_iter=8)
    return (comp.groupBy("component")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.max("id").alias("max_id"))
                .orderBy("component"))


DUP_COMPONENTS_SQL = f"""
WITH RECURSIVE ex AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents),
 th AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
  FROM ex),
 votes AS (SELECT doc_id, {_SH_VOTES} FROM th GROUP BY doc_id),
 sigs AS (SELECT doc_id, {_SH_SIG} AS simhash FROM votes),
 edges AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
 sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
 reach(n, r) AS (
  SELECT u, u FROM sym
  UNION
  SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.n),
 labels AS (SELECT n AS id, MIN(r) AS component FROM reach GROUP BY n)
SELECT component, CAST(COUNT(*) AS BIGINT) AS n_docs, MAX(id) AS max_id
FROM labels GROUP BY component ORDER BY component
"""


SIMHASH_HAM_SQL = f"""
WITH ex AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents),
 th AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
  FROM ex),
 votes AS (SELECT doc_id, {_SH_VOTES} FROM th GROUP BY doc_id),
 sigs AS (SELECT doc_id, {_SH_SIG} AS simhash FROM votes)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY id_a, id_b
"""


def doc_ngram_jaccard(spark, sf_dir):
    """Word-3-gram Jaccard ≥0.8 set-similarity join, graded by a
    SAMPLED-EXACT recall contract: the query emits the TRUE (uncapped,
    exact) Jaccard ≥0.8 pairs over a deterministic 1-in-8 hash-sample
    of docs — which the SQL oracle reproduces — plus a boolean pinning
    that the PRODUCTION path (stop-gram-capped, prefix-filtered join;
    global document frequencies computed over the FULL corpus, pair
    work restricted to the same sample — bit-identical to the
    full-corpus run filtered to sample×sample, see
    ngram_jaccard_pairs' pair_filter) recovered ≥ 80% of them.

    Word grams, not char grams: the synthetic corpus has only ~400
    distinct char-3-grams (every doc collides with every other); word
    trigram diversity is ~50× higher and the index selective.
    Stop-gram cap = 1% of the corpus (a fraction, not an absolute —
    see ngram_jaccard_pairs). The production path's score is a LOWER
    bound on true Jaccard (precision 1), so recovered ⊆ exact and the
    flag measures pure recall."""
    import os as _os
    import tempfile as _tempfile

    d = _docs(spark, sf_dir)
    # Exact side: sampled input up front + hash prefix order (any
    # fixed global order is lossless for the UNCAPPED join, and at
    # sample size the df-rarity pass costs more in stages than its
    # candidate savings). Memoized per (process, sf_dir) as a parquet
    # materialization (round-9 sweep hygiene, the BM25-postings
    # pattern): the contract's ground truth is input-determined, so
    # repeat calls in one session read the pair set back instead of
    # re-running the uncapped join — and the parquet cut also serves
    # the two in-query consumers (rows + total) without _persist.
    ckey = _os.path.abspath(sf_dir)
    if ckey not in _NGJ_EXACT_CACHE:
        path = _tempfile.mkdtemp(prefix="heracles_ngj_")
        (dedup.ngram_jaccard_pairs(d.where(_doc_sample_pred()), n=3,
                                   threshold=0.8, unit="word",
                                   max_doc_freq=1 << 60,
                                   prefix_order="hash")
              .write.mode("overwrite").parquet(path))
        _NGJ_EXACT_CACHE[ckey] = path
    exact = spark.read.parquet(_NGJ_EXACT_CACHE[ckey])
    prod = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.8,
                                     max_doc_frac=0.01, unit="word",
                                     pair_filter=_doc_sample_pred())
    # prod ⊆ exact by construction (the capped score lower-bounds true
    # Jaccard, and both sides' pair work is sample-restricted), so
    # recall needs no semi-join: |prod| / |exact|.
    hits = prod.agg(F.count(F.lit(1)).alias("__h"))
    tot = exact.agg(F.count(F.lit(1)).alias("__t"))
    flag = (hits.crossJoin(tot)
                .select((F.col("__h") >= 0.8 * F.col("__t"))
                        .alias("recall_ok")))
    # local sort only: a global orderBy costs an extra range-sample
    # job per run, and both the driver compare and the local checker
    # are order-insensitive.
    return (exact.crossJoin(F.broadcast(flag))
                 .sortWithinPartitions("id_a", "id_b"))


def doc_ngram_jaccard_full(spark, sf_dir):
    """FULL-CORPUS production set-similarity join (the round-4 query
    shape, kept alongside the sampled contract): word-3-gram Jaccard
    ≥0.8 via the stop-gram-capped, prefix-filtered inverted-index join
    over every doc — SQL-expressible, so a FULL value oracle (score =
    |F_a∩F_b| / (|S_a|+|S_b|-|F_a∩F_b|) with df-capped gram sets F and
    full sets S, reproduced exactly by the capped SQL below)."""
    return (dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), n=3,
                                      threshold=0.8, max_doc_frac=0.01,
                                      unit="word")
            .sortWithinPartitions("id_a", "id_b"))


NGJ_FULL_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents),
 grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[CAST(i AS INT):CAST(i + 2 AS INT)], ' ') AS g
  FROM toks, range(1, 20000) r(i)
  WHERE i + 2 <= len(t)),
 sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM grams GROUP BY doc_id),
 keep AS (SELECT g FROM grams GROUP BY g
          HAVING COUNT(*) <= greatest(
            floor(0.01 * (SELECT COUNT(*) FROM documents)), 2)),
 filtered AS (SELECT doc_id, g FROM grams WHERE g IN (SELECT g FROM keep)),
 inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM filtered a JOIN filtered b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       ROUND(CAST(n_common AS DOUBLE)
             / (sa.set_size + sb.set_size - n_common), 6) AS jaccard
FROM inter JOIN sizes sa ON id_a = sa.doc_id
           JOIN sizes sb ON id_b = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / (sa.set_size + sb.set_size - n_common) >= 0.8
ORDER BY id_a, id_b
"""


NGJ_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents WHERE {_SAMPLE_WHERE}),
 grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[CAST(i AS INT):CAST(i + 2 AS INT)], ' ') AS g
  FROM toks, range(1, 20000) r(i)
  WHERE i + 2 <= len(t)),
 sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM grams GROUP BY doc_id),
 inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       ROUND(CAST(n_common AS DOUBLE)
             / (sa.set_size + sb.set_size - n_common), 6) AS jaccard,
       TRUE AS recall_ok
FROM inter JOIN sizes sa ON id_a = sa.doc_id
           JOIN sizes sb ON id_b = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / (sa.set_size + sb.set_size - n_common) >= 0.8
ORDER BY id_a, id_b
"""


def embedding_near_dup(spark, sf_dir):
    """Embedding near-dup pairs via BANDED hyperplane LSH (4 bands × 4
    planes), with a recall-contract oracle: the query emits the EXACT
    cosine ≥ 0.42 pairs (in-plan all-pairs ground truth, which the SQL
    oracle reproduces) plus a boolean pinning that the banded LSH found
    ≥ 30% of them. 0.42 sits below this corpus's max pairwise cosine
    (~0.51) so the contract is non-vacuous — uniform random vectors are
    the hardest case for sign-LSH; at the ≥0.95 design point the same
    banding recovers ~100% (tests/test_dedup.py)."""
    e = _embs(spark, sf_dir)
    # Recall accounting uses UNVERIFIED candidates: verified ∩ exact ==
    # candidates ∩ exact (verification only drops sub-threshold pairs,
    # which exact excludes anyway), so the contract skips the LSH
    # side's cosine pass entirely.
    # Candidate MEMBERSHIP probe: the exact side is tiny, so instead of
    # materializing the O(Σ n_bucket²) candidate pair set, join each
    # exact pair to both endpoints' surviving band sets (skew cap
    # included) and test arrays_overlap — same membership semantics as
    # the candidate join, at the cost of one broadcast lookup.
    bands = dedup.hyperplane_band_sets(e, n_planes=16, n_bands=4)
    # three consumers (membership probe, count, output) — persist the
    # exact ground truth so the GEMM runs once
    exact = dedup._persist(similarity.cosine_all_pairs(e, threshold=0.42))
    ba = bands.select(F.col("vec_id").alias("id_a"),
                      F.col("bands").alias("__ba"))
    bb = bands.select(F.col("vec_id").alias("id_b"),
                      F.col("bands").alias("__bb"))
    hits = (exact.select("id_a", "id_b")
                 .join(F.broadcast(ba), "id_a")
                 .join(F.broadcast(bb), "id_b")
                 .where(F.arrays_overlap("__ba", "__bb"))
                 .agg(F.count(F.lit(1)).alias("__h")))
    tot = exact.agg(F.count(F.lit(1)).alias("__t"))
    flag = (hits.crossJoin(tot)
                .select((F.col("__h") >= 0.3 * F.col("__t"))
                        .alias("recall_ok")))
    # local sort only: a global orderBy costs an extra range-sample
    # job per run, and both the driver compare and the local checker
    # are order-insensitive.
    return (exact.crossJoin(F.broadcast(flag))
                 .sortWithinPartitions("id_a", "id_b"))


def embedding_near_dup_exact(spark, sf_dir):
    """Exact all-pairs cosine≥0.42 — oracle-checked ground-truth twin of
    the LSH-pruned embedding_near_dup (0.42 sits below the synthetic
    data's max pairwise cosine ≈0.51, so the check is non-vacuous)."""
    return (similarity.cosine_all_pairs(_embs(spark, sf_dir), threshold=0.42)
            .orderBy("id_a", "id_b"))


END_SQL = """
WITH norms AS (
  SELECT vec_id,
         SQRT(SUM(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS nrm
  FROM embeddings, range(1, 65) t(i) GROUP BY vec_id),
 pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS dot
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id,
       range(1, 65) t(i)
  GROUP BY 1, 2)
SELECT id_a, id_b, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
FROM pairs JOIN norms na ON id_a = na.vec_id
           JOIN norms nb ON id_b = nb.vec_id
WHERE ROUND(dot / (na.nrm * nb.nrm), 6) >= 0.42
ORDER BY id_a, id_b
"""

NEAR_DUP_CONTRACT_SQL = END_SQL.replace(
    "AS cosine", "AS cosine, TRUE AS recall_ok", 1)


def embedding_ann_ivf(spark, sf_dir):
    """IVF ANN top-10 with spherical-k-means-trained centroids (probe
    12/16 cells — uniform-random embeddings spread true neighbors
    across most cells, so a useful recall needs a wide probe on THIS
    data; clustered data reaches the same recall at 2-4 probes, see
    tests/test_similarity.py). Recall contract: ≥ 7/10 vs brute
    force, pinned in the value hash alongside the exact top-10."""
    e = _embs(spark, sf_dir)
    qvec = [float(v) for v in
            e.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    cand = e.where(F.col("vec_id") != 0)
    cents = similarity.kmeans_centroids(cand, n_cells=16, sample_size=2048)
    built = similarity.ivf_build(cand, centroids=cents)
    ann = similarity.ivf_topk(built, qvec, k=10, n_probe=12,
                              centroids=cents)
    return _ann_recall_contract(ann, similarity.cosine_topk(cand, qvec, k=10),
                                min_hits=7)


def doc_redact(spark, sf_dir):
    """Pattern redaction (PII-scrub machinery): replace + count matches,
    md5-verified against DuckDB's RE2 on character-class-only patterns.
    The corpus has no planted emails/urls, so the gate exercises the
    machinery with patterns that DO occur ('customer|supplier' words,
    and 'a' as a single-char token); real PII defaults live in
    text.PII_PATTERNS and are unit-tested with planted strings."""
    pats = {"ENTITY": r"\b(customer|supplier)\b", "ART": r"\ba\b"}
    red = text.redact_patterns(_docs(spark, sf_dir), pats)
    return (red.select("doc_id", "n_entity", "n_art",
                       F.md5(F.col("redacted")).alias("redacted_md5"))
               .where(F.col("doc_id") < 50)
               .orderBy("doc_id"))


DRD_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\b(customer|supplier)\b')) AS BIGINT)
         AS n_entity,
       CAST(len(regexp_extract_all(text, '\ba\b')) AS BIGINT) AS n_art,
       md5(regexp_replace(regexp_replace(text, '\b(customer|supplier)\b',
                                         '[ENTITY]', 'g'),
                          '\ba\b', '[ART]', 'g')) AS redacted_md5
FROM documents WHERE doc_id < 50 ORDER BY doc_id
"""


def doc_repetition(spark, sf_dir):
    """Gopher-style repetition features: distinct-word ratio and top-word
    share per document (quality-filter inputs; single-division doubles
    rounded to 6 — cross-engine exact)."""
    return (text.with_repetition_features(_docs(spark, sf_dir))
            .where(F.col("doc_id") < 100)
            .orderBy("doc_id"))


DRP_SQL = """
WITH w AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
           FROM documents),
 c AS (SELECT doc_id, w, COUNT(*) AS n FROM w GROUP BY 1, 2),
 t AS (SELECT doc_id, MAX(n) AS max_n, CAST(SUM(n) AS BIGINT) AS n_toks
       FROM c GROUP BY 1)
SELECT d.doc_id,
       ROUND(CAST(len(list_distinct(string_split(trim(d.text), ' '))) AS DOUBLE)
             / len(string_split(trim(d.text), ' ')), 6) AS distinct_ratio,
       ROUND(CAST(t.max_n AS DOUBLE) / t.n_toks, 6) AS top_word_ratio
FROM documents d JOIN t ON d.doc_id = t.doc_id
WHERE d.doc_id < 100 ORDER BY d.doc_id
"""


def embedding_knn_batch(spark, sf_dir):
    """Batch exact KNN: vec_id<5 are the query set, the rest candidates;
    per-query top-5 via broadcast cross join + window (the exact batch-
    retrieval baseline; ivf_topk_batch is the probed scale path)."""
    e = _embs(spark, sf_dir)
    queries = (e.where(F.col("vec_id") < 5)
                .select(F.col("vec_id").alias("qid"),
                        F.col("embedding").alias("qvec")))
    cand = e.where(F.col("vec_id") >= 5)
    return (similarity.cosine_topk_batch(cand, queries, k=5)
            .orderBy("qid", "rank"))


KNB_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
           WHERE vec_id < 5),
 c AS (SELECT vec_id, embedding AS cv FROM embeddings WHERE vec_id >= 5),
 qn AS (SELECT qid, SQRT(SUM(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
          AS qn FROM q, range(1, 65) t(i) GROUP BY qid),
 cn AS (SELECT vec_id, SQRT(SUM(CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
          AS cn FROM c, range(1, 65) t(i) GROUP BY vec_id),
 dots AS (
  SELECT q.qid, c.vec_id,
         SUM(CAST(c.cv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)) AS dot
  FROM q JOIN c ON TRUE, range(1, 65) t(i)
  GROUP BY q.qid, c.vec_id),
 scored AS (
  SELECT d.qid, d.vec_id, ROUND(d.dot / (cn.cn * qn.qn), 6) AS cosine
  FROM dots d JOIN qn ON d.qid = qn.qid JOIN cn ON d.vec_id = cn.vec_id),
 ranked AS (
  SELECT qid, vec_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY cosine DESC, vec_id) AS INT)
           AS rank
  FROM scored)
SELECT qid, vec_id, cosine, rank FROM ranked
WHERE rank <= 5 ORDER BY qid, rank
"""


def embedding_ann_ivf_fullprobe(spark, sf_dir):
    """IVF with n_probe = n_cells: cells partition the vector space, so
    probing all of them MUST reproduce the exact brute-force top-k — a
    data-independent invariant that gives the IVF machinery (k-means
    training, cell assignment, probe ranking, rerank) a true VALUE
    oracle (the brute-force SQL), while the approximation knob
    (n_probe < n_cells) is covered by recall tests in pytest."""
    e = _embs(spark, sf_dir)
    qvec = [float(v) for v in
            e.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    cand = e.where(F.col("vec_id") != 0)
    cents = similarity.kmeans_centroids(cand, n_cells=16, sample_size=2048)
    built = similarity.ivf_build(cand, centroids=cents)
    return similarity.ivf_topk(built, qvec, k=10, n_probe=16,
                               centroids=cents)


def embedding_ann_ivf_partial(spark, sf_dir):
    """IVF with n_probe < n_cells — the PRUNING path that matters at
    100 TB (cell-partitioned storage turns the probe set into partition
    pruning; unprobed cells are never read). Driver-checked under the
    recall-contract oracle (like LSH/PQ): the hash pins the exact
    brute-force top-10 plus recall_ok = |ann ∩ exact| ≥ 7/10 at
    n_probe = 12/16. Measured recall on the synthetic (near-random,
    so worst-case clusterless) embeddings: 9/10 at sf0.001 and sf0.1,
    10/10 at sf0.01 — real corpora cluster, so deployments run far
    lower n_probe at the same recall."""
    e = _embs(spark, sf_dir)
    qvec = [float(v) for v in
            e.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    cand = e.where(F.col("vec_id") != 0)
    cents = similarity.kmeans_centroids(cand, n_cells=16, sample_size=2048)
    built = similarity.ivf_build(cand, centroids=cents)
    ann = similarity.ivf_topk(built, qvec, k=10, n_probe=12,
                              centroids=cents)
    return _ann_recall_contract(ann, similarity.cosine_topk(cand, qvec, k=10),
                                min_hits=7)


# (process, sf_dir) → HeraclesCatalog holding the DDL-built vector
# index — build-once/probe-many, like the BM25 postings index.
_IVF_CATALOG_CACHE: dict[str, object] = {}


def embedding_ann_ivf_stored(spark, sf_dir):
    """IVF probing the CATALOG vector-index store (round-8 promotion of
    the ad-hoc tempdir to full DDL — heracles_spark/vectorindex.py):
    the index is built with ``CREATE VECTOR INDEX v ON emb (embedding)
    WITH (cells=16, sample=2048)``, which trains centroids, assigns
    cells, and persists parquet PARTITIONED BY cell_id under the
    catalog — so the probe's ``cell_id IN (...)`` filter is hive-style
    PARTITION PRUNING and unprobed cells are never opened, the
    physical analogue of a faiss inverted list (REFRESH is incremental
    on appends; see tests/test_vectorindex.py). The value hash pins
    BOTH the recall contract (exact top-10 + recall_ok ≥ 7/10 at
    n_probe=12/16) AND ``partition_pruned`` = the executed plan
    carries a non-empty PartitionFilters clause on cell_id —
    certifying the store layout actually pruned, not just filtered."""
    import os
    import re
    import tempfile

    from heracles_spark import vectorindex, writer
    from heracles_spark.catalog import HeraclesCatalog
    from heracles_spark.plans import executed_plan_string

    e = _embs(spark, sf_dir)
    qvec = [float(v) for v in
            e.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    cand = e.where(F.col("vec_id") != 0)

    key = os.path.abspath(sf_dir)
    catalog = _IVF_CATALOG_CACHE.get(key)
    if catalog is None:
        catalog = HeraclesCatalog(
            tempfile.mkdtemp(prefix="heracles_ivfcat_"))
        catalog.create_table(
            "emb", [("vec_id", "bigint"),
                    ("embedding", "array<float>"), ("label", "int")],
            ["vec_id"])
        writer.write_key_organized(spark, catalog, "emb", cand)
        vectorindex.create_vector_index(spark, catalog, "emb",
                                        "embedding", "v",
                                        cells=16, sample=2048)
        _IVF_CATALOG_CACHE[key] = catalog

    ann = vectorindex.vector_index_topk(spark, catalog, "emb", "v",
                                        qvec, k=10, n_probe=12)
    pruned = bool(re.search(r"PartitionFilters: \[[^\]]*cell_id",
                            executed_plan_string(ann)))
    return (_ann_recall_contract(
                ann, similarity.cosine_topk(cand, qvec, k=10), min_hits=7)
            .withColumn("partition_pruned", F.lit(pruned)))


# -- multimodal plumbing --------------------------------------------------

def multimodal_decode(spark, sf_dir):
    """Binary media column → mapInPandas decode (deterministic fake
    decoder). Oracle checks the byte-count plumbing; feature values are
    covered in tests/test_multimodal.py."""
    from heracles_spark.operators import multimodal

    media = multimodal.attach_media_stub(_docs(spark, sf_dir))
    feats = multimodal.decode_image_features(media)
    return (feats.where(F.col("doc_id") <= 100)
                 .select("doc_id", "n_bytes")
                 .orderBy("doc_id"))


MMD_SQL = """
SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes
FROM documents WHERE doc_id <= 100 ORDER BY doc_id
"""


def multimodal_wav_decode(spark, sf_dir):
    """REAL audio decode, value-oracled end-to-end: per doc, synthesize
    a PCM-16 WAV blob (64-sample square wave, amplitude a = doc_id*37 %
    20000 + 1000) in a pandas UDF, then run it through the pure-numpy
    RIFF decoder (operators.media_codecs via decode_audio_features
    decoder="wav"). A square wave's RMS is exactly a/32768, so the SQL
    oracle recomputes the expected value analytically — the hash
    certifies the full encode → chunk-walk → numpy → feature path.
    (sqrt((a/32768)²) is written identically on both sides so the two
    engines round the same IEEE ops.)"""
    import numpy as np
    import pandas as pd

    from heracles_spark.operators import multimodal
    from heracles_spark.operators.media_codecs import encode_wav_pcm16

    d = _docs(spark, sf_dir).where(F.col("doc_id") <= 50).select("doc_id")

    def synth(it):
        for pdf in it:
            blobs = []
            for i in pdf["doc_id"]:
                amp = int(i) * 37 % 20000 + 1000
                s = np.full(64, amp, dtype=np.int16)
                s[1::2] = -amp
                blobs.append(encode_wav_pcm16(s, 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": blobs})

    media = d.mapInPandas(synth, schema="doc_id long, content binary")
    feats = multimodal.decode_audio_features(media, decoder="wav")
    return (feats.select("doc_id", "n_bytes",
                         F.round("rms", 6).alias("rms"))
                 .orderBy("doc_id"))


MWD_SQL = """
SELECT doc_id, CAST(172 AS INT) AS n_bytes,
       ROUND(SQRT(((doc_id * 37 % 20000 + 1000) / 32768.0)
                  * ((doc_id * 37 % 20000 + 1000) / 32768.0)), 6) AS rms
FROM documents WHERE doc_id <= 50 ORDER BY doc_id
"""


def multimodal_ppm_decode(spark, sf_dir):
    """REAL image decode, value-oracled end-to-end: per doc, synthesize
    a solid-color 8×8 binary PPM (r,g,b = doc_id·{11,29,53} mod 256) in
    a pandas UDF, decode it with the pure-numpy netpbm decoder
    (decode_image_features decoder="ppm"). A solid image's mean luma is
    exactly (0.299r + 0.587g + 0.114b)/255 — the SQL oracle recomputes
    it analytically with the same IEEE expression order, so the hash
    certifies header parse → pixel reshape → luma → histogram."""
    import numpy as np
    import pandas as pd

    from heracles_spark.operators import multimodal
    from heracles_spark.operators.media_codecs import encode_ppm

    d = _docs(spark, sf_dir).where(F.col("doc_id") <= 50).select("doc_id")

    def synth(it):
        for pdf in it:
            blobs = []
            for i in pdf["doc_id"]:
                r, g, b = int(i) * 11 % 256, int(i) * 29 % 256, int(i) * 53 % 256
                px = np.empty((8, 8, 3), dtype=np.uint8)
                px[..., 0], px[..., 1], px[..., 2] = r, g, b
                blobs.append(encode_ppm(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": blobs})

    media = d.mapInPandas(synth, schema="doc_id long, content binary")
    feats = multimodal.decode_image_features(media, decoder="ppm")
    return (feats.select("doc_id", "n_bytes",
                         F.round("mean_luma", 6).alias("mean_luma"))
                 .orderBy("doc_id"))


MPD_SQL = """
SELECT doc_id, CAST(203 AS INT) AS n_bytes,
       ROUND((0.299 * (doc_id * 11 % 256) + 0.587 * (doc_id * 29 % 256)
              + 0.114 * (doc_id * 53 % 256)) / 255.0, 6) AS mean_luma
FROM documents WHERE doc_id <= 50 ORDER BY doc_id
"""


def multimodal_mulaw_decode(spark, sf_dir):
    """REAL G.711 μ-law decode, value-oracled end-to-end: synthesize a
    64-sample ±a square wave, μ-law-compress it into a format-7 WAV
    (encode_wav_mulaw), decode through decode_wav_any. The quantized
    amplitude â is analytically recomputable (e = ⌊log2(a+132)⌋−7,
    m = ((a+132) >> (e+3)) & 15, â = ((2m+33)·2^e − 33)·4), so the SQL
    oracle derives RMS = â/32768 itself — the hash certifies compression
    tables, RIFF walk, and expansion, not just plumbing."""
    import numpy as np
    import pandas as pd

    from heracles_spark.operators import multimodal
    from heracles_spark.operators.media_codecs import encode_wav_mulaw

    d = _docs(spark, sf_dir).where(F.col("doc_id") <= 50).select("doc_id")

    def synth(it):
        for pdf in it:
            blobs = []
            for i in pdf["doc_id"]:
                amp = int(i) * 37 % 20000 + 1000
                s = np.full(64, amp, dtype=np.int16)
                s[1::2] = -amp
                blobs.append(encode_wav_mulaw(s, 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": blobs})

    media = d.mapInPandas(synth, schema="doc_id long, content binary")
    feats = multimodal.decode_audio_features(media, decoder="wav")
    return (feats.select("doc_id", "n_bytes",
                         F.round("rms", 6).alias("rms"))
                 .orderBy("doc_id"))


MMU_SQL = """
WITH amp AS (
  SELECT doc_id, doc_id * 37 % 20000 + 1000 AS a
  FROM documents WHERE doc_id <= 50),
 q AS (
  SELECT doc_id,
         ((2 * (((a + 132) // CAST(POWER(2, CAST(FLOOR(LOG2(a + 132)) AS BIGINT) - 4) AS BIGINT)) % 16) + 33)
          * CAST(POWER(2, CAST(FLOOR(LOG2(a + 132)) AS BIGINT) - 7) AS BIGINT) - 33) * 4 AS ahat
  FROM amp)
SELECT doc_id, CAST(108 AS INT) AS n_bytes,
       ROUND(SQRT((ahat / 32768.0) * (ahat / 32768.0)), 6) AS rms
FROM q ORDER BY doc_id
"""


def doc_lm_score(spark, sf_dir):
    """Bigram-LM quality scoring (operators.text.lm_score): the 25 most
    statistically predictable docs under the corpus's own bigram model.
    Integer surprisal classes keep the score cross-engine exact (see
    the operator docstring); ties broken by doc_id."""
    return (text.lm_score(_docs(spark, sf_dir))
            .select("doc_id", "n_bigrams",
                    F.round("avg_surprisal", 6).alias("avg_surprisal"))
            .orderBy("avg_surprisal", "doc_id").limit(25))


LMS_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents),
 uni AS (
  SELECT u.w1, COUNT(*) AS c1 FROM (
    SELECT unnest(t) AS w1 FROM toks) u GROUP BY 1),
 vocab AS (SELECT COUNT(*) AS v FROM uni),
 big AS (
  SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
  FROM toks, range(1, 200000) r(i) WHERE i + 1 <= len(t)),
 bic AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
 scored AS (
  SELECT doc_id,
         FLOOR(LOG2(CAST(c1 + v AS DOUBLE) / CAST(c2 + 1 AS DOUBLE)))
           AS cls
  FROM big JOIN bic USING (w1, w2) JOIN uni USING (w1) CROSS JOIN vocab)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(cls) AS DOUBLE) / COUNT(*), 6) AS avg_surprisal
FROM scored GROUP BY doc_id
ORDER BY avg_surprisal, doc_id LIMIT 25
"""


QUERIES = {
    "doc_dedup_exact": (doc_dedup_exact, DDE_SQL),
    "doc_dedup_exact_text": (doc_dedup_exact_text, DDET_SQL),
    "doc_token_stats": (doc_token_stats, DTS_SQL),
    "doc_fingerprint": (doc_fingerprint, DFP_SQL),
    "doc_quality_filter": (doc_quality_filter, DQF_SQL),
    "doc_lang_id": (doc_lang_id, DLI_SQL),
    "doc_lm_score": (doc_lm_score, LMS_SQL),
    "doc_redact": (doc_redact, DRD_SQL),
    "doc_repetition": (doc_repetition, DRP_SQL),
    "embedding_knn_brute": (embedding_knn_brute, KNN_SQL),
    "embedding_knn_batch": (embedding_knn_batch, KNB_SQL),
    "embedding_label_stats": (embedding_label_stats, ELS_SQL),
    "embedding_ann_lsh": (embedding_ann_lsh, _knn_contract_sql()),
    "embedding_ann_ivf": (embedding_ann_ivf, _knn_contract_sql()),
    "embedding_ann_ivf_fullprobe": (embedding_ann_ivf_fullprobe, KNN_SQL),
    "embedding_ann_ivf_partial": (embedding_ann_ivf_partial,
                                  _knn_contract_sql()),
    "embedding_ann_ivf_stored": (
        embedding_ann_ivf_stored,
        _knn_contract_sql("TRUE AS recall_ok, TRUE AS partition_pruned")),
    "doc_minhash_pairs": (doc_minhash_pairs, MINHASH_CONTRACT_SQL),
    "doc_simhash_groups": (doc_simhash_groups, SIMHASH_SQL),
    "doc_ngram_jaccard": (doc_ngram_jaccard, NGJ_SQL),
    "embedding_near_dup": (embedding_near_dup, NEAR_DUP_CONTRACT_SQL),
    "embedding_near_dup_exact": (embedding_near_dup_exact, END_SQL),
    "multimodal_decode": (multimodal_decode, MMD_SQL),
    "multimodal_wav_decode": (multimodal_wav_decode, MWD_SQL),
    "multimodal_ppm_decode": (multimodal_ppm_decode, MPD_SQL),
    "multimodal_mulaw_decode": (multimodal_mulaw_decode, MMU_SQL),
}


def doc_train_test_split(spark, sf_dir):
    """Deterministic content-hash train/eval split (operators.sampling.
    hash_split): reproducible across engines/partitionings — counts per
    (lang, split) oracle-checked against the same md5-bucket function."""
    from heracles_spark.operators.sampling import hash_split

    d = hash_split(_docs(spark, sf_dir), on="doc_id", train_pct=80)
    return (d.groupBy("lang", "split")
             .agg(F.count(F.lit(1)).alias("n_docs"))
             .orderBy("lang", "split"))


SPLIT_SQL = """
SELECT lang,
       CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 100 < 80
            THEN 'train' ELSE 'eval' END AS split,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1, 2 ORDER BY lang, split
"""


QUERIES["doc_simhash_hamming"] = (doc_simhash_hamming, SIMHASH_HAM_SQL)
QUERIES["doc_ngram_jaccard_full"] = (doc_ngram_jaccard_full, NGJ_FULL_SQL)
QUERIES["doc_dup_components"] = (doc_dup_components, DUP_COMPONENTS_SQL)
QUERIES["doc_train_test_split"] = (doc_train_test_split, SPLIT_SQL)


def doc_chunking(spark, sf_dir):
    """Context-window chunking (operators.text.chunk_documents): 64-token
    non-overlapping chunks; chunk text md5-hashed for a compact oracle
    comparison of exact reconstruction order."""
    d = _docs(spark, sf_dir).where(F.col("doc_id") <= 50)
    ch = text.chunk_documents(d, chunk_tokens=64)
    return (ch.select("doc_id", "chunk_id", "n_tokens",
                      F.md5("chunk_text").alias("chunk_md5"))
              .orderBy("doc_id", "chunk_id"))


CHUNK_SQL = """
WITH base AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS arr
  FROM documents WHERE doc_id <= 50),
toks AS (
  SELECT doc_id, arr[CAST(i AS INT)] AS tok, CAST(i - 1 AS BIGINT) AS pos
  FROM base, range(1, 10000) t(i) WHERE i <= len(arr))
SELECT doc_id, pos // 64 AS chunk_id, COUNT(*) AS n_tokens,
       md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
FROM toks GROUP BY 1, 2 ORDER BY doc_id, chunk_id
"""


QUERIES["doc_chunking"] = (doc_chunking, CHUNK_SQL)


# -- corpus assembly: mixing, packing, vocabulary --------------------------

def doc_corpus_mix(spark, sf_dir):
    """Deterministic source-weighted corpus mixing (operators.sampling.
    corpus_mix): keep 50% of src0, 25% of src1, none of src2, all of the
    rest — the md5-bucket filter keeps the SAME rows on any engine, so
    the oracle checks exact per-source survivor counts."""
    from heracles_spark.operators.sampling import corpus_mix

    mixed = corpus_mix(_docs(spark, sf_dir),
                       {"src0": 0.5, "src1": 0.25, "src2": 0.0})
    return (mixed.groupBy("source")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum("n_chars").alias("sum_chars"))
                 .orderBy("source"))


MIX_SQL = """
WITH b AS (
  SELECT source, n_chars,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 10000 AS bkt
  FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM b
WHERE (source = 'src0' AND bkt < 5000)
   OR (source = 'src1' AND bkt < 2500)
   OR source NOT IN ('src0', 'src1', 'src2')
GROUP BY source ORDER BY source
"""


QUERIES["doc_corpus_mix"] = (doc_corpus_mix, MIX_SQL)


def doc_pack_sequences(spark, sf_dir):
    """GPT-style sequence packing (operators.sampling.pack_sequences):
    concatenate each shard's documents in id order, cut every 256
    tokens; per-sequence fill statistics. The oracle reproduces the
    exclusive window cumsum in ANSI SQL (integer DIV on both engines —
    no float division in the bin id)."""
    from heracles_spark.operators.sampling import pack_sequences
    from heracles_spark.operators import text as text_ops

    d = (_docs(spark, sf_dir)
         .withColumn("n_tokens", text_ops.token_count("text")))
    p = pack_sequences(d, budget=256, n_shards=8)
    return (p.groupBy("shard", "seq")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.col("n_tokens").cast("long")).alias("sum_tokens"),
                  F.min("doc_id").alias("first_doc"),
                  F.max("doc_id").alias("last_doc"))
             .orderBy("shard", "seq"))


PACK_SQL = """
WITH t AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 8 AS INT) AS shard,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
             AS n_tokens
  FROM documents),
c AS (
  SELECT *,
         COALESCE(SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
  FROM t)
SELECT shard, CAST(excl // 256 AS BIGINT) AS seq,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM c GROUP BY 1, 2 ORDER BY shard, seq
"""


QUERIES["doc_pack_sequences"] = (doc_pack_sequences, PACK_SQL)


def doc_term_frequencies(spark, sf_dir):
    """Corpus vocabulary head (operators.text.term_frequencies): top-25
    terms by frequency, tie-broken by term — a total order, so the limit
    is deterministic."""
    from heracles_spark.operators.text import term_frequencies

    tf = term_frequencies(_docs(spark, sf_dir), min_len=2)
    return tf.orderBy(F.desc("n"), "term").limit(25)


TF_SQL = """
WITH toks AS (
  SELECT lower(regexp_replace(tok, '[^a-zA-Z]', '', 'g')) AS term
  FROM documents,
       UNNEST(string_split_regex(trim(text), '\\s+')) AS u(tok))
SELECT term, CAST(COUNT(*) AS BIGINT) AS n
FROM toks WHERE length(term) >= 2
GROUP BY term ORDER BY n DESC, term LIMIT 25
"""


QUERIES["doc_term_frequencies"] = (doc_term_frequencies, TF_SQL)


def doc_source_rollup(spark, sf_dir):
    """Incremental rollup maintenance (heracles_spark.rollup): load the
    documents table in two halves, refresh the per-source rollup after
    each, and return the rollup CONTENTS — which the oracle checks
    against a plain GROUP BY over the whole table. The second refresh's
    mode is emitted as a column the oracle pins to 'incremental', so the
    hash also proves the increment path (not a silent rebuild) produced
    the numbers. All-integer aggregates keep the comparison exact."""
    import tempfile

    from heracles_spark import rollup as rollup_mod
    from heracles_spark import writer
    from heracles_spark.catalog import HeraclesCatalog

    cat = HeraclesCatalog(tempfile.mkdtemp(prefix="heracles_rollup_"))
    cat.create_table("docs", [("doc_id", "bigint"), ("lang", "string"),
                              ("source", "string"), ("n_chars", "bigint")],
                     ["doc_id"])
    d = _docs(spark, sf_dir).select("doc_id", "lang", "source", "n_chars")
    mid = d.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    writer.write_key_organized(spark, cat, "docs",
                               d.where(F.col("doc_id") <= mid),
                               mode="append", n_buckets=2)
    rollup_mod.create_rollup(
        spark, cat, "docs_by_source", "docs", ["source"],
        {"n_docs": ("count", "doc_id"), "sum_chars": ("sum", "n_chars"),
         "first_doc": ("min", "doc_id"), "last_doc": ("max", "doc_id")})
    rollup_mod.refresh_rollup(spark, cat, "docs_by_source")
    writer.write_key_organized(spark, cat, "docs",
                               d.where(F.col("doc_id") > mid),
                               mode="append", n_buckets=2)
    st = rollup_mod.refresh_rollup(spark, cat, "docs_by_source")
    return (cat.read_table(spark, "docs_by_source")
               .select("source",
                       F.col("n_docs").cast("long").alias("n_docs"),
                       F.col("sum_chars").cast("long").alias("sum_chars"),
                       "first_doc", "last_doc",
                       F.lit(st["mode"]).alias("refresh_mode"))
               .orderBy("source"))


ROLLUP_SQL = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
       'incremental' AS refresh_mode
FROM documents GROUP BY source ORDER BY source
"""


QUERIES["doc_source_rollup"] = (doc_source_rollup, ROLLUP_SQL)


def doc_version_changes(spark, sf_dir):
    """CDC read surface (heracles_spark.changes.table_changes): load the
    documents table, apply one MERGE (uppercase the lang of doc_id<=10,
    insert doc_id>250), and return the row-level diff between the two
    versions — which the oracle reconstructs as plain SQL over the same
    parquet. File-set pruning means the diff reads only files the merge
    touched."""
    import tempfile

    from heracles_spark import writer
    from heracles_spark.catalog import HeraclesCatalog
    from heracles_spark.changes import table_changes
    from heracles_spark.merge import MergeClause, merge_into

    cat = HeraclesCatalog(tempfile.mkdtemp(prefix="heracles_cdc_"))
    cat.create_table("docs", [("doc_id", "bigint"), ("lang", "string"),
                              ("source", "string"), ("n_chars", "bigint")],
                     ["doc_id"])
    d = _docs(spark, sf_dir).select("doc_id", "lang", "source", "n_chars")
    writer.write_key_organized(spark, cat, "docs",
                               d.where(F.col("doc_id") <= 250),
                               mode="append", n_buckets=4)
    v1 = cat.get_table("docs").version
    src = (d.where((F.col("doc_id") <= 10) | (F.col("doc_id") > 250))
            .withColumn("lang", F.when(F.col("doc_id") <= 10,
                                       F.upper("lang"))
                                 .otherwise(F.col("lang"))))
    merge_into(spark, cat, "docs", src, "target.doc_id = source.doc_id",
               [MergeClause("matched", "update", assignments={"*": "*"}),
                MergeClause("not_matched", "insert", assignments={"*": "*"})])
    return (table_changes(spark, cat, "docs", v1)
            .orderBy("doc_id", "_change_type"))


CDC_SQL = """
WITH u AS (SELECT * FROM documents WHERE doc_id <= 10)
SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars,
       'insert' AS _change_type
FROM documents WHERE doc_id > 250
UNION ALL
SELECT doc_id, lang, source, CAST(n_chars AS BIGINT), 'update_preimage'
FROM u
UNION ALL
SELECT doc_id, upper(lang), source, CAST(n_chars AS BIGINT),
       'update_postimage'
FROM u
ORDER BY doc_id, _change_type
"""


QUERIES["doc_version_changes"] = (doc_version_changes, CDC_SQL)


def embedding_label_centroids(spark, sf_dir):
    """Per-label centroid components (cluster profiling / class-prototype
    computation): posexplode the vector, aggregate per (label, dim).

    Determinism: f32 elements are cast to DOUBLE (exact), scaled to
    integer microunits with ROUND(x*1e6) — a tie (exact .5) would need
    the f32 value to have a 5^6 factor in its denominator, impossible
    for a binary fraction, so both engines round identically — and
    summed as BIGINT (order-free). Scale: one explode (×dim rows) into
    a map-side-combinable groupBy on (label, dim); dims capped here for
    a bounded oracle, uncapped in production."""
    e = _embs(spark, sf_dir)
    return (e.select("label", F.posexplode("embedding").alias("dim", "x"))
             .where(F.col("dim") < 8)
             .groupBy("label", "dim")
             .agg(F.sum(F.round(F.col("x").cast("double") * 1_000_000)
                         .cast("long")).alias("sum_micro"),
                  F.count(F.lit(1)).alias("n"))
             .orderBy("label", "dim"))


ELC_SQL = """
WITH x AS (
  SELECT label,
         CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
         unnest(embedding) AS e
  FROM embeddings)
SELECT label, dim,
       CAST(SUM(CAST(ROUND(CAST(e AS DOUBLE) * 1000000) AS BIGINT))
            AS BIGINT) AS sum_micro,
       CAST(COUNT(*) AS BIGINT) AS n
FROM x WHERE dim < 8
GROUP BY label, dim ORDER BY label, dim
"""


QUERIES["embedding_label_centroids"] = (embedding_label_centroids, ELC_SQL)


def doc_corpus_pipeline(spark, sf_dir):
    """The whole preprocessing recipe as ONE declarative plan — exact
    dedup (md5 fingerprint, min-doc_id winner), quality filter, source-
    weighted mixing, content-hash train/eval split, token accounting —
    composed from the individually-proven operators, so Catalyst sees a
    single optimizable tree (one window + one final aggregation; the
    filters all collapse into the scan). The oracle replays the same
    recipe as one SQL CTE chain."""
    from pyspark.sql.window import Window

    from heracles_spark.operators.sampling import corpus_mix, hash_split
    from heracles_spark.operators import text as text_ops

    d = _docs(spark, sf_dir)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    d = (d.withColumn("__rn", F.row_number().over(w))
          .where(F.col("__rn") == 1).drop("__rn"))         # exact dedup
    d = d.withColumn("n_tokens", text_ops.token_count("text"))
    d = d.where((F.col("n_chars") >= 30) & (F.col("n_tokens") >= 5))
    d = corpus_mix(d, {"src0": 0.5, "src1": 0.0})
    d = hash_split(d, on="doc_id", train_pct=90)
    return (d.groupBy("split", "lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.col("n_tokens").cast("long")).alias("sum_tokens"),
                  F.sum("n_chars").alias("sum_chars"))
             .orderBy("split", "lang"))


PIPE_SQL = """
WITH dedup AS (
  SELECT *, len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens
  FROM documents
  QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
filtered AS (
  SELECT * FROM dedup WHERE n_chars >= 30 AND n_tokens >= 5),
mixed AS (
  SELECT *,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 10000 AS mix_bkt,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 AS split_bkt
  FROM filtered
  WHERE (source = 'src0' AND CAST(('0x' ||
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % 10000 < 5000)
     OR source NOT IN ('src0', 'src1'))
SELECT CASE WHEN split_bkt < 90 THEN 'train' ELSE 'eval' END AS split,
       lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM mixed GROUP BY 1, 2 ORDER BY split, lang
"""


QUERIES["doc_corpus_pipeline"] = (doc_corpus_pipeline, PIPE_SQL)


def customer_bloom_lookup(spark, sf_dir):
    """Bloom-filter file skipping (heracles_spark.bloom): build a
    key-organized customer table declaring ``bloomCols=c_name``, then
    point-look-up one customer BY NAME — a non-key column the min/max
    index cannot prune (names interleave across every key range). The
    per-file bloom proves the name absent from all but ~1 file, and the
    result emits ``files_pruned`` (scanned < total) as a column the
    oracle pins to TRUE, so the value hash certifies both the answer
    and that the bloom actually skipped files."""
    import tempfile

    from heracles_spark import pruning, writer
    from heracles_spark.catalog import HeraclesCatalog

    cat = HeraclesCatalog(tempfile.mkdtemp(prefix="heracles_bloom_"))
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cat.create_table(
        "cust",
        [("c_custkey", "bigint"), ("c_name", "string"),
         ("c_nationkey", "bigint"), ("c_mktsegment", "string")],
        ["c_custkey"], properties={"bloomCols": "c_name"})
    writer.write_key_organized(
        spark, cat, "cust",
        c.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
        n_buckets=8)
    probe = c.where(F.col("c_custkey") == 42).collect()[0].c_name
    tbl = cat.get_table("cust")
    pred = ("=", "c_name", probe)
    keep = pruning.prune_files(tbl.files, pred, tbl.key_cols)
    return (pruning.scan(spark, cat, "cust", pred)
            .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment",
                    F.lit(len(keep) < len(tbl.files)).alias("files_pruned"))
            .orderBy("c_custkey"))


BLOOM_SQL = """
SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
       TRUE AS files_pruned
FROM customer
WHERE c_name = (SELECT c_name FROM customer WHERE c_custkey = 42)
ORDER BY c_custkey
"""


QUERIES["customer_bloom_lookup"] = (customer_bloom_lookup, BLOOM_SQL)


def doc_rollup_rewrite(spark, sf_dir):
    """Materialized-view routing (heracles_spark.rewrite): load the
    documents table, declare + refresh a per-(lang, source) rollup, then
    issue a plain ``SELECT lang, COUNT(*), SUM(n_chars) FROM docs GROUP
    BY lang`` through the session. The dispatcher answers it FROM THE
    ROLLUP (coarser re-aggregation: SUM of partial counts/sums), and the
    result emits ``answered_from_rollup`` — pinned TRUE by the oracle —
    plus the numbers themselves, which the oracle recomputes with a
    direct GROUP BY over the raw parquet. The value hash therefore
    certifies both that the rewrite fired and that it is lossless."""
    import tempfile

    from heracles_spark import rewrite as rewrite_mod
    from heracles_spark import rollup as rollup_mod
    from heracles_spark import writer
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark,
                         metastore_dir=tempfile.mkdtemp(prefix="heracles_mv_"))
    cat = hs.catalog
    cat.create_table("docs", [("doc_id", "bigint"), ("lang", "string"),
                              ("source", "string"), ("n_chars", "bigint")],
                     ["doc_id"])
    writer.write_key_organized(
        spark, cat, "docs",
        _docs(spark, sf_dir).select("doc_id", "lang", "source", "n_chars"),
        n_buckets=4)
    rollup_mod.create_rollup(
        spark, cat, "docs_r", "docs", ["lang", "source"],
        {"n_docs": ("count", "*"), "sum_chars": ("sum", "n_chars")})
    rollup_mod.refresh_rollup(spark, cat, "docs_r")
    out = hs.sql("SELECT lang, COUNT(*) AS n_docs, "
                 "SUM(n_chars) AS sum_chars FROM docs GROUP BY lang")
    routed = rewrite_mod.LAST_REWRITE == "docs_r"
    return (out.select("lang", F.col("n_docs").cast("long").alias("n_docs"),
                       F.col("sum_chars").cast("long").alias("sum_chars"),
                       F.lit(routed).alias("answered_from_rollup"))
               .orderBy("lang"))


MV_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       TRUE AS answered_from_rollup
FROM documents GROUP BY lang ORDER BY lang
"""


QUERIES["doc_rollup_rewrite"] = (doc_rollup_rewrite, MV_SQL)


def doc_decontaminate(spark, sf_dir):
    """Benchmark decontamination: split the corpus 80/20 by content hash,
    then drop training docs sharing any word 5-gram with the eval side
    (operators.text.decontaminate — broadcast eval grams, zero train
    shuffle). Emits per-lang before/after counts so the value hash
    certifies exactly which docs were dropped."""
    from heracles_spark.operators.sampling import hash_split
    from heracles_spark.operators.text import contaminated_ids

    d = hash_split(_docs(spark, sf_dir), on="doc_id", train_pct=80)
    train = d.where(F.col("split") == "train")
    ev = d.where(F.col("split") == "eval")
    # Flag-and-aggregate in ONE pass over train (a decontaminate() call
    # plus separate before/after aggregations would scan the corpus two
    # extra times — the contaminated id set is tiny, so broadcast it and
    # count both sides from one scan).
    flagged = train.join(
        F.broadcast(contaminated_ids(train, ev, n=5)
                    .withColumn("__hit", F.lit(1))),
        "doc_id", "left")
    return (flagged.groupBy("lang")
                   .agg(F.count(F.lit(1)).alias("n_train"),
                        F.count(F.when(F.col("__hit").isNull(), 1))
                         .alias("n_clean"))
                   .orderBy("lang"))


DECON_SQL = """
WITH split AS (
  SELECT doc_id, lang, text,
         CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 < 80
              THEN 'train' ELSE 'eval' END AS split
  FROM documents),
 toks AS (
  SELECT doc_id, split, lang,
         string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM split),
 grams AS (
  SELECT doc_id, split,
         array_to_string(t[CAST(i AS INT):CAST(i + 4 AS INT)], ' ') AS g
  FROM toks, range(1, 20000) r(i) WHERE i + 4 <= len(t)
  UNION ALL
  -- sub-n-token docs contribute their whole text as their only gram,
  -- matching operators.text._gram_hashes (an identical short train/eval
  -- pair is contaminated in both engines). A whole-text gram (<n
  -- tokens) can never equal an n-gram (exactly n tokens), so the union
  -- only adds short-vs-short matches.
  SELECT doc_id, split, array_to_string(t, ' ') AS g
  FROM toks WHERE len(t) < 5),
 contaminated AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE split = 'train'
    AND g IN (SELECT g FROM grams WHERE split = 'eval'))
SELECT lang, COUNT(*) AS n_train,
       CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM contaminated)
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_clean
FROM split WHERE split = 'train' GROUP BY lang ORDER BY lang
"""


QUERIES["doc_decontaminate"] = (doc_decontaminate, DECON_SQL)


def embedding_quantize(spark, sf_dir):
    """Int8 scalar quantization audit (operators.similarity.quantize_int8):
    per-vector quantized checksum/norm (INTEGER — exact, order-free) and
    mean reconstruction error. The integer columns make the value hash
    certify every quantized component bit-for-bit."""
    e = _embs(spark, sf_dir).where(F.col("vec_id") <= 40)
    q = similarity.quantize_int8(e)
    dim = 64
    qsum = "0L + " + " + ".join(f"CAST(qvec[{i}] AS BIGINT)"
                                for i in range(dim))
    qnorm = "0L + " + " + ".join(
        f"CAST(qvec[{i}] AS BIGINT) * CAST(qvec[{i}] AS BIGINT)"
        for i in range(dim))
    mae = "(0.0D + " + " + ".join(
        f"abs(CAST(embedding[{i}] AS DOUBLE) "
        f"- CAST(qvec[{i}] AS DOUBLE) * qscale)"
        for i in range(dim)) + f") / {float(dim)!r}D"
    return (q.select("vec_id",
                     F.expr(qsum).alias("qsum"),
                     F.expr(qnorm).alias("qnorm"),
                     F.round(F.expr(mae), 6).alias("mae"))
             .orderBy("vec_id"))


EQZ_SQL = """
WITH am AS (
  SELECT vec_id, m0, CASE WHEN m0 = 0 THEN 1.0 ELSE m0 END AS m FROM (
    SELECT vec_id,
           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m0
    FROM embeddings WHERE vec_id <= 40)),
 q AS (
  SELECT e.vec_id, i, CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS x,
         CAST(floor(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) / am.m
                    * 127.0 + 0.5) AS BIGINT) AS qi,
         am.m0 / 127.0 AS scale
  FROM embeddings e JOIN am USING (vec_id), range(1, 65) t(i)
  WHERE e.vec_id <= 40)
SELECT vec_id, CAST(SUM(qi) AS BIGINT) AS qsum,
       CAST(SUM(qi * qi) AS BIGINT) AS qnorm,
       ROUND(SUM(abs(x - qi * scale)) / 64.0, 6) AS mae
FROM q GROUP BY vec_id ORDER BY vec_id
"""


def embedding_quantized_knn(spark, sf_dir):
    """Top-10 cosine in the QUANTIZED domain (scales cancel): integer
    dot/norms, two final IEEE ops — deterministic by construction
    (operators.similarity.quantized_cosine_topk_df: query row quantized
    in-plan and broadcast; no driver action at build time)."""
    e = _embs(spark, sf_dir)
    return similarity.quantized_cosine_topk_df(
        e.where(F.col("vec_id") != 0), e.where(F.col("vec_id") == 0), k=10)


EQK_SQL = """
WITH am AS (
  SELECT vec_id, CASE WHEN m0 = 0 THEN 1.0 ELSE m0 END AS m FROM (
    SELECT vec_id,
           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m0
    FROM embeddings)),
 q AS (
  SELECT e.vec_id, i,
         CAST(floor(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) / am.m
                    * 127.0 + 0.5) AS BIGINT) AS qi
  FROM embeddings e JOIN am USING (vec_id), range(1, 65) t(i)),
 qq AS (SELECT i, qi FROM q WHERE vec_id = 0),
 nq AS (SELECT SQRT(CAST(SUM(qi * qi) AS DOUBLE)) AS n FROM qq),
 sc AS (
  SELECT q.vec_id, SUM(q.qi * qq.qi) AS qdot, SUM(q.qi * q.qi) AS qn
  FROM q JOIN qq USING (i) WHERE q.vec_id != 0 GROUP BY q.vec_id)
SELECT vec_id,
       ROUND(CAST(qdot AS DOUBLE) / (SQRT(CAST(qn AS DOUBLE)) * nq.n), 6)
         AS qcosine
FROM sc, nq ORDER BY qcosine DESC, vec_id LIMIT 10
"""


QUERIES["embedding_quantize"] = (embedding_quantize, EQZ_SQL)
QUERIES["embedding_quantized_knn"] = (embedding_quantized_knn, EQK_SQL)


def doc_top_tfidf_term(spark, sf_dir):
    """Most-characteristic term per document (docs ≤ 50): argmax of
    tf · N/df — the TF-IDF shape with a RATIONAL idf (ln() is libm- and
    engine-specific; N/df is one exact IEEE division, so the value hash
    is stable). Explode → tf agg (target docs only — df/N stay
    corpus-wide, so the output is unchanged) + df agg → broadcast N →
    min_by argmax. min_by on a (-score, term) struct key replaces the
    earlier per-doc window (a full shuffle+sort of every scored term);
    as an aggregate it combines map-side and carries one row per doc."""
    d = _docs(spark, sf_dir)
    raw = F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("raw")
    term = F.lower(F.regexp_replace(F.col("raw"), "[^a-zA-Z]", ""))
    ex = (d.select("doc_id", raw)
           .select("doc_id", term.alias("term"))
           .where(F.length("term") >= 1))
    tf = (ex.where(F.col("doc_id") <= 50)
            .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    df_ = (ex.distinct().groupBy("term")
             .agg(F.count(F.lit(1)).alias("df")))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(df_, "term")
                .join(F.broadcast(n))
                .withColumn("score",
                            (F.col("tf") * F.col("n_docs")).cast("double")
                            / F.col("df")))
    # (doc_id, term) is unique after the tf agg, so the (-score, term)
    # key has no ties — the argmax is deterministic.
    return (scored.groupBy("doc_id")
                  .agg(F.min_by(
                      F.struct("term", "tf", "df", "score"),
                      F.struct((-F.col("score")).alias("k1"),
                               F.col("term").alias("k2"))).alias("b"))
                  .select("doc_id", "b.term", "b.tf", "b.df",
                          F.round("b.score", 6).alias("score"))
                  .orderBy("doc_id"))


TFIDF_SQL = """
WITH ex AS (
  SELECT doc_id, lower(regexp_replace(t, '[^a-zA-Z]', '', 'g')) AS term
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents)
  WHERE length(lower(regexp_replace(t, '[^a-zA-Z]', '', 'g'))) >= 1),
 tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ex GROUP BY 1, 2),
 df AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term
                                          FROM ex) GROUP BY term),
 n AS (SELECT COUNT(*) AS n_docs FROM documents),
 scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
  FROM tf JOIN df USING (term), n),
 ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rn
  FROM scored)
SELECT doc_id, term, tf, df, ROUND(score, 6) AS score
FROM ranked WHERE rn = 1 AND doc_id <= 50 ORDER BY doc_id
"""


QUERIES["doc_top_tfidf_term"] = (doc_top_tfidf_term, TFIDF_SQL)


def doc_global_shuffle(spark, sf_dir):
    """First 20 docs in deterministic shuffled training order
    (operators.sampling.global_shuffle, salt='ep1') — reproducible
    epoch shuffling, value-hash-checked against the same md5 ordering."""
    from heracles_spark.operators.sampling import global_shuffle

    d = _docs(spark, sf_dir).select("doc_id", "lang")
    return (global_shuffle(d, on="doc_id", salt="ep1")
            .limit(20))


GSH_SQL = """
SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR) || 'ep1') AS shuffle_key
FROM documents ORDER BY shuffle_key LIMIT 20
"""


QUERIES["doc_global_shuffle"] = (doc_global_shuffle, GSH_SQL)


def embedding_ann_pq(spark, sf_dir):
    """PQ-compressed ANN: 16-subspace × 16-code product quantization,
    ADC shortlist of 100 + exact re-rank (the faiss refine stage) —
    the serving path reads the m-byte codes column for the scan and
    float vectors only for the shortlist. Recall contract: ≥ 7/10 vs
    brute force, pinned alongside the exact top-10."""
    e = _embs(spark, sf_dir)
    qvec = [float(v) for v in
            e.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    cand = e.where(F.col("vec_id") != 0)
    books = similarity.pq_train(e, m=16, k=16, dim=64)
    enc = similarity.pq_encode(cand, books)
    ann = similarity.pq_topk_adc(enc, qvec, books, kk=10, rerank=100)
    return _ann_recall_contract(ann, similarity.cosine_topk(cand, qvec, k=10),
                                min_hits=7)


QUERIES["embedding_ann_pq"] = (embedding_ann_pq, _knn_contract_sql())


def customer_index_range(spark, sf_dir):
    """Secondary-index range lookup (heracles_spark.index): customer
    keyed on c_custkey with an index projection on c_acctbal — a RANGE
    predicate on a non-key column, which neither min/max boxes (values
    interleave across key ranges) nor blooms (equality-only) can prune.
    The probe routes through the sorted projection and reads only the
    base files the pointer set touches; ``index_used`` is pinned TRUE by
    the oracle so the value hash certifies the routing fired."""
    import tempfile

    from heracles_spark import index as index_mod
    from heracles_spark import writer
    from heracles_spark.catalog import HeraclesCatalog

    cat = HeraclesCatalog(tempfile.mkdtemp(prefix="heracles_idx_"))
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cat.create_table(
        "cust",
        [("c_custkey", "bigint"), ("c_name", "string"),
         ("c_nationkey", "bigint"), ("c_acctbal", "double")],
        ["c_custkey"])
    writer.write_key_organized(
        spark, cat, "cust",
        c.select("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
        n_buckets=8)
    index_mod.create_index(spark, cat, "cust", "c_acctbal")
    out = index_mod.indexed_lookup(
        spark, cat, "cust", ("between", "c_acctbal", 9950.0, 9999.0))
    used = index_mod.LAST_INDEX_STATS.get("mode") == "index"
    return (out.select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                       F.lit(used).alias("index_used"))
               .orderBy("c_custkey"))


IDX_SQL = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, TRUE AS index_used
FROM customer WHERE c_acctbal BETWEEN 9950.0 AND 9999.0
ORDER BY c_custkey
"""


QUERIES["customer_index_range"] = (customer_index_range, IDX_SQL)


def orders_zorder_lookup(spark, sf_dir):
    """Hilbert-curve layout pruning (heracles_spark.zorder): orders
    keyed on (o_custkey, o_orderkey) written z-ordered, then probed on
    the NON-LEADING key dimension alone — the skip-scan case the
    reference needed its 600-line server-side seek-hint filter for
    (HBaseCustomFilter.scala:43-658). Lexicographic layout leaves
    o_orderkey interleaved across every file; the space-filling curve
    makes per-file boxes tight on BOTH dimensions, so the pruner drops
    most files. ``files_pruned`` is pinned TRUE by the oracle."""
    import tempfile

    from heracles_spark import pruning, zorder
    from heracles_spark.catalog import HeraclesCatalog

    cat = HeraclesCatalog(tempfile.mkdtemp(prefix="heracles_z_"))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cat.create_table(
        "ordz",
        [("o_custkey", "bigint"), ("o_orderkey", "bigint"),
         ("o_totalprice", "double")],
        ["o_custkey", "o_orderkey"])
    zorder.write_zordered(
        spark, cat, "ordz",
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        n_buckets=16, curve="hilbert")
    tbl = cat.get_table("ordz")
    pred = ("between", "o_orderkey", 100, 140)
    keep = pruning.prune_files(tbl.files, pred, tbl.key_cols)
    return (pruning.scan(spark, cat, "ordz", pred)
            .select("o_custkey", "o_orderkey", "o_totalprice",
                    F.lit(len(keep) < len(tbl.files)).alias("files_pruned"))
            .orderBy("o_custkey", "o_orderkey"))


ZORD_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, TRUE AS files_pruned
FROM orders WHERE o_orderkey BETWEEN 100 AND 140
ORDER BY o_custkey, o_orderkey
"""


QUERIES["orders_zorder_lookup"] = (orders_zorder_lookup, ZORD_SQL)


def embedding_ann_ivfpq(spark, sf_dir):
    """IVF-PQ serving path (faiss IndexIVFPQ shape): k-means cells bound
    the candidate scan, PQ codes bound the bytes read, ADC shortlist +
    exact re-rank refines. Recall contract: ≥ 7/10 vs brute force,
    pinned alongside the exact top-10."""
    e = _embs(spark, sf_dir)
    qvec = [float(v) for v in
            e.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    cand = e.where(F.col("vec_id") != 0)
    cents = similarity.kmeans_centroids(e, n_cells=8)
    books = similarity.pq_train(e, m=16, k=16, dim=64)
    ann = similarity.ivfpq_topk(cand, qvec, books, cents, kk=10,
                                n_probe=6, rerank=100)
    return _ann_recall_contract(ann, similarity.cosine_topk(cand, qvec, k=10),
                                min_hits=7)


QUERIES["embedding_ann_ivfpq"] = (embedding_ann_ivfpq, _knn_contract_sql())


def embedding_ann_ivfpq_stored(spark, sf_dir):
    """IVF-PQ probing the CATALOG store (round-8: PQ codes at rest —
    `CREATE VECTOR INDEX … WITH (pq_m=…)` persists an m-int ``codes``
    column in the cell-partitioned store, faiss-IVFPQ's at-rest
    layout). The ADC probe reads ONLY the codes column of the probed
    cells (partition pruning × parquet column pruning: m bytes per
    vector instead of dim·4), then exact-reranks the shortlist's
    float vectors. Value hash pins the recall contract (exact top-10
    + ≥7/10 hits) AND ``partition_pruned`` from the executed plan —
    certifying the store pruned, not just filtered."""
    import os
    import re
    import tempfile

    from heracles_spark import vectorindex, writer
    from heracles_spark.catalog import HeraclesCatalog
    from heracles_spark.plans import executed_plan_string

    e = _embs(spark, sf_dir)
    qvec = [float(v) for v in
            e.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    cand = e.where(F.col("vec_id") != 0)

    key = os.path.abspath(sf_dir) + ":pq"
    catalog = _IVF_CATALOG_CACHE.get(key)
    if catalog is None:
        catalog = HeraclesCatalog(
            tempfile.mkdtemp(prefix="heracles_ivfpqcat_"))
        catalog.create_table(
            "emb", [("vec_id", "bigint"),
                    ("embedding", "array<float>"), ("label", "int")],
            ["vec_id"])
        writer.write_key_organized(spark, catalog, "emb", cand)
        vectorindex.create_vector_index(spark, catalog, "emb",
                                        "embedding", "vpq",
                                        cells=8, sample=2048,
                                        pq_m=16, pq_k=16)
        _IVF_CATALOG_CACHE[key] = catalog

    ann = vectorindex.vector_index_topk_adc(spark, catalog, "emb",
                                            "vpq", qvec, k=10,
                                            n_probe=6, rerank=100)
    pruned = bool(re.search(r"PartitionFilters: \[[^\]]*cell_id",
                            executed_plan_string(ann)))
    return (_ann_recall_contract(
                ann, similarity.cosine_topk(cand, qvec, k=10), min_hits=7)
            .withColumn("partition_pruned", F.lit(pruned)))


QUERIES["embedding_ann_ivfpq_stored"] = (
    embedding_ann_ivfpq_stored,
    _knn_contract_sql("TRUE AS recall_ok, TRUE AS partition_pruned"))


def orders_bucketed_join(spark, sf_dir):
    """Shuffle-free co-bucketed join (writer.write_bucketed's mechanism,
    ≙ the reference's dead-code shuffle-free aggregation and its
    containExchange assertions, HBaseStrategies.scala:86-175 /
    HBaseAdditionalQuerySuite.scala:262-308): lineitem and orders
    bucketed+sorted on the join key plan a SortMergeJoin with NO join
    exchange — the only shuffle left is the final small re-aggregation.
    ``join_shuffle_free`` is pinned TRUE by the oracle, so the value
    hash certifies the elision fired."""
    import tempfile

    from heracles_spark.plans import count_exchanges

    base = tempfile.mkdtemp(prefix="heracles_bkt_")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (l.select("l_orderkey", "l_quantity").write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", f"{base}/l").mode("overwrite")
      .format("parquet").saveAsTable("l_bkt_q"))
    (o.select("o_orderkey", "o_orderpriority").write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", f"{base}/o").mode("overwrite")
      .format("parquet").saveAsTable("o_bkt_q"))
    lb, ob = spark.table("l_bkt_q"), spark.table("o_bkt_q")
    joined = (lb.join(ob, lb.l_orderkey == ob.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)"))
                      .cast("double").alias("total_qty"),
                     F.count(F.lit(1)).alias("n_lines")))
    shuffle_free = count_exchanges(joined) <= 1   # only the final re-agg
    return (joined.select("o_orderpriority", "total_qty", "n_lines",
                          F.lit(shuffle_free).alias("join_shuffle_free"))
                  .orderBy("o_orderpriority"))


BKT_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty,
       COUNT(*) AS n_lines, TRUE AS join_shuffle_free
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES["orders_bucketed_join"] = (orders_bucketed_join, BKT_SQL)


def doc_dedup_keep_best(spark, sf_dir):
    """Curation composition: exact-duplicate groups (md5 of normalized
    text) keep ONE canonical representative — the highest quality score,
    doc_id as the tie-break. The select-the-best-copy step that follows
    every dedup pass in a training pipeline; built from exact groups so
    the oracle can replicate it bit-for-bit (the MinHash variant is the
    approximate twin)."""
    from pyspark.sql import Window

    d = text.with_quality_score(_docs(spark, sf_dir))
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    w = (Window.partitionBy("h")
               .orderBy(F.desc("quality_score"), F.col("doc_id")))
    ranked = (d.withColumn("h", F.md5(norm))
               .withColumn("rn", F.row_number().over(w))
               .withColumn("group_size",
                           F.count(F.lit(1)).over(Window.partitionBy("h"))))
    return (ranked.where(F.col("rn") == 1)
                  .groupBy("lang")
                  .agg(F.count(F.lit(1)).alias("n_kept"),
                       F.sum(F.col("group_size") - 1).cast("bigint")
                        .alias("n_dropped"))
                  .orderBy("lang"))


KEEP_SQL = """
WITH scored AS (
  SELECT doc_id, lang,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h,
         ROUND(0.4 * least(len(string_split_regex(trim(lower(text)),
                                                  '\\s+')) / 100.0, 1.0)
             + 0.4 * greatest(0.0, 1.0 - 2 * (
                 (length(regexp_replace(text,
                     '[^.,;:!?''"()\\[\\]{}-]', '', 'g'))
                  / CAST(length(text) AS DOUBLE))
               + (length(regexp_replace(text, '[^0-9]', '', 'g'))
                  / CAST(length(text) AS DOUBLE))))
             + 0.2 * least(4.0 * len(list_filter(
                   string_split_regex(trim(lower(text)), '\\s+'),
                   t -> list_contains(['the','and','of','to','in','is',
                     'that','it','for','was','on','are','with','as','at',
                     'this','have','from','or'], t)))
                 / len(string_split_regex(trim(lower(text)), '\\s+')),
                 1.0), 6) AS quality_score
  FROM documents),
 ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY h
              ORDER BY quality_score DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY h) AS group_size
  FROM scored)
SELECT lang, COUNT(*) AS n_kept,
       CAST(SUM(group_size - 1) AS BIGINT) AS n_dropped
FROM ranked WHERE rn = 1 GROUP BY lang ORDER BY lang
"""


QUERIES["doc_dedup_keep_best"] = (doc_dedup_keep_best, KEEP_SQL)


# -- corpus-level duplicate n-gram spans (exact-substring dedup signal) ---

def doc_duplicate_spans(spark, sf_dir):
    """Exact-substring duplication signal: word 8-grams occurring ≥ 2
    times corpus-wide, merged into per-doc spans
    (text.duplicate_ngram_spans — the suffix-array-dedup signal as
    three bounded shuffles)."""
    return (text.duplicate_ngram_spans(_docs(spark, sf_dir))
            .orderBy("doc_id"))


SPAN_SQL = r"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t,
         len(regexp_split_to_array(trim(lower(text)), '\s+')) AS nt
  FROM documents
  WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 8),
pos AS (
  SELECT doc_id, t, unnest(generate_series(1, nt - 7)) AS gs FROM base),
grams AS (
  SELECT doc_id, gs - 1 AS pos,
         array_to_string(list_slice(t, gs, gs + 7), ' ') AS gram
  FROM pos),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                   OR pos - lag(pos) OVER w > 8 THEN 1 ELSE 0 END AS brk
  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
isl2 AS (SELECT doc_id, pos,
                SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
         FROM isl),
spans AS (SELECT doc_id, isl, MIN(pos) AS s, MAX(pos) + 7 AS e
          FROM isl2 GROUP BY 1, 2),
perdoc AS (SELECT doc_id, COUNT(*) AS n_spans,
                  CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
           FROM spans GROUP BY 1),
cnt AS (SELECT doc_id, COUNT(*) AS n_dup_grams FROM hits GROUP BY 1)
SELECT c.doc_id, c.n_dup_grams, p.n_spans, p.dup_tokens,
       CAST(b.nt AS BIGINT) AS n_tokens,
       round(CAST(p.dup_tokens AS DOUBLE) / b.nt, 6) AS dup_fraction
FROM cnt c JOIN perdoc p USING (doc_id) JOIN base b USING (doc_id)
ORDER BY doc_id
"""


QUERIES["doc_duplicate_spans"] = (doc_duplicate_spans, SPAN_SQL)


# -- deterministic weighted sampling (priority sampling) ------------------

def doc_weighted_sample(spark, sf_dir):
    """Quality-weighted corpus subset: 60 docs by priority sampling
    with weight = n_chars (sampling.weighted_sample — top-k, no global
    sort)."""
    from heracles_spark.operators import sampling

    return (sampling.weighted_sample(_docs(spark, sf_dir), "n_chars", 60)
            .select("doc_id", "source", "n_chars")
            .orderBy("doc_id"))


WSAMPLE_SQL = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) AS DOUBLE) / n_chars AS pri
  FROM documents
  ORDER BY pri, doc_id LIMIT 60)
ORDER BY doc_id
"""


QUERIES["doc_weighted_sample"] = (doc_weighted_sample, WSAMPLE_SQL)


# -- per-source cap (RefinedWeb-style per-domain cap) ----------------------

def doc_source_cap(spark, sf_dir):
    """Keep ≤ 10 docs per source, chosen by md5 hash order of the id —
    the per-domain anti-dominance cap. Runs the two-phase (salted)
    variant: identical survivors to the naive per-group row_number,
    with per-task state bounded by k (sampling.cap_per_group)."""
    from heracles_spark.operators import sampling

    return (sampling.cap_per_group(_docs(spark, sf_dir), "source", 10,
                                   n_salt=4)
            .select("doc_id", "source", "lang")
            .orderBy("doc_id"))


SRCCAP_SQL = """
SELECT doc_id, source, lang FROM (
  SELECT doc_id, source, lang,
         ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents) WHERE rn <= 10
ORDER BY doc_id
"""


QUERIES["doc_source_cap"] = (doc_source_cap, SRCCAP_SQL)


# -- T5-style span corruption ---------------------------------------------

def doc_span_corruption(spark, sf_dir):
    """Deterministic masked-span pretraining input: ~5% of positions
    trigger a 3-token corruption span, merged runs become numbered
    sentinels (text.corrupt_spans). The oracle rebuilds the corrupted
    text in SQL, so the value hash certifies token-exact
    reconstruction."""
    return (text.corrupt_spans(_docs(spark, sf_dir))
            .orderBy("doc_id"))


CORRUPT_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents),
 posed AS (
  SELECT doc_id, gs - 1 AS pos, t[gs] AS tok
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS gs)),
 trig AS (
  SELECT doc_id, pos, tok,
         CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                       || ':' || CAST(pos AS VARCHAR)), 1, 8)) AS BIGINT)
                   % 20 = 0 THEN 1 ELSE 0 END AS trg
  FROM posed),
 msk AS (
  SELECT doc_id, pos, tok,
         MAX(trg) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS masked
  FROM trig),
 st AS (
  SELECT doc_id, pos, tok, masked,
         CASE WHEN masked = 1 AND COALESCE(lag(masked) OVER
                  (PARTITION BY doc_id ORDER BY pos), 0) = 0
              THEN 1 ELSE 0 END AS strt
  FROM msk),
 sid AS (
  SELECT doc_id, pos, tok, masked, strt,
         SUM(strt) OVER (PARTITION BY doc_id ORDER BY pos) AS s
  FROM st),
 pieces AS (
  SELECT doc_id, pos, masked, strt,
         CASE WHEN masked = 0 THEN tok
              WHEN strt = 1 THEN '<extra_id_' || CAST(s - 1 AS VARCHAR)
                                 || '>' END AS piece
  FROM sid)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(masked) AS BIGINT) AS n_masked,
       CAST(SUM(strt) AS BIGINT) AS n_sentinels,
       string_agg(piece, ' ' ORDER BY pos) AS corrupted
FROM pieces GROUP BY doc_id ORDER BY doc_id
"""


QUERIES["doc_span_corruption"] = (doc_span_corruption, CORRUPT_SQL)


# -- corpus profiling: equi-width length histogram -------------------------

def doc_length_histogram(spark, sf_dir):
    """Equi-width histogram of document length (50-char buckets,
    clamped) × lang — the profiling scan a corpus build starts with.
    One map expression + one combinable aggregation; no shuffle beyond
    the group-by."""
    d = _docs(spark, sf_dir)
    bkt = F.least(F.greatest((F.col("n_chars") / 50).cast("long"),
                             F.lit(0)), F.lit(11))
    return (d.groupBy(bkt.alias("bucket"), F.col("lang"))
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_chars").alias("sum_chars"))
             .orderBy("bucket", "lang"))


LEN_HIST_SQL = """
SELECT least(greatest(n_chars // 50, 0), 11) AS bucket, lang,
       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1, 2 ORDER BY bucket, lang
"""


QUERIES["doc_length_histogram"] = (doc_length_histogram, LEN_HIST_SQL)


# -- substring-dedup rewrite (cleaned corpus) ------------------------------

def doc_substring_dedup(spark, sf_dir):
    """The rewrite step of exact-substring dedup: tokens covered by a
    corpus-duplicated word-8-gram are dropped except in the gram's
    lowest-id (canonical) document; per-lang accounting of the removal
    plus an order-free md5-XOR digest of every cleaned text, so the
    value hash certifies the whole rewritten corpus without shipping
    it (text.remove_duplicate_spans)."""
    cleaned = text.remove_duplicate_spans(_docs(spark, sf_dir))
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    # 40-bit per-doc digest: summable over millions of docs without
    # BIGINT overflow, still collision-negligible for a corpus check
    dig = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col("doc_id"), F.col("cleaned"))), 1, 10), 16, 10) \
        .cast("long")
    return (cleaned.join(d, "doc_id")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_removed").alias("tokens_removed"),
                 F.sum("n_tokens").alias("tokens_total"),
                 F.sum(dig).alias("corpus_digest"))
            .orderBy("lang"))


SUBDEDUP_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t,
         len(regexp_split_to_array(trim(lower(text)), '\s+')) AS nt
  FROM documents),
 grid AS (
  SELECT doc_id, gs - 1 AS pos, t[gs] AS tok
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS gs)),
 gbase AS (SELECT doc_id, t, nt FROM toks WHERE nt >= 8),
 gpos AS (
  SELECT doc_id, t, unnest(generate_series(1, nt - 7)) AS gs FROM gbase),
 grams AS (
  SELECT doc_id, gs - 1 AS pos,
         array_to_string(list_slice(t, gs, gs + 7), ' ') AS gram
  FROM gpos),
 stats AS (
  SELECT gram, MIN(doc_id) AS first_id
  FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
 hits AS (
  SELECT g.doc_id, g.pos, 1 AS hit
  FROM grams g JOIN stats s USING (gram)
  WHERE g.doc_id <> s.first_id),
 marked AS (
  SELECT gr.doc_id, gr.pos, gr.tok,
         COALESCE(MAX(h.hit) OVER (PARTITION BY gr.doc_id ORDER BY gr.pos
                     ROWS BETWEEN 7 PRECEDING AND CURRENT ROW), 0) AS m
  FROM grid gr LEFT JOIN hits h
    ON gr.doc_id = h.doc_id AND gr.pos = h.pos),
 cleaned AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(m) AS BIGINT) AS n_removed,
         COALESCE(string_agg(CASE WHEN m = 0 THEN tok END,
                             ' ' ORDER BY pos), '') AS cleaned
  FROM marked GROUP BY doc_id)
SELECT d.lang, COUNT(*) AS n_docs,
       CAST(SUM(c.n_removed) AS BIGINT) AS tokens_removed,
       CAST(SUM(c.n_tokens) AS BIGINT) AS tokens_total,
       CAST(SUM(CAST(('0x' || substring(md5(CAST(c.doc_id AS VARCHAR)
                 || ':' || c.cleaned), 1, 10)) AS BIGINT)) AS BIGINT)
         AS corpus_digest
FROM cleaned c JOIN documents d USING (doc_id)
GROUP BY d.lang ORDER BY d.lang
"""


QUERIES["doc_substring_dedup"] = (doc_substring_dedup, SUBDEDUP_SQL)


def multimodal_qoi_decode(spark, sf_dir):
    """REAL QOI decode (qoiformat.org; full op set), value-oracled
    end-to-end: per doc, synthesize an 8×8 two-color checkerboard
    (c1 = id·{11,29,53}, c2 = id·{7,13,17} mod 256), encode with the
    pure-numpy QOI encoder (RUN/INDEX/DIFF/LUMA/RGB ops all reachable),
    decode via decode_image_features(decoder="qoi"). A checkerboard's
    mean luma is exactly (luma(c1)+luma(c2))/2 — np.mean's pairwise
    summation over alternating values reduces to the same single
    rounding the SQL expression performs, so the hash certifies the
    whole chunk-walk decode. n_bytes is format-internal (first-pixel op
    length varies by color) and deliberately not emitted."""
    import numpy as np
    import pandas as pd

    from heracles_spark.operators import multimodal
    from heracles_spark.operators.media_codecs import encode_qoi

    d = _docs(spark, sf_dir).where(F.col("doc_id") <= 50).select("doc_id")

    def synth(it):
        for pdf in it:
            blobs = []
            for i in pdf["doc_id"]:
                i = int(i)
                c1 = (i * 11 % 256, i * 29 % 256, i * 53 % 256)
                c2 = (i * 7 % 256, i * 13 % 256, i * 17 % 256)
                px = np.empty((8, 8, 3), dtype=np.uint8)
                for y in range(8):
                    for x in range(8):
                        px[y, x] = c1 if (x + y) % 2 == 0 else c2
                blobs.append(encode_qoi(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": blobs})

    media = d.mapInPandas(synth, schema="doc_id long, content binary")
    feats = multimodal.decode_image_features(media, decoder="qoi")
    return (feats.select("doc_id",
                         F.round("mean_luma", 6).alias("mean_luma"))
                 .orderBy("doc_id"))


MQOI_SQL = """
SELECT doc_id,
       ROUND(((0.299 * (doc_id * 11 % 256) + 0.587 * (doc_id * 29 % 256)
               + 0.114 * (doc_id * 53 % 256))
            + (0.299 * (doc_id * 7 % 256) + 0.587 * (doc_id * 13 % 256)
               + 0.114 * (doc_id * 17 % 256))) / 2 / 255.0, 6)
         AS mean_luma
FROM documents WHERE doc_id <= 50 ORDER BY doc_id
"""


QUERIES["multimodal_qoi_decode"] = (multimodal_qoi_decode, MQOI_SQL)


# -- tokenize-to-ids (vocab induction + encoding) --------------------------

def doc_tokenize_ids(spark, sf_dir):
    """The last pipeline step before training: build a 500-term
    frequency-ranked vocabulary over the corpus (deterministic
    (freq DESC, term) tie-break) and encode each doc ≤ 100 to id
    sequences, OOV → -1 (text.build_vocab + text.encode_ids —
    broadcast vocab join, ordered reassembly). Ids ship as a CSV
    string so the value hash certifies every position of every
    sequence."""
    d = _docs(spark, sf_dir)
    vocab = text.build_vocab(d, size=500)
    enc = text.encode_ids(d.where(F.col("doc_id") <= 100), vocab)
    return (enc.select("doc_id", "n_tokens", "n_oov",
                       F.concat_ws(",", F.col("ids").cast("array<string>"))
                        .alias("ids_csv"))
               .orderBy("doc_id"))


TOKIDS_SQL = r"""
WITH vterms AS (
  SELECT term, COUNT(*) AS freq FROM (
    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
    FROM documents) GROUP BY term),
 vocab AS (
  SELECT term, rn - 1 AS id FROM (
    SELECT term, ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS rn
    FROM vterms) WHERE rn <= 500),
 posed AS (
  SELECT doc_id, gs - 1 AS pos, t[gs] AS term
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE doc_id <= 100) base,
       LATERAL (SELECT unnest(generate_series(1, len(t))) AS gs)),
 enc AS (
  SELECT p.doc_id, p.pos, COALESCE(v.id, -1) AS id
  FROM posed p LEFT JOIN vocab v USING (term))
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN id = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids_csv
FROM enc GROUP BY doc_id ORDER BY doc_id
"""


QUERIES["doc_tokenize_ids"] = (doc_tokenize_ids, TOKIDS_SQL)


# -- runtime bloom-filter join pruning -------------------------------------

def lineitem_bloom_filter_join(spark, sf_dir):
    """Runtime filtering for selective shuffle joins: Spark injects a
    bloom filter built from the SELECTIVE side (high-value orders) into
    the probe side's scan, so lineitem rows that cannot join are
    dropped BEFORE the join exchange — at 100 TB that is the difference
    between shuffling the full fact table and shuffling the ~matching
    slice. The tiny test corpus sits under the 10 GB
    application-side default, so the threshold conf is lowered to let
    the optimizer fire here; at production scale it fires on the
    defaults. ``runtime_filter_applied`` is pinned TRUE by the oracle —
    the value hash certifies the bloom actually landed in the plan
    (might_contain + bloom_filter_agg). Broadcast is disabled while
    THIS plan is constructed (runtime filters target shuffle joins; a
    broadcast join needs none) and restored after the executed plan is
    cached."""
    from heracles_spark.plans import executed_plan_string

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        # the runtime filter targets shuffle joins; disable broadcast
        # while THIS plan is constructed (restored in finally — the
        # executed plan is cached before restore)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
                  .where(F.col("o_totalprice") > 400000))
        j = (l.join(o, l.l_orderkey == o.o_orderkey)
              .groupBy("o_orderpriority")
              .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)"))
                    .cast("double").alias("total_qty"),
                   F.count(F.lit(1)).alias("n_lines")))
        # Forcing the executed plan CACHES it in the QueryExecution, so
        # the conf restore below cannot un-inject the filter later.
        plan = executed_plan_string(j, "simple")
        applied = "bloomfilter" in plan.lower().replace("_", "")
        out = (j.select("o_orderpriority", "total_qty", "n_lines",
                        F.lit(applied).alias("runtime_filter_applied"))
                .orderBy("o_orderpriority"))
        executed_plan_string(out, "simple")       # cache final plan too
        return out
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


BLOOMJ_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty,
       COUNT(*) AS n_lines, TRUE AS runtime_filter_applied
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice > 400000
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES["lineitem_bloom_filter_join"] = (lineitem_bloom_filter_join,
                                         BLOOMJ_SQL)


# -- dynamic partition pruning ---------------------------------------------

def orders_partition_pruned_join(spark, sf_dir):
    """Dynamic partition pruning: orders re-written hive-partitioned by
    o_orderpriority (the COPY ... PARTITION BY layout), joined to a
    filtered dimension — Spark injects the dim's surviving keys into
    the fact scan's PartitionFilters (dynamicpruningexpression), so
    whole partition directories are skipped at runtime. At 100 TB this
    is the first-line scan eliminator for star joins on partitioned
    facts. ``dpp_applied`` is pinned TRUE by the oracle, certifying the
    pruning expression landed in the executed plan."""
    import tempfile

    from heracles_spark.plans import executed_plan_string

    base = tempfile.mkdtemp(prefix="heracles_dpp_")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (o.write.partitionBy("o_orderpriority").mode("overwrite")
      .parquet(f"{base}/fact"))
    (o.select("o_orderpriority").distinct()
      .withColumn("rank",
                  F.substring("o_orderpriority", 1, 1).cast("int"))
      .write.mode("overwrite").parquet(f"{base}/dim"))

    fact = spark.read.parquet(f"{base}/fact")
    dim = (spark.read.parquet(f"{base}/dim")
                .where(F.col("rank") <= 2)
                .select(F.col("o_orderpriority").alias("pri")))
    j = (fact.join(dim, fact.o_orderpriority == dim.pri)
             .groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
                   .cast("double").alias("total_price")))
    plan = executed_plan_string(j, "simple")
    applied = "dynamicpruning" in plan.lower()
    out = (j.select("o_orderpriority", "n_orders", "total_price",
                    F.lit(applied).alias("dpp_applied"))
            .orderBy("o_orderpriority"))
    executed_plan_string(out, "simple")
    return out


DPP_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
         AS total_price,
       TRUE AS dpp_applied
FROM orders
WHERE CAST(substring(o_orderpriority, 1, 1) AS INTEGER) <= 2
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES["orders_partition_pruned_join"] = (orders_partition_pruned_join,
                                           DPP_SQL)


# -- approximate frequent items (approx_top_k sketch) -----------------------

def doc_approx_topk_terms(spark, sf_dir):
    """Frequent-items sketch (Spark 4 approx_top_k over exploded
    tokens). The returned ITEM SET at the k-th boundary is
    tie-nondeterministic, so the contract pins what is invariant:
    (1) every returned (item, count) matches the exact term count;
    (2) every term strictly more frequent than the least-returned
    count is in the returned set; (3) exactly k items return. All
    three booleans pinned TRUE by the oracle."""
    d = _docs(spark, sf_dir)
    terms = d.select(F.explode(text.tokens(F.col("text"))).alias("term"))
    sk = (terms.agg(F.expr("approx_top_k(term, 10, 10000)").alias("tk"))
               .select(F.explode("tk").alias("e"))
               .select(F.col("e.item").alias("term"),
                       F.col("e.count").alias("cnt")))
    sk = sk.localCheckpoint()   # one sketch evaluation, three consumers
    exact = terms.groupBy("term").agg(F.count(F.lit(1)).alias("xcnt"))
    counts_match = (sk.join(exact, "term", "left")
                      .agg((F.count(F.lit(1)) == F.sum(
                          (F.col("cnt") == F.col("xcnt")).cast("int")))
                          .alias("ok")))
    min_ret = sk.agg(F.min("cnt").alias("mn"))
    covers = (exact.crossJoin(min_ret)
                   .where(F.col("xcnt") > F.col("mn"))
                   .join(sk.select("term"), "term", "left_anti")
                   .agg((F.count(F.lit(1)) == 0).alias("covers")))
    n = sk.agg(F.count(F.lit(1)).alias("n_returned"))
    return (n.crossJoin(counts_match).crossJoin(covers)
             .select("n_returned", F.col("ok").alias("counts_match"),
                     F.col("covers").alias("covers_strict")))


TOPK_SQL = """
SELECT CAST(10 AS BIGINT) AS n_returned, TRUE AS counts_match,
       TRUE AS covers_strict
"""


QUERIES["doc_approx_topk_terms"] = (doc_approx_topk_terms, TOPK_SQL)


# -- BM25 ranking (rational-idf, engine-stable) ------------------------------

# (process, sf_dir) → metastore dir of the built postings index: the
# deployment shape is build-once/probe-many, so repeat calls probe.
_BM25_INDEX_CACHE: dict[str, str] = {}

# doc_ngram_jaccard's sampled-exact ground truth, parquet-materialized
# per (process, sf_dir) — see the query docstring.
_NGJ_EXACT_CACHE: dict[str, str] = {}

def doc_bm25_ranking(spark, sf_dir):
    """BM25 retrieval scoring for the query {vector, stream, merge}
    (k1=1.2, b=0.75). Engine-stable form: the idf uses the RATIONAL
    core (N - df + 0.5)/(df + 0.5) + 1 without the log wrapper (same
    ranking direction, no libm last-ulp hazard — the doc_top_tfidf_term
    precedent), and the 3 per-term scores add in FIXED column order
    (conditional-aggregation pivot), so every float op is one
    correctly-rounded IEEE step reproduced identically by the oracle.
    Top 15 docs by (score DESC, doc_id)."""
    d = _docs(spark, sf_dir)
    qterms = ["merge", "stream", "vector"]

    toks = d.select("doc_id",
                    F.explode(text.tokens(F.col("text"))).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("len").alias("sum_len"))
    tf = (toks.where(F.col("term").isin(qterms))
              .groupBy("doc_id", "term")
              .agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    base = (tf.join(F.broadcast(df_), "term")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats)))
    avglen = F.col("sum_len").cast("double") / F.col("n_docs")
    idf = ((F.col("n_docs") - F.col("df") + F.lit(0.5))
           / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    tfs = (F.col("tf") * F.lit(2.2)
           / (F.col("tf") + F.lit(1.2)
              * (F.lit(0.25) + F.lit(0.75) * F.col("len") / avglen)))
    scored = base.select("doc_id", "term", (idf * tfs).alias("s"))
    per_doc = scored.groupBy("doc_id").agg(
        *[F.max(F.when(F.col("term") == t, F.col("s"))).alias(f"s_{t}")
          for t in qterms])
    total = (F.coalesce(F.col("s_merge"), F.lit(0.0))
             + F.coalesce(F.col("s_stream"), F.lit(0.0))
             + F.coalesce(F.col("s_vector"), F.lit(0.0)))
    return (per_doc.select("doc_id", F.round(total, 6).alias("bm25"))
                   .orderBy(F.desc("bm25"), "doc_id").limit(15))


BM25_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents),
 dl AS (SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY doc_id),
 stats AS (SELECT COUNT(*) AS n_docs,
                  CAST(SUM(len) AS BIGINT) AS sum_len FROM dl),
 tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
        WHERE term IN ('merge', 'stream', 'vector')
        GROUP BY doc_id, term),
 dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
 scored AS (
  SELECT t.doc_id, t.term,
         ((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (t.tf * 2.2
            / (t.tf + 1.2 * (0.25 + 0.75 * l.len
                             / (CAST(s.sum_len AS DOUBLE) / s.n_docs))))
           AS sc
  FROM tf t JOIN dfr d USING (term) JOIN dl l USING (doc_id), stats s),
 per_doc AS (
  SELECT doc_id,
         MAX(CASE WHEN term = 'merge' THEN sc END) AS s_merge,
         MAX(CASE WHEN term = 'stream' THEN sc END) AS s_stream,
         MAX(CASE WHEN term = 'vector' THEN sc END) AS s_vector
  FROM scored GROUP BY doc_id)
SELECT doc_id,
       ROUND(COALESCE(s_merge, 0.0) + COALESCE(s_stream, 0.0)
             + COALESCE(s_vector, 0.0), 6) AS bm25
FROM per_doc ORDER BY bm25 DESC, doc_id LIMIT 15
"""


QUERIES["doc_bm25_ranking"] = (doc_bm25_ranking, BM25_SQL)


def doc_bm25_indexed(spark, sf_dir):
    """BM25 answered from an INVERTED TEXT INDEX instead of a corpus
    scan: postings (term, doc_id, tf) land in a key-organized table
    sorted by term, so the 3-term probe prunes to the file(s) whose
    term range MAY contain the query — O(postings-of-terms) IO instead
    of O(corpus), the classic retrieval access path on this engine's
    own storage (pruned scan ≙ the reference's key-range scan).
    Scores are identical to the scan-based doc_bm25_ranking (same
    rational-idf arithmetic; doc lengths from a side table built by
    the same explode); ``files_pruned`` is pinned TRUE, certifying the
    probe skipped index files.

    The index build is memoized per (process, sf_dir) — a deployment
    builds postings ONCE (CREATE TEXT INDEX) and serves every query
    from the probe, so repeat calls (and the bench's timed runs after
    its warm-up pass) measure the probe path, not the one-time build."""
    import os
    import tempfile

    from heracles_spark import pruning, writer
    from heracles_spark.catalog import HeraclesCatalog

    qterms = ["merge", "stream", "vector"]
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id",
                    F.explode(text.tokens(F.col("text"))).alias("term"))

    cache_key = os.path.abspath(sf_dir)
    if cache_key in _BM25_INDEX_CACHE:
        cat = HeraclesCatalog(_BM25_INDEX_CACHE[cache_key])
    else:
        postings = (toks.groupBy("term", "doc_id")
                        .agg(F.count(F.lit(1)).alias("tf")))
        cat = HeraclesCatalog(tempfile.mkdtemp(prefix="heracles_tidx_"))
        cat.create_table("postings",
                         [("term", "string"), ("doc_id", "bigint"),
                          ("tf", "bigint")], ["term"])
        writer.write_key_organized(spark, cat, "postings", postings,
                                   n_buckets=8)
        _BM25_INDEX_CACHE[cache_key] = cat.metastore_dir

    tbl = cat.get_table("postings")
    pred = ("in", "term", qterms)
    keep = pruning.prune_files(tbl.files, pred, tbl.key_cols)
    tf = pruning.scan(spark, cat, "postings", pred)

    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("len").alias("sum_len"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    base = (tf.join(F.broadcast(df_), "term")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats)))
    avglen = F.col("sum_len").cast("double") / F.col("n_docs")
    idf = ((F.col("n_docs") - F.col("df") + F.lit(0.5))
           / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    tfs = (F.col("tf") * F.lit(2.2)
           / (F.col("tf") + F.lit(1.2)
              * (F.lit(0.25) + F.lit(0.75) * F.col("len") / avglen)))
    scored = base.select("doc_id", "term", (idf * tfs).alias("s"))
    per_doc = scored.groupBy("doc_id").agg(
        *[F.max(F.when(F.col("term") == t, F.col("s"))).alias(f"s_{t}")
          for t in qterms])
    total = (F.coalesce(F.col("s_merge"), F.lit(0.0))
             + F.coalesce(F.col("s_stream"), F.lit(0.0))
             + F.coalesce(F.col("s_vector"), F.lit(0.0)))
    return (per_doc.select(
                "doc_id", F.round(total, 6).alias("bm25"),
                F.lit(len(keep) < len(tbl.files)).alias("files_pruned"))
            .orderBy(F.desc("bm25"), "doc_id").limit(15))


BM25_IDX_SQL = BM25_SQL.replace(
    "SELECT doc_id,\n       ROUND(COALESCE(s_merge, 0.0) + COALESCE(s_stream, 0.0)\n             + COALESCE(s_vector, 0.0), 6) AS bm25\nFROM per_doc ORDER BY bm25 DESC, doc_id LIMIT 15",
    "SELECT doc_id,\n       ROUND(COALESCE(s_merge, 0.0) + COALESCE(s_stream, 0.0)\n             + COALESCE(s_vector, 0.0), 6) AS bm25,\n       TRUE AS files_pruned\nFROM per_doc ORDER BY bm25 DESC, doc_id LIMIT 15")


QUERIES["doc_bm25_indexed"] = (doc_bm25_indexed, BM25_IDX_SQL)


# -- winnowing fingerprint near-dup pairs ----------------------------------

def doc_winnowing_pairs(spark, sf_dir):
    """Winnowing-style fingerprint matching (the MOSS scheme family):
    hash word-4-grams, SELECT positions whose hash is the minimum
    within a ±4-position window (the local-minimum winnowing variant —
    window-expressible, guarantees selections spread through the doc),
    and pair documents sharing ≥ 3 selected fingerprints. Because the
    gram hash is md5-derived (not engine-private), the ENTIRE pipeline
    — selection, pairing, counts — is value-exact on both engines: a
    full oracle, no recall contract needed. Selection density ~1/w
    keeps the pair join on ~25% of grams; the bucket cap (≤ 50 docs
    per fingerprint) is the same degenerate-value skew guard the LSH
    banding uses."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    n, w, min_shared = 4, 5, 3
    toks = d.select("doc_id",
                    F.col("text").alias("__t")) \
            .select("doc_id",
                    text.tokens(F.col("__t")).alias("__toks")) \
            .where(F.array_size("__toks") >= n)
    grams = toks.select(
        "doc_id",
        F.posexplode(F.expr(
            f"transform(sequence(0, array_size(__toks) - {n}), "
            f"i -> concat_ws(' ', slice(__toks, i + 1, {n})))"
        )).alias("pos", "gram"))
    h = F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10) \
         .cast("long")
    hashed = grams.select("doc_id", "pos", h.alias("h"))
    win = (Window.partitionBy("doc_id").orderBy("pos")
                 .rowsBetween(-(w - 1), w - 1))
    sel = (hashed.withColumn("__mn", F.min("h").over(win))
                 .where(F.col("h") == F.col("__mn"))
                 .select("doc_id", "h").distinct())
    # skew guard: a fingerprint shared by a degenerate number of docs
    # is a stop-gram, not a near-dup signal
    ok = (sel.groupBy("h").agg(F.count(F.lit(1)).alias("__n"))
             .where(F.col("__n") <= 50).select("h"))
    s2 = sel.join(ok, "h")
    a = s2.select(F.col("doc_id").alias("id_a"), "h")
    b = s2.select(F.col("doc_id").alias("id_b"), "h")
    return (a.join(b, "h")
             .where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("n_shared"))
             .where(F.col("n_shared") >= min_shared)
             .orderBy("id_a", "id_b"))


WINNOW_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t,
         len(regexp_split_to_array(trim(lower(text)), '\s+')) AS nt
  FROM documents
  WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 4),
 posd AS (
  SELECT doc_id, t, unnest(generate_series(1, nt - 3)) AS gs FROM toks),
 hashed AS (
  SELECT doc_id, gs - 1 AS pos,
         CAST(('0x' || substring(md5(
             array_to_string(list_slice(t, gs, gs + 3), ' ')), 1, 15))
              AS BIGINT) AS h
  FROM posd),
 sel AS (
  SELECT DISTINCT doc_id, h FROM (
    SELECT doc_id, h,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN 4 PRECEDING AND 4 FOLLOWING) AS mn
    FROM hashed) WHERE h = mn),
 ok AS (SELECT h FROM sel GROUP BY h HAVING COUNT(*) <= 50),
 s2 AS (SELECT sel.doc_id, sel.h FROM sel JOIN ok USING (h))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
FROM s2 a JOIN s2 b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 3
ORDER BY id_a, id_b
"""


QUERIES["doc_winnowing_pairs"] = (doc_winnowing_pairs, WINNOW_SQL)


# -- end-to-end near-dup curation ------------------------------------------

_QUALITY_SQL_EXPR = """ROUND(0.4 * least(len(string_split_regex(trim(lower(text)),
                                                  '\\s+')) / 100.0, 1.0)
             + 0.4 * greatest(0.0, 1.0 - 2 * (
                 (length(regexp_replace(text,
                     '[^.,;:!?''"()\\[\\]{}-]', '', 'g'))
                  / CAST(length(text) AS DOUBLE))
               + (length(regexp_replace(text, '[^0-9]', '', 'g'))
                  / CAST(length(text) AS DOUBLE))))
             + 0.2 * least(4.0 * len(list_filter(
                   string_split_regex(trim(lower(text)), '\\s+'),
                   t -> list_contains(['the','and','of','to','in','is',
                     'that','it','for','was','on','are','with','as','at',
                     'this','have','from','or'], t)))
                 / len(string_split_regex(trim(lower(text)), '\\s+')),
                 1.0), 6)"""


def doc_near_dedup_curation(spark, sf_dir):
    """The full near-dup CURATION recipe in one query: SimHash
    hamming-≤3 edges → connected components → ONE canonical doc per
    cluster (highest quality score, id tie-break; singletons keep
    themselves) → per-lang kept/dropped accounting. Composes the
    iterative graph operator with the quality ranker under a full
    value oracle (edges + closure + ranking all SQL-reproducible)."""
    from pyspark.sql import Window

    from heracles_spark.operators.graph import connected_components

    d = text.with_quality_score(_docs(spark, sf_dir))
    pairs = dedup.simhash_near_dup_pairs(_docs(spark, sf_dir), k=3,
                                         hash_fn="md5")
    # Star contraction (the default): O(log n) rounds regardless of
    # cluster diameter. Label propagation with a fixed cap could leave
    # long duplicate chains split while the oracle computes the exact
    # closure (it now raises instead of returning wrong labels, but
    # the curation recipe should not be the query that trips it).
    comp = connected_components(pairs)
    labeled = (d.join(comp.withColumnRenamed("id", "doc_id"),
                      "doc_id", "left")
                .withColumn("component",
                            F.coalesce(F.col("component"),
                                       F.col("doc_id"))))
    w = (Window.partitionBy("component")
               .orderBy(F.desc("quality_score"), F.col("doc_id")))
    ranked = labeled.withColumn("rn", F.row_number().over(w))
    return (ranked.groupBy("lang")
                  .agg(F.count(F.lit(1)).alias("n_docs"),
                       F.sum((F.col("rn") == 1).cast("long"))
                        .alias("n_kept"),
                       F.sum((F.col("rn") > 1).cast("long"))
                        .alias("n_dropped"))
                  .orderBy("lang"))


CURATION_SQL = f"""
WITH RECURSIVE ex AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents),
 th AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
  FROM ex),
 votes AS (SELECT doc_id, {{_SH_VOTES}} FROM th GROUP BY doc_id),
 sigs AS (SELECT doc_id, {{_SH_SIG}} AS simhash FROM votes),
 edges AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
 sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
 reach(n, r) AS (
  SELECT u, u FROM sym
  UNION
  SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.n),
 labels AS (SELECT n AS id, MIN(r) AS component FROM reach GROUP BY n),
 comp AS (
  SELECT d.doc_id, d.lang, COALESCE(l.component, d.doc_id) AS component,
         {_QUALITY_SQL_EXPR} AS q
  FROM documents d LEFT JOIN labels l ON d.doc_id = l.id),
 ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY component
              ORDER BY q DESC, doc_id) AS rn
  FROM comp)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped
FROM ranked GROUP BY lang ORDER BY lang
"""
CURATION_SQL = (CURATION_SQL
                .replace("{_SH_VOTES}", _SH_VOTES)
                .replace("{_SH_SIG}", _SH_SIG))


QUERIES["doc_near_dedup_curation"] = (doc_near_dedup_curation,
                                      CURATION_SQL)


def embedding_dim_stats(spark, sf_dir):
    """Per-dimension corpus statistics — the embedding health check
    (dead dims, scale drift, variance collapse) run before indexing a
    vector corpus. Mean and variance from integer-microunit sums
    (order-free exact, the label_centroids discipline; sum of squares
    in micro² units) with single rounded divisions at the end."""
    e = _embs(spark, sf_dir)
    x = F.col("x").cast("double")
    micro = F.round(x * 1_000_000).cast("long")
    stats = (e.select(F.posexplode("embedding").alias("dim", "x"))
              .select("dim", micro.alias("m"))
              .groupBy("dim")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("m").alias("s1"),
                   F.sum(F.col("m") * F.col("m")).alias("s2")))
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n / 1e6
    var = ((F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1") / n)
           / (n - 1)) / 1e12
    return (stats.select("dim", "n",
                         F.round(mean, 6).alias("mean"),
                         F.round(var, 6).alias("variance"))
                 .orderBy("dim"))


DIM_STATS_SQL = """
WITH ex AS (
  SELECT CAST(gs - 1 AS INTEGER) AS dim,
         CAST(ROUND(CAST(embedding[gs] AS DOUBLE) * 1000000)
              AS BIGINT) AS m
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS gs)),
 s AS (SELECT dim, COUNT(*) AS n,
              CAST(SUM(m) AS BIGINT) AS s1,
              CAST(SUM(m * m) AS BIGINT) AS s2
       FROM ex GROUP BY dim)
SELECT dim, n,
       ROUND(CAST(s1 AS DOUBLE) / n / 1e6, 6) AS mean,
       ROUND((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
             / (n - 1) / 1e12, 6) AS variance
FROM s ORDER BY dim
"""


QUERIES["embedding_dim_stats"] = (embedding_dim_stats, DIM_STATS_SQL)


def doc_source_diversity(spark, sf_dir):
    """Corpus diversity per lang: Gini-Simpson index 1 − Σ pᵢ² over
    the source distribution — the mix-health metric a corpus builder
    watches (0 = one source dominates, →1 = evenly mixed). Chosen over
    Shannon entropy deliberately: it is RATIONAL in the counts (two
    exact integer aggs + one rounded division chain), so the value is
    engine-exact with no libm log in sight."""
    d = _docs(spark, sf_dir)
    per = (d.groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("c")))
    return (per.groupBy("lang")
               .agg(F.sum("c").alias("n_docs"),
                    F.count(F.lit(1)).alias("n_sources"),
                    F.round(F.lit(1.0)
                            - F.sum(F.col("c") * F.col("c")).cast("double")
                            / (F.sum("c") * F.sum("c")).cast("double"), 6)
                     .alias("gini_simpson"))
               .orderBy("lang"))


DIVERSITY_SQL = """
WITH per AS (
  SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY 1, 2)
SELECT lang, CAST(SUM(c) AS BIGINT) AS n_docs,
       COUNT(*) AS n_sources,
       ROUND(1.0 - CAST(SUM(c * c) AS DOUBLE)
             / CAST(SUM(c) * SUM(c) AS DOUBLE), 6) AS gini_simpson
FROM per GROUP BY lang ORDER BY lang
"""


QUERIES["doc_source_diversity"] = (doc_source_diversity, DIVERSITY_SQL)


def doc_ngram_coverage(spark, sf_dir):
    """Train→eval n-gram coverage: after the deterministic hash split,
    what fraction of each lang's DISTINCT eval word-bigrams appears in
    the train split — the generalization-gap smell test (low coverage
    ⇒ the eval set probes truly unseen text; suspiciously high ⇒
    leakage, the decontamination signal from the other direction).
    Bigrams travel as md5-derived longs (engine-portable); one rational
    division per lang."""
    from heracles_spark.operators.sampling import hash_split

    d = hash_split(_docs(spark, sf_dir), "doc_id")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    big = (d.select("lang", "split", toks.alias("__t"))
            .where(F.array_size("__t") >= 2)
            .select("lang", "split", F.expr(
                "transform(sequence(0, array_size(__t) - 2), i -> "
                "conv(substring(md5(concat_ws(' ', __t[i], __t[i+1])),"
                " 1, 15), 16, 10))").alias("__g"))
            .select("lang", "split", F.explode("__g").alias("__gs"))
            .select("lang", "split",
                    F.col("__gs").cast("long").alias("g")))
    train = (big.where(F.col("split") == "train")
                .select("lang", "g").distinct())
    evalg = (big.where(F.col("split") == "eval")
                .select("lang", "g").distinct())
    cov = (evalg.join(train, ["lang", "g"], "left_semi")
                .groupBy("lang").agg(F.count(F.lit(1)).alias("covered")))
    tot = evalg.groupBy("lang").agg(F.count(F.lit(1)).alias("total"))
    return (tot.join(cov, "lang", "left")
               .select("lang", "total",
                       F.coalesce(F.col("covered"), F.lit(0))
                        .alias("covered"),
                       F.round(F.coalesce(F.col("covered"), F.lit(0))
                               .cast("double") / F.col("total"), 6)
                        .alias("coverage"))
               .orderBy("lang"))


NGRAM_COV_SQL = r"""
WITH d AS (
  SELECT lang, text,
         CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                        1, 8)) AS BIGINT) % 100 < 80
              THEN 'train' ELSE 'eval' END AS split
  FROM documents),
 t AS (SELECT lang, split,
              regexp_split_to_array(trim(lower(text)), '\s+') AS tk
       FROM d),
 g AS (
  SELECT lang, split,
         CAST(('0x' || substring(md5(tk[gs] || ' ' || tk[gs + 1]), 1, 15))
              AS BIGINT) AS g
  FROM (SELECT lang, split, tk,
               unnest(generate_series(1, len(tk) - 1)) AS gs
        FROM t)),
 train AS (SELECT DISTINCT lang, g FROM g WHERE split = 'train'),
 ev AS (SELECT DISTINCT lang, g FROM g WHERE split = 'eval'),
 cov AS (
  SELECT e.lang, COUNT(*) AS covered
  FROM ev e JOIN train t ON e.lang = t.lang AND e.g = t.g
  GROUP BY e.lang),
 tot AS (SELECT lang, COUNT(*) AS total FROM ev GROUP BY lang)
SELECT tot.lang, tot.total,
       CAST(COALESCE(cov.covered, 0) AS BIGINT) AS covered,
       ROUND(CAST(COALESCE(cov.covered, 0) AS DOUBLE) / tot.total, 6)
         AS coverage
FROM tot LEFT JOIN cov ON tot.lang = cov.lang
ORDER BY tot.lang
"""


QUERIES["doc_ngram_coverage"] = (doc_ngram_coverage, NGRAM_COV_SQL)


# -- DSIR importance resampling --------------------------------------------

def doc_dsir_topk(spark, sf_dir):
    """DSIR-style data selection (Xie et al. 2023): rank the RAW pool
    (sources outside src0-src2) by how target-like their hashed
    token-bucket histogram is, target = docs from src0-src2. The score
    is the all-integer probability-difference inner product
    (operators.sampling.importance_scores — no libm, so the oracle
    reproduces it bit-for-bit); top 20 by (score DESC, doc_id) is the
    selected training slice."""
    from heracles_spark.operators import sampling

    d = _docs(spark, sf_dir)
    tgt_sources = ("src0", "src1", "src2")
    scores = sampling.importance_scores(
        d, F.col("source").isin(*tgt_sources))
    return (d.select("doc_id", "lang", "source")
             .join(scores, "doc_id")
             .where(~F.col("source").isin(*tgt_sources))
             .orderBy(F.desc("score"), "doc_id")
             .limit(20))


DSIR_SQL = r"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents),
 b AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT) % 64
              AS INT) AS b,
         CASE WHEN source IN ('src0','src1','src2') THEN 1 ELSE 0 END AS t
  FROM toks),
 bucket AS (SELECT b, CAST(SUM(t) AS BIGINT) AS tb,
                   CAST(SUM(1 - t) AS BIGINT) AS sb
            FROM b GROUP BY b),
 totals AS (SELECT CAST(SUM(tb) AS BIGINT) AS tt,
                   CAST(SUM(sb) AS BIGINT) AS ss FROM bucket),
 w AS (SELECT b, tb * ss - sb * tt AS w FROM bucket, totals),
 per_doc AS (SELECT doc_id, b, COUNT(*) AS c FROM b GROUP BY doc_id, b),
 scored AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
         CAST(SUM(c * w) AS BIGINT) AS score
  FROM per_doc JOIN w USING (b) GROUP BY doc_id)
SELECT d.doc_id, d.lang, d.source, s.n_grams, s.score
FROM documents d JOIN scored s USING (doc_id)
WHERE d.source NOT IN ('src0', 'src1', 'src2')
ORDER BY s.score DESC, d.doc_id LIMIT 20
"""


QUERIES["doc_dsir_topk"] = (doc_dsir_topk, DSIR_SQL)


# -- semantic dedup (SemDeDup-shaped) ---------------------------------------

def embedding_semdedup(spark, sf_dir):
    """Semantic dedup over the embedding space (the SemDeDup recipe,
    Abbas et al. 2023 — drop all-but-one of each semantic-duplicate
    cluster): cosine-≥0.42 pairs → connected components (star
    contraction) → keep the min-id representative per cluster →
    per-label kept/dropped accounting. Pairs come from the exact
    panel-GEMM baseline so the WHOLE chain (pairs + closure + pick) is
    one full value oracle; at 100 TB the pair stage swaps to the
    LSH-bucketed variant (embedding_near_dup_pairs) with this exact
    form as the sampled-recall auditor."""
    from pyspark.sql import Window

    from heracles_spark.operators.graph import connected_components

    e = _embs(spark, sf_dir)
    pairs = similarity.cosine_all_pairs(e, threshold=0.42)
    comp = connected_components(pairs, "id_a", "id_b")
    labeled = (e.select("vec_id", "label")
                .join(comp.withColumnRenamed("id", "vec_id"),
                      "vec_id", "left")
                .withColumn("component",
                            F.coalesce(F.col("component"),
                                       F.col("vec_id"))))
    w = Window.partitionBy("component").orderBy("vec_id")
    ranked = labeled.withColumn("rn", F.row_number().over(w))
    return (ranked.groupBy("label")
                  .agg(F.count(F.lit(1)).alias("n_vecs"),
                       F.sum((F.col("rn") == 1).cast("long"))
                        .alias("n_kept"),
                       F.sum((F.col("rn") > 1).cast("long"))
                        .alias("n_dropped"))
                  .orderBy("label"))


SEMDEDUP_SQL = """
WITH RECURSIVE norms AS (
  SELECT vec_id,
         SQRT(SUM(CAST(embedding[i] AS DOUBLE)
                  * CAST(embedding[i] AS DOUBLE))) AS nrm
  FROM embeddings, range(1, 65) t(i) GROUP BY vec_id),
 dots AS (
  SELECT a.vec_id AS u, b.vec_id AS v,
         SUM(CAST(a.embedding[i] AS DOUBLE)
             * CAST(b.embedding[i] AS DOUBLE)) AS dot
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id,
       range(1, 65) t(i)
  GROUP BY 1, 2),
 edges AS (
  SELECT u, v FROM dots
  JOIN norms na ON u = na.vec_id JOIN norms nb ON v = nb.vec_id
  WHERE ROUND(dot / (na.nrm * nb.nrm), 6) >= 0.42),
 sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
 reach(n, r) AS (
  SELECT u, u FROM sym
  UNION
  SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.n),
 labels AS (SELECT n AS id, MIN(r) AS component FROM reach GROUP BY n),
 comp AS (
  SELECT e.vec_id, e.label, COALESCE(l.component, e.vec_id) AS component
  FROM embeddings e LEFT JOIN labels l ON e.vec_id = l.id),
 ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY component
                               ORDER BY vec_id) AS rn
  FROM comp)
SELECT label, COUNT(*) AS n_vecs,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped
FROM ranked GROUP BY label ORDER BY label
"""


QUERIES["embedding_semdedup"] = (embedding_semdedup, SEMDEDUP_SQL)


# -- BPE training statistics -------------------------------------------------

def doc_bpe_pair_stats(spark, sf_dir):
    """The distributed workload inside a BPE merge round (Sennrich et
    al. 2016; operators.text.bpe_pair_counts): word-TYPE frequency
    table (the corpus is touched once; rounds then work on the
    vocabulary-sized relation) → map-only adjacent-pair derivation
    (arrays_zip against the 1-shifted slice, no window) → combinable
    frequency-weighted count. Top 15 pairs by (count DESC, a, b) — the
    argmax the merge loop consumes, under a full value oracle. The
    iterative loop itself (bpe_train / bpe_segment) is golden-tested
    against a pure-Python Sennrich implementation in tests/test_text.py."""
    from heracles_spark.operators.text import bpe_pair_counts, tokens

    d = _docs(spark, sf_dir)
    toks = d.select(F.explode(tokens(F.col("text"))).alias("w0"))
    words = (toks.groupBy("w0").agg(F.count(F.lit(1)).alias("freq"))
                 .select(F.split(F.concat(F.col("w0"), F.lit("▁")), "")
                          .alias("syms"), "freq"))
    return (bpe_pair_counts(words)
            .orderBy(F.desc("pair_count"), "a", "b")
            .limit(15))


BPE_SQL = r"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w0
  FROM documents),
 words AS (SELECT w0 || '▁' AS w, COUNT(*) AS freq FROM toks GROUP BY w0),
 idx AS (SELECT w, freq,
                unnest(generate_series(1, length(w) - 1)) AS i
         FROM words),
 pc AS (
  SELECT substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b,
         CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM idx GROUP BY 1, 2)
SELECT a, b, pair_count FROM pc
ORDER BY pair_count DESC, a, b LIMIT 15
"""


QUERIES["doc_bpe_pair_stats"] = (doc_bpe_pair_stats, BPE_SQL)


# -- exact second-moment accumulation (PCA/whitening input) ------------------

def embedding_covariance(spark, sf_dir):
    """Distributed Gram/second-moment matrix over the embedding corpus
    (similarity.covariance_accumulate) — the input PCA/whitening needs:
    per-partition numpy X^T X panels over Arrow batches, combinable
    dim×dim sum, INTEGER-MICROUNIT entries so the 2080-row upper
    triangle is order-free exact and fully value-oracled (the DuckDB
    side recomputes every term). The eigendecomposition consumes this
    4096-number result driver-side — the classic big-n/small-d split."""
    e = _embs(spark, sf_dir)
    return (similarity.covariance_accumulate(e)
            .orderBy("i", "j"))


COV_SQL = """
SELECT i.i - 1 AS i, j.j - 1 AS j, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(CAST(e.embedding[i.i] AS DOUBLE) * 1000000)
                     AS BIGINT)
                * CAST(ROUND(CAST(e.embedding[j.j] AS DOUBLE) * 1000000)
                       AS BIGINT))
            AS BIGINT) AS s
FROM embeddings e, range(1, 65) i(i), range(1, 65) j(j)
WHERE i.i <= j.j
GROUP BY 1, 2 ORDER BY i, j
"""


QUERIES["embedding_covariance"] = (embedding_covariance, COV_SQL)


# -- embedding anomaly scoring -----------------------------------------------

def embedding_anomaly_topk(spark, sf_dir):
    """Corpus-health anomaly scan: per-vector diagonal Mahalanobis
    score Σ_d z_d² with per-dimension mean/variance from the
    integer-microunit sums (the embedding_dim_stats discipline —
    order-free exact inputs, then a FIXED sequence of correctly-rounded
    double ops per value), per-vector dim sums in decimal (order-free).
    Top 10 most anomalous vectors — the outliers an embedding pipeline
    quarantines before indexing. Fully value-oracled."""
    e = _embs(spark, sf_dir)
    m = F.round(F.col("x").cast("double") * 1_000_000).cast("long")
    dims = (e.select("vec_id", F.posexplode("embedding").alias("dim", "x"))
             .select("vec_id", "dim", m.alias("m")))
    stats = (dims.groupBy("dim")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum("m").alias("s1"),
                      F.sum(F.col("m") * F.col("m")).alias("s2")))
    n = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / n
    var = ((F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1") / n) / (n - 1))
    bstats = stats.select("dim", mu.alias("mu"), var.alias("var"))
    z2 = ((F.col("m") - F.col("mu")) * (F.col("m") - F.col("mu"))
          / F.col("var"))
    return (dims.join(F.broadcast(bstats), "dim")
                .select("vec_id", z2.cast("decimal(38,12)").alias("z2"))
                .groupBy("vec_id")
                .agg(F.round(F.sum("z2").cast("double"), 6)
                      .alias("anomaly"))
                .orderBy(F.desc("anomaly"), "vec_id")
                .limit(10))


ANOM_SQL = """
WITH dims AS (
  SELECT vec_id, i.i AS dim,
         CAST(ROUND(CAST(embedding[i.i] AS DOUBLE) * 1000000) AS BIGINT)
           AS m
  FROM embeddings, range(1, 65) i(i)),
 stats AS (
  SELECT dim, COUNT(*) AS n, CAST(SUM(m) AS BIGINT) AS s1,
         CAST(SUM(m * m) AS BIGINT) AS s2
  FROM dims GROUP BY dim),
 bs AS (
  SELECT dim, CAST(s1 AS DOUBLE) / n AS mu,
         (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
         / (n - 1) AS var
  FROM stats),
 z AS (
  SELECT d.vec_id,
         CAST((d.m - b.mu) * (d.m - b.mu) / b.var AS DECIMAL(38,12))
           AS z2
  FROM dims d JOIN bs b USING (dim))
SELECT vec_id, ROUND(CAST(SUM(z2) AS DOUBLE), 6) AS anomaly
FROM z GROUP BY vec_id ORDER BY anomaly DESC, vec_id LIMIT 10
"""


QUERIES["embedding_anomaly_topk"] = (embedding_anomaly_topk, ANOM_SQL)


def doc_quality_quantiles(spark, sf_dir):
    """Per-language EXACT quality-score quantiles (PERCENTILE_DISC
    semantics — order statistics of the rational quality scorer, so
    every value is a score both engines computed identically): the
    distribution snapshot a curation run reads before picking a
    quality threshold per language. Shared CDF walk
    (operators/orderstats.grouped_quantile_disc — round-8 rewrite of
    the keyed row_number form): combinable (lang, score) counts, keyed
    cumsum over DISTINCT scores, quantile = first value whose
    cumulative count reaches ⌈p·n⌉ — neither Spark's group-buffering
    percentile_disc aggregate nor a per-group raw-row sort."""
    from heracles_spark.operators.orderstats import grouped_quantile_disc

    d = text.with_quality_score(_docs(spark, sf_dir))
    return (grouped_quantile_disc(
                d.select("lang", "quality_score"),
                ["lang"], "quality_score",
                {"p10": 0.1, "p50": 0.5, "p90": 0.9})
            .orderBy("lang"))


QQUANT_SQL = f"""
WITH scored AS (
  SELECT lang, {_QUALITY_SQL_EXPR} AS quality_score FROM documents),
 ranked AS (
  SELECT lang, quality_score,
         CUME_DIST() OVER (PARTITION BY lang ORDER BY quality_score)
           AS cd
  FROM scored),
 q AS (
  SELECT lang,
         MIN(CASE WHEN cd >= 0.1 THEN quality_score END) AS p10,
         MIN(CASE WHEN cd >= 0.5 THEN quality_score END) AS p50,
         MIN(CASE WHEN cd >= 0.9 THEN quality_score END) AS p90
  FROM ranked GROUP BY lang),
 n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)
SELECT n.lang, n.n, q.p10, q.p50, q.p90
FROM n JOIN q USING (lang) ORDER BY lang
"""


QUERIES["doc_quality_quantiles"] = (doc_quality_quantiles, QQUANT_SQL)


# -- C4-style corpus-wide line dedup -----------------------------------------

def doc_line_dedup(spark, sf_dir):
    """C4's line-level dedup rule (Raffel et al. 2020: every repeated
    line is dropped except its global FIRST occurrence — boilerplate
    sentences repeat across pages): operators.text.dedup_lines_corpus
    over the sentence-split corpus, rebuilt docs + per-doc accounting
    for doc_id ≤ 60. First occurrence = min (doc_id, pos) — total
    order, so the surviving text is deterministic on any engine."""
    out = text.dedup_lines_corpus(_docs(spark, sf_dir))
    return (out.where(F.col("doc_id") <= 60)
               .select("doc_id", "n_lines", "n_kept", "n_dropped",
                       F.md5("cleaned").alias("cleaned_md5"))
               .orderBy("doc_id"))


LINEDEDUP_SQL = r"""
WITH split AS (
  SELECT doc_id,
         generate_subscripts(string_split_regex(text, '[.!?]+'), 1) - 1
           AS pos,
         unnest(string_split_regex(text, '[.!?]+')) AS raw
  FROM documents),
 lines AS (
  SELECT doc_id, pos, trim(raw) AS line FROM split
  WHERE trim(raw) <> ''),
 flagged AS (
  SELECT doc_id, pos, line,
         ROW_NUMBER() OVER (PARTITION BY line
                            ORDER BY doc_id, pos) = 1 AS keep
  FROM lines),
 agg AS (
  SELECT doc_id, COUNT(*) AS n_lines,
         CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
           AS n_dropped,
         md5(COALESCE(string_agg(CASE WHEN keep THEN line END, '. '
                              ORDER BY pos), '')) AS cleaned_md5
  FROM flagged GROUP BY doc_id)
SELECT doc_id, n_lines, n_kept, n_dropped, cleaned_md5
FROM agg WHERE doc_id <= 60 ORDER BY doc_id
"""


QUERIES["doc_line_dedup"] = (doc_line_dedup, LINEDEDUP_SQL)


def doc_gopher_rules(spark, sf_dir):
    """Gopher rejection-rule battery (text.with_gopher_rules): per-lang
    counts of docs passing the combined verdict plus per-rule failure
    counts — the curation dashboard row before a threshold sweep.
    Integer/rational flags, fully value-oracled."""
    # min_stop_hits=1 (not the paper's 2): the synthetic corpus is
    # technical word soup averaging <1 DISTINCT English stopword per
    # doc — at 2 the battery rejects 100% and certifies nothing. The
    # operator keeps the paper defaults as parameters.
    d = text.with_gopher_rules(_docs(spark, sf_dir), min_stop_hits=1)
    neg = lambda c: F.sum((~F.col(c)).cast("long"))
    return (d.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.col("gopher_pass").cast("long")).alias("n_pass"),
                  neg("ok_word_count").alias("fail_word_count"),
                  neg("ok_mean_word_len").alias("fail_mean_len"),
                  neg("ok_symbol_ratio").alias("fail_symbols"),
                  neg("ok_stopwords").alias("fail_stopwords"))
             .orderBy("lang"))


GOPHER_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang, text,
         string_split_regex(trim(lower(text)), '\s+') AS tk
  FROM documents),
 feats AS (
  SELECT doc_id, lang,
         len(tk) AS n,
         CAST(len(replace(array_to_string(tk, ''), ' ', '')) AS DOUBLE)
           / greatest(len(tk), 1) AS mean_len,
         CAST(length(text) - length(regexp_replace(
              text, '[#…@~^|\\\\]', '', 'g')) AS DOUBLE)
           / greatest(len(tk), 1) AS sym_ratio,
         len(list_intersect(tk, ['the','and','of','to','in','is','that',
             'it','for','was','on','are','with','as','at','this','have',
             'from','or'])) AS stop_hits
  FROM toks),
 flags AS (
  SELECT lang,
         (n >= 30 AND n <= 10000) AS ok_wc,
         (mean_len >= 3.0 AND mean_len <= 10.0) AS ok_ml,
         (sym_ratio < 0.1) AS ok_sy,
         (stop_hits >= 1) AS ok_st
  FROM feats)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN ok_wc AND ok_ml AND ok_sy AND ok_st
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN ok_wc THEN 0 ELSE 1 END) AS BIGINT)
         AS fail_word_count,
       CAST(SUM(CASE WHEN ok_ml THEN 0 ELSE 1 END) AS BIGINT)
         AS fail_mean_len,
       CAST(SUM(CASE WHEN ok_sy THEN 0 ELSE 1 END) AS BIGINT)
         AS fail_symbols,
       CAST(SUM(CASE WHEN ok_st THEN 0 ELSE 1 END) AS BIGINT)
         AS fail_stopwords
FROM flags GROUP BY lang ORDER BY lang
"""


QUERIES["doc_gopher_rules"] = (doc_gopher_rules, GOPHER_SQL)


def doc_temperature_mix(spark, sf_dir):
    """Temperature-based mixing quotas (α=0.5, total=300 — the
    multilingual-LM sampling rule: quotas ∝ n^α, upweighting tail
    sources) over the documents corpus: per-source n, quota, and the
    exact selected count after applying the quota via the
    hash-smallest-ids rule (sampling.cap_per_group's membership —
    deterministic WHICH rows, not just how many). Engine-exact: one
    correctly-rounded pow per source, decimal normalizer."""
    from heracles_spark.operators import sampling

    d = _docs(spark, sf_dir)
    quotas = sampling.temperature_mix_counts(d, alpha=0.5, total=300)
    return quotas.select("source", "n", "quota").orderBy("source")


TMIX_SQL = """
WITH counts AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
 weighted AS (
  SELECT source, n, POW(CAST(n AS DOUBLE), 0.5) AS w FROM counts),
 z AS (SELECT CAST(SUM(CAST(w AS DECIMAL(38,12))) AS DOUBLE) AS z
       FROM weighted)
SELECT source, n,
       LEAST(n, CAST(FLOOR(300.0 * w / z) AS BIGINT)) AS quota
FROM weighted, z ORDER BY source
"""


QUERIES["doc_temperature_mix"] = (doc_temperature_mix, TMIX_SQL)


# -- END-TO-END training-corpus manifest -------------------------------------

def doc_training_manifest(spark, sf_dir):
    """The whole curation pipeline in ONE composed query — what
    actually ships a training corpus: content-hash 80/20 split →
    Gopher rejection rules → corpus-wide exact dedup (min-id per
    content hash) → benchmark decontamination against the eval side
    (any shared word 5-gram) → token counts → GPT-style sequence
    packing → the per-(lang, shard) MANIFEST a training job reads
    (docs, tokens, sequences). Every stage is an existing oracle-proven
    operator; composing them under one value hash certifies the
    stages agree on every intermediate row set."""
    from heracles_spark.operators import sampling
    from heracles_spark.operators import text as text_ops
    from heracles_spark.operators.text import contaminated_ids

    d = sampling.hash_split(_docs(spark, sf_dir), on="doc_id",
                            train_pct=80)
    train = d.where(F.col("split") == "train")
    ev = d.where(F.col("split") == "eval")

    filt = (text_ops.with_gopher_rules(train, min_stop_hits=1)
            .where(F.col("gopher_pass"))
            .select("doc_id", "lang", "text"))
    firsts = (filt.groupBy(F.md5("text").alias("__h"))
                  .agg(F.min("doc_id").alias("doc_id")))
    deduped = filt.join(firsts.select("doc_id"), "doc_id", "left_semi")
    clean = deduped.join(
        F.broadcast(contaminated_ids(deduped, ev, n=5)),
        "doc_id", "left_anti")

    with_tokens = clean.withColumn("n_tokens",
                                   text_ops.token_count("text"))
    packed = sampling.pack_sequences(with_tokens, budget=256, n_shards=8)
    return (packed.groupBy("lang", "shard")
                  .agg(F.count(F.lit(1)).alias("n_docs"),
                       F.sum(F.col("n_tokens").cast("long"))
                        .alias("sum_tokens"),
                       F.countDistinct("seq").alias("n_seqs"))
                  .orderBy("lang", "shard"))


MANIFEST_SQL = r"""
WITH split AS (
  SELECT doc_id, lang, text,
         CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 < 80
              THEN 'train' ELSE 'eval' END AS split
  FROM documents),
 gtoks AS (
  SELECT doc_id, lang, text, split,
         string_split_regex(trim(lower(text)), '\s+') AS tk
  FROM split),
 flags AS (
  SELECT doc_id, lang, text, split, tk,
         len(tk) AS n,
         CAST(len(replace(array_to_string(tk, ''), ' ', '')) AS DOUBLE)
           / greatest(len(tk), 1) AS mean_len,
         CAST(length(text) - length(regexp_replace(
              text, '[#…@~^|\\\\]', '', 'g')) AS DOUBLE)
           / greatest(len(tk), 1) AS sym_ratio,
         len(list_intersect(tk, ['the','and','of','to','in','is','that',
             'it','for','was','on','are','with','as','at','this','have',
             'from','or'])) AS stop_hits
  FROM gtoks),
 filt AS (
  SELECT doc_id, lang, text, tk FROM flags
  WHERE split = 'train'
    AND n >= 30 AND n <= 10000
    AND mean_len >= 3.0 AND mean_len <= 10.0
    AND sym_ratio < 0.1 AND stop_hits >= 1),
 firsts AS (
  SELECT MIN(doc_id) AS doc_id FROM filt GROUP BY md5(text)),
 deduped AS (
  SELECT f.* FROM filt f JOIN firsts USING (doc_id)),
 train_grams AS (
  SELECT doc_id, array_to_string(tk[CAST(i AS INT):CAST(i + 4 AS INT)],
                                 ' ') AS g
  FROM deduped, range(1, 20000) r(i) WHERE i + 4 <= len(tk)
  UNION ALL
  SELECT doc_id, array_to_string(tk, ' ') AS g
  FROM deduped WHERE len(tk) < 5),
 eval_grams AS (
  SELECT array_to_string(tk[CAST(i AS INT):CAST(i + 4 AS INT)], ' ') AS g
  FROM gtoks, range(1, 20000) r(i)
  WHERE split = 'eval' AND i + 4 <= len(tk)
  UNION ALL
  SELECT array_to_string(tk, ' ') AS g
  FROM gtoks WHERE split = 'eval' AND len(tk) < 5),
 contaminated AS (
  SELECT DISTINCT doc_id FROM train_grams
  WHERE g IN (SELECT g FROM eval_grams)),
 clean AS (
  SELECT doc_id, lang, CAST(len(tk) AS BIGINT) AS n_tokens,
         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 8 AS INT) AS shard
  FROM deduped
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
 packed AS (
  SELECT *,
         COALESCE(SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS excl
  FROM clean)
SELECT lang, shard, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(COUNT(DISTINCT excl // 256) AS BIGINT) AS n_seqs
FROM packed GROUP BY lang, shard ORDER BY lang, shard
"""


QUERIES["doc_training_manifest"] = (doc_training_manifest, MANIFEST_SQL)


def doc_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary growth curve: distinct vocabulary size
    after the first N docs, at N ∈ {50, 100, 200, 400, all} — the
    corpus-health curve that flags template/duplicate-heavy data
    (vocabulary flattens early). Each term contributes at its FIRST
    doc (min doc_id — combinable agg), then one pass over the
    bucketed first-appearances counts per checkpoint. No growing
    state, no per-checkpoint rescan."""
    d = _docs(spark, sf_dir)
    firsts = (d.select("doc_id",
                       F.explode(text.tokens(F.col("text"))).alias("t"))
               .groupBy("t").agg(F.min("doc_id").alias("first_doc")))
    checkpoints = [50, 100, 200, 400]
    agg = firsts.agg(
        F.count(F.lit(1)).alias("vocab_total"),
        *[F.sum((F.col("first_doc") < c).cast("long"))
           .alias(f"vocab_at_{c}") for c in checkpoints])
    return agg.select(*[f"vocab_at_{c}" for c in checkpoints],
                      "vocab_total")


VGROWTH_SQL = r"""
WITH firsts AS (
  SELECT t, MIN(doc_id) AS first_doc
  FROM (SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        FROM documents)
  GROUP BY t)
SELECT CAST(SUM(CASE WHEN first_doc < 50 THEN 1 ELSE 0 END) AS BIGINT)
         AS vocab_at_50,
       CAST(SUM(CASE WHEN first_doc < 100 THEN 1 ELSE 0 END) AS BIGINT)
         AS vocab_at_100,
       CAST(SUM(CASE WHEN first_doc < 200 THEN 1 ELSE 0 END) AS BIGINT)
         AS vocab_at_200,
       CAST(SUM(CASE WHEN first_doc < 400 THEN 1 ELSE 0 END) AS BIGINT)
         AS vocab_at_400,
       COUNT(*) AS vocab_total
FROM firsts
"""


QUERIES["doc_vocab_growth"] = (doc_vocab_growth, VGROWTH_SQL)


def doc_ccnet_buckets(spark, sf_dir):
    """CCNet's head/middle/tail split (Wenzek et al. 2020: per-language
    perplexity TERCILES route docs to quality tiers): per-lang rank by
    the bigram-LM surprisal (lower = more fluent), bucket =
    ceil(3·rank/n) — explicit integer arithmetic, not engine-NTILE, so
    both engines bucket identically — and the per-(lang, bucket)
    manifest with score bounds. Composes lm_score (integer surprisal
    classes, engine-exact) with the keyed ranking."""
    from pyspark.sql import Window

    scored = (text.lm_score(_docs(spark, sf_dir))
              .join(_docs(spark, sf_dir).select("doc_id", "lang"),
                    "doc_id"))
    w = Window.partitionBy("lang").orderBy("avg_surprisal", "doc_id")
    counts = scored.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    ranked = (scored.withColumn("rn", F.row_number().over(w))
                    .join(F.broadcast(counts), "lang")
                    .withColumn("bucket",
                                F.ceil(F.lit(3) * F.col("rn")
                                       / F.col("n")).cast("int")))
    tier = (F.when(F.col("bucket") == 1, "head")
             .when(F.col("bucket") == 2, "middle")
             .otherwise("tail"))
    return (ranked.groupBy("lang", tier.alias("tier"))
                  .agg(F.count(F.lit(1)).alias("n_docs"),
                       F.round(F.min("avg_surprisal"), 6).alias("min_s"),
                       F.round(F.max("avg_surprisal"), 6).alias("max_s"))
                  .orderBy("lang", "tier"))


CCNET_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents),
 uni AS (
  SELECT u.w1, COUNT(*) AS c1 FROM (
    SELECT unnest(t) AS w1 FROM toks) u GROUP BY 1),
 vocab AS (SELECT COUNT(*) AS v FROM uni),
 big AS (
  SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
  FROM toks, range(1, 200000) r(i) WHERE i + 1 <= len(t)),
 bic AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
 scored AS (
  SELECT doc_id,
         ROUND(CAST(SUM(FLOOR(LOG2(CAST(c1 + v AS DOUBLE)
                                   / CAST(c2 + 1 AS DOUBLE)))) AS DOUBLE)
               / COUNT(*), 6) AS avg_surprisal
  FROM big JOIN bic USING (w1, w2) JOIN uni USING (w1) CROSS JOIN vocab
  GROUP BY doc_id),
 langd AS (
  SELECT s.doc_id, d.lang, s.avg_surprisal
  FROM scored s JOIN documents d USING (doc_id)),
 ranked AS (
  SELECT lang, avg_surprisal,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY avg_surprisal, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM langd),
 tiers AS (
  SELECT lang, avg_surprisal,
         CASE CAST(CEIL(3.0 * rn / n) AS INT)
              WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
              ELSE 'tail' END AS tier
  FROM ranked)
SELECT lang, tier, COUNT(*) AS n_docs,
       ROUND(MIN(avg_surprisal), 6) AS min_s,
       ROUND(MAX(avg_surprisal), 6) AS max_s
FROM tiers GROUP BY lang, tier ORDER BY lang, tier
"""


QUERIES["doc_ccnet_buckets"] = (doc_ccnet_buckets, CCNET_SQL)


def doc_fim_transform(spark, sf_dir):
    """Fill-in-the-middle transform (Bavarian et al. 2022 — reorder
    each doc to suffix⟂prefix⟂middle so an autoregressive model learns
    infilling): cut points are pure md5 functions of the doc id (same
    doc → same cuts on any engine/partitioning, the span-corruption
    discipline), docs under 3 tokens pass through. Emits per-doc
    segment lengths + md5 of the reassembled SPM string for doc_id ≤
    80 — the hash certifies byte-exact reassembly."""
    d = _docs(spark, sf_dir).where(F.col("doc_id") <= 80)
    toks = text.tokens(F.col("text"))
    n = F.array_size(toks)
    u1 = (F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                            F.lit(":c1"))), 1, 8), 16, 10)
           .cast("long"))
    u2 = (F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                            F.lit(":c2"))), 1, 8), 16, 10)
           .cast("long"))
    # 1 <= cut1 < cut2 <= n-1  (all three segments non-empty)
    cut1 = (u1 % (n - 2)) + 1
    cut2 = cut1 + (u2 % (n - cut1 - 1)) + 1
    prefix = F.slice(toks, 1, cut1)
    middle = F.slice(toks, cut1 + 1, cut2 - cut1)
    suffix = F.slice(toks, cut2 + 1, n - cut2)
    spm = F.concat_ws(" ", F.concat(suffix, prefix, middle))
    plain = F.concat_ws(" ", toks)
    return (d.select(
                "doc_id", n.alias("n_tokens"),
                F.when(n >= 3, cut1).otherwise(F.lit(None)).alias("cut1"),
                F.when(n >= 3, cut2).otherwise(F.lit(None)).alias("cut2"),
                F.md5(F.when(n >= 3, spm).otherwise(plain))
                 .alias("spm_md5"))
             .orderBy("doc_id"))


FIM_SQL = r"""
WITH t AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\s+') AS tk
  FROM documents WHERE doc_id <= 80),
 cuts AS (
  SELECT doc_id, tk, len(tk) AS n,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':c1'),
                                 1, 8)) AS BIGINT) AS u1,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':c2'),
                                 1, 8)) AS BIGINT) AS u2
  FROM t),
 pos AS (
  SELECT doc_id, tk, n,
         (u1 % (n - 2)) + 1 AS cut1,
         (u1 % (n - 2)) + 1 + (u2 % (n - ((u1 % (n - 2)) + 1) - 1)) + 1
           AS cut2
  FROM cuts)
SELECT doc_id, CAST(n AS INT) AS n_tokens,
       CASE WHEN n >= 3 THEN cut1 END AS cut1,
       CASE WHEN n >= 3 THEN cut2 END AS cut2,
       md5(CASE WHEN n >= 3 THEN
             array_to_string(tk[CAST(cut2 + 1 AS INT):CAST(n AS INT)]
                             || tk[1:CAST(cut1 AS INT)]
                             || tk[CAST(cut1 + 1 AS INT):CAST(cut2 AS INT)],
                             ' ')
           ELSE array_to_string(tk, ' ') END) AS spm_md5
FROM pos ORDER BY doc_id
"""


QUERIES["doc_fim_transform"] = (doc_fim_transform, FIM_SQL)


def embedding_random_projection(spark, sf_dir):
    """Johnson–Lindenstrauss sign projection (Achlioptas ±1 matrix,
    64 → 16 dims) with an in-query distortion audit — the
    dimensionality-reduction prepass that shrinks every downstream
    ANN / near-dup shuffle by 4× at 100 TB.

    Exactness: the projection runs ENTIRELY in the integer domain
    (vectors quantized to exact microunits, ±1-weighted BIGINT sums —
    order-free, no float reduction to diverge), and the deterministic
    sign matrix derives from md5("jl:{j}:{i}") top-bit parity, which
    hashlib here and the oracle's md5() compute identically — the
    oracle REGENERATES the matrix in-engine rather than trusting
    shipped literals. The audit pairs consecutive vec_ids (a 1:1
    co-partitioned equi-join, linear in corpus size — never all
    pairs), compares projected vs original squared distance scaled by
    1/k, and reduces to distortion statistics with the decimal-sum
    discipline. Only the final ratio is float arithmetic (one multiply
    + one divide, identical operation order both engines, rounded to
    6). JL theory for k=16: ratios concentrate around 1 with heavy
    spread — the audited fraction within ±50% is the operator's
    honesty metric, certified in the value hash."""
    from heracles_spark.operators import similarity as S

    e = _embs(spark, sf_dir)
    p = S.random_projection_micro(
        e.select("vec_id", "embedding"), k=16, dim=64)
    a = p.where(F.col("vec_id") % 2 == 0).select(
        "vec_id", F.col("emb_micro").alias("ea"), F.col("proj").alias("pa"))
    b = p.where(F.col("vec_id") % 2 == 1).select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("emb_micro").alias("eb"), F.col("proj").alias("pb"))
    pairs = (a.join(b, "vec_id")
              .withColumn("osq", S.sq_dist_long(F.col("ea"), F.col("eb")))
              .where(F.col("osq") > 0)
              .withColumn("ratio", F.round(
                  S.sq_dist_long(F.col("pa"), F.col("pb")).cast("double")
                  / (F.lit(16.0) * F.col("osq").cast("double")), 6)))
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("ratio").cast("decimal(38,6)")).cast("double")
         .alias("sum_ratio"),
        F.min("ratio").alias("min_ratio"),
        F.max("ratio").alias("max_ratio"),
        F.sum(F.when(F.abs(F.col("ratio") - 1.0) <= 0.5, 1).otherwise(0))
         .cast("long").alias("n_within_50pct"))


JLPROJ_SQL = """
WITH em AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS i,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS e
  FROM embeddings),
 sgn AS (
  SELECT CAST(tj.j AS INT) AS j, CAST(ti.i AS INT) AS i,
         CASE WHEN substring(md5('jl:' || CAST(tj.j AS VARCHAR) || ':'
                                 || CAST(ti.i AS VARCHAR)), 1, 1)
                   IN ('0','1','2','3','4','5','6','7')
              THEN 1 ELSE -1 END AS s
  FROM range(0, 16) tj(j), range(0, 64) ti(i)),
 proj AS (
  SELECT em.vec_id, sgn.j, SUM(em.e * sgn.s) AS p
  FROM em JOIN sgn USING (i) GROUP BY 1, 2),
 psq AS (
  SELECT a.vec_id, SUM((a.p - b.p) * (a.p - b.p)) AS psq
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1 AND a.j = b.j
  WHERE a.vec_id % 2 = 0 GROUP BY 1),
 osq AS (
  SELECT a.vec_id, SUM((a.e - b.e) * (a.e - b.e)) AS osq
  FROM em a JOIN em b ON b.vec_id = a.vec_id + 1 AND a.i = b.i
  WHERE a.vec_id % 2 = 0 GROUP BY 1),
 r AS (
  SELECT psq.vec_id,
         ROUND(CAST(psq.psq AS DOUBLE)
               / (CAST(16 AS DOUBLE) * CAST(osq.osq AS DOUBLE)), 6)
           AS ratio
  FROM psq JOIN osq USING (vec_id) WHERE osq.osq > 0)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(ratio AS DECIMAL(38,6))) AS DOUBLE) AS sum_ratio,
       MIN(ratio) AS min_ratio, MAX(ratio) AS max_ratio,
       CAST(COUNT(CASE WHEN ABS(ratio - 1.0) <= 0.5 THEN 1 END)
            AS BIGINT) AS n_within_50pct
FROM r
"""


QUERIES["embedding_random_projection"] = (embedding_random_projection,
                                          JLPROJ_SQL)


def orders_stats_histogram(spark, sf_dir):
    """End-to-end certification of the ANALYZE statistics path: bulk-load
    orders into a key-organized catalog table, run the histogram pass
    (writer.analyze_table — the ``ANALYZE TABLE … COMPUTE STATISTICS FOR
    COLUMNS o_totalprice`` implementation), and return the PERSISTED
    equi-depth histogram the catalog now carries. The oracle recomputes
    the same ⌈cum·k/tot⌉ depth assignment from raw orders, so the value
    hash certifies that the statistics a planner would consult match the
    data exactly — boundaries are actual data values, weights are exact
    BIGINT counts (the CDF walk, never a full sort; same discipline as
    lineitem_equidepth_hist, here exercised THROUGH the DDL surface
    like customer_bloom_lookup exercises file skipping)."""
    import tempfile

    from heracles_spark import writer
    from heracles_spark.catalog import HeraclesCatalog

    cat = HeraclesCatalog(tempfile.mkdtemp(prefix="heracles_stats_"))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cat.create_table("ord",
                     [("o_orderkey", "bigint"), ("o_totalprice", "double")],
                     ["o_orderkey"])
    writer.write_key_organized(
        spark, cat, "ord", o.select("o_orderkey", "o_totalprice"),
        n_buckets=4)
    st = writer.analyze_table(spark, cat, "ord", columns=["o_totalprice"])
    hist = st["columns"]["o_totalprice"]["histogram"]
    rows = [(int(st["rows"]), b["bucket"], b["hi"], b["rows"], b["values"])
            for b in hist]
    return (spark.createDataFrame(
                rows, "n_rows_total: long, bucket: int, hi: double, "
                      "bucket_rows: long, bucket_values: long")
                 .orderBy("bucket"))


STATS_HIST_SQL = """
WITH g AS (
  SELECT o_totalprice AS v, COUNT(*) AS w FROM orders GROUP BY 1),
 c AS (
  SELECT v, w,
         SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER () AS tot
  FROM g)
SELECT CAST(tot AS BIGINT) AS n_rows_total,
       CAST((cum * 8 + tot - 1) // tot AS INT) AS bucket,
       MAX(v) AS hi, CAST(SUM(w) AS BIGINT) AS bucket_rows,
       CAST(COUNT(*) AS BIGINT) AS bucket_values
FROM c GROUP BY 1, 2 ORDER BY bucket
"""


QUERIES["orders_stats_histogram"] = (orders_stats_histogram,
                                     STATS_HIST_SQL)


def embedding_pca_spectrum(spark, sf_dir):
    """Distributed PCA, certified by contract: the exact integer Gram
    triangle accumulates cluster-side (operators/similarity.
    covariance_accumulate — one mapInPandas X^T X panel per partition,
    then a combinable dim²-sized sum; the ONLY data-size-dependent
    work), and the dim×dim eigendecomposition finishes driver-side
    (pca_from_gram — bounded 64×64 LAPACK, the documented
    training-step pattern shared with IVF k-means).

    The oracle cannot re-run LAPACK, so the value hash certifies what
    IS engine-reproducible plus the spectrum's mathematical contract:
    ``n`` and ``trace_micro2`` (Σ_i S_ii — exact BIGINT, recomputed by
    the oracle term-for-term from microunit squares) and four flags
    the eigen result must satisfy — sorted nonincreasing, PSD up to
    float tolerance, Σλ = trace/(n·micro²) to 1e-9 relative (the
    trace identity), top-1 ≥ mean eigenvalue. A wrong Gram, a broken
    quantization, or a bogus eigen finish flips a flag or the exact
    trace."""
    from heracles_spark.operators import similarity as S

    e = _embs(spark, sf_dir)
    gram = [r.asDict() for r in
            S.covariance_accumulate(e, dim=64).collect()]
    w, _comps, n = S.pca_from_gram(gram, dim=64, k=64)
    trace = sum(r["s"] for r in gram if r["i"] == r["j"])
    tr_scaled = trace / (n * 1_000_000.0 ** 2)
    tol = 1e-9 * max(1.0, abs(tr_scaled))
    rows = [(int(n), 64, int(trace),
             bool(all(w[i] >= w[i + 1] - 1e-12
                      for i in range(len(w) - 1))),
             bool(all(x >= -1e-9 for x in w)),
             bool(abs(float(sum(w)) - tr_scaled) <= tol),
             bool(w[0] >= tr_scaled / 64 - 1e-12))]
    return spark.createDataFrame(
        rows, "n: long, d: int, trace_micro2: long, eigs_sorted: boolean, "
              "eigs_nonneg: boolean, eig_sum_matches_trace: boolean, "
              "top1_ge_mean: boolean")


PCA_SPECTRUM_SQL = """
WITH em AS (
  SELECT CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS e
  FROM embeddings)
SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS n,
       64 AS d,
       CAST(SUM(e * e) AS BIGINT) AS trace_micro2,
       TRUE AS eigs_sorted, TRUE AS eigs_nonneg,
       TRUE AS eig_sum_matches_trace, TRUE AS top1_ge_mean
FROM em
"""


QUERIES["embedding_pca_spectrum"] = (embedding_pca_spectrum,
                                     PCA_SPECTRUM_SQL)
