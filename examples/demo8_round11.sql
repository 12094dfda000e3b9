-- Demo 8 — the round-11 serving surface: filtered + projected + scored
-- vector search from SQL, LATERAL batch ANN (a shape stock Spark
-- rejects), warehouse aggregates over pruned scans, metadata-only
-- COUNT(*), and the EXPLAIN ROUTE advisor. Run:
--   python -m heracles_spark.cli -e "$(cat examples/demo8_round11.sql)"

CREATE TABLE docs8 (doc_id BIGINT, lang STRING, quality DOUBLE,
                    embedding ARRAY<FLOAT>)
  TBLPROPERTIES('keyCols'='doc_id', 'numBuckets'='4');

INSERT INTO docs8
SELECT id,
       CASE WHEN pmod(id, 3) = 0 THEN 'en' ELSE 'de' END,
       cast(pmod(id * 13, 100) AS DOUBLE) / 100,
       array(cast(pmod(id * 7, 13) AS FLOAT),
             cast(pmod(id * 11, 17) AS FLOAT),
             cast(pmod(id * 3, 7) AS FLOAT),
             cast(pmod(id * 5, 19) AS FLOAT))
FROM range(0, 400);

-- metadata-only COUNT(*): answered from the file index's exact
-- per-file row counts — zero data read at any table size
SELECT COUNT(*) FROM docs8;

-- the warehouse statement: aggregates over a key range route through
-- the pruned scan (only the files the range MAY touch are opened)
SELECT lang, count(*) AS n,
       round(avg(quality), 3) AS avg_q
FROM docs8 WHERE doc_id BETWEEN 100 AND 199
GROUP BY lang ORDER BY lang;

-- EXPLAIN ROUTE: the access-path advisor — route taken with its
-- pruning facts, or the decline reason code (never a silent bail)
EXPLAIN ROUTE SELECT doc_id FROM docs8 WHERE doc_id < 50;
EXPLAIN ROUTE SELECT doc_id FROM docs8 WHERE quality > 0.5;

-- the canonical serving query, exact path first (no index): filter +
-- ANN ordering + the distance itself in the projection
SELECT doc_id, lang,
       cosine_distance(embedding, array(7.0, 11.0, 3.0, 5.0)) AS dist
FROM docs8 WHERE lang = 'en'
ORDER BY cosine_distance(embedding, array(7.0, 11.0, 3.0, 5.0))
LIMIT 5;

-- an index is the opt-in to the APPROXIMATE probe path: the same
-- statement now pre-filters inside the probed cells and joins the
-- non-key projection back through the key (pgvector semantics)
CREATE VECTOR INDEX v8 ON docs8 (embedding) WITH (cells=4, sample=64);
SET spark.sql.heracles.annProbe=4;
SELECT doc_id, lang,
       cosine_distance(embedding, array(7.0, 11.0, 3.0, 5.0)) AS dist
FROM docs8 WHERE lang = 'en'
ORDER BY cosine_distance(embedding, array(7.0, 11.0, 3.0, 5.0))
LIMIT 5;
EXPLAIN ROUTE SELECT doc_id FROM docs8 WHERE lang = 'en'
ORDER BY cosine_distance(embedding, array(7.0, 11.0, 3.0, 5.0))
LIMIT 5;

-- LATERAL batch ANN: one top-k per query row, one plan for the whole
-- batch — stock Spark rejects this statement outright (outer refs in
-- a lateral ORDER BY); here it routes to the batch probe path
CREATE TABLE probes8 (qid BIGINT, qvec ARRAY<FLOAT>)
  TBLPROPERTIES('keyCols'='qid');
INSERT INTO probes8
SELECT 1, array(cast(7.0 AS FLOAT), cast(11.0 AS FLOAT),
                cast(3.0 AS FLOAT), cast(5.0 AS FLOAT))
UNION ALL
SELECT 2, array(cast(1.0 AS FLOAT), cast(2.0 AS FLOAT),
                cast(3.0 AS FLOAT), cast(4.0 AS FLOAT));
SELECT q.qid, x.doc_id AS nn FROM probes8 q, LATERAL (
  SELECT doc_id FROM docs8
  ORDER BY cosine_distance(embedding, q.qvec) LIMIT 3) x;
