-- Demo 7 — the round-10 SQL surface: OR-shape routed pruning, vector
-- search from SQL (exact + index-routed ANN), and stats-driven join
-- reordering from autoAnalyze statistics. Run:
--   python -m heracles_spark.cli -e "$(cat examples/demo7_round10.sql)"

CREATE TABLE pts (k BIGINT, grp BIGINT, val DOUBLE)
  TBLPROPERTIES('keyCols'='k', 'autoAnalyze'='true', 'numBuckets'='4');

INSERT INTO pts
SELECT id, pmod(id, 50), cast(id AS DOUBLE) / 10 FROM range(0, 10000);

-- OR-disjunction of key predicates: the dispatcher routes this through
-- typed min/max file pruning (2 of 4 files opened), same rows as the
-- unrouted plan — the reference's critical-point pruning over the whole
-- predicate tree, now on the statement a user actually types
SELECT k, val FROM pts WHERE k < 3 OR k > 9996 ORDER BY k;

-- degenerate adjacent ranges collapse correctly (k = 9995 OR k > 9995
-- is exactly k >= 9995: 5 rows)
SELECT k FROM pts WHERE k = 9995 OR k > 9995 ORDER BY k;

-- vector search: exact path first — cosine_distance macro-expands to
-- native codegen arithmetic (no UDF), full scan, exact top-5
CREATE TABLE emb7 (vec_id BIGINT, embedding ARRAY<FLOAT>)
  TBLPROPERTIES('keyCols'='vec_id');
INSERT INTO emb7
SELECT id,
       array(cast(pmod(id * 7, 13) AS FLOAT),
             cast(pmod(id * 11, 17) AS FLOAT),
             cast(pmod(id * 3, 7) AS FLOAT),
             cast(pmod(id * 5, 19) AS FLOAT))
FROM range(0, 300);

SELECT vec_id FROM emb7
ORDER BY cosine_distance(embedding, array(7.0, 11.0, 3.0, 5.0))
LIMIT 5;

-- the same function works anywhere an expression does
SELECT vec_id,
       round(cosine_distance(embedding, array(7.0, 11.0, 3.0, 5.0)), 4)
         AS dist
FROM emb7 WHERE vec_id < 3;

-- creating a vector index is the opt-in to APPROXIMATE top-k: the same
-- ORDER BY ... LIMIT statement now routes through the index probe
-- (only the probed cells are read — the pgvector semantics)
CREATE VECTOR INDEX v7 ON emb7 (embedding) WITH (cells=4, sample=64);
SELECT vec_id FROM emb7
ORDER BY cosine_distance(embedding, array(7.0, 11.0, 3.0, 5.0))
LIMIT 5;

-- stats-driven join reordering: written WORST-first — the low-NDV
-- bucket edge (5000 x 5000 / 20 = 1.25M intermediate rows) before the
-- 25-row dim. The reorderer sees the autoAnalyze NDVs, costs every
-- connected order, and rewrites dim-first (~6k intermediate rows).
CREATE TABLE f7 (k BIGINT, b BIGINT)
  TBLPROPERTIES('keyCols'='k', 'autoAnalyze'='true');
INSERT INTO f7 SELECT id, pmod(id, 20) FROM range(0, 5000);
CREATE TABLE m7 (mm BIGINT, b2 BIGINT)
  TBLPROPERTIES('keyCols'='mm', 'autoAnalyze'='true');
INSERT INTO m7 SELECT id, pmod(id, 20) FROM range(0, 5000);
CREATE TABLE d7 (k2 BIGINT)
  TBLPROPERTIES('keyCols'='k2', 'autoAnalyze'='true');
INSERT INTO d7 SELECT id FROM range(0, 25);

SELECT COUNT(*) AS n_joined
FROM f7 JOIN m7 ON f7.b = m7.b2
JOIN d7 ON m7.mm = d7.k2;
