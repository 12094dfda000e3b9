-- Demo 4 — vector index lifecycle (beyond the reference: the
-- reference engine has no ANN story; this demo shows the round-8
-- CREATE/REFRESH/DROP VECTOR INDEX DDL on a catalog table with an
-- embedding column). Run:
--   python -m heracles_spark.cli -e "$(cat examples/demo4_vector_index.sql)"

CREATE TABLE emb (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)
  TBLPROPERTIES('keyCols'='vec_id');

-- 200 deterministic 4-d vectors from a generator (no files needed)
INSERT INTO emb
SELECT id AS vec_id,
       array(cast(pmod(id * 7, 13) AS FLOAT),
             cast(pmod(id * 11, 17) AS FLOAT),
             cast(pmod(id * 3, 7) AS FLOAT),
             cast(pmod(id * 5, 19) AS FLOAT)) AS embedding,
       cast(pmod(id, 3) AS INT) AS label
FROM range(0, 200);

SELECT COUNT(*) AS n FROM emb;

-- train centroids, assign cells, persist the cell-partitioned store
CREATE VECTOR INDEX v ON emb (embedding) WITH (cells=4, sample=64);
SHOW INDEXES ON emb;

-- append a batch: the index goes stale...
INSERT INTO emb
SELECT id AS vec_id,
       array(cast(pmod(id * 7, 13) AS FLOAT),
             cast(pmod(id * 11, 17) AS FLOAT),
             cast(pmod(id * 3, 7) AS FLOAT),
             cast(pmod(id * 5, 19) AS FLOAT)) AS embedding,
       cast(pmod(id, 3) AS INT) AS label
FROM range(1000, 1050);
SHOW INDEXES ON emb;

-- ...and REFRESH assigns ONLY the appended vectors to the existing
-- centroids (faiss add-without-retrain; O(new data), not O(corpus))
REFRESH VECTOR INDEX v ON emb;
SHOW INDEXES ON emb;

DROP VECTOR INDEX v ON emb;
DROP TABLE emb;
