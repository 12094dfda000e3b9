-- heracles_spark end-to-end demo (run: python -m heracles_spark.cli
-- then `SOURCE examples/demo.sql;`, or:
--   python -m heracles_spark.cli -e "$(cat examples/demo.sql)")
-- Mirrors the reference's examples/spark-hbase-demo*.md flow on the
-- key-organized store: create → load → query → mutate → time travel.

-- numBuckets pre-splits the key-range layout (reference: pre-split
-- regions via splitKeys); every write to this table lands 4 files.
CREATE TABLE sales (id INT, product STRING, region STRING, amount DOUBLE)
  TBLPROPERTIES('keyCols'='id', 'numBuckets'='4');

INSERT INTO sales VALUES
  (1, 'widget', 'east', 10.5),
  (2, 'widget', 'west', 12.0),
  (3, 'gadget', 'east', 99.0),
  (4, 'gadget', 'west', 45.0),
  (5, 'widget', 'east', 11.0);

SELECT product, COUNT(*) AS n, SUM(amount) AS total
FROM sales GROUP BY product ORDER BY product;

-- CTAS into a derived key-organized table
CREATE TABLE sales_east TBLPROPERTIES('keyCols'='id') AS
  SELECT id, product, amount FROM sales WHERE region = 'east';

SELECT * FROM sales_east;

-- copy-on-write mutations + versioning
UPDATE sales SET amount = amount * 1.1 WHERE product = 'widget';
DELETE FROM sales WHERE id = 4;
DESCRIBE HISTORY sales;
SELECT COUNT(*) AS n_now FROM sales;

-- secondary index + point lookup through it
CREATE INDEX by_product ON sales (product);
SELECT id, amount FROM sales WHERE product = 'gadget';

-- inverted text index: postings are a queryable key table
CREATE TEXT INDEX prodidx ON sales (product);
SELECT term, id, tf FROM sales__tidx_prodidx WHERE term = 'widget';
SHOW INDEXES ON sales;
DROP TEXT INDEX prodidx ON sales;

-- minor compaction first: bin-pack ONLY undersized files (the 4
-- pre-split bucket files plus the copy-on-write rewrites above are all
-- tiny here), leaving well-sized files untouched — O(small files),
-- the trickle-ingest maintenance verb
OPTIMIZE sales COMPACT TARGET 1000 ROWS;

-- compaction through the space-filling-curve layout (multi-key tables
-- prune on EVERY key dimension afterwards; see zorder.py)
OPTIMIZE sales;

-- hive-style sharded export: one subdir per region value
COPY sales TO '/tmp/heracles_demo_export' PARTITION BY (region);

SHOW TABLES;
DROP INDEX by_product ON sales;
DROP TABLE sales_east;
DROP TABLE sales;
