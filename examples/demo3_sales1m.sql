-- Demo 3 — the same fact data under TWO key layouts (mirrors the
-- reference's examples/spark-hbase-demo3.md: sales1m loaded into a
-- (id, product, region)-keyed table AND an id-keyed table, then
-- count(*) and the product/region group-by).
--
-- CSV schema (headerless, same shape as the reference's sales1m.csv):
--   id,product,region,sales,quantity
-- Generate a deterministic sample with:
--   python - <<'PY'
--   with open('/tmp/heracles_sales.csv', 'w') as f:
--       for i in range(1, 10001):
--           f.write(f"id{i},product{i % 7},region{i % 5},"
--                   f"{(i * 13) % 1000},{(i * 7) % 50}\n")
--   PY
-- then:
--   python -m heracles_spark.cli -e "$(cat examples/demo3_sales1m.sql)"

-- composite-key layout: range scans on (id, product, region) prefixes
CREATE TABLE sales1m (id STRING, product STRING, region STRING,
                      sales INT, quantity INT)
  TBLPROPERTIES('keyCols'='id;product;region', 'numBuckets'='4');

-- single-key layout of the SAME rows: point gets by id
CREATE TABLE sales1m_onekey (id STRING, product STRING, region STRING,
                             sales INT, quantity INT)
  TBLPROPERTIES('keyCols'='id', 'numBuckets'='4');

LOAD DATA LOCAL INPATH '/tmp/heracles_sales.csv' INTO TABLE sales1m;
LOAD DATA LOCAL INPATH '/tmp/heracles_sales.csv'
  INTO TABLE sales1m_onekey;

-- (1) test count *
SELECT COUNT(*) AS n FROM sales1m;

-- (2) test group by (reference: avg(sales) for one product across
-- regions)
SELECT product, region, AVG(sales) AS avg_sales FROM sales1m
WHERE product = 'product4' GROUP BY product, region
ORDER BY product, region;

-- same answer from the other layout — layouts change access paths,
-- not results
SELECT product, region, AVG(sales) AS avg_sales FROM sales1m_onekey
WHERE product = 'product4' GROUP BY product, region
ORDER BY product, region;

DROP TABLE sales1m;
DROP TABLE sales1m_onekey;
