-- Demo 5 — table statistics for a cost-based planner (round-8
-- ANALYZE surface): row counts, per-column NDV / null counts, and
-- EXACT equi-depth histograms computed through the distributed CDF
-- walk (operators/orderstats — never a full sort, never a buffered
-- group). Run:
--   python -m heracles_spark.cli -e "$(cat examples/demo5_statistics.sql)"

CREATE TABLE sales (id BIGINT, region STRING, amount DOUBLE)
  TBLPROPERTIES('keyCols'='id');

INSERT INTO sales
SELECT id,
       concat('region', cast(pmod(id, 5) AS STRING)) AS region,
       cast(pmod(id * 13, 1000) AS DOUBLE) AS amount
FROM range(0, 1000);

SELECT COUNT(*) AS n FROM sales;

-- table-level only: row count
ANALYZE TABLE sales COMPUTE STATISTICS;

-- named columns: NDV + nulls for both, equi-depth histogram for the
-- numeric one (8 buckets: boundary values, per-bucket row weights)
ANALYZE TABLE sales COMPUTE STATISTICS FOR COLUMNS region, amount;

-- the stats persist in table properties as a metadata-only version
DESCRIBE EXTENDED sales;
DESCRIBE HISTORY sales;

-- append a batch: REFRESH is incremental (counts add, NDV sketches
-- union, histograms recompute column-pruned) — O(appended files)
INSERT INTO sales
SELECT id, concat('region', cast(pmod(id, 5) AS STRING)),
       cast(pmod(id * 13, 1000) AS DOUBLE)
FROM range(1000, 1500);

REFRESH STATISTICS ON sales;

-- metadata-only cardinality estimate from the persisted histogram
EXPLAIN ESTIMATE SELECT * FROM sales WHERE amount <= 500;

-- round 9: the layout advisor — clustering depth from the file-range
-- index (metadata-only; the INSERT above overlapped the key range, so
-- point reads may open extra files until an OPTIMIZE)
EXPLAIN LAYOUT sales;
OPTIMIZE sales;
EXPLAIN LAYOUT sales;
