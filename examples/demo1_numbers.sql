-- Demo 1 — single-column row key (mirrors the reference's
-- examples/spark-hbase-demo1.md: an hbase_numbers table with rowkey
-- 'row#{i}' and two string cells c1="#{i}1", c2="#{i}2", queried with
-- count(*) and a string-compare filter).
--
-- On this engine the table IS the key-organized store: the rowkey is
-- declared with keyCols and the cells are ordinary columns — no
-- MAPPED BY indirection. Run:
--   python -m heracles_spark.cli -e "$(cat examples/demo1_numbers.sql)"
-- (the INSERT below is generated; the reference populates the same
-- 100 rows from the hbase shell loop `for i in 1..100`).

CREATE TABLE numbers (rowkey STRING, a STRING, b STRING)
  TBLPROPERTIES('keyCols'='rowkey');

-- rows row1..row100 with a = i||'1', b = i||'2' — built with one
-- INSERT ... SELECT over a generator instead of 200 shell puts.
INSERT INTO numbers
SELECT concat('row', id) AS rowkey,
       concat(id, '1') AS a,
       concat(id, '2') AS b
FROM range(1, 101);

-- (1) test count *
SELECT COUNT(*) AS n FROM numbers;

-- (2) string-ordered filter (the reference compares b > "980" as
-- text: '981'..'991' style values qualify, plus '99'||'2')
SELECT a, b FROM numbers WHERE b > '980' ORDER BY b;

DROP TABLE numbers;
