-- Demo 6 — the modern-SQL surface and the self-maintaining planner
-- (round 8): autoAnalyze tables, SHOW STATISTICS, QUALIFY, ASOF JOIN.
-- Run:
--   python -m heracles_spark.cli -e "$(cat examples/demo6_modern_sql.sql)"

-- autoAnalyze: statistics maintained on every write, no manual ANALYZE
CREATE TABLE trades (id BIGINT, sym STRING, ts BIGINT, px DOUBLE)
  TBLPROPERTIES('keyCols'='id', 'autoAnalyze'='true');

INSERT INTO trades
SELECT id, concat('S', cast(pmod(id, 3) AS STRING)),
       id * 10, cast(100 + pmod(id * 7, 50) AS DOUBLE)
FROM range(0, 300);

-- stats already there (the INSERT ran the full ANALYZE)
SHOW STATISTICS FOR trades;

-- append: the write itself runs the incremental REFRESH
INSERT INTO trades
SELECT id, concat('S', cast(pmod(id, 3) AS STRING)),
       id * 10, cast(100 + pmod(id * 7, 50) AS DOUBLE)
FROM range(300, 400);

SHOW STATISTICS FOR trades;

-- metadata-only cardinality from the maintained histogram
EXPLAIN ESTIMATE SELECT * FROM trades WHERE px <= 120;

-- round 9: conjunctions compose per-step selectivities (independence)
EXPLAIN ESTIMATE SELECT * FROM trades WHERE px <= 120 AND ts > 1000;

-- round 9: left-deep join chains get per-step System-R cardinalities
CREATE TABLE symbols (sym3 STRING, sector STRING)
  TBLPROPERTIES('keyCols'='sym3', 'autoAnalyze'='true');
INSERT INTO symbols VALUES ('S0','tech'), ('S1','energy'), ('S2','tech');
EXPLAIN ESTIMATE SELECT * FROM trades
  JOIN symbols ON trades.sym = symbols.sym3;

-- ... and WHERE filters compose into the chain (σ rows per filter)
EXPLAIN ESTIMATE SELECT * FROM trades t
  JOIN symbols s ON t.sym = s.sym3
  WHERE t.px <= 120;

-- QUALIFY: top-2 trades per symbol by price, no manual subquery
SELECT sym, id, px,
       ROW_NUMBER() OVER (PARTITION BY sym ORDER BY px DESC, id) AS rn
FROM trades QUALIFY rn <= 2 ORDER BY sym, rn;

-- ASOF JOIN: latest quote at or before each order's time
CREATE TABLE quotes (qid BIGINT, sym2 STRING, qts BIGINT, bid DOUBLE)
  TBLPROPERTIES('keyCols'='qid');
INSERT INTO quotes VALUES
  (1, 'S0', 50, 99.5), (2, 'S0', 250, 101.0),
  (3, 'S1', 100, 88.0), (4, 'S2', 10, 77.0);

-- plain ASOF JOIN is INNER (DuckDB semantics); qualifiers map
-- naturally: q.bid is the matched quote's bid, q.qts its timestamp
SELECT t.sym, t.ts, t.px, q.bid AS bid_at_trade
FROM trades t ASOF JOIN quotes q
  ON t.sym = q.sym2 AND t.ts >= q.qts
WHERE t.id < 9
ORDER BY t.sym, t.ts LIMIT 12;

-- ASOF LEFT JOIN keeps unquoted trades; the third conjunct bounds the
-- quote age (tolerance: quotes older than 100 ticks don't carry)
SELECT t.sym, t.ts, q.qts AS quote_ts, q.bid AS bid_at_trade
FROM trades t ASOF LEFT JOIN quotes q
  ON t.sym = q.sym2 AND t.ts >= q.qts AND q.qts >= t.ts - 100
WHERE t.id < 9
ORDER BY t.sym, t.ts LIMIT 12;
