"""Temporal join operators: as-of join and range (interval) join.

The reference has neither (SURVEY §2.3 'No range/as-of/interval joins
exist in the reference'); these are the time-series operators a
training-data/event pipeline needs, built as compositions of DataFrame
ops (SURVEY §7's guidance for operators Spark lacks):

- ``asof_join``: the union-and-carry trick — union both sides tagged,
  one window pass per key carries the latest right-side row forward,
  filter back to left rows. ONE hash shuffle on the key, no point
  lookups, no broadcast of the big side; this is the scalable form
  (an inequality join would plan as a nested-loop).
- ``range_join_binned``: equi-join on coarse time bins (each left row
  probes the bins its window overlaps), then exact interval filter —
  the standard bin-bucketing rewrite that turns an inequality join
  into a hash join. Bin width trades shuffle fan-out vs post-filter
  selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_cols: list[str] | None = None,
              suffix: str = "_right",
              direction: str = "backward",
              tolerance: int | None = None) -> DataFrame:
    """For each left row, attach the matching right row by time:
    ``direction='backward'`` (default) the most recent right.on <=
    left.on; ``'forward'`` the earliest right.on >= left.on;
    ``'nearest'`` whichever of the two is closer (backward wins exact
    ties) — pandas merge_asof's direction semantics. ``tolerance``
    (same units as ``on``) drops matches farther than the bound.

    ``on`` must be mutually comparable (timestamp/long); ``by`` is the
    equi-key (e.g. user_id). Right columns are carried with ``suffix``.

    Shape: union-and-carry — ONE hash shuffle on ``by``; 'nearest' adds
    a second window pass over the same partitioning (co-partitioned, no
    extra exchange), never a join or point lookups."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"bad direction {direction!r}")
    rcols = right_cols or [c for c in right.columns if c not in (on, by)]
    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        by, on, *[F.col(c).alias(c + suffix) for c in rcols]
    ).withColumn("__side", F.lit(0))

    # Align schemas for the union.
    for c in rcols:
        lt = lt.withColumn(c + suffix, F.lit(None).cast(
            dict(rt.dtypes)[c + suffix]))
    lcols_only = [c for c in left.columns if c not in (on, by)]
    for c in lcols_only:
        rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    order = [by, on] + lcols_only + [c + suffix for c in rcols] + ["__side"]
    u = lt.select(*order).unionByName(rt.select(*order))
    # The matched right row's own timestamp, needed for tolerance and
    # nearest-side selection.
    u = u.withColumn("__ron", F.when(F.col("__side") == 0, F.col(on)))

    # Right rows sort before left rows at equal timestamps (__side asc)
    # so right.on == left.on matches in BOTH directions.
    wb = (Window.partitionBy(by)
                .orderBy(F.col(on).asc(), F.col("__side").asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(by)
                .orderBy(F.col(on).desc(), F.col("__side").asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    def _carry(w, tag):
        cols = [F.last(F.when(F.col("__side") == 0, F.col(c + suffix)),
                       ignorenulls=True).over(w).alias(f"__{tag}_{c}")
                for c in rcols]
        return cols + [F.last("__ron", ignorenulls=True).over(w)
                       .alias(f"__{tag}_on")]

    proj = [F.col(by), F.col(on), *[F.col(c) for c in lcols_only],
            F.col("__side")]
    if direction in ("backward", "nearest"):
        proj += _carry(wb, "b")
    if direction in ("forward", "nearest"):
        proj += _carry(wf, "f")
    u = u.select(*proj).where(F.col("__side") == 1).drop("__side")

    def _ok(tag):
        got = F.col(f"__{tag}_on").isNotNull()
        if tolerance is None:
            return got
        gap = (F.col(on) - F.col(f"__{tag}_on") if tag == "b"
               else F.col(f"__{tag}_on") - F.col(on))
        return got & (gap <= tolerance)

    if direction == "backward":
        out = [F.when(_ok("b"), F.col(f"__b_{c}")).alias(c + suffix)
               for c in rcols]
    elif direction == "forward":
        out = [F.when(_ok("f"), F.col(f"__f_{c}")).alias(c + suffix)
               for c in rcols]
    else:
        take_b = _ok("b") & (~_ok("f")
                             | ((F.col(on) - F.col("__b_on"))
                                <= (F.col("__f_on") - F.col(on))))
        out = [F.when(take_b, F.col(f"__b_{c}"))
                .when(_ok("f"), F.col(f"__f_{c}"))
                .alias(c + suffix)
               for c in rcols]
    return u.select(by, on, *lcols_only, *out)


def range_join_binned(left: DataFrame, right: DataFrame, by: str,
                      left_ts: str, right_ts: str,
                      lower, upper, bin_width) -> DataFrame:
    """Join rows where right_ts ∈ [left_ts + lower, left_ts + upper),
    matching on ``by``. Timestamp columns must be numeric (epoch seconds
    / micros) — cast before calling; lower/upper/bin_width in the same
    unit.

    Rewrite: right rows hash into time bins; each left row explodes to
    the bins its window overlaps; equi-join on (by, bin); exact filter.
    Shuffle volume = |right| + |left| × (window/bin_width + 1).
    """
    # Disambiguate if both sides use the same ts column name: the right
    # side's ts is exposed as <right_ts>_right in the output.
    if right_ts == left_ts:
        right = right.withColumnRenamed(right_ts, right_ts + "_right")
        right_ts = right_ts + "_right"
    l2 = left.withColumn(
        "__bin",
        F.explode(F.sequence(
            ((F.col(left_ts) + F.lit(lower)) / F.lit(bin_width)).cast("long"),
            ((F.col(left_ts) + F.lit(upper)) / F.lit(bin_width)).cast("long"))))
    r2 = right.withColumn(
        "__bin", (F.col(right_ts) / F.lit(bin_width)).cast("long"))
    cond = ((F.col(right_ts) >= F.col(left_ts) + F.lit(lower))
            & (F.col(right_ts) < F.col(left_ts) + F.lit(upper)))
    return (l2.join(r2, [by, "__bin"])
              .where(cond)
              .drop("__bin"))


def interval_overlap_join(left: DataFrame, right: DataFrame, by: str,
                          left_start: str, left_end: str,
                          right_start: str, right_end: str,
                          bin_width: int,
                          how: str = "inner") -> DataFrame:
    """Join rows of the same ``by`` key whose HALF-OPEN intervals
    [start, end) overlap: l.start < r.end AND r.start < l.end — the
    interval×interval shape that as-of (point×point) and range join
    (point×window) don't cover. Bounds columns must be numeric (epoch
    seconds/micros); ``bin_width`` in the same unit.

    Rewrite: each interval explodes to the time bins it covers and the
    overlap test becomes an equi-join on (by, bin) plus an exact
    residual — no BroadcastNestedLoopJoin at any size. A pair sharing
    several bins would match repeatedly, so a pair is KEPT only in the
    first bin both intervals cover (max of the two start bins) — a
    codegen'd guard instead of a distinct shuffle.

    Shuffle volume = Σ interval_len/bin_width per side; pick bin_width
    ≈ typical interval length so each row lands in O(1) bins."""
    if how != "inner":
        raise ValueError("interval_overlap_join supports inner only")
    w = F.lit(bin_width)

    def bins(start, end):
        return F.explode(F.sequence(
            (F.col(start) / w).cast("long"),
            (((F.col(end) - 1) / w)).cast("long")))

    rs, re_ = right_start, right_end
    renamed = {}
    for c in (right_start, right_end):
        if c in (left_start, left_end) or c in left.columns:
            renamed[c] = c + "_right"
    for old, new in renamed.items():
        right = right.withColumnRenamed(old, new)
    rs = renamed.get(right_start, right_start)
    re_ = renamed.get(right_end, right_end)

    # Empty half-open intervals [s, s) overlap nothing by definition —
    # drop them BEFORE the bin explosion (a start==end row would also
    # make F.sequence(start_bin, end_bin) descend and emit spurious
    # bins). The residual below uses max(starts) < min(ends), which is
    # the exact half-open overlap test and independently rejects
    # zero-length intervals lying inside the other interval.
    l2 = (left.where(F.col(left_start) < F.col(left_end))
              .withColumn("__bin", bins(left_start, left_end)))
    r2 = (right.where(F.col(rs) < F.col(re_))
               .withColumn("__bin", bins(rs, re_)))
    overlap = (F.greatest(F.col(left_start), F.col(rs))
               < F.least(F.col(left_end), F.col(re_)))
    first_shared = (F.col("__bin") == F.greatest(
        (F.col(left_start) / w).cast("long"),
        (F.col(rs) / w).cast("long")))
    return (l2.join(r2, [by, "__bin"])
              .where(overlap & first_shared)
              .drop("__bin"))


def decayed_sum_trailing(df: DataFrame, by: str, order_col: str,
                         value_col: str, window: int = 50,
                         out_col: str = "decayed_sum") -> DataFrame:
    """Exponentially time-decayed trailing sum (EWMA's unnormalized
    core): for each row t, Σ_{k=0..window-1} v_{t-k} · 2^{-k} — the
    recency-weighted engagement/quality score every event pipeline
    keeps.

    Engine-exact by construction: the decay base is DYADIC (α = 1/2),
    so v·2^{-k} is a pure exponent shift — EXACT in IEEE, no libm —
    and per-target sums accumulate in decimal (order-free). The
    smoothing is therefore bit-reproducible on any engine, any
    partitioning, any plan.

    Shape: each row contributes to its next ``window`` successors via
    a bounded explode (sequence 0..window-1) + ONE combinable agg on
    (by, target_row) — no per-key sequential scan, no unbounded window
    state; shuffle volume = window × |rows|. The trailing cutoff also
    bounds the exponent (2^{-k} underflows at k≈1074; a full-history
    dyadic EWMA via prefix scaling would overflow past ~1000 rows —
    the bounded frame is both the scale AND the exactness choice).

    Returns df's (by, order_col, value_col) plus ``out_col``."""
    from pyspark.sql import Window as W

    w = W.partitionBy(by).orderBy(order_col)
    rn = (df.select(by, order_col, value_col)
            .withColumn("__rn", F.row_number().over(w)))
    halfk = (F.col(value_col).cast("double")
             / F.expr("shiftleft(1L, __k)").cast("double"))
    contrib = (rn.select(by, "__rn", value_col)
                 .withColumn("__k", F.explode(
                     F.sequence(F.lit(0), F.lit(window - 1))))
                 .select(F.col(by).alias("__g"),
                         (F.col("__rn") + F.col("__k")).alias("__t"),
                         halfk.cast("decimal(38,12)").alias("__c")))
    sums = (contrib.groupBy("__g", "__t")
                   .agg(F.sum("__c").cast("double").alias(out_col)))
    return (rn.join(sums, (F.col("__rn") == F.col("__t"))
                    & (F.col(by) == F.col("__g")))
              .select(by, order_col, value_col, out_col))


def densify_series(df: DataFrame, by: "list[str]", time_col: str,
                   step_seconds: int,
                   fill: "dict[str, object] | None" = None) -> DataFrame:
    """Gap-fill a per-group time series to a dense regular grid: every
    group gains one row per ``step_seconds`` tick between its own min
    and max ``time_col`` (inclusive), with missing ticks taking the
    ``fill`` constants (default NULL) — the prerequisite for lag/EWMA/
    seasonal windows that must mean "previous HOUR", not "previous
    observed hour".

    Plan shape: a combinable per-group (min, max) aggregate, one
    ``sequence``+``explode`` to manufacture the grid (rows ∝ time
    span / step per group — independent of input row count), and a
    co-partitioned left join back to the observations. No window over
    raw rows, no driver action. ``time_col`` must be a timestamp
    (TIMESTAMP or TIMESTAMP_NTZ; the grid arithmetic runs on
    epoch-anchored tick numbers, so no timezone/DST dependence beyond
    what the column itself carries)."""
    by = list(by)
    step = int(step_seconds)
    # integer tick index: epoch-seconds div step. Epoch via FIELD
    # EXTRACTION (the relational._events discipline) — TIMESTAMP_NTZ
    # neither casts to long nor tolerates timestampdiff (which
    # session-tz-promotes and shifts across DST).
    tick = F.expr(
        f"(unix_date(cast({time_col} as date)) * 86400"
        f" + cast(hour({time_col}) as bigint) * 3600"
        f" + cast(minute({time_col}) as bigint) * 60"
        f" + cast(floor(extract(SECOND from {time_col})) as bigint))"
        f" div {step}")
    obs = df.withColumn("__tick", tick)
    span = obs.groupBy(*by).agg(F.min("__tick").alias("__t0"),
                                F.max("__tick").alias("__t1"))
    grid = (span.withColumn("__tick", F.explode(
                F.sequence(F.col("__t0"), F.col("__t1"))))
                .select(*by, "__tick"))
    out = grid.join(obs.drop(time_col), by + ["__tick"], "left")
    out = out.withColumn(time_col, F.expr(
        f"timestampadd(SECOND, __tick * {step}, "
        f"TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
    for c, v in (fill or {}).items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out.drop("__tick")
