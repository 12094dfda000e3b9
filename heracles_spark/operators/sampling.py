"""Dataset splitting / sampling for training pipelines.

- ``hash_split``: deterministic, content-addressed train/eval split —
  the split is a pure function of the id/content (md5 bucket), so it is
  reproducible across runs, engines, partitionings, and re-shards. This
  is the correct way to split at 100 TB (seeded RNG sampling changes
  with partitioning; hashes don't).
- ``stratified_sample``: per-stratum sampling via ``sampleBy`` (seeded
  Bernoulli per row — deterministic for a fixed seed AND partitioning;
  documented as such).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(col: Column, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets): md5 hex → first 8 hex digits →
    integer → mod. conv() is JVM-side; identical SQL exists for DuckDB
    oracles."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
             .cast("long") % n_buckets).cast("int")


def hash_split(df: DataFrame, on: str, train_pct: int = 80,
               out_col: str = "split") -> DataFrame:
    """Adds ``split`` = 'train' | 'eval' deterministically from the
    content of ``on``."""
    b = split_bucket(F.col(on))
    return df.withColumn(out_col,
                         F.when(b < train_pct, "train").otherwise("eval"))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sample (e.g. downsample dominant languages).
    Deterministic for fixed (seed, partitioning) — for partition-stable
    sampling use hash_split-style bucketing instead."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def corpus_mix(df: DataFrame, weights: dict[str, float],
               source_col: str = "source", id_col: str = "doc_id",
               n_buckets: int = 10_000) -> DataFrame:
    """Deterministic source-weighted downsampling — corpus mixing.

    Training corpora are assembled by re-weighting sources (keep 100% of
    books, 25% of common-crawl, ...). A row survives iff its md5 bucket
    of ``id_col`` is below ``weight × n_buckets``; sources absent from
    ``weights`` keep everything; weight 0.0 drops the source. Being a
    pure function of the row id, the SAME rows survive on any engine,
    run, or partitioning — seeded RNG sampling guarantees none of that.

    Scale: a codegen'd filter over the scan — no shuffle, no state; the
    weight map compiles into the predicate (it is source-count sized,
    i.e. tiny)."""
    b = split_bucket(F.col(id_col), n_buckets)
    keep = ~F.col(source_col).isin(list(weights))   # unlisted ⇒ keep all
    for src, wgt in weights.items():
        keep = keep | ((F.col(source_col) == src)
                       & (b < int(round(wgt * n_buckets))))
    return df.where(keep)


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   token_col: str = "n_tokens", budget: int = 2048,
                   n_shards: int = 32) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in id order and
    cut the stream every ``budget`` tokens.

    Adds three columns: ``shard`` (md5 bucket of the id — each shard is
    an independent document stream), ``seq`` (which budget-sized window
    within the shard the document STARTS in), and ``seq_offset`` (token
    offset of the document's first token inside that window). A document
    straddling a cut continues into the next window, exactly like
    pretraining data loaders that slice a concatenated token stream.

    The assignment is a pure function of (id set, token counts): exclusive
    running token sum within the shard, integer-divided by the budget —
    reproducible across engines and partitionings, and expressible as a
    window cumsum in ANSI SQL for the oracle.

    Scale: one hash shuffle on ``shard`` plus a per-shard window sort;
    ``n_shards`` sized to cluster parallelism bounds per-task state (the
    window never materializes more than a shard per task)."""
    from pyspark.sql.window import Window

    out = df.withColumn("shard", split_bucket(F.col(id_col), n_shards))
    w = (Window.partitionBy("shard").orderBy(id_col)
               .rowsBetween(Window.unboundedPreceding, -1))
    excl = F.coalesce(F.sum(F.col(token_col).cast("long")).over(w),
                      F.lit(0).cast("long"))
    return (out.withColumn("__excl__", excl)
               .withColumn("seq", F.expr(f"__excl__ DIV {int(budget)}"))
               .withColumn("seq_offset", F.col("__excl__") % budget)
               .drop("__excl__"))


def global_shuffle(df: DataFrame, on: str, salt: str = "",
                   out_col: str = "shuffle_key") -> DataFrame:
    """Deterministic global permutation for training-order shuffling:
    sort by a content hash of ``on`` (+ optional salt for fresh epochs).
    Unlike orderBy(rand()) this is reproducible across engines, runs,
    and partitionings, and re-shuffling an epoch is just a new salt.

    Scale: one range-partitioned sort — exactly the shuffle a training
    job needs anyway; the hash key is uniform by construction, so range
    partitions balance without sampling skew."""
    key = F.md5(F.concat(F.col(on).cast("string"), F.lit(salt)))
    return df.withColumn(out_col, key).orderBy(out_col)


def _md5_u32(col: Column) -> Column:
    """First 8 md5 hex digits of ``col`` as a uniform integer in
    [0, 2^32). Pure function of the value — same number on any engine
    (DuckDB: ``CAST(('0x' || substring(md5(v), 1, 8)) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16,
                  10).cast("long")


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted sampling without replacement — priority
    sampling (Duffield/Lund/Thorup): each row gets priority
    ``u / w`` where ``u`` is the row's md5-uniform and ``w`` its
    weight; the k smallest priorities win (≡ the k largest ``w/u``),
    so inclusion probability grows with weight. Quality-weighted
    corpus subsetting (keep 1M docs, favor high-quality) needs exactly
    this: reproducible across engines/runs/partitionings, unlike
    seeded RNG.

    Cross-engine determinism: ``u`` is an exact integer < 2^32, the
    priority is ONE correctly-rounded IEEE division — bit-identical
    on any IEEE-754 engine; ties broken by id.

    Scale: priority is a codegen'd map expression; the top-k is
    ``orderBy(...).limit(k)`` → TakeOrderedAndProject (per-partition
    heap + driver merge of k-row heads), NOT a global sort — no
    shuffle of the full table at any size."""
    pri = (_md5_u32(F.col(id_col)).cast("double")
           / F.col(weight_col).cast("double"))
    # weight ≤ 0 or NULL ⇒ never sampled (a zero-weight row has zero
    # inclusion probability; a negative weight would sort ABOVE every
    # positive-weight row through the sign flip — clearly wrong)
    return (df.where(F.col(weight_col) > 0)
              .withColumn("__pri", pri)
              .orderBy("__pri", id_col).limit(k).drop("__pri"))


def cap_per_group(df: DataFrame, group_col: str, k: int,
                  id_col: str = "doc_id",
                  n_salt: int | None = None) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen deterministically by
    md5 hash order of the id (RefinedWeb-style per-domain cap: no
    single domain may dominate the corpus, and WHICH docs survive must
    not depend on scan order).

    Scale: the naive plan (row_number over the group) sorts each
    group inside one task — a mega-domain with 10^9 rows makes one
    straggler. ``n_salt`` enables the two-phase cap: phase 1 keeps the
    k hash-smallest rows per (group, salt-bucket) — per-task state is
    bounded by k — phase 2 re-ranks the ≤ k·n_salt survivors per
    group. Both phases keep "the k hash-smallest ids of the group", so
    the two-phase result EQUALS the single-phase result row-for-row
    (tested), while the heavy sort happens on the salted key space."""
    from pyspark.sql import Window

    key = F.md5(F.col(id_col).cast("string"))
    out = df
    if n_salt:
        w1 = Window.partitionBy(
            group_col,
            _md5_u32(F.col(id_col)) % F.lit(n_salt)).orderBy(key, id_col)
        out = (out.withColumn("__rn1", F.row_number().over(w1))
                  .where(F.col("__rn1") <= k).drop("__rn1"))
    w = Window.partitionBy(group_col).orderBy(key, id_col)
    return (out.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") <= k).drop("__rn"))


def importance_scores(df: DataFrame, target: Column,
                      id_col: str = "doc_id", text_col: str = "text",
                      n_buckets: int = 64) -> DataFrame:
    """DSIR-style importance scores over hashed n-gram features (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): rank raw docs by how target-like their hashed token
    histogram is, then keep the top slice as training data. ``target``
    is a boolean Column marking the docs that define the target
    distribution.

    Engine-stable scoring (no libm): with t_b / s_b = target / source
    gram counts in bucket b, T / S their totals, and c_db the doc's
    bucket counts,

        score(d) = Σ_b c_db · (t_b·S − s_b·T)

    — the exact integer numerator of the probability-DIFFERENCE inner
    product Σ c_db·(t_b/T − s_b/S) scaled by T·S (same ranking
    direction as the log-ratio form for the top-slice use; all-bigint,
    so Spark and any SQL oracle agree bit-for-bit). Returns
    (id, n_grams, score).

    Scale: one explode + two combinable aggs; the bucket table is
    n_buckets rows and BROADCASTS; per-doc work is one equi-join on the
    bucket id + a map-side-combinable sum. Nothing global, nothing
    O(n²); bigint headroom holds to ~10¹⁸ (≈ totals·counts product —
    switch the two products to decimal(38,0) beyond ~10⁹ grams/bucket).
    """
    from heracles_spark.operators.text import tokens

    toks = df.select(F.col(id_col),
                     target.cast("int").alias("__t"),
                     F.explode(tokens(F.col(text_col))).alias("term"))
    # md5-u32 bucket (not xxhash64): a pure function of the term that
    # every engine reproduces, so the scores are oracle-exact.
    b = toks.withColumn("__b", (_md5_u32(F.col("term"))
                                % F.lit(n_buckets)).cast("int"))
    bucket = (b.groupBy("__b")
               .agg(F.sum("__t").alias("tb"),
                    F.sum(1 - F.col("__t")).alias("sb")))
    totals = bucket.agg(F.sum("tb").alias("tt"), F.sum("sb").alias("ss"))
    bstats = (bucket.crossJoin(F.broadcast(totals))
                    .select("__b", (F.col("tb") * F.col("ss")
                                    - F.col("sb") * F.col("tt"))
                            .alias("__w")))
    per_doc = (b.groupBy(F.col(id_col), "__b")
                .agg(F.count(F.lit(1)).alias("c")))
    return (per_doc.join(F.broadcast(bstats), "__b")
                   .groupBy(id_col)
                   .agg(F.sum("c").alias("n_grams"),
                        F.sum(F.col("c") * F.col("__w")).alias("score")))


def temperature_mix_counts(df: DataFrame, alpha: float = 0.5,
                           total: int = 1000,
                           group_col: str = "source") -> DataFrame:
    """Temperature-based corpus mixing quotas (the multilingual-LM
    sampling rule, e.g. mBERT/XLM-R: sample groups ∝ p^α, α<1 UPWEIGHTS
    the tail so head groups stop dominating): per-group target counts
    q_g = floor(total · n_g^α / Σ n_g^α), capped at n_g.

    Determinism: n_g^α is ONE correctly-rounded pow per group —
    identical on any engine for the same (n_g, α) — and the normalizer
    accumulates the ≤|groups| weights in decimal (order-free), so the
    quotas are engine-exact. The actual row selection then reuses
    ``cap_per_group``'s hash-smallest-ids rule (deterministic
    membership, not just counts).

    Scale: one combinable count per group + a groups-sized broadcast —
    the data is touched once more only if rows are then selected."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    w = F.pow(F.col("n").cast("double"), F.lit(float(alpha)))
    weighted = counts.withColumn("__w", w)
    z = weighted.agg(F.sum(F.col("__w").cast("decimal(38,12)"))
                     .cast("double").alias("__z"))
    return (weighted.crossJoin(F.broadcast(z))
                    .select(group_col, "n",
                            F.least(
                                F.col("n"),
                                F.floor(F.lit(float(total)) * F.col("__w")
                                        / F.col("__z")).cast("bigint"))
                             .alias("quota")))


def unimax_allocation(df: DataFrame, group_col: str = "source",
                      size_col: str | None = None, epochs_cap: int = 2,
                      budget_frac: tuple[int, int] = (2, 5)) -> DataFrame:
    """UniMax corpus budget allocation (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining"): spread a total token budget as uniformly
    as possible across groups, except no group repeats more than
    ``epochs_cap`` epochs of its own data. The classic water-filling
    solution: sort groups by capacity ``cap_g = epochs_cap * size_g``
    ascending; groups below the water line get their full cap, the rest
    share the remaining budget equally.

    Closed form via prefix sums (no driver loop): with groups ordered by
    (cap, group) and k* the first position where
    ``cap_k * (n - k + 1) >= budget - prefix_cap_{k-1}``, groups before
    k* take their cap and groups from k* on take the integer water line
    ``base = R div m`` (R = budget - prefix_cap_{k*-1}, m = n - k* + 1),
    with the ``R mod m`` remainder going one-each to the first
    remainder-many groups in order. If the budget exceeds total capacity
    no k* exists and every group takes its cap. Feasibility:
    cap_k* >= base + (1 if rem else 0) by the defining inequality, so no
    allocation exceeds its cap, and allocations sum exactly to
    min(budget, total capacity).

    The budget itself stays in-plan: ``budget = (num * total_size) div
    den`` for ``budget_frac = (num, den)`` — pure integer arithmetic end
    to end, so the result is engine-exact (no libm, no float sums).

    Scale: one combinable count/sum per group, then every window runs
    over the ONE-ROW-PER-GROUP relation (|groups| ~ dozens at 100 TB) —
    the unpartitioned windows here are O(|groups|), the same deliberate
    tiny-relation exception as with_global_ranks' bucket-offset
    cumulation (ranking.py).

    Returns (group_col, sz, cap, alloc, epochs): alloc in the same unit
    as ``size_col`` (rows if None), epochs = alloc/sz rounded 6.
    """
    from pyspark.sql import Window

    num, den = budget_frac
    agg = (F.count(F.lit(1)) if size_col is None
           else F.sum(size_col)).cast("long").alias("sz")
    sizes = df.groupBy(group_col).agg(agg)
    budget = sizes.agg(F.sum("sz").cast("long").alias("__tot")) \
                  .select(F.expr(f"(__tot * {num}) div {den}")
                           .alias("__budget"))
    w = Window.orderBy("cap", group_col)
    ranked = (sizes
              .withColumn("cap", F.col("sz") * F.lit(epochs_cap))
              .join(F.broadcast(budget))
              .withColumn("k", F.row_number().over(w))
              .withColumn("prefix", F.coalesce(
                  F.sum("cap").over(w.rowsBetween(
                      Window.unboundedPreceding, -1)), F.lit(0)))
              .withColumn("n", F.count(F.lit(1)).over(
                  w.rowsBetween(Window.unboundedPreceding,
                                Window.unboundedFollowing))))
    is_line = (F.col("cap") * (F.col("n") - F.col("k") + 1)
               >= F.col("__budget") - F.col("prefix"))
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    marked = (ranked
              .withColumn("__kstar", F.min(F.when(is_line, F.col("k")))
                          .over(wall))
              .withColumn("__R", F.max(F.when(F.col("k") == F.col("__kstar"),
                                              F.col("__budget")
                                              - F.col("prefix")))
                          .over(wall)))
    m = F.col("n") - F.col("__kstar") + 1
    base = F.expr("__R div (n - __kstar + 1)")
    rem = F.col("__R") % m
    alloc = F.when(F.col("__kstar").isNull()
                   | (F.col("k") < F.col("__kstar")), F.col("cap")) \
             .otherwise(base + F.when(
                 F.col("k") - F.col("__kstar") < rem, 1).otherwise(0))
    return (marked.select(group_col, "sz", "cap",
                          alloc.cast("long").alias("alloc"))
                  .withColumn("epochs", F.round(
                      F.col("alloc").cast("double") / F.col("sz"), 6)))


def hamilton_allocation(counts: DataFrame, group_col: str, n_col: str,
                        n_total: int) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of ``n_total`` slots
    across groups proportionally to ``n_col`` — the integer-exact
    allocation step of stratified sampling. base = floor(n_total·n/N);
    the leftover slots go to the largest fractional remainders (group
    ties broken by name). Allocation is capped at the group size, so a
    stratum is never asked for more rows than it has.

    Every step is integer arithmetic (div/%/comparisons) — no floats,
    so the allocation is bit-identical on any engine. The totals and
    the remainder ranking are windows over the aggregated
    one-row-per-group relation (already reduced), partitioned by the
    constant-surviving pmod(xxhash64,1) key so the optimized plan
    never shows an unpartitioned window."""
    from pyspark.sql import Window

    one = F.pmod(F.xxhash64(F.col(group_col)), F.lit(1))
    wall = Window.partitionBy(one)
    wrk = wall.orderBy(F.desc("__rem"), F.col(group_col))
    x = (counts.withColumn("__tot", F.sum(F.col(n_col)).over(wall))
               .withColumn("__q", F.lit(n_total) * F.col(n_col))
               .withColumn("__base", F.expr("__q div __tot"))
               .withColumn("__rem", F.expr("__q % __tot")))
    x = (x.withColumn("__sb", F.sum("__base").over(wall))
          .withColumn("__rk", F.row_number().over(wrk)))
    alloc = F.col("__base") + \
        (F.col("__rk") <= F.lit(n_total) - F.col("__sb")).cast("long")
    return x.select(group_col,
                    F.least(alloc, F.col(n_col)).alias("alloc"))


def stratified_sample_n(df: DataFrame, group_col: str, n_total: int,
                        id_col: str, n_salt: int | None = 64) -> DataFrame:
    """Deterministic stratified sample: ``n_total`` rows apportioned
    across strata by :func:`hamilton_allocation` (proportional,
    integer-exact), membership chosen per stratum as the alloc
    hash-smallest ids — the eval-set/train-subset construction that
    must be reproducible across engines, runs and partitionings.

    Scale: the allocation relation is one row per stratum (broadcast
    back); selection is the salted two-phase bottom-k of
    :func:`cap_per_group` — phase 1 bounds per-task state to the
    stratum's alloc within each (stratum, salt) bucket, phase 2
    re-ranks the ≤ alloc·n_salt survivors, provably equal to the
    naive single-window plan because both keep exactly the alloc
    hash-smallest ids of each stratum."""
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    alloc = hamilton_allocation(counts, group_col, "__n", n_total)
    key = F.md5(F.col(id_col).cast("string"))
    x = df.join(F.broadcast(alloc), group_col)
    if n_salt:
        w1 = Window.partitionBy(
            group_col,
            _md5_u32(F.col(id_col)) % F.lit(n_salt)).orderBy(key, id_col)
        x = (x.withColumn("__r1", F.row_number().over(w1))
              .where(F.col("__r1") <= F.col("alloc")).drop("__r1"))
    w = Window.partitionBy(group_col).orderBy(key, id_col)
    return (x.withColumn("__rn", F.row_number().over(w))
             .where(F.col("__rn") <= F.col("alloc"))
             .drop("__rn", "alloc"))
