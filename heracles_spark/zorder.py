"""Z-order (Morton) layout for multi-dimensional key pruning.

Motivation (SCALE.md gap #4): key-range layout sorts by the leading key,
so file min/max boxes are tight on dim 1 and useless on dim 2+ — the
same problem HBase has with non-leading row-key dimensions, which the
reference attacks with server-side skip-scans (HBaseCustomFilter.scala:
43-658). The columnar-native answer is bit-interleaved ordering: files
cover small hyper-rectangles in key space, so min/max pruning works on
EVERY key dimension.

Implementation notes:
- Order-preserving bit treatment per dimension: signed longs are offset
  by MIN_LONG (the same sign-flip trick as the reference's
  order-preserving byte codec, BinaryBytesUtils bytesUtils.scala:111-281
  — reappearing here as bit mixing).
- The z-value is a single LongType expression (shifts/masks, whole-stage
  codegen); no UDF, no shuffle beyond the one range exchange every load
  already pays.
- ``bits_per_dim`` top bits per dimension (coarse interleave): pruning
  only needs file-level locality, not a total Morton order; 16+16 bits
  for 2 dims is ample for ~1e5 files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from heracles_spark.catalog import HeraclesCatalog, KeyTable

def _normalize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale a numeric column into [0, 2^bits) rank space. min/max come
    from a one-pass agg at write time — layout-only, never
    correctness-bearing (the pruner uses real per-file min/max)."""
    span = (hi - lo) or 1.0
    scaled = ((col.cast("double") - F.lit(float(lo))) / F.lit(float(span))
              * F.lit(float((1 << bits) - 1)))
    return F.least(F.greatest(scaled.cast("long"), F.lit(0).cast("long")),
                   F.lit((1 << bits) - 1).cast("long"))


def zvalue(cols: list[Column], bits_per_dim: int = 16,
           ranges: list[tuple[float, float]] | None = None) -> Column:
    """Morton interleave of each column's ``bits_per_dim``-bit normalized
    value. Pure bitwise expression tree (whole-stage codegen)."""
    ndim = len(cols)
    ranges = ranges or [(0.0, float((1 << bits_per_dim) - 1))] * ndim
    norm = [_normalize(c, lo, hi, bits_per_dim)
            for c, (lo, hi) in zip(cols, ranges)]
    z = F.lit(0).cast("long")
    for b in range(bits_per_dim):
        src_bit = bits_per_dim - 1 - b          # highest bits first
        for d, c in enumerate(norm):
            dst_bit = src_bit * ndim + (ndim - 1 - d)
            bit = F.shiftright(c, src_bit).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, dst_bit))
    return z


def write_zordered(spark, catalog: HeraclesCatalog, table: str,
                   df: DataFrame, n_buckets: int = 8,
                   bits_per_dim: int = 16,
                   mode: str = "overwrite") -> KeyTable:
    """Write with Z-order layout instead of lexicographic key order.
    File index + pruner are unchanged: min/max per key column simply
    becomes tight on all dimensions."""
    from heracles_spark import writer

    tbl = catalog.get_table(table)
    fields = tbl.schema().fields
    df = df.toDF(*[f.name for f in fields])
    df = df.select(*[F.col(f.name).cast(f.dataType) for f in fields])
    df = df.where(F.expr(" AND ".join(
        f"`{k}` IS NOT NULL" for k in tbl.key_cols)))
    stats = df.agg(*[f(F.col(k).cast("double")).alias(f"{tag}_{k}")
                     for k in tbl.key_cols
                     for tag, f in (("lo", F.min), ("hi", F.max))]).first()
    ranges = [(stats[f"lo_{k}"], stats[f"hi_{k}"]) for k in tbl.key_cols]
    z = zvalue([F.col(k) for k in tbl.key_cols], bits_per_dim, ranges)
    (df.withColumn("__z", z)
       .repartitionByRange(n_buckets, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode(mode)
       .parquet(tbl.data_dir))
    files = writer.harvest_file_index(tbl.data_dir, tbl.key_cols)
    return catalog.update_file_index(table, files, append=False)
