"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot product/norms via F.zip_with + F.aggregate (JVM-side, codegen).
- ``hyperplane_signature`` + ``ann_topk_lsh``: random-hyperplane LSH —
  the scale path: signature match prunes candidates before exact rerank.
- ``ivf_build`` / ``ivf_topk``: IVF with deterministic centroid seeding —
  probe the nearest n_probe cells only.

Scale notes (100 TB / billions of vectors):
- brute force is a full scan per query — fine for batch scoring, wrong
  for online; LSH/IVF prune the scan to a bucket subset.
- the query vector enters the plan as a literal array (broadcast-free);
  batch query sets join on bucket/cell id (hash shuffle, no cross join).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rng_matrix(n_rows: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-gaussian matrix via splitmix64 bits → uniform
    pairs → Box-Muller. No numpy dependency at plan time; stable across
    processes (no RNG state)."""
    def mix(x: int) -> int:
        x = (x + 0x9E3779B97F4A7C15) % (1 << 64)
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) % (1 << 64)
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) % (1 << 64)
        return x ^ (x >> 31)

    out = []
    ctr = seed
    for _ in range(n_rows):
        row = []
        for _ in range(dim):
            ctr += 1
            u1 = (mix(ctr) % (1 << 53)) / float(1 << 53) or 1e-12
            ctr += 1
            u2 = (mix(ctr) % (1 << 53)) / float(1 << 53)
            row.append(math.sqrt(-2.0 * math.log(u1)) * math.cos(2 * math.pi * u2))
        out.append(row)
    return out


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force top-k by cosine to a literal query vector.
    TakeOrderedAndProject keeps only k rows per partition → driver merge."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (df.select(F.col(id_col),
                      F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine"))
              .orderBy(F.desc("cosine"), id_col)
              .limit(k))


def hyperplane_signature(vec: Column, n_planes: int = 16,
                         seed: int = 42, dim: int = 64) -> Column:
    """LSH bucket id: sign bits against n_planes fixed hyperplanes,
    packed into an int. The planes are literal arrays inside the
    expression — no side table, no broadcast."""
    planes = _rng_matrix(n_planes, dim, seed)
    sig = F.lit(0)
    for i, p in enumerate(planes):
        parr = F.array(*[F.lit(v) for v in p])
        bit = F.when(dot_expr(vec, parr) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = sig.bitwiseOR(bit)
    return sig


def ann_topk_lsh(df: DataFrame, query_vec: list[float], k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_planes: int = 8, seed: int = 42) -> DataFrame:
    """Approximate top-k: candidates = vectors whose hyperplane signature
    is within hamming distance 1 of the query's, exact-reranked by
    cosine. Recall grows with fewer planes / larger hamming radius."""
    dim = len(query_vec)
    planes = _rng_matrix(n_planes, dim, seed)
    qsig = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(p, query_vec)) >= 0:
            qsig |= 1 << i
    near = [qsig] + [qsig ^ (1 << i) for i in range(n_planes)]
    sig = hyperplane_signature(F.col(vec_col), n_planes, seed, dim)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (df.withColumn("sig", sig)
              .where(F.col("sig").isin(near))
              .select(F.col(id_col),
                      F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine"))
              .orderBy(F.desc("cosine"), id_col)
              .limit(k))


def ivf_build(df: DataFrame, n_cells: int = 16, id_col: str = "vec_id",
              vec_col: str = "embedding", seed: int = 42,
              dim: int = 64) -> DataFrame:
    """Assign each vector to its nearest of n_cells fixed centroids
    (deterministic pseudo-random centroids — one k-means iteration away
    from real IVF; the *assignment/probe* machinery is the Spark-shaped
    part). Returns df + cell_id. Write partitioned by cell_id for
    probe-pruned reads."""
    cents = _rng_matrix(n_cells, dim, seed)
    best = None
    for ci, cvec in enumerate(cents):
        carr = F.array(*[F.lit(v) for v in cvec])
        d = dot_expr(F.col(vec_col), carr) / (norm_expr(F.col(vec_col)) + F.lit(1e-12))
        cand = F.struct(d.alias("score"), F.lit(ci).alias("cell"))
        best = cand if best is None else F.when(
            cand.getField("score") > best.getField("score"), cand).otherwise(best)
    return df.withColumn("cell_id", best.getField("cell"))


def ivf_topk(df_with_cells: DataFrame, query_vec: list[float], k: int = 10,
             n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", n_cells: int = 16,
             seed: int = 42) -> DataFrame:
    """Probe the n_probe cells whose centroids best match the query,
    exact-rerank inside them. With cell-partitioned storage this prunes
    the scan itself (partition pruning on cell_id)."""
    dim = len(query_vec)
    cents = _rng_matrix(n_cells, dim, seed)
    qn = math.sqrt(sum(v * v for v in query_vec)) or 1e-12
    scored = sorted(
        range(n_cells),
        key=lambda ci: -sum(a * b for a, b in zip(cents[ci], query_vec)) / qn)
    probe = scored[:n_probe]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (df_with_cells.where(F.col("cell_id").isin(probe))
            .select(F.col(id_col),
                    F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine"))
            .orderBy(F.desc("cosine"), id_col)
            .limit(k))
