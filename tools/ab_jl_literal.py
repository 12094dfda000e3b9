"""A/B: parsed vs nested-Column construction of the JL sign-matrix
literal in random_projection_micro.

The operator folds a k×dim ±1 matrix into the plan as a literal.
Building it as nested F.array(F.lit(...)) issues one py4j call per
Column object (k×dim + k + 2 calls); building the SAME literal as one
F.expr("array(array(...),...)") string issues one. Same analyzed
expression, same results. This times the full
embedding_random_projection query (build + collect, fresh plan per
run) under both constructions IN THE SAME JVM, interleaved, identity
asserted first.

Usage: python tools/ab_jl_literal.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from heracles_spark import layout
    from heracles_spark.operators import similarity as S
    from heracles_spark.queries import all_queries
    from heracles_spark.session import get_session

    spark = get_session("ab-jl-literal")
    spark.sparkContext.setLogLevel("ERROR")
    layout_dir, _ = layout.prepare(spark, sf_dir)
    os.environ["HERACLES_LAYOUT_DIR"] = layout_dir

    new_rp = S.random_projection_micro

    def legacy_rp(df, k, dim, vec_col="embedding", micro_col="emb_micro",
                  out_col="proj", salt="jl"):
        signs = S.jl_sign_matrix(k, dim, salt)
        slit = F.array(*[F.array(*[F.lit(s) for s in row])
                         for row in signs])
        proj = F.transform(
            F.sequence(F.lit(1), F.lit(k)),
            lambda j: F.aggregate(
                F.zip_with(F.col(micro_col), F.element_at(slit, j),
                           lambda x, s: x * s),
                F.lit(0).cast("long"), lambda acc, v: acc + v))
        return (df.withColumn(micro_col, S.micro_vec_expr(vec_col))
                  .withColumn(out_col, proj))

    registry = all_queries()
    fn = getattr(registry["embedding_random_projection"],
                 "__wrapped_query__",
                 registry["embedding_random_projection"])

    def run(variant):
        S.random_projection_micro = variant
        try:
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            rows = df.collect()
            t2 = time.time()
            return rows, round(t1 - t0, 3), round(t2 - t1, 3)
        finally:
            S.random_projection_micro = new_rp

    ra, _, _ = run(new_rp)
    rb, _, _ = run(legacy_rp)
    assert sorted(map(tuple, ra)) == sorted(map(tuple, rb))
    print("identity: OK")

    acc = {"parsed": [], "nested": []}
    for r in range(rounds):
        for label, variant in (("parsed", new_rp), ("nested", legacy_rp)):
            spark.sparkContext.setJobDescription(f"ab-jl {label} r{r}")
            _, b, e = run(variant)
            acc[label].append((b, e, round(b + e, 3)))
    for label in ("parsed", "nested"):
        tot = [t for _, _, t in acc[label]]
        b = [x for x, _, _ in acc[label]]
        print(f"{label}: total min {min(tot):.3f} (runs {tot}) | "
              f"build min {min(b):.3f} (builds {b})")


if __name__ == "__main__":
    main()
