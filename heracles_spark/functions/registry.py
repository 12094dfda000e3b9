"""UDF registration — mirrors the reference's udf-in-WHERE surface
(HBaseAdditionalQuerySuite.scala:204-238: ``session.udf.register("ageFilter",
(age: Int) => age > 20)`` then ``WHERE ageFilter(teacher_age)``).

Both forms are provided:
- plain Python UDF (row-at-a-time; the slow path — kept for API parity),
- pandas UDF (Arrow-vectorized; 10-100× faster, the recommended form).

UDFs are the escape hatch, not the default: every built-in operator in
this repo is expression-only (see plan audits asserting no Python nodes).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType


def register_builtin_udfs(spark: SparkSession) -> list[str]:
    """Register the demo UDF surface; returns registered names."""

    # Row-at-a-time (≙ the reference's Scala closure).
    spark.udf.register("age_filter",
                       lambda age: age is not None and age > 20,
                       BooleanType())

    # Arrow-vectorized equivalents.
    @F.pandas_udf(BooleanType())
    def age_filter_v(age: pd.Series) -> pd.Series:
        return age > 20

    @F.pandas_udf(DoubleType())
    def zscore(v: pd.Series) -> pd.Series:
        # Batch-local normalization (per Arrow batch) — a demo of the
        # vectorized shape; whole-column zscore belongs in a window/agg.
        s = v.std(ddof=1)
        return (v - v.mean()) / s if s and s == s else v * 0.0

    spark.udf.register("age_filter_v", age_filter_v)
    spark.udf.register("zscore_batch", zscore)
    register_builtin_udtfs(spark)
    return ["age_filter", "age_filter_v", "zscore_batch",
            "split_sentences"]


def register_builtin_udtfs(spark: SparkSession) -> list[str]:
    """Spark 4 Python UDTF surface: a table function usable in FROM /
    LATERAL positions. ``split_sentences(text)`` → one row per
    sentence with its ordinal — the shape a text pipeline uses to
    explode documents into model-ready units when the split logic
    outgrows what regexp expressions express (here it does NOT, which
    is exactly why the driver query carries a plain-SQL oracle proving
    the UDTF computes what it claims — the udf_where_filter pattern).

    UDTFs are per-row Python — the escape hatch, not the hot path; the
    built-in equivalent (posexplode(split(...))) stays the default."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            import re
            parts = [p.strip() for p in re.split(r"[.!?]+", text)]
            for i, p in enumerate(parts):
                if p:
                    yield i, p

    spark.udtf.register("split_sentences", SplitSentences)
    return ["split_sentences"]
