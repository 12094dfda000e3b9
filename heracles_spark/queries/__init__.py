"""Query registry: every SURVEY §2 operator expressed as a (spark_fn,
oracle_sql) pair. ``all_queries()``/``all_oracles()`` feed
__spark_entry__.py, tests, and bench.py from one source of truth."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from heracles_spark.queries import relational, pipeline

    out: dict[str, Callable] = {}
    out.update({k: v[0] for k, v in relational.QUERIES.items()})
    out.update({k: v[0] for k, v in pipeline.QUERIES.items()})
    return out


def all_oracles() -> dict[str, str]:
    from heracles_spark.queries import relational, pipeline

    out: dict[str, str] = {}
    for reg in (relational.QUERIES, pipeline.QUERIES):
        for k, (_, sql) in reg.items():
            if sql is not None:
                out[k] = sql
    return out
