"""Config-matrix regression (≙ HBaseAdditionalQuerySuite.scala:172-260:
every interesting feature re-run under {coprocessor} × {custom filter} ×
{whole-stage codegen}). The rebuild's execution-mode axes are
whole-stage codegen and adaptive query execution — results must be
identical under every combination (codegen-off falls back to
interpreted expressions; AQE-off to static planning)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

REPRESENTATIVE = [
    "q1_pricing_summary",      # wide decimal aggregate
    "q3_shipping_priority",    # multi-join + agg + topk
    "point_lookup",            # pushdown path
    "window_running_sum",      # window frames
    "set_except_all",          # multiset set-op
    "doc_dedup_exact_text",    # pipeline hash groupBy
    "events_sessionize",       # events normalization + window
]

MATRIX = [
    {"spark.sql.codegen.wholeStage": "false",
     "spark.sql.adaptive.enabled": "true"},
    {"spark.sql.codegen.wholeStage": "true",
     "spark.sql.adaptive.enabled": "false"},
    {"spark.sql.codegen.wholeStage": "false",
     "spark.sql.adaptive.enabled": "false"},
]


def _run(spark, name):
    from heracles_spark.queries import all_queries

    df = all_queries()[name](spark, SF_SMALL)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_results_invariant_across_execution_modes(spark, name):
    baseline = _run(spark, name)
    saved = {}
    try:
        for conf in MATRIX:
            for key, val in conf.items():
                if key not in saved:
                    saved[key] = spark.conf.get(key)
                spark.conf.set(key, val)
            assert _run(spark, name) == baseline, f"{name} diverged: {conf}"
    finally:
        for key, val in saved.items():
            spark.conf.set(key, val)
