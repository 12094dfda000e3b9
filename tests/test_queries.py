"""Every registry query vs its DuckDB oracle at sf0.001 — the in-repo
twin of the driver's t2 gate."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL
from heracles_spark.queries import all_queries, all_oracles

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    return con


QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle):
    import sys
    sys.path.insert(0, ".")
    from tools.check_correctness import compare

    sdf = QUERIES[name](spark, SF_SMALL).toPandas()
    if name not in ORACLES:
        assert sdf is not None  # rows-only contract: runs and has a schema
        return
    odf = oracle.execute(ORACLES[name]).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, problems


def test_registry_order_blends_coverage_and_rotation():
    """The sampled 50-prefix must contain BOTH never-driver-checked
    queries (coverage schedule) and already-checked ones (~1 in 5
    slots from the pure salted-hash rotation, so regressions in
    previously-green queries stay re-samplable — round-8 advisor
    ask). Also: the order is a permutation of the full registry."""
    from heracles_spark.queries import (_driver_check_counts, _hash_order,
                                        _registries)

    names = [n for reg in _registries() for n in reg]
    order = _hash_order(names)
    assert sorted(order) == sorted(names)          # permutation
    assert len(set(order)) == len(order)
    checked = _driver_check_counts()
    if not checked or all(n in checked for n in names):
        return  # degenerate: nothing to blend
    prefix = order[:50]
    n_re = sum(1 for n in prefix if checked.get(n, 0) > 0)
    assert n_re >= 5, "rotation slots missing from sampled prefix"
    # Coverage: every never-GREEN-checked query must land in the
    # sampled prefix (counts are green-only since round 11, so after
    # many rounds the min-count tier is itself already-checked — the
    # old "<=20 re-checks" bound no longer applies).
    unchecked = [n for n in names if checked.get(n, 0) == 0]
    if len(unchecked) <= 40:          # 4-of-5 coverage slots in 50
        missing = [n for n in unchecked if n not in prefix]
        assert not missing, f"coverage starved: {missing}"
