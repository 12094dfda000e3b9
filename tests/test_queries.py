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
