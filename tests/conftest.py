from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from heracles_spark.session import get_session

    s = get_session("heracles-tests", master="local[8]",
                    extra_conf={"spark.sql.shuffle.partitions": "8"})
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def catalog(tmp_path):
    from heracles_spark.catalog import HeraclesCatalog

    return HeraclesCatalog(str(tmp_path / "metastore"))


@pytest.fixture()
def hsession(spark, catalog):
    from heracles_spark.session import HeraclesSession

    h = HeraclesSession.__new__(HeraclesSession)
    h.spark = spark
    h.catalog = catalog
    return h
