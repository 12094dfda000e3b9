"""Catalog CRUD + validation (≙ HBaseCatalogTestSuite.scala:32-142)."""

from __future__ import annotations

import pytest

from heracles_spark.catalog import CatalogError, HeraclesCatalog

COLS = [("doublecol", "double"), ("strcol", "string"), ("intcol", "int"),
        ("bytecol", "tinyint"), ("longcol", "bigint")]
KEYS = ["doublecol", "strcol", "intcol"]  # testTable key order (FIXTURES §1)


def test_create_get_roundtrip(catalog):
    catalog.create_table("testtable", COLS, KEYS)
    t = catalog.get_table("testTable")  # case-insensitive lookup
    assert t.key_cols == KEYS
    assert t.non_key_cols() == ["bytecol", "longcol"]
    schema = t.schema()
    assert not schema["doublecol"].nullable      # key cols non-nullable
    assert schema["bytecol"].nullable            # non-key nullable


def test_create_validations(catalog):
    with pytest.raises(CatalogError, match="key column"):
        catalog.create_table("t1", COLS, ["nope"])
    with pytest.raises(CatalogError, match="at least one"):
        catalog.create_table("t2", COLS, [])
    with pytest.raises(CatalogError, match="duplicate key"):
        catalog.create_table("t3", COLS, ["intcol", "intcol"])
    with pytest.raises(CatalogError, match="unsupported type"):
        catalog.create_table("t4", [("a", "decimal(10,2)")], ["a"])
    catalog.create_table("t5", COLS, KEYS)
    with pytest.raises(CatalogError, match="already exists"):
        catalog.create_table("t5", COLS, KEYS)


def test_drop_and_list(catalog):
    catalog.create_table("a", COLS, KEYS)
    catalog.create_table("b", COLS, KEYS)
    assert catalog.list_tables() == ["a", "b"]
    catalog.drop_table("a")
    assert catalog.list_tables() == ["b"]
    with pytest.raises(CatalogError):
        catalog.get_table("a")


def test_alter_non_key_only(catalog):
    """ALTER restricted to non-key columns (hbaseCommands.scala:33-59)."""
    catalog.create_table("t", COLS, KEYS)
    catalog.alter_add_column("t", "extra", "float")
    assert ("extra", "float") in catalog.get_table("t").columns
    catalog.alter_drop_column("t", "extra")
    with pytest.raises(CatalogError, match="key column"):
        catalog.alter_drop_column("t", "intcol")
    with pytest.raises(CatalogError, match="exists"):
        catalog.alter_add_column("t", "strcol", "string")


def test_persistence_across_instances(catalog):
    catalog.create_table("t", COLS, KEYS, properties={"encodingFormat": "binaryformat"})
    fresh = HeraclesCatalog(catalog.metastore_dir)
    t = fresh.get_table("t")
    assert t.properties["encodingFormat"] == "binaryformat"
    assert t.key_cols == KEYS
