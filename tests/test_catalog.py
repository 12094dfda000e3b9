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


def test_file_index_shards_to_parquet(catalog):
    """Past FILES_INLINE_MAX the index is stored as a sidecar parquet
    dataset (SCALE.md gap #1) transparently to the API."""
    import json
    import os

    catalog.create_table("big", [("k", "int"), ("v", "string")], ["k"])
    files = [{"path": f"/data/part-{i:06d}.parquet", "rows": 1000,
              "min": {"k": i * 1000}, "max": {"k": i * 1000 + 999}}
             for i in range(catalog.FILES_INLINE_MAX + 10)]
    catalog.update_file_index("big", files)
    # JSON doc holds a ref, not the list
    with open(catalog._path("big")) as f:
        doc = json.load(f)
    assert "__files_ref" in doc["files"]
    assert os.path.exists(doc["files"]["__files_ref"])
    # fresh instance reads it back losslessly
    fresh = HeraclesCatalog(catalog.metastore_dir)
    t = fresh.get_table("big")
    assert len(t.files) == catalog.FILES_INLINE_MAX + 10
    assert t.files[0]["min"] == {"k": 0}
    # and the pruner works on the rehydrated index
    from heracles_spark.pruning import prune_files
    kept = prune_files(t.files, ("=", "k", 123456), t.key_cols)
    assert len(kept) == 1 and kept[0]["min"]["k"] == 123000
