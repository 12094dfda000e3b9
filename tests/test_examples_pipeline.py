"""Executes the Python-API curation walkthrough end-to-end — the
DataFrame-level counterpart of the SQL demo regression tests."""

from __future__ import annotations


def test_curation_pipeline_example_runs(spark):
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "curation_pipeline.py")
    spec = importlib.util.spec_from_file_location("curation_pipeline",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    packed, manifest = mod.run(spark, "/root/testdata/sf0.001")
    rows = {r["source"]: r for r in manifest.collect()}
    assert len(rows) >= 2
    for r in rows.values():
        # the funnel only narrows: raw ≥ deduped ≥ train + eval
        assert r["raw"] >= (r["deduped"] or 0)
        assert (r["deduped"] or 0) >= (r["train"] or 0) + (r["eval"] or 0)
    cols = set(packed.columns)
    assert {"shard", "seq", "seq_offset"} <= cols
    assert packed.count() > 0
    # determinism: a repartitioned re-run yields the same manifest
    packed2, manifest2 = mod.run(spark, "/root/testdata/sf0.001")
    assert sorted(map(tuple, manifest.collect())) == \
           sorted(map(tuple, manifest2.collect()))
