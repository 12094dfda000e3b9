"""Query registry: every SURVEY §2 operator expressed as a (spark_fn,
oracle_sql) pair. ``all_queries()``/``all_oracles()`` feed
__spark_entry__.py, tests, and bench.py from one source of truth."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registries():
    from heracles_spark.queries import (relational, relational2, relational3,
                                        relational4, pipeline, extensions,
                                        curation, curation2, curation3,
                                        curation4, curation5, curation6,
                                        curation7, curation8, curation9,
                                        curation10, curation11,
                                        curation12, curation13)

    return (relational.QUERIES, relational2.QUERIES, relational3.QUERIES,
            relational4.QUERIES, pipeline.QUERIES, extensions.QUERIES,
            curation.QUERIES, curation2.QUERIES, curation3.QUERIES,
            curation4.QUERIES, curation5.QUERIES, curation6.QUERIES,
            curation7.QUERIES, curation8.QUERIES, curation9.QUERIES,
            curation10.QUERIES, curation11.QUERIES, curation12.QUERIES,
            curation13.QUERIES)


# Registry ordering: external harnesses sample a PREFIX of the registry
# (the round driver checks the first 50 entries), so the order must
# maximize VERIFICATION COVERAGE without biasing what gets sampled.
# The order BLENDS two schedules (round-8 advisor ask — a pure
# least-checked-first sort would systematically starve
# already-verified queries of re-checks, so a regression in a
# previously-green query would never be re-sampled):
#   * 4 of every 5 slots: (times already driver-checked ASC,
#     md5(salt:name)) — a round-robin coverage scheduler whose primary
#     key is computed only from committed public driver artifacts
#     (CORRECTNESS_r*.json — which queries any past round sampled),
#     never from what the queries compute or how they perform.
#   * 1 of every 5 slots: the pure salted content-blind hash
#     permutation over ALL queries, so every query — including
#     many-times-checked ones — keeps a rotating chance of landing in
#     the sampled prefix (salt = artifact count, so both schedules
#     rotate each round).
# Least-checked queries therefore still surface fast (the union of
# sampled prefixes converges to full-registry coverage) while ~20% of
# each sample re-checks the already-verified population. Once every
# query is equally checked the blend degenerates to the plain hash
# permutation. Deterministic and reproducible from repo contents
# alone; membership is unchanged — every query is always present.


def _repo_root() -> str:
    import os

    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _round_salt() -> int:
    import glob
    import os

    return len(glob.glob(os.path.join(_repo_root(),
                                      "CORRECTNESS_r*.json")))


def _driver_check_counts() -> dict[str, int]:
    """How many committed driver rounds have GREEN-checked each query —
    from the CORRECTNESS_r*.json artifacts only. A sampled-but-failed
    round does not count as verification (the query was later fixed but
    the driver never re-saw it), so failed samples keep the query at
    the front of the coverage schedule until a green check lands."""
    import glob
    import json
    import os

    counts: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(_repo_root(),
                                           "CORRECTNESS_r*.json"))):
        try:
            with open(p) as fh:
                for name, res in json.load(fh).items():
                    ok = (isinstance(res, dict)
                          and res.get("rows_match")
                          and res.get("schema_match") is not False
                          and res.get("hash_match") is not False
                          and not res.get("err"))
                    if ok:
                        counts[name] = counts.get(name, 0) + 1
        except (OSError, ValueError, AttributeError):
            continue
    return counts


def _hash_order(names) -> list[str]:
    import hashlib

    salt = _round_salt()
    checked = _driver_check_counts()

    def h(n: str) -> str:
        return hashlib.md5(f"{salt}:{n}".encode()).hexdigest()

    coverage = sorted(names, key=lambda n: (checked.get(n, 0), h(n)))
    rotation = sorted(names, key=h)
    out: list[str] = []
    seen: set[str] = set()
    ci = ri = 0
    for slot in range(len(coverage)):
        src, idx = ((rotation, ri) if slot % 5 == 4
                    else (coverage, ci))
        while idx < len(src) and src[idx] in seen:
            idx += 1
        if idx >= len(src):          # this schedule exhausted — drain
            src, idx = ((coverage, ci) if src is rotation
                        else (rotation, ri))
            while src[idx] in seen:
                idx += 1
        out.append(src[idx])
        seen.add(src[idx])
        if src is rotation:
            ri = idx + 1
        else:
            ci = idx + 1
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry with per-session plan reuse: each entry is wrapped in
    :func:`heracles_spark.plancache.cached_query`, so re-running a query
    in one session returns the SAME DataFrame (analysis + codegen cache
    hit) — the prepared-plan behavior a long-lived engine session has.
    Direct module access (``relational.QUERIES[...]``) stays uncached
    for tests that want fresh plan construction."""
    from heracles_spark.plancache import cached_query

    merged: dict[str, Callable] = {}
    for reg in _registries():
        merged.update({k: cached_query(k, v[0]) for k, v in reg.items()})
    return {k: merged[k] for k in _hash_order(merged)}


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for reg in _registries():
        for k, (_, sql) in reg.items():
            if sql is not None:
                out[k] = sql
    return out
