"""Local stand-in for the driver's t2 gate: run every queries() entry on
Spark and its oracle on DuckDB, compare row count, column names, and
values (order-insensitive, exact). Usage:

    python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, ".")

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        return [f"row count: spark={len(sdf)} oracle={len(odf)}"]
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    # The driver hashes stringified values, so int 0 vs float 0.0 (e.g. a
    # DuckDB HUGEINT window sum fetched as float64) is a driver FAIL even
    # though == passes. Flag any int-vs-float dtype-kind split up front.
    for c in sorted(sdf.columns):
        sk, ok = sdf[c].dtype.kind, odf[c].dtype.kind
        if {sk, ok} == {"i", "f"} or {sk, ok} == {"u", "f"}:
            problems.append(
                f"col {c}: HASH-RISK dtype split spark={sdf[c].dtype} "
                f"oracle={odf[c].dtype} (cast the oracle projection)")
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, ov))
               if not values_equal(a, b)]
        if bad:
            i, a, b = bad[0]
            problems.append(
                f"col {c}: {len(bad)}/{len(sv)} mismatches, first at row {i}: "
                f"spark={a!r} oracle={b!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from heracles_spark.queries import all_queries, all_oracles

    if os.environ.get("HERACLES_VANILLA"):
        # Mimic the driver exactly: a stock SparkSession with none of our
        # tuned configs (and whatever TZ the process inherits).
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[*]")
                 .appName("correctness-vanilla").getOrCreate())
    else:
        from heracles_spark.session import get_session
        spark = get_session("correctness-check")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            # Spark-written table (e.g. the sf1_synth scale data): a
            # DIRECTORY of part files — glob it so the same oracle SQL
            # verifies correctness at scale, not just at sf<=0.01.
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{src}/*.parquet')")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    queries, oracles = all_queries(), all_oracles()
    n_pass = n_fail = n_noracle = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_noracle += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
