"""Driver simulator: mirrors the external correctness harness more closely
than tools/check.py.

Differences from check.py that have burned rounds before:
- builds a VANILLA SparkSession (no session.py confs) — the driver never
  calls get_session(), so every query must survive a bare session;
- evaluates the registry in ITS order (positional prefix, default 50), not
  alphabetically — what the capped external sweep will actually see;
- canonicalizes through pandas (sort by all columns) — raw array/map
  columns raise `unhashable type` here exactly like the driver's harness.

Usage: python tools/driver_sim.py [sf_dir] [n_entries]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from apache_hive_1_2_2_src_spark.registry import load_all
from apache_hive_1_2_2_src_spark.tables import TABLES


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # the driver sorts via pandas — lists/dicts in cells raise TypeError here
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def norm(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\x00NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def value_hash(df: pd.DataFrame) -> int:
    return hash(tuple(tuple(norm(v) for v in row) for row in df.itertuples(index=False)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import SparkSession

    # vanilla session: intentionally NO semantic confs (ensure_confs must cope)
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver_sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    reg = load_all()
    names = list(reg)[:cap]
    n_ok = n_no_oracle = n_bad = n_err = 0
    for pos, name in enumerate(names):
        q = reg[name]
        t0 = time.time()
        try:
            sdf = q.build(spark, sf_dir)
            spdf = sdf.toPandas()
            if q.oracle is None:
                n_no_oracle += 1
                print(f"NO_ORACLE {pos:3d} {name} rows={len(spdf)} {time.time()-t0:.1f}s")
                continue
            odf = con.execute(q.oracle).fetchdf()
            s, o = canon(spdf), canon(odf)
            rows = len(s) == len(o)
            schema = list(s.columns) == list(o.columns)
            hashes = value_hash(s) == value_hash(o)
            if rows and schema and hashes:
                n_ok += 1
                print(f"OK        {pos:3d} {name} rows={len(s)} {time.time()-t0:.1f}s")
            else:
                n_bad += 1
                print(
                    f"MISMATCH  {pos:3d} {name} rows_match={rows} "
                    f"schema_match={schema} hash_match={hashes}"
                )
        except Exception as ex:
            n_err += 1
            print(f"ERROR     {pos:3d} {name}: {type(ex).__name__}: {str(ex)[:160]}")
    print(f"== {n_ok} ok / {n_no_oracle} no_oracle / {n_bad} mismatch / {n_err} error (of {len(names)})")
    return 0 if n_bad == n_err == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
