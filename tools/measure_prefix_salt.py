"""r19 measurement (VERDICT r18 item 4): the hot-PREFIX salting knob.

SCALE.md r18 left one residual in the collapse probe: at m >= ~10^5
thin-uniqueness template docs, ONE shingle key sits in every prefix and
its in-join enumeration runs as a single merge-join task (66 s at
m=32,000 — nothing materializes, the positional bound prunes per row,
but the enumeration itself is serial). The documented-but-uncoded escape
hatch was 16-way salting of the hot shingle key; r19 implements it as
``exact_collapse_prior_dup_counts(d, prefix_salt=S)`` (default OFF).

This tool measures the knob on the template corpus at growing m:
unsalted vs prefix_salt=16, with equal-sums asserted each point, plus
the max-task share of the candidate stage (the split evidence).

Usage: python tools/measure_prefix_salt.py [m ...]   (default 32000 64000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.session import get_session
from apache_hive_1_2_2_src_spark.tables import load_table


def main() -> None:
    ms = [int(a) for a in sys.argv[1:]] or [32000, 64000]
    sf_dir = "/root/testdata/sf0.01"
    spark = get_session("prefix-salt-audit")
    from apache_hive_1_2_2_src_spark.extensions.dedup import (
        exact_collapse_prior_dup_counts,
    )

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for m in ms:
        hot = spark.range(m).select(
            (F.col("id") + 200_000).alias("doc_id"),
            F.concat(
                F.lit("click here now to claim offer number "),
                F.col("id").cast("string"), F.lit(" today"),
            ).alias("text"),
        )
        hov = base.unionByName(hot).localCheckpoint()
        out = {"m_template_docs": m}
        for tag, salt in (("unsalted", 1), ("salt16", 16)):
            t0 = time.time()
            # aggregate over the counts, NOT .count() — the final join is
            # cardinality-preserving and Catalyst would eliminate the
            # whole pair pipeline under a bare count (r18 lesson).
            s = (
                exact_collapse_prior_dup_counts(hov, prefix_salt=salt)
                .agg(F.sum("n_dup_prior"))
                .first()[0]
            )
            out[f"{tag}_s"] = round(time.time() - t0, 2)
            out[f"{tag}_sum"] = int(s)
        assert out["unsalted_sum"] == out["salt16_sum"], out
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
