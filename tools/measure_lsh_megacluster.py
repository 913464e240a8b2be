"""r18 adversarial audit: EXACT-duplicate mega-cluster blow-up in the
near-dup probe paths.

The streaming LSH probe (_lsh_probe_dedup) and the batch re-probe both
generate candidates from (band, sig) equality with NO hot-bucket cap
(unlike dedup_minhash_lsh's bucket_cap): m byte-identical docs share every
band signature, so the candidate stage pays C(m, 2) pairs and the exact-
Jaccard verify pays C(m, 2) x |shingles| join rows. The cap cannot be
mirrored in the exact-Jaccard oracle (the oracle does not model banding),
so the fix must be ANSWER-IDENTICAL: exact_collapse_prior_dup_counts
(dedup.py) groups identical content first and probes one representative
per distinct text — J(d, e) depends only on the content pair, so the
expansion arithmetic reproduces every count exactly (pinned in
tests/test_round18_ops.py).

Measures, on sf0.01 documents (500 docs) + m identical clones:
1. direct O(pairs) counts (the oracle shape): wall + verified pairs
2. exact-collapse counts: wall (same output, pinned equal)
3. the streaming 3-drop probe end-to-end: overlay vs no-clone control

Usage: python tools/measure_lsh_megacluster.py [m]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.session import get_session
from apache_hive_1_2_2_src_spark.tables import load_table


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    sf_dir = "/root/testdata/sf0.01"
    spark = get_session("lsh-megacluster-audit")
    from apache_hive_1_2_2_src_spark.extensions.dedup import (
        exact_collapse_prior_dup_counts,
    )
    from apache_hive_1_2_2_src_spark.streaming import windows as sw
    from tests.test_round18_ops import _naive_prior_counts

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    donor = base.filter(F.col("doc_id") == 5).first()["text"]
    clones = spark.range(m).select(
        (F.col("id") + 100_000).alias("doc_id"), F.lit(donor).alias("text")
    )
    overlay = base.unionByName(clones).localCheckpoint()

    # force with an AGGREGATE over the counts, not .count(): the final
    # left join's child is an aggregate keyed on doc_id, so Catalyst
    # knows it is cardinality-preserving and ELIMINATES the whole pair
    # pipeline under a bare count() — .count() timings here measure
    # nothing (r18 lesson; cost one misleading measurement pass).
    t0 = time.time()
    s_naive = _naive_prior_counts(overlay).agg(F.sum("n_dup_prior")).first()[0]
    naive_s = time.time() - t0
    t0 = time.time()
    s_coll = (
        exact_collapse_prior_dup_counts(overlay)
        .agg(F.sum("n_dup_prior"))
        .first()[0]
    )
    coll_s = time.time() - t0
    assert s_naive == s_coll, (s_naive, s_coll)
    print(json.dumps({
        "m_clones": m,
        "verified_pair_count": int(s_naive),
        "naive_direct_s": round(naive_s, 2),
        "exact_collapse_s": round(coll_s, 2),
    }))

    # hot-TEMPLATE overlay (r18 follow-up audit): m DISTINCT texts sharing
    # 5 template shingles (pairwise J=5/13, below threshold — zero true
    # pairs). The raw rep-level self-join paid C(m,2) here too (17 s ->
    # 343 s from m=2000 to 8000); the prefix+positional candidate stage
    # (lossless, All-Pairs/PPJoin) prunes in-join: 12.0 s at m=8000.
    for mh in (2000, 8000):
        hot = spark.range(mh).select(
            (F.col("id") + 200_000).alias("doc_id"),
            F.concat(
                F.lit("click here now to claim offer number "),
                F.col("id").cast("string"), F.lit(" today"),
            ).alias("text"),
        )
        hov = base.unionByName(hot).localCheckpoint()
        t0 = time.time()
        sh = (
            exact_collapse_prior_dup_counts(hov)
            .agg(F.sum("n_dup_prior")).first()[0]
        )
        print(json.dumps({
            "hot_template_m": mh, "sum_prior": int(sh),
            "exact_collapse_s": round(time.time() - t0, 2),
        }), flush=True)

    # streaming probe end-to-end, overlay vs control
    for tag, frame in (("control", base), ("overlay", overlay)):
        d = f"/tmp/megacluster_{tag}"
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        frame.write.parquet(os.path.join(d, "documents.parquet"))
        t0 = time.time()
        sw._lsh_probe_dedup(spark, d, n_batches=3).count()
        print(json.dumps({
            "streaming_probe": tag, "wall_s": round(time.time() - t0, 2)
        }))
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
