"""Measure the partitioned-LSH state-store probe pruning at a
bytes-dominated corpus/batch ratio (VERDICT r11 'what's missing' #3 /
COVERAGE round-12 item 4).

The streaming LSH dedup (streaming/windows.py _lsh_probe_dedup) keeps two
state stores, both hash-partitioned (signature store by xxhash64(sig) mod
k under sb=, shingle store by doc_id mod k under db=), and each
micro-batch probe reads only the partitions it can touch. sf0.1's 5,000
docs cannot show a bytes-dominated win, so this synthesizes a WIDE store
directly — same schema, same partition layout, same read expressions as
the streaming code — and probes it with a ~0.1% batch:

  corpus: N_DOCS docs x SH_PER_DOC shingles  (the corpus-sized store)
          N_DOCS x BANDS band signatures     (the small store)
  batch:  BATCH_DOCS new docs, DUP_DOCS of them near-dups of existing
          docs (so the verify stage has real partners to prune to)

Reported per store: total bytes on disk, bytes opened by the PRUNED read
(sum of inputFiles sizes — partition pruning is plan-level, so unlisted
files are genuinely never opened), bytes a k=1 layout must open (= all),
and wall time of the full probe (candidates + exact-Jaccard verify)
pruned vs forced-full-scan.

Usage: python tools/measure_lsh_prune.py [n_docs] [store_buckets]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.session import get_session
from apache_hive_1_2_2_src_spark.tmputil import scratch_dir

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
SH_PER_DOC = 30
MINHASH_K, BANDS, ROWS = 16, 4, 4
BATCH_DOCS = max(N_DOCS // 1000, 100)  # ~0.1%
DUP_DOCS = max(BATCH_DOCS // 10, 10)


def shingle_rows(spark, ids, alias_src=None):
    """(doc_id, sh) rows: SH_PER_DOC deterministic shingle tokens per doc.
    alias_src maps a new doc_id -> the existing doc whose shingle set it
    copies (exact dup => Jaccard 1.0 partners for the verify stage)."""
    d = ids.withColumn(
        "src",
        F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in (alias_src or {}).items() for x in kv]
                ),
                F.col("doc_id"),
            )
            if alias_src
            else F.lit(None).cast("long"),
            F.col("doc_id"),
        ),
    )
    return d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(SH_PER_DOC)),
                lambda i: F.concat_ws(
                    "_", F.lit("sh"), F.conv(F.xxhash64("src", i), 10, 16)
                ),
            )
        ).alias("sh"),
    )


def band_sigs(sh):
    minh = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
            for i in range(MINHASH_K)
        ]
    )
    arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ":", *[F.col(f"h{b * ROWS + r}") for r in range(ROWS)]
                ).alias("sig"),
            )
            for b in range(BANDS)
        ]
    )
    return minh.select("doc_id", F.explode(arr).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def du(spark, path):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(p).getLength()


def part_bytes(spark, store, col, vals=None):
    """Bytes under the selected partition dirs (all when vals is None).
    The pruned read's scan bytes: partition pruning is PLAN-level
    (PartitionFilters — pinned in tests/test_streaming_lsh_dedup.py), so
    files outside the selected dirs are never listed into the scan."""
    root = os.path.join(store, "epoch=0")
    if vals is None:
        vals = [
            d.split("=", 1)[1]
            for d in os.listdir(root)
            if d.startswith(f"{col}=")
        ]
    total = 0
    for v in vals:
        d = os.path.join(root, f"{col}={v}")
        total += sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if not f.startswith(".")
        )
    return total


def main():
    spark = get_session()
    base = scratch_dir("lshmeasure")
    sig_dir, sh_dir = os.path.join(base, "sig"), os.path.join(base, "sh")

    # ---- build the wide store (one epoch, exactly the streaming layout)
    t0 = time.time()
    ids = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    sh = shingle_rows(spark, ids)
    sh.withColumn("db", F.pmod(F.col("doc_id"), F.lit(K))).repartition(
        K, "db"
    ).write.partitionBy("db").parquet(os.path.join(sh_dir, "epoch=0"))
    sigs = band_sigs(shingle_rows(spark, ids))
    sigs.withColumn("sb", F.pmod(F.xxhash64(F.col("sig")), F.lit(K))).repartition(
        K, "sb"
    ).write.partitionBy("sb").parquet(os.path.join(sig_dir, "epoch=0"))
    build_s = time.time() - t0
    sig_bytes, sh_bytes = du(spark, sig_dir), du(spark, sh_dir)

    # ---- the incoming batch: BATCH_DOCS new docs, DUP_DOCS exact dups
    new_ids = spark.range(N_DOCS, N_DOCS + BATCH_DOCS).select(
        F.col("id").alias("doc_id")
    )
    alias = {N_DOCS + i: (i * 9973) % N_DOCS for i in range(DUP_DOCS)}
    sh_b = shingle_rows(spark, new_ids, alias_src=alias).persist()
    sh_b.count()
    buckets_b = (
        band_sigs(sh_b)
        .withColumn("sb", F.pmod(F.xxhash64(F.col("sig")), F.lit(K)))
        .persist()
    )
    buckets_b.count()

    def probe(pruned: bool):
        t = time.time()
        needed_sb = [r.sb for r in buckets_b.select("sb").distinct().collect()]
        prior_sig = spark.read.parquet(sig_dir)
        if pruned:
            prior_sig = prior_sig.where(F.col("sb").isin(needed_sb))
        sig_read = part_bytes(spark, sig_dir, "sb", needed_sb if pruned else None)
        cand = (
            buckets_b.alias("nb")
            .join(
                prior_sig.select("doc_id", "band", "sig").alias("ob"),
                (F.col("nb.band") == F.col("ob.band"))
                & (F.col("nb.sig") == F.col("ob.sig"))
                & (F.col("ob.doc_id") < F.col("nb.doc_id")),
            )
            .select(
                F.col("nb.doc_id").alias("new_id"),
                F.col("ob.doc_id").alias("old_id"),
            )
            .distinct()
            .persist()
        )
        n_cand = cand.count()
        partner_dbs = [
            r.db
            for r in cand.select(F.pmod(F.col("old_id"), F.lit(K)).alias("db"))
            .distinct()
            .collect()
        ]
        prior_sh = spark.read.parquet(sh_dir)
        if pruned:
            prior_sh = prior_sh.where(F.col("db").isin(partner_dbs))
        sh_read = part_bytes(spark, sh_dir, "db", partner_dbs if pruned else None)
        all_sh = prior_sh.select("doc_id", "sh").unionByName(sh_b)
        n_sh = all_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        common = (
            cand.join(all_sh.alias("sa"), F.col("new_id") == F.col("sa.doc_id"))
            .join(
                all_sh.alias("sx"),
                (F.col("old_id") == F.col("sx.doc_id"))
                & (F.col("sa.sh") == F.col("sx.sh")),
            )
            .groupBy("new_id", "old_id")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        jac = F.col("n_common") / (
            F.col("na.n_sh") + F.col("nb.n_sh") - F.col("n_common")
        )
        n_dup = (
            common.join(n_sh.alias("na"), F.col("new_id") == F.col("na.doc_id"))
            .join(n_sh.alias("nb"), F.col("old_id") == F.col("nb.doc_id"))
            .filter(jac >= 0.7)
            .count()
        )
        wall = time.time() - t
        cand.unpersist()
        return dict(
            pruned=pruned, wall_s=round(wall, 2), n_cand=n_cand, n_dup=n_dup,
            sig_read_mb=round(sig_read / 1e6, 1),
            sh_read_mb=round(sh_read / 1e6, 1),
            n_sig_parts=len(needed_sb), n_sh_parts=len(partner_dbs),
        )

    full = probe(pruned=False)
    pr = probe(pruned=True)
    print(
        f"\ncorpus={N_DOCS} docs  k={K}  batch={BATCH_DOCS} ({DUP_DOCS} dups)"
        f"  build={build_s:.0f}s"
    )
    print(
        f"store bytes: sig={sig_bytes/1e6:.1f} MB  shingle={sh_bytes/1e6:.1f} MB"
    )
    for r in (full, pr):
        print(r)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
