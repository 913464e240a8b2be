"""VERDICT r16 item 5: does the learned OPQ rotation's recall gain
survive RESIDUAL encoding inside the full IVF+PQ pipeline?

r16 measured the rotations against the FLAT PQ-ADC pipeline
(_pq_adc_report). Production pairs OPQ with IVFPQ (FAISS's `OPQ64,
IVF...,PQ...` index-factory string rotates BEFORE the coarse
quantizer), but residual encoding already removes the coarse
centroid — a large share of the variance the rotation exists to
rebalance — so the flat-pipeline gain cannot be assumed to transfer.

Usage: python tools/measure_opq_ivfpq.py
Prints recall@3 vs exact dot top-3 for plain / structured-rotated /
learned-rotated variants of BOTH pipelines (flat PQ-ADC and residual
IVF+PQ) on three corpora: axis-concentrated, correlated decaying-
spectrum, and the sf0.01 fixture embeddings.
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apache_hive_1_2_2_src_spark.extensions.similarity import (
    _dot,
    _pq_adc_report,
    apply_rotation,
    ivfpq_residual_topk,
    opq_learned_rotation,
    opq_rotate,
)
from apache_hive_1_2_2_src_spark.session import get_session
from apache_hive_1_2_2_src_spark.tables import load_table

D, N, Q_MIN = 64, 500, 490


def concentrated_corpus(spark, n=N):
    """All signal in subspace 0 (the r16 fixture): 32 cluster centers in
    the first 16 dims, tiny isotropic noise elsewhere."""
    rng = random.Random(42)
    centers = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(32)]
    rows = []
    for i in range(n):
        c = centers[rng.randrange(32)]
        sig = [v + rng.gauss(0, 0.08) for v in c]
        noise = [rng.gauss(0, 0.01) for _ in range(48)]
        rows.append((i, [float(x) for x in sig + noise]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def spectrum_corpus(spark, n=N, k_latent=8):
    """Correlated decaying spectrum (the r16 learned-rotation fixture
    shape): 8 latent factors with geometrically decaying scales, mixed
    into 64 dims by a fixed random loading matrix — covariance has
    off-diagonal mass and is NOT axis-aligned."""
    rng = random.Random(7)
    load = [
        [rng.gauss(0, 1) for _ in range(D)] for _ in range(k_latent)
    ]
    centers = [
        [rng.uniform(-1, 1) for _ in range(k_latent)] for _ in range(32)
    ]
    rows = []
    for i in range(n):
        c = centers[rng.randrange(32)]
        z = [c[j] * (0.7 ** j) + rng.gauss(0, 0.05 * 0.7 ** j)
             for j in range(k_latent)]
        x = [
            sum(z[j] * load[j][d] for j in range(k_latent))
            + rng.gauss(0, 0.02)
            for d in range(D)
        ]
        rows.append((i, [float(v) for v in x]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def exact_top3(e):
    q = e.filter(F.col("vec_id") >= Q_MIN).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = (
        q.crossJoin(e.select(F.col("vec_id").alias("cand_id"), "embedding"))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id",
                _dot(F.col("qe"), F.col("embedding")).alias("d"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("d").desc(), "cand_id")),
        )
        .filter(F.col("rk") <= 3)
    )
    return {(r["query_id"], r["cand_id"]) for r in pairs.collect()}


def recall(df, truth):
    got = {(r["query_id"], r["cand_id"]) for r in df.collect()}
    return len(got & truth) / len(truth)


def main():
    spark = get_session("opq-ivfpq-measure")
    corpora = {
        "concentrated": concentrated_corpus(spark),
        "spectrum": spectrum_corpus(spark),
        "fixture_sf0.01": load_table(
            spark, "/root/testdata/sf0.01", "embeddings"
        ).select("vec_id", "embedding"),
    }
    for name, e0 in corpora.items():
        e = e0.localCheckpoint()
        truth = exact_top3(e)
        rot = opq_learned_rotation(e)
        variants = {
            "plain": e,
            "structured": e.select(
                "vec_id", opq_rotate(F.col("embedding")).alias("embedding")
            ).localCheckpoint(),
            "learned": apply_rotation(e, rot).localCheckpoint(),
        }
        for vname, ve in variants.items():
            t0 = time.time()
            flat = recall(_pq_adc_report(ve), truth)
            t1 = time.time()
            ivf = recall(ivfpq_residual_topk(spark, ve), truth)
            t2 = time.time()
            print(
                f"{name:>16} {vname:>10}  flatPQ {flat:.3f} ({t1-t0:4.1f}s)"
                f"  residIVFPQ {ivf:.3f} ({t2-t1:4.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
