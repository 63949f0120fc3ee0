#!/usr/bin/env python
"""Round-7 optimization probes (bench.py is FROZEN for measurement —
extra isolation benchmarks live here, per the optimization protocol).

Each section isolates one operator with the same inputs/action shape as
the corresponding bench.py query, labels its jobs, and prints one JSON
line per section. Timings are best-of-N like bench.py's `timed`.

Usage:
    python bench_extra.py pq          # q15 PQ legs (ADC + rerank)
    python bench_extra.py pq --plans  # also write .explain("formatted")
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
HERE = os.path.dirname(os.path.abspath(__file__))


def timed(label, fn, spark, repeats=2, max_repeats=4):
    best, reps = None, []
    for i in range(max_repeats):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        reps.append(round(dt, 3))
        best = dt if best is None else min(best, dt)
        if i >= repeats - 1 and sum(1 for r in reps if r <= best * 1.3) >= 2:
            break
    spark.sparkContext.setJobDescription(None)
    return round(best, 3), reps


def write_plan(df, name):
    os.makedirs(os.path.join(HERE, "plans", "r07"), exist_ok=True)
    with open(os.path.join(HERE, "plans", "r07", name), "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))


def pq_section(write_plans: bool, tag: str) -> dict:
    import numpy as np
    import pandas as pd

    from eo_tools_spark.operators.similarity import (
        _train_from_df,
        brute_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )
    from eo_tools_spark.session import get_spark

    spark = get_spark(
        "bench_extra-pq", cores=CPUS, shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_vecs = int(os.environ.get("SPARK_GRAFT_ANN_VECS", "4000000"))
    emb_path = f"/tmp/eo_bench_emb_n{n_vecs}"
    pq_path = f"/tmp/eo_bench_pqcodes_n{n_vecs}_m16k256res"
    if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        raise SystemExit("run bench.py once first (corpus cache missing)")
    emb = spark.read.parquet(emb_path)

    def _ann_center(c):
        return np.random.default_rng(7_000_000 + int(c)).normal(size=64)

    q_rows = [
        (int(i),
         (_ann_center(i % 4)
          + 0.35 * np.random.default_rng(9_000_000 + int(i))
          .normal(size=64)).astype(np.float32).tolist())
        for i in range(16)
    ]
    ann_queries = pd.DataFrame(q_rows, columns=["query_id", "embedding"])

    coarse = _train_from_df(emb, 256, 8192, "vec_id", "embedding")
    books = pq_train(emb, m=16, k=256, sample_rows=8192, centroids=coarse)
    if not os.path.exists(os.path.join(pq_path, "_SUCCESS")):
        pq_encode(emb, books, centroids=coarse).write.mode(
            "overwrite"
        ).parquet(pq_path)
        open(os.path.join(pq_path, "_SUCCESS"), "a").close()
    codes = spark.read.parquet(pq_path)

    out = {"section": "pq", "tag": tag, "n_vectors": n_vecs,
           "codes_scan_partitions": codes.rdd.getNumPartitions()}
    adc_df = pq_topk(codes, ann_queries, books, k=10, centroids=coarse)
    rer_df = pq_topk(
        codes, ann_queries, books, k=10, rerank=2000, emb_df=emb,
        centroids=coarse,
    )
    if write_plans:
        write_plan(adc_df, f"q15_pq_adc_{tag}.txt")
        write_plan(rer_df, f"q15_pq_rerank_{tag}.txt")
    out["pq_adc"], out["pq_adc_reps"] = timed(
        "bench_extra: pq adc", lambda: adc_df.count(), spark)
    out["pq_rerank"], out["pq_rerank_reps"] = timed(
        "bench_extra: pq rerank", lambda: rer_df.count(), spark)
    out["brute"], out["brute_reps"] = timed(
        "bench_extra: brute",
        lambda: brute_topk(emb, ann_queries, k=10).count(), spark)

    # recall sanity vs exact (untimed)
    exact = brute_topk(emb, ann_queries, k=10).toPandas()
    rer = rer_df.toPandas()
    hits = 0
    for qid, grp in exact.groupby("query_id"):
        hits += len(set(grp["vec_id"]) & set(rer[rer.query_id == qid]["vec_id"]))
    out["pq_rerank_recall_at_10"] = round(hits / max(len(exact), 1), 4)
    spark.stop()
    return out


def pairs_section(write_plans: bool, tag: str) -> dict:
    """q9 phash near-dup + q13 CC isolation (same inputs as bench.py:
    the 60k demo slice of the cached image table)."""
    from pyspark.sql import functions as F

    from eo_tools_spark.operators.cluster import connected_components
    from eo_tools_spark.operators.image_pipeline import phash_neardup
    from eo_tools_spark.session import get_spark, read_binary_parquet

    spark = get_spark(
        "bench_extra-pairs", cores=CPUS, shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    images = read_binary_parquet(spark, "/tmp/eo_bench_images_p_n60000")
    demo_slice = images.where(F.col("image_id") < f"img-{60000:012d}")
    out = {"section": "pairs", "tag": tag}

    q9_df = phash_neardup(demo_slice, max_hamming=2)
    if write_plans:
        write_plan(q9_df, f"q9_phash_neardup_{tag}.txt")
    out["q9_phash"], out["q9_reps"] = timed(
        "bench_extra: q9 phash",
        lambda: phash_neardup(demo_slice, max_hamming=2).count(), spark)

    pairs = phash_neardup(demo_slice, max_hamming=2).persist()
    out["n_pairs"] = pairs.count()

    def q13():
        comp = connected_components(pairs, algorithm="star")
        return comp.agg(F.countDistinct("cluster_id")).collect()[0][0]

    out["q13_cc"], out["q13_reps"] = timed("bench_extra: q13 cc", q13, spark)
    pairs.unpersist()
    spark.stop()
    return out


if __name__ == "__main__":
    write_plans = "--plans" in sys.argv
    tag = "after"
    for a in sys.argv[1:]:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
    if "pq" in sys.argv:
        print(json.dumps(pq_section(write_plans, tag)))
    if "pairs" in sys.argv:
        print(json.dumps(pairs_section(write_plans, tag)))
