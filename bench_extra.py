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
        write_plan(brute_topk(emb, ann_queries, k=10), f"q15_brute_{tag}.txt")
        from eo_tools_spark.operators.similarity import ivf_topk_pruned

        ivf_path = f"/tmp/eo_bench_ivf_n{n_vecs}_c64pk"
        if os.path.exists(os.path.join(ivf_path, "_ivf_centroids.json")):
            write_plan(
                ivf_topk_pruned(spark, ivf_path, ann_queries, k=10, nprobe=4),
                f"q15_ivf_pruned_{tag}.txt",
            )
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

    if write_plans:
        # the round-0 edge-collect subtree: "before" = the canonical
        # distinct the loop state needs (still the big-graph path),
        # "after" = the raw lo<hi projection the persisted-input
        # round-0 finish now collects (no exchange at all)
        canon_raw = pairs.select(
            F.least("id_a", "id_b").alias("lo"),
            F.greatest("id_a", "id_b").alias("hi"),
        ).where(F.col("lo") != F.col("hi"))
        write_plan(canon_raw.distinct(), "q13_cc_edges_before.txt")
        write_plan(canon_raw, "q13_cc_edges_after.txt")

    def q13():
        comp = connected_components(pairs, algorithm="star")
        return comp.agg(F.countDistinct("cluster_id")).collect()[0][0]

    out["q13_cc"], out["q13_reps"] = timed("bench_extra: q13 cc", q13, spark)
    pairs.unpersist()
    spark.stop()
    return out


def text_section(write_plans: bool, tag: str) -> dict:
    """q8/q11/q14/q18 stage isolation — same corpora as bench.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from eo_tools_spark.operators.dedup import (
        decontaminate,
        lsh_pairs,
        minhash_signatures,
        verify_jaccard,
        winnow_candidates,
        winnow_fingerprints_fast,
    )
    from eo_tools_spark.session import get_spark, read_binary_parquet

    spark = get_spark(
        "bench_extra-text", cores=CPUS, shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"section": "text", "tag": tag}

    # q8 corpus: demo-slice captions
    images = read_binary_parquet(spark, "/tmp/eo_bench_images_p_n60000")
    docs = images.where(F.col("image_id") < f"img-{60000:012d}").select(
        F.col("image_id").alias("doc_id"), F.col("caption").alias("text")
    )

    def q8_sig_only():
        return minhash_signatures(docs, num_hashes=64, shingle=2).count()

    out["q8_sig_only"], out["q8_sig_reps"] = timed(
        "bench_extra: q8 sig", q8_sig_only, spark)

    def q8_full():
        sig = minhash_signatures(docs, num_hashes=64, shingle=2).persist()
        try:
            pairs = lsh_pairs(sig, bands=16)
            return verify_jaccard(pairs, docs, threshold=0.8).count()
        finally:
            sig.unpersist()

    if write_plans:
        sig_p = minhash_signatures(docs, num_hashes=64, shingle=2)
        write_plan(
            verify_jaccard(lsh_pairs(sig_p, bands=16), docs, threshold=0.8),
            f"q8_minhash_verify_{tag}.txt",
        )

    def q8_pairs_only():
        sig = minhash_signatures(docs, num_hashes=64, shingle=2).persist()
        try:
            return lsh_pairs(sig, bands=16).count()
        finally:
            sig.unpersist()

    out["q8_pairs_only"], out["q8_pairs_reps"] = timed(
        "bench_extra: q8 pairs", q8_pairs_only, spark)
    out["q8_full"], out["q8_full_reps"] = timed(
        "bench_extra: q8 full", q8_full, spark)

    # q11/q14/q18 corpora (identical generators to bench.py)
    _ld_schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    _vocab = np.array([f"tok{v:06d}" for v in range(100000)])

    def _ld_gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng(int(i))
                words = _vocab[rng.integers(0, len(_vocab), 400)]
                rows.append((int(i), " ".join(words)))
            yield pd.DataFrame(rows, columns=["doc_id", "text"])

    longdocs = spark.range(24000).mapInPandas(_ld_gen, schema=_ld_schema).persist()
    longdocs.count()
    longdocs.createOrReplaceTempView("_winnow_docs")
    windocs = spark.sql(
        "SELECT doc_id, text FROM _winnow_docs UNION ALL "
        "SELECT doc_id + 1000000, regexp_replace(text, '^([^ ]+ ){3}', '') "
        "FROM _winnow_docs WHERE doc_id % 8 = 0"
    ).persist()
    windocs.count()

    out["q11_sig"], out["q11_reps"] = timed(
        "bench_extra: q11 sig",
        lambda: minhash_signatures(
            longdocs, num_hashes=64, shingle=2, token_hash="fast"
        ).count(),
        spark, repeats=3, max_repeats=6)

    out["q14_fp_only"], out["q14_fp_reps"] = timed(
        "bench_extra: q14 fingerprints",
        lambda: winnow_fingerprints_fast(windocs, k=4, w=5).count(), spark)

    def q14():
        cand = winnow_candidates(windocs, k=4, w=5, min_shared=1, max_bucket=4096)
        try:
            return cand.count()
        finally:
            if cand._eo_persisted is not None:
                cand._eo_persisted.unpersist()

    if write_plans:
        c14 = winnow_candidates(windocs, k=4, w=5, min_shared=1, max_bucket=4096)
        write_plan(c14, f"q14_winnow_pairs_{tag}.txt")
        if c14._eo_persisted is not None:
            c14._eo_persisted.unpersist()

    out["q14_full"], out["q14_full_reps"] = timed(
        "bench_extra: q14 full", q14, spark)

    def q18():
        bench = spark.sql(
            "SELECT doc_id AS bench_id, "
            "regexp_replace(text, '^([^ ]+ ){2}', '') AS text "
            "FROM _winnow_docs WHERE doc_id % 101 = 0"
        )
        return decontaminate(
            windocs, bench, k=4, w=5, min_shared=1, token_hash="fast"
        ).count()

    out["q18_full"], out["q18_reps"] = timed("bench_extra: q18", q18, spark)
    longdocs.unpersist()
    windocs.unpersist()
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
    if "text" in sys.argv:
        print(json.dumps(text_section(write_plans, tag)))
