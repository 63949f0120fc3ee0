"""Generate the pinned IVF recall@10-vs-nprobe curve (VERDICT r3 item 4).

ann_topk_ivf's exact-mode driver query gates the IVF code path, but a
user tuning nprobe<ncells had no committed recall evidence. This script
measures recall@10 of ivf_topk against a PURE-NUMPY exact ground truth
(independent of the engine) on the driver-provided sf0.01 embeddings
table, for nprobe in {1, 2, 4, 8, 16} at ncells=16, and pins the curve
to dist/oracle/ivf_recall_sf001.json. tests/test_dedup_similarity.py::
TestTopK::test_ivf_recall_curve_pinned re-runs the measurement and
fails if any point degrades — a refactor that silently hurts recall is
caught, and the committed JSON is the user-facing tuning evidence.

Everything is deterministic (seeded centroid training over a
hash-ordered sample, stable argsorts), so the pin is exact equality,
not a loose bound.

Run:  python scripts/make_ivf_recall.py   (writes dist/oracle/ivf_recall_sf001.json)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EMB_PARQUET = "/root/testdata/sf0.01/embeddings.parquet"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dist", "oracle", "ivf_recall_sf001.json",
)
K = 10
NCELLS = 16
NPROBES = [1, 2, 4, 8, 16]
N_QUERIES = 32


def exact_truth(V: np.ndarray, qidx: np.ndarray, k: int) -> dict[int, list[int]]:
    """Pure-numpy exact top-k by cosine, tie-broken by vec_id asc —
    the same order brute_topk/ivf_topk's rank window uses."""
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
    truth = {}
    for q in qidx:
        sims = Vn @ Vn[q]
        # stable argsort on (-sim, vec_id): vec_id asc breaks ties
        order = np.lexsort((np.arange(len(sims)), -sims))
        truth[int(q)] = [int(i) for i in order[:k]]
    return truth


def measure(spark) -> dict:
    from eo_tools_spark.operators.similarity import ivf_topk

    pdf = pd.read_parquet(EMB_PARQUET)
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    V = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    assert (pdf["vec_id"].to_numpy() == np.arange(len(pdf))).all(), (
        "recall fixture assumes vec_id == row index"
    )
    qidx = np.arange(N_QUERIES)
    truth = exact_truth(V, qidx, K)
    queries = pd.DataFrame(
        {"query_id": qidx, "embedding": [V[i].tolist() for i in qidx]}
    )
    df = spark.read.parquet(EMB_PARQUET)

    curve = {}
    for nprobe in NPROBES:
        got = ivf_topk(
            df, queries, k=K, ncells=NCELLS, nprobe=nprobe
        ).toPandas()
        recalls = []
        for q in qidx:
            a = set(got[got.query_id == q]["vec_id"])
            recalls.append(len(a & set(truth[int(q)])) / K)
        curve[str(nprobe)] = round(float(np.mean(recalls)), 4)
    return {
        "table": EMB_PARQUET,
        "n_vectors": int(len(pdf)),
        "k": K,
        "ncells": NCELLS,
        "n_queries": N_QUERIES,
        "recall_at_10_by_nprobe": curve,
    }


def main() -> None:
    from eo_tools_spark.session import get_spark

    spark = get_spark("ivf-recall", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    result = measure(spark)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps(result, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
