"""Similarity search over embedding columns.

- brute_topk: exact top-k cosine for a small broadcast query set.
  Per-partition numpy GEMM + local top-k in mapInPandas, then a single
  tiny global top-k — the shuffle carries only k×partitions candidate
  rows, never the corpus. This is the 100 TB-safe exact path.
- ivf_topk: IVF-style ANN — deterministic k-means-lite centroids
  (numpy, trained on a driver sample), map-side cell assignment, probe
  the nprobe nearest cells only. Trades recall for a ~ncells/nprobe scan
  reduction; recall measured in tests against brute_topk.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def _normalize(V: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(V, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return V / n


def brute_topk(
    emb_df: DataFrame,
    queries: pd.DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query row (columns: query_id,
    embedding). Output: (query_id, vec_id, cosine, rank)."""
    spark = emb_df.sparkSession
    Q = _normalize(np.vstack(queries["embedding"].to_numpy()).astype(np.float64))
    qids = queries["query_id"].to_numpy()
    bc = spark.sparkContext.broadcast((qids, Q))

    schema = StructType(
        [
            StructField("query_id", LongType()),
            emb_df.schema[id_col],
            StructField("cosine", DoubleType()),
        ]
    )

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, Q_ = bc.value
        for pdf in batches:
            V = _normalize(np.vstack(pdf[emb_col].to_numpy()).astype(np.float64))
            sims = V @ Q_.T  # (n, q)
            ids = pdf[id_col].to_numpy()
            kk = min(k, len(ids))
            out_q, out_id, out_s = [], [], []
            for j in range(Q_.shape[0]):
                top = np.argpartition(-sims[:, j], kk - 1)[:kk]
                out_q.append(np.full(kk, qids_[j]))
                out_id.append(ids[top])
                out_s.append(sims[top, j])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    id_col: np.concatenate(out_id),
                    "cosine": np.concatenate(out_s),
                }
            )

    cand = emb_df.select(id_col, emb_col).mapInPandas(local_topk, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def train_centroids(sample: np.ndarray, ncells: int, iters: int = 10, seed: int = 13) -> np.ndarray:
    """Deterministic k-means on normalized vectors (spherical-ish)."""
    rng = np.random.default_rng(seed)
    X = _normalize(sample.astype(np.float64))
    C = X[rng.choice(len(X), size=ncells, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(ncells):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    return C


def ivf_topk(
    emb_df: DataFrame,
    queries: pd.DataFrame,
    k: int = 10,
    ncells: int = 16,
    nprobe: int = 4,
    sample_rows: int = 2048,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: scan only vectors whose IVF cell is among each query's
    nprobe nearest centroids. Same output schema as brute_topk.

    Centroid training sample is DETERMINISTIC: the sample_rows smallest
    xxhash64(id) values — a seeded pseudo-random sample identical across
    sessions, partitionings, and resumed runs (an unordered limit()
    would let scan order pick it). One TakeOrdered job (per-partition
    top-k + driver merge, ≤ sample_rows rows per partition shipped), no
    count() pre-pass."""
    spark = emb_df.sparkSession
    sample_df = (
        emb_df.select(id_col, emb_col)
        .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
        .limit(sample_rows)
    )
    sample = np.vstack([r[1] for r in sample_df.collect()])
    C = train_centroids(sample, ncells)
    Q = _normalize(np.vstack(queries["embedding"].to_numpy()).astype(np.float64))
    qids = queries["query_id"].to_numpy()
    probe = np.argsort(-(Q @ C.T), axis=1, kind="stable")[:, :nprobe]  # (q, nprobe)
    bc = spark.sparkContext.broadcast((qids, Q, C, probe))

    schema = StructType(
        [
            StructField("query_id", LongType()),
            emb_df.schema[id_col],
            StructField("cosine", DoubleType()),
        ]
    )

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, Q_, C_, probe_ = bc.value
        for pdf in batches:
            V = _normalize(np.vstack(pdf[emb_col].to_numpy()).astype(np.float64))
            cells = np.argmax(V @ C_.T, axis=1)
            ids = pdf[id_col].to_numpy()
            out_q, out_id, out_s = [], [], []
            for j in range(Q_.shape[0]):
                m = np.isin(cells, probe_[j])
                if not m.any():
                    continue
                sims = V[m] @ Q_[j]
                kk = min(k, sims.shape[0])
                top = np.argpartition(-sims, kk - 1)[:kk]
                out_q.append(np.full(kk, qids_[j]))
                out_id.append(ids[m][top])
                out_s.append(sims[top])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        id_col: np.concatenate(out_id),
                        "cosine": np.concatenate(out_s),
                    }
                )

    cand = emb_df.select(id_col, emb_col).mapInPandas(local, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
