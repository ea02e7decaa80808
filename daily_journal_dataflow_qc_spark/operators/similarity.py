"""Similarity search over embedding columns (training-data operators).

* ``brute_force_knn`` — exact cosine top-k: broadcast the (normalized)
  candidate matrix to every partition and GEMM against the streamed query
  batches via ``mapInPandas``. This is the idiomatic Spark shape for
  "small-enough dimension side": no shuffle, no cross join, Arrow batches in,
  numpy BLAS inside. Candidate set must fit in executor memory; for larger
  candidate sets use ``lsh_bucketed_knn`` (the scale path).

* ``lsh_bucketed_knn`` — approximate: random-hyperplane LSH buckets both
  sides, exact search within each bucket (an equi-join + grouped GEMM), so
  the pair space shrinks from O(N*M) to the bucket-collision mass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KNN_SCHEMA = "vec_id long, nn_id long, cos_sim double, rk int"


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_force_knn(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k via broadcast candidate matrix + batched GEMM."""
    spark = queries.sparkSession
    cand = candidates.select(id_col, vec_col).toPandas()
    c_ids = cand[id_col].to_numpy(dtype=np.int64)
    c_mat = _normalize(np.stack(cand[vec_col].to_numpy()).astype(np.float64))
    bc = spark.sparkContext.broadcast((c_ids, c_mat))

    def score(batches):
        ids, mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            sims = q @ mat.T  # (batch, n_candidates)
            if exclude_self:
                for r, qid in enumerate(q_ids):
                    hit = np.where(ids == qid)[0]
                    if hit.size:
                        sims[r, hit] = -np.inf
            kk = min(k, sims.shape[1])
            # tie-break: score desc, candidate id asc (stable parity ordering)
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = []
            for r in range(sims.shape[0]):
                cols = part[r]
                order = np.lexsort((ids[cols], -sims[r, cols]))
                for rank, j in enumerate(cols[order], start=1):
                    rows.append((q_ids[r], ids[j], round(float(sims[r, j]), 2), rank))
            yield pd.DataFrame(rows, columns=["vec_id", "nn_id", "cos_sim", "rk"])

    return queries.select(id_col, vec_col).mapInPandas(score, KNN_SCHEMA)


def lsh_bucketed_knn(
    embeddings: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate NN: random-hyperplane signature -> per-bucket exact search.

    Scale path: the signature is computed JVM-side-free in one Arrow pass, the
    bucket join is an ordinary shuffle on the signature, so it parallelizes to
    any candidate-set size (pairs only form within buckets).
    """
    spark = embeddings.sparkSession
    first = embeddings.select(vec_col).head()
    dim = len(first[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    bc = spark.sparkContext.broadcast(planes)

    def sign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (m @ bc.value) > 0
            sig = (bits * (1 << np.arange(n_planes))).sum(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col], "embedding": pdf[vec_col], "bucket": sig.astype(np.int64)}
            )

    sig_schema = "vec_id long, embedding array<float>, bucket long"
    with_sig = embeddings.mapInPandas(sign, sig_schema)

    def per_bucket(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["vec_id", "nn_id", "cos_sim", "rk"])
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        m = _normalize(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
        sims = m @ m.T
        np.fill_diagonal(sims, -np.inf)
        best = sims.argmax(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "nn_id": ids[best],
                "cos_sim": np.round(sims[np.arange(len(ids)), best], 2),
                "rk": 1,
            }
        )

    return with_sig.groupBy("bucket").applyInPandas(per_bucket, KNN_SCHEMA)
