"""Similarity search over embedding columns (training-data operators).

* ``brute_force_knn`` — exact cosine top-k: broadcast the (normalized)
  candidate matrix to every partition and GEMM against the streamed query
  batches via ``mapInPandas``. This is the idiomatic Spark shape for
  "small-enough dimension side": no shuffle, no cross join, Arrow batches in,
  numpy BLAS inside. The candidate set must fit in executor memory — a hard
  ``max_candidates`` guard enforces that instead of silently OOMing; for
  larger candidate sets use ``lsh_bucketed_knn`` (the scale path).

* ``lsh_bucketed_knn`` — approximate: random-hyperplane LSH buckets both
  sides, exact search within each bucket (an equi-join + grouped GEMM), so
  the pair space shrinks from O(N*M) to the bucket-collision mass.
  Scale hardening: ``n_planes`` defaults to log2(N) (bucket count tracks the
  input so expected bucket size stays ~constant as N grows), and the
  per-bucket GEMM is CHUNKED — peak memory per task is O(chunk * bucket),
  never O(bucket^2), so a hot bucket cannot OOM an executor.

Rounding parity: cosine scores are rounded half-away-from-zero (SQL ROUND
semantics — DuckDB/Spark round()), NOT Python round()/np.round banker's
rounding, so .xx5 midpoints hash-match the oracle. Zero-norm vectors get a
NaN cosine, mirroring DuckDB's list_cosine_similarity.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KNN_SCHEMA = "vec_id long, nn_id long, cos_sim double, rk int"

# driver-side collect guard for the broadcast path (~half a GiB of float64
# at dim 64 — beyond this the broadcast pattern is the wrong tool)
MAX_BROADCAST_CANDIDATES = 2_000_000


def _round_half_away(x: np.ndarray, decimals: int = 2) -> np.ndarray:
    """SQL ROUND (half away from zero); np.round / Python round are
    half-to-even and diverge from the DuckDB oracle on .xx5 midpoints."""
    p = 10.0**decimals
    return np.where(np.isnan(x), x, np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p)


def _normalize(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unit-normalize rows; returns (normalized, zero_norm_mask). Zero-norm
    rows are left as zero vectors (dot = 0) and flagged so callers can emit
    NaN similarities (DuckDB list_cosine_similarity parity)."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    zero = norms[:, 0] == 0
    norms[zero] = 1.0
    return mat / norms, zero


def brute_force_knn(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    max_candidates: int = MAX_BROADCAST_CANDIDATES,
) -> DataFrame:
    """Exact cosine top-k via broadcast candidate matrix + batched GEMM."""
    spark = queries.sparkSession
    n_cand = candidates.count()
    if n_cand > max_candidates:
        raise ValueError(
            f"brute_force_knn: candidate set has {n_cand} rows > "
            f"max_candidates={max_candidates}; the broadcast-GEMM pattern "
            "collects all candidates to the driver. Use lsh_bucketed_knn "
            "(bucketed approximate path) for candidate sets this large."
        )
    cand = candidates.select(id_col, vec_col).toPandas()
    c_ids = cand[id_col].to_numpy(dtype=np.int64)
    c_mat, c_zero = _normalize(np.stack(cand[vec_col].to_numpy()).astype(np.float64))
    bc = spark.sparkContext.broadcast((c_ids, c_mat, c_zero))

    # per-slab GEMM buffer cap: the sims matrix is (slab, n_candidates)
    # float64 — an unchunked 10k-row Arrow batch against 200k candidates
    # would be a 16 GB allocation PER TASK. Slabs keep peak task memory
    # ~64 MB regardless of candidate count.
    _SIMS_TARGET_BYTES = 64 << 20

    def score(batches):
        ids, mat, zero = bc.value
        # self-exclusion lookups: sorted-id searchsorted instead of a full
        # O(n_cand) scan per query row (that scan is 4G comparisons at
        # 20k x 200k)
        sort_idx = np.argsort(ids, kind="stable")
        ids_sorted = ids[sort_idx]
        chunk = max(16, _SIMS_TARGET_BYTES // (8 * max(len(ids), 1)))
        for pdf in batches:
            for lo in range(0, len(pdf), chunk):
                sub = pdf.iloc[lo : lo + chunk]
                if len(sub) == 0:
                    continue
                q_ids = sub[id_col].to_numpy(dtype=np.int64)
                q, q_zero = _normalize(
                    np.stack(sub[vec_col].to_numpy()).astype(np.float64)
                )
                sims = q @ mat.T  # (slab, n_candidates)
                # zero-norm on either side -> NaN cosine (oracle parity).
                # DuckDB orders NaN above every number in DESC sorts, so
                # rank NaN first.
                if zero.any():
                    sims[:, zero] = np.inf
                if q_zero.any():
                    sims[q_zero, :] = np.inf
                if exclude_self:
                    pos_l = np.searchsorted(ids_sorted, q_ids, side="left")
                    pos_r = np.searchsorted(ids_sorted, q_ids, side="right")
                    hits = pos_r - pos_l
                    one = np.flatnonzero(hits == 1)
                    sims[one, sort_idx[pos_l[one]]] = -np.inf
                    for r in np.flatnonzero(hits > 1):  # duplicate cand ids
                        sims[r, sort_idx[pos_l[r] : pos_r[r]]] = -np.inf
                kk = min(k, sims.shape[1])
                n_q, n_c = sims.shape
                # tie-break: score desc, candidate id asc. argpartition alone
                # selects an ARBITRARY subset among candidates tied at the k-th
                # score boundary (worst case: a zero-norm query makes the whole
                # row tie at +inf) — the cut must widen across the boundary tie
                # before the deterministic lexsort.
                #
                # Kernel shape is MEASURED (4096 queries x 200k candidates,
                # pinned cores, see BENCH/BASELINE.md): a per-row loop over a
                # cache-resident 1.6MB row beats every batched argpartition
                # variant, which materialize O(block x n_cand) int64 index
                # arrays and go DRAM-bound (full batch 128s, 64-row blocks
                # 11.5s, 256-row blocks 17.6s vs ~9s per-row). The per-row
                # kernel below improves on the naive loop ~20% by (a)
                # partitioning ASCENDING at n-k-1 — no negated-row copy — and
                # (b) detecting a boundary tie from the (k+1)-th element alone,
                # so the full row >= thresh widening scan runs ONLY for rows
                # that actually tie across the cut.
                nn_idx = np.empty((n_q, kk), dtype=np.int64)
                for r in range(n_q):
                    row = sims[r]
                    if kk < n_c:
                        part = np.argpartition(row, n_c - kk - 1)
                        top = part[n_c - kk :]
                        thresh = row[top].min()
                        if row[part[n_c - kk - 1]] >= thresh:
                            cand_i = np.where(row >= thresh)[0]
                        else:
                            cand_i = top
                    else:
                        cand_i = np.arange(n_c)
                    ord_r = np.lexsort((ids[cand_i], -row[cand_i]))[:kk]
                    nn_idx[r] = cand_i[ord_r]
                # columnar output assembly (no per-row Python tuple loop)
                sel = sims[np.arange(n_q)[:, None], nn_idx]
                out_s = _round_half_away(np.where(np.isposinf(sel), np.nan, sel))
                yield pd.DataFrame(
                    {
                        "vec_id": np.repeat(q_ids, kk),
                        "nn_id": ids[nn_idx].ravel(),
                        "cos_sim": out_s.ravel(),
                        "rk": np.tile(np.arange(1, kk + 1, dtype=np.int32), n_q),
                    }
                )

    return queries.select(id_col, vec_col).mapInPandas(score, KNN_SCHEMA)


def lsh_bucketed_knn(
    embeddings: DataFrame,
    n_planes: int | None = None,
    n_tables: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_rows: int = 1024,
    n_rows_hint: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Approximate NN: random-hyperplane signatures -> per-bucket exact
    search, optionally across ``n_tables`` independent hash tables (the
    standard multi-table LSH construction: per-table miss probability
    compounds, so recall = 1 - (1 - p^k)^L even for near-orthogonal data).

    Scale path: signatures are one Arrow pass; the bucket join is an
    ordinary shuffle on (table, signature), so it parallelizes to any input
    size (pairs only form within buckets, and the shuffled volume is
    n_tables * N rows of (id, vector)).

    * ``n_planes=None`` scales bucket count with N: ``max(4, ceil(log2(N)))``
      planes => ~N buckets per table, expected bucket size O(1) as the
      table grows — a fixed plane count would make buckets (and the
      per-bucket pair space) grow linearly with N.
    * the per-bucket GEMM runs in ``chunk_rows`` slabs: peak task memory is
      O(chunk_rows * |bucket|) instead of O(|bucket|^2).
    * cross-table reduce keeps the best-scoring candidate per query
      (tie-break: nn_id asc), so output is one row per vec_id that
      collided with anything.
    """
    spark = embeddings.sparkSession
    if n_planes is None:
        n = n_rows_hint if n_rows_hint is not None else embeddings.count()
        n_planes = max(4, int(math.ceil(math.log2(max(n, 2)))))
    if dim is None:
        # dimension probe: 1 row to the driver. Callers that know the
        # contract dimension should pass ``dim`` — the probe disappears and
        # EVERY batch is validated against it inside the Arrow pass instead.
        first = embeddings.select(vec_col).head()
        dim = len(first[0])
    expected_dim = dim
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes * n_tables))
    bc = spark.sparkContext.broadcast(planes)
    weights = 1 << np.arange(n_planes)

    def sign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if m.shape[1] != expected_dim:
                raise ValueError(
                    f"{vec_col} dimension {m.shape[1]} != declared dim "
                    f"{expected_dim}; the seeded hyperplanes (and any "
                    "precomputed oracle literals) are shape-specific"
                )
            bits = (m @ bc.value) > 0  # (batch, n_planes * n_tables)
            frames = []
            for t in range(n_tables):
                sig = (bits[:, t * n_planes : (t + 1) * n_planes] * weights).sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf[id_col],
                            "embedding": pdf[vec_col],
                            "table_idx": np.int32(t),
                            "bucket": sig.astype(np.int64),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    sig_schema = "vec_id long, embedding array<float>, table_idx int, bucket long"
    with_sig = embeddings.mapInPandas(sign, sig_schema)

    def per_bucket(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["vec_id", "nn_id", "cos_sim", "rk"])
        # deterministic tie-break: rows sorted by vec_id, and argmax keeps
        # the FIRST maximum — so exactly-tied scores (duplicate vectors,
        # zero-norm inf sentinels) resolve to the smallest nn_id, matching
        # the DuckDB oracle's (cos DESC, nn_id ASC) ordering
        pdf = pdf.sort_values("vec_id", ignore_index=True)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        m, zero = _normalize(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
        n = len(ids)
        best_j = np.empty(n, dtype=np.int64)
        best_s = np.empty(n, dtype=np.float64)
        for lo in range(0, n, chunk_rows):
            hi = min(lo + chunk_rows, n)
            sims = m[lo:hi] @ m.T  # (chunk, n) — never (n, n)
            if zero.any():
                sims[:, zero] = np.inf
            sims[zero[lo:hi], :] = np.inf
            sims[np.arange(hi - lo), np.arange(lo, hi)] = -np.inf
            j = sims.argmax(axis=1)
            best_j[lo:hi] = j
            best_s[lo:hi] = sims[np.arange(hi - lo), j]
        out_s = np.where(np.isposinf(best_s), np.nan, best_s)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "nn_id": ids[best_j],
                "cos_sim": _round_half_away(out_s),
                "rk": 1,
            }
        )

    per_table = with_sig.groupBy("table_idx", "bucket").applyInPandas(
        per_bucket, KNN_SCHEMA
    )
    if n_tables == 1:
        return per_table
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.desc_nulls_last("cos_sim"), F.asc("nn_id")
    )
    return (
        per_table.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
