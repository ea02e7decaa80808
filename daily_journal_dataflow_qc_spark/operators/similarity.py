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

* ``ivf_knn`` — approximate: IVF coarse quantizer (driver-trained spherical
  k-means, bounded sample), single-cell candidates + multi-probe queries,
  exact chunked GEMM per cell. ``n_probe=n_cells`` provably equals
  ``brute_force_knn`` — the exactness anchor the driver row hash-checks.

* ``embedding_near_dup`` — the vector-space dedup mode: all pairs with
  cosine >= threshold, IVF cells for candidate generation, exact in-cell
  verification (full probe = the exact threshold join).

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


def _topk_rows(sims: np.ndarray, ids: np.ndarray, kk: int) -> np.ndarray:
    """Deterministic per-row top-``kk`` selection over a (n_q, n_c) score
    matrix: order by score DESC then candidate id ASC. The per-row shape is
    MEASURED faster than batched argpartition variants on wide rows (see
    BENCH/BASELINE.md round-5 kernel A/B): (a) ascending partition at
    ``n_c-kk-1`` avoids a negated-row copy, (b) the full-row widening scan
    runs only when the (k+1)-th order statistic reveals a boundary tie."""
    n_q, n_c = sims.shape
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
    return nn_idx


def brute_force_knn(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    max_candidates: int = MAX_BROADCAST_CANDIDATES,
    n_rows_hint: int | None = None,
) -> DataFrame:
    """Exact cosine top-k via broadcast candidate matrix + batched GEMM.

    ``n_rows_hint``: caller-known candidate row count (same contract as the
    ivf/lsh operators) — skips the guard's ``count()`` action so a composed
    pipeline that already counted the frame (or just built it with a known
    cardinality) doesn't pay one extra full scan per operator. The guard
    still holds: ``toPandas`` below collects exactly the hinted frame, so a
    wrong hint under-states memory only if the caller lied about its own
    data."""
    spark = queries.sparkSession
    n_cand = n_rows_hint if n_rows_hint is not None else candidates.count()
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
                nn_idx = _topk_rows(sims, ids, kk)
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


ASSIGN_SCHEMA = "vec_id long, embedding array<float>, cell int, is_cand boolean"


def _ivf_assign(
    embeddings: DataFrame,
    n_cells: int | None,
    n_probe: int,
    kmeans_iters: int,
    train_sample: int,
    seed: int,
    id_col: str,
    vec_col: str,
    n_rows_hint: int | None,
    dim: int | None,
) -> DataFrame | None:
    """Shared IVF front half (``ivf_knn`` / ``embedding_near_dup``): train a
    spherical k-means coarse quantizer on a hash-deterministic driver sample,
    then one Arrow assignment pass — every vector is a CANDIDATE in its
    single best cell and a QUERY in its ``n_probe`` best cells. Returns the
    assigned frame (ASSIGN_SCHEMA) or None for an empty input."""
    n = n_rows_hint if n_rows_hint is not None else embeddings.count()
    if n == 0:
        return None
    if n_cells is None:
        n_cells = max(2, int(math.ceil(math.sqrt(n))))
    n_cells = max(1, min(n_cells, int(n)))

    # --- deterministic training sample -> driver-side spherical k-means ---
    ratio = max(1, int(n) // train_sample)
    samp = embeddings.select(id_col, vec_col)
    if ratio > 1:
        samp = samp.filter(
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(ratio)) == 0
        )
    sp = samp.toPandas().sort_values(id_col, ignore_index=True)
    if len(sp) == 0:
        return None
    mat = np.stack(sp[vec_col].to_numpy()).astype(np.float64)
    if dim is None:
        dim = mat.shape[1]
    elif mat.shape[1] != dim:
        raise ValueError(f"{vec_col} dimension {mat.shape[1]} != declared dim {dim}")
    train, t_zero = _normalize(mat)
    train = train[~t_zero]
    rng = np.random.default_rng(seed)
    if len(train) == 0:
        # all-zero corpus: arbitrary (seeded) unit centroids; every dot is 0
        # so assignment degenerates to cell 0 deterministically
        cents = _normalize(rng.standard_normal((n_cells, dim)))[0]
    else:
        n_cells = min(n_cells, len(train))
        init = np.sort(rng.choice(len(train), size=n_cells, replace=False))
        cents = train[init].copy()
        for _ in range(kmeans_iters):
            a = np.argmax(train @ cents.T, axis=1)  # first-max: lowest cell
            for c in range(n_cells):
                mem = train[a == c]
                if len(mem):
                    v = mem.mean(axis=0)
                    nv = np.linalg.norm(v)
                    if nv > 0:
                        cents[c] = v / nv  # empty/degenerate cell keeps its centroid
    bc = embeddings.sparkSession.sparkContext.broadcast(cents)
    n_probe_eff = max(1, min(n_probe, n_cells))
    expected_dim = dim

    def assign(batches):
        cmat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m0 = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if m0.shape[1] != expected_dim:
                raise ValueError(
                    f"{vec_col} dimension {m0.shape[1]} != trained dim "
                    f"{expected_dim}; centroids are shape-specific"
                )
            m, _ = _normalize(m0)
            scores = m @ cmat.T  # (batch, n_cells)
            # stable argsort: equal centroid scores resolve to the lowest
            # cell index on every run/partitioning
            order = np.argsort(-scores, axis=1, kind="stable")[:, :n_probe_eff]
            nb = len(pdf)
            idx = np.repeat(np.arange(nb), n_probe_eff)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(dtype=np.int64)[idx],
                    "embedding": pdf[vec_col].iloc[idx].reset_index(drop=True),
                    "cell": order.ravel().astype(np.int32),
                    # probe 0 IS the argmax cell: that one row doubles as the
                    # vector's single candidate-side occurrence
                    "is_cand": np.tile(np.arange(n_probe_eff) == 0, nb),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(assign, ASSIGN_SCHEMA)


def _split_hot_cells(
    assigned: DataFrame, max_cell_rows: int | None
) -> tuple[DataFrame, list[str]]:
    """Automatic skew bound for the IVF family: k-means cells are not
    size-balanced, and a hot cell (one dominant cluster in the corpus) is
    memory-bounded by the chunked GEMM but not TIME-bounded — one straggler
    task serializes the stage. Same salting pattern as ``operators/skew.py``,
    adapted to the query/candidate asymmetry:

    * every cell whose CANDIDATE count exceeds ``max_cell_rows`` is split
      into ``n_sub = ceil(count / max_cell_rows)`` sub-cells (a hash split:
      per-sub-cell size is ``max_cell_rows`` in EXPECTATION with sqrt-n
      concentration — tight at real hot-cell sizes, noisy at toy ones);
    * each candidate lands in ONE sub-cell (hash of its id), keeping
      per-(cell, sub_cell) candidate sets disjoint — the downstream reduces
      (row_number top-k / pair max-dedup) need no change;
    * each QUERY row replicates to ALL sub-cells of its probed cell, so
      every (query, candidate) co-occurrence of the unsplit plan is
      preserved exactly once — full-probe exactness is unchanged.

    Cost model: the per-cell count is a cell-grain aggregate joined back by
    broadcast (no extra driver action); unsplit cells explode to exactly one
    row (n_sub = 1). Split cells pay query replication ``n_sub x |queries|``
    — the shuffle-volume price of bounding max task wall at
    O(|queries| * max_cell_rows). ``max_cell_rows=None`` disables."""
    if max_cell_rows is None:
        return assigned, ["cell"]
    if max_cell_rows < 1:
        raise ValueError("max_cell_rows must be >= 1 (or None to disable)")
    counts = (
        assigned.filter(F.col("is_cand"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("_nc"))
    )
    # left join: a probed-but-nobody's-home cell has no candidate count (and
    # contributes no output) — keep its rows with n_sub = 1 so the split is
    # provably output-identical to the unsplit plan
    n_sub = F.greatest(
        F.lit(1), F.ceil(F.col("_nc") / F.lit(max_cell_rows)).cast("int")
    )
    out = (
        assigned.join(F.broadcast(counts), "cell", "left")
        .withColumn("_n_sub", F.coalesce(n_sub, F.lit(1)))
        .withColumn("sub_cell", F.explode(F.sequence(F.lit(0), F.col("_n_sub") - 1)))
        .withColumn(
            "is_cand",
            F.col("is_cand")
            & (
                F.col("sub_cell")
                == F.pmod(F.xxhash64("vec_id"), F.col("_n_sub")).cast("int")
            ),
        )
        .drop("_nc", "_n_sub")
    )
    return out, ["cell", "sub_cell"]


def ivf_knn(
    embeddings: DataFrame,
    n_cells: int | None = None,
    n_probe: int = 2,
    k: int = 1,
    kmeans_iters: int = 10,
    train_sample: int = 65536,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_rows: int = 1024,
    n_rows_hint: int | None = None,
    dim: int | None = None,
    exclude_self: bool = True,
    max_cell_rows: int | None = 65536,
) -> DataFrame:
    """Approximate self-NN via an IVF (inverted-file) coarse quantizer — the
    centroid-bucketed complement to ``lsh_bucketed_knn`` (random planes).
    Classic IVF construction (Jegou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011 — coarse quantizer stage only;
    public knowledge, no reference-repo counterpart):

    1. TRAIN: spherical k-means on a bounded, hash-deterministic driver
       sample (``train_sample`` rows — stable under any input partitioning,
       unlike ``df.sample``), seeded init, ties to the lowest cell index.
    2. ASSIGN (one Arrow pass, no shuffle): every vector lands in its single
       best cell as a CANDIDATE; every vector additionally probes its
       ``n_probe`` best cells as a QUERY (multi-probe recall lever).
    3. SEARCH: one shuffle keyed by cell; exact chunked GEMM inside each
       cell (peak task memory O(chunk_rows * |cell|), never O(|cell|^2)).
    4. REDUCE: candidates live in exactly ONE cell, so cross-probe rows are
       disjoint — a per-query row_number over (score DESC, nn_id ASC) is the
       global top-k with no dedup step.

    Exactness anchor: with ``n_probe == n_cells`` every query examines every
    candidate, so the output EQUALS ``brute_force_knn`` (same tie and
    zero-norm->NaN semantics; scores stay raw through the reduce and are
    rounded once at the end) — pinned by test. At partial probe, recall
    follows cluster structure (clustered corpora ~1.0; the unit suite gates
    >= 0.9 on synthetic clusters).

    100-TB shape: training cost is bounded by ``train_sample`` regardless of
    N; the broadcast is n_cells x dim floats; shuffled volume is
    n_probe * N vectors. Default ``n_cells = ceil(sqrt(N))`` keeps expected
    |cell| ~ sqrt(N); at billions of rows pass ``n_cells ~ N / 4096`` so
    cells stay task-sized. Skew: k-means cells are NOT size-balanced and AQE
    skew-split cannot reach inside applyInPandas groups, so cells whose
    candidate count exceeds ``max_cell_rows`` are split AUTOMATICALLY by a
    secondary hash (``_split_hot_cells`` — exact, query-replicating); a
    finer quantizer (higher n_cells) remains the cheaper lever when the
    corpus allows it.
    """
    assigned = _ivf_assign(
        embeddings,
        n_cells=n_cells,
        n_probe=n_probe,
        kmeans_iters=kmeans_iters,
        train_sample=train_sample,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        n_rows_hint=n_rows_hint,
        dim=dim,
    )
    spark = embeddings.sparkSession
    if assigned is None:
        return spark.createDataFrame([], KNN_SCHEMA)
    if (
        max_cell_rows is not None
        and n_rows_hint is not None
        and n_rows_hint <= max_cell_rows
    ):
        # no cell can exceed the split threshold when the WHOLE input fits
        # under it — skip the per-cell count aggregate + broadcast join +
        # explode of the split machinery outright (provably identical:
        # every cell would get n_sub = 1)
        max_cell_rows = None

    raw_schema = "vec_id long, nn_id long, cos_sim double"

    def per_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cand = pdf[pdf["is_cand"]]
        n_c = len(cand)
        if n_c == 0 or len(pdf) == 0:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "nn_id": pd.Series([], dtype="int64"),
                    "cos_sim": pd.Series([], dtype="float64"),
                }
            )
        cand = cand.sort_values("vec_id", ignore_index=True)
        c_ids = cand["vec_id"].to_numpy(dtype=np.int64)
        c_mat, c_zero = _normalize(
            np.stack(cand["embedding"].to_numpy()).astype(np.float64)
        )
        q = pdf.sort_values("vec_id", ignore_index=True)
        kk = min(k, n_c)
        frames = []
        for lo in range(0, len(q), chunk_rows):
            sub = q.iloc[lo : lo + chunk_rows]
            q_ids = sub["vec_id"].to_numpy(dtype=np.int64)
            qm, q_zero = _normalize(
                np.stack(sub["embedding"].to_numpy()).astype(np.float64)
            )
            sims = qm @ c_mat.T  # (chunk, |cell|) — never (|cell|, |cell|)
            # zero-norm on either side -> NaN cosine (inf sentinel ranks
            # first, matching brute_force_knn / DuckDB DESC-NaN ordering)
            if c_zero.any():
                sims[:, c_zero] = np.inf
            if q_zero.any():
                sims[q_zero, :] = np.inf
            if exclude_self:
                # candidate ids are UNIQUE within a cell (one home cell per
                # vector), so a sorted membership probe suffices
                pos = np.searchsorted(c_ids, q_ids)
                hit = (pos < n_c) & (c_ids[np.minimum(pos, n_c - 1)] == q_ids)
                sims[np.flatnonzero(hit), pos[hit]] = -np.inf
            nn_idx = _topk_rows(sims, c_ids, kk)
            sel = sims[np.arange(len(sub))[:, None], nn_idx]
            frames.append(
                pd.DataFrame(
                    {
                        "vec_id": np.repeat(q_ids, kk),
                        "nn_id": c_ids[nn_idx].ravel(),
                        # RAW scores: the global reduce must order by the
                        # unrounded value or cross-cell 2dp ties would
                        # scramble the brute-force-equal ranking
                        "cos_sim": np.where(np.isposinf(sel), np.nan, sel).ravel(),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    split, keys = _split_hot_cells(assigned, max_cell_rows)
    per = split.groupBy(*keys).applyInPandas(per_cell, raw_schema)
    from pyspark.sql import Window

    # Arrow maps the pandas NaN sentinel to SQL NULL on the way out of
    # per_cell — NULLS FIRST keeps the zero-norm rows ranking ABOVE every
    # number, matching brute_force_knn (which ranks them via +inf inside
    # numpy) and the DuckDB DESC-NaN ordering
    w = Window.partitionBy("vec_id").orderBy(
        F.desc_nulls_first("cos_sim"), F.asc("nn_id")
    )
    return (
        per.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "vec_id",
            "nn_id",
            F.round("cos_sim", 2).alias("cos_sim"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


PAIR_SCHEMA = "id_a long, id_b long, cos_sim double"


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_cells: int | None = None,
    n_probe: int = 2,
    kmeans_iters: int = 10,
    train_sample: int = 65536,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_rows: int = 1024,
    n_rows_hint: int | None = None,
    dim: int | None = None,
    max_cell_rows: int | None = 65536,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector-space member of
    the dedup family (exact hash / minhash-LSH / simhash / n-gram Jaccard /
    THIS): all unordered pairs with ``cosine >= threshold``, candidate
    generation via the same IVF coarse quantizer as ``ivf_knn`` and exact
    verification inside each cell.

    Same structure as minhash-LSH dedup: the bucket (cell) join prunes the
    pair space to the collision mass, and the within-bucket check is exact —
    so output pair count IS the problem's own answer size, never O(N^2).
    A pair can surface in at most ``n_probe`` cells (each side probing the
    other's home cell); the reduce dedups by (id_a, id_b) keeping max(raw).

    Exactness anchor: with ``n_probe == n_cells`` every pair is examined, so
    the result is the exact threshold join (pinned by test against a numpy
    all-pairs oracle). ``threshold`` must be > 0: zero-norm vectors have
    cosine 0 against everything and by convention never match.

    100-TB shape: identical to ``ivf_knn`` (bounded driver training,
    n_cells x dim broadcast, n_probe * N shuffled vectors, chunked per-cell
    GEMM, automatic hot-cell splitting at ``max_cell_rows`` candidates)
    plus an output-bound pair shuffle for the dedup reduce.
    """
    if not threshold > 0:
        raise ValueError("embedding_near_dup: threshold must be > 0")
    spark = embeddings.sparkSession
    assigned = _ivf_assign(
        embeddings,
        n_cells=n_cells,
        n_probe=n_probe,
        kmeans_iters=kmeans_iters,
        train_sample=train_sample,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        n_rows_hint=n_rows_hint,
        dim=dim,
    )
    if assigned is None:
        return spark.createDataFrame([], PAIR_SCHEMA)

    raw_schema = "id_a long, id_b long, raw_cos double"

    def per_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "raw_cos": pd.Series([], dtype="float64"),
            }
        )
        cand = pdf[pdf["is_cand"]]
        if len(cand) == 0 or len(pdf) < 2:
            return empty
        cand = cand.sort_values("vec_id", ignore_index=True)
        c_ids = cand["vec_id"].to_numpy(dtype=np.int64)
        c_mat, _ = _normalize(np.stack(cand["embedding"].to_numpy()).astype(np.float64))
        q = pdf.sort_values("vec_id", ignore_index=True)
        frames = []
        for lo in range(0, len(q), chunk_rows):
            sub = q.iloc[lo : lo + chunk_rows]
            q_ids = sub["vec_id"].to_numpy(dtype=np.int64)
            qm, _ = _normalize(np.stack(sub["embedding"].to_numpy()).astype(np.float64))
            sims = qm @ c_mat.T  # (chunk, |cell|) — chunked, never |cell|^2
            # zero-norm rows stay zero vectors: cosine 0 < threshold, so no
            # sentinel logic is needed (threshold > 0 is enforced above)
            rows, cols = np.nonzero(sims >= threshold)
            if len(rows) == 0:
                continue
            qa = q_ids[rows]
            cb = c_ids[cols]
            keep = qa != cb  # self-pairs out
            qa, cb, s = qa[keep], cb[keep], sims[rows, cols][keep]
            frames.append(
                pd.DataFrame(
                    {
                        "id_a": np.minimum(qa, cb),
                        "id_b": np.maximum(qa, cb),
                        "raw_cos": s,
                    }
                )
            )
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    split, keys = _split_hot_cells(assigned, max_cell_rows)
    pairs = split.groupBy(*keys).applyInPandas(per_cell, raw_schema)
    # a pair is found once per shared cell (<= n_probe times, and twice in
    # ONE cell when both sides probe it: (a as query, b as cand) + (b as
    # query, a as cand)); max() over the raw GEMM values is a deterministic
    # dedup (both occurrences are always present, so max is order-free even
    # if BLAS blocking differs by a ulp across cells/sub-cells)
    return pairs.groupBy("id_a", "id_b").agg(
        F.round(F.max("raw_cos"), 2).alias("cos_sim")
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **near_dup_kwargs,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    method): cluster the embedding space with the IVF k-means coarse
    quantizer, find within-cell cosine near-duplicate PAIRS, collapse the
    pair graph into semantic-duplicate CLUSTERS, and keep one
    representative per cluster (plus every unclustered row). Returns the
    surviving rows of ``embeddings``.

    A pure composition — ``embedding_near_dup`` (IVF cells + exact in-cell
    verify) -> ``connected_components`` (alternating-star, O(log n)
    rounds) -> ``dedup_survivors`` (anti-join) — so it introduces no new
    shuffle shape; each stage's scale story is its own docstring's. The
    deterministic representative is the component-min id (the published
    method keeps an arbitrary cluster member; min-id is the
    partition-independent choice, consistent with ``exact_dedup``).
    ``near_dup_kwargs`` pass through to ``embedding_near_dup``
    (n_cells/n_probe/max_cell_rows... — n_probe=n_cells makes the
    pair stage provably exact)."""
    from .dedup import connected_components, dedup_survivors

    pairs = embedding_near_dup(
        embeddings,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        **near_dup_kwargs,
    )
    comps = connected_components(pairs.select("id_a", "id_b"))
    return dedup_survivors(embeddings, comps, id_col=id_col)
