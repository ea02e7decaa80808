#!/usr/bin/env python
"""Scale bench for the dedup / near-dup / ANN tier (the LLM-training-data
operators): substantiates the O(bucket-collision mass) claim with a
MEASUREMENT — docs-N, wall per op, and the bucket-size distribution — at
two (or more) scales, per the round-3 review ask.

Input construction is deterministic JVM-side scale-out of the driver's
documents/embeddings tables ($SPARK_GRAFT_SF_DIR, default sf0.1 = 5,000
docs / 2,000 vectors):

* each document is replicated R times with a per-replica token suffix so
  shingle sets (and minhash bands) genuinely differ — EXCEPT every 10th
  replica, which stays verbatim: the corpus carries a real near-dup mass
  (~10%% of rows are member of an exact-duplicate group) like a web crawl,
* each embedding is replicated with a small deterministic per-coordinate
  perturbation (seeded by (vec_id, replica, coord) hashing), preserving
  near-neighbor structure while growing the table.

Usage:
  python scripts/dedup_scale_bench.py [docs_replicas ...]   # default: 10 100
  python scripts/dedup_scale_bench.py --skew                # IVF hot-cell leg
  python scripts/dedup_scale_bench.py --chain [replicas]    # prepare_corpus e2e

Prints one JSON line per scale:
  {"n_docs": N, "walls": {op: sec}, "lsh_buckets": {...}, "ann_buckets": {...},
   "candidate_pairs": P, "near_dup_pairs": D}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyspark.sql.functions as F

    from daily_journal_dataflow_qc_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        lsh_candidate_pairs,
        minhash_signatures,
        near_dup_pairs,
        simhash,
    )
    from daily_journal_dataflow_qc_spark.operators.similarity import lsh_bucketed_knn
    from daily_journal_dataflow_qc_spark.session import get_spark

    replicas_list = [int(x) for x in sys.argv[1:]] or [10, 100]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="djdq-dedup-scale")

    base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_base = base_docs.count()

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    cores = spark.sparkContext.defaultParallelism
    for replicas in replicas_list:
        rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
        # repartition BEFORE the replica explode: the base table is one tiny
        # parquet file (one leaf partition), and an explode never re-splits —
        # without this the whole scaled corpus runs on a single task
        docs = (
            base_docs.repartition(cores * 2, "doc_id")
            .select("doc_id", "text", rep)
            .select(
                (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
                # every 10th replica verbatim (real duplicate mass); others
                # get a replica-unique token so shingles/bands differ
                F.when(F.col("rep") % 10 == 0, F.col("text"))
                .otherwise(
                    F.concat(F.col("text"), F.format_string(" rep%d tail", F.col("rep")))
                )
                .alias("text"),
            )
        )
        docs.persist()
        n_docs = docs.count()

        emb = (
            base_emb.repartition(cores * 2, "vec_id")
            .select("vec_id", "embedding", rep)
            .select(
                (F.col("vec_id") * replicas + F.col("rep")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x
                    + (
                        F.pmod(
                            F.xxhash64(F.col("vec_id"), F.col("rep"), i), F.lit(1000)
                        ).cast("double")
                        - 500.0
                    )
                    / 50000.0,
                ).alias("embedding"),
            )
        )
        emb.persist()
        n_vecs = emb.count()

        walls: dict[str, float] = {}

        def timed(name, df):
            t0 = time.time()
            mat(df)
            walls[name] = round(time.time() - t0, 2)

        timed("exact_dedup", exact_dedup(docs))
        sig = minhash_signatures(docs, n_hashes=8, shingle_k=3)
        timed("minhash_signatures", sig)
        cand = lsh_candidate_pairs(sig, bands=4, rows_per_band=2)
        t0 = time.time()
        n_cand = cand.count()
        walls["lsh_candidate_pairs"] = round(time.time() - t0, 2)
        t0 = time.time()
        ndp = near_dup_pairs(docs, threshold=0.7, n_hashes=8, bands=4).persist()
        n_near = ndp.count()
        walls["near_dup_pairs"] = round(time.time() - t0, 2)

        # duplicate-cluster resolution over the verified pair graph: the
        # replica corpus makes every base doc's replica group a CLIQUE, so
        # the edge set is the quadratic collision mass while the component
        # count stays n_base — the exact shape where pair->cluster collapse
        # pays (cliques resolve in ~2 alternating rounds; walls measure the
        # O(E)-per-round shuffles, not an O(N^2) blowup)
        t0 = time.time()
        comps = connected_components(ndp.select("id_a", "id_b")).persist()
        cc_stats = (
            comps.groupBy("cluster_rep")
            .count()
            .agg(
                F.count("*").alias("n_clusters"),
                F.max("count").alias("max_cluster"),
                F.round(F.avg("count"), 2).alias("mean_cluster"),
            )
            .head()
            .asDict()
        )
        n_cc_nodes = comps.count()
        walls["connected_components"] = round(time.time() - t0, 2)
        comps.unpersist()
        ndp.unpersist()
        timed("simhash", docs.select("doc_id", simhash(F.lower(F.col("text")), 16).alias("s")))

        # substring-level dedup (round 6): the replica corpus is the
        # ADVERSARIAL case — every base 8-gram recurs across replicas, so
        # essentially every position is flagged and the span mass tracks the
        # corpus token count (the honest worst case for the events shuffle,
        # flag join and span-merge window; a real crawl flags far less)
        from daily_journal_dataflow_qc_spark.operators.dedup import duplicate_spans

        t0 = time.time()
        spans = duplicate_spans(docs, k=8).persist()
        span_stats = (
            spans.agg(
                F.count("*").alias("n_spans"),
                F.sum("span_tokens").alias("span_token_mass"),
            )
            .head()
            .asDict()
        )
        walls["duplicate_spans"] = round(time.time() - t0, 2)
        spans.unpersist()

        # global token-budget selection (round 6): wall includes BOTH
        # bounded driver actions (min/max + per-bucket totals) and the
        # bucket-keyed window pass — the full cost of using the operator
        from daily_journal_dataflow_qc_spark.operators.sampling import (
            select_by_token_budget,
        )

        scored = docs.select(
            "doc_id",
            (F.pmod(F.xxhash64("text"), F.lit(100000)) / 100000.0).alias("score"),
            F.size(F.split(F.col("text"), " ", -1)).cast("long").alias("n_tokens"),
        )
        t0 = time.time()
        total_tokens = int(scored.agg(F.sum("n_tokens")).head()[0])
        sel = select_by_token_budget(
            scored, total_tokens // 2, "score", "n_tokens"
        )
        budget_kept_tokens = int(
            sel.filter("budget_kept").agg(F.sum("n_tokens")).head()[0] or 0
        )
        walls["select_by_token_budget"] = round(time.time() - t0, 2)
        assert budget_kept_tokens <= total_tokens // 2

        # HLL sketch leg (round 6): the build emits at most 2^p rows per
        # group no matter the input — wall should track the scan, output
        # stays constant across scales
        from daily_journal_dataflow_qc_spark.operators.sketches import (
            hll_distinct,
        )

        t0 = time.time()
        hll_val = float(hll_distinct(docs, "text", p=12).collect()[0][0])
        walls["hll_distinct"] = round(time.time() - t0, 2)

        # corpus-prep legs (round 5): all three are scan-shaped — repetition
        # is a pure projection, packing is one shuffle keyed by pack_shard,
        # decontamination is explode + broadcast semi-join (the test split's
        # distinct gram set is the broadcast side; at a test corpus too big
        # to broadcast the operator documents dropping the hint)
        from daily_journal_dataflow_qc_spark.operators.dedup import (
            contaminated_ids,
        )
        from daily_journal_dataflow_qc_spark.operators.packing import (
            pack_sequences,
        )
        from daily_journal_dataflow_qc_spark.operators.sampling import hash_split
        from daily_journal_dataflow_qc_spark.operators.textanalysis import (
            repetition_metrics,
        )

        timed(
            "repetition_metrics",
            repetition_metrics(docs).select(
                "doc_id", "top_2gram_frac", "dup_2gram_frac", "dup_3gram_frac"
            ),
        )

        packed = pack_sequences(
            docs.withColumn(
                "n_tokens", F.size(F.split(F.lower(F.col("text")), " ", -1))
            ),
            2048,
            n_shards=cores * 2,
        )
        # noop-write the FULL frame (a bins-only count would let Catalyst
        # prune the pack_pos window — the CLAUDE.md count() gotcha), then
        # count bins untimed
        timed("pack_sequences", packed)
        n_bins = packed.select("pack_shard", "pack_bin").distinct().count()

        split_docs = hash_split(docs, "doc_id")
        t0 = time.time()
        n_contam = contaminated_ids(
            split_docs.filter(F.col("split") != "test"),
            split_docs.filter(F.col("split") == "test"),
        ).count()
        walls["decontaminate"] = round(time.time() - t0, 2)

        # bucket-size distribution of the banded LSH join (the quantity the
        # pair space actually depends on — sum over buckets of |b|^2)
        band_cols = []
        for b in range(4):
            parts = [F.col(f"mh{b * 2 + r}").cast("string") for r in range(2)]
            band_cols.append(
                F.struct(F.lit(b).alias("band_idx"), F.concat_ws("_", *parts).alias("h"))
            )
        buckets = (
            sig.select(F.explode(F.array(*band_cols)).alias("band"))
            .groupBy("band.band_idx", "band.h")
            .count()
        )
        lsh_stats = buckets.agg(
            F.count("*").alias("n_buckets"),
            F.max("count").alias("max"),
            F.expr("percentile(count, 0.99)").alias("p99"),
            F.round(F.avg("count"), 2).alias("mean"),
            F.sum(F.col("count") * F.col("count")).alias("collision_mass"),
        ).head().asDict()

        # ANN: planes scale with log2(N) (operator default), 8 tables
        t0 = time.time()
        ann = lsh_bucketed_knn(emb, n_tables=8, seed=42, n_rows_hint=n_vecs)
        n_ann = ann.count()
        walls["lsh_bucketed_ann"] = round(time.time() - t0, 2)

        # exact top-k baseline: broadcast-GEMM brute force with a 10% query
        # sample against the FULL candidate set (the per-row selection
        # kernel this measures is the one BENCH/BASELINE.md's round-5 A/B
        # picked); k=5 exercises the boundary-tie detection on the replica
        # clusters' exactly-tied cosines
        from daily_journal_dataflow_qc_spark.operators.similarity import (
            brute_force_knn,
        )

        t0 = time.time()
        q10 = emb.filter(F.pmod("vec_id", F.lit(10)) == 0)
        bf = brute_force_knn(q10, emb, k=5, n_rows_hint=n_vecs).persist()
        n_bf = bf.count()
        walls["brute_force_knn_10pct_k5"] = round(time.time() - t0, 2)

        # ANN quality at scale: recall@1 of the multi-table LSH result vs
        # the exact best cosine on the sampled queries (scores are rounded
        # to 2dp on both sides, so >= best is an exact-tie-tolerant hit;
        # NaN exact-best rows — zero-norm queries — are excluded)
        bf1 = bf.filter((F.col("rk") == 1) & ~F.isnan("cos_sim")).select(
            F.col("vec_id").alias("_q"), F.col("cos_sim").alias("_best")
        )
        n_q10 = bf1.count()
        ann_hits = (
            ann.join(bf1, ann["vec_id"] == F.col("_q"), "inner")
            .filter(F.col("cos_sim") >= F.col("_best"))
            .count()
        )
        recall1 = round(ann_hits / n_q10, 4) if n_q10 else None

        # IVF-ANN leg: the centroid-bucketed variant (default sqrt(N) cells,
        # 2 probes) answering the same top-1 question; recall measured
        # against the same exact-kNN sample
        from daily_journal_dataflow_qc_spark.operators.similarity import ivf_knn

        t0 = time.time()
        ivf = ivf_knn(emb, n_probe=2, seed=42, n_rows_hint=n_vecs).persist()
        n_ivf = ivf.count()
        walls["ivf_ann"] = round(time.time() - t0, 2)
        ivf_hits = (
            ivf.join(bf1, ivf["vec_id"] == F.col("_q"), "inner")
            .filter(F.col("cos_sim") >= F.col("_best"))
            .count()
        )
        ivf_recall1 = round(ivf_hits / n_q10, 4) if n_q10 else None
        ivf.unpersist()
        bf.unpersist()

        # embedding-cosine near-dup leg: the vector-space dedup mode. At
        # threshold 0.99 the true pair set is exactly the within-replica-
        # group mass (perturbed replicas sit at cos ~0.9999, distinct bases
        # ~0), so the reported pair count doubles as a correctness probe:
        # expect ~ n_base * C(replicas, 2)
        from daily_journal_dataflow_qc_spark.operators.similarity import (
            embedding_near_dup,
        )

        t0 = time.time()
        n_ndp = embedding_near_dup(
            emb, threshold=0.99, n_probe=2, seed=42, n_rows_hint=n_vecs
        ).count()
        walls["embedding_near_dup"] = round(time.time() - t0, 2)
        import math as _m

        n_planes = max(4, int(_m.ceil(_m.log2(max(n_vecs, 2)))))
        ann_buckets = None  # reconstructed signature histogram
        # reuse the operator's deterministic signatures: recompute bucket
        # histogram relationally from the same planes
        import numpy as np

        first = base_emb.select("embedding").head()
        dim = len(first[0])
        rng = np.random.default_rng(42)
        planes = rng.standard_normal((dim, n_planes * 8))
        pl = [[float(v) for v in planes[:, t * n_planes + i]] for t in range(8) for i in range(n_planes)]
        # bucket id per (table): sum over planes of bit * 2^i computed JVM-side
        terms = []
        for t in range(8):
            bits = []
            for i in range(n_planes):
                vec = F.array(*[F.lit(v) for v in pl[t * n_planes + i]])
                dot = F.aggregate(
                    F.zip_with("embedding", vec, lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                bits.append(F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0)))
            terms.append(
                F.struct(F.lit(t).alias("tbl"), sum_cols(bits).alias("bucket"))
            )
        sig_e = emb.select(F.explode(F.array(*terms)).alias("s")).groupBy(
            "s.tbl", "s.bucket"
        ).count()
        ann_buckets = sig_e.agg(
            F.count("*").alias("n_buckets"),
            F.max("count").alias("max"),
            F.expr("percentile(count, 0.99)").alias("p99"),
            F.round(F.avg("count"), 2).alias("mean"),
        ).head().asDict()

        print(
            json.dumps(
                {
                    "n_base_docs": n_base,
                    "replicas": replicas,
                    "n_docs": n_docs,
                    "n_vecs": n_vecs,
                    "walls": walls,
                    "candidate_pairs": n_cand,
                    "near_dup_pairs": n_near,
                    "cc_nodes": n_cc_nodes,
                    "cc_clusters": {k: float(v) for k, v in cc_stats.items()},
                    "ann_rows": n_ann,
                    "brute_force_rows": n_bf,
                    "ann_recall_at1_vs_exact": recall1,
                    "ivf_rows": n_ivf,
                    "ivf_recall_at1_vs_exact": ivf_recall1,
                    "embedding_near_dup_pairs": n_ndp,
                    "dup_spans": {k: int(v or 0) for k, v in span_stats.items()},
                    "budget_total_tokens": total_tokens,
                    "budget_kept_tokens": budget_kept_tokens,
                    "hll_distinct_est": hll_val,
                    "pack_bins": n_bins,
                    "contaminated_docs": n_contam,
                    "ann_n_planes": n_planes,
                    "lsh_buckets": {k: float(v) for k, v in lsh_stats.items()},
                    "ann_buckets": {k: float(v) for k, v in ann_buckets.items()},
                }
            ),
            flush=True,
        )
        docs.unpersist()
        emb.unpersist()


def sum_cols(cols):
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def skew_leg() -> None:
    """IVF hot-cell leg (VERDICT r05 #5 done-criterion): a deliberately
    skewed corpus — one dominant cluster of EXACT-duplicate embeddings (the
    boilerplate-page case: identical text -> identical vectors), where
    k-means necessarily assigns the whole cluster to a single cell — run
    with automatic splitting off vs on. The unsplit plan serializes the
    hot cell's whole GEMM through one task (OpenBLAS here is capped at 2
    threads, like a real executor core slot); the split plan bounds each
    task at ~max_cell_rows candidates. Outputs must be IDENTICAL (ties are
    cut deterministically by nn_id, so even an all-ties hot cluster
    reorders nothing)."""
    import numpy as np
    import pyspark.sql.functions as F

    from daily_journal_dataflow_qc_spark.operators.similarity import ivf_knn
    from daily_journal_dataflow_qc_spark.session import get_spark

    spark = get_spark(app_name="djdq-ivf-skew")
    cores = spark.sparkContext.defaultParallelism
    n_hot, n_bg, dim = 40960, 20000, 64
    max_cell_rows = 4096

    rng = np.random.default_rng(11)
    hot_vec = [float(v) for v in rng.standard_normal(dim)]
    hot = spark.range(n_hot).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(v) for v in hot_vec]).alias("embedding"),
    )
    bg = spark.range(n_hot, n_hot + n_bg).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(2000)).cast("double")
                - 1000.0
            )
            / 1000.0,
        ).alias("embedding"),
    )
    emb = hot.unionAll(bg).repartition(cores * 2, "vec_id").persist()
    n_vecs = emb.count()

    walls: dict[str, float] = {}
    outs = {}
    for name, mcr in (("ivf_unsplit", None), ("ivf_autosplit", max_cell_rows)):
        t0 = time.time()
        r = ivf_knn(
            emb, n_probe=1, k=1, seed=7, n_rows_hint=n_vecs, max_cell_rows=mcr
        ).persist()
        n_out = r.count()
        walls[name] = round(time.time() - t0, 2)
        outs[name] = (r, n_out)

    a, na = outs["ivf_unsplit"]
    b, nb = outs["ivf_autosplit"]
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(
        json.dumps(
            {
                "leg": "ivf_hot_cell_split",
                "n_vecs": n_vecs,
                "hot_cluster": n_hot,
                "max_cell_rows": max_cell_rows,
                "expected_sub_cells": -(-n_hot // max_cell_rows),
                "walls": walls,
                "rows": {"unsplit": na, "autosplit": nb},
                "outputs_identical": bool(diff == 0 and na == nb),
                "speedup": round(walls["ivf_unsplit"] / walls["ivf_autosplit"], 2),
            }
        ),
        flush=True,
    )


def chain_leg(replicas: int) -> None:
    """End-to-end prepare_corpus chain wall (the round-5 ad-hoc measurement,
    codified): same replica corpus as main(), eval set = one replica each
    of 1% of the BASE docs (doc_id % (100*replicas) == 0 — i.e. rep 0 of
    every 100th base doc), operator defaults throughout. NB the eval set
    must be keyed to BASE texts: sampling 1% of REPLICA rows puts one
    replica of EVERY base text into the eval corpus, and 8-gram
    decontamination then rightly flags 100% of the corpus (survivors=0) —
    measured, not hypothetical."""
    import pyspark.sql.functions as F

    from daily_journal_dataflow_qc_spark.operators.corpus import prepare_corpus
    from daily_journal_dataflow_qc_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="djdq-corpus-chain")
    cores = spark.sparkContext.defaultParallelism
    base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
    docs = (
        base_docs.repartition(cores * 2, "doc_id")
        .select("doc_id", "text", rep)
        .select(
            (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
            F.when(F.col("rep") % 10 == 0, F.col("text"))
            .otherwise(
                F.concat(F.col("text"), F.format_string(" rep%d tail", F.col("rep")))
            )
            .alias("text"),
        )
        .persist()
    )
    n_docs = docs.count()
    eval_set = docs.filter(F.pmod("doc_id", F.lit(100 * replicas)) == 0).persist()
    n_eval = eval_set.count()

    t0 = time.time()
    out = prepare_corpus(docs, eval_set).persist()
    survivors = out.count()
    wall = round(time.time() - t0, 2)
    n_bins = out.select("split", "pack_shard", "pack_bin").distinct().count()
    print(
        json.dumps(
            {
                "leg": "prepare_corpus_chain",
                "replicas": replicas,
                "n_docs": n_docs,
                "n_eval": n_eval,
                "wall_sec": wall,
                "survivors": survivors,
                "pack_bins": n_bins,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    if "--skew" in sys.argv:
        skew_leg()
    elif "--chain" in sys.argv:
        rest = [a for a in sys.argv[1:] if a != "--chain"]
        chain_leg(int(rest[0]) if rest else 100)
    else:
        main()
