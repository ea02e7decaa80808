"""Deterministic sampling / splitting for training-data pipelines.

Large-scale dataset assembly needs REPRODUCIBLE, PARTITION-INDEPENDENT
sampling — ``df.sample`` is seeded per partition, so the selected rows
change whenever the input is repartitioned, compacted, or re-read at a
different parallelism. Everything here keys off the portable md5-prefix
hash (``functions.hashing``) of a stable id column instead, so

* the same row lands in the same split/sample on every run, any engine
  (the DuckDB oracle mirrors the exact hash arithmetic),
* splitting by a GROUP key (conv_id, source domain, url host) keeps whole
  groups on one side — the train/test leakage guard a row-wise random
  split cannot give,
* no shuffle for ``hash_split``/``hash_sample`` (pure projections: the
  filter rides the scan); ``stratified_sample`` is one window over the
  stratum key.

100-TB shape: hash_split/hash_sample are embarrassingly parallel map work
(whole-stage codegen, no Python); stratified_sample shuffles once on the
stratum column — at billions of rows per stratum, cap n_per_stratum or
pre-filter with hash_sample so the per-stratum sort stays bounded (the
rank is a WindowGroupLimit, so only the top-n survive the exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import bind_array
from ..functions.hashing import seeded_hash

# hash buckets per unit of weight resolution: 1e6 gives ppm-exact split
# fractions with integer arithmetic (no float-boundary drift across engines)
_BUCKETS = 1_000_000


def _bucket(key: Column, seed: str) -> Column:
    """Deterministic bucket in [0, _BUCKETS) from the portable hash."""
    return F.pmod(seeded_hash(key.cast("string"), seed), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test by default) by the
    portable hash of ``key_col`` — reproducible under any partitioning, and
    leakage-safe when ``key_col`` is a group key (every row of a group gets
    the same assignment). Weights are normalized; boundaries are exact to
    one part per million."""
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    if not weights or any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("hash_split: weights must be non-negative and sum > 0")
    total = sum(weights.values())
    b = _bucket(F.col(key_col), f"{seed}:")
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cut = int(round(acc * _BUCKETS))
        expr = F.when(b < cut, name) if expr is None else expr.when(b < cut, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    seed: str = "sample",
) -> DataFrame:
    """Deterministic Bernoulli-by-hash sample: keep rows whose key bucket
    falls below ``rate`` — the reproducible replacement for ``df.sample``
    (which re-draws per partition layout). The filter is a pure projection
    predicate, so it pushes into the scan."""
    if not 0 <= rate <= 1:
        raise ValueError(f"hash_sample: rate {rate} outside [0, 1]")
    cut = int(round(rate * _BUCKETS))
    return df.filter(_bucket(F.col(key_col), f"{seed}:") < cut)


def mixture_keep(
    rates: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "mix",
    default_rate: float = 0.0,
) -> Column:
    """The ``mixture_sample`` keep-predicate as a pure COLUMN (never null):
    callers annotating at row grain (e.g. a flag column next to other
    assignments) use this directly instead of a filter + self-join — the
    draw is a projection, so materializing it as a boolean costs nothing."""
    if any(not 0 <= r <= 1 for r in rates.values()) or not 0 <= default_rate <= 1:
        raise ValueError("mixture_sample: rates must be in [0, 1]")
    cut = None
    for s, r in rates.items():
        c = F.lit(int(round(r * _BUCKETS)))
        cond = F.col(source_col) == s
        cut = F.when(cond, c) if cut is None else cut.when(cond, c)
    dflt = F.lit(int(round(default_rate * _BUCKETS)))
    cut = dflt if cut is None else cut.otherwise(dflt)
    # coalesce BOTH sides: concat null-propagates, and a NULL bucket would
    # silently DROP the row regardless of its rate. NULL-key rows of a
    # source share one bucket (kept or dropped together) — a draw on a
    # missing key is ill-defined, collective fate is the documented choice
    b = _bucket(
        F.concat(
            F.coalesce(F.col(source_col), F.lit("")),
            F.lit(":"),
            F.coalesce(F.col(key_col).cast("string"), F.lit("")),
        ),
        f"{seed}:",
    )
    return b < cut


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "mix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Weighted corpus mixture: keep each row with ITS SOURCE'S rate — the
    domain-weighted sampling every published pretraining mixture uses
    (web 0.1, books 0.9, ...; public practice). Per-source Bernoulli by the
    portable hash of ``source:key``, so draws are independent across
    sources, reproducible under any partitioning, and engine-mirrorable.
    Sources absent from ``rates`` — including a NULL source — keep
    ``default_rate`` (0 = dropped). Pure projection predicate — no
    shuffle, pushes into the scan."""
    return df.filter(
        mixture_keep(rates, source_col, key_col, seed, default_rate)
    )


def epoch_counts(
    epochs: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "mix",
    default_epochs: float = 0.0,
) -> Column:
    """Number of training copies a row earns under a multi-epoch mixture:
    ``floor(e)`` guaranteed copies plus one more iff the row's hash bucket
    falls below ``frac(e)`` — the UP-sampling half of domain weighting that
    ``mixture_sample`` (rates <= 1) cannot express. Published pretraining
    mixtures repeat small high-quality sources for several epochs while
    down-sampling web crawl; a fractional epoch count (books x 2.5) means
    every book appears twice and a deterministic half of them a third time.

    With every ``e <= 1`` and the shared default seed this reduces EXACTLY
    to ``mixture_sample``'s Bernoulli keep (same hash draw: count 1 = kept).
    Exposed as a Column so callers can annotate at source grain (pure
    projection — no shuffle) or explode (``mixture_epochs``). Same NULL
    semantics as ``mixture_sample``: NULL sources take ``default_epochs``,
    NULL keys of a source share one draw (collective fate)."""
    vals = list(epochs.values()) + [default_epochs]
    if any(not e >= 0 or e != e or e == float("inf") for e in vals):
        raise ValueError("epoch_counts: epochs must be finite and >= 0")
    base = None
    cut = None
    for s, e in epochs.items():
        fl = int(e)
        c = F.lit(int(round((e - fl) * _BUCKETS)))
        cond = F.col(source_col) == s
        base = F.when(cond, F.lit(fl)) if base is None else base.when(cond, F.lit(fl))
        cut = F.when(cond, c) if cut is None else cut.when(cond, c)
    dfl = F.lit(int(default_epochs))
    dcut = F.lit(int(round((default_epochs - int(default_epochs)) * _BUCKETS)))
    base = dfl if base is None else base.otherwise(dfl)
    cut = dcut if cut is None else cut.otherwise(dcut)
    b = _bucket(
        F.concat(
            F.coalesce(F.col(source_col), F.lit("")),
            F.lit(":"),
            F.coalesce(F.col(key_col).cast("string"), F.lit("")),
        ),
        f"{seed}:",
    )
    return (base + F.when(b < cut, 1).otherwise(0)).cast("int")


def mixture_epochs(
    df: DataFrame,
    epochs: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "mix",
    default_epochs: float = 0.0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Materialize the multi-epoch mixture: each row is replicated
    ``epoch_counts(...)`` times with ``epoch_col`` = 0..n-1 (rows earning 0
    copies are dropped). Pure projection + explode — no shuffle; output
    volume is exactly the target token budget's row equivalent. The DuckDB
    oracle reproduces it bit-exactly (generate_series over the same hash
    arithmetic), so replication is partition-independent by construction."""
    nc = epoch_counts(epochs, source_col, key_col, seed, default_epochs)
    return (
        df.withColumn("_n_ep", nc)
        .filter(F.col("_n_ep") > 0)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(0), F.col("_n_ep") - 1)))
        .select(*df.columns, epoch_col)
    )


def _hashed_ngram_events(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int, seed: str
) -> DataFrame:
    """(id, bucket) hashed-feature events: word unigrams + bigrams (the DSIR
    feature space) through the portable hash into ``n_buckets``. Literal-space
    split with empties dropped; docs under 2 words emit unigrams only.
    Pure projection + one explode — no shuffle until the caller aggregates;
    the token array is bound once (bind_array) so the per-position bigram
    slices do not re-split the text (O(n^2)/row otherwise)."""
    words = F.filter(F.split(F.lower(F.col(text_col)), " ", -1), lambda x: x != "")
    feats = bind_array(
        words,
        lambda w: F.concat(
            w,
            F.when(
                F.size(w) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - 1),
                    lambda i: F.array_join(F.slice(w, i, 2), " "),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(feats).alias("_feat")
    ).select(
        id_col,
        F.pmod(seeded_hash(F.col("_feat"), f"{seed}:"), F.lit(n_buckets)).alias(
            "_bucket"
        ),
    )


def dsir_logweights(
    df: DataFrame,
    target_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    alpha: float = 0.01,
    seed: str = "dsir",
    weight_col: str = "dsir_logweight",
    target_filter: Column | None = None,
) -> DataFrame:
    """Per-doc log importance weight for Data Selection via Importance
    Resampling (Xie et al. 2023; public method): fit hashed-n-gram
    bag-of-words distributions on a TARGET (high-quality reference) corpus
    and on the RAW corpus, then weight every raw doc by
    ``sum_b n_doc[b] * (ln p_target[b] - ln p_raw[b])`` — docs whose
    feature profile looks like the target score high. Distributions are
    add-alpha smoothed over the ``n_buckets`` hash buckets, so zero-count
    buckets are well-defined in both corpora. Deterministic: portable-hash
    features, counts, and logs only.

    Output: (id_col, weight_col) — zero-feature docs are absent (callers
    left-join, same convention as the other doc-grain scorers).

    Distributed shape (r07: ONE raw-corpus pass, was two): the raw corpus
    is exploded ONCE into hashed-feature events and immediately reduced to
    per-(doc, bucket) counts with map-side combine; the raw bucket
    distribution is then a second, tiny aggregation OVER those counts (<=
    n_buckets rows), never a re-explode of the corpus. The target corpus
    gets its own bucket-keyed count shuffle (map-side combined). Both
    distributions and their totals live in ONE <= n_buckets-row stats
    table (full-outer bucket merge + a single-partition window for the two
    totals — a one-task stage over a bounded table), broadcast once; the
    per-doc weight is the bucket-count-weighted sum of the per-bucket
    log-ratio. No densification against range(n_buckets) is needed: absent
    buckets carry zero counts (coalesce) and contribute zero to the
    totals. The bucket tables are bounded by construction (n_buckets, not
    vocabulary), so the broadcast NEVER outgrows the hint — hashing is
    what makes DSIR's statistics O(1) in corpus size.

    ``target_filter`` (exclusive with ``target_df``): when the reference
    corpus is a ROW-SUBSET of ``df`` selected by a predicate over
    ``id_col`` ALONE (a curated id slice — the common self-referential
    setup; the predicate is evaluated against the (doc, bucket) count
    table, which carries no other corpus column), pass the predicate
    instead of a frame. Both distributions then come from ONE conditional
    aggregation over the (doc, bucket) counts — the target side never
    re-scans, re-explodes, or re-hashes anything, and the union merge
    disappears (every target bucket is a raw bucket by construction).
    Identical values to the target_df form."""
    if n_buckets < 2:
        raise ValueError("dsir_logweights: n_buckets must be >= 2")
    if alpha <= 0:
        raise ValueError("dsir_logweights: alpha must be > 0 (smoothing)")
    if (target_df is None) == (target_filter is None):
        raise ValueError(
            "dsir_logweights: pass exactly one of target_df / target_filter"
        )
    # NULL-id rows are excluded up front: a per-doc weight for a null id is
    # ill-defined (they could only contribute to the raw distribution's
    # denominator). Placing this filter — and the no-op isnotnull(_bucket)
    # that the inner stats join would infer anyway — EXPLICITLY in the
    # shared subtree keeps dbc's two consumers canonically identical, so
    # the (doc, bucket) exchange is REUSED instead of the corpus being
    # exploded twice (constraint-inference would otherwise push these
    # predicates into only one consumer and break the reuse — measured:
    # that one canonicalization miss doubles the operator's corpus cost).
    events = _hashed_ngram_events(
        df.filter(F.col(id_col).isNotNull()), text_col, id_col, n_buckets, seed
    )
    # (doc, bucket) counts: the ONLY pass over the exploded raw corpus
    dbc = (
        events.filter(F.col("_bucket").isNotNull())
        .groupBy(id_col, "_bucket")
        .agg(F.count("*").alias("_n"))
    )
    if target_filter is not None:
        # self-referential target: both distributions from ONE aggregation
        # over dbc (the predicate references grouping columns only, so the
        # conditional sum sees exactly the target docs' counts)
        merged = dbc.groupBy("_bucket").agg(
            F.sum("_n").alias("_c_r"),
            F.sum(F.when(target_filter, F.col("_n")).otherwise(F.lit(0))).alias(
                "_c_t"
            ),
        )
    else:
        rc = dbc.groupBy("_bucket").agg(F.sum("_n").alias("_c_r"))
        tc = (
            _hashed_ngram_events(target_df, text_col, id_col, n_buckets, seed)
            .groupBy("_bucket")
            .agg(F.count("*").alias("_c_t"))
        )
        # bucket merge as a UNION + re-aggregate (not a full-outer join,
        # which would plan a SortMergeJoin even for these <= n_buckets-row
        # tables)
        merged = (
            rc.select("_bucket", "_c_r", F.lit(0).cast("long").alias("_c_t"))
            .unionAll(
                tc.select("_bucket", F.lit(0).cast("long").alias("_c_r"), "_c_t")
            )
            .groupBy("_bucket")
            .agg(F.sum("_c_r").alias("_c_r"), F.sum("_c_t").alias("_c_t"))
        )
    stats = merged.withColumns(
        {
            "_t_r": F.sum("_c_r").over(Window.partitionBy()),
            "_t_t": F.sum("_c_t").over(Window.partitionBy()),
        }
    )
    contrib = F.log(
        (F.col("_c_t") + alpha) / (F.col("_t_t") + alpha * n_buckets)
    ) - F.log((F.col("_c_r") + alpha) / (F.col("_t_r") + alpha * n_buckets))
    return (
        dbc.join(F.broadcast(stats), ["_bucket"])
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("_n") * contrib), 4).alias(weight_col))
    )


def dsir_select(
    df: DataFrame,
    target_df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    alpha: float = 0.01,
    seed: str = "dsir",
) -> DataFrame:
    """DSIR's Gumbel-top-k resample, made deterministic: draw each doc's
    Gumbel noise from its portable hash (u = (bucket + 0.5)/B, g =
    -ln(-ln u)) and keep the ``n`` largest ``logweight + g`` — an exact
    sample-without-replacement from the softmax of the importance weights
    (the published Gumbel-top-k identity), reproducible under any
    partitioning. One global top-n (TakeOrdered — no full sort
    materializes) on top of ``dsir_logweights``'s shape."""
    lw = dsir_logweights(df, target_df, text_col, id_col, n_buckets, alpha, seed)
    u = (_bucket(F.col(id_col).cast("string"), f"{seed}:gumbel:") + 0.5) / _BUCKETS
    g = -F.log(-F.log(u))
    return (
        df.join(lw, id_col)
        .withColumn("_gumbel_key", F.col("dsir_logweight") + g)
        .orderBy(F.col("_gumbel_key").desc(), F.col(id_col))
        .limit(n)
        .drop("_gumbel_key")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
    seed: str = "strat",
    rank_col: str | None = None,
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by hash order — a deterministic uniform draw that every
    engine reproduces, unlike ``sampleBy`` (approximate AND layout-seeded).
    Tie-break on ``key_col`` makes duplicate hashes (duplicate keys) stable.
    With ``rank_col`` set, returns ALL rows annotated with the within-stratum
    hash rank instead of filtering (callers can cut at any n downstream)."""
    if n_per_stratum < 1 and rank_col is None:
        raise ValueError("stratified_sample: n_per_stratum must be >= 1")
    w = Window.partitionBy(strata_col).orderBy(
        _bucket(F.col(key_col), f"{seed}:"), F.col(key_col)
    )
    rc = rank_col or "_strat_rank"
    out = df.withColumn(rc, F.row_number().over(w))
    if rank_col is not None:
        return out
    return out.filter(F.col(rc) <= n_per_stratum).drop(rc)


def select_by_token_budget(
    df: DataFrame,
    budget: int,
    score_col: str,
    token_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    flag_col: str = "budget_kept",
) -> DataFrame:
    """Global best-first selection under a corpus token budget: order all
    rows by (score DESC, id ASC), keep every row whose running token total
    INCLUDING ITSELF is <= ``budget`` (the prefix rule — cumulative sum over
    the full ordering, so once the budget overflows nothing later is kept).
    Returns ``df`` plus a boolean ``flag_col``.

    The naive plan — one cumulative-sum window over a GLOBAL ORDER BY — is
    a single-partition bottleneck at scale (every row through one task).
    This runs the same rule as two bounded driver actions plus ONE
    bucket-keyed exchange:

      1. min/max of the score (one row to the driver);
      2. per-bucket token totals over ``n_buckets`` equal-width score
         buckets (<= n_buckets rows to the driver), prefix-summed top-down
         to find the boundary bucket b* — all buckets above it fit whole,
         everything below is out;
      3. one window pass partitioned by bucket: within-bucket running sum
         in (score DESC, id) order; rows in b* keep while the residual
         budget lasts. Bucket monotonicity in score makes the result
         IDENTICAL to the global rule (floor is monotone, so every doc in
         a higher bucket outscores every doc in a lower one; the in-bucket
         order extends the global order).

    Skew caveat: a bucket's window is one task, so the worst case (every
    row sharing one score value -> one bucket) degenerates to the global
    window; with real-valued quality scores the expected bucket is N /
    n_buckets rows — raise ``n_buckets`` for tighter bounds. Zero-token
    rows follow the prefix rule exactly (kept only while the running total
    is still within budget). Null scores are never selected (they cannot
    be ordered); token counts must be non-negative."""
    if budget < 0:
        raise ValueError("select_by_token_budget: budget must be >= 0")
    if n_buckets < 1:
        raise ValueError("select_by_token_budget: n_buckets must be >= 1")
    raw = F.col(score_col).cast("double")
    # NaN is a VALUE to Spark (sorts above +inf, survives min/max) but an
    # unordered score is unselectable — normalize NaN to NULL up front so
    # both the stats pass and the bucketing treat it like a missing score
    score = F.when(F.isnan(raw), F.lit(None).cast("double")).otherwise(raw)
    stats = df.agg(
        F.min(score).alias("mn"),
        F.max(score).alias("mx"),
        F.sum(F.when(F.col(token_col) < 0, 1).otherwise(0)).alias("neg"),
        # a NULL count on a scored row would make its keep/drop decision
        # depend on which code path (fast vs boundary-bucket) it hits —
        # enforce the non-negative-integer contract instead
        F.sum(
            F.when(score.isNotNull() & F.col(token_col).isNull(), 1).otherwise(0)
        ).alias("nulltok"),
    ).collect()[0]
    if stats["mn"] is None:
        return df.withColumn(flag_col, F.lit(False))
    if stats["neg"]:
        raise ValueError("select_by_token_budget: negative token counts")
    if stats["nulltok"]:
        raise ValueError("select_by_token_budget: null token counts on scored rows")
    mn, mx = float(stats["mn"]), float(stats["mx"])
    width = (mx - mn) or 1.0
    # least() IGNORES nulls (least(k, NULL) = k), so a null/NaN score must
    # be pinned to a NULL bucket explicitly or it lands in the top bucket
    # and its tokens eat the budget
    bkt = F.when(
        score.isNull(), F.lit(None).cast("int")
    ).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor((score - F.lit(mn)) / F.lit(width) * n_buckets).cast("int"),
        )
    )
    per_bucket = {
        int(r["b"]): int(r["t"] or 0)
        for r in df.groupBy(bkt.alias("b"))
        .agg(F.sum(F.col(token_col).cast("long")).alias("t"))
        .collect()
        if r["b"] is not None  # null-score rows are never selected
    }
    running, b_star, rem = 0, -1, budget
    for b in sorted(per_bucket, reverse=True):
        if running + per_bucket[b] > budget:
            b_star, rem = b, budget - running
            break
        running += per_bucket[b]
    if b_star == -1:
        # everything (with a score) fits: no boundary bucket, pure projection
        return df.withColumn(flag_col, score.isNotNull())
    w = (
        Window.partitionBy("_sbtb_bkt")
        .orderBy(score.desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("_sbtb_bkt", bkt)
        .withColumn("_sbtb_cum", F.sum(F.col(token_col).cast("long")).over(w))
        .withColumn(
            flag_col,
            F.coalesce(  # null score -> null bucket -> excluded, not null
                (F.col("_sbtb_bkt") > b_star)
                | ((F.col("_sbtb_bkt") == b_star) & (F.col("_sbtb_cum") <= rem)),
                F.lit(False),
            ),
        )
        .drop("_sbtb_bkt", "_sbtb_cum")
    )
