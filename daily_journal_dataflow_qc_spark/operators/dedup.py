"""Deduplication operators for large-scale training-data pipelines.

All built from DataFrame primitives (no driver-side loops); hashing is the
portable md5-prefix hash so every operator is oracle-checkable in DuckDB.

* ``exact_dedup``          — content-hash groupBy, keep deterministic min-id.
* ``minhash_signatures``   — word-shingle minhash (n permutations) per doc.
* ``lsh_candidate_pairs``  — banded LSH: docs sharing any band bucket.
* ``near_dup_pairs``       — LSH candidates verified with exact shingle-set
                             Jaccard >= threshold (the MinHash+LSH pipeline:
                             shingle -> minhash -> band -> bucket-join ->
                             verify).
* ``ngram_jaccard``        — exact Jaccard between explicit pairs.
* ``simhash``              — b-bit simhash per doc; ``simhash_near_dups``
                             pairs within a Hamming radius.
* ``connected_components`` — duplicate-CLUSTER resolution: collapse the
                             near-dup pair graph into components (node ->
                             component-min representative) via the
                             alternating large-star/small-star algorithm.
* ``dedup_survivors``      — keep one doc per duplicate cluster (the
                             representative) plus every unpaired doc.
* ``contaminated_ids`` / ``decontaminate`` — n-gram test-set decontamination
                             (train docs sharing any k-shingle with the test
                             corpus; broadcast semi-join on the test grams).
* ``dedup_lines``          — LINE-level dedup (C4 / RefinedWeb practice,
                             public): drop every line whose exact content
                             occurs >= min_count times corpus-wide,
                             reassemble the survivors in order.
* ``duplicate_spans`` / ``remove_duplicate_spans`` — SUBSTRING-level dedup
                             (Lee et al. 2022, "Deduplicating Training Data
                             Makes Language Models Better" — public method):
                             token spans of >= k tokens whose content occurs
                             >= min_count times anywhere in the corpus
                             (across OR within docs), detected via rolling
                             k-token gram hashes and merged into maximal
                             spans; removal rebuilds the text with the
                             flagged tokens dropped, JVM-side.

Scale notes: signatures/simhash are single-pass projections (no shuffle);
the bucket join shuffles only (band_idx, band_hash) keys, so the pair space
is the bucket-collision mass, not O(N^2). Verification joins shingle arrays
only for candidate pairs. Cluster resolution is O(log n) alternating rounds
of O(E)-volume shuffles with lineage truncated per round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.arrays import bind_array
from ..functions.hashing import seeded_hash


def word_shingles(text_lc: Column, k: int = 3) -> Column:
    """Distinct k-word shingles; short docs fall back to the whole text.
    The split array is bound once (bind_array): slicing it per position
    inside the transform lambda would re-split the text per gram."""
    return F.array_distinct(
        bind_array(
            F.split(text_lc, " ", -1),
            lambda w: F.when(
                F.size(w) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - k + 1),
                    lambda i: F.array_join(F.slice(w, i, k), " "),
                ),
            ).otherwise(F.array(F.array_join(w, " "))),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one ROW per distinct content (deterministic: min id; NULL ids
    never survive) — also collapses verbatim re-deliveries (duplicate rows
    of the surviving id itself, which the semi-join alone would keep).

    SKEW NOTE (why not a rank-1 window): a single window over
    ``md5(text)`` would be one exchange instead of three and measures
    faster at every scale this sandbox can build (BENCH/BASELINE.md has
    the A/B, including a 2M-copy hot group) — but its per-task memory is
    O(largest duplicate group): row_number has no partial aggregation and
    AQE cannot split window skew, so one boilerplate page with 50M copies
    puts the whole group through one task on a real cluster (OOM cliff at
    executor-sized memory). ``groupBy(md5).agg(min)`` does map-side
    combine, keeping per-task memory bounded regardless of the duplicate
    distribution; the id-keyed join and final dropDuplicates shuffle on
    (near-)unique keys, which cannot be hot."""
    keep = df.groupBy(F.md5(F.col(text_col)).alias("_h")).agg(
        F.min(id_col).alias(id_col)
    )
    return df.join(keep, id_col, "left_semi").dropDuplicates([id_col])


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, shingles, mh0..mh{n-1}) — min of seeded hashes over shingles."""
    sh = word_shingles(F.lower(F.col(text_col)), shingle_k)
    out = df.select(F.col(id_col), sh.alias("shingles"))
    cols = {
        f"mh{i}": F.array_min(
            F.transform(F.col("shingles"), (lambda seed: (lambda x: seeded_hash(x, seed)))(f"s{i}:"))
        )
        for i in range(n_hashes)
    }
    return out.withColumns(cols)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one band bucket."""
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                seeded_hash(F.concat_ws("_", *[p.cast("string") for p in parts]), f"band{b}:").alias("band_hash"),
            )
        )
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")
    a = banded.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    n_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline with exact-Jaccard verification."""
    sig = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k)
    cand = lsh_candidate_pairs(sig, id_col, bands, n_hashes // bands)
    sh = sig.select(F.col(id_col), "shingles")
    pairs = (
        cand.join(sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")), "id_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard(
    pairs: DataFrame,
    text_a: str = "text_a",
    text_b: str = "text_b",
    k: int = 3,
) -> DataFrame:
    """Exact k-gram Jaccard for explicit text pairs."""
    sa = word_shingles(F.lower(F.col(text_a)), k)
    sb = word_shingles(F.lower(F.col(text_b)), k)
    jac = F.size(F.array_intersect(sa, sb)) / F.size(F.array_union(sa, sb))
    return pairs.withColumn("jaccard", F.round(jac, 4))


def contaminated_ids(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Ids of train docs sharing ANY k-word shingle with the test corpus —
    the n-gram decontamination check every pretraining pipeline runs before
    evaluation (published practice: overlap-based test-set decontamination;
    public knowledge, no reference-repo counterpart). Conservative by
    construction: one shared shingle flags the doc.

    100-TB shape: the test side is the small side — its DISTINCT shingle set
    is broadcast, so the train side is one scan + broadcast semi-join +
    distinct on the flagged ids (no shuffle of train text). For a test set
    too big to broadcast, drop the hint and let AQE pick the join."""
    test_grams = (
        test.select(F.explode(word_shingles(F.lower(F.col(text_col)), k)).alias("g"))
        .distinct()
    )
    return (
        train.select(
            F.col(id_col),
            F.explode(word_shingles(F.lower(F.col(text_col)), k)).alias("g"),
        )
        .join(F.broadcast(test_grams), "g", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Remove every train doc flagged by ``contaminated_ids`` (anti-join)."""
    return train.join(contaminated_ids(train, test, text_col, id_col, k), id_col, "left_anti")


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Collapse a near-dup pair graph into duplicate clusters: returns
    ``(node_id, cluster_rep)`` for every node appearing in ``pairs``, where
    ``cluster_rep`` is the component-wide MINIMUM id (deterministic under any
    partitioning).

    This is the end-stage every dedup pipeline needs after pair generation
    (minhash-LSH / simhash / embedding near-dup all emit PAIRS; keep-one-per-
    cluster needs the transitive closure): the alternating large-star /
    small-star connected-components algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014 — public knowledge; no
    reference-repo counterpart), expressed as pure DataFrame rounds:

    * large-star: every node links its LARGER neighbors to the minimum of
      its neighborhood (including itself).
    * small-star: every node links its smaller-or-equal neighbors (and
      itself) to that minimum.

    Both emit canonically oriented (child > parent) edges, so each round is
    a groupBy(min) + same-key join + distinct — O(E) shuffle volume keyed by
    node id, no driver-side graph state. Converges to star graphs rooted at
    the component min in O(log n) rounds (pinned by a chain-graph round-count
    test); a path graph under naive min-propagation would need O(n).

    100-TB shape: per-round cost is bounded by the CURRENT edge set, which
    only shrinks (stars replace paths); ``localCheckpoint`` truncates lineage
    each round — without it the plan doubles per iteration and the final
    round replays every prior one. On a real cluster prefer
    ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for
    executor-loss resilience; localCheckpoint is the single-node stand-in.
    Raises ``RuntimeError`` if not converged within ``max_iterations``.
    Convergence is detected by a checksum-grade statistic (count +
    bit_xor + decimal-sum of xxhash64 over the canonical edge set), so a
    partially-merged clustering can escape only via a two-statistic
    64-bit hash coincidence at equal cardinality (~2^-128 per round) —
    a checksum bound, not a certainty.
    """
    def edge_stats(e: DataFrame) -> tuple:
        # ONE action per round: the fixpoint test compares (count,
        # xor-of-row-hashes, decimal-sum-of-row-hashes) of two DISTINCT
        # canonical edge sets instead of running a count job plus a full
        # exceptAll anti-join job (two passes over E per round, round 5).
        # Set equality follows from stat equality up to an xxhash64
        # coincidence across two independent 64-bit statistics at equal
        # cardinality (~2^-128 per round) — a checksum-grade bound for a
        # convergence check. decimal(38,0) sum: ANSI mode would overflow a
        # BIGINT sum of ±2^63 hashes at any realistic edge count.
        h = F.xxhash64("u", "v")
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(h).alias("hx"),
            F.sum(h.cast("decimal(38,0)")).alias("hs"),
        ).head()
        return (row["n"], row["hx"], row["hs"])

    edges = (
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    stats = edge_stats(edges)
    if stats[0] == 0:
        return edges.select(F.col("u").alias("node_id"), F.col("v").alias("cluster_rep"))

    for _ in range(max_iterations):
        # large-star: group the SYMMETRIZED neighborhood by u; m = min(Γ(u) ∪
        # {u}); emit (v, m) for v > u. child v > u >= m keeps edges canonical.
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            sym.join(lmins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star on canonical edges: Γ(u) is exactly the smaller
        # neighbors; emit (v, m) for v ∈ Γ(u) ∪ {u} \ {m} with m = min Γ(u)
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        new_edges = (
            large.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        new_stats = edge_stats(new_edges)
        converged = new_stats == stats
        edges, stats = new_edges, new_stats
        if converged:
            # fixpoint = disjoint stars: (child, component-min) edges
            return edges.select(
                F.col("u").alias("node_id"), F.col("v").alias("cluster_rep")
            ).union(
                edges.select(
                    F.col("v").alias("node_id"), F.col("v").alias("cluster_rep")
                ).distinct()
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds; "
        "the alternating algorithm needs O(log n) — inspect the pair graph "
        "for pathological inputs or raise max_iterations"
    )


def dedup_survivors(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep exactly one doc per duplicate cluster — the cluster representative
    (component-min id from ``connected_components``) — plus every doc that
    never appeared in a pair. An anti-join against the non-representative
    members: output-bound, no full-table shuffle of ``df`` itself."""
    drop = components.filter(F.col("node_id") != F.col("cluster_rep")).select(
        F.col("node_id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Line-level exact dedup (the C4 / RefinedWeb cleaning step — public
    practice): ALL occurrences of any line whose exact content appears
    >= ``min_count`` times corpus-wide are dropped (boilerplate navigation,
    cookie banners, repeated headers), and each doc's surviving lines are
    reassembled IN ORDER. Returns ``df`` plus ``cleaned_text``,
    ``n_removed_lines`` and ``n_kept_lines``.

    Differs from ``exact_dedup`` (doc grain, keeps one copy) and
    ``duplicate_spans`` (token-window grain, tokenizer-defined): the unit
    is the verbatim line, and no copy survives.

    100-TB shape: one posexplode to (id, pos, xxhash64(line)) events —
    line STRINGS are hashed immediately so only 24B rows shuffle; one
    map-side-combined groupBy(hash) count; one anti-join of events against
    the duplicated-hash set (shuffle — the hash set is corpus-sized on
    boilerplate-heavy crawls, so no broadcast hint; AQE may still convert
    when it measures small); one doc-keyed reassembly whose collect_list
    is bounded by lines-per-doc. The line text survives only on the events
    that win the anti-join, carried (not re-derived) into the reassembly.
    The final join back to ``df`` restores docs that lost every line
    (cleaned_text = '') — and is the same doc-keyed partitioning the
    reassembly just produced. xxhash64 collisions can only over-drop a
    line; the DuckDB mirror counts line STRINGS, so test-scale hash checks
    also certify collision absence."""
    # F.split takes a REGEX; array_join re-joins literally — quote the
    # separator so a sep like '. ' splits on the literal string, not on
    # "any char + space". \\Q..\\E is Java's Pattern.quote, and like
    # Pattern.quote the embedded sequence \\E must be escaped per segment
    # (a separator containing literal \\E would otherwise terminate the
    # quote early and mis-split or throw)
    sep_re = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_re, -1)).alias("_pos", "_line"),
    ).withColumn("_lh", F.xxhash64("_line"))
    dup = lines.groupBy("_lh").count().filter(F.col("count") >= min_count)
    kept = lines.join(dup, "_lh", "anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            sep,
        ).alias("cleaned_text"),
        F.count("*").alias("n_kept_lines"),
    )
    # NULL text: the explode emitted nothing, and size(split(NULL)) is -1
    # under Spark's legacy default — pin (kept, removed) = (0, 0)
    n_lines = F.when(
        F.col(text_col).isNull(), F.lit(0)
    ).otherwise(F.size(F.split(F.col(text_col), sep_re, -1)))
    return (
        df.join(rebuilt, id_col, "left")
        .withColumn("cleaned_text", F.coalesce("cleaned_text", F.lit("")))
        .withColumn(
            "n_kept_lines", F.coalesce("n_kept_lines", F.lit(0)).cast("int")
        )
        .withColumn(
            "n_removed_lines", (n_lines - F.col("n_kept_lines")).cast("int")
        )
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Substring-level duplicate detection (Lee et al. 2022, public method):
    every maximal token span made of rolling k-token grams whose content
    occurs >= ``min_count`` times in the WHOLE corpus — across documents or
    repeated within one (``count(*)`` over occurrences, not distinct docs,
    matching the paper's "any substring occurring twice" rule).

    Tokens are the raw single-space split of ``text_col`` (NOT lowercased:
    substring dedup is exact-match by definition, and positions must index
    the reconstructable token array — empty tokens from double spaces count,
    the engine-wide F4 parity rule). Docs under k tokens emit no grams and
    therefore no spans (no whole-text fallback here, unlike ``ngram_list``).

    Returns one row per maximal span: (id_col, span_start, span_end,
    span_tokens), positions 1-based and END-INCLUSIVE (F.slice convention,
    = DuckDB ``w[s:e]``). A flagged gram at position p covers tokens
    [p, p+k-1]; overlapping OR adjacent flagged windows merge into one span
    (gaps-and-islands over a running max-end window), so spans never overlap
    and ``span_tokens`` sums are exact removal counts.

    100-TB shape: (1) one projection explodes docs into (id, pos, xxhash64
    of the gram string) events — corpus-token-count rows of 24B each, no
    strings survive the explode; (2) one groupBy(ghash) count with map-side
    combine (grams repeat heavily — that is the point) produces the
    duplicated-hash set; (3) one shuffle semi-join flags event positions
    (the duplicated-hash side is NOT broadcast: on boilerplate-heavy web
    corpora it is corpus-sized); (4) the span merge windows + aggregates on
    id_col — one doc-keyed shuffle, and the groupBy(id, island) reuses the
    window's HashPartitioning(id) so it adds no exchange. Nothing is
    O(N^2); the only quadratic-looking cost is the duplicated-position
    mass, which is the answer's own size. 64-bit gram-hash collisions can
    over-flag a span (never corrupt positions); the DuckDB mirror groups
    the gram STRINGS, so the sf0.01 hash check also certifies collision
    absence at test scale."""
    grams = bind_array(
        F.split(F.col(text_col), " ", -1),
        lambda w: F.when(
            F.size(w) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - k + 1),
                lambda i: F.xxhash64(F.array_join(F.slice(w, i, k), " ")),
            ),
        ).otherwise(F.array().cast("array<bigint>")),
    )
    events = df.select(F.col(id_col), F.posexplode(grams).alias("_p0", "ghash")).select(
        id_col, (F.col("_p0") + 1).alias("pos"), "ghash"
    )
    dup_hashes = events.groupBy("ghash").count().filter(F.col("count") >= min_count)
    flagged = events.join(dup_hashes, "ghash", "semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + (k - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.col("pos") > F.coalesce(prev_end, F.lit(-k)) + 1
    flagged = flagged.withColumn(
        "island",
        F.sum(new_island.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return flagged.groupBy(id_col, "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (k - 1)).alias("span_end"),
    ).select(
        id_col,
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every token inside a duplicate span (ALL occurrences go — the
    Lee et al. 2022 removal rule; keeping "the first" would need a global
    total order over occurrences, which the paper also declines). Adds
    ``cleaned_text`` (single-space re-join of surviving tokens),
    ``n_dup_spans`` and ``dup_tokens``; docs with no spans pass through
    verbatim (cleaned_text == text).

    Pure per-doc projection after one doc-keyed join: the span list is
    collect_list-bounded by spans-per-doc (spans are maximal and disjoint,
    so at most n_tokens/k of them), and the token filter is a JVM higher-
    order function over the split array — the index-aware two-arg
    ``F.filter`` lambda (exact arity per CLAUDE.md), no Python, no re-scan
    of the gram space."""
    span_lists = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    words = F.split(F.col(text_col), " ", -1)

    def _keep(w_: Column, i: Column) -> Column:
        # two-arg F.filter lambda (element, 0-based index) — exact arity
        flagged = F.exists(
            F.col("_spans"),
            lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
        )
        return ~F.coalesce(flagged, F.lit(False))

    kept = F.filter(words, _keep)
    return (
        df.join(span_lists, id_col, "left")
        .withColumn("cleaned_text", F.array_join(kept, " "))
        .withColumn(
            # NOT coalesce(size(...)): size(NULL) is -1 under Spark's
            # legacy default, never NULL — test against the null array
            "n_dup_spans",
            F.when(F.col("_spans").isNull(), F.lit(0))
            .otherwise(F.size("_spans"))
            .cast("int"),
        )
        .withColumn(
            "dup_tokens",
            F.coalesce(
                F.aggregate(
                    "_spans",
                    F.lit(0),
                    lambda a, s: a + (s["span_end"] - s["span_start"] + 1),
                ),
                F.lit(0),
            ).cast("int"),
        )
        .drop("_spans")
    )


def simhash(text_lc: Column, bits: int = 16) -> Column:
    """b-bit simhash: per-word hash, each bit voted +1/-1 by all words.
    The per-word hash array is bound once (bind_array): the ``bits``
    separate vote folds would otherwise each re-split AND re-hash every
    word — ``bits`` full md5 passes per row instead of one."""

    def bit_vote(j: int):
        # factory: F.aggregate's merge lambda must take EXACTLY two params
        return lambda a, h: a + (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1)

    def votes(hashes: Column) -> Column:
        acc = F.lit(0).cast("long")
        for j in range(bits):
            vote = F.aggregate(hashes, F.lit(0).cast("long"), bit_vote(j))
            acc = acc + F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0))
        return acc

    return bind_array(
        F.transform(F.split(text_lc, " ", -1), lambda x: seeded_hash(x, "sim:")),
        votes,
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    max_hamming: int = 2,
) -> DataFrame:
    """Pairs within a Hamming radius; blocked on simhash halves so each side
    of the join only meets candidates sharing an exact half (a radius<=
    bits/2 guarantee at 2 blocks; increase blocks for larger radii)."""
    half = bits // 2
    s = df.select(F.col(id_col), simhash(F.lower(F.col(text_col)), bits).alias("sh"))
    blocked = s.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("blk"), (F.col("sh") % (1 << half)).alias("key")),
                F.struct(F.lit(1).alias("blk"), F.shiftright("sh", half).alias("key")),
            )
        ).alias("b"),
    ).select(id_col, "sh", "b.blk", "b.key")
    a = blocked.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"), "blk", "key")
    b = blocked.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), "blk", "key")
    return (
        a.join(b, ["blk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
