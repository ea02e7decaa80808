"""Greedy sequence packing: assemble documents into fixed token-budget
training sequences.

The last mile of a pretraining pipeline: after filter/dedup/sample, docs
are concatenated into sequences of ~``max_tokens`` so the trainer sees
dense batches. True bin packing is sequential; the distributed-standard
compromise (public practice) is SHARDED GREEDY CONCAT: deterministically
shard docs by hash, order each shard by hash, and cut bins at cumulative
token boundaries. Everything is JVM window arithmetic — no Python, no
driver state — and the DuckDB oracle reproduces it bit-exactly.

Semantics (documented, not incidental):

* a doc belongs to ``bin = floor(tokens_before_it_in_shard / max_tokens)``,
  so a bin can OVERFLOW by at most one doc's tokens (the straddling doc is
  not split); docs longer than the budget take a bin of their own plus the
  overflow. Trainers truncate/wrap at tokenization time.
* ``pack_pos`` is the doc's position within its bin (concat order).
* determinism: ordering is (portable hash, id) — stable under any input
  partitioning, any engine.

100-TB shape: one shuffle keyed by ``pack_shard`` (pick ``n_shards`` ~
input-partition count so each window sort is task-sized; a single global
window would serialize the corpus through one task). The bin id is global:
``(shard, bin)`` pairs are disjoint by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import bind_array
from ..functions.hashing import seeded_hash
from ..functions.text_metrics import words


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 64,
    seed: str = "pack",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Annotate every row with ``pack_shard``, ``pack_bin`` (the training
    sequence it joins), and ``pack_pos`` (its concat position in the bin).
    ``group_cols`` prepend to the shard partitioning so bins never mix
    groups (e.g. ``["split"]`` keeps val docs out of train sequences);
    bin ids are then unique per (group, shard)."""
    if max_tokens < 1 or n_shards < 1:
        raise ValueError("pack_sequences: max_tokens and n_shards must be >= 1")
    grp = list(group_cols or [])
    h = seeded_hash(F.col(id_col).cast("string"), f"{seed}:")
    w = Window.partitionBy(*grp, "pack_shard").orderBy("_pack_h", id_col)
    cum_before = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    out = (
        df.withColumn("_pack_h", h)
        .withColumn("pack_shard", F.pmod("_pack_h", F.lit(n_shards)).cast("int"))
        .withColumn(
            "pack_bin", F.floor(cum_before / F.lit(max_tokens)).cast("int")
        )
    )
    wp = Window.partitionBy(*grp, "pack_shard", "pack_bin").orderBy(
        "_pack_h", id_col
    )
    return out.withColumn("pack_pos", F.row_number().over(wp).cast("int")).drop(
        "_pack_h"
    )


def chunk_structs(
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
) -> Column:
    """The chunk list of one document as a COLUMN: array of structs
    ``(t: chunk text, k: chunk token count)`` in chunk order —
    ``chunk_documents`` is exactly the posexplode of this. Exposed so
    doc-grain chunk AGGREGATES (count / token total / order-pinned digest)
    can be computed as a pure projection instead of explode -> groupBy ->
    join back (the chunk list never leaves the row that produced it)."""
    if max_tokens < 1 or overlap < 0 or overlap >= max_tokens:
        raise ValueError(
            "chunk_documents: need max_tokens >= 1 and 0 <= overlap < max_tokens"
        )
    step = max_tokens - overlap

    def chunks_of(w: Column) -> Column:
        n = F.size(w)
        # chunk starts 1, 1+step, ... — last start covers the tail once
        n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(step)), F.lit(1))
        starts = F.sequence(F.lit(1), (n_chunks - 1) * step + 1, F.lit(step))
        return F.transform(
            starts,
            lambda s: F.struct(
                F.array_join(F.slice(w, s, max_tokens), " ").alias("t"),
                F.least(F.lit(max_tokens), n - s + 1).alias("k"),
            ),
        )

    # token array bound once (bind_array): slicing it per chunk inside the
    # transform lambda would re-split the text per chunk
    return bind_array(words(F.col(text_col)), chunks_of)


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The dual of packing: SPLIT each doc into chunks of at most
    ``max_tokens`` whitespace tokens, carrying ``overlap`` tokens from the
    previous chunk (embedding/indexing prep — public RAG/retrieval
    practice). Output grain is (doc, chunk): ``chunk_idx`` (0-based),
    ``chunk_text``, ``chunk_tokens``; original case preserved; a doc
    shorter than the budget yields exactly one chunk of itself.

    NULL-text rows yield no chunks (filtered — a null chunk is useless to
    an embedder and would poison token aggregates).

    100-TB shape: pure projection + posexplode — per-row JVM array work,
    no shuffle, output rows ~ total_tokens / (max_tokens - overlap);
    chunk_tokens comes from the slice bounds (integer arithmetic), not a
    second scan of the chunk text."""
    chunks = chunk_structs(max_tokens, overlap, text_col)
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_c"))
        .select(
            id_col,
            "chunk_idx",
            F.col("_c.t").alias("chunk_text"),
            F.col("_c.k").cast("int").alias("chunk_tokens"),
        )
    )
