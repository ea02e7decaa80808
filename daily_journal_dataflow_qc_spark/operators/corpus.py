"""End-to-end training-corpus preparation: the standard pretraining data
pipeline (public practice: quality gate -> exact dedup -> near-dup cluster
resolution -> test-set decontamination -> split -> sequence packing),
expressed entirely as a composition of this package's operators so one call
yields the doc-grain training assignments.

Every stage is the already-scale-evidenced operator (see
BENCH/BASELINE.md): the chain adds NO new shuffle shapes of its own —
its cost is the sum of its stages, and each stage's 100-TB story is
documented where the stage lives.

Stage order is deliberate and matters:

0. (opt-in) line-level boilerplate removal on RAW text — before quality,
   or repeated nav/banner lines drag real pages under the gate;
1. quality/repetition gate FIRST among the always-on stages — cheapest
   per row (pure projection), so every later stage sees fewer rows;
   (opt-in) substring-level span removal runs after exact dedup (2b) —
   on un-deduped text every span of a verbatim copy flags itself;
2. exact dedup before near-dup — verbatim copies would otherwise inflate
   every LSH bucket by their multiplicity;
3. near-dup cluster resolution (minhash-LSH pairs -> connected components
   -> one survivor per cluster);
4. decontamination AFTER dedup — flags are per-content, so deduping first
   avoids re-flagging the same text many times;
5. split BEFORE packing, and packing groups by split — a training sequence
   must never mix train/val/test docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    connected_components,
    decontaminate,
    dedup_lines,
    dedup_survivors,
    duplicate_spans,
    exact_dedup,
    near_dup_pairs,
    remove_duplicate_spans,
)
from .packing import pack_sequences
from .sampling import hash_split
from .textanalysis import with_text_analysis


def prepare_corpus(
    docs: DataFrame,
    test_corpus: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.66,
    max_top_2gram: float = 0.5,
    near_dup_threshold: float = 0.7,
    decontam_k: int = 8,
    max_tokens: int = 2048,
    n_shards: int = 64,
    split_weights: dict[str, float] | None = None,
    line_dedup: bool = False,
    substring_dedup: bool = False,
    substring_k: int = 50,
) -> DataFrame:
    """Run the full preparation chain and return one row per SURVIVING doc:
    ``(id, n_tokens, split, pack_shard, pack_bin, pack_pos)``.

    ``test_corpus`` (optional) is the evaluation set to decontaminate
    against; when None the decontamination stage is skipped.
    ``decontam_k`` defaults to 8-word grams — the published practice uses
    8-13 (a 3-gram default over-flags: any common phrase contaminates).

    NB docs under 2 words always fail the repetition gate: the whole-text
    gram fallback makes their ``top_2gram_frac`` exactly 1.0 — deliberate
    (single-token rows are not training material); raise ``max_top_2gram``
    to 1.0 to keep them.

    ``line_dedup`` (opt-in) runs the C4/RefinedWeb line-level boilerplate
    removal FIRST, on raw text — the published order: boilerplate must go
    before quality is scored, or nav/banner lines drag real pages under the
    gate — preceded by an exact dedup so verbatim doc copies collapse to
    one survivor instead of erasing each other's every line. ``substring_dedup`` (opt-in) removes repeated >=``substring_k``-
    token spans (Lee et al. 2022; 50 is the paper's threshold) AFTER exact
    dedup — verbatim copies would flag every span of themselves — and
    recomputes ``n_tokens`` from the surviving text so packing bins track
    what will actually be trained on; docs whose text is entirely
    duplicated spans drop out."""
    # 0. (opt-in) line-level boilerplate removal on raw text. Exact dedup
    # runs FIRST here (content-keyed, so banner lines don't affect it):
    # dedup_lines drops ALL copies of a repeated line, so two verbatim
    # deliveries of one doc would otherwise erase each other's every line
    # — the same self-flagging hazard substring_dedup avoids by ordering
    # after exact dedup. Stage 2's exact_dedup stays (idempotent, and the
    # line cut can only merge texts that were already line-identical).
    if line_dedup:
        docs = exact_dedup(docs, text_col, id_col)
        docs = (
            dedup_lines(docs, text_col, id_col)
            .filter(F.col("n_kept_lines") > 0)
            .drop(text_col, "n_removed_lines", "n_kept_lines")
            .withColumnRenamed("cleaned_text", text_col)
        )

    # 1. quality + repetition gate (pure projections; with_text_analysis
    # already includes repetition_metrics — no double gram construction)
    scored = with_text_analysis(docs, text_col)
    kept = scored.filter(
        (F.col("quality_score") >= min_quality)
        & (F.col("top_2gram_frac") <= max_top_2gram)
    ).select(id_col, text_col, F.col("ws_tokens").alias("n_tokens"))

    # 2. exact dedup (content-hash groupBy, min-id survivor)
    kept = exact_dedup(kept, text_col, id_col)

    # 2b. (opt-in) substring-level dedup on the exact-deduped corpus;
    # n_tokens is recomputed from the cleaned text (same whitespace rule
    # as ws_tokens) so downstream packing budgets the surviving tokens
    if substring_dedup:
        spans = duplicate_spans(kept, text_col, id_col, k=substring_k)
        kept = (
            remove_duplicate_spans(kept, spans, text_col, id_col)
            .filter(F.col("cleaned_text") != "")
            # surviving count is exact arithmetic: spans index the same
            # single-space token array ws_tokens counts, and the join/
            # re-split round-trips it — no second scan of the text
            .withColumn(
                "n_tokens",
                (F.col("n_tokens") - F.col("dup_tokens")).cast("long"),
            )
            .drop(text_col, "n_dup_spans", "dup_tokens")
            .withColumnRenamed("cleaned_text", text_col)
        )

    # 3. near-dup cluster resolution: LSH pairs -> components -> survivors
    pairs = near_dup_pairs(kept, text_col, id_col, threshold=near_dup_threshold)
    comps = connected_components(pairs.select("id_a", "id_b"))
    kept = dedup_survivors(kept, comps, id_col)

    # 4. n-gram decontamination against the evaluation corpus
    if test_corpus is not None:
        kept = decontaminate(kept, test_corpus, text_col, id_col, k=decontam_k)

    # 5. leakage-safe split, then 6. packing grouped by split so no
    # training sequence mixes splits
    split = hash_split(kept, id_col, weights=split_weights)
    packed = pack_sequences(
        split, max_tokens, n_shards=n_shards, id_col=id_col, group_cols=["split"]
    )
    return packed.select(
        id_col, "n_tokens", "split", "pack_shard", "pack_bin", "pack_pos"
    )
