"""Skew-breaking utilities (north-star: salted repartitioning on conv_id).

``salted_agg`` implements the two-phase salted aggregate: partial aggregation
on (key, salt) — which splits a hot key across ``salt_buckets`` reducers —
then a final merge on the key alone. Spark's hash aggregate already does
map-side partial combine, which covers most skew; the explicit salt is for
the pathological case where even a single reducer's worth of one key's
PARTIALS exceeds a task (e.g. 10^9-turn conversations at 10^12-turn scale),
or for aggregates without partial forms.

Only ALGEBRAIC aggregates can be salted (sum/count/min/max and anything
expressible as a merge of partials). The caller supplies both phases.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt_buckets: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregate: groupBy(keys + salt) -> groupBy(keys).

    partial_aggs: {out_col: agg over input columns}
    final_aggs:   {out_col: agg over the partial out_cols}
    """
    salt_src = F.col(salt_on) if salt_on else F.monotonically_increasing_id()
    salted = df.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(salt_buckets)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(name) for name, c in final_aggs.items()]
    )


def salted_turn_counts(turns: DataFrame, salt_buckets: int = 8) -> DataFrame:
    """Example instantiation: per-conv turn counts + word totals that survive
    a conversation owning an arbitrary fraction of the stream."""
    wc = F.size(F.split(F.col("text"), " ", -1))
    return salted_agg(
        turns.withColumn("_wc", wc),
        keys=["conv_id"],
        partial_aggs={
            "n_turns_p": F.count("*"),
            "words_p": F.sum("_wc"),
            "min_ts_p": F.min("ts"),
            "max_ts_p": F.max("ts"),
        },
        final_aggs={
            "n_turns": F.sum("n_turns_p").cast("long"),
            "total_words": F.sum("words_p").cast("long"),
            "first_ts": F.min("min_ts_p"),
            "last_ts": F.max("max_ts_p"),
        },
        salt_buckets=salt_buckets,
        salt_on="turn_idx",
    )
