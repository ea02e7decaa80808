"""Server-wide summary rollups (reference stage 3).

Graft of generate_server_wide_diary_summary_csvs.py over the engine's
accepted-diaries output: per-conversation and per-group (site) engagement
summaries. The reference's clip(upper=1)-then-sum "any" semantics (A5),
first/last submit days (A6), and two-week-window rates (A7) are preserved;
"site" generalizes to any grouping expression (here: a conv_id prefix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig


def conv_level_summary(accepted: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Per-conv engagement (serverWide_subjectsLevel semantics,
    generate_server_wide_diary_summary_csvs.py:63-132)."""
    today = F.to_date(F.lit(cfg.compute_date_str))
    per_conv = accepted.groupBy("conv_id").agg(
        F.countDistinct("day").alias("num_days_journal_submit"),
        F.round(F.sum("length_minutes"), 3).alias("sum_minutes_audio_uploaded"),
        F.count("*").alias("num_audio_files_uploaded"),
        F.min("day").alias("first_submit_day"),
        F.max("day").alias("last_submit_day"),
        F.first("consent_date_at_accounting").alias("_consent"),
    )
    return (
        per_conv.withColumn(
            "study_day_at_compute_time",
            (F.datediff(today, F.to_date("_consent")) + 1).cast("int"),
        )
        .withColumn(
            "time_since_last_submit",
            (F.col("study_day_at_compute_time") - F.col("last_submit_day")).cast("int"),
        )
        .drop("_consent")
    )


def group_level_summary(
    accepted: DataFrame, cfg: PipelineConfig, group_expr: Column | None = None
) -> DataFrame:
    """Per-group rollup (serverWide_sitesLevel semantics,
    generate_server_wide_diary_summary_csvs.py:94-158): counts, minutes,
    two-week enrollment/submission windows, per-subject-week rates."""
    site = group_expr if group_expr is not None else F.substring("conv_id", 1, 8)
    conv = conv_level_summary(accepted, cfg).withColumn("_site", site)

    base = conv.groupBy("_site").agg(
        F.countDistinct("conv_id").alias("num_subjects_any_journal"),
        F.round(F.sum("sum_minutes_audio_uploaded"), 3).alias("sum_minutes_audio_uploaded"),
        F.sum("num_audio_files_uploaded").alias("num_audio_files_uploaded"),
        F.sum(F.when(F.col("study_day_at_compute_time") <= 14, 1).otherwise(0))
        .cast("long")
        .alias("num_subjects_within_first_two_weeks_of_enrollment"),
        F.sum(F.when(F.col("time_since_last_submit") <= 14, 1).otherwise(0))
        .cast("long")
        .alias("num_subjects_submit_within_last_two_weeks"),
        F.sum(F.when(F.col("study_day_at_compute_time") > 14, 1).otherwise(0)).alias("_past2w"),
        F.sum(
            F.when(F.col("last_submit_day") > 14, 1).otherwise(0)
        ).alias("_past2w_submit"),
    )
    base = base.withColumn(
        "fraction_diary_subjects_submit_after_two_weeks",
        F.round(F.col("_past2w_submit") / F.col("_past2w"), 4),
    ).drop("_past2w", "_past2w_submit")

    acc = accepted.withColumn("_site", site)
    post = acc.filter(F.col("day") > 14)
    pre = acc.filter(F.col("day") <= 14)
    post_mins = post.groupBy("_site").agg(
        F.round(F.avg("length_minutes"), 4).alias("mean_minutes_per_diary_after_two_weeks")
    )
    pre_rate = pre.groupBy("_site").agg(
        F.round(F.count("*") / F.countDistinct("conv_id"), 4).alias(
            "mean_accepted_diaries_per_subject_within_first_two_weeks"
        ),
        F.round(F.avg("length_minutes"), 4).alias("mean_minutes_per_diary_first_two_weeks"),
    )
    # diaries per subject-week past two weeks (:147-152): weeks so far =
    # ceil(study_day/7) - 2, summed over the group's post-2w subjects
    weeks = (
        conv.filter(F.col("study_day_at_compute_time").isNotNull())
        .withColumn("_weeks", F.ceil(F.col("study_day_at_compute_time") / 7.0) - 2)
        .join(post.select("conv_id").distinct(), "conv_id", "left_semi")
        .groupBy("_site")
        .agg(F.sum("_weeks").alias("_num_weeks"))
    )
    post_counts = post.groupBy("_site").agg(F.count("*").alias("_n_post"))
    post_rate = (
        post_counts.join(weeks, "_site", "inner")
        .withColumn(
            "mean_accepted_diaries_per_subject_week_after_two_weeks",
            F.round(F.col("_n_post") / F.col("_num_weeks"), 4),
        )
        .select("_site", "mean_accepted_diaries_per_subject_week_after_two_weeks")
    )
    return (
        base.join(post_mins, "_site", "left")
        .join(post_rate, "_site", "left")
        .join(pre_rate, "_site", "left")
        .withColumnRenamed("_site", "site")
    )
