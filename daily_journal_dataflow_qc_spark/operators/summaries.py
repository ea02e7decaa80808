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


def activity_engagement_summary(
    accounting: DataFrame,
    conv_col: str = "conv_id",
    group_expr: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """EMA / any-activity engagement (A5 full set): the reference's
    clip(upper=1)-then-sum chain over the per-file activity-JSON accounting
    rows (generate_server_wide_diary_summary_csvs.py:59-71).

    Input: one accounting row per (conv, json file ~ day) with
    ``ema_records_count`` / ``diary_records_count`` (sources.activity_json.
    accounting_rows output). Returns (per_conv, per_site):

    * per conv — num_days_any_activity_submit / num_days_ema_submit /
      num_days_journal_submit (day booleans summed),
    * per site — num_subjects_found plus num_subjects_any_active_app /
      num_subjects_any_ema / num_subjects_any_journal (subject booleans
      summed; the reference's folder-count num_subjects_found generalizes to
      the distinct convs seen in the accounting scan).
    """
    one = F.lit(1)
    per_file = accounting.select(
        F.col(conv_col).alias("conv_id"),
        F.least(F.col("ema_records_count"), one).alias("ema_day_bool"),
        F.least(F.col("diary_records_count"), one).alias("diary_day_bool"),
    ).withColumn(
        "active_day_bool",
        F.least(F.col("ema_day_bool") + F.col("diary_day_bool"), one),
    )
    per_conv = per_file.groupBy("conv_id").agg(
        F.sum("active_day_bool").cast("long").alias("num_days_any_activity_submit"),
        F.sum("ema_day_bool").cast("long").alias("num_days_ema_submit"),
        F.sum("diary_day_bool").cast("long").alias("num_days_journal_submit"),
    )
    site = group_expr if group_expr is not None else F.substring("conv_id", 1, 8)
    per_site = (
        per_conv.withColumn("_site", site)
        .groupBy("_site")
        .agg(
            F.count("*").cast("long").alias("num_subjects_found"),
            F.sum(F.least(F.col("num_days_any_activity_submit"), one))
            .cast("long")
            .alias("num_subjects_any_active_app"),
            F.sum(F.least(F.col("num_days_ema_submit"), one))
            .cast("long")
            .alias("num_subjects_any_ema"),
            F.sum(F.least(F.col("num_days_journal_submit"), one))
            .cast("long")
            .alias("num_subjects_any_journal"),
        )
        .withColumnRenamed("_site", "site")
    )
    return per_conv, per_site


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
    # M4 safe divide: a group with no post-two-week subjects yields NULL,
    # never a divide-by-zero (which ABORTS the job under Spark 4's default
    # ANSI mode — not just a NaN)
    base = base.withColumn(
        "fraction_diary_subjects_submit_after_two_weeks",
        F.when(
            F.col("_past2w") != 0,
            F.round(F.col("_past2w_submit") / F.col("_past2w"), 4),
        ),
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
            F.when(  # M4: young cohorts can have 0 accumulated weeks
                F.col("_num_weeks") != 0,
                F.round(F.col("_n_post") / F.col("_num_weeks"), 4),
            ),
        )
        .select("_site", "mean_accepted_diaries_per_subject_week_after_two_weeks")
    )
    return (
        base.join(post_mins, "_site", "left")
        .join(post_rate, "_site", "left")
        .join(pre_rate, "_site", "left")
        .withColumnRenamed("_site", "site")
    )
