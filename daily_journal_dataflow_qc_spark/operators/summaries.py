"""Server-wide summary rollups (reference stage 3).

Graft of generate_server_wide_diary_summary_csvs.py over the engine's
accepted-diaries output: per-conversation and per-group (site) engagement
summaries. The reference's clip(upper=1)-then-sum "any" semantics (A5),
first/last submit days (A6), and two-week-window rates (A7) are preserved;
"site" generalizes to any grouping expression (here: a conv_id prefix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def participation_timecourse(accepted: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Weekly-monitoring participation timecourse (graft of
    create_shareable_visualizations.py:730-749 get_timecourse_dfs_helper).

    For every study day 1..max(study_day_at_compute_time):

    * ``total_subjects_reached_day`` — subjects whose study day at compute
      time is >= that day (the reference's reversed counting_list loop ==
      a reverse cumulative count over the study-day distribution: W6 over
      descending day, O(distinct days), never a per-subject explode),
    * ``total_accepted_diaries_submitted_on_day`` — accepted diaries whose
      study day equals it (outer-merge + fillna(0) semantics),
    * ``current_response_rate`` = diaries / reached,
    * rolling(7) mean / sample stdev of the rate with the pandas null head
      (rows 1-6 are NULL, min_periods == window).

    The day spine is a 1-row sequence+explode — bounded by study length
    (days, not data volume), so it broadcast-joins at any scale.
    """
    conv = conv_level_summary(accepted, cfg)
    per_day_subjects = conv.groupBy(
        F.col("study_day_at_compute_time").cast("long").alias("day")
    ).agg(F.count("*").alias("_n_subj"))
    spine = (
        conv.agg(F.max("study_day_at_compute_time").cast("long").alias("_max_day"))
        .select(F.explode(F.sequence(F.lit(1).cast("long"), F.col("_max_day"))).alias("day"))
    )
    w_desc = Window.orderBy(F.desc("day")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    reached = (
        spine.join(per_day_subjects, "day", "left")
        .withColumn(
            "total_subjects_reached_day",
            F.sum(F.coalesce(F.col("_n_subj"), F.lit(0))).over(w_desc),
        )
        .drop("_n_subj")
    )
    diaries_per_day = (
        accepted.filter(F.col("conv_id").isNotNull() & F.col("day").isNotNull())
        .groupBy(F.col("day").cast("long").alias("day"))
        .agg(F.count("*").alias("_n_diaries"))
    )
    acct = (
        reached.join(diaries_per_day, "day", "left")
        .withColumn(
            "total_accepted_diaries_submitted_on_day",
            F.coalesce(F.col("_n_diaries"), F.lit(0)),
        )
        .drop("_n_diaries")
        .filter(F.col("total_subjects_reached_day") > 0)
        .withColumn(
            "current_response_rate",
            F.col("total_accepted_diaries_submitted_on_day")
            / F.col("total_subjects_reached_day").cast("double"),
        )
    )
    w_day = Window.orderBy("day")
    w_roll = w_day.rowsBetween(-6, 0)
    gate = F.row_number().over(w_day) >= 7
    return acct.withColumns(
        {
            "rolling_mean_week_window_daily_response_fraction_eligible_subjects": F.when(
                gate, F.avg("current_response_rate").over(w_roll)
            ),
            "weekly_response_stdev_rolling": F.when(
                gate, F.stddev_samp("current_response_rate").over(w_roll)
            ),
        }
    )


def fixed_bin_histogram(
    df: DataFrame, feature: str, edges: list[float]
) -> DataFrame:
    """A9 fixed-bin histogram with the reference's predefined-bin semantics
    (create_shareable_visualizations.py:64-99,379-418): bins follow
    np.histogram — ``[e_i, e_{i+1})`` upper-edge exclusive except the LAST
    bin which includes its upper edge — and values strictly outside
    ``[e_0, e_last]`` are rolled into one out-of-range row (``bin_idx`` -1,
    the "N outside of range" axis label).

    The CASE chain is a pure JVM projection (edges are plan literals), so
    the whole histogram is one map-side-combinable groupBy.
    """
    v = F.col(feature).cast("double")
    expr = F.when(v.isNull() | (v < edges[0]) | (v > edges[-1]), F.lit(-1))
    for i in range(len(edges) - 2):
        expr = expr.when((v >= edges[i]) & (v < edges[i + 1]), F.lit(i))
    expr = expr.otherwise(F.lit(len(edges) - 2))
    lo = F.array(*[F.lit(float(e)) for e in edges[:-1]])
    hi = F.array(*[F.lit(float(e)) for e in edges[1:]])
    return (
        df.select(expr.cast("long").alias("bin_idx"))
        .groupBy("bin_idx")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit(feature).alias("feature"),
            "bin_idx",
            F.when(F.col("bin_idx") >= 0, F.element_at(lo, F.col("bin_idx").cast("int") + 1)).alias("bin_lo"),
            F.when(F.col("bin_idx") >= 0, F.element_at(hi, F.col("bin_idx").cast("int") + 1)).alias("bin_hi"),
            "n",
        )
    )


def email_summary_tables(
    site_summary: DataFrame, activity_site_summary: DataFrame
) -> DataFrame:
    """The Monday email's content tables as one relational row set per site
    (graft of finalize_server_summary_email_html.py:26-56, HTML rendering
    intentionally skipped — the deliverable is the data frame the reference
    embeds, with its exact display column names).

    * rows with null minutes/file counts are dropped (dropna how='any'),
    * sites whose pipeline never launched (no active-app subjects) are
      dropped,
    * ``Site`` is the last two characters of the site code.

    Both inputs are site-grain (hundreds of rows) — the join broadcasts.
    """
    act = activity_site_summary.select(
        "site",
        "num_subjects_found",
        "num_subjects_any_active_app",
        "num_subjects_any_ema",
        "num_subjects_any_journal",
    )
    df = site_summary.drop("num_subjects_any_journal").join(
        F.broadcast(act), "site", "inner"
    )
    df = df.filter(
        F.col("sum_minutes_audio_uploaded").isNotNull()
        & F.col("num_audio_files_uploaded").isNotNull()
        & (F.col("num_subjects_any_active_app") > 0)
    )
    return df.select(
        F.substring(F.col("site"), -2, 2).alias("Site"),
        F.col("num_audio_files_uploaded")
        .cast("long")
        .alias("Total Successful Audio Journal Submissions"),
        F.col("sum_minutes_audio_uploaded").alias(
            "Sum Minutes Uploaded to TranscribeMe"
        ),
        F.col("num_subjects_found").cast("long").alias("Subject IDs Found"),
        F.col("num_subjects_any_ema")
        .cast("long")
        .alias("Subjects Submitting EMAs (>=1)"),
        F.col("num_subjects_any_journal")
        .cast("long")
        .alias("Subjects Submitting Journals (>=1)"),
        F.col("num_subjects_submit_within_last_two_weeks")
        .cast("long")
        .alias("Subjects Recording a Journal in Last 2 Weeks"),
    )
