"""Date/time operators T1-T8 (SURVEY.md §2.9) as built-in Spark columns.

Reproduces the reference's study-day identity rules
(mindlamp_accounting.py:113-124):

* epoch -> per-conv local time (``from_utc_timestamp`` with a tz COLUMN),
* study day = days since consent + 1, consent day = day 1,
* the 4am day-shift rule: submissions before 04:00 local belong to the
  previous study day, and hours 0-3 become 24-27 (``submit_hour_int`` in
  [4, 27]),
* DPDash weekday convention ``((python_weekday + 2) % 7) + 1`` with the same
  pre-4am wrap (Spark's dayofweek is Sun=1..Sat=7, so the equivalent formula
  is ``(dayofweek % 7) + 1``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def local_ts(ts: Column, tz: Column) -> Column:
    """T1: UTC timestamp -> wall-clock time in the conv's IANA timezone."""
    return F.from_utc_timestamp(ts, tz)


def with_day_assignment(
    df: DataFrame,
    ts_col: str = "session_start",
    tz_col: str = "timezone",
    consent_col: str = "consent_date",
    day_shift_hour: int = 4,
) -> DataFrame:
    """Attach local_time / day / submit_hour_int / weekday / timeofday /
    subject_consent_month columns (T1-T4, T7)."""
    lts = local_ts(F.col(ts_col), F.col(tz_col))
    literal_day = F.datediff(F.to_date(lts), F.col(consent_col)) + 1
    hour = F.hour(lts)
    pre_shift = hour < day_shift_hour
    weekday_raw = (F.dayofweek(lts) % 7) + 1  # DPDash convention, T4
    return df.withColumns(
        {
            "local_time": lts,
            "timeofday": F.date_format(lts, "HH:mm:ss"),
            "day": F.when(pre_shift, literal_day - 1).otherwise(literal_day).cast("int"),
            "submit_hour_int": F.when(pre_shift, hour + 24).otherwise(hour).cast("int"),
            "submit_minute_int": F.minute(lts).cast("int"),
            "weekday": F.when(
                pre_shift, F.when(weekday_raw > 1, weekday_raw - 1).otherwise(F.lit(7))
            )
            .otherwise(weekday_raw)
            .cast("int"),
            "subject_consent_month": F.date_format(F.col(consent_col), "MM/yyyy"),
        }
    )


def proposed_processed_name(conv: Column, day: Column, sub: Column) -> Column:
    """F2: zero-padded canonical diary name (mindlamp_accounting.py:147)."""
    return F.format_string("%s_audioJournal_day%04d_submission%d.wav", conv, day, sub)
