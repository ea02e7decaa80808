"""S1/S2: nested activity-JSON scan -> classified records.

Graft of the reference's MindLAMP accounting scan
(mindlamp_accounting.py:71-108): each input value is a JSON ARRAY of
activity objects; an object with ``static_data.url`` is a diary record,
an object with ``static_data`` but no url is an EMA record, anything else
is unrecognized. Produces both the per-file accounting row
(*_appActivitiesJSONAccounting.csv shape) and the exploded per-diary rows.

Implemented with ``from_json`` + ``explode`` (JVM-side, streamable); the
incremental "new files only" behavior (S2) is native to streaming sources /
a left_anti join against the processed log in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ACTIVITY_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("timestamp", T.LongType(), True),  # epoch millis
            T.StructField(
                "static_data",
                T.StructType([T.StructField("url", T.StringType(), True)]),
                True,
            ),
            T.StructField("duration", T.LongType(), True),
        ]
    )
)


def parse_activity_json(
    df: DataFrame, json_col: str = "payload", file_col: str = "json_filename"
) -> DataFrame:
    """Exploded activity records with diary/EMA classification."""
    parsed = df.withColumn("_recs", F.from_json(F.col(json_col), ACTIVITY_SCHEMA))
    rec = F.explode_outer("_recs").alias("rec")
    out = parsed.select(file_col, rec)
    return out.select(
        file_col,
        F.col("rec.timestamp").alias("unix_timestamp"),
        F.col("rec.static_data.url").alias("json_logged_sound_number"),
        F.when(F.col("rec.timestamp").isNull(), "missing_timestamp")
        .when(F.col("rec.static_data").isNull(), "unrecognized")
        .when(F.col("rec.static_data.url").isNotNull(), "diary")
        .otherwise("ema")
        .alias("record_kind"),
        F.timestamp_millis(F.col("rec.timestamp")).alias("ts"),
    )


def accounting_rows(records: DataFrame, file_col: str = "json_filename") -> DataFrame:
    """Per-file accounting (mindlamp_accounting.py:104-108 shape)."""
    return records.groupBy(file_col).agg(
        F.sum(F.when(F.col("record_kind") != "missing_timestamp", 1).otherwise(0))
        .cast("long")
        .alias("number_of_records"),
        F.sum(F.when(F.col("record_kind") == "diary", 1).otherwise(0))
        .cast("long")
        .alias("diary_records_count"),
        F.sum(F.when(F.col("record_kind") == "ema", 1).otherwise(0))
        .cast("long")
        .alias("ema_records_count"),
    )


# P7: MP3-name structural validation (mindlamp_accounting.py:160)
def mp3_name_valid(name_col, site_col):
    parts = F.split(name_col, "_", -1)
    datestamp = F.split(F.split(name_col, "activity_", -1).getItem(1), "_sound", -1).getItem(0)
    return (
        F.substring(name_col, 1, 1).eqNullSafe("U")
        & (F.size(parts) == 8)
        & (parts.getItem(1) == site_col)
        & (parts.getItem(2) == F.lit("activity"))
        & (parts.getItem(6) == F.lit("sound"))
        & (F.length(datestamp) == 10)
    )
