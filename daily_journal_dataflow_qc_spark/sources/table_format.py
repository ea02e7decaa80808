"""Table-format dispatch for the transcript / tool-call sources.

The north-star deployment reads an ICEBERG table of multi-turn transcripts;
this sandbox ships no iceberg-spark-runtime, so local runs (and every test)
use a parquet directory as the stand-in — the engine's plans are identical
either way because both arrive as an ordinary DataFrame scan with the same
schema, pushed filters, and pruned columns.

Dispatch rule: a location WITHOUT a path separator but WITH a dot
(``db.transcripts``, ``catalog.db.transcripts``) is a catalog table —
``spark.read.table`` / ``spark.readStream.table`` — which is how an Iceberg
table is addressed on a cluster with the Iceberg catalog configured
(spark.sql.catalog.* + iceberg-spark-runtime on the classpath; streaming
reads get exactly-once file admission from Iceberg snapshots the same way
the FileStreamSource log provides it locally). Anything else is a parquet
directory path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# a separator-free name like ``data.parquet`` in the cwd is a relative FILE
# path, not a table identifier — never dispatch these to spark.read.table
_DATA_FILE_EXTS = {".parquet", ".csv", ".json", ".orc", ".avro", ".tsv", ".txt"}


def is_catalog_table(location: str) -> bool:
    if "/" in location or "\\" in location or "." not in location:
        return False
    if os.path.splitext(location)[1].lower() in _DATA_FILE_EXTS:
        return False
    # an existing local path always wins over the catalog interpretation
    return not os.path.exists(location)


def read_table(
    spark: SparkSession,
    location: str,
    schema: StructType,
    streaming: bool = False,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Batch or streaming scan of a transcripts-shaped source.

    * catalog table (Iceberg on a real cluster): schema comes from the
      catalog — the caller's ``schema`` is used only to validate the
      contract columns exist,
    * parquet directory (local stand-in): ``schema`` is applied explicitly
      (file streams require it; batch reads use it to avoid inference).

    ``options`` pass through to the reader (e.g. ``maxFilesPerTrigger`` for
    file-stream backpressure, or catalog-specific read options).
    """
    if is_catalog_table(location):
        rd = spark.readStream if streaming else spark.read
        if options:
            rd = rd.options(**options)
        df = rd.table(location)
        missing = [f.name for f in schema.fields if f.name not in df.columns]
        if missing:
            raise ValueError(
                f"table {location!r} is missing contract columns {missing}"
            )
        return df.select(*[f.name for f in schema.fields])
    reader = (
        spark.readStream.schema(schema) if streaming else spark.read.schema(schema)
    )
    if options:
        reader = reader.options(**options)
    return reader.parquet(location)
