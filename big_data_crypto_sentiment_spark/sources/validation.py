"""Magic-byte / gzip validation (SURVEY.md S6).

The reference sniffs downloaded batch files for the Avro magic
(`Obj\\x01`) or gzip magic (`\\x1f\\x8b`), decompresses gzip, and
re-validates before handing paths to Spark
(terraform/scripts/batch_to_mongo.py:60-106). Two forms here:

  * `sniff` / `validate_payload` — the pure-bytes logic (driver-side or
    anywhere).
  * `validate_dir` — distributed: `spark.read.format("binaryFile")`
    over the directory, validation as a mapInPandas over the payloads —
    at scale the files never pass through the driver.
"""

from __future__ import annotations

import gzip
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

AVRO_MAGIC = b"Obj\x01"
GZIP_MAGIC = b"\x1f\x8b"
PARQUET_MAGIC = b"PAR1"


def sniff(payload: bytes) -> str:
    if payload.startswith(AVRO_MAGIC):
        return "avro"
    if payload.startswith(GZIP_MAGIC):
        return "gzip"
    if payload.startswith(PARQUET_MAGIC):
        return "parquet"
    return "unknown"


def validate_payload(payload: bytes) -> tuple[str, bool]:
    """(detected format after decompression, is_valid). Gzip payloads are
    decompressed and re-sniffed, exactly like the reference's
    validate-decompress-revalidate loop; corrupt gzip → invalid."""
    kind = sniff(payload)
    if kind == "gzip":
        try:
            inner = gzip.decompress(payload)
        except OSError:
            return "gzip", False
        kind = sniff(inner)
        return kind, kind != "unknown"
    return kind, kind != "unknown"


VALIDATION_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("valid", T.BooleanType()),
])


def validate_dir(spark: SparkSession, path: str,
                 glob: str = "*") -> DataFrame:
    """Distributed validation of every file under `path`."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob).load(path))

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.content) if row.content is not None else b""
                fmt, ok = validate_payload(payload)
                out.append((row.path, len(payload), fmt, ok))
            yield pd.DataFrame(out, columns=[f.name for f in VALIDATION_SCHEMA])

    return files.select("path", "content").mapInPandas(check, VALIDATION_SCHEMA)
