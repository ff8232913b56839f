"""Table readers: document corpus, media payloads, path filtering.

Reference analogs: (W)ARC path filter ``.*arc\\.gz$``
(``utils/WarcPathFilter.java:12-14`` → ``pathGlobFilter``), non-splittable
archive input (``data/hadoop/ArchiveFileInputFormat.java:43-45`` →
``binaryFile`` source, which is likewise one-file-per-row), and the WARC
list scan (``ImageIndexerWithDupsJob.java:383-387``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_documents(
    spark: SparkSession, path: str, glob: str | None = None, columns: list[str] | None = None
) -> DataFrame:
    """Read an interleaved-documents parquet tree, optionally path-filtered.

    ``glob`` maps to ``pathGlobFilter`` (S8 — the WarcPathFilter analog);
    ``columns`` prunes the scan (Catalyst pushes the projection to parquet).
    """
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.parquet(path)
    return df.select(*columns) if columns else df


def read_media_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Opaque media payloads as binary rows (S3's non-splittable analog).

    Columns: path, modificationTime, length, content (binary) — feed into
    ``operators/multimodal`` kernels.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def read_url_list(spark: SparkSession, path: str, n_partitions: int | None = None) -> DataFrame:
    """S1: one URL per line, N lines per task (NLineInputFormat analog)."""
    df = spark.read.text(path).withColumnRenamed("value", "url")
    return df.repartition(n_partitions) if n_partitions else df
