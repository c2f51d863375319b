"""Schema'd file/JDBC readers — the engine's ingestion surface beyond the
HTTP JSON batch source (sources.json_api).

Rules encoded here (SURVEY.md §1.3):
- ALWAYS explicit StructType — never schema inference in production paths
  (inference is a full extra pass at 100 TB and type-unstable across days).
- Parquet is the default interchange (columnar, pushdown, vectorized);
  CSV/JSON are landing-zone formats that get rewritten to parquet bronze.
- JDBC reads partition on a numeric column so the scan parallelizes;
  a single-connection JDBC read is a driver bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """CSV with explicit schema; PERMISSIVE mode nulls malformed fields
    (the engine-wide lenient policy) instead of failing the batch."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Raw-asset ingestion for the multimodal path: Spark's ``binaryFile``
    source yields (path, modificationTime, length, content) with the
    payload as an opaque ``binary`` column — feed it straight into
    ``operators.multimodal.to_asset_table`` / ``decode_features``. The
    source never splits a file across tasks (a media file must decode
    whole) and parallelizes across files; ``pathGlobFilter`` prunes by
    extension at listing time, before any byte is read."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC read (the Spark-native replacement for the reference's
    pyodbc connection, rqtradein_etl.py:198-202). Credentials come from the
    caller's configuration — never hardcoded."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append",
               batch_size: int = 10_000, properties: dict[str, str] | None = None) -> None:
    """JDBC sink with array batching — the reference's fast_executemany
    bulk insert (rqtradein_etl.py:246) maps to the batchsize option."""
    writer = (
        df.write.format("jdbc").option("url", url).option("dbtable", table)
        .option("batchsize", str(batch_size)).mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
