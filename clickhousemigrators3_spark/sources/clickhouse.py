"""ClickHouse JDBC source/sink — S1 parity for a live server (reference
``ch_client.py:10-25`` opens clickhouse-connect over HTTP 8123; Spark's
native path is the JDBC datasource with the ClickHouse JDBC driver on the
executor classpath).

No ClickHouse server (or driver jar) ships in this container, so this module
only *builds* readers/writers — construction is unit-tested, the round-trip
is exercised when a server is available. The parquet fixtures stand in for
ClickHouse tables everywhere else in the engine (SURVEY §1.4).

Scale notes encoded below:

* reads are range-partitioned over a numeric column so N executors pull in
  parallel (``numPartitions``/``partitionColumn`` — the JDBC analogue of the
  reference's partition-by-partition pull);
* ``pushDownPredicate``/``pushDownAggregate`` keep filters server-side, the
  property the reference relied on by shipping whole SQL strings
  (``migration.py:473-477``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

DEFAULT_PORT = 8123  # reference config.py:11
DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"


def jdbc_url(host: str, port: int = DEFAULT_PORT, database: str = "default") -> str:
    return f"jdbc:clickhouse://{host}:{port}/{database}"


def reader_options(
    host: str | None = None,
    database: str = "default",
    table: str = "",
    user: str = "default",
    password: str = "",
    port: int = DEFAULT_PORT,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    predicate: str | None = None,
    url: str | None = None,
    driver: str = DRIVER,
    qualify: bool = True,
) -> dict[str, str]:
    """The full JDBC option map for one ClickHouse table read, as a pure
    function of its inputs — the contract the JVM datasource receives.
    Contract-tested against golden values (tests/test_engine_units.py), and
    round-tripped through a real JVM JDBC dialect in
    ``test_jdbc_roundtrip_embedded_derby`` (Spark bundles embedded Derby,
    so the identical options path — partitioned read, predicate subquery,
    fetchsize — is exercised end-to-end without a ClickHouse server).

    ``url``/``driver``/``qualify`` default to the ClickHouse dialect;
    passing them swaps the backing database without touching the option
    path (that pluggability is what the Derby test rides).

    ``predicate`` is pushed via a dbtable subquery (the JDBC way to
    guarantee server-side filtering regardless of what Catalyst decides to
    push — the property the reference got by shipping whole SQL strings,
    ``migration.py:473-477``)."""
    if url is None and host is None:
        raise ValueError("either host or url is required")
    if partition_column is not None and lower_bound is not None and upper_bound is not None:
        if lower_bound >= upper_bound:
            raise ValueError(
                f"lowerBound ({lower_bound}) must be < upperBound ({upper_bound})"
            )
    qualified = f"{database}.{table}" if qualify else table
    dbtable = (
        qualified
        if predicate is None
        else f"(SELECT * FROM {qualified} WHERE {predicate}) AS src"
    )
    opts = {
        "url": url if url is not None else jdbc_url(host, port, database),
        "dbtable": dbtable,
        "user": user,
        "password": password,
        "driver": driver,
        "pushDownPredicate": "true",
        "pushDownAggregate": "true",
        "fetchsize": "100000",
    }
    if partition_column is not None:
        opts.update(
            {
                "partitionColumn": partition_column,
                "numPartitions": str(num_partitions),
                "lowerBound": str(lower_bound if lower_bound is not None else 0),
                "upperBound": str(upper_bound if upper_bound is not None else 1 << 31),
            }
        )
    return opts


def reader(spark: SparkSession, **kwargs) -> DataFrameReader:
    """Configured JDBC reader for one ClickHouse table. Call ``.load()``
    against a live server."""
    return spark.read.format("jdbc").options(**reader_options(**kwargs))


def read_table(spark: SparkSession, **kwargs) -> DataFrame:
    """S1: ``spark.read.format('jdbc')…load()`` — raises without a live
    server/driver; see module docstring."""
    return reader(spark, **kwargs).load()


def migrate_to_parquet(
    spark: SparkSession,
    dest_path: str,
    partition_keys: list[str],
    **reader_kwargs,
) -> None:
    """The BASELINE.json north-star one-liner: ClickHouse table → partitioned
    Parquet on S3/HDFS. Executors stream rows server→object-store directly;
    the driver moves no data (the reference's core property, preserved)."""
    df = read_table(spark, **reader_kwargs)
    writer = df.write.mode("overwrite")
    if partition_keys:
        writer = writer.partitionBy(*partition_keys)
    writer.parquet(dest_path)
