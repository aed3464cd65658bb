"""JDBC snapshot/backfill source (S8).

The reference snapshots schemas with ``mysqldump --no-data`` and backfills
via its refresh tables (components/mysql_tools.py:48-69); Spark-native
backfill is a partitioned JDBC read: N executors each pull one primary-key
range, so a 100 TB-source backfill parallelizes instead of serializing
through one connection. The helpers keep option-building pure (testable
without a live database).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH_SIZE = 10_000


def snapshot_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    fetch_size: int = DEFAULT_FETCH_SIZE,
    driver: str | None = None,
) -> dict[str, str]:
    """JDBC reader options for a parallel snapshot.

    With a numeric ``partition_column`` (normally the primary key) Spark
    issues ``num_partitions`` range-predicated queries in parallel; without
    one the read is single-stream (correct but slow — only for tiny dims).
    """
    opts = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
        # a snapshot must be one transactionally-consistent cut, like the
        # reference's --single-transaction dump
        "isolationLevel": "REPEATABLE_READ",
    }
    if driver is not None:
        opts["driver"] = driver
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned snapshot needs lower/upper bounds")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def jdbc_snapshot(spark: SparkSession, **kwargs) -> DataFrame:
    """spark.read over a live MySQL/any-JDBC table (see snapshot_options)."""
    return spark.read.format("jdbc").options(**snapshot_options(**kwargs)).load()


# ---------------------------------------------------------------------------
# embedded source-database fixture (Apache Derby, already on Spark's
# classpath) — lets the snapshot path be exercised END-TO-END in-sandbox
# against a real JDBC database instead of staying unit-test-only
# ---------------------------------------------------------------------------

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

_SQL_TYPE = {
    "int": "INTEGER",
    "bigint": "BIGINT",
    "smallint": "SMALLINT",
    "double": "DOUBLE",
    "float": "REAL",
    "boolean": "BOOLEAN",
    "string": "VARCHAR(4096)",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
}


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def embedded_derby_fixture(spark: SparkSession, df: DataFrame, table: str) -> str:
    """Materialize a SMALL DataFrame into a throwaway embedded Derby
    database and return its JDBC url — the in-sandbox stand-in for the
    live MySQL master the reference snapshots (mysql_tools.py:48-69).

    Driver-side by design: this SEEDS a source database for snapshot
    verification (bounded dimension tables); the snapshot READ back out is
    the distributed partitioned-JDBC path under test. Each call creates a
    fresh database directory, so runs are independent."""
    import tempfile

    db_dir = tempfile.mkdtemp(prefix="mss_derby_") + "/db"
    url = f"jdbc:derby:{db_dir}"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    try:
        cols = ", ".join(
            f"{name} {_SQL_TYPE[dtype]}" for name, dtype in df.dtypes
        )
        st = conn.createStatement()
        st.executeUpdate(f"CREATE TABLE {table} ({cols})")
        rows = df.collect()
        names = [name for name, _ in df.dtypes]
        for i in range(0, len(rows), 500):
            values = ", ".join(
                "(" + ", ".join(_sql_literal(r[n]) for n in names) + ")"
                for r in rows[i : i + 500]
            )
            st.executeUpdate(f"INSERT INTO {table} VALUES {values}")
        st.close()
    finally:
        conn.close()
    return url
