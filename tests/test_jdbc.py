"""K3/K4 JDBC sink round-trips against embedded Derby — the in-JVM
database Spark already ships (derby*.jar backs the Hive metastore), so the
terminal .save() path and Spark's JDBC dialect handling are exercised for
real: table auto-create, truncate-preserving overwrite, append.
"""

from __future__ import annotations

import pytest

from tdk_apache_log_etl_spark.sinks.jdbc import jdbc_writer, write_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("derby")
    # keep derby.log out of the repo root
    spark._jvm.System.setProperty("derby.stream.error.file", str(d / "derby.log"))
    return f"jdbc:derby:{d}/testdb;create=true"


def _read(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .load()
    )


def test_jdbc_overwrite_roundtrip(spark, derby_url):
    # K3: per-user counts, daily replace. First write auto-creates the
    # table; the second overwrite must go through TRUNCATE (preserving
    # DDL) and replace the rows, not duplicate them.
    df1 = spark.createDataFrame(
        [("alice", 3), ("bob", 5)], ["user_id", "requests_count"]
    )
    df2 = spark.createDataFrame(
        [("alice", 7), ("carol", 1)], ["user_id", "requests_count"]
    )
    props = {"driver": DERBY_DRIVER}
    write_jdbc(df1, derby_url, "tdk_user_requests", mode="overwrite",
               properties=props, num_partitions=2)
    got1 = {(r.user_id, r.requests_count)
            for r in _read(spark, derby_url, "tdk_user_requests").collect()}
    assert got1 == {("alice", 3), ("bob", 5)}

    write_jdbc(df2, derby_url, "tdk_user_requests", mode="overwrite",
               properties=props, num_partitions=2)
    got2 = {(r.user_id, r.requests_count)
            for r in _read(spark, derby_url, "tdk_user_requests").collect()}
    assert got2 == {("alice", 7), ("carol", 1)}


def test_jdbc_append_accumulates(spark, derby_url):
    # K4: the one-row daily summary appends — two runs, two rows.
    props = {"driver": DERBY_DRIVER}
    row1 = spark.createDataFrame(
        [("2026-08-12", 10, 100)],
        ["run_date", "user_count", "total_successful_requests"],
    )
    row2 = spark.createDataFrame(
        [("2026-08-13", 12, 120)],
        ["run_date", "user_count", "total_successful_requests"],
    )
    write_jdbc(row1, derby_url, "tdk_total_requests", mode="append",
               properties=props, num_partitions=1)
    write_jdbc(row2, derby_url, "tdk_total_requests", mode="append",
               properties=props, num_partitions=1)
    back = _read(spark, derby_url, "tdk_total_requests")
    assert back.count() == 2
    assert {r.run_date for r in back.collect()} == {"2026-08-12", "2026-08-13"}


def _jdbc_exec(spark, url, sql):
    """Run one DDL/DML statement on Derby via java.sql (test-only)."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.execute(sql)
        st.close()
    finally:
        conn.close()


def _constraint_count(spark, url, table):
    q = (
        "(SELECT COUNT(*) AS n FROM SYS.SYSCONSTRAINTS c "
        "JOIN SYS.SYSTABLES t ON c.TABLEID = t.TABLEID "
        f"WHERE t.TABLENAME = '{table.upper()}') AS probe"
    )
    return _read(spark, url, q).collect()[0][0]  # Derby upper-cases aliases


def test_jdbc_truncate_preserves_ddl_recreate_drops_it(spark, derby_url):
    # The reason overwrite defaults to truncate=true: the target table's
    # DDL (here a PRIMARY KEY; in production grants/indexes too) must
    # survive the daily replace. With truncate=False Spark DROPs and
    # recreates from the DataFrame schema, losing the constraint —
    # verified against Derby's system catalog.
    props = {"driver": DERBY_DRIVER}
    _jdbc_exec(
        spark, derby_url,
        "CREATE TABLE tdk_keyed (user_id VARCHAR(32) NOT NULL PRIMARY KEY, "
        "requests_count INT)",
    )
    assert _constraint_count(spark, derby_url, "tdk_keyed") == 1

    df = spark.createDataFrame(
        [("alice", 3), ("bob", 5)], ["user_id", "requests_count"]
    )
    write_jdbc(df, derby_url, "tdk_keyed", mode="overwrite",
               properties=props, num_partitions=2, truncate=True)
    assert _constraint_count(spark, derby_url, "tdk_keyed") == 1  # PK kept
    got = {(r[0], r[1])  # Derby returns manually-created cols upper-cased
           for r in _read(spark, derby_url, "tdk_keyed").collect()}
    assert got == {("alice", 3), ("bob", 5)}

    write_jdbc(df, derby_url, "tdk_keyed", mode="overwrite",
               properties=props, num_partitions=2, truncate=False)
    assert _constraint_count(spark, derby_url, "tdk_keyed") == 0  # recreated


def test_jdbc_batchsize_and_partitions_roundtrip(spark, derby_url):
    # Production parallelism knobs: many partitions + small batches must
    # still land every row exactly once (executor-parallel inserts).
    props = {"driver": DERBY_DRIVER}
    df = spark.range(97).selectExpr(
        "CAST(id AS INT) AS k", "CAST(id * 2 AS INT) AS v"
    ).repartition(8)
    write_jdbc(df, derby_url, "tdk_batched", mode="overwrite",
               properties=props, num_partitions=4, batchsize=7)
    back = _read(spark, derby_url, "tdk_batched")
    assert back.count() == 97
    assert {(r.k, r.v) for r in back.collect()} == {
        (i, 2 * i) for i in range(97)
    }


def test_jdbc_writer_rejects_bare_url(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="jdbc:"):
        jdbc_writer(df, "myhost:1521/svc", "t")


def test_cli_analytics_jdbc_roundtrip(spark, tmp_path, derby_url, capsys):
    # The reference's full Glue-job flow through the CLI: staged logs →
    # per-user counts into the overwrite table, daily summary appended —
    # read back from Derby to close the loop (K3 + K4 end to end).
    from tdk_apache_log_etl_spark.__main__ import main
    from tdk_apache_log_etl_spark.pipeline import ingest

    logs = tmp_path / "jdbc_cli_logs"
    logs.mkdir()
    logs.joinpath("2026-08-13.log").write_text(
        "\n".join(
            [
                '10.0.0.1 - 1 [13/Aug/2026:10:00:00 +0000] "GET /a HTTP/1.1" 200 10 "-" "ua"',
                '10.0.0.1 - 1 [13/Aug/2026:10:00:01 +0000] "GET /b HTTP/1.1" 200 10 "-" "ua"',
                '10.0.0.2 - 2 [13/Aug/2026:10:00:02 +0000] "GET /c HTTP/1.1" 404 20 "-" "ua"',
            ]
        )
        + "\n"
    )
    staging = str(tmp_path / "jdbc_cli_staging")
    ingest(spark, str(logs), staging, run_date="2026-08-13")

    rc = main(
        [
            "analytics", staging, "2026-08-13",
            "--jdbc-url", derby_url,
        ]
    )
    assert rc == 0
    assert "analytics_ok=1" in capsys.readouterr().out
    got = {
        (r.user_id, r.requests_count)
        for r in _read(spark, derby_url, "tdk_user_requests_table").collect()
    }
    assert got == {(1, 2), (2, 1)}
    summary = _read(spark, derby_url, "tdk_total_requests_table").collect()
    assert len(summary) == 1
    assert summary[0].total_successful_requests == 2
