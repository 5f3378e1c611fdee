"""Structured Streaming e2e: file-source CLF stream → parsed staging
parquet (availableNow = the reference's nightly batch), source archiving
(K5 native), watermarked tumbling windows and session windows."""

from __future__ import annotations

import os

import pytest

from tdk_apache_log_etl_spark.sinks.staging import read_staging
from tdk_apache_log_etl_spark.streaming.log_stream import (
    read_log_stream,
    session_window_counts,
    windowed_event_counts,
    write_staging_stream,
)

LINES = [
    '10.0.0.1 - 1 [13/Aug/2026:10:00:{s:02d} +0000] "GET /a HTTP/1.1" 200 10 '
    '"-" "ua"'.format(s=s)
    for s in range(10)
] + [
    '10.0.0.2 - 2 [13/Aug/2026:11:30:00 +0000] "GET /b HTTP/1.1" 404 20 "-" "ua"'
]


def test_stream_ingest_available_now(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "2026-08-13.log").write_text("\n".join(LINES) + "\n")
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    archive = str(tmp_path / "archive")

    parsed = read_log_stream(spark, str(src), archive_dir=archive)
    q = write_staging_stream(parsed, staging, ckpt).start()
    q.awaitTermination(120)

    out = read_staging(spark, staging)
    assert out.count() == len(LINES)
    assert out.filter("status_code = 404").count() == 1
    # date-partitioned layout materialized
    assert any(d.startswith("date=") for d in os.listdir(staging))

    # restart with no new files → exactly-once: nothing reprocessed
    q2 = write_staging_stream(
        read_log_stream(spark, str(src)), staging, ckpt
    ).start()
    q2.awaitTermination(60)
    assert read_staging(spark, staging).count() == len(LINES)


def test_windowed_counts_streaming(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "2026-08-13.log").write_text("\n".join(LINES) + "\n")
    ckpt = str(tmp_path / "ckpt-win")

    parsed = read_log_stream(spark, str(src))
    win = windowed_event_counts(parsed)
    q = (
        win.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM win_counts").collect()
    total = sum(r.n_events for r in rows)
    assert total == len(LINES)
    assert all(r.window_end > r.window_start for r in rows)


def test_session_windows_streaming(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "2026-08-13.log").write_text("\n".join(LINES) + "\n")
    ckpt = str(tmp_path / "ckpt-sess")

    parsed = read_log_stream(spark, str(src))
    sess = session_window_counts(parsed)
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess_counts").collect()
    # user 1: ten events within seconds → one session; user 2: one session
    by_user = {r.user_id: r.n_events for r in rows}
    assert by_user == {1: 10, 2: 1}


def test_stateful_running_profiles(spark, tmp_path):
    from tdk_apache_log_etl_spark.streaming.stateful import (
        running_user_profiles,
    )

    src = tmp_path / "in"
    src.mkdir()
    (src / "2026-08-13.log").write_text("\n".join(LINES) + "\n")
    ckpt = str(tmp_path / "ckpt-state")

    parsed = read_log_stream(spark, str(src))
    prof = running_user_profiles(parsed)
    q = (
        prof.writeStream.format("memory")
        .queryName("user_profiles")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM user_profiles ORDER BY user_id"
    ).collect()
    by_user = {r.user_id: r for r in rows}
    assert by_user[1].n_events == 10
    assert by_user[1].total_size == 100          # ten events x size 10
    assert by_user[1].last_seen == "2026-08-13 10:00:09"
    assert by_user[2].n_events == 1
    assert by_user[2].total_size == 20


def test_stream_static_enrichment_join(spark, tmp_path):
    from tdk_apache_log_etl_spark.streaming.log_stream import enrich_stream

    src = tmp_path / "in"
    src.mkdir()
    (src / "2026-08-13.log").write_text("\n".join(LINES) + "\n")
    ckpt = str(tmp_path / "ckpt-enrich")

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], ["user_id", "tier"]
    )
    parsed = read_log_stream(spark, str(src))
    q = (
        enrich_stream(parsed, dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT user_id, tier, count(*) n FROM enriched GROUP BY 1,2").collect()
    got = {(r.user_id, r.tier): r.n for r in rows}
    assert got == {(1, "gold"): 10, (2, "silver"): 1}


def test_stream_dedup_within_watermark(spark, tmp_path):
    from tdk_apache_log_etl_spark.streaming.log_stream import dedup_stream

    src = tmp_path / "in"
    src.mkdir()
    # 3 distinct requests, each retransmitted (5 duplicate lines total);
    # duplicates differ only in event time (within the watermark window)
    dup_lines = [
        '10.0.0.1 - 1 [13/Aug/2026:10:00:00 +0000] "GET /a HTTP/1.1" 200 10 "-" "ua"',
        '10.0.0.1 - 1 [13/Aug/2026:10:00:05 +0000] "GET /a HTTP/1.1" 200 10 "-" "ua"',
        '10.0.0.1 - 1 [13/Aug/2026:10:00:09 +0000] "GET /a HTTP/1.1" 200 10 "-" "ua"',
        '10.0.0.2 - 2 [13/Aug/2026:10:01:00 +0000] "GET /b HTTP/1.1" 200 20 "-" "ua"',
        '10.0.0.2 - 2 [13/Aug/2026:10:01:30 +0000] "GET /b HTTP/1.1" 200 20 "-" "ua"',
        '10.0.0.3 - 3 [13/Aug/2026:10:02:00 +0000] "GET /c HTTP/1.1" 404 30 "-" "ua"',
    ]
    (src / "2026-08-13.log").write_text("\n".join(dup_lines) + "\n")
    ckpt = str(tmp_path / "ckpt-dedup")

    parsed = read_log_stream(spark, str(src))
    q = (
        dedup_stream(parsed)
        .writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT request_resource, count(*) n FROM deduped GROUP BY 1"
    ).collect()
    got = {(r.request_resource, r.n) for r in rows}
    assert got == {("/a", 1), ("/b", 1), ("/c", 1)}


def test_stream_stream_error_followup_join(spark, tmp_path):
    from tdk_apache_log_etl_spark.streaming.log_stream import (
        stream_stream_error_followup,
    )

    src = tmp_path / "in"
    src.mkdir()
    lines = [
        # user 1: success then a 404 2 min later (within horizon) → joins
        '10.0.0.1 - 1 [13/Aug/2026:10:00:00 +0000] "GET /a HTTP/1.1" 200 10 "-" "ua"',
        '10.0.0.1 - 1 [13/Aug/2026:10:02:00 +0000] "GET /x HTTP/1.1" 404 5 "-" "ua"',
        # user 2: success, error 3 HOURS later (outside horizon) → no join
        '10.0.0.2 - 2 [13/Aug/2026:10:00:00 +0000] "GET /b HTTP/1.1" 200 10 "-" "ua"',
        '10.0.0.2 - 2 [13/Aug/2026:13:00:00 +0000] "GET /y HTTP/1.1" 500 5 "-" "ua"',
        # user 3: only successes → no join
        '10.0.0.3 - 3 [13/Aug/2026:10:00:00 +0000] "GET /c HTTP/1.1" 200 10 "-" "ua"',
    ]
    (src / "2026-08-13.log").write_text("\n".join(lines) + "\n")
    ckpt = str(tmp_path / "ckpt-ss")

    parsed = read_log_stream(spark, str(src))
    q = (
        stream_stream_error_followup(parsed)
        .writeStream.format("memory")
        .queryName("followups")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT ok_user, ok_resource, err_resource, err_status FROM followups"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.ok_user, r.ok_resource, r.err_resource, r.err_status) == (
        1, "/a", "/x", 404
    )


def test_foreach_batch_summary_sink(spark, tmp_path):
    from tdk_apache_log_etl_spark.streaming.log_stream import (
        write_summary_stream,
    )

    src = tmp_path / "in"
    src.mkdir()
    (src / "2026-08-13.log").write_text("\n".join(LINES) + "\n")
    out = str(tmp_path / "summary")
    ckpt = str(tmp_path / "ckpt-fb")

    parsed = read_log_stream(spark, str(src))
    q = write_summary_stream(parsed, out, ckpt).start()
    q.awaitTermination(120)

    got = {
        (r.user_id, r.requests_count)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 10), (2, 1)}

    # restart with no new data: checkpoint prevents reprocessing, counts stay
    q2 = write_summary_stream(read_log_stream(spark, str(src)), out, ckpt).start()
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 2


def test_windowed_topk_stream(spark, tmp_path):
    from tdk_apache_log_etl_spark.sources.apache_log import parse_clf_lines
    from tdk_apache_log_etl_spark.streaming.log_stream import (
        write_windowed_topk_stream,
    )

    src = tmp_path / "in_topk"
    src.mkdir()
    # 10:00 window: 10 hits of 200, 1 of 404 → top-2 = [200, 404]
    lines = LINES + [
        '10.0.0.3 - 3 [13/Aug/2026:10:00:30 +0000] "GET /c HTTP/1.1" 500 5 '
        '"-" "ua"'
    ]
    (src / "2026-08-13.log").write_text("\n".join(lines) + "\n")
    stream = (
        spark.readStream.format("text")
        .option("pathGlobFilter", "*.log")
        .load(str(src))
    )
    parsed = parse_clf_lines(stream)
    q = write_windowed_topk_stream(
        parsed,
        str(tmp_path / "topk_out"),
        str(tmp_path / "topk_ckpt"),
        k=2,
    ).start()
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "topk_out"))
    first_window = out.filter("window_start = '2026-08-13 10:00:00'")
    rows = {r.status_code: r.n_events for r in first_window.collect()}
    # top-2 of the 10:00 window: 200 (x10) and the tie-broken second
    assert rows[200] == 10
    assert len(rows) == 2


def test_transform_with_state_first_seen_dedup(spark, tmp_path):
    # transformWithState's Python<->JVM state protocol needs protobuf,
    # absent from this container (see transform_state.py docstring).
    # Vendoring was investigated and is impossible offline: PySpark's
    # StateMessage_pb2 gencode demands protobuf runtime >= 6.33
    # (ValidateProtobufRuntimeVersion), and the only protobuf on this
    # disk is an incompatible vendored 4.23 (no runtime_version module).
    # The same stateful capability is fully exercised through the
    # applyInPandasWithState path (streaming/stateful.py tests).
    pytest.importorskip("google.protobuf")
    from tdk_apache_log_etl_spark.streaming.transform_state import (
        ROCKSDB_PROVIDER,
        first_seen_requests,
    )

    src = tmp_path / "in"
    src.mkdir()
    # ten repeats of /a from ip 1, one /b from ip 2 → two deduped rows
    (src / "2026-08-13.log").write_text("\n".join(LINES) + "\n")
    ckpt = str(tmp_path / "ckpt-tws")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        deduped = first_seen_requests(read_log_stream(spark, str(src)))
        q = (
            deduped.writeStream.format("memory")
            .queryName("first_seen")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    rows = spark.sql(
        "SELECT * FROM first_seen ORDER BY ip_address"
    ).collect()
    assert [
        (r.ip_address, r.request_resource, r.status_code, r.size)
        for r in rows
    ] == [
        ("10.0.0.1", "/a", 200, 10),
        ("10.0.0.2", "/b", 404, 20),
    ]


def test_stream_stream_left_outer_emits_after_watermark(spark, tmp_path):
    # leftOuter: the success with no error inside the horizon must emit
    # NULL-padded — but only in a batch AFTER the watermark passes its
    # join window, so the input is split into three files processed one
    # per micro-batch (maxFilesPerTrigger=1): file2/file3 exist to
    # advance the watermark past user 3's window and flush its state.
    from tdk_apache_log_etl_spark.streaming.log_stream import (
        read_log_stream,
        stream_stream_error_followup,
    )

    src = tmp_path / "in-louter"
    src.mkdir()
    (src / "a-2026-08-13.log").write_text(
        "\n".join(
            [
                # user 1: success + 404 2 min later → matched row
                '10.0.0.1 - 1 [13/Aug/2026:10:00:00 +0000] "GET /a HTTP/1.1" 200 10 "-" "ua"',
                '10.0.0.1 - 1 [13/Aug/2026:10:02:00 +0000] "GET /x HTTP/1.1" 404 5 "-" "ua"',
                # user 3: success only → outer row once watermark passes
                '10.0.0.3 - 3 [13/Aug/2026:10:00:00 +0000] "GET /c HTTP/1.1" 200 10 "-" "ua"',
            ]
        )
        + "\n"
    )
    # late traffic whose only job is to advance the watermark — on BOTH
    # sides: the join's global watermark is min(ok side, err side), so an
    # advancer file lacking either a 200 or an error leaves the global
    # watermark pinned at the stale side and no outer row ever flushes
    (src / "b-2026-08-13.log").write_text(
        "\n".join(
            [
                '10.0.0.8 - 8 [13/Aug/2026:16:00:00 +0000] "GET /v HTTP/1.1" 200 5 "-" "ua"',
                '10.0.0.9 - 9 [13/Aug/2026:16:00:00 +0000] "GET /w HTTP/1.1" 500 5 "-" "ua"',
            ]
        )
        + "\n"
    )
    (src / "c-2026-08-13.log").write_text(
        "\n".join(
            [
                '10.0.0.8 - 8 [13/Aug/2026:17:00:00 +0000] "GET /v HTTP/1.1" 200 5 "-" "ua"',
                '10.0.0.9 - 9 [13/Aug/2026:17:00:00 +0000] "GET /w HTTP/1.1" 500 5 "-" "ua"',
            ]
        )
        + "\n"
    )
    ckpt = str(tmp_path / "ckpt-louter")

    parsed = read_log_stream(spark, str(src), max_files_per_trigger=1)
    q = (
        stream_stream_error_followup(parsed, how="leftOuter")
        .writeStream.format("memory")
        .queryName("louter")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r.ok_user, r.err_status)
        for r in spark.sql("SELECT ok_user, err_status FROM louter").collect()
    }
    assert (1, 404) in rows          # matched pair
    assert (3, None) in rows         # outer row, NULL-padded error side


def test_stream_ip_range_enrichment(spark, tmp_path):
    # E27's interval-bucketed range join running unchanged over a file
    # stream: user 1's ip 10.0.0.1 -> idx 1 -> block N0 [0, 2620];
    # 10.0.10.61 -> idx 2621 -> block N1 [2621, 5241].
    from tdk_apache_log_etl_spark.streaming.log_stream import (
        enrich_stream_ip_ranges,
        read_log_stream,
    )

    src = tmp_path / "in"
    src.mkdir()
    (src / "2026-08-13.log").write_text(
        '10.0.0.1 - 1 [13/Aug/2026:10:00:00 +0000] "GET /a HTTP/1.1" 200 10 "-" "ua"\n'
        '10.0.10.61 - 2 [13/Aug/2026:10:00:01 +0000] "GET /b HTTP/1.1" 200 20 "-" "ua"\n'
        '10.0.10.61 - 2 [13/Aug/2026:10:00:02 +0000] "GET /c HTTP/1.1" 200 30 "-" "ua"\n'
    )
    nation = spark.createDataFrame(
        [(i, f"N{i}", 0) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    q = (
        enrich_stream_ip_ranges(read_log_stream(spark, str(src)), nation)
        .writeStream.format("memory")
        .queryName("ip_enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt-ip"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT block_owner, count(*) n, sum(sz) b FROM ip_enriched GROUP BY 1"
    ).collect()
    assert {(r.block_owner, r.n, r.b) for r in rows} == {
        ("N0", 1, 10),
        ("N1", 2, 50),
    }


def test_debounce_stream_suppresses_rapid_repeats(spark, tmp_path):
    from tdk_apache_log_etl_spark.streaming.stateful import debounce_stream

    # user 7: GETs at 10:00:00, :30, :01:00 (both within 120 s of their
    # predecessor -> suppressed), then 10:10:00 (kept); one POST at
    # 10:00:10 is a different key and survives.
    def line(hms, method):
        return (
            f'10.0.0.1 - 7 [13/Aug/2026:{hms} +0000] '
            f'"{method} /a HTTP/1.1" 200 10 "-" "ua"'
        )

    lines = [
        line("10:00:00", "GET"),
        line("10:00:30", "GET"),
        line("10:01:00", "GET"),
        line("10:10:00", "GET"),
        line("10:00:10", "POST"),
    ]
    src = tmp_path / "in"
    src.mkdir()
    (src / "2026-08-13.log").write_text("\n".join(lines) + "\n")

    parsed = read_log_stream(spark, str(src))
    q = (
        debounce_stream(parsed)
        .writeStream.format("memory")
        .queryName("debounced")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt-debounce"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT request_method, time FROM debounced ORDER BY time"
    ).collect()
    got = [(r.request_method, r.time) for r in rows]
    assert got == [
        ("GET", "2026-08-13 10:00:00"),
        ("POST", "2026-08-13 10:00:10"),
        ("GET", "2026-08-13 10:10:00"),
    ]


def test_streaming_bmp_feature_extract(spark, tmp_path):
    # The SAME mapInPandas mapper that backs the oracle-checked batch
    # query runs unchanged over a readStream source: real BMP bytes are
    # decoded per micro-batch and only scalar features reach the sink.
    import json

    from tdk_apache_log_etl_spark.operators.multimodal import (
        decode_bmp,
        extract_bmp_features,
        make_synthetic_bmp,
    )

    src = tmp_path / "ids"
    src.mkdir()
    (src / "batch0.json").write_text(
        "\n".join(json.dumps({"doc_id": i}) for i in range(12)) + "\n"
    )
    ids = (
        spark.readStream.schema("doc_id long")
        .json(str(src))
    )
    # One retry on a fresh checkpoint: under full-suite load the Python
    # workers backing the streaming mapInPandas can be killed by resource
    # contention, failing the query spuriously. A deterministic decode
    # regression fails BOTH attempts, so the retry costs no coverage.
    from pyspark.errors import StreamingQueryException

    qname = "bmp_stream_feats"
    for attempt in range(2):
        qname = f"bmp_stream_feats{attempt}"
        q = (
            extract_bmp_features(ids)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option(
                "checkpointLocation", str(tmp_path / f"ckpt-bmp{attempt}")
            )
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(240)
            if finished:
                break
            q.stop()
        except StreamingQueryException:
            if attempt == 1:
                raise
    rows = spark.sql(f"SELECT * FROM {qname}").collect()
    assert len(rows) == 12
    for r in rows:
        arr = decode_bmp(make_synthetic_bmp(r.doc_id))
        h, w, c = arr.shape
        assert (r.width, r.height, r.channels) == (w, h, c)
        assert r.mean_intensity == float(int(arr.sum(dtype="int64"))) / (
            w * h * c
        ) / 255


def test_sliding_window_error_rate(spark, tmp_path):
    from tdk_apache_log_etl_spark.streaming.log_stream import (
        sliding_error_rate,
    )

    src = tmp_path / "in"
    src.mkdir()
    (src / "2026-08-13.log").write_text("\n".join(LINES) + "\n")
    ckpt = str(tmp_path / "ckpt-slide")

    parsed = read_log_stream(spark, str(src))
    rates = sliding_error_rate(parsed)
    q = (
        rates.writeStream.format("memory")
        .queryName("slide_rates")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM slide_rates").collect()
    # overlapping windows: every event is counted window/slide = 2 times
    assert sum(r.n_requests for r in rows) == 2 * len(LINES)
    for r in rows:
        assert 0.0 <= r.error_rate <= 1.0
        assert r.n_errors <= r.n_requests
        # window length is the full 10-minute duration, starts 5 min apart
        assert (r.window_end - r.window_start).total_seconds() == 600
