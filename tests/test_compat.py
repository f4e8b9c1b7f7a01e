"""request.log compatibility layer: parse/pair semantics and sink
formats pinned to the reference's behavior (SURVEY.md §2.1, §5)."""

from __future__ import annotations

import pytest

from rollup_engine import render
from rollup_engine.log_source import (
    pairs_as_transcript,
    parse_events,
    read_lines,
    read_pairs,
)
from rollup_engine.rollup import global_rollup

SIMPLE_1 = """\
08/Apr/2024:09:57:47 +0200 [1] -> GET /content/page.html HTTP/1.1
08/Apr/2024:09:57:47 +0200 [1] <- 200 text/html 7ms
08/Apr/2024:09:58:21 +0200 [2] -> GET /content/other.html HTTP/1.1
08/Apr/2024:09:58:21 +0200 [2] <- 200 text/html; charset=utf-8 10ms
"""

# id [1] reused — FIFO semantics must still pair 2 pairs here
SIMPLE_2 = """\
08/Apr/2024:10:02:00 +0200 [1] -> GET /content/again.html HTTP/1.1
08/Apr/2024:10:02:00 +0200 [1] <- 404 text/html 9ms
08/Apr/2024:10:02:30 +0200 [7] -> GET /content/slow.html HTTP/1.1
08/Apr/2024:10:02:31 +0200 [7] <- 500 text/html 800ms
"""

BROKEN = """\
08/Apr/2024:09:57:47 +0200 [1] -> GET /ok.html HTTP/1.1
08/Apr/2024:09:57:47 +0200 [1] <- 200 text/html 7ms
not a log line at all
99/Zzz/X:Y [2] -> GET /bad-date.html HTTP/1.1
08/Apr/2024:09:58:21 +0200 [2] <- 200 text/html 10ms
"""


@pytest.fixture()
def logs(tmp_path):
    p1 = tmp_path / "simple-1.log"
    p1.write_text(SIMPLE_1)
    p2 = tmp_path / "simple-2.log"
    p2.write_text(SIMPLE_2)
    pb = tmp_path / "broken.log"
    pb.write_text(BROKEN)
    import gzip

    pz = tmp_path / "simple-1.log.gz"
    pz.write_bytes(gzip.compress(SIMPLE_1.encode()))
    return {"s1": str(p1), "s2": str(p2), "broken": str(pb), "gz": str(pz)}


def _result(spark, paths):
    t = pairs_as_transcript(read_pairs(spark, paths))
    return global_rollup(t).collect()[0]


def test_simple_counts(spark, logs):
    """count=2, min=7, max=10 — /root/reference/src/main.rs:120-146."""
    r = _result(spark, [logs["s1"]])
    assert (r.turn_count, r.lat_min_ms, r.lat_max_ms) == (2, 7, 10)


def test_two_files_id_reuse(spark, logs):
    """Two files, id [1] reused → 4 pairs
    — /root/reference/src/main.rs:214-237."""
    r = _result(spark, [logs["s1"], logs["s2"]])
    assert r.turn_count == 4
    assert r.lat_max_ms == 800
    assert r.err4xx_rate == 0.25 and r.err5xx_rate == 0.25


def test_gzip_source(spark, logs):
    """.gz transparently decompressed — /root/reference/src/main.rs:239-259."""
    r = _result(spark, [logs["gz"]])
    assert r.turn_count == 2


def test_broken_lines_dropped(spark, logs):
    """Malformed lines dropped; orphan response unpaired → count=1
    — /root/reference/src/main.rs:192-212."""
    r = _result(spark, [logs["broken"]])
    assert (r.turn_count, r.lat_min_ms) == (1, 7)


def test_arrow_in_url_is_request(spark, logs, tmp_path):
    """'->' checked before '<-': a request URL containing '<-' still
    parses as a request — /root/reference/src/log_parser/mod.rs:56-64."""
    p = tmp_path / "arrow.log"
    p.write_text(
        "08/Apr/2024:09:57:47 +0200 [3] -> GET /page?q=<-weird HTTP/1.1\n"
        "08/Apr/2024:09:57:47 +0200 [3] <- 200 text/html 5ms\n"
    )
    ev = parse_events(read_lines(spark, [str(p)])).collect()
    sides = sorted(e.side for e in ev)
    assert sides == ["request", "response"]


def test_response_before_request_pairs(spark, tmp_path):
    """Out-of-order tolerance: buffered response still matches
    — /root/reference/src/request_response_matcher/mod.rs:25-47."""
    p = tmp_path / "ooo.log"
    p.write_text(
        "08/Apr/2024:09:57:47 +0200 [9] <- 200 text/html 42ms\n"
        "08/Apr/2024:09:57:47 +0200 [9] -> GET /late.html HTTP/1.1\n"
    )
    r = _result(spark, [str(p)])
    assert (r.turn_count, r.lat_min_ms) == (1, 42)


def test_mime_with_spaces(spark, tmp_path):
    """Response time = LAST token — MIME types containing spaces are
    tolerated — /root/reference/src/log_parser/log_events.rs:210-224."""
    p = tmp_path / "mime.log"
    p.write_text(
        "08/Apr/2024:09:57:47 +0200 [4] -> GET /a HTTP/1.1\n"
        "08/Apr/2024:09:57:47 +0200 [4] <- 200 text/html; charset=iso 8859-1 123ms\n"
    )
    r = _result(spark, [str(p)])
    assert r.lat_min_ms == 123


# -------------------------------------------------------------- renderers

FIX = render.RollupResult(
    count=3,
    max=100,
    min=1,
    avg=37,
    median=10,
    percentile90=100,
    percentile99=100,
    client_error_4xx=0.5,
    server_error_5xx=0.3333,
)


def test_terminal_format():
    assert render.terminal_lines(FIX) == [
        "count:\t3",
        "time.avg:\t37",
        "time.min:\t1",
        "time.median:\t10",
        "time.90percent:\t100",
        "time.99percent:\t100",
        "time.max:\t100",
        "error.client_error_4xx_rate:\t0.5",
        "error.server_error_5xx_rate:\t0.3333",
    ]


def test_terminal_empty_omits_blocks():
    assert render.terminal_lines(render.RollupResult(count=0)) == ["count:\t0"]


def test_graphite_format():
    lines = render.graphite_lines(FIX, 1234567890, prefix="servers.prod")
    assert lines[0] == "servers.prod.requests.count 3 1234567890"
    assert "servers.prod.requests.time.90percent 100 1234567890" in lines
    assert lines[-1] == (
        "servers.prod.requests.error.server_error_5xx_rate 0.3333 1234567890"
    )
    noprefix = render.graphite_lines(FIX, 75)
    assert noprefix[0] == "requests.count 3 75"


def test_influxdb_format():
    assert render.influxdb_body(FIX, tags="host=web1") == (
        "request_log,host=web1 count=3,time_max=100,time_min=1,time_avg=37,"
        "time_median=10,time_90percent=100,time_99percent=100,"
        "client_error_4xx_rate=0.5,server_error_5xx_rate=0.3333"
    )
    # absent groups skipped — influxdb.rs omit-empty-fields pin
    assert render.influxdb_body(render.RollupResult(count=0)) == (
        "request_log count=0"
    )


def test_prometheus_format():
    text = render.prometheus_exposition(FIX)
    assert "# TYPE request_count gauge\nrequest_count 3\n" in text
    assert "request_time_percentile99 100\n" in text
    assert "request_error_client_error_4xx_rate 0.5\n" in text
    # unset gauges read 0
    empty = render.prometheus_exposition(render.RollupResult(count=0))
    assert "request_time_max 0\n" in empty


# ------------------------------------------------------------------ CLI


def test_term_filter_matches_response_line(spark, logs, capsys):
    """Terms must match EITHER raw line of the pair (filter/mod.rs:12-30):
    '500' and 'text/html' appear only in response lines."""
    from rollup_engine.job import main

    main(["--logs", logs["s1"], logs["s2"], "--include", "500"])
    out = capsys.readouterr().out
    assert "count:\t1" in out and "time.max:\t800" in out
    main(["--logs", logs["s1"], logs["s2"], "--exclude", "text/html"])
    assert "count:\t0" in capsys.readouterr().out


RELAXED = """\
08/Apr/2024:09:57:47 +0200 [1] -> GET /a.html HTTP/1.1
08/Apr/2024:09:57:47 +0200 [1] <- 200 text/html -5ms
08/Apr/2024:09:58:00 +0200 [2] -> GET /b.html HTTP/1.1
08/Apr/2024:09:58:00 +0200 [2] <- 200 text/html 12xy
08/Apr/2024:09:59:00 +0200 [3] -> GET /c.html HTTP/1.1
08/Apr/2024:09:59:00 +0200 [3] <- 200 text/html ms
"""


def test_response_parse_reference_rule(spark, tmp_path):
    """log_events.rs:91-103: strip the last TWO chars of the last token,
    parse signed i64 — negatives and non-'ms' suffixes count; a 2-char
    token parses to '' and the line drops."""
    p = tmp_path / "relaxed.log"
    p.write_text(RELAXED)
    r = _result(spark, [str(p)])
    assert (r.turn_count, r.lat_min_ms, r.lat_max_ms) == (2, -5, 12)


def test_cli_prometheus_listen(spark, logs):
    """--prometheus-listen serves the reference's exposition format and
    recomputes per scrape (entry point 2, main.rs:30-32)."""
    from urllib.request import urlopen

    from rollup_engine.job import build_parser, run_compat

    args = build_parser().parse_args(
        ["--logs", logs["s1"], logs["s2"], "--prometheus-listen",
         "127.0.0.1:0", "-q"]
    )
    server = run_compat(spark, args)
    try:
        port = server.server_address[1]
        body = urlopen(f"http://127.0.0.1:{port}/metrics").read().decode()
        assert "request_count 4" in body
        assert "request_time_max 800" in body
    finally:
        server.shutdown()


def test_prometheus_scrape_sees_appended_lines(spark, logs, tmp_path):
    """The reference re-runs the whole pipeline per scrape
    (http_handler/mod.rs run(&args)), so lines appended to a live
    request.log between scrapes MUST show up — the round-2 parse-once
    cache dropped them (ADVICE r2)."""
    from urllib.request import urlopen

    from rollup_engine.job import build_parser, run_compat

    live = tmp_path / "live.log"
    live.write_text(SIMPLE_1)
    args = build_parser().parse_args(
        ["--logs", str(live), "--prometheus-listen", "127.0.0.1:0", "-q"]
    )
    server = run_compat(spark, args)
    try:
        port = server.server_address[1]
        url = f"http://127.0.0.1:{port}/metrics"
        assert "request_count 2" in urlopen(url).read().decode()
        with open(live, "a") as f:
            f.write(SIMPLE_2)
        body = urlopen(url).read().decode()
        assert "request_count 4" in body
        assert "request_time_max 800" in body
    finally:
        server.shutdown()


def test_stdin_source(spark, monkeypatch):
    """S3: '--logs -' reads request.log lines from stdin
    (/root/reference/src/main.rs:81-90)."""
    import io

    monkeypatch.setattr("sys.stdin", io.StringIO(SIMPLE_1))
    r = _result(spark, ["-"])
    assert (r.turn_count, r.lat_min_ms, r.lat_max_ms) == (2, 7, 10)


def test_cli_compat_end_to_end(spark, logs, capsys):
    from rollup_engine.job import main

    main(["--logs", logs["s1"], logs["s2"]])
    out = capsys.readouterr().out
    assert "count:\t4" in out
    assert "time.max:\t800" in out


def test_cli_time_filter(spark, logs, capsys):
    from rollup_engine.job import main

    main(
        [
            "--logs",
            logs["s1"],
            logs["s2"],
            "-t",
            "10",
            "--now",
            "2024-04-08 08:10:00+00:00",
        ]
    )
    out = capsys.readouterr().out
    # only the simple-2 pairs (10:02 +0200 == 08:02 UTC) are in-window
    assert "count:\t2" in out
    assert "time.max:\t800" in out