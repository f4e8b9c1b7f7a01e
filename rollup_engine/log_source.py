"""request.log compatibility source — the reference's native input.

Parses AEM/CQ ``request.log`` lines (optionally .gz, multiple files,
Spark handles both natively — S1/S2/S4 in SURVEY.md §2.1) and pairs
request/response events, so a reference user can point this engine at
their existing logs.

Line grammar (/root/reference/src/log_parser/log_events.rs):
  request : ``DD/Mon/YYYY:HH:MM:SS ±ZZZZ [id] -> METHOD URL PROTO``
  response: ``DD/Mon/YYYY:HH:MM:SS ±ZZZZ [id] <- STATUS MIME… TIMEms``

Semantics preserved:
- dispatch checks ``->`` BEFORE ``<-`` so a request URL containing
  ``<-`` still parses as a request (pinned,
  /root/reference/src/log_parser/mod.rs:56-64)
- response time = LAST space token with 2-char suffix stripped —
  tolerant of MIME types containing spaces
  (/root/reference/src/log_parser/log_events.rs:91-103, :210-224)
- error class = first char of the 5th token ∈ {4,5}
  (/root/reference/src/log_parser/log_events.rs:105-114)
- malformed lines silently dropped (/root/reference/src/main.rs:103-107)
- response timestamps are never parsed (reference parity)

Pairing (J1): the reference is a streaming FIFO matcher over file
order with id REUSE — the k-th surviving request with id X joins the
k-th surviving response with id X (/root/reference/src/
request_response_matcher/mod.rs:25-76).  Re-expressed relationally:
``row_number() over (partition by id, side order by line_no)`` then an
inner equi-join on (id, k).  Equivalent under a single total order;
line order is recovered per file via zipWithIndex (deterministic for
text sources) + file ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TS_FMT = "dd/MMM/yyyy:HH:mm:ss Z"


def read_lines(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Multi-file (and .gz) line source with a global (file, line)
    order column — the analog of the reference's concatenating
    MultiFile reader (/root/reference/src/multi_file/mod.rs:10-47)."""
    dfs = []
    for i, p in enumerate(paths):
        rdd = spark.sparkContext.textFile(p).zipWithIndex()
        df = spark.createDataFrame(rdd, ["line", "line_in_file"]).select(
            F.lit(i).alias("file_no"), "line_in_file", "line"
        )
        dfs.append(df)
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.withColumn(
        "line_no",
        F.col("file_no").cast("long") * F.lit(1 << 40) + F.col("line_in_file"),
    )


def parse_events(lines: DataFrame) -> DataFrame:
    """Lines → typed events; malformed rows dropped (P1-P4)."""
    parts = F.split(F.col("line"), " ")
    is_req = F.col("line").contains("->")  # checked first, like P1
    is_resp = ~is_req & F.col("line").contains("<-")
    raw_id = F.regexp_extract(parts.getItem(2), r"^\[(-?\d+)\]$", 1)
    ts = F.to_timestamp(
        F.concat_ws(" ", parts.getItem(0), parts.getItem(1)), TS_FMT
    )
    last_tok = F.element_at(parts, -1)
    # Reference rule (log_events.rs:91-103): strip the LAST TWO chars of
    # the last token and parse what remains as a signed i64 — so "123ms"
    # → 123, "-5ms" → -5, and any ≥3-char token whose prefix is an
    # integer parses (the suffix is never checked).  Stricter ^\d+ms$
    # silently dropped lines the reference counts.
    ms_body = last_tok.substr(F.lit(1), F.length(last_tok) - F.lit(2))
    resp_ms = F.when(ms_body.rlike(r"^[+-]?\d+$"), ms_body)
    status_first = F.substring(parts.getItem(4), 1, 1)
    ev = lines.select(
        "line_no",
        F.col("line").alias("original_log_line"),
        F.when(is_req, F.lit("request"))
        .when(is_resp, F.lit("response"))
        .alias("side"),
        F.when(raw_id != "", raw_id.cast("int")).alias("id"),
        F.when(is_req, ts).alias("time"),
        F.when(is_resp, resp_ms.cast("long")).alias("response_time_ms"),
        F.when(
            is_resp & status_first.isin("4", "5"),
            F.concat(status_first, F.lit("xx")),
        ).alias("http_error"),
    )
    ok = (
        (F.col("side") == "request") & F.col("id").isNotNull() & F.col("time").isNotNull()
    ) | (
        (F.col("side") == "response")
        & F.col("id").isNotNull()
        & F.col("response_time_ms").isNotNull()
    )
    return ev.where(F.coalesce(ok, F.lit(False)))


def pair_events(events: DataFrame) -> DataFrame:
    """FIFO-with-id-reuse pairing via k-th-occurrence equi-join."""
    w = Window.partitionBy("id", "side").orderBy("line_no")
    k = events.withColumn("k", F.row_number().over(w))
    req = k.where("side = 'request'").select(
        "id",
        "k",
        F.col("time"),
        F.col("original_log_line").alias("request_line"),
    )
    resp = k.where("side = 'response'").select(
        "id",
        "k",
        "response_time_ms",
        "http_error",
        F.col("original_log_line").alias("response_line"),
    )
    return req.join(resp, ["id", "k"], "inner").drop("k")


def pairs_as_transcript(pairs: DataFrame) -> DataFrame:
    """Pairs → the engine's canonical delta stream: each pair becomes a
    'turn' whose delta_ms is the response time, so every rollup / sink /
    filter in the engine applies to request.log data unchanged.

    ``response_text`` carries the response's original log line so term
    filters can match EITHER line of the pair, as the reference does
    (/root/reference/src/filter/mod.rs:12-30) — compat callers pass
    ``COMPAT_TERM_COLUMNS`` to the filter builders."""
    return pairs.select(
        F.col("id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("request").alias("role"),
        F.col("request_line").alias("text"),
        F.col("response_line").alias("response_text"),
        F.coalesce(
            F.when(F.col("http_error").isNotNull(),
                   F.concat(F.lit("error:"), F.col("http_error"))),
            F.lit(""),
        ).alias("tool"),
        F.col("time").alias("ts"),
        F.col("response_time_ms").alias("delta_ms"),
    )


# Term-searchable columns in compat mode: request line + response line,
# matching the reference's either-raw-line semantics.
COMPAT_TERM_COLUMNS = ("text", "response_text")


def read_stdin_lines(spark: SparkSession) -> DataFrame:
    """S3: stdin source (/root/reference/src/main.rs:81-90 falls back to
    reading stdin when no file is given).  Stdin is inherently
    driver-local — the bytes exist only on the submitting machine — so
    the driver drains it and parallelizes the lines to the executors;
    every downstream operator (parse/pair/rollup) then runs
    distributed.  For anything larger than a pipe buffer, stage to
    files/object storage instead (documented divergence, PARITY.md)."""
    import sys

    lines = [
        (0, i, line.rstrip("\n"))
        for i, line in enumerate(sys.stdin)
    ]
    df = spark.createDataFrame(
        lines, "file_no int, line_in_file long, line string"
    )
    return df.withColumn(
        "line_no",
        F.col("file_no").cast("long") * F.lit(1 << 40) + F.col("line_in_file"),
    )


def read_pairs(spark: SparkSession, paths: list[str]) -> DataFrame:
    """paths == ['-'] reads stdin, mirroring the reference CLI."""
    if paths == ["-"]:
        return pair_events(parse_events(read_stdin_lines(spark)))
    return pair_events(parse_events(read_lines(spark, paths)))
