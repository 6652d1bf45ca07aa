"""The ``loki`` Python Data Source: Spark's analogue of the reference's
``LokiLogTable`` TableProvider + its two physical operators.

Read path  ≙ LokiLogScanExec  (datafusion-loki/src/scan.rs:23-216)
Write path ≙ LokiLogInsertExec (datafusion-loki/src/insert.rs:34-247)
Pushdown   ≙ supports_filters_pushdown/scan (src/table.rs:90-156) via
             ``pushFilters`` + the logql translator.
Plan serde ≙ src/codec.rs — NOT needed: Spark pickles the reader and its
             InputPartitions to executors natively (SURVEY.md §4.3).

Options:
  endpoint       Loki base URL (required)              ≙ table.rs:41
  default_label  fallback stream selector label        ≙ table.rs:42,55-58
  labels         selector terms or JSON equality map — the §7.4.2(b)
                 substitute for map-subscript pushdown
  start / end    ISO timestamps or epoch-ns bounds (optional)
  limit          push LIMIT n into the HTTP request    ≙ scan.rs:131-146
                 (Python DS API has no pushLimit hook yet — SURVEY.md §7.4.3)
  columns        comma-separated subset of timestamp,labels,line: the
                 source-side projection (≙ ProjectionMask::roots,
                 scan.rs:203-206). The Python DS API hands reader() the
                 FULL schema regardless of the query's projection (no
                 pruning hook, verified against pyspark 4.1's
                 plan_data_source_read worker), so — like `labels` and
                 `limit` — pruning rides an option: schema() narrows to the
                 requested columns and read() decodes only those parquet
                 columns. loki_table() wires it from .select() ergonomics.
  partitions     split the time range into N parallel range queries.
                 The reference hardcodes 1 partition (scan.rs:46,95-97);
                 N time slices is the 100 TB scale path. Forced to 1 when
                 a limit is pushed (limit semantics are global).

Scale notes: each InputPartition is a plain-data (start_ns, end_ns) slice —
pickled to an executor, which opens its own HTTP connection (no shared
client state on the plan). At 1000 executors this fans out to 1000
concurrent bounded range queries, which is exactly how Loki parallelizes
reads server-side.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from datafusion_loki_spark.sources import client as loki_client
from datafusion_loki_spark.sources import logql
from datafusion_loki_spark.sources.schema import LOG_TABLE_SCHEMA


def _parse_time_option(value: str | None) -> int | None:
    """'2024-01-01 00:00:00' | ISO | epoch-ns int → epoch ns."""
    if value is None or value == "":
        return None
    text = str(value).strip()
    if text.lstrip("-").isdigit():
        return int(text)
    dt = datetime.fromisoformat(text)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000) * 1_000


_ALL_COLUMNS = ("timestamp", "labels", "line")


def _parse_columns_option(options) -> tuple[str, ...]:
    """`columns` option → validated tuple in canonical schema order."""
    raw = options.get("columns")
    if not raw:
        return _ALL_COLUMNS
    requested = {c.strip() for c in str(raw).split(",") if c.strip()}
    unknown = requested - set(_ALL_COLUMNS)
    if unknown:
        raise ValueError(
            f"unknown loki columns {sorted(unknown)}; valid: {list(_ALL_COLUMNS)}"
        )
    if not requested:
        raise ValueError("loki `columns` option must name at least one column")
    return tuple(c for c in _ALL_COLUMNS if c in requested)


@dataclass
class LokiRangePartition(InputPartition):
    """One time slice of the scan — plain data, cheap to pickle."""

    start_ns: int
    end_ns: int


class LokiDataSource(DataSource):
    """format("loki") — registered via datafusion_loki_spark.register_loki."""

    # Endpoint-bound subclasses (register_loki_endpoint) place their
    # connection options here: pyspark 4.1 does not forward CREATE TABLE
    # OPTIONS to Python data sources, and class attributes DO survive the
    # cloudpickle trip to executors — making `CREATE TABLE ... USING
    # <name>` + SQL INSERT/SELECT work, which is the reference's SQL entry
    # point (examples/datafusion.rs:10-14, init.sql).
    _default_options: dict = {}

    def __init__(self, options):
        merged = dict(self._default_options)
        merged.update(options or {})
        super().__init__(merged)

    @classmethod
    def name(cls) -> str:
        return "loki"

    def schema(self) -> StructType:
        # Fixed schema, like LOG_TABLE_SCHEMA (table.rs:31-37); the
        # `columns` option narrows it for source-side projection pruning.
        return StructType(
            [LOG_TABLE_SCHEMA[name] for name in _parse_columns_option(self.options)]
        )

    def reader(self, schema: StructType) -> "LokiDataSourceReader":
        return LokiDataSourceReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "LokiDataSourceWriter":
        # Append-only, like the InsertOp::Append gate (table.rs:164-169).
        if overwrite:
            raise ValueError("loki data source only supports append mode")
        return LokiDataSourceWriter(self.options)

    def simpleStreamReader(self, schema: StructType) -> "LokiStreamReader":
        """Streaming tail of the log store — beyond the reference's surface
        (its scan is bounded, scan.rs:47-48); Spark's Structured Streaming
        makes the same range-query protocol incremental."""
        return LokiStreamReader(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool) -> "LokiStreamWriter":
        if overwrite:
            raise ValueError("loki data source only supports append mode")
        return LokiStreamWriter(self.options)


class LokiDataSourceReader(DataSourceReader):
    def __init__(self, options):
        self.endpoint = options.get("endpoint")
        if not self.endpoint:
            raise ValueError("loki reader requires option 'endpoint'")
        self.default_label = options.get("default_label")
        self.label_matchers = logql.parse_label_options(options.get("labels"))
        self.option_start = _parse_time_option(options.get("start"))
        self.option_end = _parse_time_option(options.get("end"))
        self.columns = _parse_columns_option(options)
        self.limit = int(options["limit"]) if options.get("limit") else None
        self.num_partitions = int(options.get("partitions", "1"))
        # Per-request page size for the UNBOUNDED scan path. Real Loki
        # truncates query_range responses at its server-side max
        # (`max_entries_limit_per_query`, default 5000); the reference
        # issues ONE request per scan (scan.rs:195-198) and silently
        # loses everything past that cap. We page forward instead —
        # deliberate safer-than-reference delta, see read().
        self.page_limit = int(options.get("page_limit", "5000"))
        if options.get("check_connection", "false").lower() == "true":
            loki_client.check_connection(self.endpoint)
        # Explicit LogQL line-filter segments (`|= x`, `|~ rx`, `!= x`,
        # `!~ rx`, ;-separated). The reference can push regex matches
        # because DataFusion's filter Exprs carry them (expr.rs:63-80);
        # Spark's pushFilters never delivers RLIKE/ILIKE, so this option is
        # the §7.4.2(b)-style route for store-side regex pruning. Like the
        # `labels` option, the user asserts the filter semantics.
        self.option_line_filters = logql.parse_line_filter_options(
            options.get("line_filters")
        )
        self.line_filters: list[str] = []
        self.pushed_start: int | None = None
        self.pushed_end: int | None = None

    def pushFilters(self, filters):
        """Exact-pushdown negotiation (≙ supports_filters_pushdown,
        table.rs:140-156): consume what LogQL expresses exactly, yield the
        rest back for Spark to evaluate post-scan."""
        result = logql.translate_filters(filters)
        self.line_filters = result.line_filters
        self.pushed_start = result.start_ns
        self.pushed_end = result.end_ns
        yield from result.unsupported

    def _time_range(self) -> tuple[int, int]:
        """Filter bounds win over options; default = last 30 days
        (≙ scan.rs:104-111, utils.rs:10-12)."""
        start = self.pushed_start if self.pushed_start is not None else self.option_start
        end = self.pushed_end if self.pushed_end is not None else self.option_end
        if start is None:
            start = logql.thirty_days_before_now_ns()
        if end is None:
            end = logql.current_timestamp_ns()
        return start, end

    def partitions(self):
        start, end = self._time_range()
        n = self.num_partitions
        if self.limit is not None or n <= 1 or end <= start:
            # limit is a global contract → single range query, like the
            # reference's UnknownPartitioning(1) (scan.rs:46).
            return [LokiRangePartition(start, end)]
        step = (end - start) // n
        cuts = [start + i * step for i in range(n)] + [end]
        return [LokiRangePartition(cuts[i], cuts[i + 1]) for i in range(n)]

    def _convert_batch(self, batch):
        """Project + convert one Arrow batch to the Spark-facing schema.
        Decode ONLY the projected parquet columns (≙ ProjectionMask::roots,
        scan.rs:203-206) — `SELECT line` must not pay to decode labels."""
        import pyarrow as pa

        arrays = []
        for name in self.columns:
            col = batch.column(name)
            if name == "timestamp":
                if pa.types.is_timestamp(col.type) and col.type.unit == "ns":
                    # ns → µs for Spark TimestampType (SURVEY.md §7.4.1)
                    col = col.cast(pa.timestamp("us"), safe=False)
                elif pa.types.is_integer(col.type):
                    col = (
                        pa.compute.divide(col, 1000)
                        .cast(pa.int64())
                        .cast(pa.timestamp("us"))
                    )
            arrays.append(col)
        return pa.RecordBatch.from_arrays(arrays, names=list(self.columns))

    @staticmethod
    def _ts_ns_ints(table):
        """The page's timestamp column as raw ns int64 (either physical
        encoding — TIMESTAMP(NANOS) or int64 nanos)."""
        import pyarrow as pa

        col = table.column("timestamp")
        if pa.types.is_timestamp(col.type):
            return col.cast(pa.int64())
        return col

    def read(self, partition: LokiRangePartition):
        """Executor-side: bounded range queries → Arrow batches
        (≙ LokiLogScanExec::execute + fetch_log_stream, scan.rs:90-216).

        Deliberate safer-than-reference delta: the UNBOUNDED path pages
        forward. Real Loki truncates each query_range response at the
        server's max-entries cap; the reference's single request
        (scan.rs:195-198) silently drops every row past it. Here each
        page asks for `page_limit` rows (direction=forward); a full page
        means more data may remain, so rows carrying the page's maximum
        timestamp are withheld (the server may have cut mid-timestamp)
        and the next page restarts AT that timestamp, re-reading them in
        full — no row lost, none duplicated. A full page at a single
        timestamp (> page_limit rows in one ns) cannot make progress
        that way; it is emitted as-is and the scan steps 1 ns past it —
        the one truncation case left, flagged loudly in the docstring
        rather than hit silently. With a user `limit` the single-request
        contract stands (the store's first-n IS the answer)."""
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        query = logql.build_logql(
            self.label_matchers,
            self.option_line_filters + self.line_filters,
            self.default_label,
        )
        if self.limit is not None:
            body = loki_client.query_range(
                self.endpoint, query, partition.start_ns, partition.end_ns,
                self.limit,
            )
            if not body:
                return
            reader = pq.ParquetFile(io.BytesIO(body))
            # Stream in bounded batches like the reference's 4096-row
            # decode (scan.rs:209); arrow slices are zero-copy.
            for batch in reader.iter_batches(
                batch_size=4096, columns=list(self.columns)
            ):
                yield self._convert_batch(batch)
            return

        cur = partition.start_ns
        while True:
            body = loki_client.query_range(
                self.endpoint, query, cur, partition.end_ns, self.page_limit
            )
            if not body:
                return
            # decode the projected columns + timestamp (needed for the
            # page-boundary arithmetic even when not projected)
            page_cols = list(
                dict.fromkeys(list(self.columns) + ["timestamp"])
            )
            table = pq.ParquetFile(io.BytesIO(body)).read(columns=page_cols)
            if table.num_rows == 0:
                return
            if table.num_rows < self.page_limit:
                emit = table  # final page
            else:
                ts = self._ts_ns_ints(table)
                max_ts = pa.compute.max(ts).as_py()
                min_ts = pa.compute.min(ts).as_py()
                if max_ts == min_ts:
                    # degenerate full page at one ns: emit and step past
                    emit = table
                    cur = max_ts + 1
                else:
                    emit = table.filter(pa.compute.less(ts, pa.scalar(max_ts)))
                    cur = max_ts
            for batch in emit.select(list(self.columns)).to_batches(
                max_chunksize=4096
            ):
                yield self._convert_batch(batch)
            if table.num_rows < self.page_limit or cur >= partition.end_ns:
                return


@dataclass
class LokiCommitMessage(WriterCommitMessage):
    """Per-task row count — aggregated in commit() to reproduce the
    reference's single-row `count` result (insert.rs:104-140)."""

    count: int


class LokiDataSourceWriter(DataSourceWriter):
    """Push-sink writer (≙ insert.rs:104-140).

    Delivery contract: AT-LEAST-ONCE. Pushes are per-task and durable the
    moment the store accepts them (Loki has no transaction), so a task
    that fails after a partial flush is retried by Spark and re-pushes
    its rows — duplicates, not loss. Identical to the reference's
    failure semantics (its insert loop has no rollback either,
    insert.rs:104-131); deduplicate downstream on (timestamp, labels,
    line) if exactly-once matters."""

    def __init__(self, options):
        self.endpoint = options.get("endpoint")
        if not self.endpoint:
            raise ValueError("loki writer requires option 'endpoint'")
        self.batch_rows = int(options.get("batch_rows", "4096"))

    def write(self, iterator) -> LokiCommitMessage:
        """Rows → push JSON → POST, one request per buffered batch
        (≙ LokiLogInsertExec stream drain, insert.rs:94-113,167-207).

        The reference emits one stream object per row (insert.rs:186-206);
        we group consecutive rows by identical label set into one stream —
        same data, fewer JSON bytes (allowed: Loki's push contract is
        per-stream batched values).
        """
        count = 0
        streams: list[dict] = []
        pending = 0

        def flush():
            nonlocal streams, pending
            if streams:
                loki_client.push(self.endpoint, streams)
                streams = []
                pending = 0

        for row in iterator:
            ts, labels, line = row[0], row[1], row[2]
            if ts is None or labels is None or line is None:
                raise ValueError(
                    "loki writer requires non-null (timestamp, labels, line)"
                )
            # naive ts = host-local wall time (TimestampType.fromInternal);
            # .timestamp() inverts that exactly — see logql.datetime_to_ns
            ns = int(ts.timestamp() * 1_000_000) * 1_000
            stream_labels = dict(labels)
            value = [str(ns), line]
            if streams and streams[-1]["stream"] == stream_labels:
                streams[-1]["values"].append(value)
            else:
                streams.append({"stream": stream_labels, "values": [value]})
            count += 1
            pending += 1
            if pending >= self.batch_rows:
                flush()
        flush()
        return LokiCommitMessage(count=count)

    def commit(self, messages) -> None:
        # Per-task pushes are already durable (Loki has no transaction to
        # finalize), and Spark's INSERT returns no rows (SURVEY.md §7.4.4)
        # so the per-task counts in `messages` have no driver-side outlet;
        # the reference's one-row count result (insert.rs:26-32,136-140)
        # is surfaced by insert_into_loki, which counts the persisted
        # input frame it writes — one code path for the number.
        pass

    def abort(self, messages) -> None:
        pass


class LokiStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch tail over query_range: each batch reads
    [last_offset_ns, now) — the incremental analogue of the reference's
    bounded scan. Offsets are plain ns epochs (JSON-serializable for the
    checkpoint log); replay of [start, end) is deterministic against the
    store, giving at-least-once on failure like any range-poll source."""

    def __init__(self, options):
        self.endpoint = options.get("endpoint")
        if not self.endpoint:
            raise ValueError("loki stream reader requires option 'endpoint'")
        self.default_label = options.get("default_label")
        self.label_matchers = logql.parse_label_options(options.get("labels"))
        self.option_line_filters = logql.parse_line_filter_options(
            options.get("line_filters")
        )
        start = _parse_time_option(options.get("start"))
        self.start_ns = start if start is not None else logql.current_timestamp_ns()
        self.page_limit = int(options.get("page_limit", "5000"))

    def initialOffset(self) -> dict:
        return {"ns": self.start_ns}

    @staticmethod
    def _rows(table):
        """Arrow page → python rows. ns → µs (Spark TimestampType
        precision), tz-aware datetimes so the pickle row path converts
        cleanly."""
        import pyarrow as pa

        ts_col = table.column("timestamp").cast(
            pa.timestamp("us", tz="UTC"), safe=False
        )
        rows = []
        for ts, labels, line in zip(
            ts_col.to_pylist(),
            table.column("labels").to_pylist(),
            table.column("line").to_pylist(),
        ):
            labels_map = dict(labels) if isinstance(labels, list) else labels
            rows.append((ts, labels_map, line))
        return rows

    def _fetch(self, start_ns: int, end_ns: int):
        """Page forward through [start_ns, end_ns) — a micro-batch that
        accumulated more rows than the server's per-request cap must not
        silently truncate (same boundary rule as the batch reader: a full
        page withholds its max-timestamp rows and the next page restarts
        AT that timestamp)."""
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        query = logql.build_logql(
            self.label_matchers, self.option_line_filters, self.default_label
        )
        out: list = []
        cur = start_ns
        while True:
            body = loki_client.query_range(
                self.endpoint, query, cur, end_ns, self.page_limit
            )
            if not body:
                return out
            table = pq.read_table(io.BytesIO(body))
            if table.num_rows == 0:
                return out
            if table.num_rows < self.page_limit:
                out.extend(self._rows(table))
                return out
            ts = table.column("timestamp")
            ts_int = (
                ts.cast(pa.int64()) if pa.types.is_timestamp(ts.type) else ts
            )
            max_ts = pa.compute.max(ts_int).as_py()
            if max_ts == pa.compute.min(ts_int).as_py():
                out.extend(self._rows(table))  # degenerate single-ns page
                cur = max_ts + 1
            else:
                out.extend(
                    self._rows(
                        table.filter(pa.compute.less(ts_int, pa.scalar(max_ts)))
                    )
                )
                cur = max_ts
            if cur >= end_ns:
                return out

    def read(self, start: dict):
        end_ns = logql.current_timestamp_ns()
        rows = self._fetch(start["ns"], end_ns)
        return iter(rows), {"ns": end_ns}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery
        return iter(self._fetch(start["ns"], end["ns"]))


class LokiStreamWriter(DataSourceStreamWriter):
    """Streaming sink: same push protocol as the batch writer, per
    micro-batch epoch. commit/abort per epoch mirror the batch writer's
    count aggregation."""

    def __init__(self, options):
        self._batch = LokiDataSourceWriter(options)

    def write(self, iterator) -> LokiCommitMessage:
        return self._batch.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        # as in the batch writer: pushes are durable per-task and the
        # epoch's count has no outlet in Spark's streaming sink API
        pass

    def abort(self, messages, batchId: int) -> None:
        pass
