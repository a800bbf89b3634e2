"""File-protocol Kafka broker + PySpark Python Data Source transport.

Kafka is the reference's front-door connector — every streaming demo
starts with a kafka DDL (/root/reference/docs/sql_demo/demo_1.md §2,
demo_2.md, demo_6.md §2.2.1). This container has neither a broker nor
the spark-sql-kafka jar, so the connector's LIVE path runs on PySpark
4's public Python Data Source API instead of format("kafka"): a
directory is the broker, each topic a subdirectory, each partition an
append-only JSONL segment whose line number IS the record offset.

The data source reproduces the real kafka source's contract exactly —
output schema (key/value binary, topic, partition, offset, timestamp,
timestampType), per-partition monotonic offsets, startingOffsets
earliest/latest and timestamp-based starting positions — so the whole
DDL option mapping, the json/debezium-json codecs, and the sink
key/payload layout are exercised end-to-end for real. Deployments
point 'properties.bootstrap.servers' at a real broker and the
transport swaps back to format("kafka") with zero query changes; a
``file://`` server URI selects this transport.

Scale posture: reads are executor-parallel (one input partition per
kafka partition, exactly the real source's planning); the offset
bookkeeping on the driver is O(partitions + newly-appended bytes)
per micro-batch — a per-segment incremental index (``_SegIndex``)
remembers the last-counted byte position and a sparse line→byte
checkpoint list, so ``latestOffset()`` only scans data appended
since the previous micro-batch (O(partitions) stat calls when idle)
and executors seek near their start offset instead of re-reading
each segment from byte 0. The sink
writes executor-side and publishes on the driver at commit (one
append per partition per epoch, idempotent via a per-writer epoch
ledger) — fine for the harness role; a production deployment uses the
JVM kafka sink's transactional producer instead.
"""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass
from datetime import datetime, timezone
from hashlib import md5
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

BROKER_SCHEME = "file://"

#: the real kafka source's output schema, verbatim
KAFKA_SCHEMA = (
    "key BINARY, value BINARY, topic STRING, partition INT,"
    " offset BIGINT, timestamp TIMESTAMP, timestampType INT"
)


def broker_path(options: dict) -> str | None:
    """The file-broker directory if this table's bootstrap servers use
    the file transport, else None (→ real format("kafka"))."""
    servers = options.get("properties.bootstrap.servers", "")
    if servers.startswith(BROKER_SCHEME):
        return servers[len(BROKER_SCHEME):]
    return options.get("graft.broker-path") or None


def _segment(path: str | Path, topic: str, partition: int) -> Path:
    return Path(path) / topic / f"p{partition:05d}.jsonl"


class _SegIndex:
    """Incremental bookkeeping for one append-only segment: total
    complete lines seen, the byte position after the last complete
    line, and a sparse (line_no, byte_pos) checkpoint list every
    ``CHECKPOINT_EVERY`` lines. ``update()`` stats the file and scans
    only bytes appended since the previous call — O(1) when nothing
    arrived — so the driver's per-micro-batch offset snapshot stops
    re-reading every segment end-to-end, and ``seek_hint()`` gives
    executors a near-start byte position to seek to."""

    CHECKPOINT_EVERY = 512

    def __init__(self) -> None:
        self.bytes = 0
        self.lines = 0
        self.ckpts: list[tuple[int, int]] = [(0, 0)]

    def update(self, seg: Path) -> int:
        try:
            size = seg.stat().st_size
        except OSError:
            self.__init__()
            return 0
        if size < self.bytes:  # segment replaced/truncated — rebuild
            self.__init__()
        if size == self.bytes:
            return self.lines
        with open(seg, "rb") as f:
            f.seek(self.bytes)
            for line in f:
                if not line.endswith(b"\n"):
                    break  # torn tail append — count it next call
                self.bytes += len(line)
                self.lines += 1
                if self.lines % self.CHECKPOINT_EVERY == 0:
                    self.ckpts.append((self.lines, self.bytes))
        return self.lines

    def seek_hint(self, line_no: int) -> tuple[int, int]:
        """Largest checkpoint (line, byte) with line <= line_no."""
        import bisect

        i = bisect.bisect_right(self.ckpts, (line_no, 1 << 62)) - 1
        return self.ckpts[max(i, 0)]


#: driver-side index cache, keyed by segment path (segments are
#: append-only; a size regression resets the entry)
_SEG_INDEX: dict[str, _SegIndex] = {}


def _seg_index(seg: Path) -> _SegIndex:
    idx = _SEG_INDEX.setdefault(str(seg), _SegIndex())
    idx.update(seg)
    return idx


class FileBroker:
    """Producer/admin API over the broker directory. Appends are one
    ``write()`` of one ``\\n``-terminated line per record — atomic at
    POSIX pipe-buffer sizes, so concurrent producers interleave whole
    records, like kafka's per-record append."""

    def __init__(self, path: str | Path) -> None:
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)
        self._rr: dict[str, int] = {}  # round-robin cursor per topic

    def create_topic(self, topic: str, partitions: int = 1) -> None:
        d = self.path / topic
        d.mkdir(parents=True, exist_ok=True)
        for p in range(partitions):
            _segment(self.path, topic, p).touch()

    def partitions(self, topic: str) -> int:
        d = self.path / topic
        if not d.is_dir():
            return 0
        return len(list(d.glob("p*.jsonl")))

    def _partition_ids(self, topic: str) -> list[int]:
        """Actual partition ids present on disk (robust to a sparse
        layout where e.g. only p00005 exists — ADVICE r04)."""
        d = self.path / topic
        if not d.is_dir():
            return []
        return sorted(int(s.stem[1:]) for s in d.glob("p*.jsonl"))

    def produce(
        self,
        topic: str,
        value: bytes | str,
        key: bytes | str | None = None,
        partition: int | None = None,
        timestamp_ms: int | None = None,
    ) -> None:
        n = self.partitions(topic)
        if n == 0:  # kafka auto.create.topics.enable parity
            self.create_topic(topic, 1)
            n = 1
        if partition is not None and not 0 <= partition < n:
            # real kafka rejects a produce to a nonexistent partition;
            # accepting it here would create a sparse segment layout
            # that breaks contiguous-offset planning (ADVICE r04)
            raise ValueError(
                f"partition {partition} out of range for topic"
                f" {topic!r} with {n} partition(s)"
            )
        if partition is None:
            if key is not None:
                k = key if isinstance(key, bytes) else key.encode()
                # deterministic keyed partitioner (md5, not murmur2 —
                # same guarantee: equal keys land in one partition)
                partition = int.from_bytes(md5(k).digest()[:4], "big") % n
            else:
                partition = self._rr.get(topic, 0) % n
                self._rr[topic] = partition + 1
        rec = {
            "k": _b64(key),
            "v": _b64(value),
            "ts": int(timestamp_ms) if timestamp_ms is not None else 0,
        }
        with open(_segment(self.path, topic, partition), "a") as f:
            f.write(json.dumps(rec, separators=(",", ":")) + "\n")

    def end_offsets(self, topic: str) -> dict[int, int]:
        """Per-partition next offset. Enumerates the segment files
        actually on disk and counts lines incrementally via the
        driver-side ``_SegIndex`` cache — O(partitions) stat calls
        plus only the bytes appended since the previous call."""
        out = {}
        for p in self._partition_ids(topic):
            seg = _segment(self.path, topic, p)
            out[p] = _seg_index(seg).lines
        return out


def _b64(x: bytes | str | None) -> str | None:
    if x is None:
        return None
    if isinstance(x, str):
        x = x.encode()
    return base64.b64encode(x).decode()


def _un_b64(x: str | None) -> bytes | None:
    return None if x is None else base64.b64decode(x)


@dataclass
class _Range(InputPartition):
    path: str
    topic: str
    partition: int
    start: int
    end: int
    # driver-computed seek hint: byte position of line ``hint_line``
    # (a _SegIndex checkpoint <= start), so the executor seeks close
    # to its range instead of re-reading the segment from byte 0
    hint_line: int = 0
    hint_byte: int = 0


def _read_range(rng: _Range):
    """Executor-side record iterator for one partition range."""
    seg = _segment(rng.path, rng.topic, rng.partition)
    with open(seg, "rb") as f:
        f.seek(rng.hint_byte)
        for off, line in enumerate(f, start=rng.hint_line):
            if off < rng.start:
                continue
            if off >= rng.end:
                break
            rec = json.loads(line)
            yield (
                _un_b64(rec.get("k")),
                _un_b64(rec.get("v")),
                rng.topic,
                rng.partition,
                off,
                datetime.fromtimestamp(rec.get("ts", 0) / 1e3, timezone.utc),
                0,  # TimestampType.CREATE_TIME
            )


def _offsets_snapshot(path: str, topics: list[str]) -> dict[str, int]:
    broker = FileBroker(path)
    out = {}
    for t in topics:
        for p, end in broker.end_offsets(t).items():
            out[f"{t}/{p}"] = end
    return out


def _offset_for_timestamp(path: str, topics: list[str], millis: int):
    """kafka's offsetsForTimes: per partition, the first offset whose
    record timestamp is >= the requested position."""
    out = {}
    broker = FileBroker(path)
    for t in topics:
        for p, end in broker.end_offsets(t).items():
            first = end
            seg = _segment(path, t, p)
            with open(seg, "rb") as f:
                for off, line in enumerate(f):
                    if json.loads(line).get("ts", 0) >= millis:
                        first = off
                        break
            out[f"{t}/{p}"] = first
    return out


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.topics = [
            t.strip() for t in options.get("subscribe", "").split(",")
            if t.strip()
        ]
        if not self.topics:
            raise ValueError("graft-kafka requires 'subscribe'")
        self.starting = options.get("startingoffsets", "latest").lower()
        self.starting_ts = options.get("startingtimestamp")

    def initialOffset(self) -> dict:
        if self.starting_ts is not None:
            return _offset_for_timestamp(
                self.path, self.topics, int(self.starting_ts)
            )
        if self.starting == "earliest":
            return {
                k: 0
                for k in _offsets_snapshot(self.path, self.topics)
            }
        return _offsets_snapshot(self.path, self.topics)

    def latestOffset(self) -> dict:
        return _offsets_snapshot(self.path, self.topics)

    def partitions(self, start: dict, end: dict):
        out = []
        for key, e in end.items():
            s = start.get(key, 0)  # new partition → from its beginning
            if e > s:
                topic, _, p = key.rpartition("/")
                seg = _segment(self.path, topic, int(p))
                # nearest driver-index checkpoint at/below the start
                # offset — the executor seeks there (kafka's planner
                # ships start offsets the same way)
                hl, hb = _seg_index(seg).seek_hint(s)
                out.append(_Range(self.path, topic, int(p), s, e, hl, hb))
        return out

    def read(self, partition: _Range):
        return _read_range(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint, like real kafka


class _BatchReader(DataSourceReader):
    """Bounded earliest→latest read (spark.read on a kafka table)."""

    def __init__(self, options: dict) -> None:
        self._stream = _StreamReader(options)

    def partitions(self):
        end = _offsets_snapshot(self._stream.path, self._stream.topics)
        start = (
            _offset_for_timestamp(
                self._stream.path,
                self._stream.topics,
                int(self._stream.starting_ts),
            )
            if self._stream.starting_ts is not None
            else {k: 0 for k in end}
        )
        parts = self._stream.partitions(start, end)
        # Spark requires >=1 partition; an empty topic reads nothing
        return parts or [_Range(self._stream.path, "", 0, 0, 0)]

    def read(self, partition: _Range):
        if not partition.topic:
            return iter(())
        return _read_range(partition)


@dataclass
class _Staged(WriterCommitMessage):
    """Records staged by one task, published by the driver at commit.
    Test-scale volumes ride in the message itself; the per-writer
    epoch ledger makes the publish idempotent under task retries."""

    lines: list[str]


class _StreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict, writer_id: str) -> None:
        self.path = options["path"]
        self.topic = options["topic"]
        self.writer_id = writer_id

    def write(self, rows) -> _Staged:
        lines = []
        for row in rows:
            d = row.asDict()
            lines.append(
                json.dumps(
                    {
                        "k": _b64(d.get("key")),
                        "v": _b64(d.get("value")),
                        "ts": 0,  # log order is the apply order
                    },
                    separators=(",", ":"),
                )
            )
        return _Staged(lines)

    def commit(self, messages, batchId: int) -> None:
        broker = FileBroker(self.path)
        n = broker.partitions(self.topic) or 1
        broker.create_topic(self.topic, n)
        ledger = Path(self.path) / self.topic / f".epoch_{self.writer_id}"
        if ledger.exists() and int(ledger.read_text()) >= batchId:
            return  # epoch replay — already published
        for msg in messages:
            if msg is None:
                continue
            for line in msg.lines:
                rec = json.loads(line)
                key = _un_b64(rec.get("k"))
                # keyed records partition by key (log-compaction
                # upsert contract); keyless ones round-robin
                broker.produce(
                    self.topic,
                    _un_b64(rec.get("v")) or b"",
                    key=key,
                    timestamp_ms=rec.get("ts", 0),
                )
        ledger.write_text(str(batchId))

    def abort(self, messages, batchId: int) -> None:
        pass  # nothing published until commit


class _BatchWriter(DataSourceWriter):
    def __init__(self, options: dict, writer_id: str) -> None:
        self._w = _StreamWriter(options, writer_id)

    def write(self, rows) -> _Staged:
        return self._w.write(rows)

    def commit(self, messages) -> None:
        self._w.commit(messages, 0)

    def abort(self, messages) -> None:
        pass


class GraftKafkaDataSource(DataSource):
    """``format("graft-kafka")`` — the file-transport kafka source/sink.

    Options: path (broker dir), subscribe (topics, comma-separated) /
    topic (sink), startingOffsets earliest|latest, startingTimestamp
    (ms). Registered per-session by sources.registry when a table's
    bootstrap servers carry the file:// scheme."""

    def __init__(self, options) -> None:
        super().__init__(options)
        self._options = {k.lower(): v for k, v in dict(options).items()}

    @classmethod
    def name(cls) -> str:
        return "graft-kafka"

    def schema(self) -> str:
        return KAFKA_SCHEMA

    def streamReader(self, schema) -> _StreamReader:
        return _StreamReader(self._options)

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(self._options)

    def streamWriter(self, schema, overwrite: bool) -> _StreamWriter:
        return _StreamWriter(self._options, self._writer_id())

    def writer(self, schema, overwrite: bool) -> _BatchWriter:
        return _BatchWriter(self._options, self._writer_id())

    def _writer_id(self) -> str:
        # stable across epoch replays of ONE query run (the instance
        # is pickled once per run), distinct across runs/queries
        import uuid

        if "writer_id" not in self.__dict__:
            self.writer_id = uuid.uuid4().hex[:12]
        return self.writer_id


def ensure_registered(spark) -> None:
    """Register the data source with THIS session's manager.

    The registry is per-SparkSession, so the old dedupe-by-
    applicationId skipped spark.newSession() clones and their reads
    died with DATA_SOURCE_NOT_FOUND (ADVICE r04). Unconditional
    registration is not enough either: registerPython's duplicate
    check consults the JVM *active* session, so registering a clone
    while the parent is active raises DATA_SOURCE_ALREADY_EXISTS yet
    leaves the clone's own manager empty. Skip if this session's
    manager already has it, else register with this session pinned
    active, restoring the previous active session after."""
    try:
        mgr = spark._jsparkSession.sessionState().dataSourceManager()
        if mgr.dataSourceExists(GraftKafkaDataSource.name()):
            return
    except Exception:
        pass  # Connect or API drift: fall through and just register
    jvm_cls = getattr(spark, "_jvm", None)
    prev = None
    if jvm_cls is not None:
        jvm_cls = spark._jvm.org.apache.spark.sql.classic.SparkSession
        prev = jvm_cls.getActiveSession()
        jvm_cls.setActiveSession(spark._jsparkSession)
    try:
        spark.dataSource.register(GraftKafkaDataSource)
    finally:
        if jvm_cls is not None and prev is not None and prev.isDefined():
            jvm_cls.setActiveSession(prev.get())
