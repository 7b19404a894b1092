"""Spark-4 Python DataSource implementations (SURVEY §2.1 S6 landing).

The reference ingests product pages with a single-process requests loop
(``scripts/extract/products_scraping.py:82-91``).  ``sources/http.fetch_pages``
already distributes that as a ``mapInPandas`` stage; this module goes one step
further and exposes the same ingestion as a *first-class Spark data source*
via the PySpark 4 Python DataSource API, so a user can write

    spark.dataSource.register(PageFetchDataSource)
    spark.read.format("bytesme_pages").option("urls", ...).load()

and get a real scan node in the plan: the URL frontier is split into input
partitions at planning time (each partition = one task on the cluster), and
supported predicates on ``url`` are pushed INTO the scan so pruned pages are
never fetched at all — the scan-time prune that matters at crawl scale.

Scale notes (100 TB / large-crawl target):
* one ``InputPartition`` per frontier slice → natural task parallelism; the
  slice count is an option, not a repartition after the fact.
* ``pushFilters`` prunes the frontier before any network I/O. Unsupported
  filters are returned to Spark, which re-applies them post-scan — semantics
  never change, pushdown is purely an optimization.
* the streaming source tracks a monotonically increasing row index as its
  offset — the same contract a Kafka offset range satisfies — so the
  micro-batch planner gets exactly-once replay across restarts for free.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    StringContains,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

# ---------------------------------------------------------------------------
# Batch: page-fetch frontier as a data source
# ---------------------------------------------------------------------------

PAGES_SCHEMA = "url string, status int, body string, error string"


def _resolve_fetcher(name: str):
    """Options are strings (they cross the pickling boundary), so the fetcher
    is chosen by registry name rather than passed as a callable."""
    from .http import mock_fetcher, urllib_fetcher

    if name == "mock":
        return mock_fetcher
    if name == "urllib":
        return urllib_fetcher()
    raise ValueError(f"unknown fetcher {name!r} (expected 'mock' or 'urllib')")


@dataclass
class _UrlSlice(InputPartition):
    urls: list


class PageFetchReader(DataSourceReader):
    def __init__(self, options: dict):
        raw = options.get("urls", "")
        self._urls = [u.strip() for u in raw.replace(",", "\n").splitlines() if u.strip()]
        self._num_partitions = int(options.get("numpartitions", "4"))
        self._fetcher_name = options.get("fetcher", "mock")

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:  # noqa: F821
        """Prune the frontier on url predicates; everything else is handed
        back to Spark to evaluate after the scan."""
        unsupported = []
        for f in filters:
            if isinstance(f, StringStartsWith) and f.attribute == ("url",):
                self._urls = [u for u in self._urls if u.startswith(f.value)]
            elif isinstance(f, StringContains) and f.attribute == ("url",):
                self._urls = [u for u in self._urls if f.value in u]
            elif isinstance(f, EqualTo) and f.attribute == ("url",):
                self._urls = [u for u in self._urls if u == f.value]
            elif isinstance(f, In) and f.attribute == ("url",):
                allowed = set(f.values)
                self._urls = [u for u in self._urls if u in allowed]
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self) -> Sequence[InputPartition]:
        n = max(1, min(self._num_partitions, len(self._urls)) or 1)
        slices = [self._urls[i::n] for i in range(n)]
        return [_UrlSlice(urls=s) for s in slices if s] or [_UrlSlice(urls=[])]

    def read(self, partition: _UrlSlice) -> Iterator[tuple]:
        fetch = _resolve_fetcher(self._fetcher_name)
        for url in partition.urls:
            try:
                status, body = fetch(url)
                yield (url, status, body, None)
            except Exception as e:  # per-URL isolation, like the reference's per-file guard
                yield (url, None, None, str(e))


class PageFetchDataSource(DataSource):
    """``spark.read.format("bytesme_pages")`` — distributed page fetch."""

    @classmethod
    def name(cls) -> str:
        return "bytesme_pages"

    def schema(self) -> str:
        return PAGES_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return PageFetchReader(self.options)


# ---------------------------------------------------------------------------
# Streaming: deterministic event replay as a micro-batch stream source
# ---------------------------------------------------------------------------

EVENTS_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"

_EVENT_TYPES = ["view", "cart", "purchase", "review", "search"]
_BASE_EPOCH_S = 1_700_000_000  # fixed so replays are bit-identical


def _event_row(i: int) -> tuple:
    import datetime

    h = hashlib.md5(str(i).encode()).digest()
    ts = datetime.datetime.utcfromtimestamp(_BASE_EPOCH_S + i)
    return (
        i,
        ts,
        h[0] % 97,
        _EVENT_TYPES[h[1] % len(_EVENT_TYPES)],
        round((h[2] * 256 + h[3]) / 100.0, 2),
    )


@dataclass
class _IndexRange(InputPartition):
    start: int
    end: int


class EventReplayStreamReader(DataSourceStreamReader):
    """Offset = next unread row index (monotone), the Kafka-shaped contract:
    ``partitions(start, end)`` plans the half-open index range [start, end)
    across N tasks and ``read`` regenerates rows deterministically, so a
    restarted query re-reads an identical batch.

    Restart semantics: the engine never hands the reader the committed
    offset before consulting ``latestOffset()``, so a self-advancing
    "latest" restarts from 0 on a CLEAN (all-committed) restart — the next
    availableNow run would plan ``[committed, small)`` (empty) and drain
    nothing, forever. Pass ``statepath`` (a local file) to persist the
    high-water mark across restarts, the external-position-tracking shape
    a real broker gives you for free (Kafka asks the broker for latest;
    a synthetic generator must remember its own). Without ``statepath``
    the reader is single-lifetime: correct within one process (the
    ``partitions`` bump covers the uncommitted-replay path), documented
    not to resume cleanly across one."""

    def __init__(self, options: dict):
        self._rows_per_batch = int(options.get("rowsperbatch", "100"))
        self._max_rows = int(options.get("maxrows", "-1"))
        self._num_partitions = int(options.get("numpartitions", "2"))
        self._state_path = options.get("statepath")
        self._latest = self._load_high_water()

    def _load_high_water(self) -> int:
        import os

        if self._state_path and os.path.exists(self._state_path):
            text = open(self._state_path).read().strip()
            return int(text) if text else 0
        return 0

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        self._latest += self._rows_per_batch
        if self._max_rows >= 0:
            self._latest = min(self._latest, self._max_rows)
        return {"index": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["index"], end["index"]
        # On a checkpointed restart this reader is rebuilt with _latest = 0
        # while the committed start offset is further along; without this
        # bump latestOffset() would trail the committed position and the
        # stream would emit empty batches until _latest catches up.
        self._latest = max(self._latest, lo, hi)
        if hi <= lo:
            return [_IndexRange(lo, lo)]
        n = max(1, self._num_partitions)
        step = max(1, (hi - lo + n - 1) // n)
        return [_IndexRange(s, min(s + step, hi)) for s in range(lo, hi, step)]

    def read(self, partition: _IndexRange) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _event_row(i)

    def commit(self, end: dict) -> None:
        # keep the in-memory position monotone, and persist the high-water
        # mark when statepath is configured (atomic replace: a crash
        # mid-write leaves the previous mark, which only means one extra
        # replayed-then-deduped batch — offsets are deterministic)
        self._latest = max(self._latest, int(end["index"]))
        if self._state_path:
            import os

            tmp = self._state_path + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(self._latest))
            os.replace(tmp, self._state_path)

    def stop(self) -> None:
        pass


class EventReplayDataSource(DataSource):
    """``spark.readStream.format("bytesme_event_replay")`` — deterministic
    event stream for exercising watermarked/windowed sinks without Kafka."""

    @classmethod
    def name(cls) -> str:
        return "bytesme_event_replay"

    def schema(self) -> str:
        return EVENTS_SCHEMA

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return EventReplayStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Idempotent registration of all Python sources on a session."""
    spark.dataSource.register(PageFetchDataSource)
    spark.dataSource.register(EventReplayDataSource)
    spark.dataSource.register(JsonLinesDataSource)


# ---------------------------------------------------------------------------
# Batch WRITER: JSON-lines sink with two-phase commit (the fourth quadrant
# of the Python DataSource API — batch read / stream read are above, this
# adds batch write with task-attempt isolation and an atomic publish).
# ---------------------------------------------------------------------------


@dataclass
class JsonLinesCommit(WriterCommitMessage):
    partition_id: int
    tmp_path: str
    n_rows: int


class JsonLinesWriter(DataSourceWriter):
    """Per-task writer: each partition lands in a uniquely-named temp file
    (task attempts never collide — speculative/retried attempts write
    side-by-side and only the committed one survives); ``commit`` on the
    driver renames the winners into place and writes a ``_SUCCESS``
    marker, ``abort`` removes the orphans. The same protocol every
    production sink uses (FileOutputCommitter v2 shape)."""

    def __init__(self, options: dict, overwrite: bool = False):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("bytesme_jsonl writer requires path")
        self.overwrite = overwrite
        # Distinct names per job: append mode promotes to
        # part-{job_id}-{pid}.jsonl so a second write never replaces a
        # prior job's same-index parts (the driver constructs the writer,
        # so this id is consistent across all task attempts of one job).
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = ctx.taskAttemptId() if ctx else uuid.uuid4().int % 10**9
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".part-{pid:05d}-{attempt}.jsonl.tmp")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), ensure_ascii=False, default=str))
                f.write("\n")
                n += 1
        return JsonLinesCommit(partition_id=pid, tmp_path=tmp, n_rows=n)

    def commit(self, messages) -> None:
        import os

        # Loss-proof publish ordering for overwrite: (1) snapshot the
        # prior job's part names, (2) drop _SUCCESS so the directory is
        # visibly mid-publish, (3) promote this job's parts under
        # job-unique names (never collide with prior parts), (4) only
        # THEN remove the prior parts, (5) re-mark _SUCCESS. A crash at
        # any point leaves every committed row on disk — worst case a
        # mixed directory with no _SUCCESS, which a re-run converges.
        # (Deleting before promoting would open a window where the old
        # data is gone and the new data is only dot-prefixed temps that
        # the next job sweeps as speculative losers.)
        #
        # The whole method is IDEMPOTENT for one job (property-tested with
        # crash injection at every os-call index): a retried commit after
        # a partial promotion must (a) skip messages whose temp already
        # promoted — os.replace would raise on the missing source — and
        # (b) never count this job's OWN freshly-promoted parts as stale.
        success = os.path.join(self.path, "_SUCCESS")
        own_prefix = f"part-{self.job_id}-"
        stale = (
            [
                f
                for f in os.listdir(self.path)
                if f.startswith("part-")
                and f.endswith(".jsonl")
                and not f.startswith(own_prefix)
            ]
            if self.overwrite
            else []
        )
        # BOTH modes drop _SUCCESS before promoting: an append that
        # crashes mid-promotion must not leave a half-appended directory
        # under the previous job's still-valid marker.
        if os.path.exists(success):
            os.remove(success)
        for m in messages:
            final = os.path.join(
                self.path, f"{own_prefix}{m.partition_id:05d}.jsonl"
            )
            if os.path.exists(m.tmp_path):
                os.replace(m.tmp_path, final)
            elif not os.path.exists(final):
                raise OSError(
                    f"lost part {m.partition_id}: neither {m.tmp_path} "
                    f"nor {final} exists"
                )
        for f in stale:
            try:
                os.remove(os.path.join(self.path, f))
            except FileNotFoundError:
                pass  # a prior partially-crashed commit already removed it
        # losers of speculative execution: any leftover temp files
        for f in os.listdir(self.path):
            if f.startswith(".part-") and f.endswith(".tmp"):
                os.remove(os.path.join(self.path, f))
        with open(success, "w") as f:
            f.write("")

    def abort(self, messages) -> None:
        import os

        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass


class JsonLinesDataSource(DataSource):
    """``df.write.format("bytesme_jsonl").option("path", ...).save()`` —
    newline-delimited JSON with exactly-once publish semantics."""

    @classmethod
    def name(cls) -> str:
        return "bytesme_jsonl"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return JsonLinesWriter(self.options, overwrite=overwrite)
