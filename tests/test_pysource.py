"""Python DataSource API sources (sources/pysource.py).

Covers: batch scan partitioning, per-URL error isolation, frontier pruning
via pushFilters (both the unit-level prune and the end-to-end query), and the
deterministic replay stream source's exactly-once offset contract.
"""

from __future__ import annotations

import time

import pytest

from bytesme_etl_batch_pipeline_spark.sources.pysource import (
    EventReplayStreamReader,
    PageFetchReader,
    _event_row,
    register_python_sources,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_python_sources(spark)


def _urls(n: int) -> str:
    return ",".join(f"https://site{i % 3}.example/p{i}" for i in range(n))


def test_page_fetch_batch_scan(spark):
    df = (
        spark.read.format("bytesme_pages")
        .option("urls", _urls(20))
        .option("numPartitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # one task per frontier slice
    rows = df.collect()
    assert len(rows) == 20
    # mock fetcher yields a deterministic status per URL; every row has a body
    # or an error, never an unhandled exception
    assert all(r.status in (200, 404) for r in rows)
    assert all(r.body is not None and r.error is None for r in rows)


def test_page_fetch_pushdown_prunes_frontier_before_fetch():
    """pushFilters must shrink the planned work-list itself (the point is to
    never fetch pruned URLs), not rely on Spark's post-scan filter."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, StringStartsWith

    reader = PageFetchReader({"urls": _urls(20), "numpartitions": "4"})
    rest = list(
        reader.pushFilters(
            [StringStartsWith(("url",), "https://site1."), GreaterThan(("status",), 100)]
        )
    )
    # the url predicate is consumed, the status one is handed back to Spark
    assert len(rest) == 1 and isinstance(rest[0], GreaterThan)
    planned = [u for p in reader.partitions() for u in p.urls]
    expect = {f"https://site1.example/p{i}" for i in range(20) if i % 3 == 1}
    assert len(planned) == len(expect) and set(planned) == expect

    reader = PageFetchReader({"urls": _urls(20)})
    reader.pushFilters([EqualTo(("url",), "https://site0.example/p0")])
    assert [u for p in reader.partitions() for u in p.urls] == ["https://site0.example/p0"]


def test_page_fetch_pushdown_end_to_end(spark):
    df = (
        spark.read.format("bytesme_pages")
        .option("urls", _urls(20))
        .option("numPartitions", "4")
        .load()
        .filter("url LIKE 'https://site1.example%'")
    )
    assert df.count() == 7


def test_event_replay_offset_contract():
    """Offset planning is a pure function of (start, end): ranges tile the
    interval exactly and re-reading a partition regenerates identical rows."""
    r = EventReplayStreamReader({"rowsperbatch": "50", "maxrows": "120", "numpartitions": "3"})
    assert r.initialOffset() == {"index": 0}
    assert r.latestOffset() == {"index": 50}
    assert r.latestOffset() == {"index": 100}
    assert r.latestOffset() == {"index": 120}  # capped by maxRows
    assert r.latestOffset() == {"index": 120}  # stays capped

    parts = r.partitions({"index": 0}, {"index": 50})
    spans = sorted((p.start, p.end) for p in parts)
    assert spans[0][0] == 0 and spans[-1][1] == 50
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))  # no gap/overlap

    batch1 = [row for p in parts for row in r.read(p)]
    batch2 = [row for p in r.partitions({"index": 0}, {"index": 50}) for row in r.read(p)]
    assert batch1 == batch2  # deterministic replay
    assert _event_row(7) == _event_row(7)


def test_event_replay_stream_exactly_once(spark):
    q = (
        spark.readStream.format("bytesme_event_replay")
        .option("rowsPerBatch", "50")
        .option("maxRows", "120")
        .option("numPartitions", "3")
        .load()
        .writeStream.format("memory")
        .queryName("replay_test")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql("select count(*) n from replay_test").collect()[0].n
            if n >= 120:
                break
            time.sleep(1)
    finally:
        q.stop()
    row = spark.sql(
        "select count(*) n, count(distinct event_id) d, min(event_id) lo, max(event_id) hi "
        "from replay_test"
    ).collect()[0]
    assert (row.n, row.d, row.lo, row.hi) == (120, 120, 0, 119)


def test_jsonl_writer_two_phase_commit(spark, tmp_path):
    """Python DataSource WRITER quadrant: partition temp files promote
    atomically on commit, _SUCCESS lands, temp orphans are swept, and the
    data round-trips through spark.read.json."""
    import json
    import os

    from bytesme_etl_batch_pipeline_spark.sources.pysource import (
        register_python_sources,
    )

    register_python_sources(spark)
    out = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(i, f"name-{i}") for i in range(100)], "id long, name string"
    ).repartition(4)
    df.write.format("bytesme_jsonl").option("path", out).mode("append").save()

    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files
    parts = [f for f in files if f.startswith("part-") and f.endswith(".jsonl")]
    assert len(parts) == 4
    assert not [f for f in files if f.endswith(".tmp")]
    rows = []
    for p in parts:
        with open(os.path.join(out, p), encoding="utf-8") as f:
            rows += [json.loads(line) for line in f]
    assert sorted(r["id"] for r in rows) == list(range(100))
    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == 100


def test_jsonl_writer_overwrite_and_append_modes(spark, tmp_path):
    """ADVICE r3 (high): mode('overwrite') must clear the prior job's
    parts (a smaller second write can't leave stale high-index parts
    under a fresh _SUCCESS), and mode('append') must promote to unique
    per-job names so same-index parts never silently replace."""
    import os

    from bytesme_etl_batch_pipeline_spark.sources.pysource import (
        register_python_sources,
    )

    register_python_sources(spark)
    out = str(tmp_path / "sink2")
    big = spark.createDataFrame(
        [(i,) for i in range(40)], "id long"
    ).repartition(4)
    one = spark.createDataFrame([(999,)], "id long").coalesce(1)

    big.write.format("bytesme_jsonl").option("path", out).mode("append").save()
    assert spark.read.json(os.path.join(out, "part-*.jsonl")).count() == 40

    # overwrite with a smaller job: exactly 1 row must remain
    one.write.format("bytesme_jsonl").option("path", out).mode("overwrite").save()
    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == 1
    assert back.collect()[0].id == 999

    # append twice: rows accumulate, nothing replaced
    big.write.format("bytesme_jsonl").option("path", out).mode("append").save()
    big.write.format("bytesme_jsonl").option("path", out).mode("append").save()
    assert spark.read.json(os.path.join(out, "part-*.jsonl")).count() == 81


def test_jsonl_writer_crash_mid_commit_loses_nothing(tmp_path):
    """The overwrite publish must promote BEFORE deleting the prior parts:
    a driver crash at any point inside commit() leaves every committed
    row on disk (worst case a mixed dir with no _SUCCESS that a re-run
    converges) — never the delete-first window where the old data is gone
    and the new exists only as sweepable .tmp files."""
    import json
    import os

    from bytesme_etl_batch_pipeline_spark.sources.pysource import (
        JsonLinesCommit,
        JsonLinesWriter,
    )

    out = str(tmp_path / "sink3")
    os.makedirs(out)
    # a prior successful job: 2 parts + _SUCCESS
    for i, payload in enumerate([[1, 2], [3]]):
        with open(os.path.join(out, f"part-oldjob-{i:05d}.jsonl"), "w") as f:
            for v in payload:
                f.write(json.dumps({"id": v}) + "\n")
    open(os.path.join(out, "_SUCCESS"), "w").close()

    # a second overwrite job whose commit crashes mid-promotion
    w = JsonLinesWriter({"path": out}, overwrite=True)
    tmp = os.path.join(out, ".part-00000-7.jsonl.tmp")
    with open(tmp, "w") as f:
        f.write(json.dumps({"id": 99}) + "\n")

    from tests.crashinject import crash_after

    with crash_after(0, (os, "replace")) as calls:
        try:
            w.commit([JsonLinesCommit(partition_id=0, tmp_path=tmp, n_rows=1)])
            raise AssertionError("commit should have crashed")
        except OSError:
            pass
    assert calls[0] == 0  # promotion was the first mutation attempted
    files = set(os.listdir(out))
    # the old job's data is fully intact — nothing was deleted pre-promote
    assert {"part-oldjob-00000.jsonl", "part-oldjob-00001.jsonl"} <= files
    # _SUCCESS was dropped first: the directory is visibly mid-publish
    assert "_SUCCESS" not in files
    # the new data still exists as its temp — a re-run converges
    assert ".part-00000-7.jsonl.tmp" in files

    # and a clean re-run of the overwrite commit converges the directory
    w2 = JsonLinesWriter({"path": out}, overwrite=True)
    w2.commit([JsonLinesCommit(partition_id=0, tmp_path=tmp, n_rows=1)])
    files = sorted(os.listdir(out))
    parts = [f for f in files if f.startswith("part-") and f.endswith(".jsonl")]
    assert len(parts) == 1 and "_SUCCESS" in files
    assert not [f for f in files if f.endswith(".tmp")]
    with open(os.path.join(out, parts[0])) as f:
        assert [json.loads(l)["id"] for l in f] == [99]

    # APPEND mode drops _SUCCESS before promoting too: a crashed partial
    # append must not leave mixed content under the prior job's marker
    w3 = JsonLinesWriter({"path": out}, overwrite=False)
    tmp3 = os.path.join(out, ".part-00000-9.jsonl.tmp")
    with open(tmp3, "w") as f:
        f.write(json.dumps({"id": 7}) + "\n")
    with crash_after(0, (os, "replace")):
        try:
            w3.commit([JsonLinesCommit(partition_id=0, tmp_path=tmp3, n_rows=1)])
            raise AssertionError("commit should have crashed")
        except OSError:
            pass
    assert "_SUCCESS" not in os.listdir(out)  # visibly mid-publish
    w3.commit([JsonLinesCommit(partition_id=0, tmp_path=tmp3, n_rows=1)])
    assert "_SUCCESS" in os.listdir(out)


def test_jsonl_commit_crash_retry_property():
    """Protocol-level property (no Spark needed): for ANY sequence of
    append/overwrite jobs, a driver crash after ANY number of os-level
    mutations inside commit() followed by one clean retry of the SAME
    job converges the directory to exactly the model state — commit is
    idempotent (already-promoted parts are skipped, a job never sweeps
    its own freshly-promoted parts as stale) and never loses a row."""
    import json
    import os
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bytesme_etl_batch_pipeline_spark.sources.pysource import (
        JsonLinesCommit,
        JsonLinesWriter,
    )
    from tests.crashinject import crash_after

    def read_rows(out):
        rows = []
        for f in os.listdir(out):
            if f.startswith("part-") and f.endswith(".jsonl"):
                with open(os.path.join(out, f), encoding="utf-8") as fh:
                    rows += [json.loads(line)["id"] for line in fh]
        return sorted(rows)

    @settings(
        max_examples=60,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.data())
    def run(data):
        with tempfile.TemporaryDirectory() as out:
            expected: list = []
            next_id = [0]
            n_jobs = data.draw(st.integers(1, 3), label="n_jobs")
            for j in range(n_jobs):
                overwrite = data.draw(st.booleans(), label=f"ovr{j}")
                n_parts = data.draw(st.integers(1, 3), label=f"nparts{j}")
                w = JsonLinesWriter({"path": out}, overwrite=overwrite)
                msgs, job_rows = [], []
                for p in range(n_parts):
                    n = data.draw(st.integers(0, 3), label=f"rows{j}_{p}")
                    ids = list(range(next_id[0], next_id[0] + n))
                    next_id[0] += n
                    job_rows += ids
                    tmp = os.path.join(out, f".part-{p:05d}-{j}.jsonl.tmp")
                    with open(tmp, "w") as fh:
                        for i in ids:
                            fh.write(json.dumps({"id": i}) + "\n")
                    msgs.append(
                        JsonLinesCommit(partition_id=p, tmp_path=tmp, n_rows=n)
                    )

                # crash after `budget` successful replace/remove calls
                # (a large budget means the commit completes uncrashed)
                budget = data.draw(st.integers(0, 12), label=f"crash{j}")
                crashed = False
                with crash_after(budget, (os, "replace"), (os, "remove")):
                    try:
                        w.commit(msgs)
                    except OSError:
                        crashed = True
                if crashed:
                    # invariant at the crash point: nothing is lost — the
                    # union of tmps + promoted parts holds every expected
                    # row (old data still present unless already replaced
                    # by this job's promoted parts)
                    w.commit(msgs)  # the clean retry of the SAME job

                expected = job_rows if overwrite else expected + job_rows
                assert read_rows(out) == sorted(expected)
                assert os.path.exists(os.path.join(out, "_SUCCESS"))
                assert not [
                    f for f in os.listdir(out) if f.endswith(".tmp")
                ]

    run()


def test_event_replay_statepath_survives_clean_restart(spark, tmp_path):
    """A CLEAN (all-committed) restart rebuilds the reader with its
    self-advancing latest at 0, and the engine consults latestOffset()
    BEFORE any partitions() call can bump it — without external position
    tracking every later availableNow run plans [committed, small) and
    drains nothing. With statepath, the persisted high-water mark floors
    the restart and the next run drains the NEXT batch."""
    from bytesme_etl_batch_pipeline_spark.sources.pysource import (
        EventReplayStreamReader,
    )

    state = str(tmp_path / "hw")
    opts = {"rowsperbatch": "100", "statepath": state}
    r1 = EventReplayStreamReader(opts)
    # run 1: two batches planned and committed
    assert r1.latestOffset() == {"index": 100}
    r1.commit({"index": 100})
    assert r1.latestOffset() == {"index": 200}
    r1.commit({"index": 200})

    # clean restart: fresh reader instance (new process in real life)
    r2 = EventReplayStreamReader(opts)
    nxt = r2.latestOffset()
    assert nxt == {"index": 300}, (
        "restarted reader must advance PAST the committed high-water mark, "
        f"got {nxt}"
    )

    # contrast: without statepath the restart is documented single-lifetime
    r3 = EventReplayStreamReader({"rowsperbatch": "100"})
    assert r3.latestOffset() == {"index": 100}


def test_extract_category_urls_matches_reference_logic(spark):
    """S6 menu crawl (menus_crawling.py:21-55): anchors inside matching
    menu blocks only, '#' hrefs fall back to data-url, keyword filter,
    urljoin absolutization, set-dedup — checked against urllib.parse's
    urljoin on every shape the reference can meet."""
    from urllib.parse import urljoin

    from bytesme_etl_batch_pipeline_spark.sources.http import extract_category_urls

    base = "https://tljus.com/menu/page"
    hrefs = [
        "/cakes",                      # root-relative
        "drinks/tea",                  # path-relative
        "//cdn.tljus.com/abs",         # protocol-relative
        "https://other.com/full",      # absolute
        "/cakes",                      # duplicate -> set-dedup
    ]
    anchors = "\n".join(f'<a class="m" href="{h}">x</a>' for h in hrefs)
    html = (
        f'<nav class="x dropdown-list-8">{anchors}'
        f'<a href="#" data-url="https://tljus.com/special">s</a></nav>'
        f'<div class="not-menu"><a href="/skipped">n</a></div>'
    )
    pages = spark.createDataFrame([(base, html)], "url string, body string")
    got = sorted(
        r.category_url
        for r in extract_category_urls(
            pages, menu_tag="nav", menu_selector="dropdown-list"
        ).collect()
    )
    want = sorted(
        {urljoin(base, h) for h in hrefs} | {"https://tljus.com/special"}
    )
    assert got == want
    assert "https://tljus.com/skipped" not in got  # non-menu block excluded


def test_extract_category_urls_keyword_filter_and_none(spark):
    """filter_keyword='None' (the reference's YAML literal) and None both
    keep everything; a real keyword keeps only matching urls (substring
    test BEFORE absolutization, as the reference does)."""
    from bytesme_etl_batch_pipeline_spark.sources.http import extract_category_urls

    html = (
        '<ul class="menu-root">'
        '<a href="/product-category/tea">t</a>'
        '<a href="/about">a</a></ul>'
    )
    pages = spark.createDataFrame(
        [("https://b.vn/", html)], "url string, body string"
    )
    kw = lambda k: sorted(  # noqa: E731
        r.category_url
        for r in extract_category_urls(
            pages, menu_tag="ul", menu_selector="menu", filter_keyword=k
        ).collect()
    )
    both = ["https://b.vn/about", "https://b.vn/product-category/tea"]
    assert kw(None) == both
    assert kw("None") == both
    assert kw("product-category") == ["https://b.vn/product-category/tea"]


def test_extract_category_urls_single_quoted_attributes(spark):
    """HTML parsers are quote-agnostic; single-quoted class/href/data-url
    attributes extract identically to double-quoted ones."""
    from bytesme_etl_batch_pipeline_spark.sources.http import extract_category_urls

    html = (
        "<nav class='dropdown-list-8'>"
        "<a href='/cakes'>c</a>"
        "<a href='#' data-url='https://t.vn/promo'>p</a></nav>"
    )
    pages = spark.createDataFrame(
        [("https://t.vn/menu", html)], "url string, body string"
    )
    got = sorted(
        r.category_url
        for r in extract_category_urls(
            pages, menu_tag="nav", menu_selector="dropdown-list"
        ).collect()
    )
    assert got == ["https://t.vn/cakes", "https://t.vn/promo"]


def test_extract_category_urls_urljoin_edge_cases(spark):
    """urljoin parity on the hard shapes: a base url with NO path, a query
    string containing '/', scheme-prefixed refs (tel:/mailto:/uppercase)
    passing through, an explicit port surviving absolutization, and
    data-href never shadowing the real href."""
    from urllib.parse import urljoin

    from bytesme_etl_batch_pipeline_spark.sources.http import extract_category_urls

    cases = [
        ("https://example.com", "drinks/tea"),         # pathless base
        ("https://h.vn/p?a=b/c", "rel"),               # '/' inside query
        ("https://t.vn/menu", "tel:+84123"),            # non-http scheme
        ("https://t.vn/menu", "HTTP://OTHER.COM/x"),    # uppercase scheme
        ("https://t.vn:8443/menu/", "/root-rel"),       # port + root-relative
        ("https://t.vn:8443/menu/", "kid"),             # port + path-relative
    ]
    rows = [
        (base, f'<nav class="menu"><a data-href="/lazy" href="{h}">x</a></nav>')
        for base, h in cases
    ]
    pages = spark.createDataFrame(rows, "url string, body string")
    got = {
        (r.site_url, r.category_url)
        for r in extract_category_urls(
            pages, menu_tag="nav", menu_selector="menu"
        ).collect()
    }
    want = {(base, urljoin(base, h)) for base, h in cases}
    assert got == want  # and no '/lazy' anywhere: data-href never matched
