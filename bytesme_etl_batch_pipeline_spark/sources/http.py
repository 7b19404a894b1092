"""S6 — distributed HTTP page source (SURVEY §2.1).

The reference fetches pages single-threaded with requests+BeautifulSoup
(``scripts/extract/products_scraping.py:82-91,225-233``). Spark-first shape:
the URL work-list is a DataFrame and the fetch is an Arrow-batched
``mapInPandas`` stage — each executor slot holds one HTTP session, batches
amortize connection setup, and politeness is enforced per-partition.

The fetcher is injectable: tests use a deterministic mock; production wires
urllib/requests. Selenium-driven dynamic pages (S7) stay a single-node
extractor stage by design (SURVEY §3 note) — browser automation does not
distribute meaningfully for a handful of sites; its OUTPUT lands in the raw
zone this engine scans.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

FetchFn = Callable[[str], tuple[int, str]]

FETCH_RESULT = StructType(
    [
        StructField("url", StringType(), True),
        StructField("status", IntegerType(), True),
        StructField("body", StringType(), True),
        StructField("error", StringType(), True),
    ]
)


def mock_fetcher(url: str) -> tuple[int, str]:
    """Deterministic test fetcher: status from url hash, body echoes url."""
    h = hashlib.md5(url.encode()).digest()
    status = 200 if h[0] % 10 != 0 else 404
    return status, f"<html><body data-u='{url}'>{h.hex()[:16]}</body></html>"


def urllib_fetcher(timeout_s: float = 20.0, user_agent: str = "bytesme-spark/0.1") -> FetchFn:
    """Production fetcher (stdlib-only). Contract matches ``mock_fetcher``:
    a 4xx/5xx response returns ``(status, body)`` like any other response —
    urlopen raises ``HTTPError`` for those, and letting it propagate would
    land every 404/500 as ``status=NULL, error='HTTP Error …'`` (a
    different contract from the tested one, and the error body — soft-404
    pages, rate-limit messages — would be discarded). Only transport-level
    failures (DNS, timeout, refused) escape as exceptions for the
    ``error`` column."""

    def fetch(url: str) -> tuple[int, str]:  # pragma: no cover - needs network
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, headers={"User-Agent": user_agent})
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as r:
                return r.status, r.read().decode("utf-8", errors="replace")
        except urllib.error.HTTPError as e:  # 4xx/5xx: a response, not an error
            return e.code, e.read().decode("utf-8", errors="replace")

    return fetch


def fetch_pages(
    urls: DataFrame,
    url_col: str = "url",
    fetcher: FetchFn = mock_fetcher,
    per_request_pause_s: float = 0.0,
) -> DataFrame:
    """Distributed fetch over a URL frontier. Repartition the frontier by
    host upstream to respect per-site politeness; ``per_request_pause_s``
    mirrors the reference's SLEEP_TIME pacing
    (``products_scraping.py:22-23``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        for pdf in batches:
            rows = []
            for url in pdf[url_col]:
                try:
                    status, body = fetcher(url)
                    rows.append({"url": url, "status": status, "body": body, "error": None})
                except Exception as e:  # per-URL isolation, like per-file in the reference
                    rows.append({"url": url, "status": None, "body": None, "error": str(e)})
                if per_request_pause_s:
                    time.sleep(per_request_pause_s)
            yield pd.DataFrame(rows, columns=["url", "status", "body", "error"])

    return urls.mapInPandas(run, schema=FETCH_RESULT)


def extract_category_urls(
    pages: DataFrame,
    base_col: str = "url",
    html_col: str = "body",
    menu_tag: str = "nav",
    menu_selector: str = "menu",
    filter_keyword: str | None = None,
) -> DataFrame:
    """Menu-crawl link extraction (reference ``menus_crawling.py:21-55``)
    as a pure JVM-side expression pipeline — no UDF, no HTML library:

    1. scope to menu blocks: ``<menu_tag ... class~=menu_selector>...</
       menu_tag>`` (the reference's ``find_all(tag, class_=re.compile(
       selector))`` — a regex approximation that, like BeautifulSoup on
       the reference's real targets, keys on the class attribute);
    2. anchors inside each block; an ``href`` starting with ``#`` falls
       back to the tag's ``data-url`` attribute (``:41-43``);
    3. keyword filter (``:46`` — ``None`` keeps everything);
    4. absolutize non-absolute urls against the page url (``:47-48``
       ``urljoin``): root-relative gets protocol://host, protocol-relative
       gets the protocol, other relative paths append to the base
       directory;
    5. global DISTINCT (the reference's ``all_product_urls`` set).

    The reference then runs ``is_parent_category`` (``:12-19,53-54``) —
    which as written compares every url's path against the full list
    INCLUDING ITSELF, so it always finds an equal path and the filter
    keeps everything; fidelity = no row dropped here. The *intended*
    parent-path pruning is ``operators/dedup.drop_parent_paths`` (SURVEY
    D4) — compose it over this output to keep leaf categories only.

    Returns (site_url, category_url), distinct. Everything above is
    ``regexp_extract_all``/``parse_url`` inside whole-stage codegen — at
    100 TB of fetched HTML this is a scan-shaped map plus one distinct
    shuffle, no Python in the loop.
    """
    from pyspark.sql import functions as F

    block_pat = (
        rf"(?is)<{menu_tag}\b[^>]*class=[\"'][^\"']*{menu_selector}[^\"']*[\"'][^>]*>"
        rf".*?</{menu_tag}>"
    )
    base = F.col(base_col)
    blocks = pages.select(
        base.alias("site_url"),
        F.explode(F.regexp_extract_all(F.col(html_col), F.lit(block_pat), 0)).alias(
            "__block"
        ),
    )
    anchors = blocks.select(
        "site_url",
        F.explode(
            F.regexp_extract_all(F.col("__block"), F.lit(r"(?is)<a\s[^>]*>"), 0)
        ).alias("__a"),
    )
    # both quote styles (the reference's HTML parser is quote-agnostic);
    # the lookbehind keeps `data-href`/`x-data-url` attributes from
    # shadowing the real href/data-url
    href = F.coalesce(
        F.nullif(
            F.regexp_extract(F.col("__a"), r'(?i)(?<![\w-])href="([^"]*)"', 1),
            F.lit(""),
        ),
        F.regexp_extract(F.col("__a"), r"(?i)(?<![\w-])href='([^']*)'", 1),
    )
    data_url = F.coalesce(
        F.nullif(
            F.regexp_extract(F.col("__a"), r'(?i)(?<![\w-])data-url="([^"]*)"', 1),
            F.lit(""),
        ),
        F.regexp_extract(F.col("__a"), r"(?i)(?<![\w-])data-url='([^']*)'", 1),
    )
    url = F.when(F.substring(href, 1, 1) == "#", data_url).otherwise(href)
    raw = anchors.select("site_url", url.alias("__u")).filter(F.col("__u") != "")
    if filter_keyword is not None and filter_keyword != "None":
        raw = raw.filter(F.col("__u").contains(filter_keyword))
    site = F.col("site_url")
    proto = F.parse_url(site, F.lit("PROTOCOL"))
    # AUTHORITY (not HOST): keeps an explicit port, like urljoin does
    auth = F.parse_url(site, F.lit("AUTHORITY"))
    # base DIRECTORY from the parsed PATH (query strings may contain '/');
    # a base url with no path at all resolves relatives against '/'
    base_dir = F.regexp_replace(
        F.coalesce(F.parse_url(site, F.lit("PATH")), F.lit("")), "[^/]*$", ""
    )
    u = F.col("__u")
    absolute = (
        # any scheme-prefixed reference is already absolute (urljoin
        # passes tel:/mailto:/HTTP://... through unchanged)
        F.when(u.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), u)
        .when(u.startswith("//"), F.concat(proto, F.lit(":"), u))
        .when(u.startswith("/"), F.concat(proto, F.lit("://"), auth, u))
        .otherwise(
            F.concat(
                proto,
                F.lit("://"),
                auth,
                F.when(base_dir == "", F.lit("/")).otherwise(base_dir),
                u,
            )
        )
    )
    return raw.select("site_url", absolute.alias("category_url")).distinct()
