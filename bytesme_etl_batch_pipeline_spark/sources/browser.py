"""S7: browser-driven source (dynamic pages) as a DISTRIBUTABLE Spark stage.

The reference drives a single Selenium session through four interaction
patterns (``scripts/extract/products_scraping.py:64-71`` dispatches on the
site's ``loading_type``): tab-based crawling (click each subcategory tab,
harvest after every click, keep-first dedup by product_url — :139-210),
pagination (follow the next-page href up to ``max_pages=20`` — :212-249),
progressive load-more (click the button while it stays displayed, then
harvest the final DOM once — :251-314), and single-page (open the URL and
harvest once — :77-101). Which site uses which pattern comes from
``utils/webs_config.yml`` (one ``websites.<site>`` block per target with
``path.website_path`` + ``scraping.loading_type``);
``frontier_from_webs_config`` turns that exact file into the crawl
frontier, so a reference user's site config runs unchanged.

This module re-expresses those SEMANTICS Spark-first:

* The unit of parallelism is the SITE (a frontier row), not the page —
  browser interactions within one site are inherently sequential (each
  click mutates the same DOM), so the honest distribution model is one
  browser session per frontier partition via ``mapInPandas``: 1000 sites
  crawl as 1000 independent tasks, each driving its own session. This is
  also why S7 cannot be a row-per-page ``DataSource``: pages discovered by
  clicking do not exist up front.
* Browser automation is INJECTABLE behind ``BrowserSession`` (the
  ``FakeCodec`` pattern from ``operators/multimodal.py``): the engine-side
  plumbing — interaction loops, dedup policy, bounded retries, schema,
  partitioning — is real and fully tested against ``FakeBrowser`` (a
  deterministic in-memory site model); ``selenium_browser_factory`` slots a
  real WebDriver behind the identical interface and raises a clearly-marked
  ``NotImplementedError`` while the dependency is absent from the
  container (same honest gate as ``embed.SentenceTransformerEmbedder``).

Crawl-order determinism: every emitted row carries ``position`` (harvest
order within its site), so downstream keep-first semantics are stable and
partition-invariant — the per-site dedup happens INSIDE the crawl loop with
a set, exactly like the reference's ``processed_urls``, which is bounded by
one site's catalog size (thousands of rows), never corpus-sized.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterator, Protocol

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MAX_PAGES = 20  # reference products_scraping.py:217-224


class BrowserSession(Protocol):
    """What the crawl loops need from a browser. One instance drives one
    site; methods mirror the reference's Selenium usage, minus timing."""

    def open(self, url: str) -> None: ...
    def tab_count(self) -> int: ...
    def select_tab(self, index: int) -> bool:
        """Click tab ``index``; True if the click landed (False models
        ElementClickInterceptedException — callers retry bounded)."""
        ...
    def load_more(self) -> bool:
        """Click the load-more button if present AND displayed; True if
        something was clicked (the DOM grew)."""
        ...
    def next_url(self) -> str | None:
        """href of the next-page link in the current DOM, if any."""
        ...
    def current_products(self) -> list[dict]:
        """Parse the current DOM into product dicts (the ``_crawl_each_page``
        step). Keys: product_url, product_name, product_price."""
        ...
    def close(self) -> None: ...


def _harvest(
    session: BrowserSession, seen: set, out: list[dict], *, tab: int, page: int
) -> None:
    """Keep-first-by-product_url accumulation (reference ``_add_products``)."""
    for p in session.current_products():
        url = p.get("product_url")
        if url is None or url in seen:
            continue
        seen.add(url)
        out.append({**p, "tab": tab, "page": page})


def crawl_tab_based(session: BrowserSession, url: str) -> list[dict]:
    """Tab-click crawl: harvest the initial page, then click every further
    tab and harvest after each click; a click that fails gets ONE retry
    (the reference's intercepted-click handler). No tabs ⇒ the initial
    harvest is the whole result."""
    session.open(url)
    seen: set = set()
    out: list[dict] = []
    _harvest(session, seen, out, tab=0, page=0)
    for i in range(1, session.tab_count()):
        if not session.select_tab(i) and not session.select_tab(i):
            continue  # both attempts intercepted: skip the tab, keep going
        _harvest(session, seen, out, tab=i, page=0)
    return out


def crawl_pagination(session: BrowserSession, url: str) -> list[dict]:
    """Follow next-page links, harvesting each page, hard-capped at
    ``MAX_PAGES`` (the reference's runaway-pagination guard)."""
    seen: set = set()
    out: list[dict] = []
    page = 0
    next_url: str | None = url
    while next_url and page < MAX_PAGES:
        session.open(next_url)
        _harvest(session, seen, out, tab=0, page=page)
        page += 1
        next_url = session.next_url()
    return out


MAX_LOAD_MORE_CLICKS = 10_000  # runaway guard for a button that never hides


def crawl_progressive(session: BrowserSession, url: str) -> list[dict]:
    """Click load-more while it stays displayed, then harvest the
    FULLY-EXPANDED DOM once — the reference harvests after the loop, not
    per click. The click cap guards a site whose button never hides."""
    session.open(url)
    clicks = 0
    while clicks < MAX_LOAD_MORE_CLICKS and session.load_more():
        clicks += 1
    seen: set = set()
    out: list[dict] = []
    _harvest(session, seen, out, tab=0, page=0)
    return out


def crawl_single_page(session: BrowserSession, url: str) -> list[dict]:
    """Single-page crawl: open the URL and harvest once — the reference's
    static-page path (``products_scraping.py:77-101``, a plain GET +
    parse; no tabs, no pagination, no load-more)."""
    session.open(url)
    seen: set = set()
    out: list[dict] = []
    _harvest(session, seen, out, tab=0, page=0)
    return out


# Modes accept BOTH the engine's short names and the reference's verbatim
# ``loading_type`` vocabulary (webs_config.yml / products_scraping.py:64-71)
# so a frontier built from a reference config needs no translation.
_CRAWLERS: dict[str, Callable[[BrowserSession, str], list[dict]]] = {
    "tab": crawl_tab_based,
    "tab-based": crawl_tab_based,
    "pagination": crawl_pagination,
    "progressive": crawl_progressive,
    "single-page": crawl_single_page,
    "single": crawl_single_page,
}

CRAWLED_SCHEMA = StructType(
    [
        StructField("site", StringType(), False),
        StructField("product_url", StringType(), True),
        StructField("product_name", StringType(), True),
        StructField("product_price", StringType(), True),
        StructField("tab", IntegerType(), True),
        StructField("page", IntegerType(), True),
        StructField("position", IntegerType(), True),
    ]
)


def crawl_products(
    frontier: DataFrame,
    browser_factory: Callable[[], BrowserSession],
) -> DataFrame:
    """Distributed dynamic-page crawl: one row of ``frontier`` =
    (site, url, mode) with mode any key of ``_CRAWLERS`` — the engine's
    short names or the reference's verbatim ``loading_type`` vocabulary
    (tab/tab-based, pagination, progressive, single/single-page); each partition
    drives ONE browser session sequentially through its sites (session
    reuse across sites on the same executor — the expensive object is the
    browser, exactly like the codec/embedder executor caches). Repartition
    the frontier to its row count upstream for site-per-task parallelism.

    Output rows carry (site, tab, page, position) so the landing zone is
    deterministic and keep-first replays are stable.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        session = None
        try:
            for pdf in batches:
                rows: list[dict] = []
                for site, url, mode in zip(
                    pdf["site"], pdf["url"], pdf["mode"]
                ):
                    crawler = _CRAWLERS.get(mode)
                    if crawler is None:
                        raise ValueError(f"unknown crawl mode: {mode!r}")
                    if session is None:
                        session = browser_factory()
                    for pos, p in enumerate(crawler(session, url)):
                        rows.append(
                            {
                                "site": site,
                                "product_url": p.get("product_url"),
                                "product_name": p.get("product_name"),
                                "product_price": p.get("product_price"),
                                "tab": p.get("tab", 0),
                                "page": p.get("page", 0),
                                "position": pos,
                            }
                        )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in CRAWLED_SCHEMA.fields]
                )
        finally:
            if session is not None:
                session.close()

    return frontier.mapInPandas(run, schema=CRAWLED_SCHEMA)


def frontier_from_webs_config(spark, path: str) -> DataFrame:
    """Crawl frontier from a reference site config (``utils/
    webs_config.yml``): one row per ``websites.<site>`` block with
    (site, url = ``path.website_path``, mode = ``scraping.loading_type``)
    — the verbatim reference file loads unchanged, as ``plans/
    pipeline.load_config`` does for ``etl_config.yml``. Unknown or missing
    ``loading_type``s fail HERE (at frontier build, driver-side, with the
    site named) rather than mid-crawl inside an executor task. Selector
    details (product/tab/next-page CSS) stay with the ``BrowserSession``
    implementation — they parameterize the DOM reads the session owns, not
    the interaction loop the engine owns."""
    text = open(path).read()
    try:
        import yaml

        cfg = yaml.safe_load(text)
    except ImportError:  # pragma: no cover — yaml is present in this env
        import json

        cfg = json.loads(text)
    rows = []
    for site, block in (cfg.get("websites") or {}).items():
        if not isinstance(block, dict):  # empty/commented-out block
            raise ValueError(
                f"webs_config site {site!r}: block is {block!r}, expected a "
                "mapping with path/scraping sections"
            )
        url = (block.get("path") or {}).get("website_path")
        mode = (block.get("scraping") or {}).get("loading_type")
        if not url:
            raise ValueError(f"webs_config site {site!r}: missing path.website_path")
        if mode not in _CRAWLERS:
            raise ValueError(
                f"webs_config site {site!r}: unknown loading_type {mode!r} "
                f"(expected one of {sorted(_CRAWLERS)})"
            )
        rows.append((site, url, mode))
    if not rows:
        raise ValueError(f"webs_config at {path!r} declares no websites")
    # one site per partition, guaranteed: the frontier is driver-side
    # config data, so parallelize with one slice per site (hash/round-robin
    # repartition can collide on small frontiers and serialize two sites
    # behind one browser session)
    rdd = spark.sparkContext.parallelize(rows, len(rows))
    return spark.createDataFrame(rdd, "site string, url string, mode string")


# ---------------------------------------------------------------------------
# Deterministic fake (test double) and the gated real factory
# ---------------------------------------------------------------------------


@dataclass
class FakeSite:
    """In-memory site model: ``tabs`` is a list of product lists (tab 0 is
    the initial page); ``pages`` maps url -> (products, next_url);
    ``batches`` is the progressive sequence revealed one load-more click at
    a time. ``intercept_tabs`` models clicks that fail once (the retry
    path); ``dead_tabs`` fail always."""

    tabs: list[list[dict]] = field(default_factory=list)
    pages: dict[str, tuple[list[dict], str | None]] = field(default_factory=dict)
    batches: list[list[dict]] = field(default_factory=list)
    intercept_tabs: set = field(default_factory=set)
    dead_tabs: set = field(default_factory=set)


class FakeBrowser:
    """Deterministic BrowserSession over a dict of FakeSites (keyed by
    url). DOM state = (current site, selected tab, revealed batches)."""

    def __init__(self, sites: dict[str, FakeSite]):
        self._sites = sites
        self._site: FakeSite | None = None
        self._tab = 0
        self._revealed = 1
        self._url: str | None = None
        self._failed_once: set = set()
        self.n_opens = 0

    def open(self, url: str) -> None:
        self.n_opens += 1
        self._url = url
        self._site = self._sites.get(url)
        self._tab = 0
        self._revealed = 1
        # fail-once intercept state is per-page-load: a session reused
        # across sites must model each site's first click failing, not
        # leak "already failed" from a previously crawled site
        self._failed_once.clear()

    def tab_count(self) -> int:
        return len(self._site.tabs) if self._site and self._site.tabs else 0

    def select_tab(self, index: int) -> bool:
        if self._site is None or index >= len(self._site.tabs):
            return False
        if index in self._site.dead_tabs:
            return False
        if index in self._site.intercept_tabs and index not in self._failed_once:
            self._failed_once.add(index)  # first click intercepted
            return False
        self._tab = index
        return True

    def load_more(self) -> bool:
        if self._site is None or self._revealed >= len(self._site.batches):
            return False  # button gone / never displayed
        self._revealed += 1
        return True

    def next_url(self) -> str | None:
        if self._site is None or self._url not in self._site.pages:
            return None
        return self._site.pages[self._url][1]

    def current_products(self) -> list[dict]:
        if self._site is None:
            return []
        if self._site.pages and self._url in self._site.pages:
            return list(self._site.pages[self._url][0])
        if self._site.batches:
            out: list[dict] = []
            for b in self._site.batches[: self._revealed]:
                out.extend(b)
            return out
        if self._site.tabs:
            return list(self._site.tabs[self._tab])
        return []

    def close(self) -> None:
        self._site = None


def selenium_browser_factory(**driver_kwargs) -> BrowserSession:
    """Real-browser factory: requires selenium (absent from this
    container). The interaction loops above are driver-agnostic; this
    wrapper is the ONLY thing that touches WebDriver APIs."""
    try:
        import selenium  # noqa: F401
    except ImportError as exc:  # pragma: no cover - dependency gate
        raise NotImplementedError(
            "selenium is not installed in this environment; inject a "
            "BrowserSession (see FakeBrowser) or install selenium and "
            "wrap a WebDriver behind this interface"
        ) from exc
    raise NotImplementedError(
        "WebDriver wiring intentionally unimplemented until a real "
        "browser is available to integration-test against"
    )  # pragma: no cover
