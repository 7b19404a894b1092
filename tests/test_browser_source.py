"""S7 browser-driven source: the reference's four interaction patterns
(tab clicks, pagination, progressive load-more, single-page —
products_scraping.py:64-71 dispatch, :77-314 bodies) re-expressed as a
distributable Spark stage with an injectable browser, plus the
webs_config.yml frontier loader. The FakeBrowser is a deterministic DOM model;
the loops, dedup policy, retry handling, schema and partitioning under
test are the production code paths."""

from __future__ import annotations

import pytest

from bytesme_etl_batch_pipeline_spark.sources.browser import (
    MAX_PAGES,
    FakeBrowser,
    FakeSite,
    crawl_pagination,
    crawl_products,
    crawl_progressive,
    crawl_tab_based,
    selenium_browser_factory,
)


def _p(i, price="10k"):
    return {
        "product_url": f"/p/{i}",
        "product_name": f"Prod {i}",
        "product_price": price,
    }


def test_tab_crawl_keep_first_dedup_and_retry():
    """Initial page harvested first; each further tab clicked and
    harvested; duplicate product_urls keep their FIRST occurrence (the
    reference's processed_urls set); an intercepted tab click succeeds on
    the one retry; a dead tab is skipped without aborting the site."""
    site = FakeSite(
        tabs=[
            [_p(1), _p(2)],
            [_p(2, price="SHOULD NOT WIN"), _p(3)],  # p2 dup: first wins
            [_p(4)],   # intercepted once, retry lands
            [_p(99)],  # dead: never harvested
            [_p(5)],
        ],
        intercept_tabs={2},
        dead_tabs={3},
    )
    b = FakeBrowser({"https://site-a": site})
    got = crawl_tab_based(b, "https://site-a")
    urls = [p["product_url"] for p in got]
    assert urls == ["/p/1", "/p/2", "/p/3", "/p/4", "/p/5"]
    assert got[1]["product_price"] == "10k"  # keep-FIRST, not last
    assert [p["tab"] for p in got] == [0, 0, 1, 2, 4]


def test_fake_browser_intercept_fires_per_site_not_per_session():
    """One browser session crawls many sites (the per-partition model):
    the fail-once intercept is page-load state, so site B's intercepted
    tab must fail its first click even though site A's same-index tab
    already failed earlier in the session — otherwise multi-site tests
    silently stop exercising the retry path after the first site."""
    site = lambda i: FakeSite(
        tabs=[[_p(f"{i}-0")], [_p(f"{i}-1")]], intercept_tabs={1}
    )
    b = FakeBrowser({"a": site("a"), "b": site("b")})
    for url in ("a", "b"):
        b.open(url)
        assert not b.select_tab(1)  # first click intercepted, EVERY site
        assert b.select_tab(1)      # retry lands


def test_tab_crawl_no_tabs_harvests_initial_page_only():
    b = FakeBrowser({"u": FakeSite(tabs=[[_p(1)]])})
    assert [p["product_url"] for p in crawl_tab_based(b, "u")] == ["/p/1"]


def test_pagination_follows_next_and_caps_at_max_pages():
    """A 25-page chain stops at MAX_PAGES=20 (the reference's guard), and
    a product repeated across pages is kept once."""
    pages = {}
    for i in range(25):
        nxt = f"u{i+1}" if i < 24 else None
        prods = [_p(i), _p("repeat")]
        pages[f"u{i}"] = (prods, nxt)
    b = FakeBrowser({f"u{i}": FakeSite(pages=pages) for i in range(25)})
    got = crawl_pagination(b, "u0")
    urls = {p["product_url"] for p in got}
    assert "/p/repeat" in urls
    assert len(got) == MAX_PAGES + 1  # 20 uniques + the one repeat
    assert max(p["page"] for p in got) == MAX_PAGES - 1


def test_pagination_single_page_without_next():
    b = FakeBrowser({"u": FakeSite(pages={"u": ([_p(1)], None)})})
    assert len(crawl_pagination(b, "u")) == 1


def test_progressive_clicks_until_button_hides_then_harvests_once():
    """Three load-more batches: the loop clicks twice (batch 0 is the
    initial DOM), then ONE harvest sees the fully-expanded DOM."""
    site = FakeSite(batches=[[_p(1)], [_p(2)], [_p(3), _p(1)]])
    b = FakeBrowser({"u": site})
    got = crawl_progressive(b, "u")
    assert [p["product_url"] for p in got] == ["/p/1", "/p/2", "/p/3"]
    assert b.n_opens == 1  # never re-navigates; the DOM grows in place


def test_crawl_products_distributed_over_sites(spark):
    """The Spark stage: a 3-site frontier (one per interaction mode)
    crawled via mapInPandas — every site's rows come back with stable
    positions, and the whole thing runs partition-parallel."""
    paged = FakeSite(
        pages={
            "https://pages": ([_p("g1")], "https://pages/2"),
            "https://pages/2": ([_p("g2")], None),
        }
    )
    sites = {
        "https://tabs": FakeSite(tabs=[[_p("t1")], [_p("t2")]]),
        "https://pages": paged,
        "https://pages/2": paged,
        "https://prog": FakeSite(batches=[[_p("m1")], [_p("m2")]]),
    }
    frontier = spark.createDataFrame(
        [
            ("tabs-site", "https://tabs", "tab"),
            ("pages-site", "https://pages", "pagination"),
            ("prog-site", "https://prog", "progressive"),
        ],
        "site string, url string, mode string",
    ).repartition(3)
    out = crawl_products(frontier, lambda: FakeBrowser(sites))
    rows = out.collect()
    by_site = {}
    for r in rows:
        by_site.setdefault(r.site, []).append(r)
    assert {s: len(v) for s, v in by_site.items()} == {
        "tabs-site": 2, "pages-site": 2, "prog-site": 2,
    }
    for v in by_site.values():
        assert [r.position for r in sorted(v, key=lambda r: r.position)] == [0, 1]
    # schema contract: the landing zone gets typed columns, not dicts
    assert dict(out.dtypes) == {
        "site": "string", "product_url": "string", "product_name": "string",
        "product_price": "string", "tab": "int", "page": "int",
        "position": "int",
    }


def test_crawl_products_unknown_mode_fails_loud(spark):
    frontier = spark.createDataFrame(
        [("s", "u", "scrollhack")], "site string, url string, mode string"
    )
    out = crawl_products(frontier, lambda: FakeBrowser({}))
    with pytest.raises(Exception, match="unknown crawl mode"):
        out.collect()


def test_selenium_factory_is_an_honest_gate():
    with pytest.raises(NotImplementedError, match="selenium"):
        selenium_browser_factory()


def test_crawl_feeds_config_pipeline_end_to_end(spark):
    """S7 end-to-end: the crawl output (which carries product_name /
    product_url) flows straight into the config-driven runner's
    remove_duplicates stage — browser extraction is a first-class INPUT
    to the same pipeline the reference's YAML drives."""
    from bytesme_etl_batch_pipeline_spark.plans.pipeline import (
        register_reference_stages,
        run_pipeline,
    )

    register_reference_stages()
    site = FakeSite(tabs=[[_p(1), _p(2)], [_p(2), _p(3)]])
    frontier = spark.createDataFrame(
        [("s", "u", "tab")], "site string, url string, mode string"
    )
    crawled = crawl_products(frontier, lambda: FakeBrowser({"u": site}))
    outputs, report = run_pipeline({"scraped": crawled}, ["remove_duplicates"])
    assert report.summary() == {"total": 1, "success": 1, "error": 0}
    rows = outputs["scraped"].collect()
    assert sorted(r.product_url for r in rows) == ["/p/1", "/p/2", "/p/3"]


def test_single_page_crawl_harvests_once_and_never_paginates():
    """single-page (products_scraping.py:77-101): one GET, one harvest —
    a next-page link on the page must NOT be followed (that is
    pagination's job), and duplicates on the page keep first."""
    from bytesme_etl_batch_pipeline_spark.sources.browser import crawl_single_page

    site = FakeSite(
        pages={
            "https://solo": ([_p(1), _p(2), _p(1, price="DUP")], "https://solo?page=2"),
            "https://solo?page=2": ([_p(3)], None),
        }
    )
    b = FakeBrowser({"https://solo": site})
    got = crawl_single_page(b, "https://solo")
    assert [p["product_url"] for p in got] == ["/p/1", "/p/2"]
    assert got[0]["product_price"] == "10k"  # keep-first on the page
    assert b.n_opens == 1  # the ?page=2 link was never followed


def test_crawl_products_accepts_reference_loading_type_vocab(spark):
    """The frontier mode column speaks the reference's verbatim
    webs_config vocabulary — 'tab-based' and 'single-page' dispatch
    without translation."""
    tabbed = FakeSite(tabs=[[_p(1)], [_p(2)]])
    solo = FakeSite(pages={"https://s2": ([_p(3)], None)})
    sites = {"https://s1": tabbed, "https://s2": solo}
    frontier = spark.createDataFrame(
        [("s1", "https://s1", "tab-based"), ("s2", "https://s2", "single-page")],
        "site string, url string, mode string",
    )
    rows = crawl_products(frontier, lambda: FakeBrowser(sites)).collect()
    got = sorted((r.site, r.product_url) for r in rows)
    assert got == [("s1", "/p/1"), ("s1", "/p/2"), ("s2", "/p/3")]


def test_frontier_from_reference_webs_config_loads_unchanged(spark):
    """The reference's own utils/webs_config.yml builds the frontier
    verbatim: every websites.<site> block becomes one (site, url, mode)
    row and every loading_type it uses is a registered crawler — all four
    reference patterns appear in the file."""
    from bytesme_etl_batch_pipeline_spark.sources.browser import (
        _CRAWLERS,
        frontier_from_webs_config,
    )

    f = frontier_from_webs_config(spark, "/root/reference/utils/webs_config.yml")
    rows = f.collect()
    by_site = {r.site: (r.url, r.mode) for r in rows}
    assert len(by_site) == len(rows) >= 4  # one row per site, no dups
    assert by_site["tljus"] == ("https://tljus.com/", "tab-based")
    assert {m for _, m in by_site.values()} == {
        "tab-based", "pagination", "progressive", "single-page"
    }
    assert all(m in _CRAWLERS for _, m in by_site.values())
    assert all(u.startswith("http") for u, _ in by_site.values())


def test_frontier_from_webs_config_rejects_unknown_loading_type(spark, tmp_path):
    """A typo'd loading_type fails at frontier BUILD with the site named,
    not mid-crawl inside an executor task."""
    from bytesme_etl_batch_pipeline_spark.sources.browser import (
        frontier_from_webs_config,
    )

    cfg = tmp_path / "webs.yml"
    cfg.write_text(
        "websites:\n"
        "  oops:\n"
        "    path: {website_path: https://x}\n"
        "    scraping: {loading_type: infinite-scroll}\n"
    )
    with pytest.raises(ValueError, match="oops.*infinite-scroll"):
        frontier_from_webs_config(spark, str(cfg))


def test_reference_webs_config_drives_full_extract_flow(spark):
    """Whole-extract composition: the reference's own webs_config.yml
    builds the frontier, every configured site crawls under its declared
    loading_type, and the output flows into the config-driven pipeline
    runner — the complete reference extract stage on the engine with only
    the browser injected."""
    from bytesme_etl_batch_pipeline_spark.plans.pipeline import (
        register_reference_stages,
        run_pipeline,
    )
    from bytesme_etl_batch_pipeline_spark.sources.browser import (
        frontier_from_webs_config,
    )

    register_reference_stages()
    f = frontier_from_webs_config(spark, "/root/reference/utils/webs_config.yml")
    frontier_rows = f.collect()
    sites = {}
    for i, r in enumerate(frontier_rows):
        prods = [_p(f"{r.site}-{j}") for j in range(2)]
        sites[r.url] = FakeSite(
            tabs=[prods],                      # tab-based: initial page
            pages={r.url: (prods, None)},      # pagination / single-page
            batches=[prods],                   # progressive: already revealed
        )
    crawled = crawl_products(f, lambda: FakeBrowser(sites))
    outputs, report = run_pipeline({"scraped": crawled}, ["remove_duplicates"])
    assert report.summary() == {"total": 1, "success": 1, "error": 0}
    got = outputs["scraped"].collect()
    assert {r.site for r in got} == {r.site for r in frontier_rows}
    assert len(got) == 2 * len(frontier_rows)  # 2 products per site, deduped


def test_frontier_from_webs_config_names_empty_block(spark, tmp_path):
    """A commented-out/empty site block fails with the site named, not an
    anonymous AttributeError."""
    from bytesme_etl_batch_pipeline_spark.sources.browser import (
        frontier_from_webs_config,
    )

    cfg = tmp_path / "webs.yml"
    cfg.write_text("websites:\n  stub:\n")
    with pytest.raises(ValueError, match="stub"):
        frontier_from_webs_config(spark, str(cfg))


def test_frontier_gets_one_site_per_partition(spark, tmp_path):
    """Round-robin repartition: every frontier partition holds exactly one
    site, so no two browser sessions serialize behind each other."""
    from bytesme_etl_batch_pipeline_spark.sources.browser import (
        frontier_from_webs_config,
    )

    f = frontier_from_webs_config(spark, "/root/reference/utils/webs_config.yml")
    per_part = f.rdd.glom().map(len).collect()
    assert sorted(per_part, reverse=True)[0] == 1
    assert sum(per_part) == len(per_part)  # n rows in n partitions, 1 each
