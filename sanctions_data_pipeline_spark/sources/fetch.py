"""Injectable feed-acquisition layer (reference main.py:72-146, 202-247).

The reference's entry point is a live scrape: drive a browser to the
sanctions page, find the first XML and PDF links, download each with
its Content-Disposition filename, then parse. This sandbox has no
network (and no browser), so the transport is an INJECTED callable —
``fetch(url) -> (bytes, headers)`` — with a stdlib urllib default for
real deployments. Everything above the transport (filename choice,
link-discovery cascade, scrape -> pipeline wiring) is pure and fully
tested offline against the packaged fixtures.

Divergence note: the reference renders the page with Playwright and
probes XPaths (main.py:104-109, 207-212); this layer scans static-HTML
hrefs with the same preference cascade (path-hint matches first, then
any link with the right suffix). Pages that only materialize links via
JS need a fetch callable that does its own rendering — the seam exists
for exactly that.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from html.parser import HTMLParser
from typing import Callable

FetchFn = Callable[[str], tuple[bytes, dict]]


def urllib_fetch(url: str, timeout: int = 60) -> tuple[bytes, dict]:
    """Default transport: stdlib urllib with redirects. Raises on HTTP
    errors (reference raise_for_status, main.py:79-80)."""
    from urllib.request import Request, urlopen

    req = Request(url, headers={"User-Agent": "sanctions-data-pipeline-spark"})
    with urlopen(req, timeout=timeout) as resp:  # noqa: S310 - injectable
        return resp.read(), dict(resp.headers)


def filename_from_headers(url: str, headers: dict) -> str:
    """Content-Disposition filename, else URL basename, else a default;
    path separators sanitized (reference main.py:82-93)."""
    cd = next((v for k, v in headers.items()
               if k.lower() == "content-disposition"), "")
    filename = None
    if "filename" in cd.lower():
        m = re.search(r"filename\*?=(?:UTF-8''|\"?)([^\";]+)\"?", cd,
                      flags=re.IGNORECASE)
        if m:
            filename = m.group(1).strip().strip('"')
    if not filename:
        filename = url.split("/")[-1].split("?")[0] or "downloaded_file"
    return filename.replace("\\", "_").replace("/", "_")


def download_url_to_file(url: str, dest_folder: str,
                         fetch: FetchFn = urllib_fetch) -> str:
    """Fetch ``url`` and write it under ``dest_folder`` with the
    server-suggested filename. Returns the local path."""
    os.makedirs(dest_folder, exist_ok=True)
    content, headers = fetch(url)
    dest = os.path.join(dest_folder, filename_from_headers(url, headers))
    with open(dest, "wb") as fh:
        fh.write(content)
    return dest


class _HrefCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)


def discover_link(html: str, base_url: str, suffix: str,
                  path_hints: tuple[str, ...] = ()) -> str:
    """First matching link using the reference's preference cascade
    (main.py:104-139, 207-236): links whose href contains BOTH the
    suffix and a path hint win, in hint order; otherwise the first link
    containing the suffix anywhere. Root-relative hrefs resolve against
    the page's scheme+host (reference hard-codes its one host)."""
    parser = _HrefCollector()
    parser.feed(html)
    lower = [(h, h.lower()) for h in parser.hrefs]
    href = next((h for hint in path_hints
                 for h, hl in lower if suffix in hl and hint in hl), None)
    if href is None:
        href = next((h for h, hl in lower if suffix in hl), None)
    if href is None:
        raise RuntimeError(f"Could not find {suffix} link on the page.")
    # urljoin handles every href shape correctly: absolute (returned
    # as-is), root-relative, plain relative, and protocol-relative
    # ('//host/...' — a hand-rolled startswith('/') check would mangle
    # that into scheme+host+'//host/...')
    from urllib.parse import urljoin

    return urljoin(base_url, href)


def playwright_page_fetch(url: str, timeout: int = 60) -> tuple[bytes, dict]:
    """Rendering transport for the PAGE fetch: drive a headless browser
    so links that only materialize via JS exist in the DOM we scan —
    the reference's Playwright step (main.py:104-109, 207-212). Only
    used for the landing page; file downloads stay on the raw
    transport, mirroring the reference's browser-for-page /
    requests-for-files split."""
    from playwright.sync_api import sync_playwright  # noqa: I001 - gated

    with sync_playwright() as p:
        browser = p.chromium.launch()
        try:
            page = browser.new_page()
            page.goto(url, timeout=timeout * 1000, wait_until="networkidle")
            html = page.content()
        finally:
            browser.close()
    return html.encode("utf-8"), {"content-type": "text/html"}


def default_page_fetch(fetch: FetchFn = urllib_fetch) -> FetchFn:
    """Feature-detected page transport (same gating pattern as the
    pypdf/PIL upgrades): Playwright's rendering fetch when the package
    is importable, else the raw transport's static HTML."""
    try:
        import playwright.sync_api  # noqa: F401
    except ImportError:
        return fetch
    return playwright_page_fetch


@dataclass(frozen=True)
class ScrapeResult:
    xml_path: str
    pdf_path: str


def scrape_to_local(page_url: str, workdir: str,
                    fetch: FetchFn = urllib_fetch,
                    page_fetch: FetchFn | None = None) -> ScrapeResult:
    """Reference steps 0-1 (find + download XML and PDF) against any
    transport. The XML lands in ``workdir/xml``, the PDF in
    ``workdir/pdf`` — same layout the reference builds. The page is
    fetched through ``page_fetch``; the discovered files always
    download through ``fetch``. The Playwright rendering transport is
    auto-selected ONLY when the caller left the raw transport at its
    default — a caller-injected ``fetch`` (offline replay, tests) must
    keep driving the page fetch too, never a real headless browser."""
    if page_fetch is None:
        page_fetch = default_page_fetch(fetch) if fetch is urllib_fetch else fetch
    html_bytes, _ = page_fetch(page_url)
    html = html_bytes.decode("utf-8", errors="replace")
    xml_url = discover_link(html, page_url, ".xml",
                            ("/travelbans/file/", "export"))
    pdf_url = discover_link(html, page_url, ".pdf", ("travelbans",))
    return ScrapeResult(
        xml_path=download_url_to_file(
            xml_url, os.path.join(workdir, "xml"), fetch),
        pdf_path=download_url_to_file(
            pdf_url, os.path.join(workdir, "pdf"), fetch),
    )


def run_scrape_pipeline(spark, page_url: str, workdir: str,
                        fetch: FetchFn = urllib_fetch):
    """Full reference entry point: scrape -> PDF text -> analyst table.
    With the default transport this needs network; tests inject a
    fixture-backed fetch and prove byte-parity with the local path."""
    from sanctions_data_pipeline_spark.pipeline import run_pipeline
    from sanctions_data_pipeline_spark.sources.pdf_source import extract_pdf_text

    got = scrape_to_local(page_url, workdir, fetch)
    return run_pipeline(spark, got.xml_path,
                        extract_pdf_text(spark, got.pdf_path))
