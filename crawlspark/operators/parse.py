"""HTML parse operators — P1 link extraction + P2 text extraction.

Reference: ``extract_text_and_next_links`` (/root/reference/scraper.py:43-74):
BeautifulSoup parse, ``<header>/<footer>/<nav>`` subtrees dropped BEFORE
link collection (so their links never enter the frontier), every
``a[href]`` absolutized with ``urljoin(page_url, href)``, then
``script``/``style`` dropped and ``soup.get_text()`` taken — text therefore
excludes header/footer/nav/script/style content.

No bs4/lxml offline → stdlib ``html.parser`` with a skip-depth machine,
wrapped in an Arrow ``mapInPandas`` (the engine's pattern: Python only at
the batch boundary). The synthetic corpus carries links in a column (same
operator shape, SURVEY.md §2.2 P1), so this operator is exercised by its
own tests and available for real-HTML corpora.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_DROP_LINKS = {"header", "footer", "nav"}     # decomposed pre-link-scan (scraper.py:60-61)
_DROP_TEXT = {"script", "style"}              # decomposed pre-get_text  (scraper.py:71-72)
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class _RefParser(HTMLParser):
    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.links: list[str] = []
        self.texts: list[str] = []
        self._drop_link_depth = 0
        self._drop_text_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _VOID:
            return
        if tag in _DROP_LINKS:
            self._drop_link_depth += 1
        if tag in _DROP_TEXT:
            self._drop_text_depth += 1
        if tag == "a" and self._drop_link_depth == 0:
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(urljoin(self.base, v))
                    break

    def handle_endtag(self, tag):
        if tag in _DROP_LINKS and self._drop_link_depth > 0:
            self._drop_link_depth -= 1
        if tag in _DROP_TEXT and self._drop_text_depth > 0:
            self._drop_text_depth -= 1

    def handle_data(self, data):
        if self._drop_link_depth == 0 and self._drop_text_depth == 0:
            self.texts.append(data)


def parse_html_py(url: str, html: str) -> tuple[list[str], str]:
    """Pure-Python twin: (absolutized links, visible text)."""
    p = _RefParser(url)
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    return p.links, "".join(p.texts)


_PARSE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("text", T.StringType()),
    ]
)


def extract_links_and_text(pages: DataFrame, url_col: str = "url",
                           html_col: str = "content") -> DataFrame:
    """(url, content) → (url, links, text), Arrow-batched."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, c in zip(pdf[url_col], pdf[html_col]):
                if isinstance(c, (bytes, bytearray)):
                    c = bytes(c).decode("utf-8", errors="replace")
                links, text = parse_html_py(u, c)
                rows.append((u, links, text))
            yield pd.DataFrame(rows, columns=["url", "links", "text"])

    return pages.select(url_col, html_col).mapInPandas(gen, _PARSE_SCHEMA)
