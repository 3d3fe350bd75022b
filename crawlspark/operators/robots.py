"""robots.txt + sitemap operators (S6/S7/F6 in SURVEY.md §2).

Reference parser: /root/reference/crawler/robot_parser.py —
line-oriented parse honoring the engine's user-agent or '*';
``can_fetch(path)``: a path is blocked iff it startswith a Disallow prefix
and no Allow prefix also matches (Allow overrides Disallow,
robot_parser.py:39-46). Sitemap lines collected regardless of UA section.

Engine form:
- ``parse_robots``: pandas UDF over (domain, body) → exploded rule rows
  (rule_type, path_prefix) + sitemap URL rows — a table, not a parser
  object, so gating is a relational join.
- ``robots_gate``: candidates × rules broadcast join;
  allowed iff max(disallow-match) == 0 OR max(allow-match) == 1 per URL.
- ``parse_sitemaps``: pandas UDF XML parse → exploded <loc> URLs.

The reference keys its parser cache by netloc (frontier.py:136-141); the
corpus serves one robots.txt per registered domain, so the engine keys
rules by registered_domain (documented bridge).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RULES_SCHEMA = T.StructType(
    [
        T.StructField("registered_domain", T.StringType()),
        T.StructField("rule_type", T.StringType()),  # allow|disallow|sitemap|probed
        T.StructField("value", T.StringType()),
        T.StructField("rule_pos", T.IntegerType()),  # body directive order
    ]
)


def parse_robots_py(
    domain: str, body: str, user_agent: str = "*"
) -> list[tuple[str, str, str, int]]:
    """Pure-Python twin of the reference parse (robot_parser.py:9-36).
    Returns (domain, rule_type, value, rule_pos) rows; rule_pos preserves
    body directive order (sitemap expansion follows Sitemap lines in
    order). EVERY parsed domain additionally emits a ('probed', '', -1)
    sentinel so the rules table doubles as the known-domains set — a
    domain whose robots yields zero directives must never be re-probed
    (and its corpus sitemap must still be expanded once)."""
    rows: list[tuple[str, str, str, int]] = [(domain, "probed", "", -1)]
    current_ua = None
    pos = 0
    for line in (body or "").split("\n"):
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        parts = line.split(":", 1)
        if len(parts) != 2:
            continue
        directive, value = parts[0].strip().lower(), parts[1].strip()
        if directive == "user-agent":
            current_ua = value
        elif directive == "sitemap":
            rows.append((domain, "sitemap", value, pos))
            pos += 1
        elif current_ua == user_agent or current_ua == "*":
            if directive == "allow" and value:
                rows.append((domain, "allow", value, pos))
                pos += 1
            elif directive == "crawl-delay" and value:
                # UA-scoped Crawl-delay (de-facto extension the reference
                # ignores entirely; opt-in via respect_crawl_delay) —
                # consumed by the engine's per-domain pacing, inert for
                # the allow/disallow gate and sitemap expansion
                rows.append((domain, "crawl_delay", value, pos))
                pos += 1
            elif directive == "disallow" and value:
                rows.append((domain, "disallow", value, pos))
                pos += 1
    return rows


def parse_robots(bodies: DataFrame, user_agent: str = "*") -> DataFrame:
    """(registered_domain, body) → rule rows via mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[str, str, str, int]] = []
            for dom, body in zip(pdf["registered_domain"], pdf["body"]):
                out.extend(parse_robots_py(dom, body, user_agent))
            yield pd.DataFrame(
                out, columns=["registered_domain", "rule_type", "value", "rule_pos"]
            )

    return bodies.select("registered_domain", "body").mapInPandas(gen, _RULES_SCHEMA)


def can_fetch_py(rules: list[tuple[str, str]], path: str) -> bool:
    """Twin of CustomRobotsParser.can_fetch (robot_parser.py:39-46)."""
    for rtype, prefix in rules:
        if rtype == "disallow" and path.startswith(prefix):
            for rtype2, prefix2 in rules:
                if rtype2 == "allow" and path.startswith(prefix2):
                    return True
            return False
    return True


def robots_gate(candidates: DataFrame, rules: DataFrame, path_col: str = "path",
                broadcast_rules: bool = True) -> DataFrame:
    """Append boolean ``robots_allowed`` to candidates.

    Candidates need (registered_domain, <path_col>). Rules are per-domain
    prefix rows — broadcast while small; the rules table grows with the
    domain count (10^8+ domains at the north_rule scale), so the engine
    flips ``broadcast_rules`` off past its domain budget and the gate
    becomes a shuffled hash join on registered_domain. Verdict is one
    aggregate per candidate URL: blocked iff any disallow-prefix matches
    and no allow-prefix matches."""
    r = rules.filter(F.col("rule_type").isin("allow", "disallow"))
    joined = candidates.select("url_hash", "registered_domain", path_col).join(
        F.broadcast(r) if broadcast_rules else r, "registered_domain", "left"
    )
    hit = F.col(path_col).startswith(F.col("value"))
    verdict = joined.groupBy("url_hash").agg(
        F.max(
            F.when((F.col("rule_type") == "disallow") & hit, 1).otherwise(0)
        ).alias("dis"),
        F.max(
            F.when((F.col("rule_type") == "allow") & hit, 1).otherwise(0)
        ).alias("alw"),
    )
    allowed = (F.col("dis") == 0) | (F.col("alw") == 1)
    return candidates.join(
        verdict.select("url_hash", allowed.alias("robots_allowed")), "url_hash", "left"
    ).fillna({"robots_allowed": True})


def parse_sitemap_py(xml: str) -> list[str]:
    """<loc> extraction — works for both <urlset> and <sitemapindex>
    documents (the caller decides whether a loc is a page or another
    sitemap to fetch; see operators/admission.expand_sitemaps)."""
    import re as _re

    return _re.findall(r"<loc>\s*([^<\s][^<]*?)\s*</loc>", xml or "")


def parse_sitemaps(sitemaps: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """(registered_domain, [extra string cols…], xml) →
    (registered_domain, [extra…], loc, loc_pos). ``extra_cols`` are
    passed through per emitted loc (the expansion loop threads its DFS
    path key this way)."""
    cols = ["registered_domain", *extra_cols]
    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in cols]
        + [T.StructField("loc", T.StringType()), T.StructField("loc_pos", T.IntegerType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tup in pdf[cols + ["xml"]].itertuples(index=False, name=None):
                *head, xml = tup
                for i, loc in enumerate(parse_sitemap_py(xml)):
                    rows.append((*head, loc, i))
            yield pd.DataFrame(rows, columns=cols + ["loc", "loc_pos"])

    return sitemaps.select(*cols, "xml").mapInPandas(gen, schema)
