"""URL canonicalization, decomposition and hashing as pure column exprs.

Reference semantics reproduced (all pure `pyspark.sql.functions`, no UDFs):

- ``normalize``      — strip ALL trailing '/' (ref utils/__init__.py:52-64)
- ``defragment``     — drop '#fragment' (ref crawler/frontier.py:125-127,
                        scraper.py:96)
- ``url_sha256``     — SHA-256 hex of ``f"{netloc}/{path}/{params}/{query}"``
                        — scheme EXCLUDED, so http/https collapse
                        (ref utils/__init__.py:35-50). Conformance mode key.
- ``url_hash64``     — xxhash64 over the same canonical string: the engine's
                        64-bit seen-set key (north_rule; SURVEY.md §2.5).
- ``registered_domain`` — eTLD+1-style grouping key for politeness buckets
                        (the reference keys politeness on netloc,
                        crawler/frontier.py:42; north_rule asks for
                        registered-domain keying — we provide both).

The netloc/path/params/query decomposition matches Python ``urlparse``:
``params`` is the part after the first ';' of the LAST path segment.
Property-tested against ``urllib.parse`` in tests/test_urls.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# registered_domain evaluates a frozen public-suffix snapshot (ICANN-
# section subset, functions/psl.py) via the standard PSL algorithm —
# exceptions > exact 3-label > exact 2-label / wildcard > implicit '*';
# a full publicsuffix.org file drops in via psl.load_psl_rules.


def defragment(url: Column) -> Column:
    return F.regexp_replace(url, "#.*$", "")


def normalize(url: Column) -> Column:
    """Strip all trailing '/' — ref ``normalize`` uses ``rstrip('/')``."""
    return F.regexp_replace(url, "/+$", "")


def canonicalize(url: Column) -> Column:
    """defragment THEN normalize — the admission pipeline's P4+P5 combo.

    DELIBERATE DEVIATION from the reference order: frontier.py:123-127
    normalizes first, then defragments, so 'https://h/p/#frag' keeps its
    trailing slash ('https://h/p/') and gets a seen-key distinct from
    'https://h/p'. We strip the fragment first so both collapse to one
    canonical form — strictly fewer duplicate fetches. The conformance
    oracle (crawlspark.oracle.canonicalize) freezes the same order, so
    engine==oracle everywhere; only raw-reference byte parity differs,
    and only for fragment-after-trailing-slash URLs."""
    return normalize(defragment(url))


def netloc(url: Column) -> Column:
    """Authority component incl. port/userinfo (urlparse.netloc)."""
    return F.regexp_extract(url, r"^[^:/?#]+://([^/?#]*)", 1)


def hostname(url: Column) -> Column:
    """Host without port/userinfo, lowercased (urlparse.hostname)."""
    return F.lower(
        F.regexp_extract(url, r"^[^:/?#]+://(?:[^/?#@]*@)?(\[[^\]]*\]|[^/?#:]*)", 1)
    )


def scheme(url: Column) -> Column:
    return F.regexp_extract(url, r"^([^:/?#]+)://", 1)


def _path_full(url: Column) -> Column:
    """Path including any ';params' suffix (everything between authority
    and '?'/'#')."""
    return F.regexp_extract(url, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)


def path(url: Column) -> Column:
    """urlparse.path: ';params' split off the LAST segment only."""
    pf = _path_full(url)
    last = F.substring_index(pf, "/", -1)
    head_len = F.length(pf) - F.length(last)
    head = F.substring(pf, F.lit(1), head_len)
    return F.when(
        last.contains(";"), F.concat(head, F.substring_index(last, ";", 1))
    ).otherwise(pf)


def params(url: Column) -> Column:
    """urlparse.params: after the first ';' in the last path segment."""
    last = F.substring_index(_path_full(url), "/", -1)
    return F.regexp_extract(last, r"^[^;]*;(.*)$", 1)


def query(url: Column) -> Column:
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def canonical_key(url: Column) -> Column:
    """``f"{netloc}/{path}/{params}/{query}"`` — ref utils/__init__.py:46-50."""
    return F.concat_ws(
        "/", netloc(url), path(url), params(url), query(url)
    )


def url_sha256(url: Column) -> Column:
    """Reference-conformant seen-set key (hex sha256, scheme excluded)."""
    # concat_ws skips nulls; the components are never null here (regexp_extract
    # returns ''), so this is exactly netloc/path/params/query.
    return F.sha2(canonical_key(url), 256)


def url_hash64(url: Column) -> Column:
    """64-bit engine key over the same canonical string (north_rule)."""
    return F.xxhash64(canonical_key(url))


def registered_domain(url_or_host: Column, is_host: bool = False) -> Column:
    """eTLD+1 grouping key per the public-suffix algorithm over the
    frozen PSL snapshot (functions/psl.py) — pure column expression
    (InSet lookups in whole-stage codegen; the rule table ships inside
    the plan, no join, no shuffle). The pure-Python twin feeding the
    conformance oracle is ``psl.registered_domain_py``."""
    from crawlspark.functions.psl import registered_domain_expr

    host = url_or_host if is_host else hostname(url_or_host)
    return registered_domain_expr(host)


def resolve_href(base: Column, href: Column) -> Column:
    """Vectorized-enough RFC-3986 'join' for the common crawl cases
    (absolute, protocol-relative, root-relative, relative, query-only,
    fragment-only). Full urljoin edge cases (dot-segments) are handled in
    the parse pandas-UDF path; this covers the column-expr fast path."""
    b_scheme = scheme(base)
    b_authority = F.concat(b_scheme, F.lit("://"), netloc(base))
    b_path = _path_full(base)
    b_dir = F.concat(
        b_authority,
        F.when(
            b_path == "", F.lit("/")
        ).otherwise(
            F.regexp_replace(b_path, "[^/]*$", "")
        ),
    )
    return (
        F.when(href.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), href)
        .when(href.startswith("//"), F.concat(b_scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(b_authority, href))
        .when(href.startswith("#"), F.concat(F.regexp_replace(base, "#.*$", ""), href))
        .when(href.startswith("?"), F.concat(b_authority, b_path, href))
        .when(href == "", base)
        .otherwise(F.concat(b_dir, href))
    )
