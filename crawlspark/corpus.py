"""Deterministic synthetic web corpus (FIXTURES.md) — the corpus IS the web.

Generates, from a single seed, the four input tables the engine crawls:

- ``pages``   : input_hint columns (image_id, bytes, w, h, fmt, caption,
                phash) + crawl-graph metadata (url, out_links, status,
                redirect_to, content_type, content_length)
- ``seeds``   : seed URLs (depth 0, ref crawler/frontier.py:60-67)
- ``robots``  : per-domain robots.txt bodies (Disallow/Allow precedence per
                ref crawler/robot_parser.py:39-46 + Sitemap lines)
- ``sitemaps``: sitemap XML fixtures (wp-sitemap pattern,
                ref tests/worker_test.py:207-217)

Pure driver-side numpy/pyarrow at test scale (10³–10⁵ pages). The pixel
field and caption have pure-function twins (``pixels_for_id``,
``caption_for_id``) so payload validation never needs the generator state.
Zipfian domain sizes (s≈1.1) create one hot registered domain → exercises
salted repartition. Link noise (fragments, trailing slashes, http/https
dups, traps, blocked extensions, out-of-scope hosts) exercises P4-P7 +
F1-F11.
"""

from __future__ import annotations

import os
import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawlspark.functions import images as I

VOCAB = [
    f"w{i:03d}" for i in range(400)
] + "the and of to in is that it for with data spark crawl page image wiki".split()

# "jpeg" = real baseline JFIF (functions/jpeg.py, q98 -> PSNR >= 40 dB)
FMTS = ["raw", "ppm", "bmp", "png", "jpeg_sim", "jpeg"]

# URL patterns the crawl admits (engine CrawlConfig.allowed_url_patterns for
# this corpus) — mirrors the reference's domain-allowlist style
# (scraper.py:89-103) over the synthetic .example TLD.
ALLOWED_PATTERNS = (r"https?://[a-z0-9.-]*\.example(/|$)",)


NEARDUP_EVERY = 50  # every k-th image is a one-token near-dup of its predecessor


def _raw_caption(image_id: str) -> str:
    rng = np.random.default_rng(zlib.crc32(("cap:" + image_id).encode()) & 0xFFFFFFFF)
    n = int(rng.integers(20, 101))
    words = rng.choice(len(VOCAB), size=n)
    return " ".join(VOCAB[int(w)] for w in words)


def caption_for_id(image_id: str) -> str:
    """Deterministic caption twin — 20..100 vocab words keyed by image_id.
    Every NEARDUP_EVERY-th image's caption is a one-token perturbation of
    its predecessor's (near-dup clusters for the simhash suppression path);
    the rule lives HERE so payload validation reproduces captions exactly."""
    idx = int(image_id[3:])
    if idx > 0 and idx % NEARDUP_EVERY == 0:
        base = _raw_caption(f"img{idx - 1:08d}").split()
        base[0] = "w999"
        return " ".join(base)
    return _raw_caption(image_id)


@dataclass
class CorpusSpec:
    n_pages: int = 2000
    n_domains: int = 20
    seed: int = 42
    img_sizes: tuple[int, ...] = (16, 32)
    max_links: int = 12
    # (domain_index, delay_seconds) pairs: append a "Crawl-delay: N" line
    # to those domains' robots bodies (default empty — corpora without it
    # are byte-identical to before the option existed)
    crawl_delays: tuple[tuple[int, int], ...] = ()
    # domain k gets suffix suffixes[k % len(suffixes)] — the default keeps
    # every existing corpus byte-identical; PSL fixtures pass e.g.
    # ("co.uk", "com.au") so registered_domain must walk multi-label
    # public suffixes for politeness to bucket correctly
    suffixes: tuple[str, ...] = ("example",)


def _domain(k: int, suffixes: tuple[str, ...] = ("example",)) -> str:
    return f"d{k:02d}.{suffixes[k % len(suffixes)]}"


def _host(rng: np.random.Generator, k: int, suffixes=("example",)) -> str:
    r = rng.integers(0, 4)
    dom = _domain(k, suffixes)
    return dom if r == 0 else f"s{int(r)}.{dom}"


def generate(spec: CorpusSpec) -> dict[str, pa.Table]:
    rng = np.random.default_rng(spec.seed)
    n, d = spec.n_pages, spec.n_domains

    # Zipfian domain assignment (one hot domain)
    weights = 1.0 / np.arange(1, d + 1) ** 1.1
    weights /= weights.sum()
    dom_of = rng.choice(d, size=n, p=weights)

    hosts, canon_urls, disp_urls = [], [], []
    for i in range(n):
        h = _host(rng, int(dom_of[i]), spec.suffixes)
        hosts.append(h)
        if i % 41 == 7:
            path = f"/private/wiki/p{i:06d}"       # robots-Disallowed
        elif i % 43 == 9:
            path = f"/admin/public/p{i:06d}"       # Allow-override inside Disallow
        else:
            path = f"/wiki/p{i:06d}"
        canon = f"https://{h}{path}"
        canon_urls.append(canon)
        # display noise: canonicalize(display) == canon
        r = rng.integers(0, 4)
        disp = canon + ["", "/", "#top", "/#sec"][int(r)]
        disp_urls.append(disp)

    # link graph: mostly in-scope targets + noise
    out_links: list[list[str]] = []
    for i in range(n):
        k = int(rng.integers(0, spec.max_links + 1))
        targets = rng.integers(0, n, size=k)
        links = []
        for t in targets:
            t = int(t)
            u = canon_urls[t]
            r = int(rng.integers(0, 6))
            if r == 0:
                u = u + "/"
            elif r == 1:
                u = u + "#frag"
            elif r == 2:
                u = "http://" + u[len("https://"):]  # scheme dup — same seen-key
            links.append(u)
        r = int(rng.integers(0, 100))
        if r < 20:
            links.append(f"https://other{r}.net/x/{i}")          # out-of-scope (F2)
        if r in (21, 22):
            links.append(f"https://{hosts[i]}/a/b/a/b/a/{i}")    # trap T1
        if r in (23, 24):
            links.append(f"https://{hosts[i]}/files/doc{i}.pdf") # blocked ext (F3)
        if r == 25:
            links.append(f"https://{hosts[i]}/p?utm_source=x&i={i}")  # trap T5
        if r in (26, 27):
            links.append(f"https://{hosts[i]}/p?q=a%20b+{i}&k%3D=v")  # %-escapes (parse_qs twin)
        out_links.append(links)

    # statuses / content metadata (F4/F5/F9 fixtures)
    status = np.full(n, 200, dtype=np.int32)
    redirect_to: list[str | None] = [None] * n
    content_type = ["text/html"] * n
    for i in range(n):
        if i % 97 == 1:
            status[i] = 301 if i % 2 else 302
            redirect_to[i] = canon_urls[(i + 7) % n]
        elif i % 89 == 2:
            status[i] = 404
        elif i % 83 == 3:
            status[i] = 500
        elif i % 103 == 6:
            content_type[i] = "application/pdf"

    # captions (near-dup clusters handled inside caption_for_id)
    image_ids = [f"img{i:08d}" for i in range(n)]
    captions = [caption_for_id(iid) for iid in image_ids]

    # image payloads
    bts, ws, hs, fmts, phashes = [], [], [], [], []
    for i in range(n):
        w = int(spec.img_sizes[i % len(spec.img_sizes)])
        h = int(spec.img_sizes[(i // 2) % len(spec.img_sizes)])
        fmt = FMTS[i % len(FMTS)]
        px = I.pixels_for_id(image_ids[i], w, h)
        data = I.encode_image(px, fmt)
        decoded = I.decode_image(data, fmt, w, h)
        bts.append(data)
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        phashes.append(I.average_hash64(decoded))

    content_length = np.array([len(b) + len(c) for b, c in zip(bts, captions)], dtype=np.int64)
    for i in range(n):
        if i % 101 == 5:
            content_length[i] = 20_000_000  # > MAX_CONTENT_LENGTH (F4)
        elif i % 79 == 4:
            content_length[i] = 0           # empty body (F9 skip)

    pages = pa.table(
        {
            "image_id": pa.array(image_ids),
            "bytes": pa.array(bts, type=pa.binary()),
            "w": pa.array(ws, type=pa.int32()),
            "h": pa.array(hs, type=pa.int32()),
            "fmt": pa.array(fmts),
            "caption": pa.array(captions),
            "phash": pa.array(phashes, type=pa.int64()),
            "url": pa.array(disp_urls),
            "canonical_url": pa.array(canon_urls),
            "out_links": pa.array(out_links, type=pa.list_(pa.string())),
            "status": pa.array(status),
            "redirect_to": pa.array(redirect_to, type=pa.string()),
            "content_type": pa.array(content_type),
            "content_length": pa.array(content_length),
        }
    )

    # robots: most domains disallow /private/ and /admin/, allow
    # /admin/public/ (precedence per ref robot_parser.py:39-46); every 7th
    # domain (k%7==5) serves a DIRECTIVE-LESS robots.txt (the known-domain
    # sentinel case — must be probed exactly once and its sitemap still
    # expanded); every 3rd domain lists a sitemap, and every 6th domain's
    # root sitemap is a sitemapINDEX of sub-sitemaps (wp-sitemap fixture
    # shape, ref tests/worker_test.py:207-217) exercising S7 recursion.
    def _urlset(members: list[str]) -> str:
        locs = "".join(f"<url><loc>{u}</loc></url>" for u in members)
        return (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{locs}</urlset>"
        )

    rob_rows = []
    sitemap_rows = []
    for k in range(d):
        dom = _domain(k, spec.suffixes)
        if k % 7 == 5:
            body = "# no directives here\n"
        else:
            body = (
                "User-agent: *\n"
                "Disallow: /private/\n"
                "Disallow: /admin/\n"
                "Allow: /admin/public/\n"
            )
        delay = dict(spec.crawl_delays).get(k)
        if delay is not None:
            if "User-agent" not in body:
                body += "User-agent: *\n"
            body += f"Crawl-delay: {delay}\n"
        if k % 3 == 0:
            sm_url = f"https://{dom}/wp-sitemap.xml"
            body += f"Sitemap: {sm_url}\n"
            # sitemap covers up to 10 of this domain's pages (incl. orphans)
            members = [canon_urls[i] for i in range(n) if dom_of[i] == k][:10]
            if k % 6 == 0 and len(members) >= 2:
                half = (len(members) + 1) // 2
                subs = [("posts-1", members[:half]), ("users-1", members[half:])]
                sub_urls = []
                for name, mem in subs:
                    sub_url = f"https://{dom}/wp-sitemap-{name}.xml"
                    sitemap_rows.append((dom, sub_url, _urlset(mem)))
                    sub_urls.append(sub_url)
                idx = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in sub_urls)
                xml = (
                    '<?xml version="1.0" encoding="UTF-8"?>'
                    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                    f"{idx}</sitemapindex>"
                )
                sitemap_rows.append((dom, sm_url, xml))
            else:
                sitemap_rows.append((dom, sm_url, _urlset(members)))
        rob_rows.append((dom, body))

    robots = pa.table(
        {
            "domain": pa.array([r[0] for r in rob_rows]),
            "body": pa.array([r[1] for r in rob_rows]),
        }
    )
    sitemaps = pa.table(
        {
            "domain": pa.array([r[0] for r in sitemap_rows]),
            "url": pa.array([r[1] for r in sitemap_rows]),
            "xml": pa.array([r[2] for r in sitemap_rows]),
        }
    )

    # seeds: first page of the 3 hottest domains
    seed_urls = []
    for k in range(min(3, d)):
        for i in range(n):
            if dom_of[i] == k and status[i] == 200 and "/wiki/" in canon_urls[i]:
                seed_urls.append(canon_urls[i])
                break
    seeds = pa.table({"url": pa.array(seed_urls)})

    return {"pages": pages, "seeds": seeds, "robots": robots, "sitemaps": sitemaps}


def write_corpus(out_dir: str, spec: CorpusSpec | None = None) -> dict[str, str]:
    spec = spec or CorpusSpec()
    os.makedirs(out_dir, exist_ok=True)
    tables = generate(spec)
    paths = {}
    for name, tbl in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths
