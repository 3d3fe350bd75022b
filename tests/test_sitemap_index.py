"""S7 sitemap-index recursion + known-domain sentinel (frozen spec;
reference fixture shape: wp-sitemap.xml index → sub-sitemaps,
/root/reference/tests/worker_test.py:207-217, expected frontier
contents tests/simple_frontier_test.py:113-134)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.operators import admission as ADM
from crawlspark.operators import robots as R

IDX = (
    '<?xml version="1.0"?><sitemapindex>'
    "<sitemap><loc>https://d.example/wp-sitemap-posts-1.xml</loc></sitemap>"
    "<sitemap><loc>https://d.example/wp-sitemap-users-1.xml</loc></sitemap>"
    "</sitemapindex>"
)
POSTS = (
    '<?xml version="1.0"?><urlset>'
    "<url><loc>https://d.example/wiki/p1</loc></url>"
    "<url><loc>https://d.example/wiki/p2</loc></url>"
    "</urlset>"
)
USERS = (
    '<?xml version="1.0"?><urlset>'
    "<url><loc>https://d.example/wiki/u1</loc></url>"
    # nested index entry at max depth: followed one more level
    "<url><loc>https://d.example/wp-sitemap-deep-1.xml</loc></url>"
    "</urlset>"
)
DEEP = (
    '<?xml version="1.0"?><urlset>'
    "<url><loc>https://d.example/wiki/deep1</loc></url>"
    # a sitemap loc at level 3 would exceed SITEMAP_MAX_LEVELS: dropped
    "<url><loc>https://d.example/wp-sitemap-toodeep.xml</loc></url>"
    "</urlset>"
)


def test_expand_sitemaps_recurses_index(spark, tmp_path):
    rules = spark.createDataFrame(
        [
            ("d.example", "probed", "", -1),
            ("d.example", "sitemap", "https://d.example/wp-sitemap.xml", 0),
        ],
        "registered_domain string, rule_type string, value string, rule_pos int",
    )
    sm = spark.createDataFrame(
        [
            ("d.example", "https://d.example/wp-sitemap.xml", IDX),
            ("d.example", "https://d.example/wp-sitemap-posts-1.xml", POSTS),
            ("d.example", "https://d.example/wp-sitemap-users-1.xml", USERS),
            ("d.example", "https://d.example/wp-sitemap-deep-1.xml", DEEP),
        ],
        "registered_domain string, url string, xml string",
    )
    n = [0]

    def mat(df, name):
        n[0] += 1
        p = str(tmp_path / f"m{n[0]}_{name}")
        df.write.mode("overwrite").parquet(p)
        return spark.read.parquet(p)

    cand = ADM.expand_sitemaps(rules, sm, mat, seq=100).orderBy("sub_pos").collect()
    # DFS order: posts(p1,p2) then users(u1, deep(deep1)); sitemap locs
    # themselves are never page candidates; too-deep sitemap dropped
    assert [r["raw_url"] for r in cand] == [
        "https://d.example/wiki/p1",
        "https://d.example/wiki/p2",
        "https://d.example/wiki/u1",
        "https://d.example/wiki/deep1",
    ]
    assert all(r["src"] == "sitemap" and r["depth"] == 0 for r in cand)
    assert all(r["parent_seq"] == 101 for r in cand)  # seq + dom_rank
    assert [r["sub_pos"] for r in cand] == [1, 2, 3, 4]


def test_expand_sitemaps_legacy_flat(spark, tmp_path):
    """Without a url column every stored XML parses flat (pre-index form)."""
    rules = spark.createDataFrame(
        [("d.example", "probed", "", -1)],
        "registered_domain string, rule_type string, value string, rule_pos int",
    )
    sm = spark.createDataFrame(
        [("d.example", POSTS)], "registered_domain string, xml string"
    )
    cand = ADM.expand_sitemaps(rules, sm, lambda df, _n: df, seq=0).collect()
    assert sorted(r["raw_url"] for r in cand) == [
        "https://d.example/wiki/p1",
        "https://d.example/wiki/p2",
    ]


def test_ruleless_domain_probed_once(spark):
    """A robots body with zero directives still yields the 'probed'
    sentinel, so the domain is known and never re-parsed (ADVICE round 1)."""
    rows = R.parse_robots_py("d.example", "# nothing here\n")
    assert rows == [("d.example", "probed", "", -1)]
    bodies = spark.createDataFrame(
        [("d.example", "")], "registered_domain string, body string"
    )
    out = R.parse_robots(bodies).collect()
    assert len(out) == 1 and out[0]["rule_type"] == "probed"
