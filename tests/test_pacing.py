"""Wall-clock politeness property under --pace (VERDICT r1 #10),
mirroring the reference's spacing assertion
(/root/reference/tests/multithreading_worker_test.py:177-182): any two
fetches from the same registered domain must be >= politeness_delay
apart in wall time.

Bridge argument (frozen in SURVEY.md §2.9): the engine fetches at most
K URLs per domain per round, and with pace_wallclock each round lasts
>= delay — so consecutive same-domain fetches sit in different rounds
and are automatically >= delay apart. The test asserts BOTH halves:
round starts spaced >= delay, and <= K same-domain fetches per round.
"""

from __future__ import annotations

import time
from collections import Counter

from crawlspark import corpus as C
from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine

DELAY = 0.25


def test_wallclock_politeness_spacing(spark, tmp_path):
    d = str(tmp_path / "corpus")
    C.write_corpus(d, C.CorpusSpec(n_pages=40, n_domains=5, seed=3))
    cfg = CrawlConfig(
        allowed_url_patterns=C.ALLOWED_PATTERNS,
        politeness_delay_s=DELAY,
        per_domain_quota=1,
    )
    eng = CrawlEngine(
        spark, cfg, d, str(tmp_path / "state"),
        checkpoint_interval=100, pace_wallclock=True,
    )
    eng.start(resume=False)

    starts = []
    for _ in range(4):
        t0 = time.monotonic()
        if not eng.run_round():
            break
        starts.append(t0)
    assert len(starts) >= 3, "corpus drained too fast for the property"

    # 1. rounds (politeness ticks) are >= delay apart in wall time
    gaps = [b - a for a, b in zip(starts, starts[1:])]
    assert all(g >= DELAY - 0.02 for g in gaps), gaps

    # 2. at most K fetches per registered domain per round
    per_round = Counter(
        (r["registered_domain"], r["completed_round"])
        for r in eng.completed.select(
            "registered_domain", "completed_round"
        ).collect()
        if r["completed_round"] is not None
    )
    assert per_round and max(per_round.values()) <= cfg.per_domain_quota
