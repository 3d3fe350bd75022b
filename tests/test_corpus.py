"""Corpus generator: determinism, twins, payload validation end-to-end."""

from __future__ import annotations

import numpy as np
import pytest

from crawlspark import corpus as C
from crawlspark.operators.payload import validate_payloads


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    C.write_corpus(str(d), C.CorpusSpec(n_pages=300, n_domains=8, seed=7))
    return str(d)


def test_deterministic(tmp_path):
    a = C.generate(C.CorpusSpec(n_pages=50, n_domains=4, seed=3))
    b = C.generate(C.CorpusSpec(n_pages=50, n_domains=4, seed=3))
    assert a["pages"].equals(b["pages"])
    assert a["robots"].equals(b["robots"])


def test_caption_twin():
    t = C.generate(C.CorpusSpec(n_pages=120, n_domains=4, seed=3))["pages"]
    ids = t.column("image_id").to_pylist()
    caps = t.column("caption").to_pylist()
    for i, c in zip(ids, caps):
        assert c == C.caption_for_id(i)
    # near-dup rule took effect
    assert caps[100].split()[0] == "w999"
    assert caps[100].split()[1:] == caps[99].split()[1:]


def test_payload_validation_all_valid(spark, corpus_dir):
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    from pyspark.sql import functions as F

    rep = validate_payloads(pages)
    n_valid = rep.agg(F.sum(F.col("valid").cast("int"))).collect()[0][0]
    n = pages.count()
    assert n_valid == n, rep.filter("not valid").show(5)
    # lossy rows really exercise the PSNR path (finite, >= 40)
    lossy = rep.join(
        pages.select("image_id", "fmt"), "image_id"
    ).filter("fmt = 'jpeg_sim'")
    rows = lossy.select("psnr").collect()
    assert rows and all(40.0 <= r.psnr < 999.0 for r in rows)
