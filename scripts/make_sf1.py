#!/usr/bin/env python
"""Generate the sf1 (10x sf0.1) documents/embeddings tables for the
scaling proof (VERDICT r4 #9). Deterministic pure-pyarrow synthesis —
same schemas and distribution SHAPE as the driver's testdata (word-salad
text over a small vocab, 1-in-50 planted near-dup, 64-dim float
embeddings with an id+100000-style twin structure left to the queries),
so every `queries()` callable runs unchanged with sf_dir pointed here.

Usage: python scripts/make_sf1.py [out_dir]   (default /root/repo/.sf1)
Writes documents.parquet (50,000 rows) and embeddings.parquet (20,000).
The directory is gitignored — regenerate on demand (~5 s).
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = 50_000
N_VECS = 20_000
DIM = 64

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data join scala python arrow codegen shuffle stage task executor "
    "driver plan prune skew salt broadcast bucket page crawl fetch parse "
    "robots frontier dedup shingle minhash simhash cosine vector anchor "
    "cell probe rank token word char doc corpus sample split pack shard"
).split()

LANGS = ["en", "zh", "de", "fr", "es", "ja"]
SOURCES = [f"src{i}" for i in range(20)]


def _doc_text(rng: np.random.Generator) -> str:
    n = int(rng.integers(30, 90))
    return " ".join(VOCAB[int(i)] for i in rng.integers(0, len(VOCAB), n))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
    os.makedirs(out, exist_ok=True)

    rng = np.random.default_rng(zlib.crc32(b"crawlspark-sf1") & 0xFFFFFFFF)
    texts: list[str] = []
    for i in range(N_DOCS):
        if i % 50 == 49 and i > 0:
            # planted near-dup: one-token perturbation of the predecessor
            # (same 1/50 density as the sf0.1 fixtures)
            toks = texts[-1].split()
            toks[0] = "zz" + toks[0]
            texts.append(" ".join(toks))
        else:
            texts.append(_doc_text(rng))
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(
                [LANGS[int(i)] for i in rng.integers(0, len(LANGS), N_DOCS)]
            ),
            "source": pa.array(
                [SOURCES[int(i)] for i in rng.integers(0, len(SOURCES), N_DOCS)]
            ),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64), pa.int64()
            ),
        }
    )
    pq.write_table(docs, os.path.join(out, "documents.parquet"))

    vrng = np.random.default_rng(zlib.crc32(b"crawlspark-sf1-vec") & 0xFFFFFFFF)
    # loose clusters matching the testdata distribution: noise on the
    # order of the center norm keeps same-cluster cosines ≈ 0.5, so (as
    # in /root/testdata) NO accidental pairs sit above the 0.8/0.9
    # near-dup thresholds — the dedup queries plant their own twins.
    # (A first cut used 0.35 noise: ~10^7 accidental pairs ≥ 0.9 turned
    # embedding_neardup_lsh output-quadratic — fixture property, caught
    # by the sf1 scaling run.)
    centers = vrng.standard_normal((16, DIM))
    labels = vrng.integers(0, 16, N_VECS)
    vecs = centers[labels] + 1.0 * vrng.standard_normal((N_VECS, DIM))
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(N_VECS), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(out, "embeddings.parquet"))
    print(f"wrote {out}: documents={N_DOCS}, embeddings={N_VECS} (dim {DIM})")


if __name__ == "__main__":
    main()
