"""ANN variants: brute-force exactness (vs numpy), IVF/LSH recall."""

import numpy as np
import pytest
import ray.data


def _mk(n=2000, d=16, seed=5):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": m[i].tolist()} for i in range(n)]
    return m, rows


def test_bruteforce_exact(ray_session):
    from openmldb_ray.ops.ann import knn_bruteforce
    m, rows = _mk()
    ds = ray.data.from_items(rows)
    q = m[:3].astype(np.float64)
    out = knn_bruteforce(ds, q, [0, 1, 2], k=5).to_pandas()
    mm = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qi in range(3):
        sims = mm @ mm[qi]
        exp = set(np.argsort(-sims)[:5].tolist())
        got = set(out[out["query_id"] == qi]["vec_id"].tolist())
        assert got == exp, qi


@pytest.mark.parametrize("variant", ["ivf", "lsh"])
def test_approx_recall(ray_session, variant):
    from openmldb_ray.ops.ann import knn_bruteforce, knn_ivf, knn_lsh
    m, rows = _mk()
    ds = ray.data.from_items(rows).materialize()
    q = m[:4].astype(np.float64)
    exact = knn_bruteforce(ds, q, [0, 1, 2, 3], k=10).to_pandas()
    if variant == "ivf":
        approx = knn_ivf(ds, q, [0, 1, 2, 3], k=10, num_clusters=8,
                         nprobe=4).to_pandas()
    else:
        approx = knn_lsh(ds, q, [0, 1, 2, 3], k=10, num_bits=4).to_pandas()
    recalls = []
    for qi in range(4):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    # the query vector itself is in the corpus -> its own cluster/bucket
    # is always probed; average recall should be clearly non-trivial
    assert np.mean(recalls) > 0.3, recalls


def test_embedding_dups_autoscale_bits(ray_session):
    """num_bits=None must pick ceil(log2(n/target)) so expected bucket
    size stays ~target; recall vs the exact all-pairs mode must stay
    high for genuinely near-duplicate pairs (high cosine => collision
    probability (1 - theta/pi)^bits stays near 1)."""
    from openmldb_ray.ops.ann import embedding_dup_pairs
    rng = np.random.default_rng(11)
    n, d = 3000, 16
    base = rng.standard_normal((n, d))
    # plant 60 near-duplicate pairs: tiny perturbations of a base row
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(n)]
    for j in range(60):
        v = base[j] + 0.02 * rng.standard_normal(d)
        rows.append({"vec_id": n + j, "embedding": v.tolist()})
    ds = ray.data.from_items(rows).materialize()

    exact = embedding_dup_pairs(ds, threshold=0.95, num_bits=0).to_pandas()
    auto = embedding_dup_pairs(ds, threshold=0.95,
                               target_bucket_rows=400).to_pandas()
    # auto mode must actually bucket (3060/400 -> 3 bits) ...
    assert len(auto) <= len(exact)
    e = set(zip(exact["id_a"], exact["id_b"]))
    a = set(zip(auto["id_a"], auto["id_b"]))
    assert a <= e                       # no false positives ever
    assert len(a) / max(len(e), 1) > 0.5, (len(a), len(e))
    # every planted pair is in the exact set
    planted = {(j, n + j) for j in range(60)}
    assert planted <= e


def test_kmeans_distributed_converges(ray_session):
    """Full-corpus Lloyd via map_batches partial sums must find the
    planted cluster structure and give IVF recall at least as good as
    the sample-trained path."""
    from openmldb_ray.ops.ann import (kmeans_distributed, knn_bruteforce,
                                      knn_ivf)
    rng = np.random.default_rng(3)
    d, per = 8, 500
    # angularly well-separated planted centers (cosine k-means finds
    # DIRECTIONS; random gaussian centers can nearly share an angle)
    centers = np.eye(4, d) * 5.0
    pts = np.vstack([c + rng.standard_normal((per, d))
                     for c in centers])
    rows = [{"vec_id": i, "embedding": pts[i].tolist()}
            for i in range(len(pts))]
    ds = ray.data.from_items(rows).repartition(6).materialize()

    cent = kmeans_distributed(ds, 4, iters=10, sample_rows=200)
    assert cent.shape == (4, d)
    # every planted center's direction is represented by some centroid
    cn = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    sims = cn @ cent.T
    assert (sims.max(axis=1) > 0.95).all(), sims.max(axis=1)

    q = pts[:3].astype(np.float64)
    exact = knn_bruteforce(ds, q, [0, 1, 2], k=10).to_pandas()
    approx = knn_ivf(ds, q, [0, 1, 2], k=10, num_clusters=4, nprobe=1,
                     train="distributed").to_pandas()
    recalls = []
    for qi in range(3):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    # nprobe=1 on well-separated clusters: near-perfect recall
    assert np.mean(recalls) > 0.9, recalls


def test_ivf_index_persisted_bitequal_and_resume(ray_session, tmp_path):
    """build_ivf_index + knn_ivf_indexed must equal knn_ivf with the
    same (deterministic) training config; a second build is a resumed
    no-op (the _SUCCESS manifest short-circuits it)."""
    import os
    from openmldb_ray.ops.ann import build_ivf_index, knn_ivf, knn_ivf_indexed
    m, rows = _mk(n=2500)
    ds = ray.data.from_items(rows).materialize()
    q = m[:4].astype(np.float64)
    idx = str(tmp_path / "ivf_index")

    build_ivf_index(ds, idx, num_clusters=8, seed=42)
    assert os.path.exists(os.path.join(idx, "_SUCCESS"))
    assert os.path.exists(os.path.join(idx, "centroids.parquet"))

    got = knn_ivf_indexed(idx, q, [0, 1, 2, 3], k=10,
                          nprobe=4).to_pandas()
    ref = knn_ivf(ds, q, [0, 1, 2, 3], k=10, num_clusters=8, nprobe=4,
                  seed=42).to_pandas()
    key = ["query_id", "rank"]
    got = got.sort_values(key).reset_index(drop=True)
    ref = ref.sort_values(key).reset_index(drop=True)
    assert got["vec_id"].tolist() == ref["vec_id"].tolist()
    assert np.allclose(got["cosine_sim"], ref["cosine_sim"])

    # resume: second build must not rewrite (mtime unchanged)
    mt = os.path.getmtime(os.path.join(idx, "_SUCCESS"))
    build_ivf_index(ds, idx, num_clusters=8, seed=42)
    assert os.path.getmtime(os.path.join(idx, "_SUCCESS")) == mt

    # the read-time prune: only the probed cluster partitions open
    parts = [p for p in os.listdir(os.path.join(idx, "assigned"))
             if p.startswith("ivf_cluster=")]
    assert len(parts) == 8
