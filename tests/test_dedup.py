"""Near-dup dedup conformance: the distributed pipelines (bucketed
band pairs -> join-back verify) must agree with a brute-force exact
Jaccard oracle on a small synthetic corpus with planted duplicates.
"""

import numpy as np
import pytest
import ray.data

from openmldb_ray.functions.hashing import shingle_hashes_batch
from openmldb_ray.ops.dedup import (dedup_exact, dedup_minhash,
                                    minhash_duplicate_pairs,
                                    ngram_jaccard_pairs,
                                    simhash_duplicate_pairs)


def _corpus():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(400)]
    base = [" ".join(rng.choice(vocab, 40)) for _ in range(40)]
    rows = []
    for i, t in enumerate(base):
        rows.append({"doc_id": i, "text": t})
    # planted near-dups: copy with 1-2 words changed
    for j, src in enumerate([0, 3, 7, 12]):
        w = base[src].split()
        w[5] = "CHANGED"
        rows.append({"doc_id": 100 + j, "text": " ".join(w)})
    # exact dup
    rows.append({"doc_id": 200, "text": base[1]})
    return rows


def _brute_pairs(rows, k=3, threshold=0.5):
    texts = [r["text"] for r in rows]
    ids = [r["doc_id"] for r in rows]
    sh, off = shingle_hashes_batch(texts, k)
    sets = [set(sh[off[i]:off[i + 1]].tolist()) for i in range(len(rows))]
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            jac = inter / union if union else 1.0
            if jac >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b))
    return out


def test_minhash_pairs_match_brute(ray_session):
    rows = _corpus()
    ds = ray.data.from_items(rows)
    got = minhash_duplicate_pairs(ds, jaccard_threshold=0.5).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    exp = _brute_pairs(rows, threshold=0.5)
    # minhash candidate generation is probabilistic but at J>=0.9
    # (planted dups) the 32-band/4-row config misses with p < 1e-10
    assert got_pairs == exp
    # verify stage reports exact jaccard
    assert (got["jaccard"] >= 0.5).all()


def test_ngram_jaccard_pairs_match_brute(ray_session):
    rows = _corpus()
    ds = ray.data.from_items(rows)
    got = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    assert got_pairs == _brute_pairs(rows, threshold=0.5)


def test_dedup_minhash_drops_id_b_side(ray_session):
    rows = _corpus()
    ds = ray.data.from_items(rows)
    exp_drop = {b for _, b in _brute_pairs(rows, threshold=0.5)}
    kept = dedup_minhash(ds, jaccard_threshold=0.5).to_pandas()
    assert set(kept["doc_id"]) == {r["doc_id"] for r in rows} - exp_drop


def test_dedup_exact_keeps_min_id(ray_session):
    rows = _corpus()
    ds = ray.data.from_items(rows)
    kept = dedup_exact(ds).to_pandas()
    # doc 200 duplicates doc 1 -> dropped; everything else unique
    assert set(kept["doc_id"]) == {r["doc_id"] for r in rows} - {200}


def test_simhash_pairs_find_planted_dups(ray_session):
    rows = _corpus()
    ds = ray.data.from_items(rows)
    got = simhash_duplicate_pairs(ds, max_hamming=10).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    # the exact dup must collide at distance 0; planted near-dups are
    # 1-word edits -> tiny Hamming distance
    assert (1, 200) in got_pairs
    for a, b in [(0, 100), (3, 101), (7, 102), (12, 103)]:
        assert (a, b) in got_pairs
    assert (got["hamming"] <= 10).all()


def test_attach_texts_broadcast_equals_join_fallback(ray_session):
    """_attach_texts has two plans: the sparse-candidate broadcast
    semi-join (default) and the bucketed hash_join fallback (guards
    exceeded). Both must emit identical pair rows."""
    import pyarrow as pa

    from openmldb_ray.ops.dedup import _attach_texts
    rows = _corpus()
    ds = ray.data.from_items(rows)
    cand = ray.data.from_arrow(pa.table({
        "id_a": [0, 3, 7, 1, 12],
        "id_b": [100, 101, 102, 200, 103]}))

    def run(**kw):
        out = _attach_texts(cand, ds, "text", "doc_id", **kw) \
            .to_pandas().sort_values(["id_a", "id_b"]) \
            .reset_index(drop=True)
        return out[sorted(out.columns)]
    bcast = run()
    fallback = run(broadcast_max_ids=0)   # force the join plan
    assert bcast.equals(fallback)
    assert len(bcast) == 5
    texts = {r["doc_id"]: r["text"] for r in rows}
    for _, r in bcast.iterrows():
        assert r["__text_a__"] == texts[r["id_a"]]
        assert r["__text_b__"] == texts[r["id_b"]]
