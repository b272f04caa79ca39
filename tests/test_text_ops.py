"""Text-analysis op units: repetition scoring vs a brute Python
evaluator (edge cases the sf documents never hit: empty/null text,
single word, fully repetitive), fingerprint determinism."""

import numpy as np
import pandas as pd
import pytest
import ray.data


def _brute_rep(text):
    words = (text or "").split()
    bgs = [f"{a} {b}" for a, b in zip(words, words[1:])]
    n = len(bgs)
    d = len(set(bgs))
    return n, d, round(1.0 - d / n, 6) if n else 0.0


@pytest.mark.parametrize("texts", [
    ["a b a b a b", "x y z", "", None, "solo",
     "spam spam spam spam spam", "a a a b b b a a a",
     "one two three four five six seven"],
])
def test_repetition_matches_brute(ray_session, texts):
    from openmldb_ray.ops.text import RepetitionScore, with_text_features
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = with_text_features(
        ray.data.from_pandas(df), [RepetitionScore],
        batch_size=3).to_pandas().sort_values("doc_id")
    for _, row in out.iterrows():
        n, d, r = _brute_rep(texts[int(row["doc_id"])])
        assert int(row["n_bigrams"]) == n, row["doc_id"]
        assert int(row["n_distinct_bigrams"]) == d, row["doc_id"]
        assert row["dup_bigram_ratio"] == pytest.approx(r), row["doc_id"]


def test_repetition_random_vs_brute(ray_session):
    from openmldb_ray.ops.text import RepetitionScore
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 60)))
             for _ in range(200)]
    rs = RepetitionScore()
    n_bi, dist, ratio = rs._scores(texts)
    for i, t in enumerate(texts):
        n, d, r = _brute_rep(t)
        assert n_bi[i] == n and dist[i] == d, i
        assert ratio[i] == pytest.approx(r), i


def test_fingerprint_deterministic(ray_session):
    from openmldb_ray.functions.hashing import doc_fingerprints
    a = doc_fingerprints(["hello world", "foo bar baz", ""])
    b = doc_fingerprints(["hello world", "foo bar baz", ""])
    assert (a == b).all()
    assert a[0] != a[1]
