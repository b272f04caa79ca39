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


def test_ws_sets_agree():
    """The byte kernel assumes re \\s == str.isspace() and that all
    multi-byte whitespace is exactly the 17 codepoints it special-cases
    -- verify per codepoint."""
    import re
    ws_re = re.compile(r"\s")
    mb = set()
    for c in range(0x110000):
        r = bool(ws_re.match(chr(c)))
        assert r == chr(c).isspace(), hex(c)
        if r and c > 127:
            mb.add(c)
    assert mb == ({0x85, 0xA0, 0x1680, 0x2028, 0x2029, 0x202F, 0x205F,
                   0x3000} | set(range(0x2000, 0x200B)))


def test_bpe_count_equals_regex():
    """The byte-transition token counter must equal len(findall) of the
    documented regex (and n_words must equal str.split) on adversarial
    and random inputs including multi-byte whitespace."""
    import re

    import numpy as np

    from openmldb_ray.ops.text import TokenCount
    bpe_re = re.compile(
        r"[A-Z][a-z]+|[a-z]+|[A-Z]+(?![a-z])|\d+|[^\sA-Za-z0-9]")
    tc = TokenCount()
    cases = ["", "a", "A", "AB", "ABc", "ABCdef", "CamelCase", "aB",
             "a1b2", "x_y-z", "HTTPServer", "parseURLNow", "123abc",
             "ALLCAPS", "tab\tsep", "\u00e9 caf\u00e9 na\u00efve",
             "\u65e5\u672c\u8a9e text",
             "a  b\n\nc", "A1B2C3", "__init__", "don't stop",
             "MixedUPPERlower", " leading", "trailing ",
             "nb\u00a0sp", "em\u2001quad", "ideo\u3000space",
             "og\u1680ham", "next\u0085line", "ps\u2029sep",
             "\u202f\u205fab\u2000", "x\u2008y\u200az",
             "\x1c\x1d\x1e"]
    rng = np.random.default_rng(42)
    alphabet = list("abcXYZ019 .,\t\n\u00e9\u65e5_-\u00a0\u2003")
    for _ in range(300):
        n = int(rng.integers(0, 60))
        cases.append("".join(rng.choice(alphabet, size=n)))
    nw, nb = tc._counts(cases)
    assert nb.tolist() == [len(bpe_re.findall(t)) for t in cases]
    assert nw.tolist() == [len(t.split()) for t in cases]


def test_token_count_arrow_and_pandas_agree(ray_session):
    import pandas as pd
    import pyarrow as pa

    from openmldb_ray.ops.text import TokenCount
    tc = TokenCount()
    texts = ["Hello WORLD", None, "", "a1b CamelCase x_y"]
    t = tc(pa.table({"text": pa.array(texts, pa.string())}))
    df = tc(pd.DataFrame({"text": texts}))
    assert t["n_words"].to_pylist() == df["n_words"].tolist()
    assert t["n_bpe_tokens"].to_pylist() == df["n_bpe_tokens"].tolist()


def test_token_count_sliced_arrow_offsets():
    """Arrow slices carry a nonzero array offset -- the buffer math
    must rebase correctly."""
    import pyarrow as pa

    from openmldb_ray.ops.text import TokenCount
    tc = TokenCount()
    arr = pa.array(["skip me", "one two three", "CamelCase x", "a"])
    sl = arr.slice(1, 3)
    nw, nb = tc._counts(sl)
    assert nw.tolist() == [3, 2, 1]
