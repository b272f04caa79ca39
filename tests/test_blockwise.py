"""Zero-shuffle blockwise corpus features (skew.blockwise_corpus_
features) must equal the shuffle plan bit-for-bit on a layout that
satisfies the cross-block contract, and must REFUSE (raise
_NotPresorted) on one that doesn't — exactness never rests on the
layout hint."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _cmp(a: pd.DataFrame, b: pd.DataFrame):
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert len(a) == len(b)
    assert set(a.columns) == set(b.columns)
    for c in a.columns:
        if a[c].dtype == object:
            assert (a[c].fillna("\0") == b[c].fillna("\0")).all(), c
        else:
            np.testing.assert_allclose(a[c].astype(float),
                                       b[c].astype(float), rtol=1e-9,
                                       err_msg=c)


def _slim(n=25_000, num_sources=8, blocks=8):
    from openmldb_ray.pipelines.synth import synth_corpus
    return synth_corpus(n, num_sources=num_sources,
                        override_num_blocks=blocks) \
        .select_columns(["doc_id", "n_tok", "source"]).materialize()


SPECS = None


def _specs():
    from openmldb_ray.pipelines.corpus import (FEATURES, RANGE_FEATURES,
                                               RANGE_SPEC, ROWS_SPEC)
    return [(ROWS_SPEC, FEATURES), (RANGE_SPEC, RANGE_FEATURES)]


def test_blockwise_matches_fused(ray_session):
    from openmldb_ray.pipelines.corpus import corpus_features_fused
    from openmldb_ray.skew import blockwise_corpus_features
    corpus = _slim()
    base = corpus_features_fused(corpus, 8).to_pandas()
    got = blockwise_corpus_features(corpus, _specs()).to_pandas()
    _cmp(base, got)


def test_blockwise_matches_fused_with_asof(ray_session):
    from openmldb_ray.pipelines.corpus import corpus_features_fused
    from openmldb_ray.skew import blockwise_corpus_features
    corpus = _slim(n=12_000, num_sources=5, blocks=6)
    base = corpus_features_fused(corpus, 8, asof_modulo=7).to_pandas()
    got = blockwise_corpus_features(corpus, _specs(),
                                    asof_modulo=7).to_pandas()
    _cmp(base, got)


def test_blockwise_single_block_and_tiny_blocks(ray_session):
    """Boundary tails spanning several predecessor blocks: 32 tiny
    blocks vs 1 block."""
    from openmldb_ray.skew import blockwise_corpus_features
    rng = np.random.default_rng(3)
    n = 4000
    rows = [{"doc_id": f"s{i % 3}-{i:08d}",
             "n_tok": int(rng.integers(16, 512)),
             "source": f"s{i % 3}"} for i in range(n)]
    many = ray.data.from_items(rows, override_num_blocks=32)
    one = ray.data.from_items(rows, override_num_blocks=1)
    _cmp(blockwise_corpus_features(many, _specs()).to_pandas(),
         blockwise_corpus_features(one, _specs()).to_pandas())


def test_blockwise_out_of_order_fragments(ray_session):
    """The condition hit in practice: files are internally ordered but
    written in task-completion order, and the read merges non-adjacent
    files into one block. Segment splitting must recover the fragments
    and still match the shuffle plan."""
    from openmldb_ray.pipelines.corpus import corpus_features_fused
    from openmldb_ray.skew import blockwise_corpus_features
    rng = np.random.default_rng(9)
    n, nfrag = 8000, 16
    rows = [{"doc_id": f"s{i % 3}-{i:08d}",
             "n_tok": int(rng.integers(16, 256)),
             "source": f"s{i % 3}"} for i in range(n)]
    frags = [rows[i * (n // nfrag):(i + 1) * (n // nfrag)]
             for i in range(nfrag)]
    perm = rng.permutation(nfrag)
    shuffled = [r for j in perm for r in frags[j]]
    # 4 blocks, each concatenating 4 non-adjacent fragments
    ds = ray.data.from_items(shuffled, override_num_blocks=4) \
        .map_batches(lambda b: b, batch_format="pyarrow",
                     batch_size=None).materialize()
    base = corpus_features_fused(ds, 8).to_pandas()
    got = blockwise_corpus_features(ds, _specs()).to_pandas()
    _cmp(base, got)


def test_blockwise_rejects_interleaved_layout(ray_session):
    """A random-shuffled corpus violates the cross-block range
    contract; assembly must raise, not silently corrupt frames."""
    from openmldb_ray.skew import _NotPresorted, blockwise_corpus_features
    rng = np.random.default_rng(11)
    order = rng.permutation(6000)
    rows = [{"doc_id": f"s{int(i) % 2}-{int(i):08d}",
             "n_tok": int(rng.integers(16, 128)),
             "source": f"s{int(i) % 2}"} for i in order]
    ds = ray.data.from_items(rows, override_num_blocks=8)
    with pytest.raises(_NotPresorted):
        blockwise_corpus_features(ds, _specs())


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_blockwise_random_fragment_layouts(ray_session, seed):
    """Property: ANY permutation of internally-ordered fragments with
    random sizes/entity mixes either matches the shuffle plan exactly
    or refuses — never silently wrong."""
    from openmldb_ray.pipelines.corpus import corpus_features_fused
    from openmldb_ray.skew import _NotPresorted, blockwise_corpus_features
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2_000, 6_000))
    nsrc = int(rng.integers(2, 6))
    rows = [{"doc_id": f"s{i % nsrc}-{i:08d}",
             "n_tok": int(rng.integers(16, 256)),
             "source": f"s{i % nsrc}"} for i in range(n)]
    # random fragmentation + permutation
    nfrag = int(rng.integers(4, 24))
    bounds = sorted(rng.choice(np.arange(1, n), nfrag - 1,
                               replace=False).tolist())
    frags = [rows[a:b] for a, b in
             zip([0] + bounds, bounds + [n])]
    perm = rng.permutation(len(frags))
    shuffled = [r for j in perm for r in frags[j]]
    blocks = int(rng.integers(2, 7))
    ds = ray.data.from_items(shuffled, override_num_blocks=blocks) \
        .map_batches(lambda b: b, batch_format="pyarrow",
                     batch_size=None).materialize()
    base = corpus_features_fused(ds, 4).to_pandas()
    try:
        got = blockwise_corpus_features(ds, _specs()).to_pandas()
    except _NotPresorted:
        return  # refusal is a correct outcome
    _cmp(base, got)


def test_skewaware_blockwise_auto(ray_session):
    """corpus_features_skewaware takes the zero-shuffle path when the
    layout holds and still equals the fused shuffle plan."""
    from openmldb_ray.pipelines.corpus import (corpus_features_fused,
                                               corpus_features_skewaware)
    corpus = _slim(n=20_000)
    base = corpus_features_fused(corpus, 8, asof_modulo=7).to_pandas()
    got = corpus_features_skewaware(corpus, 8, hot_frac=0.05,
                                    min_rows=2_000,
                                    asof_modulo=7).to_pandas()
    _cmp(base, got)


def test_blockwise_fuse_pin_matches_shuffle(ray_session, tmp_path):
    """fuse_pin=True (pass 1 riding the pin materialize) must be
    bit-equal to the shuffle plan: summaries are fragment-granular
    under read fusion, the pin merges fragments per task, and pass 2
    walks/coalesces plan fragments — over a real parquet read so the
    row-group/batch machinery is the production one."""
    from openmldb_ray.pipelines.corpus import corpus_features_fused
    from openmldb_ray.pipelines.synth import synth_corpus
    from openmldb_ray.skew import blockwise_corpus_features

    path = str(tmp_path / "corpus")
    synth_corpus(20_000, num_sources=6, override_num_blocks=8) \
        .write_parquet(path)
    from openmldb_ray.io import read_parquet_per_file
    def rd():
        return read_parquet_per_file(
            path, file_extensions=["parquet"],
            columns=["doc_id", "n_tok", "source"])
    base = corpus_features_fused(rd().materialize(), 8,
                                 asof_modulo=7).to_pandas()
    got = blockwise_corpus_features(rd(), _specs(), asof_modulo=7,
                                    fuse_pin=True).to_pandas()
    _cmp(base, got)


def test_blockwise_fragment_hole_not_coalesced(ray_session):
    """Entity fragments a1(0..k) and a2(2k..3k) merged into ONE block
    while a1.5(k..2k) lives in another: pass 2 must NOT coalesce
    a1+a2 (offsets don't chain) and must still match the shuffle
    plan."""
    from openmldb_ray.pipelines.corpus import corpus_features_fused
    from openmldb_ray.skew import blockwise_corpus_features
    rng = np.random.default_rng(21)
    n = 3000
    rows = [{"doc_id": f"sA-{i:08d}",
             "n_tok": int(rng.integers(16, 128)),
             "source": "sA"} for i in range(n)]
    k = n // 3
    blk1 = rows[:k] + rows[2 * k:]          # a1 + a2 (hole in between)
    blk2 = rows[k:2 * k]                    # a1.5
    d1 = ray.data.from_items(blk1, override_num_blocks=1) \
        .map_batches(lambda b: b, batch_format="pyarrow",
                     batch_size=None)
    d2 = ray.data.from_items(blk2, override_num_blocks=1) \
        .map_batches(lambda b: b, batch_format="pyarrow",
                     batch_size=None)
    ds = d1.union(d2).materialize()
    base = corpus_features_fused(ds, 4).to_pandas()
    got = blockwise_corpus_features(ds, _specs()).to_pandas()
    _cmp(base, got)


def test_blockwise_crosses_1e8_doc_index(ray_session):
    """Regression: at >1e8 docs the old 8-digit id pad overflowed and
    string order diverged from numeric doc order, so the verifier
    refused every block past the boundary and the engine silently fell
    back to the shuffle plan (observed at the 128M-doc scaling run).
    With the fixed-width 12-digit contract the blockwise plan must
    ACCEPT a layout spanning the boundary and match the shuffle plan;
    _doc_idx must parse any width."""
    from openmldb_ray.pipelines.corpus import (_doc_idx,
                                               corpus_features_fused)
    from openmldb_ray.skew import blockwise_corpus_features
    rng = np.random.default_rng(7)
    idx = np.arange(99_999_000, 100_001_000)        # spans 1e8
    rows = [{"doc_id": f"sA-{int(i):012d}",
             "n_tok": int(rng.integers(16, 128)),
             "source": "sA"} for i in idx]
    ds = ray.data.from_items(rows, override_num_blocks=4) \
        .map_batches(lambda b: b, batch_format="pyarrow",
                     batch_size=None).materialize()
    base = corpus_features_fused(ds, 4, asof_modulo=7).to_pandas()
    got = blockwise_corpus_features(ds, _specs(),
                                    asof_modulo=7).to_pandas()
    _cmp(base, got)
    # width-agnostic index parse (8-digit test ids, 12-digit corpus
    # ids, and the boundary itself)
    col = pa.array(["s0-00000042", "sA-000099999999",
                    "sA-000100000000", "src-0003-000000000007"])
    np.testing.assert_array_equal(
        _doc_idx(col), [42, 99_999_999, 100_000_000, 7])


def test_summary_collector_dedupes_retried_adds(ray_session):
    # a retried pin task re-pushes its batch summary; the collector
    # must drop the byte-identical duplicate instead of letting it
    # trip the interleave guard (silent demotion to shuffle fallback)
    import pyarrow as pa
    import ray as _ray

    from openmldb_ray.skew import _SummaryCollector
    c = _SummaryCollector.remote()
    t1 = pa.table({"a": [1, 2]})
    t2 = pa.table({"a": [3]})
    _ray.get(c.add.remote(t1, 10))
    _ray.get(c.add.remote(t1, 10))
    _ray.get(c.add.remote(t2, 5))
    n, mb = _ray.get(c.stats.remote())
    assert n == 2 and mb == 10
    assert _ray.get(c.drain.remote()).num_rows == 3
