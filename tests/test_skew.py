"""Skew path exactness: hot-entity block-parallel features must equal
the single-task fused path bit-for-bit (the reference asserts the same
for its skew optimizer, TestWindowSkewOpt.scala)."""

import numpy as np
import pandas as pd
import pytest


def _cmp(a: pd.DataFrame, b: pd.DataFrame):
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert len(a) == len(b)
    for c in a.columns:
        if a[c].dtype == object:
            assert (a[c] == b[c]).all(), c
        else:
            np.testing.assert_allclose(a[c].astype(float),
                                       b[c].astype(float), rtol=1e-9,
                                       err_msg=c)


def test_skewaware_matches_fused(ray_session):
    from openmldb_ray.pipelines.corpus import (corpus_features_fused,
                                               corpus_features_skewaware)
    from openmldb_ray.pipelines.synth import synth_corpus
    corpus = synth_corpus(30_000, num_sources=8,
                          override_num_blocks=8) \
        .select_columns(["doc_id", "n_tok", "source"]).materialize()
    base = corpus_features_fused(corpus, 8).to_pandas()
    # force the hot path: src-0000 has ~30% of 30k rows = ~9k > 2k
    skew = corpus_features_skewaware(corpus, 8, hot_frac=0.05,
                                     min_rows=2_000).to_pandas()
    _cmp(base, skew)


def test_hot_entity_block_parallel_exact(ray_session):
    """Directly: one entity split into many tiny blocks must match the
    one-block result (boundary tails spanning multiple predecessors)."""
    import ray.data
    from openmldb_ray.pipelines.corpus import (FEATURES, RANGE_FEATURES,
                                               RANGE_SPEC, ROWS_SPEC)
    from openmldb_ray.skew import hot_entity_corpus_features
    rng = np.random.default_rng(7)
    n = 3000
    rows = [{"doc_id": f"k-{i:08d}", "n_tok": int(rng.integers(16, 512)),
             "source": "k"} for i in range(n)]
    specs = [(ROWS_SPEC, FEATURES), (RANGE_SPEC, RANGE_FEATURES)]
    many = ray.data.from_items(rows, override_num_blocks=16)
    one = ray.data.from_items(rows, override_num_blocks=1)
    _cmp(hot_entity_corpus_features(many, "k", specs).to_pandas(),
         hot_entity_corpus_features(one, "k", specs).to_pandas())
