"""Flagship pipeline invariants (north rule): per-row token-array
equality through the pipeline, row preservation, checkpoint resume."""

import numpy as np
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


def test_flagship_token_equality(ray_session, tmp_path):
    from openmldb_ray.pipelines.corpus import build_corpus, flagship
    out = flagship(SF, num_buckets=8, include_tokens=True).to_pandas()
    src = build_corpus(SF).to_pandas()
    assert len(out) == len(src)
    src_map = dict(zip(src["doc_id"], src["tokens"]))
    for did, toks in zip(out["doc_id"], out["tokens"]):
        np.testing.assert_array_equal(np.asarray(toks),
                                      np.asarray(src_map[did]),
                                      err_msg=did)


def test_fused_asof_equals_broadcast_join(ray_session):
    """The co-partitioned fused as-of plan (fuse_asof=True) must be
    bit-equal to the explicit build_dim + broadcast last_join plan —
    every feature column AND the as-of payload, per doc_id."""
    from openmldb_ray.pipelines.corpus import build_corpus, run_flagship
    a = run_flagship(build_corpus(SF), num_buckets=4, dim_modulo=5,
                     fuse_asof=True).to_pandas()
    b = run_flagship(build_corpus(SF), num_buckets=4, dim_modulo=5,
                     fuse_asof=False).to_pandas()
    assert len(a) == len(b) and len(a) > 0
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert sorted(a.columns) == sorted(b.columns)
    for c in sorted(a.columns):
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            np.testing.assert_allclose(
                av.astype(float), bv.astype(float), rtol=0, atol=0,
                err_msg=c)
        else:
            np.testing.assert_array_equal(av, bv, err_msg=c)


def test_fused_asof_hot_path_equality(ray_session):
    """Same equality with the hot-entity block-parallel branch ACTIVE
    (min_rows lowered so src-0000 splits out): the last-dim carry
    across sorted blocks must reproduce the broadcast join exactly."""
    from openmldb_ray.joins import last_join
    from openmldb_ray.pipelines.corpus import (build_corpus, build_dim,
                                               corpus_features_skewaware)
    corpus = build_corpus(SF)
    a = corpus_features_skewaware(corpus, num_buckets=4, min_rows=10,
                                  materialize=False,
                                  asof_modulo=5).to_pandas()
    feats = corpus_features_skewaware(build_corpus(SF), num_buckets=4,
                                      min_rows=10)
    dim = build_dim(feats, modulo=5)
    b = last_join(feats, dim, on="source", order_by="dim_ts",
                  left_ts="ts", payload=["payload"],
                  broadcast=True).to_pandas()
    assert len(a) == len(b) and len(a) > 0
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    for c in sorted(a.columns):
        np.testing.assert_allclose(
            a[c].to_numpy().astype(float), b[c].to_numpy().astype(float),
            rtol=0, atol=0, err_msg=c) if a[c].dtype.kind in "fiu" \
            else np.testing.assert_array_equal(a[c].to_numpy(),
                                               b[c].to_numpy(), err_msg=c)


def test_position_axis_monotonic(ray_session):
    from openmldb_ray.pipelines.corpus import add_position_axis, build_corpus
    wts = add_position_axis(build_corpus(SF)).to_pandas()
    for _, g in wts.groupby("source"):
        g = g.sort_values("doc_id")
        ts = g["ts"].to_numpy()
        n = g["n_tok"].to_numpy()
        assert ts[0] == 0
        np.testing.assert_array_equal(np.diff(ts), n[:-1])


def test_checkpoint_resume(ray_session, tmp_path):
    from openmldb_ray.state.checkpoint import (checkpoint, is_complete,
                                               read_manifest)
    d = str(tmp_path / "stage")
    ds = ray.data.range(1000)
    out = checkpoint(ds, d)
    assert out.count() == 1000
    assert is_complete(d)
    man = read_manifest(d)
    assert sum(m["rows"] for m in man) == 1000
    # resume: a different (would-be wrong) dataset must NOT overwrite
    out2 = checkpoint(ray.data.range(5), d)
    assert out2.count() == 1000


def test_synth_corpus_deterministic(ray_session):
    from openmldb_ray.pipelines.synth import synth_corpus
    a = synth_corpus(2000, override_num_blocks=2).to_pandas()
    b = synth_corpus(2000, override_num_blocks=7).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()
    assert (a["n_tok"] == b["n_tok"]).all()
    # skew: hot key ~30%
    frac = (a["source"] == "src-0000").mean()
    assert 0.25 < frac < 0.35
    for x, y in zip(a["tokens"].head(50), b["tokens"].head(50)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_entry_contract(ray_session):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e
    res = e.entry()
    df = res.to_pandas() if isinstance(res, ray.data.Dataset) else res
    assert len(df) >= 0
    assert "doc_id" in df.columns and "tokens" in df.columns
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)


def test_skewaware_pin_dir_checkpoint(ray_session, tmp_path):
    """pin_dir mode: the slim projection pins to a resumable parquet
    checkpoint instead of the object store; results unchanged and the
    checkpoint is reused on a second call."""
    import os

    from openmldb_ray.pipelines.corpus import (build_corpus,
                                               corpus_features_skewaware)
    sf = "/root/testdata/sf0.001"
    pin = str(tmp_path / "slim_pin")
    a = corpus_features_skewaware(build_corpus(sf), num_buckets=4,
                                  hot_frac=0.2, min_rows=10,
                                  pin_dir=pin).to_pandas()
    assert os.path.exists(os.path.join(pin, "_SUCCESS"))
    b = corpus_features_skewaware(build_corpus(sf), num_buckets=4,
                                  hot_frac=0.2, min_rows=10,
                                  pin_dir=pin).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b[a.columns])
