"""One-hot MXU gather path: exact equivalence with the plain row gather,
Morton-sort invariance, batching, and table construction."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from pesto_tpu.batching import attach_gather_tables, encode_and_pad, stack_batch
from pesto_tpu.models import PestoModel, get_config
from pesto_tpu.models.pesto import init_params
from pesto_tpu.spatial import build_gather_tables, morton_order, sort_encoded_item
from pesto_tpu.synthetic import random_padded_structure


def _cfg(**kw):
    base = get_config("i_v4_1", remat=False)
    return base.replace(layers=tuple([base.layers[-1], base.layers[0]]), **kw)


def _with_tables(ps):
    out = attach_gather_tables(ps)
    assert out.gather_cand is not None, "table build unexpectedly fell back"
    return out


def test_tables_roundtrip_selection():
    """cand[loc] reproduces ids exactly for every edge."""
    ps = random_padded_structure(n_atoms=300, n_res=40, na=512, nr=64, seed=0)
    ids = np.asarray(ps.ids_topk)
    cand, loc = build_gather_tables(ids, 512, tile=128)
    assert cand is not None
    T = 512 // 128
    tile_of_row = np.arange(512) // 128
    sel = cand[tile_of_row[:, None], loc]
    np.testing.assert_array_equal(sel, ids)


def test_onehot_equals_take_single():
    ps = _with_tables(random_padded_structure(n_atoms=300, n_res=40, na=512, nr=64, seed=1))
    cfg = _cfg()
    params = init_params(cfg, na=256, nr=32)
    model = PestoModel(cfg)
    z_take = model.apply({"params": params}, ps.X, ps.ids_topk, ps.q, ps.M, ps.atom_mask)
    z_oh = model.apply(
        {"params": params}, ps.X, ps.ids_topk, ps.q, ps.M, ps.atom_mask,
        ps.gather_cand, ps.gather_loc,
    )
    np.testing.assert_allclose(np.asarray(z_take), np.asarray(z_oh), rtol=1e-5, atol=1e-5)


def test_onehot_equals_take_batched():
    structures = [
        _with_tables(random_padded_structure(n_atoms=250 + 30 * i, n_res=40, na=512, nr=64, seed=i))
        for i in range(3)
    ]
    # force a common table width for stacking
    U = max(s.gather_cand.shape[1] for s in structures)
    structures = [
        dataclasses.replace(
            s,
            gather_cand=jnp.zeros((s.gather_cand.shape[0], U), jnp.int32)
            .at[:, : s.gather_cand.shape[1]]
            .set(s.gather_cand),
        )
        for s in structures
    ]
    batch = stack_batch(structures)
    assert batch.gather_cand is not None
    cfg = _cfg()
    params = init_params(cfg, na=256, nr=32)
    model = PestoModel(cfg)
    z_take = model.apply(
        {"params": params}, batch.X, batch.ids_topk, batch.q, batch.M, batch.atom_mask
    )
    z_oh = model.apply(
        {"params": params}, batch.X, batch.ids_topk, batch.q, batch.M, batch.atom_mask,
        batch.gather_cand, batch.gather_loc,
    )
    np.testing.assert_allclose(np.asarray(z_take), np.asarray(z_oh), rtol=1e-5, atol=1e-5)


def test_gather_config_take_overrides_tables():
    ps = _with_tables(random_padded_structure(n_atoms=200, n_res=30, na=256, nr=32, seed=2))
    cfg = _cfg(gather="take")
    params = init_params(cfg, na=256, nr=32)
    model = PestoModel(cfg)
    # passing tables with gather="take" must be identical to not passing them
    z1 = model.apply({"params": params}, ps.X, ps.ids_topk, ps.q, ps.M, ps.atom_mask,
                     ps.gather_cand, ps.gather_loc)
    z2 = model.apply({"params": params}, ps.X, ps.ids_topk, ps.q, ps.M, ps.atom_mask)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_sort_encoded_item_preserves_neighbors():
    rng = np.random.RandomState(3)
    n = 200
    X = (rng.rand(n, 3) * 20).astype(np.float32)
    ids = rng.randint(0, n, size=(n, 8))
    q = rng.rand(n, 5).astype(np.float32)
    M = rng.rand(n, 7).astype(np.float32)
    Xs, ids_s, qs, Ms = sort_encoded_item(X, ids, q, M)
    perm = morton_order(X)
    np.testing.assert_array_equal(Xs, X[perm])
    np.testing.assert_array_equal(qs, q[perm])
    # each sorted row's neighbor coordinates match the original row's
    np.testing.assert_array_equal(Xs[ids_s], X[ids][perm])


def test_morton_sorted_encode_invariant(example_complex_pdb):
    """Per-residue probabilities are invariant to the atom ordering."""
    from pesto_tpu.io import read_pdb
    from pesto_tpu.structure import concatenate_chains, preprocess_structure

    s = concatenate_chains(preprocess_structure(read_pdb(example_complex_pdb)))
    cfg = _cfg()
    params = init_params(cfg, na=256, nr=32)
    model = PestoModel(cfg)

    def probs(ps):
        z = model.apply(
            {"params": params}, ps.X, ps.ids_topk, ps.q, ps.M, ps.atom_mask,
            ps.gather_cand, ps.gather_loc,
        )
        return np.asarray(jax.nn.sigmoid(z))

    p_plain = probs(encode_and_pad(s))
    p_sorted = probs(encode_and_pad(s, with_gather_tables=True))
    np.testing.assert_allclose(p_plain, p_sorted, rtol=1e-4, atol=1e-4)


def test_loader_gather_tables(tmp_path):
    from pesto_tpu.data import H5Dataset
    from pesto_tpu.data.build import build_dataset_h5
    from pesto_tpu.data.loader import BucketedLoader
    from pesto_tpu.encoding import categ_to_resnames

    from tests.test_data import _two_chain_pdb

    pdb = _two_chain_pdb(tmp_path, name="7abc.pdb1")
    h5 = str(tmp_path / "gt.h5")
    build_dataset_h5([pdb], h5, progress=False)
    ds = H5Dataset(h5)
    ds.set_types(categ_to_resnames["protein"], [categ_to_resnames["protein"]])
    loader = BucketedLoader(
        ds, ds.sizes_selected(), atoms_per_batch=4096, prefetch=0,
        gather_tables=True, gather_u=512, batch_multiple=4,
    )
    batches = list(loader)
    assert batches
    for b in batches:
        assert b.gather_cand is not None and b.gather_loc is not None
        assert b.gather_cand.shape[-1] == 512
        # dummy-padded rows carry all-zero tables (select the sink)
        B, NA, K = b.gather_loc.shape
        tile_of_row = np.arange(NA) // 128
        for i in range(B):
            sel = np.asarray(b.gather_cand[i])[tile_of_row[:, None], np.asarray(b.gather_loc[i])]
            np.testing.assert_array_equal(sel, np.asarray(b.ids_topk[i]))


def test_predict_batch_pipelined_matches_single():
    """Multi-chunk software-pipelined predict_batch must equal per-structure
    prediction exactly (double-buffered encoder, device-resident ids)."""
    import numpy as np

    from pesto_tpu.infer import Predictor
    from pesto_tpu.models import get_config
    from pesto_tpu.models.pesto import init_params
    from pesto_tpu.encoding import std_elements

    cfg = get_config("i_v4_0", remat=False).replace(
        layers=tuple([get_config("i_v4_0").layers[0]] * 2)
    )
    pred = Predictor(cfg, init_params(cfg))

    rng = np.random.RandomState(7)
    structures = []
    for t in range(5):
        n = 120 + 10 * t
        n_res = n // 4
        structures.append({
            "xyz": (rng.rand(n, 3) * 30).astype(np.float32),
            "name": np.array(["CA"] * n),
            "element": np.array(std_elements[rng.randint(0, 5, n)]),
            "resname": np.array(["ALA"] * n),
            "resid": np.sort(rng.randint(1, n_res + 1, n)).astype(np.int32),
            "het_flag": np.array(["A"] * n),
            "chain_name": np.array(["A:0"] * n),
            "icode": np.array([""] * n),
        })

    # atoms budget forces 2 structures per chunk -> 3 pipelined chunks
    batch_out = pred.predict_batch(structures, atoms_per_call=512)
    for s, pb in zip(structures, batch_out):
        ps = pred.predict_structure(s)
        assert pb.shape == ps.shape
        np.testing.assert_allclose(pb, ps, atol=2e-5)


def test_predict_batch_dense_fallback_multivocab():
    """Configs with multi-vocabulary features (em_n0=123, i_v3_*) cannot
    use integer feature codes; predict_batch must fall back to dense
    one-hots and still match per-structure prediction."""
    import numpy as np

    from pesto_tpu.infer import Predictor
    from pesto_tpu.models import get_config
    from pesto_tpu.models.pesto import init_params
    from pesto_tpu.encoding import std_elements

    base = get_config("i_v3_0")
    cfg = base.replace(layers=tuple([base.layers[0]] * 2), remat=False)
    pred = Predictor(cfg, init_params(cfg))

    rng = np.random.RandomState(11)
    structures = []
    for t in range(2):
        n = 100 + 8 * t
        n_res = n // 4
        structures.append({
            "xyz": (rng.rand(n, 3) * 28).astype(np.float32),
            "name": np.array(["CA"] * n),
            "element": np.array(std_elements[rng.randint(0, 5, n)]),
            "resname": np.array(["ALA"] * n),
            "resid": np.sort(rng.randint(1, n_res + 1, n)).astype(np.int32),
            "het_flag": np.array(["A"] * n),
            "chain_name": np.array(["A:0"] * n),
            "icode": np.array([""] * n),
        })
    batch_out = pred.predict_batch(structures)
    for s, pb in zip(structures, batch_out):
        ps = pred.predict_structure(s)
        np.testing.assert_allclose(pb, ps, atol=2e-5)
