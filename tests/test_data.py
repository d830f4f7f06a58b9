"""Data layer: HDF5 build -> read roundtrip, label semantics, loader."""

import numpy as np
import pytest

from pesto_tpu.data import H5Dataset, load_sparse_mask, sparse_onehot_indices
from pesto_tpu.data.build import MOLECULE_IDS, build_dataset_h5, contacts_types
from pesto_tpu.data.dataset import load_interface_labels
from pesto_tpu.data.loader import BucketedLoader
from pesto_tpu.encoding import categ_to_resnames
from pesto_tpu.io import save_pdb
from pesto_tpu.structure import split_by_chain


def _two_chain_pdb(tmp_path, name="1abc.pdb1"):
    """Synthetic complex: two protein helices within contact distance,
    plus an ion."""
    rng = np.random.RandomState(0)
    n_res, atoms_per_res = 52, 5
    n = n_res * atoms_per_res

    def chain(offset):
        xyz = []
        for r in range(n_res):
            base = np.array([r * 1.6, offset, 0.0])
            for a in range(atoms_per_res):
                xyz.append(base + rng.rand(3))
        return np.array(xyz, dtype=np.float32)

    names = np.tile(["N", "CA", "C", "O", "CB"], n_res)
    elements = np.tile(["N", "C", "C", "O", "C"], n_res)
    resnames = np.repeat(
        np.array(list(categ_to_resnames["protein"]))[rng.randint(0, 20, n_res)], atoms_per_res
    )
    resids = np.repeat(np.arange(1, n_res + 1), atoms_per_res)
    su = {}
    for cid, off in [("A", 0.0), ("B", 4.0)]:
        su[cid] = {
            "xyz": chain(off),
            "name": names,
            "element": elements,
            "resname": resnames,
            "resid": resids,
            "het_flag": np.array(["A"] * n),
        }
    su["C"] = {
        "xyz": np.array([[0.0, 2.0, 0.0]], dtype=np.float32),
        "name": np.array(["ZN"]),
        "element": np.array(["Zn"]),
        "resname": np.array(["ZN"]),
        "resid": np.array([1]),
        "het_flag": np.array(["H"]),
    }
    path = tmp_path / name
    save_pdb(su, str(path))
    return str(path)


def test_sparse_codec_roundtrip(tmp_path):
    import h5py

    rng = np.random.RandomState(0)
    M = (rng.rand(40, 10) < 0.2).astype(np.float32)
    with h5py.File(tmp_path / "t.h5", "w") as hf:
        g = hf.create_group("g")
        g.create_dataset("M", data=sparse_onehot_indices(M))
        g.attrs["M_shape"] = M.shape
    with h5py.File(tmp_path / "t.h5", "r") as hf:
        M2 = load_sparse_mask(hf["g"], "M")
    np.testing.assert_array_equal(M, M2)


def test_contacts_types_matches_reference_oracle():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    n0, n1, r0, r1 = 30, 25, 6, 5
    prot = np.array(list(categ_to_resnames["protein"]))
    s0 = {"resname": np.repeat(prot[rng.randint(0, 20, r0)], 5)}
    s1 = {"resname": np.repeat(prot[rng.randint(0, 20, r1)], 5)}
    M0 = np.zeros((n0, r0), dtype=np.float32)
    M0[np.arange(n0), np.repeat(np.arange(r0), 5)] = 1
    M1 = np.zeros((n1, r1), dtype=np.float32)
    M1[np.arange(n1), np.repeat(np.arange(r1), 5)] = 1
    ids = np.stack([rng.randint(0, n0, 40), rng.randint(0, n1, 40)], axis=1)

    quad, shape, T = contacts_types(s0, M0, s1, M1, ids, MOLECULE_IDS)

    # reference oracle (dense 4-D construction, torch)
    c0 = torch.from_numpy(s0["resname"].reshape(-1, 1) == MOLECULE_IDS.reshape(1, -1))
    c1 = torch.from_numpy(s1["resname"].reshape(-1, 1) == MOLECULE_IDS.reshape(1, -1))
    idt = torch.from_numpy(ids)
    H = c1[idt[:, 1]].unsqueeze(1) & c0[idt[:, 0]].unsqueeze(2)
    rids0 = torch.where(torch.from_numpy(M0)[idt[:, 0]])[1]
    rids1 = torch.where(torch.from_numpy(M1)[idt[:, 1]])[1]
    Y = torch.zeros((r0, r1, len(MOLECULE_IDS), len(MOLECULE_IDS)), dtype=torch.bool)
    Y[rids0, rids1] = H
    T_ref = torch.any(torch.any(Y, dim=1), dim=0)

    ref_quad = np.stack(np.where(Y.numpy()), axis=1)
    ours = set(map(tuple, quad.astype(int)))
    theirs = set(map(tuple, ref_quad))
    assert ours == theirs
    np.testing.assert_array_equal(T, T_ref.numpy())
    assert shape == tuple(Y.shape)


def test_build_and_read_dataset(tmp_path):
    pdb = _two_chain_pdb(tmp_path)
    h5_path = str(tmp_path / "mini.h5")
    n = build_dataset_h5([pdb], h5_path, progress=False)
    assert n > 0

    ds = H5Dataset(h5_path, features_flags=(True, True, True))
    assert len(ds.keys) == n
    assert len(ds) >= 2  # at least subunits A and B have contacts
    ds.set_types(
        categ_to_resnames["protein"],
        [categ_to_resnames["protein"],
         categ_to_resnames["dna"] + categ_to_resnames["rna"],
         categ_to_resnames["ion"],
         categ_to_resnames["ligand"],
         categ_to_resnames["lipid"]],
    )
    X, ids_topk, q, M, y = ds[0]
    na = X.shape[0]
    assert ids_topk.shape == (na, 64)
    assert q.shape == (na, 30 + 29 + 64)
    assert M.shape[0] == na
    assert y.shape == (M.shape[1], 5)
    # chains are in contact -> protein-class labels present
    assert y[:, 0].sum() > 0
    # the Zn ion touches chain A -> ion labels on at least one subunit
    ion_any = any(ds[i][4][:, 2].sum() > 0 for i in range(len(ds)))
    assert ion_any


def test_interface_labels_unmatched_rows_ignored(tmp_path):
    """Rows whose type-pair matches no class are skipped (the reference
    crashes here; see data/dataset.py docstring)."""
    import h5py

    with h5py.File(tmp_path / "y.h5", "w") as hf:
        g = hf.create_group("c")
        Y = np.array([[0, 0, 5, 10], [1, 0, 70, 10], [2, 0, 5, 20]], dtype=np.uint16)
        g.create_dataset("Y", data=Y)
        g.attrs["Y_shape"] = (4, 2, 79, 79)
    with h5py.File(tmp_path / "y.h5", "r") as hf:
        y = load_interface_labels(hf["c"], np.array([5]), [np.array([10]), np.array([20])])
    expected = np.zeros((4, 2), dtype=bool)
    expected[0, 0] = True
    expected[2, 1] = True
    np.testing.assert_array_equal(y, expected)


def test_bucketed_loader(tmp_path):
    pdb = _two_chain_pdb(tmp_path)
    h5_path = str(tmp_path / "mini2.h5")
    build_dataset_h5([pdb], h5_path, progress=False)
    ds = H5Dataset(h5_path)
    ds.set_types(categ_to_resnames["protein"], [categ_to_resnames["protein"]])

    loader = BucketedLoader(ds, ds.sizes_selected(), atoms_per_batch=4096, prefetch=0)
    batches = list(loader)
    assert len(batches) >= 1
    total = sum(int(np.sum(np.asarray(b.atom_mask) > 0)) for b in batches)
    expected_atoms = sum(int(a) for a, _ in ds.sizes_selected())
    assert total == expected_atoms
    for b in batches:
        assert b.y is not None
        assert b.X.ndim == 3
        # neighbor ids must be consistent with the sink convention
        ids = np.asarray(b.ids_topk)
        am = np.asarray(b.atom_mask)
        assert np.all(ids[am == 0] == 0)


def test_select_complete_assemblies(tmp_path):
    from pesto_tpu.data import H5Dataset, select_complete_assemblies

    pdb = _two_chain_pdb(tmp_path, name="9zzz.pdb1")
    h5 = str(tmp_path / "ca.h5")
    build_dataset_h5([pdb], h5, progress=False)
    ds = H5Dataset(h5)
    assert ds.rkeys.shape == ds.keys.shape
    # removing one subunit entry invalidates its whole assembly
    m = np.ones(len(ds.keys), dtype=bool)
    m[0] = False
    keep = select_complete_assemblies(ds, m)
    assert not keep.any()  # single assembly in this dataset
    assert select_complete_assemblies(ds, np.ones(len(ds.keys), dtype=bool)).all()


def test_bucketed_loader_process_slicing(tmp_path):
    """Multi-host SPMD contract: every process computes the identical
    global plan, and the per-process row slices concatenate to exactly the
    single-process global batch (dummy padding included)."""
    pdb = _two_chain_pdb(tmp_path, name="8abc.pdb1")
    h5_path = str(tmp_path / "mini3.h5")
    build_dataset_h5([pdb], h5_path, progress=False)
    ds = H5Dataset(h5_path)
    ds.set_types(categ_to_resnames["protein"], [categ_to_resnames["protein"]])

    kw = dict(atoms_per_batch=4096, prefetch=0, batch_multiple=4, shuffle=True, seed=3)
    global_loader = BucketedLoader(ds, ds.sizes_selected(), **kw)
    local = [
        BucketedLoader(ds, ds.sizes_selected(), process_count=2, process_index=i, **kw)
        for i in range(2)
    ]

    # identical global plan on every "process"
    assert global_loader._plan() == local[0]._plan() == local[1]._plan()

    g_batches = list(global_loader)
    l_batches = [list(l) for l in local]
    assert len(g_batches) == len(l_batches[0]) == len(l_batches[1])
    for g, l0, l1 in zip(g_batches, *l_batches):
        assert g.X.shape[0] % 4 == 0
        assert l0.X.shape[0] == l1.X.shape[0] == g.X.shape[0] // 2
        for field in ["X", "ids_topk", "q", "M", "atom_mask", "res_mask", "y"]:
            gv = np.asarray(getattr(g, field))
            lv = np.concatenate([np.asarray(getattr(l0, field)), np.asarray(getattr(l1, field))])
            np.testing.assert_array_equal(gv, lv, err_msg=field)


def test_bucketed_loader_rejects_bad_process_split(tmp_path):
    pdb = _two_chain_pdb(tmp_path, name="8abd.pdb1")
    h5_path = str(tmp_path / "mini4.h5")
    build_dataset_h5([pdb], h5_path, progress=False)
    ds = H5Dataset(h5_path)
    ds.set_types(categ_to_resnames["protein"], [categ_to_resnames["protein"]])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        BucketedLoader(ds, ds.sizes_selected(), batch_multiple=3, process_count=2)


def test_bucketed_loader_worker_processes(tmp_path):
    """num_workers>0 must yield byte-identical batches, in order, vs the
    inline path (workers are forked processes running numpy-only code)."""
    pdb = _two_chain_pdb(tmp_path, name="7abc.pdb1")
    h5_path = str(tmp_path / "mp.h5")
    build_dataset_h5([pdb], h5_path, progress=False)
    ds = H5Dataset(h5_path)
    ds.set_types(categ_to_resnames["protein"], [categ_to_resnames["protein"]])

    kw = dict(atoms_per_batch=4096, shuffle=True, seed=5, gather_tables=True)
    inline = BucketedLoader(ds, ds.sizes_selected(), prefetch=0, **kw)
    mp_loader = BucketedLoader(ds, ds.sizes_selected(), num_workers=2, **kw)
    try:
        a = list(inline)
        b = list(mp_loader)
        assert len(a) == len(b) >= 1
        for ba, bb in zip(a, b):
            for field in ["X", "ids_topk", "q", "M", "atom_mask", "res_mask", "y",
                          "gather_cand", "gather_loc"]:
                va, vb = getattr(ba, field), getattr(bb, field)
                if va is None:
                    assert vb is None
                    continue
                assert isinstance(vb, np.ndarray)  # workers never touch jax
                np.testing.assert_array_equal(np.asarray(va), vb, err_msg=field)
        # second epoch reuses the pool
        b2 = list(mp_loader)
        assert len(b2) == len(b)
    finally:
        mp_loader.close()


def test_build_dataset_parallel_identical(tmp_path):
    """num_workers parsing must produce an identical dataset file content,
    and spawning workers must not leak the scrubbed device-plugin env vars
    (the parent clears them around Pool creation so worker interpreters
    come up CPU-only even when the TPU tunnel is unhealthy)."""
    import os

    import h5py

    pdbs = [_two_chain_pdb(tmp_path, name=f"6ab{c}.pdb1") for c in "cdef"]
    h5_a = str(tmp_path / "ser.h5")
    h5_b = str(tmp_path / "par.h5")
    build_dataset_h5(pdbs, h5_a, progress=False)
    env_before = {
        k: os.environ.get(k) for k in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
    }
    build_dataset_h5(pdbs, h5_b, progress=False, num_workers=2)
    env_after = {
        k: os.environ.get(k) for k in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
    }
    assert env_after == env_before

    with h5py.File(h5_a) as fa, h5py.File(h5_b) as fb:
        ka = sorted(fa["metadata/keys"][:].astype("U"))
        kb = sorted(fb["metadata/keys"][:].astype("U"))
        assert ka == kb and len(ka) > 0
        np.testing.assert_array_equal(fa["metadata/sizes"][:], fb["metadata/sizes"][:])
        k0 = fa["metadata/keys"][0].decode()
        np.testing.assert_array_equal(
            fa[f"data/structures/{k0}/X"][:], fb[f"data/structures/{k0}/X"][:]
        )
