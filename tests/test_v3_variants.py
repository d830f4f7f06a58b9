"""Parity for the i_v3_0 / i_v3_1 checkpoints (123-dim element+resname+
name features; i_v3_1 has a single protein head)."""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from pesto_tpu.batching import pad_structure_arrays
from pesto_tpu.encoding import encode_features, encode_structure
from pesto_tpu.infer import Predictor
from pesto_tpu.io import read_pdb
from pesto_tpu.models import get_config
from pesto_tpu.structure import clean_structure

from tests.test_model_parity import _crop

CKPT_V30 = "/root/reference/model/save/i_v3_0_2021-05-27_14-27/model.pt"
CKPT_V31 = "/root/reference/model/save/i_v3_1_2021-05-28_12-40/model.pt"


def _torch_model(ckpt, n2):
    torch = pytest.importorskip("torch")
    import importlib.util
    import os

    # use the model.py snapshot from the checkpoint's own save dir (the
    # i_v3_1 snapshot has a single-linear decoder)
    model_py = os.path.join(os.path.dirname(ckpt), "model.py")
    sys.path.insert(0, os.path.dirname(ckpt))
    sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location(
            f"ref_pesto_model_{abs(hash(ckpt))}", model_py
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove("/root/reference")
        sys.path.remove(os.path.dirname(ckpt))
    cfg = {
        "em": {"N0": 123, "N1": 32},
        "sum": [
            {"Ns": 32, "Nh": 2, "Nk": 3, "nn": nn}
            for nn in [8] * 4 + [16] * 4 + [32] * 4 + [64] * 4
        ],
        "spl": {"N0": 32, "N1": 32, "Nh": 4},
        "dm": {"N0": 32, "N1": 32, "N2": n2},
    }
    model = mod.Model(cfg)
    model.load_state_dict(torch.load(ckpt, map_location="cpu", weights_only=True))
    return torch, model.eval()


@pytest.mark.parametrize("preset,ckpt,n2", [("i_v3_0", CKPT_V30, 5), ("i_v3_1", CKPT_V31, 1)])
def test_v3_parity(preset, ckpt, n2, example_pdb):
    import os

    if not os.path.isfile(ckpt):
        pytest.skip("checkpoint missing")
    torch, ref_model = _torch_model(ckpt, n2)

    structure = _crop(clean_structure(read_pdb(example_pdb)))
    X, M = encode_structure(structure)
    q = np.concatenate(encode_features(structure), axis=1)
    assert q.shape[1] == 123

    Xt = torch.from_numpy(X)
    R = Xt.unsqueeze(0) - Xt.unsqueeze(1)
    D = torch.norm(R, dim=2)
    D = D + torch.max(D) * (D < 1e-2).float()
    knn = min(64, D.shape[0])
    _, ids_topk = torch.topk(D, knn, dim=1, largest=False)
    ids = torch.zeros((X.shape[0], 64), dtype=torch.long)
    ids[:, :knn] = ids_topk + 1
    with torch.no_grad():
        z_ref = ref_model.forward(Xt, ids, torch.from_numpy(q), torch.from_numpy(M)).numpy()

    cfg = get_config(preset, remat=False)
    assert cfg.em_n0 == 123 and cfg.dm_n2 == n2
    assert cfg.feature_flags == (True, True, True)
    pred = Predictor.from_reference_checkpoint(ckpt, cfg)
    ps = pad_structure_arrays(X, q, M, ids_topk_raw=ids_topk.numpy())
    z = np.asarray(pred.logits(ps))[: M.shape[1]]

    perr = np.abs(jax.nn.sigmoid(z) - 1 / (1 + np.exp(-z_ref))).max()
    assert perr < 1e-4, f"{preset} probability err {perr}"
