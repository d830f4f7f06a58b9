"""Torch checkpoint -> JAX parameter conversion.

Maps the reference state_dict layout (model/model.py:6-30,
src/model_operations.py:26-213; e.g. "sum.3.su.nqm.0.weight") onto the
PestoModel parameter pytree. torch Linear stores [out, in]; flax Dense
kernels are [in, out], so weights are transposed. The sdk buffer
(sqrt(Nk), constant) and m_nn (arange) buffers are recomputed, not ported.
"""

from typing import Dict, Optional

import numpy as np

from .models.config import PestoConfig

_MLP_IDX = {0: "Dense_0", 2: "Dense_1", 4: "Dense_2"}


def torch_state_dict_to_params(state_dict, cfg: PestoConfig) -> Dict:
    """Convert a reference torch state_dict (tensors or numpy arrays) into
    a flax params dict for PestoModel(cfg)."""

    def arr(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t, dtype=np.float32)

    params: Dict = {}

    def put(path, kernel=None, bias=None):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        leaf = node.setdefault(path[-1], {})
        if kernel is not None:
            leaf["kernel"] = kernel
        if bias is not None:
            leaf["bias"] = bias

    # layer index -> (group index, position in group) for scanned layouts
    if cfg.scan_layers:
        from .models.pesto import layer_groups

        layer_to_group = {}
        i = 0
        for g, (_, n) in enumerate(layer_groups(cfg)):
            for j in range(n):
                layer_to_group[i] = (g, j)
                i += 1

    stacked: Dict = {}  # path -> {position: array} for scanned groups

    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[-1] not in ("weight", "bias"):
            continue  # sdk / m_nn buffers
        is_weight = parts[-1] == "weight"
        v = arr(value)
        if is_weight:
            v = v.T  # torch [out,in] -> flax [in,out]

        if parts[0] == "em":
            path = ("em", _MLP_IDX[int(parts[1])])
        elif parts[0] == "sum":
            i, mlp = int(parts[1]), parts[3]
            leaf_mod = ("ppm",) if mlp == "ppm" else (mlp, _MLP_IDX[int(parts[4])])
            if cfg.scan_layers:
                g, j = layer_to_group[i]
                path = (f"sulg_{g}", "sul", "su") + leaf_mod
                skey = (path, "kernel" if is_weight else "bias")
                stacked.setdefault(skey, {})[j] = v
                continue
            path = (f"sul_{i}", "su") + leaf_mod
        elif parts[0] == "spl":
            mlp = parts[1]
            if mlp == "zdm_vec":
                path = ("spl", "zdm_vec")
            else:
                path = ("spl", mlp, _MLP_IDX[int(parts[2])])
        elif parts[0] == "dm":
            path = ("dm", _MLP_IDX[int(parts[1])])
        else:
            raise KeyError(f"unrecognized reference parameter: {key}")

        put(path, kernel=v if is_weight else None, bias=None if is_weight else v)

    # assemble scanned groups: stack layer leaves along a leading axis
    for (path, leaf), by_pos in stacked.items():
        v = np.stack([by_pos[j] for j in sorted(by_pos)], axis=0)
        put(path, kernel=v if leaf == "kernel" else None, bias=v if leaf == "bias" else None)

    return params


def infer_variant(state_dict) -> str:
    """Identify the reference preset from checkpoint tensor shapes — the
    em input width (30 element-only vs 123 full-feature), the layer
    count, and the decoder's class count (reference README.md:82-86
    variant table). Lets CLIs accept a bare --ckpt without the user
    knowing which variant trained it; a mismatched preset otherwise
    surfaces as an opaque flax scope error deep in apply()."""
    em_in = int(state_dict["em.0.weight"].shape[1])
    n_layers = 1 + max(
        int(k.split(".")[1]) for k in state_dict if k.startswith("sum.")
    )
    dm_keys = [k for k in state_dict if k.startswith("dm.") and k.endswith(".weight")]
    dm_out = int(state_dict[max(dm_keys, key=lambda k: int(k.split(".")[1]))].shape[0])
    name = {
        (30, 32, 5): "i_v4_1",
        (30, 16, 5): "i_v4_0",
        (123, 16, 5): "i_v3_0",
        (123, 16, 1): "i_v3_1",
    }.get((em_in, n_layers, dm_out))
    if name is None:
        raise ValueError(
            f"unrecognized checkpoint: em input {em_in}, {n_layers} layers, "
            f"{dm_out} classes — known variants are i_v3_0/i_v3_1/i_v4_0/i_v4_1"
        )
    return name


def load_reference_checkpoint(path: str, cfg: Optional[PestoConfig] = None):
    """Load a reference .pt checkpoint (requires torch, CPU-only). With
    cfg=None the variant is inferred from the tensor shapes and the
    (params, cfg) pair is returned; with an explicit cfg only the params
    are returned (and a variant mismatch raises with both names instead
    of failing opaquely inside flax)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    from .models.config import get_config

    if cfg is None:
        inferred = get_config(infer_variant(sd), remat=False)
        return torch_state_dict_to_params(sd, inferred), inferred
    # explicit cfg: the variant check is ADVISORY — a checkpoint outside
    # the 4 known presets (custom head, truncated stack) must still load
    # as long as its tensor names/shapes match the supplied config
    try:
        name = infer_variant(sd)
    except (ValueError, KeyError):
        name = None
    if name is not None:
        expect = get_config(name)
        if (cfg.em_n0, len(cfg.layers), cfg.dm_n2) != (
            expect.em_n0, len(expect.layers), expect.dm_n2
        ):
            raise ValueError(
                f"checkpoint {path} is variant {name} "
                f"(em {expect.em_n0}, {len(expect.layers)} layers, {expect.dm_n2} "
                f"classes) but the requested config has em {cfg.em_n0}, "
                f"{len(cfg.layers)} layers, {cfg.dm_n2} classes"
            )
    return torch_state_dict_to_params(sd, cfg)


def count_params(params) -> int:
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def params_to_torch_state_dict(params, cfg: PestoConfig) -> Dict:
    """Inverse port: a PestoModel params pytree -> a reference-layout torch
    state_dict (including the sdk / m_nn buffers the reference stores), so
    models trained here load into the reference implementation."""
    import torch

    sd: Dict = {}

    def put_dense(prefix, leaf):
        sd[prefix + ".weight"] = torch.from_numpy(np.asarray(leaf["kernel"]).T.copy())
        if "bias" in leaf:
            sd[prefix + ".bias"] = torch.from_numpy(np.asarray(leaf["bias"]).copy())

    def put_mlp(prefix, node):
        for i, name in _MLP_IDX.items():
            if name in node:
                put_dense(f"{prefix}.{i}", node[name])

    put_mlp("em", params["em"])
    put_mlp("dm", params["dm"])
    for mlp in ("sam", "zdm"):
        put_mlp(f"spl.{mlp}", params["spl"][mlp])
    put_dense("spl.zdm_vec.0", params["spl"]["zdm_vec"])

    def put_layer(i, node, lc):
        base = f"sum.{i}"
        sd[f"{base}.m_nn"] = torch.arange(lc.nn, dtype=torch.int64)
        sd[f"{base}.su.sdk"] = torch.sqrt(torch.tensor(float(lc.Nk)))
        for mlp in ("nqm", "eqkm", "epkm", "evm", "qpm"):
            put_mlp(f"{base}.su.{mlp}", node[mlp])
        put_dense(f"{base}.su.ppm.0", node["ppm"])

    if cfg.scan_layers:
        from .models.pesto import layer_groups

        i = 0
        for g, (lc, n) in enumerate(layer_groups(cfg)):
            group = params[f"sulg_{g}"]["sul"]["su"]
            for j in range(n):
                node = _index_tree(group, j)
                put_layer(i, node, lc)
                i += 1
    else:
        for i, lc in enumerate(cfg.layers):
            put_layer(i, params[f"sul_{i}"]["su"], lc)
    return sd


def _index_tree(tree, j):
    if isinstance(tree, dict):
        return {k: _index_tree(v, j) for k, v in tree.items()}
    return np.asarray(tree)[j]
