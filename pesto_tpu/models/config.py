"""Model configurations.

Presets mirror the published reference variants (README.md:82-86 and the
config.py snapshots under model/save/):

  i_v4_1  flagship: 32 layers, nn schedule 8x(8,16,32,64), element-only
          features (30-dim), 5 interface heads  (model/config.py:25-63)
  i_v4_0  16 layers, 4x(8,16,32,64), element-only, 5 heads
  i_v3_0  16 layers, element+resname+name features (123-dim), 5 heads
  i_v3_1  like i_v3_0 with a single protein-protein head
"""

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class LayerConfig:
    Ns: int = 32
    Nh: int = 2
    Nk: int = 3
    nn: int = 8


def _schedule(reps: int) -> Tuple[LayerConfig, ...]:
    out = []
    for nn in (8, 16, 32, 64):
        out.extend([LayerConfig(nn=nn)] * reps)
    return tuple(out)


@dataclasses.dataclass(frozen=True)
class PestoConfig:
    # embedding MLP (em): N0 -> N1 features; the v3 snapshots use a
    # single linear embedding
    em_n0: int = 30
    em_n1: int = 32
    em_single: bool = False
    # geometric state-update stack
    layers: Tuple[LayerConfig, ...] = _schedule(8)
    # atom->residue attention pool (spl)
    spl_n0: int = 32
    spl_n1: int = 32
    spl_nh: int = 4
    # decoder MLP (dm); i_v3_1's snapshot uses a single linear decoder
    dm_n0: int = 32
    dm_n1: int = 32
    dm_n2: int = 5
    dm_single: bool = False
    # numerics
    dtype: str = "float32"          # compute dtype: float32 | bfloat16
    param_dtype: str = "float32"
    precision: str = "highest"       # matmul precision: highest | default
    remat: bool = True               # per-layer activation rematerialization
    # remat policy: "full" recomputes everything; "dots" saves MXU outputs
    # and recomputes only elementwise work in the backward pass
    # "edges" saves only the named edge tensors (gathered neighbors,
    # packed edge-MLP output, attention weights) — ~45% of dots_nb's
    # bytes, and backward never re-runs the gather
    remat_policy: str = "full"
    # PER-GROUP remat override: scan groups whose nn >= this threshold
    # drop to FULL remat while smaller groups keep remat_policy. The
    # flagship's memory hog is the nn=64 group's saved edge activations
    # (~9 GB at 4x8k under dots_nb — more than HBM with optimizer state);
    # nn=8/16/32 together cost less than half of nn=64 and recomputing
    # only the big group buys most of dots_nb's speed at a fraction of
    # its memory. None = one policy for all groups.
    remat_full_nn_min: "int | None" = None
    # scan identical-layer groups with lax.scan: ~G x smaller XLA program
    # (the 32-layer stack compiles as 4 bodies), same math
    scan_layers: bool = True
    # decomposed edge computation: never materializes the [N,nn,6S+1] edge
    # tensor or the [N,3,3nn,S] vector-value tensor; per-atom terms leave
    # the edge loop and the edge matmul is a single MXU-aligned [4S x .]
    # contraction. Same parameters, same math up to fp reduction order.
    fused_edges: bool = True
    # run the post-gather layer chain as one Pallas kernel (see
    # ops/geometric_pallas.py; currently slower than the XLA fused path —
    # kept for experimentation, inference-only)
    pallas_edges: bool = False
    # neighbor gather strategy: "take" (XLA row gather), "onehot"
    # (tile-local one-hot MXU selection over Morton-sorted atoms; needs
    # gather tables in the batch), or "auto" (onehot when tables are
    # present). The XLA gather is row-rate-bound (~286 M rows/s on v5e)
    # while the one-hot selection rides the MXU; bf16 measured 1.04 ms vs
    # 1.46 ms per 0.5 M-row layer gather at U=1024.
    gather: str = "auto"

    @property
    def feature_flags(self):
        # (qe, qr, qn) like the reference data handler feature selection
        return (True, True, True) if self.em_n0 == 123 else (True, False, False)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


PRESETS = {
    "i_v4_1": PestoConfig(),
    "i_v4_0": PestoConfig(layers=_schedule(4)),
    "i_v3_0": PestoConfig(em_n0=123, layers=_schedule(4)),
    "i_v3_1": PestoConfig(em_n0=123, layers=_schedule(4), dm_n2=1, dm_single=True, em_single=True),
}


def get_config(name: str = "i_v4_1", **overrides) -> PestoConfig:
    cfg = PRESETS[name]
    return cfg.replace(**overrides) if overrides else cfg
