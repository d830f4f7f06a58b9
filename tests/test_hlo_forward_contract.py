"""Lowered-HLO structural tests for the forward's performance contract.

The serving/training throughput rests on properties that are invisible
to numerical tests and were each regressed (and re-won) at least once
during rounds 2-3:

  - the bf16 stream: the whole layer stack (state, gathered neighbors,
    geometry) stays bf16 — one f32-typed mask or constant silently
    upcasts every [N, nn, *] edge tensor and doubles the HBM traffic of
    the dominant ops (models/pesto.py StateUpdateLayer comment);
  - ONE dynamic neighbor gather per scan group plus the topology take:
    the combined 4S-wide qp gather is the per-layer cost floor — a
    second dynamic gather per layer (e.g. the q and p gathers splitting
    apart again) re-adds the dominant per-layer cost;
  - in-bounds gathers: `mode="clip"` kills XLA's NaN-fill select pass
    (~23 ms/forward of broadcast_select fusions, commit 131dc59).

Nothing here runs on a TPU — the contract is pinned on the lowered
StableHLO, which is backend-independent. Each marker the tests grep for
is SELF-CHECKED against a miniature lowering that deliberately contains
the regression, so a jax version that changes the text form fails the
self-check loudly instead of leaving a vacuous guard.
"""

import re

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pesto_tpu.models import PestoModel, get_config  # noqa: E402
from pesto_tpu.models.pesto import init_params  # noqa: E402

NA, NR = 512, 64
# smallest edge tensor of the stack: [NA, nn=8, S=32] — any f32 tensor
# this big (or bigger) is edge-scale compute
EDGE_NUMEL = NA * 8 * 32


@pytest.fixture(scope="module")
def lowered_text():
    cfg = get_config("i_v4_1", remat=False, dtype="bfloat16",
                     precision="default", gather="take")
    params = init_params(cfg, na=NA, nr=NR)
    model = PestoModel(cfg)
    X = jnp.zeros((NA, 3), jnp.float32)
    ids = jnp.zeros((NA, 64), jnp.int32)
    q0 = jnp.zeros((NA, cfg.em_n0), jnp.float32)
    M = jnp.zeros((NA, NR), jnp.float32)
    am = jnp.zeros((NA,), jnp.float32)
    fn = jax.jit(lambda p, *a: model.apply({"params": p}, *a))
    return fn.lower(params, X, ids, q0, M, am).as_text()


def _tensor_shapes(text):
    """All (shape, dtype) tensor types appearing per line."""
    for ln in text.splitlines():
        for m in re.finditer(r"tensor<((?:\d+x)+)(f32|bf16|f16)>", ln):
            dims = [int(d) for d in m.group(1).rstrip("x").split("x")]
            yield ln, dims, m.group(2)


def test_edge_tensors_stay_bf16(lowered_text):
    """No f32 compute at edge-tensor scale: any rank>=3 f32 tensor with
    >= EDGE_NUMEL elements is a violation unless the line is a
    reduce-accumulation pattern (jnp.sum's convert/reduce upcast, which
    XLA fuses into one pass on-chip). Covers every nn group (8/16/32/64)
    and scan-stacked 4-D forms — the earlier regex only watched nn=64."""
    viol = []
    for ln, dims, dt in _tensor_shapes(lowered_text):
        if dt != "f32" or len(dims) < 3:
            continue
        # edge tensors carry the S(=32)-wide feature axis last; the
        # residue pool's one-time [NA, NR, 2Nh] f32 softmax (runs once
        # per forward, not per layer) has a narrow trailing axis
        if int(np.prod(dims)) < EDGE_NUMEL or dims[-1] < 32:
            continue
        if re.search(r"stablehlo\.(reduce|convert)", ln):
            continue
        viol.append(ln.strip()[:140])
    assert not viol, f"f32 edge-scale compute (bf16 stream broken): {viol[:4]}"


def test_dynamic_gather_count(lowered_text):
    """Exactly 5 dynamic (data-dependent-index) gathers: one combined
    4S-wide qp gather per scan group (4 groups) + the topology take in
    unpack_state_features. Constant-index gathers (slices in disguise)
    are free and excluded. A 6th dynamic gather means the combined
    neighbor gather split apart."""
    dyn = [
        ln for ln in lowered_text.splitlines()
        if '"stablehlo.gather"' in ln and "indices_are_sorted = false" in ln
    ]
    assert len(dyn) == 5, f"dynamic gather count {len(dyn)} != 5"


NAN_MARKERS = ("0x7FC0", "0x7fc0")  # f32 NaN dense<0x7FC00000>, bf16 dense<0x7FC0>


def test_gathers_promise_in_bounds(lowered_text):
    """mode=clip lowers to clamped indices with no NaN fill. The marker
    (a NaN constant in the lowering) is self-checked against a
    deliberate fill-mode gather so a jax text-format change cannot turn
    this guard vacuous (an earlier `select.*nan` regex matched nothing:
    the constant and the select lower on separate lines)."""
    x = jnp.zeros((4, 3), jnp.float32)
    i = jnp.zeros((2, 2), jnp.int32)
    fill_text = jax.jit(
        lambda x, i: jnp.take(x, i, axis=0, mode="fill", fill_value=jnp.nan)
    ).lower(x, i).as_text()
    assert any(m in fill_text for m in NAN_MARKERS), (
        "marker self-check failed: NaN-fill lowering no longer carries a "
        "recognizable NaN constant — update NAN_MARKERS"
    )
    assert not any(m in lowered_text for m in NAN_MARKERS), (
        "gather NaN-fill pass re-appeared (mode=clip lost?)"
    )
