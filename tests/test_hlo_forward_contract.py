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
    (~23 ms of broadcast_select fusions per forward, commit 131dc59).

Nothing here runs on a TPU — the contract is pinned on the lowered
StableHLO, which is backend-independent. Known-benign f32 at edge scale:
jnp.sum's reduce-accumulation upcast around the two projection sums
(convert -> reduce -> convert, fused by XLA into one pass on-chip).
"""

import re

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pesto_tpu.models import PestoModel, get_config  # noqa: E402
from pesto_tpu.models.pesto import init_params  # noqa: E402

NA, NR = 512, 64


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


def test_edge_tensors_stay_bf16(lowered_text):
    """No f32 compute at edge-tensor scale ([NA, nn, >=S]): the only f32
    appearances allowed there are jnp.sum's reduce-accumulation pattern
    (convert/reduce lines). A mul/add/select/dot line on an f32 edge
    tensor means the bf16 stream broke."""
    edge_f32 = re.compile(rf"tensor<{NA}x64x(?:\d+x)?(?:3[2-9]|\d{{3,}})xf32>")
    viol = [
        ln.strip()[:160]
        for ln in lowered_text.splitlines()
        if edge_f32.search(ln)
        and not re.search(r"stablehlo\.(reduce|convert)", ln)
    ]
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


def test_gathers_promise_in_bounds(lowered_text):
    """mode=clip lowers to clamped indices, never a select-NaN fill; the
    NaN-fill pattern (select over gather output against a NaN constant)
    must stay absent (commit 131dc59: ~23 ms/forward of
    broadcast_select fusions)."""
    nan_selects = re.findall(r"select.*nan", lowered_text, flags=re.I)
    assert not nan_selects, "gather NaN-fill select pass re-appeared"
