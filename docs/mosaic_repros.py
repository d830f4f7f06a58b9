"""Minimal, standalone repros for the Mosaic/TPU-toolchain bugs that block
the projected-to-win Pallas kernel variants (see docs/MOSAIC_BUGS.md for
the narrative, ops/geometric_pallas.py + ops/knn_pallas.py for where each
bites in production).

Run on a real TPU:  python docs/mosaic_repros.py <case>
Cases:
  vmem500        opaque tpu_compile_helper HTTP-500 from the DEFAULT 16 MB
                 scoped-vmem budget (expected: FAILS opaque, then PASSES
                 with vmem_limit_bytes raised)
  bf16broadcast  bf16 broadcast-reshape crashes the compiler; identical
                 f32 kernel compiles (expected: f32 OK, bf16 crash)
  i1carry        i1 (bool) vector loop carry fails scf.for legalization;
                 i32 carry legalizes (expected: i32 OK, i1 error)
  bitcast0       rank-0 bitcast_convert_type unsupported in-kernel;
                 rank-1 works (expected: rank-1 OK, rank-0 error)
  bisecthang     DANGEROUS: hangs the remote compiler >590 s with no
                 diagnostic (the per-row bisection pattern). Only run
                 under `timeout`; not part of any default sweep.

Each case prints PASS/FAIL lines for the control (should compile) and the
repro (should error), so a fixed toolchain is immediately visible: the
repro line flips to "compiled fine" and the corresponding production
variant (all-bf16 fused layer ~6-8 ms projected; bisection-threshold exact
kNN) becomes unblocked.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A, S = 256, 128  # one (sublane x lane) friendly tile


def _run(label, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"  {label}: compiled fine (sum={float(jnp.sum(out)):.3f})")
        return True
    except Exception as e:  # noqa: BLE001 - repro harness
        msg = str(e).splitlines()[0][:160]
        print(f"  {label}: ERROR -> {msg}")
        return False


def case_vmem500():
    """Scratch >16 MB with default budget dies with an opaque HTTP-500;
    the ONE informative build we ever got said: 'Scoped allocation with
    size 30.25M and limit 16.00M'. Raising vmem_limit_bytes fixes it."""

    def kernel(x_ref, o_ref, scratch):
        scratch[...] = x_ref[...] * 2.0
        o_ref[...] = scratch[...] + 1.0

    big = (4096, 1280)  # 4096*1280*4 B = 20 MB scratch > 16 MB default

    def call(params):
        kw = {"compiler_params": params} if params else {}
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(big, jnp.float32),
            scratch_shapes=[pltpu.VMEM(big, jnp.float32)],
            **kw,
        )

    x = jnp.ones(big, jnp.float32)
    _run("default 16MB budget (expect opaque 500)", call(None), x)
    _run(
        "vmem_limit_bytes=100MB (expect OK)",
        call(pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)),
        x,
    )


def case_bf16broadcast():
    """A [A,1] column broadcast-multiplied against [A,S] inside the kernel:
    compiles and runs in f32, crashes the remote compile helper in bf16.
    This single pattern blocks the all-bf16 fused-layer variant
    (ops/geometric_pallas.py, projected ~6-8 ms vs XLA's ~13)."""

    def make(dtype):
        def kernel(x_ref, o_ref):
            x = x_ref[...]
            col = jnp.max(x, axis=1, keepdims=True)  # [A,1] in dtype
            o_ref[...] = x * col  # broadcast over lanes

        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((A, S), dtype)
        )

    _run("f32 [A,1]*[A,S] broadcast (expect OK)",
         make(jnp.float32), jnp.ones((A, S), jnp.float32))
    _run("bf16 [A,1]*[A,S] broadcast (expect crash)",
         make(jnp.bfloat16), jnp.ones((A, S), jnp.bfloat16))


def case_i1carry():
    """Dynamic-trip-count fori_loop with a VECTOR loop carry: i32 carries
    legalize; the same loop with an i1 (bool) carry fails with 'failed to
    legalize operation scf.for'. Forces alive-masks to burn a full i32
    vreg per lane in the knockout loop (ops/knn_pallas.py)."""

    def make(as_bool):
        def kernel(x_ref, n_ref, o_ref):
            # r4 toolchain: dynamic_slice on a loaded VALUE is now
            # "Unimplemented primitive" — index the ref per-iteration
            # instead (this is the production idiom anyway).
            row0 = x_ref[0, :]
            init = row0 > 0 if as_bool else (row0 > 0).astype(jnp.int32)

            def body(i, carry):
                m = x_ref[i, :] > 0.5
                return (carry & m) if as_bool else carry * m.astype(jnp.int32)

            out = jax.lax.fori_loop(0, n_ref[0], body, init)
            o_ref[...] = out.astype(jnp.float32)[None]

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, S), jnp.float32),
            in_specs=[
                # r4 toolchain: ANY-space loads are now rejected outright
                # ("Loads are only allowed on VMEM and SMEM references"),
                # which masked the carry bug — probe with VMEM instead.
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
        )

    x = jnp.ones((8, S), jnp.float32)
    n = jnp.asarray([8], jnp.int32)
    _run("i32 vector loop carry (expect OK)", make(False), x, n)
    _run("i1 vector loop carry (expect legalize error)", make(True), x, n)


def case_bitcast0():
    """bitcast_convert_type on a rank-0 scalar inside the kernel is
    unsupported; the identical rank-1 [1] bitcast works. Forces the
    packed-key kNN variants to precompute bitpatterns on the host."""

    def make(rank0):
        def kernel(x_ref, o_ref):
            if rank0:
                v = x_ref[0, 0]  # rank-0 f32
                b = jax.lax.bitcast_convert_type(v, jnp.int32)
                o_ref[...] = jnp.full((1, S), b, jnp.int32)
            else:
                v = x_ref[0, 0:1]  # rank-1 [1] f32
                b = jax.lax.bitcast_convert_type(v, jnp.int32)
                o_ref[...] = jnp.broadcast_to(b[None], (1, S)).astype(jnp.int32)

        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, S), jnp.int32)
        )

    x = jnp.ones((1, S), jnp.float32)
    _run("rank-1 bitcast (expect OK)", make(False), x)
    _run("rank-0 bitcast (expect error)", make(True), x)


def case_bisecthang():
    """The per-row value-bisection loop (16 fori_loop steps, each a full-row
    compare+count against a scalar pivot carried per row) inside an
    otherwise-compiling kernel makes the remote compiler spin >590 s with
    no diagnostic; the same kernel minus the bisection compiles in ~60 s.
    This blocks the projected-winning exact-kNN variant (ops/knn_pallas.py:
    per-row tight thresholds would kill the Morton-discontinuity fat tail
    that makes the compaction kernel lose 40 vs 27.5 ms).
    ONLY run under `timeout 300`; it will NOT finish."""

    W = 512

    def kernel(d_ref, o_ref):
        d = d_ref[...]  # [A, W] f32 squared distances
        lo = jnp.zeros((A, 1), jnp.float32)
        hi = jnp.full((A, 1), 1e6, jnp.float32)

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum((d <= mid).astype(jnp.float32), axis=1,
                          keepdims=True)
            take_hi = cnt < 64.0
            return (jnp.where(take_hi, mid, lo), jnp.where(take_hi, hi, mid))

        lo, hi = jax.lax.fori_loop(0, 16, body, (lo, hi))
        o_ref[...] = jnp.broadcast_to(hi, (A, W)) >= d

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((A, W), jnp.bool_),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    print("  compiling the bisection kernel (expect: HANGS >590s) ...")
    _run("per-row bisection (expect hang/timeout)", call,
         jnp.abs(np.random.RandomState(0).randn(A, W)).astype(jnp.float32))


CASES = {
    "vmem500": case_vmem500,
    "bf16broadcast": case_bf16broadcast,
    "i1carry": case_i1carry,
    "bitcast0": case_bitcast0,
    "bisecthang": case_bisecthang,
}

if __name__ == "__main__":
    names = sys.argv[1:] or [c for c in CASES if c != "bisecthang"]
    for name in names:
        print(f"[{name}]")
        CASES[name]()
