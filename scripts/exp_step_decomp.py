"""On-chip probe: decompose the production 8k-bucket TRAIN STEP into
forward / backward / optimizer components (VERDICT r4 item 4 follow-up).

The sustained mixed-bucket window is step-bound (residual -1.2%,
docs/artifacts/mixed_decomp.json), and per-shape step time is linear in
padded atoms (~35.7 us/1k atoms) — so raising train_mixed past 10.4
structures/s requires a faster step, not window engineering. This probe
measures WHERE the step time goes at the dominant shape (B=2 x 8192,
bf16 + fp32 master weights, dots_nb remat):

  fwd   eval-step program: model forward + masked BCE (no grad)
  grad  value_and_grad of the same loss (forward + remat + backward)
  step  full production train step (grad + Adam update + pos_ratios)

backward+remat = grad - fwd; optimizer+pos_ratios = step - grad.
Each program also reports XLA cost-analysis FLOPs / bytes so the
achieved-bandwidth fraction of the backward in isolation is on record
(the whole-step numbers live in bench.py: MFU 0.5%, HBM 14%).

Timing: lax.scan-chained iterations + ONE host sync (block_until_ready
is unreliable under the tunneled runtime — utils/profiling.py).

Usage: python scripts/exp_step_decomp.py [--iters 5]
Writes docs/artifacts/train_step_decomp.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


SYNC_S = 0.035  # measured host-readback cost under the tunnel (bench.py)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--na", type=int, default=8192)
    args = ap.parse_args()

    from pesto_tpu.utils import wait_for_device

    if not wait_for_device(max_wait_s=1800, log=log):
        sys.exit("device unavailable")

    import jax
    import jax.numpy as jnp

    from pesto_tpu.batching import stack_batch
    from pesto_tpu.models import get_config
    from pesto_tpu.synthetic import random_padded_structure
    from pesto_tpu.train import create_train_state
    from pesto_tpu.train.step import (
        build_eval_step_fn,
        build_train_step_fn,
    )
    from pesto_tpu.train.loss import masked_bce_with_pos_weight
    from pesto_tpu.train.step import _batched_forward
    from pesto_tpu.models import PestoModel
    from pesto_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    cfg = get_config("i_v4_1", dtype="bfloat16", precision="default",
                     remat=True, remat_policy="dots_nb")
    state, tx = create_train_state(cfg, learning_rate=1e-5)
    train_step = build_train_step_fn(cfg, tx)
    eval_step = build_eval_step_fn(cfg)
    model = PestoModel(cfg)

    batch = stack_batch([
        random_padded_structure(n_atoms=args.na - 1, n_res=1024, na=args.na,
                                nr=1024, seed=i, with_labels=True)
        for i in range(args.batch)
    ])
    batch = jax.device_put(batch)
    atoms = args.batch * (args.na - 1)

    # --- the three programs, each scanned ITERS times with one sync ----
    # The batch is loop-invariant, so each body perturbs X by a carry-
    # dependent 1e-30 epsilon (numerically a no-op in f32, but it defeats
    # XLA's loop-invariant code motion, which would otherwise hoist the
    # whole iteration out of the scan; `0.0 * acc` would be algebraically
    # simplified back to a constant).
    import dataclasses as _dc

    def _perturbed(acc):
        return _dc.replace(batch, X=batch.X + (1e-30 * acc).astype(batch.X.dtype))

    def fwd_body(acc, _):
        out = eval_step(state, _perturbed(acc))
        return acc + out["loss"], out["loss"]

    def grad_body(acc, _):
        b = _perturbed(acc)

        def loss_fn(p):
            z = _batched_forward(model, p, b)
            _, total = masked_bce_with_pos_weight(
                z, b.y, b.res_mask, state.pos_ratios, 0.5)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        eps = grads["em"]["layers_0"]["kernel"][0, 0].astype(jnp.float32)
        return acc + loss + 1e-30 * eps, loss

    def step_body(st, _):
        st, out = train_step(st, batch)
        return st, out["loss"]

    zero = jnp.zeros((), jnp.float32)
    programs = {
        "fwd_loss": (fwd_body, zero),
        "grad": (grad_body, zero),
        "train_step": (step_body, state),
    }

    results = {}
    for name, (body, carry0) in programs.items():
        tf = jax.jit(lambda c, body=body: jax.lax.scan(
            body, c, None, length=args.iters))
        t0 = time.time()
        c, losses = tf(carry0)
        _ = float(jnp.asarray(losses)[-1])
        log(f"{name}: compile+warm {time.time()-t0:.1f}s")
        t0 = time.perf_counter()
        c, losses = tf(c)
        _ = float(jnp.asarray(losses)[-1])
        dt = (time.perf_counter() - t0 - SYNC_S) / args.iters
        # cost analysis of the single-iteration program
        try:
            # analyze the CARRY output ([0]): for grad_body the plain loss
            # ([1]) does not depend on the gradients, and jitting it alone
            # would dead-code-eliminate the entire backward pass
            ca = jax.jit(lambda c, body=body: body(c, None)[0]).lower(
                carry0).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0))
            bytes_ = float(ca.get("bytes accessed", 0.0))
        except Exception as e:
            log(f"{name}: cost analysis unavailable: {type(e).__name__}")
            flops = bytes_ = 0.0
        results[name] = {
            "sec_per_iter": round(dt, 4),
            "atoms_per_sec": round(atoms / dt, 1),
            "gflop": round(flops / 1e9, 1),
            "gb_accessed": round(bytes_ / 1e9, 2),
            "achieved_gbps": round(bytes_ / 1e9 / dt, 1) if bytes_ else None,
        }
        log(f"{name}: {dt:.4f}s/iter, {atoms/dt:.0f} atoms/s, "
            f"{flops/1e9:.0f} GFLOP, {bytes_/1e9:.1f} GB "
            f"-> {bytes_/1e9/dt if bytes_ else 0:.0f} GB/s achieved")

    fwd = results["fwd_loss"]["sec_per_iter"]
    grad = results["grad"]["sec_per_iter"]
    step = results["train_step"]["sec_per_iter"]
    decomp = {
        "forward_plus_loss_sec": fwd,
        "backward_plus_remat_sec": round(grad - fwd, 4),
        "optimizer_plus_posratios_sec": round(step - grad, 4),
        "backward_to_forward_ratio": round((grad - fwd) / fwd, 2),
    }
    log(f"decomposition: fwd {fwd:.3f}s | bwd+remat {grad-fwd:.3f}s "
        f"({decomp['backward_to_forward_ratio']}x fwd) | "
        f"opt {step-grad:.3f}s")

    out = {
        "what": ("production 8k train step decomposed into forward / "
                 "backward+remat / optimizer (B=%d x %d, bf16+dots_nb)"
                 % (args.batch, args.na)),
        "iters": args.iters,
        "programs": results,
        "decomposition": decomp,
        "device": str(jax.devices()[0]),
    }
    art = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "artifacts", "train_step_decomp.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
