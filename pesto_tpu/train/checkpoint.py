"""Orbax checkpointing of the full train state (params + optimizer moments
+ pos_ratios + global_step), plus the reference's run-dir snapshot
semantics (model/main.py:216-218 saves model_ckpt.pt; the reference loses
optimizer state on resume — we keep it)."""

import json
import os
from typing import Optional

import jax
import numpy as np


def save_checkpoint(ckpt_dir: str, state, step: Optional[int] = None, keep: int = 3):
    """Single-process: snapshot to host then save. Multi-host (pod
    slices): save the SHARDED jax.Arrays directly — orbax writes each
    process's addressable shards and assembles a distributed checkpoint;
    every process must call this (the train loop does, unconditionally)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    step = int(state.global_step) if step is None else int(step)
    payload = state if jax.process_count() > 1 else jax.device_get(state)
    with ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()
    return step


class AsyncCheckpointer:
    """Overlap checkpoint WRITES with training: the device->host snapshot
    happens on the caller's thread (cheap; the caller is at a step
    boundary anyway), the orbax write happens on one background worker so
    the next train step dispatches immediately instead of waiting out the
    filesystem (round-4 sustained-window ask: save_checkpoint sat inside
    the step loop). One worker; saves to the same dir are naturally
    serialized, a second save request while one is in flight queues.
    Single-process only — multi-host orbax saves are collective across
    processes and must stay synchronous (save_checkpoint)."""

    def __init__(self):
        import queue
        import threading

        self._q = queue.Queue()
        self._errors = []
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="pesto-ckpt-writer")
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            ckpt_dir, payload, step, keep = item
            try:
                import orbax.checkpoint as ocp

                with ocp.CheckpointManager(
                    ckpt_dir,
                    options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                         create=True),
                ) as mgr:
                    mgr.save(step, args=ocp.args.StandardSave(payload))
                    mgr.wait_until_finished()
            except Exception as e:  # noqa: BLE001 — surfaced via .errors
                self._errors.append(e)
            finally:
                self._q.task_done()

    def save(self, ckpt_dir: str, state, step: Optional[int] = None,
             keep: int = 3) -> int:
        if jax.process_count() > 1:
            return save_checkpoint(ckpt_dir, state, step=step, keep=keep)
        step = int(state.global_step) if step is None else int(step)
        payload = jax.device_get(state)  # snapshot NOW; train may mutate
        self._q.put((os.path.abspath(ckpt_dir), payload, step, keep))
        return step

    @property
    def errors(self):
        return list(self._errors)

    def wait(self):
        """Block until all queued saves have been written."""
        self._q.join()
        if self._errors:
            raise self._errors[0]

    def close(self):
        self._q.join()
        self._q.put(None)
        self._thread.join(timeout=30.0)
        if self._errors:
            raise self._errors[0]


def latest_step(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, state_template, step: Optional[int] = None):
    """Restore into the structure of state_template; returns None if no
    checkpoint exists."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            return None
        # multi-host: a sharded template makes orbax restore each
        # process's shards in place (distributed restore)
        target = state_template if jax.process_count() > 1 else jax.device_get(state_template)
        return mgr.restore(step, args=ocp.args.StandardRestore(target))


def restore_params(ckpt_dir: str, params_template,
                   step: Optional[int] = None):
    """Restore ONLY the model parameters from a TrainState checkpoint.

    Optimizer-state trees differ across lr-schedule families (a constant
    optax.adam and a scheduled one checkpoint different opt_state
    structures), so consumers that just want weights for inference —
    e.g. `benchmark_ppi --orbax-ckpt` — must not have to reconstruct the
    exact optimizer the run used. Partial restore skips everything but
    the params subtree. Returns the params pytree, or None if no
    checkpoint exists."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            return None
        restored = mgr.restore(
            step,
            args=ocp.args.PyTreeRestore(
                item={"params": jax.device_get(params_template)},
                partial_restore=True,
            ),
        )
        return restored["params"]


def save_code_snapshot(output_dir: str) -> str:
    """Snapshot the pesto_tpu package source into the run dir (the
    reference copies its whole source tree into each save dir for
    version pinning, model/save/*/src)."""
    import zipfile

    import pesto_tpu

    pkg_dir = os.path.dirname(os.path.abspath(pesto_tpu.__file__))
    os.makedirs(output_dir, exist_ok=True)
    out = os.path.join(output_dir, "code_snapshot.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith((".py", ".cpp", ".md")):
                    p = os.path.join(root, fn)
                    zf.write(p, os.path.relpath(p, os.path.dirname(pkg_dir)))
    return out


def save_config_snapshot(output_dir: str, **configs):
    """Reference runs snapshot their config into the run dir
    (model/save/*/config.py); we store JSON."""
    os.makedirs(output_dir, exist_ok=True)

    def _default(o):
        if hasattr(o, "__dataclass_fields__"):
            import dataclasses

            return dataclasses.asdict(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        return str(o)

    with open(os.path.join(output_dir, "run_config.json"), "w") as f:
        json.dump(configs, f, indent=2, default=_default)
