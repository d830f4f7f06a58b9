"""Device-health probing for the tunneled TPU runtime.

A killed TPU-holding process can leave a stale relay claim that makes
backend init hang in EVERY later process (measured round 3: >3.5 h).
The probe runs in a killable subprocess so the hang never propagates to
the caller; callers retry until the claim times out or their budget
runs out. Shared by bench.py, __graft_entry__.py and the experiment
scripts — keep the probe logic in exactly one place.
"""

import subprocess
import sys
import time


def wait_for_device(max_wait_s: float = 600, probe_timeout_s: float = 60,
                    log=None, sleep_s: float = 60) -> bool:
    """Block until a trivial jax computation succeeds in a subprocess.
    Returns True when the device answered, False when the budget ran out
    (callers decide whether to proceed anyway). No-op (~5 s) when the
    device is healthy."""
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; print(float(jnp.ones(3).sum()))"],
                timeout=probe_timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                if attempt > 1 and log:
                    log(f"device recovered after {time.time()-t0:.0f}s")
                return True
        except subprocess.TimeoutExpired:
            pass
        waited = time.time() - t0
        if waited > max_wait_s:
            if log:
                log(f"device unavailable after {waited:.0f}s")
            return False
        if log:
            log(f"device probe {attempt} failed (tunnel wedged?); retrying...")
        time.sleep(sleep_s)
