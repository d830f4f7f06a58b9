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
    """Block until a trivial jax computation succeeds in a subprocess ON
    THE EXPECTED BACKEND. Returns True when the device answered, False
    when the budget ran out (callers decide whether to proceed anyway).
    No-op (~5 s) when the device is healthy.

    The probe reports the platform it actually ran on: when a broken TPU
    plugin fails FAST (e.g. libtpu client/server skew), jax silently
    falls back to CPU and a naive probe would declare the device healthy
    — then a benchmark would print per-chip TPU numbers measured on the
    host. A CPU platform only counts as success when the caller's env
    pinned it (JAX_PLATFORMS=cpu)."""
    import os

    cpu_pinned = os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        r = _run_probe(probe_timeout_s)
        if r is not None and r.returncode == 0:
            platform = r.stdout.split()[-1] if r.stdout.split() else "?"
            if platform == "cpu" and not cpu_pinned:
                if log:
                    log("device probe fell back to CPU (broken device "
                        "plugin?); not counting as healthy")
            else:
                if attempt > 1 and log:
                    log(f"device recovered after {time.time()-t0:.0f}s")
                return True
        waited = time.time() - t0
        if waited > max_wait_s:
            if log:
                log(f"device unavailable after {waited:.0f}s")
            return False
        if log:
            log(f"device probe {attempt} failed (tunnel wedged?); retrying...")
        time.sleep(sleep_s)


def _run_probe(probe_timeout_s):
    """One probe attempt in a subprocess, terminated GENTLY on timeout.

    subprocess.run's timeout path SIGKILLs the child — if the child had
    already claimed the tunnel relay before hanging, the kill renews the
    very stale claim the caller is waiting out (a probe loop can then
    keep the tunnel wedged indefinitely). SIGTERM first lets the axon
    client's atexit/signal handlers release the claim; SIGKILL only
    after a grace period. Returns the CompletedProcess-like handle or
    None on timeout."""
    p = subprocess.Popen(
        [sys.executable, "-c",
         "import jax, jax.numpy as jnp; "
         "print(float(jnp.ones(3).sum()), jax.devices()[0].platform)"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        out, err = p.communicate(timeout=probe_timeout_s)
        return subprocess.CompletedProcess(p.args, p.returncode, out, err)
    except subprocess.TimeoutExpired:
        p.terminate()
        try:
            p.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            p.kill()
            p.communicate()
        return None
