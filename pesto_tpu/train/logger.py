"""Dual-sink logger: human-readable .log + machine-readable .dat
JSON-lines, format-compatible with the reference (src/logger.py:8-70) so
training can resume from either implementation's logs."""

import json
import os
import time
from datetime import datetime


class Logger:
    def __init__(self, output_dir: str, name: str):
        os.makedirs(output_dir, exist_ok=True)
        self.log_filepath = os.path.join(output_dir, f"{name}.log")
        self.log_lst_filepath = os.path.join(output_dir, f"{name}.dat")
        self.t_start = time.time()

    def restart_timer(self):
        self.t_start = time.time()

    def print(self, msg):
        line = f"[{datetime.now().strftime('%Y-%m-%d %H:%M:%S')}] {msg}"
        print(line, flush=True)
        with open(self.log_filepath, "a") as f:
            f.write(line + "\n")

    def store(self, **stats):
        def _coerce(v):
            if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
                return v.item()
            if hasattr(v, "tolist"):
                return v.tolist()
            return v

        with open(self.log_lst_filepath, "a") as f:
            f.write(json.dumps({k: _coerce(v) for k, v in stats.items()}) + "\n")

    def last_entry(self):
        """Last PARSEABLE entry: a crash mid-write leaves a torn final
        line, which is exactly the situation resume-from-logs cares
        about — skip back instead of raising."""
        if not os.path.isfile(self.log_lst_filepath):
            return None
        entries = []
        with open(self.log_lst_filepath) as f:
            for line in f:
                if line.strip():
                    entries.append(line)
        for line in reversed(entries):
            try:
                return json.loads(line)
            except ValueError:
                continue
        return None

    def print_profiling_info(self, done: int, total: int):
        elapsed = time.time() - self.t_start
        rate = done / max(elapsed, 1e-9)
        eta = (total - done) / max(rate, 1e-9)
        self.print(f"progress {done}/{total} ({rate:.2f} it/s, eta {eta/60:.1f} min)")
