"""Runtime/bootstrap helpers."""

from __future__ import annotations

import os
import signal

import jax


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 5.0) -> None:
    """Persistent XLA compilation cache — the big pipeline graphs take
    minutes to compile; cache them across CLI invocations."""
    path = path or os.path.expanduser("~/.cache/vspbfr_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass  # older jax without the flags


class GracefulShutdown:
    """Preemption-safe stop flag: SIGTERM/SIGINT -> finish the current
    step, write a final checkpoint, exit 0 — so a preempted TPU-pod run
    loses at most one step instead of up-to-save_inter steps. Cluster
    schedulers (GKE preemption, SLURM scancel, Borg) deliver the signal to
    every host, so the collective final save is rank-aligned.

    A second signal restores the previous handler and re-raises it (a
    stuck save can still be killed interactively). The reference has no
    counterpart — torch.save only ever runs on the 500-iter cadence
    (`restoration_train.py:291-305`)."""

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.requested = False
        self._prev = {}
        for s in signals:
            try:
                self._prev[s] = signal.signal(s, self._handler)
            except ValueError:
                pass  # not the main thread (e.g. tests) — stay inert

    def _handler(self, signum, frame):
        if self.requested:  # second signal: defer to the previous handler
            prev = self._prev.get(signum, signal.SIG_DFL)
            signal.signal(signum, prev)
            signal.raise_signal(signum)
            return
        self.requested = True
        print(f"[shutdown] signal {signum}: finishing step, saving, "
              "exiting", flush=True)
