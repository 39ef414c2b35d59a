"""Host-process hygiene.

The reference clamps BLAS/OpenMP thread pools at the top of every entry
script (stage1_train.py:6-11 and identical headers) so numpy doesn't oversubscribe
the host while the accelerator works. Same knob here, callable from CLIs.
"""
from __future__ import annotations

import os

_THREAD_VARS = ("OPENBLAS_NUM_THREADS", "GOTO_NUM_THREADS", "MKL_NUM_THREADS",
                "NUMEXPR_NUM_THREADS", "OMP_NUM_THREADS")


def limit_numpy_threads(n: int = 8) -> None:
    for var in _THREAD_VARS:
        os.environ.setdefault(var, str(n))


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a host directory.

    On a remote-attached TPU every fresh XLA/Mosaic compile pays the relay's
    remote-compile round trip (measured: ~1.5-2 s warm, minutes cold on this
    rig); the persistent cache makes every repeat invocation of a CLI, bench
    or test reuse the serialized executable instead. Verified to work through
    the axon remote backend (entries land on the host; second process start
    skips remote_compile). Opt-out with CRC_NO_COMPILE_CACHE=1; override the
    location with CRC_COMPILE_CACHE_DIR or the argument. Called by every CLI
    next to limit_numpy_threads(). Returns the directory used, or None when
    disabled/unavailable.
    """
    if os.environ.get("CRC_NO_COMPILE_CACHE", "") == "1":
        return None
    cache_dir = (cache_dir or os.environ.get("CRC_COMPILE_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "candidate_reranking_cir_tpu", "xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        changed = jax.config.jax_compilation_cache_dir != cache_dir
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every executable: the relay round trip dominates even tiny
        # compiles, so the usual size/compile-time thresholds are wrong here
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        if changed:
            # the cache backend is a lazily-created singleton: a dir change
            # after the first compile is silently ignored without a reset
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
    except Exception:
        return None  # unwritable dir or an older jax: run uncached
    return cache_dir


class GracefulShutdown:
    """Preemption handling for trainers: SIGTERM/SIGINT set a flag instead of
    killing the process, so the train loop finishes its current step, saves a
    resumable checkpoint (including the count of batches already applied in
    the interrupted epoch), and exits cleanly. TPU pods are routinely
    preempted; the reference has no recovery path (SURVEY.md section 5) —
    here `--resume` restores the full train state and skips the
    already-applied batches, so a preempted run loses nothing: no batch is
    double-applied and the step-indexed LR schedule stays exact.

    Usage:
        stop = GracefulShutdown()
        for batch in loader:
            ...
            if stop.requested:
                save_checkpoint(...); break
    """

    def __init__(self, signals=None):
        import signal as _signal

        self.requested = False
        self.signal_name = None
        self._prev = {}
        sigs = signals if signals is not None else (_signal.SIGTERM,
                                                    _signal.SIGINT)
        for sig in sigs:
            try:
                self._prev[sig] = _signal.signal(sig, self._handler)
            except (ValueError, OSError):
                pass  # non-main thread or unsupported signal: stay inert

    def _handler(self, signum, frame):
        import signal as _signal

        self.requested = True
        self.signal_name = _signal.Signals(signum).name
        print(f"[{self.signal_name}] finishing current step, then saving a "
              "resumable checkpoint...", flush=True)

    def restore(self):
        import signal as _signal

        for sig, prev in self._prev.items():
            try:
                _signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
