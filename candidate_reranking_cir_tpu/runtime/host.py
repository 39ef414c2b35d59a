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
