"""Per-stage timing instrumentation and device profiling hooks.

TPU-native replacement for the reference's REGISTER_TIMES machinery
(/root/reference/include/Tracking.h:172-180, Tracking.cc:209-257
PrintTimeStats/TrackStats2File dumping ExecTimeMean.txt; LocalMapping.cc:
102-292 and LoopClosing.cc:108-277 per-stage vectors): the same named stage
taxonomy, collected by a context manager instead of compile-time #ifdefs.

Two additions the reference can't have:
  * `sync=True` calls jax.block_until_ready around the stage so wall time is
    device compute, not async dispatch latency (JAX dispatch returns
    immediately; un-synced timings measure the host only);
  * `device_trace()` wraps jax.profiler for a full XLA trace viewable in
    TensorBoard/Perfetto.

Disabled timers are no-ops with ~100 ns overhead.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional

# Reference stage-name taxonomy (Tracking.h:172-180, LocalMapping/LoopClosing)
TRACKING_STAGES = ("ORBExtract", "StereoMatch", "IMUInteg", "PosePred",
                   "LMTrack", "NewKF", "TrackTotal")
MAPPING_STAGES = ("KFInsert", "MPCulling", "MPCreation", "LBA", "KFCulling",
                  "LMTotal")
LOOP_STAGES = ("PRTotal", "MergeTotal", "LoopTotal", "GBATotal")


class _StageResult:
    """Mutable holder: the stage body deposits its output pytree here so
    sync mode can block on the stage's REAL outputs (not its inputs)."""
    __slots__ = ("result",)

    def __init__(self, result=None):
        self.result = result

    def set(self, result):
        self.result = result


class StageTimers:
    """Named wall-clock stage timers (reference vd*_ms vectors)."""

    def __init__(self, enabled: bool = False, sync: bool = False):
        self.enabled = enabled
        self.sync = sync
        self.samples = defaultdict(list)      # name -> [ms, ...]

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        """Time a stage. Yields a holder; call `.set(out)` with the stage's
        output pytree so sync mode blocks on real device compute."""
        holder = _StageResult(result)
        if not self.enabled:
            yield holder
            return
        t0 = time.perf_counter()
        try:
            yield holder
        finally:
            if self.sync and holder.result is not None:
                import jax
                try:
                    jax.block_until_ready(holder.result)
                except Exception:
                    pass
            self.samples[name].append((time.perf_counter() - t0) * 1e3)

    def add_ms(self, name: str, ms: float):
        if self.enabled:
            self.samples[name].append(ms)

    # -- reporting (reference Tracking::PrintTimeStats, Tracking.cc:257) ---

    def stats(self):
        """{stage: (n, mean_ms, std_ms, min_ms, max_ms)}."""
        import math
        out = {}
        for name, v in self.samples.items():
            n = len(v)
            mean = sum(v) / n
            var = sum((x - mean) ** 2 for x in v) / n if n > 1 else 0.0
            out[name] = (n, mean, math.sqrt(var), min(v), max(v))
        return out

    def report(self) -> str:
        lines = [f"{'stage':<14}{'n':>6}{'mean ms':>10}{'std':>8}"
                 f"{'min':>8}{'max':>9}"]
        for name, (n, mean, std, lo, hi) in sorted(self.stats().items()):
            lines.append(f"{name:<14}{n:>6}{mean:>10.3f}{std:>8.3f}"
                         f"{lo:>8.3f}{hi:>9.3f}")
        return "\n".join(lines)

    def save(self, path: str):
        """Dump mean times (reference ExecTimeMean.txt)."""
        with open(path, "w") as f:
            for name, (n, mean, _, _, _) in sorted(self.stats().items()):
                f.write(f"{name} {mean:.6f}\n")

    def reset(self):
        self.samples.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """Full XLA device trace (TensorBoard 'profile' plugin / Perfetto).
    TPU-side upgrade of REGISTER_TIMES: shows per-op device occupancy."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


_global: Optional[StageTimers] = None


def global_timers() -> StageTimers:
    """Process-wide timer registry (lazily created, disabled by default;
    enable with MORB_REGISTER_TIMES=1 in the environment, mirroring the
    reference's compile flag)."""
    global _global
    if _global is None:
        import os
        val = os.environ.get("MORB_REGISTER_TIMES", "0")
        on = val not in ("0", "")
        # sync is OPT-IN (MORB_REGISTER_TIMES=sync): plain "1" measures
        # async dispatch latency only, as documented
        _global = StageTimers(enabled=on, sync=val == "sync")
    return _global
