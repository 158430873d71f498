"""Host-load capture for benchmark artifacts.

Round-11 verdict item #1: BENCH_r*.json captured `cpus` but not host load,
so round-over-round comparisons on this shared box were unfalsifiable — a
+15% swing could be co-tenant contention or a plan regression and nothing
in the artifact could tell them apart. This module snapshots:

- ``/proc/loadavg`` (1/5/15-min averages + runnable/total threads): the
  load average is KERNEL-WIDE on a shared host, so it sees co-tenant work
  even when that work is outside our PID namespace.
- A count of busy (state R or D) processes VISIBLE in our namespace,
  excluding this process and its descendants (the Spark JVM etc.).

The pair is the attribution tool: high loadavg with ~zero visible busy
co-tenant processes proves the contention is co-tenant (outside the
namespace), not ours. Capture is best-effort — on a non-Linux host every
field degrades to None rather than failing the bench.
"""

from __future__ import annotations

import os


def _visible_busy_procs() -> int | None:
    """Count R/D-state processes in our namespace, excluding this process
    and its descendants (one pass over /proc building the ppid map)."""
    try:
        pids: list[int] = []
        ppid: dict[int, int] = {}
        state: dict[int, str] = {}
        for entry in os.listdir("/proc"):
            if not entry.isdigit():
                continue
            pid = int(entry)
            try:
                with open(f"/proc/{pid}/stat", "rb") as fh:
                    raw = fh.read().decode("ascii", "replace")
            except OSError:
                continue  # raced with process exit
            # fields after the last ')' are unambiguous even if comm has
            # spaces/parens: " STATE PPID ..."
            rest = raw.rsplit(")", 1)[-1].split()
            if len(rest) < 2:
                continue
            pids.append(pid)
            state[pid] = rest[0]
            ppid[pid] = int(rest[1])
        me = os.getpid()

        def is_ours(pid: int, _depth: int = 0) -> bool:
            while pid > 1 and _depth < 64:
                if pid == me:
                    return True
                pid = ppid.get(pid, 0)
                _depth += 1
            return False

        return sum(
            1 for p in pids if state.get(p) in ("R", "D") and not is_ours(p)
        )
    except OSError:
        return None


def host_load() -> dict:
    """One snapshot of host load, shaped for direct JSON embedding."""
    out: dict = {
        "load1": None,
        "load5": None,
        "load15": None,
        "runnable": None,
        "threads": None,
        "visible_busy_procs": None,
    }
    try:
        with open("/proc/loadavg") as fh:
            parts = fh.read().split()
        out["load1"], out["load5"], out["load15"] = (
            float(parts[0]),
            float(parts[1]),
            float(parts[2]),
        )
        run, tot = parts[3].split("/")
        out["runnable"], out["threads"] = int(run), int(tot)
    except (OSError, ValueError, IndexError):
        pass
    out["visible_busy_procs"] = _visible_busy_procs()
    return out


def cpu_probe(reps: int = 7) -> dict:
    """Absolute machine-speed calibration for bench artifacts.

    Round-13 finding: in-container loadavg can read ~0 while the
    headline runs ~30% slow — proven by re-running the PRIOR round's
    exact tree under the same window and watching its headline inflate
    identically. Probing separated the cause: single-core interpreter
    speed was IDENTICAL across windows while multithreaded-BLAS wall
    swung 27x minutes apart — i.e. hypervisor co-tenants steal PARALLEL
    capacity (what a 32-thread Spark stage needs), not clock. The two
    numbers attribute exactly that split:

    - ``python_ms``: best-of-``reps`` for a fixed pure-Python loop —
      single-core dispatch rate (frequency / steal on one core).
      Stable python_ms + inflated headline ⇒ parallel-capacity theft.
    - ``matmul_ms`` / ``matmul_max_ms``: best/worst-of-``reps`` for a
      fixed 384x384 float64 matmul (numpy BLAS, multithreaded) —
      effective multi-core throughput; a wide min..max spread within
      one probe IS the co-tenant burstiness, recorded in-artifact.

    Deterministic inputs (arange, not random) so the work is
    bit-identical every round.
    """
    import time

    out: dict = {"matmul_ms": None, "matmul_max_ms": None, "python_ms": None}
    try:
        import numpy as np

        n = 384
        a = (np.arange(n * n, dtype=np.float64) % 97).reshape(n, n) / 97.0
        b = (np.arange(n * n, dtype=np.float64) % 89).reshape(n, n) / 89.0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            (a @ b).sum()
            ts.append(time.perf_counter() - t0)
        out["matmul_ms"] = round(min(ts) * 1000, 3)
        out["matmul_max_ms"] = round(max(ts) * 1000, 3)
    except Exception:
        pass
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s = 0
        for i in range(200_000):
            s += i ^ (i >> 3)
        best = min(best, time.perf_counter() - t0)
    out["python_ms"] = round(best * 1000, 3)
    return out
