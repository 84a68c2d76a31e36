"""Stage timing + compilation observability.

The reference's only tracing was wall-clock prints around init/solve
("Initialization took / Optimization took",
src/all_optimizations.py:519,524). This module keeps that parity and
adds what a compiled-runtime framework actually needs: a stage timer
that accumulates a structured report, a jit-recompilation counter
(recompiles are the TPU analogue of a perf regression), and an optional
`jax.profiler` trace context for deep dives.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class StageTimer:
    records: List[Dict] = field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, name: str, verbose: bool = True):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.records.append(dict(stage=name, seconds=dt))
        if verbose:
            print(f"{name} took {dt:.2f} seconds")

    def report(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for r in self.records:
            out[r["stage"]] = out.get(r["stage"], 0.0) + r["seconds"]
        return out


def compile_count() -> int:
    """Total jit compilations so far in this process (cache misses)."""
    import jax

    try:
        return int(jax.monitoring._counter_values.get("/jax/pjit/compile", 0))  # type: ignore[attr-defined]
    except Exception:
        pass
    try:
        from jax._src import compilation_cache  # noqa: F401
        from jax._src.interpreters import pxla

        return int(getattr(pxla, "_cached_compilation_count", 0))
    except Exception:
        return -1


class RecompileGuard:
    """Assert a code region does not trigger fresh jit compilations.

    Usage:
        with RecompileGuard():
            step(batch)   # must hit the compile cache
    """

    def __init__(self, allowed: int = 0):
        self.allowed = allowed

    def __enter__(self):
        self.before = compile_count()
        return self

    def __exit__(self, *exc):
        after = compile_count()
        if self.before >= 0 and after >= 0 and after - self.before > self.allowed:
            raise AssertionError(
                f"{after - self.before} jit recompilation(s) inside RecompileGuard"
            )
        return False


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
