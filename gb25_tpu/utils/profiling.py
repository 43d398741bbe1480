"""Profiling integration (XSpace traces + annotations).

Reference behavior reimplemented: ``Reactant.with_profiler(dir)`` +
``Reactant.Profiler.annotate(name; metadata)`` producing XSpace
``.xplane.pb`` traces (/root/reference/sharding/sharded_baroclinic_instability_simulation_run.jl:135-148,
src/timestepping_utils.jl:22-38). ``jax.profiler`` emits the *same* XSpace
protobuf format, so the reference's offline analysis tooling
(analysis/xspace) applies unchanged.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def with_profiler(directory: str | None):
    """Trace everything inside the block to an XSpace trace in ``directory``."""
    if directory is None:
        yield
        return
    with jax.profiler.trace(directory):
        yield


def annotate(name: str, **metadata):
    """Span annotation visible in the trace viewer (reference:
    Profiler.annotate)."""
    label = name
    if metadata:
        label += "#" + ",".join(f"{k}={v}" for k, v in metadata.items()) + "#"
    return jax.profiler.TraceAnnotation(label)


@contextlib.contextmanager
def gbprofile(name: str, enabled: bool = True, directory: str = "."):
    """Host-side Python profiling of a phase (reference: the @gbprofile macro
    wrapping Profile.@profile and dumping profile_<name>.txt,
    model_utils.jl:24-43). Wraps cProfile and writes profile_<name>.txt."""
    if not enabled:
        yield
        return
    import cProfile
    import os
    import pstats

    prof = cProfile.Profile()
    prof.enable()
    try:
        yield
    finally:
        prof.disable()
        path = os.path.join(directory, f"profile_{name}.txt")
        with open(path, "w") as f:
            stats = pstats.Stats(prof, stream=f)
            stats.sort_stats("cumulative").print_stats(60)


class Timer:
    """Minimal phase timer mirroring the reference's `@time "[rank] label"`
    benchmark log format, scraped by its weak-scaling tooling
    (analysis/weak-scaling/pm-ablation.jl:8)."""

    def __init__(self, rank: int = 0):
        self.rank = rank

    @contextlib.contextmanager
    def __call__(self, label: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        print(f"[{self.rank}] {label}: {dt:.6f} seconds", flush=True)


def force_virtual_cpu_devices(n: int):
    """Re-initialize JAX on the CPU backend with ``n`` virtual devices (the
    reference CI's --xla_force_host_platform_device_count trick; robust
    against environments whose plugins preset jax_platforms)."""
    if len(jax.devices()) >= n and jax.devices()[0].platform == "cpu":
        return
    import jax.extend.backend as jeb

    jeb.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)


def allocator_stats() -> dict:
    """Device memory telemetry (reference: XLA.allocatorstats,
    sharding_utils.jl:64-72)."""
    stats = {}
    for d in jax.local_devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
