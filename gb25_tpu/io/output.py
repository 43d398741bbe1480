"""Output writers (reference: JLD2OutputWriter writing surface slices on a
TimeInterval schedule, simulations/ocean_climate_simulation.jl:128-134).

NPZ-based writer: each firing appends one record file
``<prefix>_iter<It>.npz`` containing the requested diagnostics plus
iteration/time; ``read_series`` reassembles the time series."""

from __future__ import annotations

import glob
import os

import jax
import numpy as np


def surface_slice(field):
    return field[..., -1] if field.ndim == 3 else field


STANDARD_OUTPUTS = {
    "u_surface": lambda s: surface_slice(s.u),
    "v_surface": lambda s: surface_slice(s.v),
    "T_surface": lambda s: surface_slice(s.tracers["T"]),
    "S_surface": lambda s: surface_slice(s.tracers["S"]),
    "eta": lambda s: s.eta,
}


class NPZOutputWriter:
    """Writes selected diagnostics every ``interval_seconds`` of model time."""

    def __init__(self, directory, outputs=None, interval_seconds=86400.0, prefix="out"):
        self.directory = directory
        self.outputs = outputs or STANDARD_OUTPUTS
        self.interval = interval_seconds
        self.prefix = prefix
        self._last_write_time = None
        os.makedirs(directory, exist_ok=True)

    def maybe_write(self, sim):
        t = sim.time
        if self._last_write_time is not None and t - self._last_write_time < self.interval - 1e-9:
            return
        self._last_write_time = t
        arrays = {k: np.asarray(jax.device_get(fn(sim.state))) for k, fn in self.outputs.items()}
        arrays["time"] = np.float64(t)
        arrays["iteration"] = np.int64(sim.iteration)
        path = os.path.join(self.directory, f"{self.prefix}_iter{sim.iteration:09d}.npz")
        np.savez(path, **arrays)


def read_series(directory, name, prefix="out"):
    """Load one diagnostic across all records: returns (times, stacked array)."""
    files = sorted(glob.glob(os.path.join(directory, f"{prefix}_iter*.npz")))
    times, vals = [], []
    for f in files:
        with np.load(f) as d:
            times.append(float(d["time"]))
            vals.append(d[name])
    return np.asarray(times), np.stack(vals) if vals else np.empty((0,))
