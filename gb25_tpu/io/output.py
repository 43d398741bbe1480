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


def _boundary_crossed(t, interval, last_k):
    """TimeInterval actuation: fire on the first call (initial record) and
    whenever model time crosses a *multiple of the interval* — NOT when
    ``t - last_write >= interval``, which drifts permanently off the aligned
    boundaries once the first write happens mid-interval (e.g. at the end of
    the first inner-steps chunk).  Returns (fire, new_last_k)."""
    k = int(np.floor(t / interval + 1e-9))
    if last_k is None or k > last_k:
        return True, k
    return False, last_k


class NPZOutputWriter:
    """Writes selected diagnostics on every crossing of ``interval_seconds``
    of model time (aligned boundaries: multiples of the interval), plus one
    initial record."""

    def __init__(self, directory, outputs=None, interval_seconds=86400.0, prefix="out"):
        self.directory = directory
        self.outputs = outputs or STANDARD_OUTPUTS
        self.interval = interval_seconds
        self.prefix = prefix
        self._last_k = None
        os.makedirs(directory, exist_ok=True)

    def maybe_write(self, sim):
        t = sim.time
        fire, self._last_k = _boundary_crossed(t, self.interval, self._last_k)
        if not fire:
            return
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


class NetCDFOutputWriter:
    """CF-readable surface-diagnostics writer: one classic NetCDF file with
    an unlimited time dimension, appended in O(1) per firing (reference
    analog: the JLD2 surface writer on a TimeInterval schedule,
    simulations/ocean_climate_simulation.jl:128-134; NetCDF here so any
    standard tool reads the output).

    ``grid`` supplies coordinate variables; 2-D (x, y) diagnostics only
    (the standard surface set).  Same ``maybe_write(sim)`` protocol as
    NPZOutputWriter.
    """

    def __init__(self, path, grid, outputs=None, interval_seconds=86400.0,
                 attrs=None):
        from gb25_tpu.data.netcdf import NetCDF3Writer

        self.outputs = outputs or STANDARD_OUTPUTS
        self.interval = interval_seconds
        self._last_k = None
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

        dims = {"time": None, "x": grid.Nx, "y": grid.Ny}
        w = NetCDF3Writer(path, dims, global_attrs={
            "title": "gb25_tpu surface diagnostics",
            "source": "gb25_tpu", **(attrs or {}),
        })
        w.define("time", ("time",), np.float64,
                 {"units": "seconds since simulation start", "axis": "T"})
        w.define("iteration", ("time",), np.int32, {})
        # curvilinear grids carry 2-D coordinate fields; lat-lon carries 1-D
        phi2 = getattr(grid, "phi2_c", None)
        if phi2 is not None:
            w.define("lon", ("x", "y"), np.float64, {"units": "degrees_east"})
            w.define("lat", ("x", "y"), np.float64, {"units": "degrees_north"})
            w.write("lon", np.asarray(grid.lam2_c))
            w.write("lat", np.asarray(phi2))
        else:
            w.define("lon", ("x",), np.float64, {"units": "degrees_east"})
            w.define("lat", ("y",), np.float64, {"units": "degrees_north"})
            w.write("lon", np.asarray(grid.lam_c_i))
            w.write("lat", np.asarray(grid.phi_c_i))
        for name in self.outputs:
            w.define(name, ("time", "x", "y"), np.float32,
                     {"coordinates": "lon lat"})
        self._w = w

    def maybe_write(self, sim):
        t = sim.time
        fire, self._last_k = _boundary_crossed(t, self.interval, self._last_k)
        if not fire:
            return
        rec = {k: np.asarray(jax.device_get(fn(sim.state)), np.float32)
               for k, fn in self.outputs.items()}
        self._w.append(time=np.float64(t), iteration=np.int32(sim.iteration),
                       **rec)

    def close(self):
        self._w.close()
