"""Tests for the harness layer: Simulation driver, sharded checkpoint I/O,
correctness comparison utilities (reference analogs: Simulation/run!,
src/sharded_io.jl, src/correctness.jl)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.models import (
    baroclinic_instability_config,
    baroclinic_instability_state,
)
from gb25_tpu.simulation import Simulation, IterationInterval, TimeInterval
from gb25_tpu.io import save_sharded_state, load_global_field, load_metadata, restore_state
from gb25_tpu.utils import compare_states, sync_states


@pytest.fixture(scope="module")
def setup():
    grid = simple_latitude_longitude_grid(16, 8, 4, dtype=jnp.float64)
    cfg = baroclinic_instability_config()
    state = baroclinic_instability_state(grid)
    return cfg, grid, state


def test_simulation_stop_iteration(setup):
    cfg, grid, state = setup
    sim = Simulation(cfg, grid, state, dt=60.0, stop_iteration=10, inner_steps=4)
    fired = []
    sim.add_callback(lambda s: fired.append(s.iteration), IterationInterval(5))
    sim.run()
    assert sim.iteration == 10
    assert sim.time == 600.0
    assert fired == [5, 10]


def test_simulation_stop_time(setup):
    cfg, grid, state = setup
    sim = Simulation(cfg, grid, state, dt=60.0, stop_time=300.0, inner_steps=16)
    sim.run()
    assert sim.iteration == 5
    assert abs(sim.time - 300.0) < 1e-9


def test_time_interval_exact_alignment(setup):
    """TimeInterval callbacks fire exactly ON multiples of the interval:
    the driver shrinks chunks to land on schedule boundaries (reference
    aligns its schedules the same way,
    ocean_climate_simulation.jl:90-134) — not merely 'after each chunk'."""
    cfg, grid, state = setup
    # dt=60, interval=300 (5 steps), inner_steps=7: 7 does NOT divide 5,
    # so without alignment the fire times would drift off the boundary
    sim = Simulation(cfg, grid, state, dt=60.0, stop_time=1500.0, inner_steps=7)
    fired = []
    sim.add_callback(lambda s: fired.append(s.time), TimeInterval(300.0))
    sim.run()
    assert fired == [300.0, 600.0, 900.0, 1200.0, 1500.0]


def test_time_interval_writer_alignment(setup, tmp_path):
    """Output-writer intervals also align chunk boundaries: writes land on
    exact multiples of interval_seconds."""
    from gb25_tpu.io.output import NPZOutputWriter

    cfg, grid, state = setup
    sim = Simulation(cfg, grid, state, dt=60.0, stop_time=720.0, inner_steps=5)
    w = NPZOutputWriter(str(tmp_path / "out"), interval_seconds=240.0)
    sim.add_output_writer(w)
    sim.run()
    import glob
    import numpy as np_

    files = sorted(glob.glob(str(tmp_path / "out" / "*.npz")))
    times = [float(np_.load(f)["time"]) for f in files]
    # first write fires at t=0 (writer semantics: no previous write), then
    # every 240 s exactly
    assert times[0] == 0.0 or times[0] == 240.0
    for t in times:
        assert abs(t % 240.0) < 1e-6 or abs(t % 240.0 - 240.0) < 1e-6


def test_checkpoint_roundtrip_single_device(setup, tmp_path):
    cfg, grid, state = setup
    d = str(tmp_path / "ckpt")
    save_sharded_state(state, d)
    u = load_global_field(d, "u")
    np.testing.assert_array_equal(u, np.asarray(state.u))
    T = load_global_field(d, "tracers/T")
    np.testing.assert_array_equal(T, np.asarray(state.tracers["T"]))
    meta = load_metadata(d)
    assert meta["iteration"] == 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_checkpoint_roundtrip_sharded(setup, tmp_path):
    from gb25_tpu.parallel import make_mesh, shard_state

    cfg, grid, state = setup
    mesh = make_mesh(8, shape=(4, 2))
    sh = shard_state(state, mesh)
    d = str(tmp_path / "ckpt_sh")
    save_sharded_state(sh, d)
    # reassembled global field matches, with per-device shards stored separately
    u = load_global_field(d, "u")
    np.testing.assert_array_equal(u, np.asarray(jax.device_get(sh.u)))
    # restore onto the sharded template
    restored = restore_state(sh, d)
    np.testing.assert_array_equal(np.asarray(restored.v), np.asarray(sh.v))
    assert restored.u.sharding == sh.u.sharding


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_checkpoint_restart_cross_topology(setup, tmp_path):
    """Resubmit-after-failure scenario (VERDICT r4 item 8): a checkpoint
    written on one mesh topology restores bit-identically onto a DIFFERENT
    topology and onto a single device — per-rank shard files carry global
    index ranges, so reassembly is topology-free (reference restart =
    resubmit + per-rank reload, sharded_io.jl:146-213)."""
    from gb25_tpu.parallel import make_mesh, shard_state

    cfg, grid, state = setup
    # make the state non-trivial so equality is meaningful
    state = state.replace(u=state.u + np.random.default_rng(0).standard_normal(
        state.u.shape).astype(state.u.dtype))
    d = str(tmp_path / "ckpt_x")
    save_sharded_state(shard_state(state, make_mesh(8, shape=(4, 2))), d)

    # restore onto the transposed 2x4 topology
    sh24 = shard_state(state.replace(u=state.u * 0), make_mesh(8, shape=(2, 4)))
    r24 = restore_state(sh24, d)
    np.testing.assert_array_equal(np.asarray(jax.device_get(r24.u)),
                                  np.asarray(state.u))
    np.testing.assert_array_equal(np.asarray(jax.device_get(r24.tracers["T"])),
                                  np.asarray(state.tracers["T"]))
    assert r24.u.sharding == sh24.u.sharding

    # restore onto a single device (serial resubmit)
    r1 = restore_state(state.replace(u=state.u * 0), d)
    np.testing.assert_array_equal(np.asarray(r1.u), np.asarray(state.u))
    np.testing.assert_array_equal(np.asarray(r1.v), np.asarray(state.v))


def test_compare_states_pass_and_fail(setup):
    cfg, grid, state = setup
    compare_states(state, state, verbose=False)  # identical: no raise
    bad = state.replace(u=state.u + 1e-3)
    with pytest.raises(AssertionError):
        compare_states(state, bad, verbose=False)


def test_sync_states(setup):
    cfg, grid, state = setup
    other = state.replace(u=state.u * 0)
    synced = sync_states(state, other)
    np.testing.assert_array_equal(np.asarray(synced.u), np.asarray(state.u))


def test_args_parser():
    from gb25_tpu.utils.args import benchmark_parser, resolve_grid_size, float_type

    p = benchmark_parser()
    a = p.parse_args(["--resolution", "2", "--Nz", "10", "--float-type", "f32"])
    assert resolve_grid_size(a) == (192, 96, 10)
    assert float_type(a.float_type) == jnp.float32
    a2 = p.parse_args(["--grid-x", "64", "--grid-y", "32", "--grid-z", "8"])
    assert resolve_grid_size(a2) == (64, 32, 8)


def test_output_writer(setup, tmp_path):
    from gb25_tpu.io import NPZOutputWriter, read_series

    cfg, grid, state = setup
    sim = Simulation(cfg, grid, state, dt=60.0, stop_iteration=12, inner_steps=4)
    sim.add_output_writer(NPZOutputWriter(str(tmp_path / "out"), interval_seconds=240.0))
    sim.run()
    times, eta = read_series(str(tmp_path / "out"), "eta")
    assert len(times) >= 3
    assert eta.shape[1:] == (16, 8)
    t2, T = read_series(str(tmp_path / "out"), "T_surface")
    assert T.shape[1:] == (16, 8)


def test_checkpoint_writer(setup, tmp_path):
    from gb25_tpu.simulation.simulation import CheckpointWriter
    from gb25_tpu.io import load_metadata

    cfg, grid, state = setup
    sim = Simulation(cfg, grid, state, dt=60.0, stop_iteration=12, inner_steps=4)
    w = CheckpointWriter(str(tmp_path / "ck"), interval_seconds=240.0, keep=2)
    sim.add_output_writer(w)
    sim.run()
    import glob

    dirs = sorted(glob.glob(str(tmp_path / "ck" / "ckpt_iter*")))
    assert 1 <= len(dirs) <= 2  # pruned to keep=2
    meta = load_metadata(dirs[-1])
    assert meta["iteration"] == 12


def test_preamble_honors_platform_pin(monkeypatch):
    """preamble() must (a) re-assert an explicit JAX_PLATFORMS pin through
    jax.config (site boot hooks override the env var via config updates,
    which beat env), and (b) not inject TPU-only XLA flags under a non-TPU
    pin (they are fatal to the CPU backend's flag parser)."""
    import jax

    from gb25_tpu.utils.env import preamble

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    preamble()
    assert jax.config.jax_platforms == "cpu"
    assert "xla_tpu" not in os.environ["XLA_FLAGS"]

    # TPU-targeted env (local chip evidence) keeps the hang-detection flag
    # injection; libtpu-the-package alone is not evidence (tunneled hosts)
    monkeypatch.setenv("JAX_PLATFORMS", "")
    monkeypatch.setenv("XLA_FLAGS", "")
    monkeypatch.setenv("TPU_NAME", "local-v5p")
    preamble()
    assert "--xla_tpu_enable_latency_hiding_scheduler=true" in os.environ["XLA_FLAGS"]
    # an axon (tunneled) pin must NOT inject: the client-side XLA parses
    # XLA_FLAGS and aborts on unknown TPU flags
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("XLA_FLAGS", "")
    monkeypatch.delenv("TPU_NAME")
    preamble()
    assert "xla_tpu" not in os.environ["XLA_FLAGS"]
    # restore the pin for the rest of the suite (conftest set it)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    jax.config.update("jax_platforms", "cpu")


def test_netcdf_output_writer(setup, tmp_path):
    """CF-interoperable surface output: one classic NetCDF with an unlimited
    time axis, read back through the repo's own reader (which routes classic
    files through scipy — an independent decoder, so this is a true
    format-conformance round trip)."""
    from gb25_tpu.data.netcdf import read_netcdf
    from gb25_tpu.io.output import NetCDFOutputWriter

    cfg, grid, state = setup
    path = str(tmp_path / "surf.nc")
    sim = Simulation(cfg, grid, state, dt=60.0, stop_iteration=12, inner_steps=4)
    w = NetCDFOutputWriter(path, grid, interval_seconds=240.0)
    sim.add_output_writer(w)
    sim.run()
    w.close()

    v, dims, attrs = read_netcdf(path)
    assert dims["eta"] == ("time", "x", "y")
    assert v["eta"].shape[1:] == (16, 8)
    assert v["eta"].shape[0] >= 3
    assert v["time"].shape == v["iteration"].shape
    assert np.all(np.diff(v["time"]) > 0)
    assert np.isfinite(v["T_surface"]).all()
    assert v["lon"].shape == (16,) and v["lat"].shape == (8,)
    assert attrs["lat"]["units"] == "degrees_north"


def test_netcdf_writer_tripolar_coords(tmp_path):
    """Curvilinear grids store 2-D lon/lat coordinate fields."""
    from gb25_tpu.data.netcdf import read_netcdf
    from gb25_tpu.grids.tripolar import tripolar_grid
    from gb25_tpu.io.output import NetCDFOutputWriter

    grid = tripolar_grid(16, 8, 4, dtype=jnp.float64)

    class _Sim:
        pass

    from gb25_tpu.models import baroclinic_instability_state

    s = baroclinic_instability_state(grid)
    sim = _Sim(); sim.state = s; sim.time = 0.0; sim.iteration = 0
    path = str(tmp_path / "tri.nc")
    w = NetCDFOutputWriter(path, grid, interval_seconds=1.0)
    w.maybe_write(sim)
    w.close()
    v, dims, _ = read_netcdf(path)
    assert v["lon"].shape == (16, 8) and v["lat"].shape == (16, 8)
    assert dims["lon"] == ("x", "y")
    assert v["eta"].shape == (1, 16, 8)


def test_time_interval_writer_alignment_small_chunks(setup, tmp_path):
    """Writes must land ON interval multiples even when inner_steps*dt is
    much shorter than the interval (the first chunk ends mid-interval; the
    old last-write-time semantics then drifted EVERY later write off the
    boundaries permanently)."""
    from gb25_tpu.io.output import NPZOutputWriter

    cfg, grid, state = setup
    sim = Simulation(cfg, grid, state, dt=60.0, stop_time=720.0, inner_steps=2)
    w = NPZOutputWriter(str(tmp_path / "out"), interval_seconds=240.0)
    sim.add_output_writer(w)
    sim.run()
    import glob
    import numpy as np_

    files = sorted(glob.glob(str(tmp_path / "out" / "*.npz")))
    times = [float(np_.load(f)["time"]) for f in files]
    assert times == [0.0, 240.0, 480.0, 720.0]


def test_simulation_comm_is_wired(setup, monkeypatch):
    """Simulation(comm=...) must forward the comm to the loop — previously
    it was stored and silently ignored (default jit(_loop) ran comm=None)."""
    import gb25_tpu.simulation.simulation as simmod

    cfg, grid, state = setup
    seen = {}

    def fake_loop(cfg_, grid_, state_, dt_, n, comm=None):
        seen["comm"] = comm
        return state_

    monkeypatch.setattr(simmod, "_loop", fake_loop)
    sentinel = object()
    sim = simmod.Simulation(cfg, grid, state, dt=60.0, stop_iteration=4,
                            inner_steps=2, comm=sentinel)
    # bypass jit wrapping complexity: call the built step_fn directly
    sim._step_fn(cfg, grid, state, 60.0, 2)
    assert seen["comm"] is sentinel
