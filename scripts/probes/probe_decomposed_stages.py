"""Scratch: time each ingredient of the decomposed (comm != None) step in
isolation on the chip, to itemize the forced-comm overhead
(serial 35.8 vs decomposed-local ~105 ms/step at 1536x768x64, round 4).

Each candidate runs as its own jitted n-iteration fori_loop under a 1x1
shard_map (mirroring the real program's environment) so fixed per-op
latencies are amortized exactly like the real loop.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.models import (
    baroclinic_instability_config,
    baroclinic_instability_state,
)
from gb25_tpu.models.free_surface import barotropic_substep
from gb25_tpu.models.hydrostatic import (
    _window_tendency,
    compute_tendencies,
    coriolis_ff,
)
from gb25_tpu.ops.halos import extend_field
from gb25_tpu.parallel import make_mesh, shard_state
from gb25_tpu.parallel.halo import MeshComm
from gb25_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

NX, NY, NZ = (int(a) for a in (sys.argv[1:4] + ["1536", "768", "64"][len(sys.argv) - 1:]))
N = 32

grid = simple_latitude_longitude_grid(NX, NY, NZ, dtype=jnp.float32)
cfg = baroclinic_instability_config()
state = baroclinic_instability_state(grid)
mesh = make_mesh(1, shape=(1, 1))
state = shard_state(state, mesh)
dt = jnp.float32(60.0)
comm = MeshComm(Rx=1, Ry=1)  # local fills; decomposed structure


def timeit(name, make_body):
    """make_body() -> (carry0, body(carry) -> carry); runs under shard_map."""
    spec = None

    @jax.jit
    def run(st):
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(jax.tree_util.tree_map(
                     lambda x: P("x", "y", None) if getattr(x, "ndim", 0) == 3
                     else (P("x", "y") if getattr(x, "ndim", 0) == 2 else P()),
                     st),),
                 out_specs=P(), check_vma=False)
        def inner(s):
            c0, body = make_body(s)
            out = jax.lax.fori_loop(0, N, lambda _, c: body(c), c0)
            return jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]) * 0 + 1.0

        return inner(st)

    r = run(state)
    np.asarray(jax.device_get(r))
    t0 = time.perf_counter()
    r = run(state)
    np.asarray(jax.device_get(r))
    el = 1e3 * (time.perf_counter() - t0) / N
    print(f"{name:44s} {el:8.3f} ms/iter", flush=True)
    return el


# 1. the 5 exchanged extends (stage 2/7 of the decomposed step)
def mk_extends(s):
    def body(c):
        u, v = c
        ue = extend_field(grid, u, "u", comm)
        ve = extend_field(grid, v, "v", comm)
        te = extend_field(grid, s.tracers["T"], "c", comm)
        se = extend_field(grid, s.tracers["S"], "c", comm)
        ee = extend_field(grid, s.eta[:, :, None] * 0 + u, "c", comm)
        return (grid.interior(ue) + grid.interior(ee),
                grid.interior(ve) + grid.interior(te) + grid.interior(se))

    return (s.u, s.v), body


# 2. the 4 overlap strips (recompute + nothing else)
f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)


def mk_strips(s):
    hx, hy = grid.hx, grid.hy
    Nx, Ny = grid.Nx, grid.Ny

    def body(c):
        u, v = c
        ue = extend_field(grid, u, "u", comm)
        ve = extend_field(grid, v, "v", comm)
        tr = {k: extend_field(grid, t, "c", comm) for k, t in s.tracers.items()}
        outs = []
        for (x0, nxw, y0, nyw) in [(0, hx, 0, Ny), (Nx - hx, hx, 0, Ny),
                                   (hx, Nx - 2 * hx, 0, hy),
                                   (hx, Nx - 2 * hx, Ny - hy, hy)]:
            gu, gv, gtr = _window_tendency(cfg, grid, f_ff, ue, ve, tr,
                                           x0, nxw, y0, nyw)
            outs.append(jnp.sum(gu[..., :1]))
        return (u + outs[0] * 0 + outs[1] * 0 + outs[2] * 0 + outs[3] * 0, v)

    return (s.u, s.v), body


# 3. barotropic substep alone: decomposed (blocked, W=4) vs W=30
def mk_barotropic(exchange_width):
    import dataclasses

    from gb25_tpu.models.config import SplitExplicitFreeSurface

    c = dataclasses.replace(
        cfg, free_surface=SplitExplicitFreeSurface(
            exchange_width=exchange_width))

    def mk(s):
        def body(carry):
            u, v = carry
            eta, un, vn = barotropic_substep(c, grid, s, u, v, None, None,
                                             dt, comm)
            return (un, vn + eta[:, :, None] * 0)

        return (s.u, s.v), body

    return mk


# 4. full tendencies+AB2 via compute_tendencies with comm (kernel+overlap)
def mk_tend(s):
    def body(c):
        u, v = c
        st = s.replace(u=u, v=v)
        c1 = jnp.float32(1.5)
        ab = (jnp.stack([dt * c1, dt * 0]).reshape(1, 2), st.Gu, st.Gv,
              st.Gtracers)
        Gu, Gv, Geta, Gtr, diff, updated, ints = compute_tendencies(
            cfg, grid, st, comm, ab2=ab)
        un, vn, trn = updated
        return (un, vn)

    return (s.u, s.v), body


# serial twins for the deltas
comm_serial = None


def mk_tend_serial(s):
    def body(c):
        u, v = c
        st = s.replace(u=u, v=v)
        c1 = jnp.float32(1.5)
        ab = (jnp.stack([dt * c1, dt * 0]).reshape(1, 2), st.Gu, st.Gv,
              st.Gtracers)
        Gu, Gv, Geta, Gtr, diff, updated, ints = compute_tendencies(
            cfg, grid, st, None, ab2=ab)
        un, vn, trn = updated
        return (un, vn)

    return (s.u, s.v), body


def mk_barotropic_serial(s):
    def body(carry):
        u, v = carry
        eta, un, vn = barotropic_substep(cfg, grid, s, u, v, None, None,
                                         dt, None)
        return (un, vn + eta[:, :, None] * 0)

    return (s.u, s.v), body


timeit("exchanged extends x5", mk_extends)
timeit("overlap strips x4 (incl extends)", mk_strips)
timeit("barotropic decomposed W=4 (8 blocks)", mk_barotropic(None))
timeit("barotropic decomposed W=30 (1 block)", mk_barotropic(30))
timeit("barotropic serial (whole-loop kernel)", mk_barotropic_serial)
timeit("tendencies+AB2 decomposed (kernel+overlap)", mk_tend)
timeit("tendencies+AB2 serial (kernel)", mk_tend_serial)
