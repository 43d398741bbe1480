"""Hardware differential for the fused column-closure kernels (CATKE +
k-epsilon): Mosaic kernel vs XLA array path on the real chip — the
interpret-mode tests in tests/test_pallas_catke.py cannot catch a Mosaic
codegen regression.

Usage: python scripts/probes/probe_catke_kernel.py [Nx Ny Nz]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])

import jax
import jax.numpy as jnp
import numpy as np

from gb25_tpu.grids import simple_latitude_longitude_grid, tripolar_grid
from gb25_tpu.grids.immersed import gaussian_islands_bottom
from gb25_tpu.models import baroclinic_instability_config, baroclinic_instability_state
from gb25_tpu.models.catke import CATKEVerticalDiffusivity, catke_diffusivities
from gb25_tpu.models.hydrostatic import buoyancy_field
from gb25_tpu.models.keps import TKEDissipationVerticalDiffusivity, keps_diffusivities
from gb25_tpu.ops.halos import extend_field
from gb25_tpu.ops.pallas_catke import (
    catke_diffusivities_kernel,
    keps_diffusivities_kernel,
)
from gb25_tpu.ops.pallas_zslab import _t3
from gb25_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def check(name, grid):
    cfg = baroclinic_instability_config(closure=CATKEVerticalDiffusivity())
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    tr = dict(state.tracers)
    tr["e"] = jnp.full(grid.shape, 1e-5, jnp.float32)
    tr["eps"] = jnp.full(grid.shape, 1e-8, jnp.float32)
    state = state.replace(tracers=tr)
    ue = extend_field(grid, state.u, "u", None)
    ve = extend_field(grid, state.v, "v", None)
    tr_e = {k: extend_field(grid, c, "c", None) for k, c in state.tracers.items()}
    be = buoyancy_field(cfg, grid, tr_e)

    cl = cfg.closure
    want = jax.jit(lambda u, v, b, e: catke_diffusivities(cl, grid, u, v, b, e))(
        ue, ve, be, tr_e["e"])
    got = jax.jit(lambda u, v, b, e: catke_diffusivities_kernel(
        cl, grid, _t3(u), _t3(v), _t3(b), _t3(e)))(ue, ve, be, tr_e["e"])
    worst = 0.0
    for g, w in zip(got, want):
        w = np.asarray(grid.interior(w))
        g = np.asarray(g)
        scale = max(np.abs(w).max(), 1e-30)
        worst = max(worst, float(np.abs(g - w).max() / scale))
    assert worst < 1e-5, f"{name} CATKE kernel-vs-array rel diff {worst}"
    print(f"{name}: CATKE kernel-vs-array max rel diff {worst:.2e}  PASS", flush=True)

    kl = TKEDissipationVerticalDiffusivity()
    want = jax.jit(lambda u, v, b, e, p: keps_diffusivities(kl, grid, u, v, b, e, p))(
        ue, ve, be, tr_e["e"], tr_e["eps"])
    got = jax.jit(lambda u, v, b, e, p: keps_diffusivities_kernel(
        kl, grid, _t3(u), _t3(v), _t3(b), _t3(e), _t3(p)))(
        ue, ve, be, tr_e["e"], tr_e["eps"])
    worst = 0.0
    for g, w in zip(got, want):
        w = np.asarray(grid.interior(w))
        g = np.asarray(g)
        scale = max(np.abs(w).max(), 1e-30)
        worst = max(worst, float(np.abs(g - w).max() / scale))
    assert worst < 1e-5, f"{name} k-eps kernel-vs-array rel diff {worst}"
    print(f"{name}: k-eps kernel-vs-array max rel diff {worst:.2e}  PASS", flush=True)


def main():
    Nx = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    Ny = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    Nz = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    check("lat-lon", simple_latitude_longitude_grid(Nx, Ny, Nz, dtype=jnp.float32))
    check("immersed lat-lon",
          gaussian_islands_bottom(simple_latitude_longitude_grid(Nx, Ny, Nz, dtype=jnp.float32)))
    check("immersed tripolar",
          gaussian_islands_bottom(tripolar_grid(Nx, Ny, Nz, dtype=jnp.float32)))
    print("ALL PASS", flush=True)


if __name__ == "__main__":
    main()
