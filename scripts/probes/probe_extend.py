"""Scratch probe: HBM cost of building the z-slab kernel's extended operands.

The flagship profile (round 3) shows extend_field_t3 costing ~1.8 ms/field:
pad (1 materialization) + ghost dynamic-update-slices that each pay a FULL
array pass — XLA copies the array at every .at[].set() whose update values
are computed *from the same evolving array* (conservative aliasing).  This
probe measures candidate builds at the flagship operand size so the winner
is data, not theory:

  v0  current: pad + per-axis ghosts computed from the evolving array
  v1  pad + ghosts ALL precomputed from the raw interior (DUS chain whose
      values don't depend on the evolving array -> in-place eligible)
  v2  three nested concatenates (one per axis)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gb25_tpu.ops.halos import _extend_3d_fast, ghost_blocks

Nx, Ny, Nz = 1536, 768, 64
h = 4  # flagship grid halo
modes_z = ("zerograd", "zerograd")
modes_y = ("mirror", "mirror")
modes_x = ("wrap", "wrap")


def v0(at):
    return _extend_3d_fast(at, (h, h, h), modes_z, modes_y, modes_x)


def v1(at):
    """Ghosts precomputed from the raw interior; corner blocks built by
    applying the y/x modes to already-extended thin slabs of the interior."""
    Z, Y, X = at.shape
    # z slabs over the raw interior (full (h, Y, X))
    zlo, zhi = ghost_blocks(at, h, 0, *modes_z)
    # y slabs over the z-extended pencils: z-extend the thin y-edge slabs
    def zext(s):  # (h?, ...) thin slab -> z-extended copy
        lo, hi = ghost_blocks(s, h, 0, *modes_z)
        return jnp.concatenate([lo, s, hi], axis=0)

    ylo_i, yhi_i = ghost_blocks(at, h, 1, *modes_y)  # (Z, h, X)
    ylo, yhi = zext(ylo_i), zext(yhi_i)  # (Z+2h, h, X)
    # x slabs over the zy-extended pencils: wrap columns of the interior,
    # then z- and y-extend those thin columns
    def yext(s):
        lo, hi = ghost_blocks(s, h, 1, *modes_y)
        return jnp.concatenate([lo, s, hi], axis=1)

    xlo_i, xhi_i = ghost_blocks(at, h, 2, *modes_x)  # (Z, Y, h)
    xlo, xhi = zext(yext(xlo_i)), zext(yext(xhi_i))  # (Z+2h, Y+2h, h)

    e = jnp.pad(at, ((h, h), (h, h), (h, h)))
    e = e.at[:h, h : h + Y, h : h + X].set(zlo)
    e = e.at[h + Z :, h : h + Y, h : h + X].set(zhi)
    e = e.at[:, :h, h : h + X].set(ylo)
    e = e.at[:, h + Y :, h : h + X].set(yhi)
    e = e.at[:, :, :h].set(xlo)
    e = e.at[:, :, h + X :].set(xhi)
    return e


def v2(at):
    def cat(a, hh, axis, modes):
        lo, hi = ghost_blocks(a, hh, axis, *modes)
        return jnp.concatenate([lo, a, hi], axis=axis)

    return cat(cat(cat(at, h, 0, modes_z), h, 1, modes_y), h, 2, modes_x)


def _sync(x):
    # block_until_ready is unreliable over the axon tunnel: fetch a scalar
    # reduction instead (cannot complete before the producer does)
    np.asarray(jax.device_get(jnp.sum(x[:1, :1])))


def main():
    key = jax.random.PRNGKey(0)
    at = jax.device_put(jax.random.normal(key, (Nz, Ny, Nx), jnp.float32))

    ref = None
    for name, fn in [("v0", v0), ("v1", v1), ("v2", v2)]:
        # chain extend -> barrier (forces the extended array to materialize,
        # as the pallas consumer does) -> crop, so iterations are
        # data-dependent and the concat/slice pair cannot fold away
        f = jax.jit(
            lambda x: jax.lax.optimization_barrier(fn(x))[h:-h, h:-h, h:-h]
        )
        out = f(at)
        _sync(out)
        if ref is None:
            ref = np.asarray(jax.device_get(jax.jit(fn)(at)))
        else:
            np.testing.assert_array_equal(
                np.asarray(jax.device_get(jax.jit(fn)(at))), ref)
        times = {}
        for n in (4, 24):
            t0 = time.perf_counter()
            out = at
            for _ in range(n):
                out = f(out)
            _sync(out)
            times[n] = time.perf_counter() - t0
        ms = (times[24] - times[4]) / 20 * 1e3
        print(f"{name}: {ms:.3f} ms  (extend+crop)", flush=True)


if __name__ == "__main__":
    main()
