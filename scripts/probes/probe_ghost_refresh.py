"""Scratch: can a fori_loop carry an extended array and refresh its ghost
slabs in place at thin-slab cost?

Round-3 history: the first extended-carry loop (`_loop_extended`) measured
SLOWER than re-extension (67.5 vs 58.4 ms/step) and the suspected cause was
XLA copying the carried buffer on every self-referential ghost-slab update.
This probe isolates exactly that pattern at flagship size (72, 776, 1544)
so the failure mode is attributed to the right op before reinvesting:

  A) body = one elementwise pass over the extended array        (baseline)
  B) body = ghost-slab refresh (self-referential DUS chain) + A
  C) body = DUS of a THIN slab computed from a DIFFERENT array + A
     (the dead-buffer write pattern: update values provably disjoint)

If (B - A) ~ thin-slab bytes (~0.1 ms) the in-place refresh is fine and the
extended-carry loop is worth rebuilding on the transposed operands; if it
costs a full read+write (~0.8 ms+) the copy diagnosis stands.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gb25_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

Z, Y, X = 72, 776, 1544
hz = hy = hx = 4
Nz, Ny, Nx = Z - 2 * hz, Y - 2 * hy, X - 2 * hx
N = 64

e0 = jnp.asarray(np.random.default_rng(0).standard_normal((Z, Y, X)), jnp.float32)
thin0 = jnp.asarray(np.random.default_rng(1).standard_normal((hz, Y, X)), jnp.float32)


def refresh(e):
    # transposed-layout ghost refresh: z wrap-free BCs as plain slab copies
    # (zerograd-style), y zero-gradient, x periodic wrap — same slab sizes and
    # self-referential structure as ops.halos.refresh_halos_ext
    e = e.at[:hz].set(e[hz : 2 * hz])
    e = e.at[Z - hz :].set(e[Z - 2 * hz : Z - hz])
    e = e.at[:, :hy].set(e[:, hy : 2 * hy])
    e = e.at[:, Y - hy :].set(e[:, Y - 2 * hy : Y - hy])
    e = e.at[:, :, :hx].set(e[:, :, X - 2 * hx : X - hx])
    e = e.at[:, :, X - hx :].set(e[:, :, hx : 2 * hx])
    return e


def loop_a(e, n):
    return jax.lax.fori_loop(0, n, lambda _, a: a * 1.0000001, e)


def loop_b(e, n):
    return jax.lax.fori_loop(0, n, lambda _, a: refresh(a) * 1.0000001, e)


def loop_c(e, n):
    def body(_, c):
        a, t = c
        a = a.at[:hz].set(t)  # thin write, values from a different array
        return a * 1.0000001, t * 0.9999999
    a, t = jax.lax.fori_loop(0, n, body, (e, thin0))
    return a


def timeit(name, fn, *args):
    f = jax.jit(fn, static_argnames="n")
    r = f(*args, n=N)
    r = r[0] if isinstance(r, tuple) else r
    np.asarray(jax.device_get(r[0, 0, 0]))
    t0 = time.perf_counter()
    r = f(*args, n=N)
    r = r[0] if isinstance(r, tuple) else r
    np.asarray(jax.device_get(r[0, 0, 0]))
    el = (time.perf_counter() - t0) / N * 1e3
    print(f"{name}: {el:.3f} ms/iter", flush=True)
    return el


a = timeit("A baseline one-pass", loop_a, e0)
b = timeit("B self-ref ghost refresh + pass", loop_b, e0)
c = timeit("C thin foreign DUS + pass", loop_c, e0)
print(f"refresh marginal cost: {b - a:.3f} ms (thin-slab floor ~0.1, full copy ~0.8+)")
print(f"foreign-thin marginal: {c - a:.3f} ms")
