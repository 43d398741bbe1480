#!/usr/bin/env python
"""Minimal distributed sanity checks (reference: sharding/simple_matmul.jl +
simple_distributed_bcast.jl — tiny programs that validate the mesh, the
collective path, and replication before launching the real model)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-devices", type=int, default=None)
    p.add_argument("--distributed", action="store_true")
    args = p.parse_args()
    if args.distributed:
        jax.distributed.initialize()

    from gb25_tpu.parallel import factors, make_mesh

    if args.n_devices and len(jax.devices()) < args.n_devices:
        from gb25_tpu.utils import force_virtual_cpu_devices

        force_virtual_cpu_devices(args.n_devices)
    n = args.n_devices or len(jax.devices())
    rx, ry = factors(n)
    mesh = make_mesh(n, shape=(rx, ry))
    print(f"devices={n} mesh={rx}x{ry} backend={jax.default_backend()}")

    # sharded matmul (reference: simple_matmul.jl)
    k = 256
    a = jax.device_put(jnp.ones((k * rx, k)), NamedSharding(mesh, P("x", None)))
    b = jax.device_put(jnp.ones((k, k * ry)), NamedSharding(mesh, P(None, "y")))
    c = jax.jit(lambda x, y: x @ y)(a, b)
    np.testing.assert_allclose(np.asarray(c[0, 0]), k)
    print(f"matmul OK: {c.shape}, sharding {c.sharding.spec}")

    # replicated broadcast (reference: simple_distributed_bcast.jl)
    scalar = jax.device_put(jnp.float32(7.0), NamedSharding(mesh, P()))
    out = jax.jit(lambda s: s * jnp.ones((rx * 8, ry * 8)))(scalar)
    np.testing.assert_allclose(np.asarray(out), 7.0)
    print("broadcast OK")

    # neighbor ppermute ring over the mesh x-axis
    from functools import partial

    @partial(jax.shard_map, mesh=mesh, in_specs=P("x", "y"), out_specs=P("x", "y"))
    def ring(t):
        return jax.lax.ppermute(t, "x", [(i, (i + 1) % rx) for i in range(rx)])

    t = jax.device_put(
        jnp.arange(float(n)).reshape(rx, ry), NamedSharding(mesh, P("x", "y"))
    )
    r = ring(t)
    expected = np.roll(np.arange(float(n)).reshape(rx, ry), 1, axis=0)
    np.testing.assert_allclose(np.asarray(r), expected)
    print("ppermute ring OK")
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
