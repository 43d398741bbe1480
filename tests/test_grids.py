import numpy as np
import jax.numpy as jnp

from gb25_tpu.grids import (
    EARTH_RADIUS,
    exponential_z_faces,
    simple_latitude_longitude_grid,
    resolution_to_points,
)


def test_exponential_z_faces_basic():
    zf = exponential_z_faces(20, depth=4000.0, h=30.0)
    assert zf.shape == (21,)
    assert zf[0] == -4000.0
    assert zf[-1] == 0.0
    dz = np.diff(zf)
    assert np.all(dz > 0)
    # surface spacing ~ h, monotonically refined toward surface
    assert abs(dz[-1] - 30.0) < 1.0
    assert np.all(np.diff(dz) < 1e-9)  # spacing decreases upward


def test_exponential_z_faces_uniform_limit():
    zf = exponential_z_faces(10, depth=100.0, h=50.0)  # h > depth/Nz -> uniform
    assert np.allclose(np.diff(zf), 10.0)


def test_resolution_to_points():
    assert resolution_to_points(2) == (192, 96)
    assert resolution_to_points(0.25) == (1536, 768)


def test_latlon_grid_metrics():
    g = simple_latitude_longitude_grid(32, 16, 8, dtype=jnp.float64)
    hx, hy, hz = g.halo
    assert g.lam_c.shape == (32 + 2 * hx,)
    assert g.phi_c.shape == (16 + 2 * hy,)
    assert g.dz_c.shape == (1, 1, 8 + 2 * hz)
    assert g.dxc.shape == (1, 16 + 2 * hy, 1)

    # interior latitudes span (-80, 80)
    phi = np.asarray(g.phi_c_i)
    assert phi[0] > -80 and phi[-1] < 80
    assert np.allclose(np.diff(phi), 160.0 / 16)

    # metric values are mirrored, so ghost metrics stay positive even when
    # ghost latitudes exceed +-90 on coarse grids
    assert np.all(np.asarray(g.dxc) > 0)
    assert np.all(np.asarray(g.dxf) > 0)
    assert np.all(np.asarray(g.azf) > 0)
    assert np.all(np.asarray(g.azc) > 0)

    # total ocean area ~ spherical band area between +-80
    area = float(np.sum(np.asarray(g.azc)[0, hy : hy + 16, 0]) * 32)
    exact = 2 * np.pi * EARTH_RADIUS**2 * 2 * np.sin(np.deg2rad(80.0))
    assert abs(area - exact) / exact < 1e-12

    # dx at center of the grid close to R * cos(phi) * dlam
    j = hy + 8
    expected = EARTH_RADIUS * np.cos(np.deg2rad(float(g.phi_c[j]))) * np.deg2rad(360.0 / 32)
    assert abs(float(g.dxc[0, j, 0]) - expected) < 1e-6 * expected

    # z metrics: dz_c sums to depth over interior
    dz = np.asarray(g.dz_c)[0, 0, hz : hz + 8]
    assert abs(dz.sum() - 4000.0) < 1e-6

    # mirror symmetry of metrics about the south wall
    dxc = np.asarray(g.dxc)[0, :, 0]
    assert np.allclose(dxc[hy - 1], dxc[hy])  # ghost mirrors first interior


def test_grid_is_pytree():
    import jax

    g = simple_latitude_longitude_grid(8, 8, 4)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(hasattr(l, "dtype") for l in leaves)
    g2 = jax.tree_util.tree_map(lambda x: x, g)
    assert g2.Nx == 8
