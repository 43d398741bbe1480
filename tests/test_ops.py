"""Unit tests for stencils, halos, WENO, and EOS against NumPy/f64 oracles.

This adopts the reference's differential-testing strategy (SURVEY.md section
4.1) at the operator level: every discrete operator is checked against an
independent dense NumPy implementation or an analytic result.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gb25_tpu.ops import stencils as st
from gb25_tpu.ops.halos import extend_axis, extend_field
from gb25_tpu.ops.weno import weno5, weno5_upwind
from gb25_tpu.ops.eos import (
    LinearEquationOfState,
    rho_anomaly_teos10,
    rho_teos10,
    rho_vertical_reference,
)
from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.ops.operators import diagnose_w, horizontal_divergence, hydrostatic_pressure


def rnd(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape)


class TestStencils:
    def test_shifts(self):
        a = jnp.asarray(rnd(6, 5, 4))
        np.testing.assert_allclose(st.sm(a, "x")[2], a[1])
        np.testing.assert_allclose(st.sp(a, "y")[:, 2], a[:, 3])

    def test_difference_alignment(self):
        a = jnp.asarray(rnd(6, 5, 4))
        # d_f: out[i] = a[i] - a[i-1]
        np.testing.assert_allclose(st.d_f(a, "x")[3], a[3] - a[2])
        # d_c: out[i] = a[i+1] - a[i]
        np.testing.assert_allclose(st.d_c(a, "z")[..., 2], a[..., 3] - a[..., 2])

    def test_interp_alignment(self):
        a = jnp.asarray(rnd(6, 5, 4))
        np.testing.assert_allclose(st.i_f(a, "x")[3], 0.5 * (a[3] + a[2]))
        np.testing.assert_allclose(st.i_c(a, "x")[3], 0.5 * (a[3] + a[4]))


class TestHalos:
    def test_wrap(self):
        a = jnp.arange(24.0).reshape(6, 4, 1)
        e = extend_axis(a, 2, 0, "wrap", "wrap")
        assert e.shape == (10, 4, 1)
        np.testing.assert_allclose(e[:2], a[-2:])
        np.testing.assert_allclose(e[-2:], a[:2])

    def test_mirror(self):
        a = jnp.arange(5.0).reshape(1, 5, 1)
        e = extend_axis(a, 2, 1, "mirror", "mirror")
        np.testing.assert_allclose(e[0, :, 0], [1, 0, 0, 1, 2, 3, 4, 4, 3])

    def test_antimirror_face(self):
        v = jnp.asarray([0.0, 1.0, 2.0, 3.0]).reshape(1, 4, 1)
        e = extend_axis(v, 2, 1, "antimirror_face", "antimirror_face")
        # below: -v[2], -v[1]; above: wall(0), -v[3]
        np.testing.assert_allclose(e[0, :, 0], [-2, -1, 0, 1, 2, 3, 0, -3])

    def test_zerograd_zero(self):
        a = jnp.asarray([5.0, 7.0]).reshape(1, 1, 2)
        e = extend_axis(a, 2, 2, "zero", "zerograd")
        np.testing.assert_allclose(e[0, 0], [0, 0, 5, 7, 7, 7])

    def test_extend_field_shape(self):
        g = simple_latitude_longitude_grid(8, 6, 4)
        a = jnp.asarray(rnd(8, 6, 4))
        e = extend_field(g, a, "c")
        assert e.shape == (16, 14, 12)
        np.testing.assert_allclose(np.asarray(g.interior(e)), np.asarray(a))


class TestWENO:
    def _weno5_face_oracle(self, a):
        """Dense NumPy left-biased WENO-5 at face i (between a[i-1], a[i])."""
        n = len(a)
        out = np.full(n, np.nan)
        eps = 1e-6
        for i in range(3, n - 1):
            m2, m1, s0, p1, p2 = a[i - 3], a[i - 2], a[i - 1], a[i], a[i + 1]
            q0 = (2 * m2 - 7 * m1 + 11 * s0) / 6
            q1 = (-m1 + 5 * s0 + 2 * p1) / 6
            q2 = (2 * s0 + 5 * p1 - p2) / 6
            b0 = 13 / 12 * (m2 - 2 * m1 + s0) ** 2 + 0.25 * (m2 - 4 * m1 + 3 * s0) ** 2
            b1 = 13 / 12 * (m1 - 2 * s0 + p1) ** 2 + 0.25 * (m1 - p1) ** 2
            b2 = 13 / 12 * (s0 - 2 * p1 + p2) ** 2 + 0.25 * (3 * s0 - 4 * p1 + p2) ** 2
            al = np.array([0.1 / (b0 + eps) ** 2, 0.6 / (b1 + eps) ** 2, 0.3 / (b2 + eps) ** 2])
            w = al / al.sum()
            out[i] = w @ np.array([q0, q1, q2])
        return out

    def test_face_below_matches_oracle(self):
        a1 = rnd(16, seed=3)
        a = jnp.asarray(np.tile(a1[:, None, None], (1, 1, 1)))
        below, _ = weno5(a, "x", align="face")
        oracle = self._weno5_face_oracle(a1)
        np.testing.assert_allclose(np.asarray(below)[3:-1, 0, 0], oracle[3:-1], rtol=1e-12)

    def test_symmetry(self):
        """Reconstruction from above on data a == reconstruction from below on
        reversed data (mirror symmetry)."""
        a1 = rnd(16, seed=4)
        a = jnp.asarray(a1[:, None, None])
        below, above = weno5(a, "x", align="face")
        ar = jnp.asarray(a1[::-1].copy()[:, None, None])
        below_r, _ = weno5(ar, "x", align="face")
        # face i on a <-> face (n - i) on reversed array
        n = 16
        for i in range(4, 12):
            np.testing.assert_allclose(
                float(above[i, 0, 0]), float(below_r[n - i, 0, 0]), rtol=1e-12
            )

    def test_exact_on_smooth_poly(self):
        # WENO-5 with smooth data reproduces the 5th-order upwind value;
        # for quadratic data every candidate stencil is exact.
        x = np.arange(20.0)
        a1 = 2.0 + 3.0 * x + 0.5 * x * x
        a = jnp.asarray(a1[:, None, None])
        below, above = weno5(a, "x", align="face")
        # The FV reconstruction treats samples as cell averages: for samples of
        # a quadratic q (q'' = 1), each candidate stencil exactly reconstructs
        # g(x_face) where g = q - q'' dx^2/24.
        for i in range(4, 16):
            xf = x[i] - 0.5
            val = 2.0 + 3.0 * xf + 0.5 * xf * xf - 1.0 / 24.0
            np.testing.assert_allclose(float(below[i, 0, 0]), val, rtol=1e-10)
            np.testing.assert_allclose(float(above[i, 0, 0]), val, rtol=1e-10)

    def test_center_align(self):
        a1 = rnd(16, seed=5)
        a = jnp.asarray(a1[:, None, None])
        below_c, _ = weno5(a, "x", align="center")
        below_f, _ = weno5(a, "x", align="face")
        # center j sits between data j, j+1 <-> face j+1 in face alignment
        np.testing.assert_allclose(
            np.asarray(below_c)[4:11, 0, 0], np.asarray(below_f)[5:12, 0, 0], rtol=1e-12
        )

    def test_upwind_selects(self):
        a = jnp.asarray(rnd(16, seed=6)[:, None, None])
        below, above = weno5(a, "x")
        vel = jnp.ones_like(a)
        np.testing.assert_allclose(
            np.asarray(weno5_upwind(a, vel, "x")), np.asarray(below)
        )
        np.testing.assert_allclose(
            np.asarray(weno5_upwind(a, -vel, "x")), np.asarray(above)
        )


class TestEOS:
    def test_teos10_published_check_values(self):
        # Roquet et al. 2015, polyTEOS10_bsq check values at SA=30, CT=10, Z=-1000
        assert abs(float(rho_vertical_reference(jnp.float64(-1000.0))) - 4.59763035) < 1e-7
        assert abs(float(rho_anomaly_teos10(30.0, 10.0, -1000.0)) - 1022.85377) < 2e-5
        assert abs(float(rho_teos10(30.0, 10.0, -1000.0)) - 1027.45140) < 2e-5

    def test_teos10_physical_monotonicity(self):
        # denser when colder and saltier
        assert rho_teos10(35.0, 5.0, 0.0) > rho_teos10(35.0, 20.0, 0.0)
        assert rho_teos10(36.0, 10.0, 0.0) > rho_teos10(34.0, 10.0, 0.0)

    def test_linear_eos(self):
        eos = LinearEquationOfState()
        assert float(eos.buoyancy(eos.T0, eos.S0, -10.0)) == 0.0
        assert float(eos.buoyancy(eos.T0 + 1, eos.S0, 0.0)) > 0


class TestOperators:
    def test_divergence_of_solid_rotation_is_zero(self):
        g = simple_latitude_longitude_grid(24, 12, 4, dtype=jnp.float64)
        # solid-body rotation: u = U0 cos(phi), v = 0 -> divergence-free
        phi_c = np.asarray(g.phi_c)
        u = jnp.asarray(
            np.broadcast_to(np.cos(np.deg2rad(phi_c))[None, :, None], (32, 20, 12)).copy()
        )
        v = jnp.zeros((32, 20, 12))
        div = horizontal_divergence(g, u, v)
        div_i = np.asarray(g.interior(div))
        assert np.max(np.abs(div_i)) < 1e-12

    def test_diagnose_w_column_consistency(self):
        g = simple_latitude_longitude_grid(16, 8, 6, dtype=jnp.float64)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal((16, 8, 6)))
        v = jnp.asarray(rng.standard_normal((16, 8, 6)))
        ue = extend_field(g, u, "u")
        ve = extend_field(g, v, "v")
        w = diagnose_w(g, ue, ve)
        hz = g.hz
        # bottom face w == 0
        np.testing.assert_allclose(np.asarray(w[:, :, hz]), 0.0)
        # d w / dz = -div at every interior cell
        div = np.asarray(horizontal_divergence(g, ue, ve))
        dzc = np.asarray(g.dz_c)[0, 0]
        wn = np.asarray(w)
        hx, hy = g.hx, g.hy
        for k in range(g.Nz - 1):
            lhs = (wn[:, :, hz + k + 1] - wn[:, :, hz + k]) / dzc[hz + k]
            rhs = -div[:, :, hz + k]
            np.testing.assert_allclose(
                lhs[hx:-hx, hy:-hy], rhs[hx:-hx, hy:-hy], rtol=1e-10, atol=1e-18
            )

    def test_hydrostatic_pressure_linear_b(self):
        g = simple_latitude_longitude_grid(8, 6, 10, dtype=jnp.float64)
        hz = g.hz
        # dp/dz = b with p(0)=0: b = N^2 z -> p(z) = N^2 z^2 / 2 (>0: stable
        # stratification has denser water below -> higher p anomaly at depth)
        N2 = 4e-6
        zc = np.asarray(g.z_c)[0, 0]
        b = jnp.asarray(np.broadcast_to(N2 * zc[None, None, :], (16, 14, 18)).copy())
        p = np.asarray(hydrostatic_pressure(g, b))[0, 0, hz : hz + 10]
        # The discrete integral of piecewise-constant b over layers: compare
        # against the midpoint-rule oracle computed densely (downward
        # integration of dp/dz = b from the surface).
        dz = np.asarray(g.dz_c)[0, 0, hz : hz + 10]
        bz = N2 * zc[hz : hz + 10]
        oracle = -np.array(
            [np.sum(bz[k + 1 :] * dz[k + 1 :]) + 0.5 * bz[k] * dz[k] for k in range(10)]
        )
        np.testing.assert_allclose(p, oracle, rtol=1e-12)
        # continuous solution check: p ~ N^2 z^2 / 2 > 0 at depth
        assert p[0] > 0
