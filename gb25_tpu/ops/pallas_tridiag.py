"""Batched tridiagonal (Thomas) Pallas kernel for implicit vertical solves.

The array-path solver (ops/tridiagonal.py) runs the Thomas recurrence as a
``lax.scan`` over z slicing the MINOR axis of (X, Y, Z) arrays: 2 x Nz
sequential steps of thin strided slabs, measured 24.8 ms for the climate
step's five solves at 768x384x64 — scan-serialization and stride-Nz access,
not bandwidth, dominate.  This kernel does the whole solve in one pass at
HBM speed-of-light (read fields + kappa [+ damping], write solutions):

- **Transposed non-overlapping tiles.** Fields enter as (Z, Y, X) with x on
  the 128-lane dimension (same layout trick as pallas_zslab); each grid
  step owns a (Z, by, bx) tile — column solves are z-local, so there are
  no halos and no window overlap at all.
- **Coefficients via SMEM.** The diffusion couplings are
  lam_k = dt*kappa_k/(dz_c[k] dz_f[k]) and
  mu_k = dt*kappa_{k+1}/(dz_c[k] dz_f[k+1]); the purely-vertical parts
  (dt/(dz_c dz_f) columns with the zero-flux floor/surface ends baked in)
  ride a (1, Nz) SMEM row each, so the kernel streams only kappa.
- **Unrolled forward/backward sweeps.** Nz is small (<= 128 gated); the
  two recurrences unroll to plane ops on (by, bx) vregs with cp/dp carried
  in VMEM scratch.
- **Shared LU across fields.** Multiple right-hand sides with the same
  kappa (u & v share kappa_u, T & S share kappa_c) solve in one call: the
  forward-elimination coefficients cp are computed once, only dp/x repeat.

Reference capability: the implicit vertical solves of
CATKE/k-epsilon/VerticalScalarDiffusivity
(/root/reference/src/baroclinic_instability_model.jl:29-31).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick(n, want, quantum):
    """Largest divisor of n that is <= want and a multiple of quantum."""
    best = None
    for d in range(quantum, min(n, want) + 1, quantum):
        if n % d == 0:
            best = d
    return best


def tridiag_supported(field, kappa_face, dz_c, dz_f, damping=None,
                      kappa_t3=False, fields_t3=False) -> bool:
    """Gate for the Pallas Thomas kernel: f32 on TPU (or interpret mode),
    full-shape kappa (the closure path), vertical-only dz columns, tileable
    horizontal extents.  ``field`` may be one array or a tuple sharing the
    kappa.  ``kappa_t3``: kappa (and damping) arrive already transposed
    (Z, Y, X) — the layout the kernel wants — from the fused column-closure
    kernel (ops/pallas_catke.py)."""
    if int(os.environ.get("GB25_DISABLE_PALLAS", "0")):
        return False
    if jax.default_backend() != "tpu" and not int(
        os.environ.get("GB25_ZSLAB_INTERPRET", "0")
    ):
        return False
    fields = field if isinstance(field, (tuple, list)) else (field,)
    shape = fields[0].shape            # physical layout of the field arrays
    lshape = shape[::-1] if fields_t3 else shape  # logical (X, Y, Z)
    kshape = lshape[::-1] if kappa_t3 else lshape
    for f in fields:
        if f.dtype != jnp.float32 or f.shape != shape:
            return False
    if getattr(kappa_face, "shape", ()) != kshape:
        return False
    if damping is not None and getattr(damping, "shape", ()) != kshape:
        return False
    X, Y, Z = lshape
    if Z > 128:
        return False  # unrolled sweeps; deeper columns take the scan path
    for dz in (dz_c, dz_f):
        s = getattr(dz, "shape", ())
        if len(s) != 3 or s[0] != 1 or s[1] != 1 or s[2] != Z:
            return False
    if _pick(X, 256, 128) is None or _pick(Y, 8, 8) is None:
        return False
    return True


def pallas_implicit_diffusion(field, kappa_face, dt, dz_c, dz_f, damping=None,
                              bx=None, by=None, interpret=False,
                              kappa_t3=False, fields_t3=False):
    """Backward-Euler vertical diffusion solve, one HBM pass.

    Same contract as ops.tridiagonal.implicit_vertical_diffusion restricted
    to full-shape ``kappa_face`` (and optional full-shape ``damping``):
    solves (1 + dt*damping + lam_k + mu_k) x_k - lam_k x_{k-1} - mu_k x_{k+1}
    = field_k with zero-flux floor (lam_0 = 0) and surface (mu_{Nz-1} = 0).

    ``field`` may be a tuple of same-shape arrays sharing kappa/damping —
    they solve against one shared forward elimination; a tuple is returned.
    """
    interpret = interpret or bool(int(os.environ.get("GB25_ZSLAB_INTERPRET", "0")))
    single = not isinstance(field, (tuple, list))
    fields = (field,) if single else tuple(field)
    nf = len(fields)
    X, Y, Z = (fields[0].shape[::-1] if fields_t3 else fields[0].shape)
    dtype = fields[0].dtype
    # modest tiles: the unrolled sweeps keep several live planes per level,
    # and (Z, by, bx) blocks count against Mosaic's scoped-vmem stack
    # (Z=64, by=32, bx=512 blew the 16M scoped limit on v5e)
    bx = bx or int(os.environ.get("GB25_TRIDIAG_BX", "0")) or _pick(X, 256, 128)
    by = by or int(os.environ.get("GB25_TRIDIAG_BY", "0")) or _pick(Y, 8, 8)
    if X % bx or Y % by:
        raise ValueError(f"tridiag tile ({bx}, {by}) must divide ({X}, {Y})")

    # purely-vertical coefficient rows with the zero-flux ends baked in
    # (dz arrives traced: the grid is a jit argument)
    dzc = jnp.reshape(dz_c, (Z,)).astype(dtype)
    dzf = jnp.reshape(dz_f, (Z,)).astype(dtype)
    c_lam = (1.0 / (dzc * dzf)).at[0].set(0.0)  # lam_0 = 0: sea-floor no-flux
    c_mu = jnp.zeros(Z, dtype).at[: Z - 1].set(
        1.0 / (dzc[:-1] * dzf[1:])
    )  # mu_{Nz-1} = 0: no surface flux
    dt_t = jnp.asarray(dt, dtype).reshape(1, 1)
    c_lam = c_lam[None, :]
    c_mu = c_mu[None, :]

    def t2(a):  # (X, Y, Z) -> (Z, Y, X)
        return jnp.transpose(a, (2, 1, 0))

    has_damp = damping is not None
    tk = (lambda a: a) if kappa_t3 else t2  # kappa may arrive pre-transposed
    tf = (lambda a: a) if fields_t3 else t2  # fields too (fused-update path)
    operands = [tf(f) for f in fields] + [tk(kappa_face)]
    if has_damp:
        operands.append(tk(damping))
    n_in = len(operands)

    def kernel(dt_ref, cl_ref, cm_ref, *refs):
        ins = refs[:n_in]
        outs = refs[n_in : n_in + nf]
        cp_s = refs[n_in + nf]
        dp_s = refs[n_in + nf + 1 :]
        k_ref = ins[nf]
        dtv = dt_ref[0, 0]

        zeros = jnp.zeros((by, bx), dtype)
        cp_prev = zeros
        dp_prev = [zeros] * nf
        for k in range(Z):
            lam = k_ref[k] * (dtv * cl_ref[0, k])
            mu = (k_ref[k + 1] * (dtv * cm_ref[0, k])) if k + 1 < Z else zeros
            b = 1.0 + lam + mu
            if has_damp:
                b = b + dtv * ins[nf + 1][k]
            # a_k = -lam; denom = b - a*cp_prev
            inv = 1.0 / (b + lam * cp_prev)
            cp = -mu * inv
            cp_s[k] = cp
            cp_prev = cp
            for n in range(nf):
                dp = (ins[n][k] + lam * dp_prev[n]) * inv
                dp_s[n][k] = dp
                dp_prev[n] = dp

        x_next = [zeros] * nf
        for k in range(Z - 1, -1, -1):
            cp = cp_s[k]
            for n in range(nf):
                x = dp_s[n][k] - cp * x_next[n]
                outs[n][k] = x
                x_next[n] = x

    def spec():
        return pl.BlockSpec((Z, by, bx), lambda i, j: (0, j, i),
                            memory_space=pltpu.VMEM)

    vma = getattr(jax.typeof(fields[0]), "vma", None)
    if vma:
        operands = [
            jax.lax.pvary(a, tuple(set(vma) - getattr(jax.typeof(a), "vma", set())))
            for a in operands
        ]
        dt_t, c_lam, c_mu = (
            jax.lax.pvary(s, tuple(set(vma) - getattr(jax.typeof(s), "vma", set())))
            for s in (dt_t, c_lam, c_mu)
        )

    def sds():
        if vma:
            return jax.ShapeDtypeStruct((Z, Y, X), dtype, vma=vma)
        return jax.ShapeDtypeStruct((Z, Y, X), dtype)

    outs = pl.pallas_call(
        kernel,
        grid=(X // bx, Y // by),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [spec() for _ in operands],
        out_specs=[spec()] * nf,
        out_shape=[sds() for _ in range(nf)],
        scratch_shapes=[pltpu.VMEM((Z, by, bx), dtype)] * (1 + nf),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(6 + 4 * nf + 2 * int(has_damp)) * X * Y * Z,
            bytes_accessed=(n_in + nf) * X * Y * Z * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dt_t, c_lam, c_mu, *operands)
    res = tuple(jnp.transpose(o, (2, 1, 0)) for o in outs)
    return res[0] if single else res
