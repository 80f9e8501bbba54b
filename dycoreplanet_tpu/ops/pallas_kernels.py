"""Pallas TPU kernels for the hot paths.

First kernel: VMEM-resident batched tridiagonal solve. The Thomas
recurrence used by the spectral Poisson/line preconditioners
(solvers/tridiag.py) is a 2n-step `lax.scan` whose every step round
trips HBM; here each grid block DMAs its (n, LANE) slab into VMEM once,
runs the forward/backward recurrences entirely on-chip with
`fori_loop`, and writes the solution back — one HBM pass instead of 2n.

The jnp reference implementation (thomas_solve) remains the correctness
oracle and the CPU path; `tridiag_solve` dispatches between the two.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dycoreplanet_tpu.solvers.tridiag import thomas_solve

_LANE = 128


def _tridiag_kernel(l_ref, d_ref, u_ref, b_ref, x_ref, c_scr, g_scr):
    """One block: systems along axis 0, batch along axis 1 (in VMEM)."""
    n = l_ref.shape[0]

    # forward elimination
    denom0 = d_ref[0, :]
    c_scr[0, :] = u_ref[0, :] / denom0
    g_scr[0, :] = b_ref[0, :] / denom0

    def fwd(i, _):
        li = l_ref[i, :]
        denom = d_ref[i, :] - li * c_scr[i - 1, :]
        c_scr[i, :] = u_ref[i, :] / denom
        g_scr[i, :] = (b_ref[i, :] - li * g_scr[i - 1, :]) / denom
        return 0

    jax.lax.fori_loop(1, n, fwd, 0)

    # back substitution
    x_ref[n - 1, :] = g_scr[n - 1, :]

    def bwd(k, _):
        i = n - 2 - k
        x_ref[i, :] = g_scr[i, :] - c_scr[i, :] * x_ref[i + 1, :]
        return 0

    jax.lax.fori_loop(0, n - 1, bwd, 0)


def tridiag_pallas(
    lower: jnp.ndarray,
    diag: jnp.ndarray,
    upper: jnp.ndarray,
    rhs: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched tridiagonal solve along axis 0 via Pallas.

    Inputs shaped (n, ...); trailing axes are flattened into a batch,
    padded to the 128-lane width, and solved in VMEM-resident blocks.
    """
    n = rhs.shape[0]
    batch_shape = rhs.shape[1:]
    m = int(np.prod(batch_shape)) if batch_shape else 1

    def flat(a):
        a = jnp.broadcast_to(a, (n,) + batch_shape).reshape(n, m)
        pad = (-m) % _LANE
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        return a

    lf, df, uf, bf = flat(lower), flat(diag), flat(upper), flat(rhs)
    # guard the padded lanes of the diagonal against div-by-zero
    pad = (-m) % _LANE
    if pad:
        df = df.at[:, m:].set(1.0)
    mp = m + pad
    grid = (mp // _LANE,)

    spec = pl.BlockSpec((n, _LANE), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _tridiag_kernel,
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, mp), rhs.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, _LANE), rhs.dtype),
            pltpu.VMEM((n, _LANE), rhs.dtype),
        ],
        interpret=interpret,
    )(lf, df, uf, bf)
    return out[:, :m].reshape((n,) + batch_shape)


def on_tpu() -> bool:
    """True only on a directly-attached TPU backend. The experimental
    'axon' tunnel platform advertises TPU semantics but its Mosaic
    path crashes the worker on this kernel (observed: UNAVAILABLE
    kernel fault), and the lax.scan Thomas is ~1 ms at production
    batch sizes there anyway — so 'auto' engages Pallas only on a
    real local TPU."""
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


# Session-wide dispatch override: set False when compiling for host-CPU
# devices while the default backend is a TPU (e.g. the driver's
# virtual-device multichip dry run) — Pallas has no CPU lowering.
_use_pallas_override: Optional[bool] = None


def set_use_pallas(value: Optional[bool]) -> None:
    global _use_pallas_override
    _use_pallas_override = value


def tridiag_solve(lower, diag, upper, rhs, *, use_pallas: Optional[bool] = None):
    """Dispatch: Pallas kernel on TPU, lax.scan Thomas elsewhere."""
    if use_pallas is None:
        use_pallas = (
            _use_pallas_override
            if _use_pallas_override is not None
            else on_tpu()
        )
    if use_pallas:
        return tridiag_pallas(lower, diag, upper, rhs)
    return thomas_solve(
        jnp.broadcast_to(lower, rhs.shape),
        jnp.broadcast_to(diag, rhs.shape),
        jnp.broadcast_to(upper, rhs.shape),
        rhs,
    )
