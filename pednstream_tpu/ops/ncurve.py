"""N-curve history read kernels.

The engine's only non-elementwise work is reading per-link history
values at per-link dynamic time offsets (cumulative-curve lookbacks,
link.py:260-288,380; diffusion lags, link.py:199-214).  XLA-level one-hot
reductions already avoid TPU's serialized gathers (docs/PERFORMANCE.md);
these kernels cut the remaining HBM traffic:

- :func:`diffusion_single_pass` folds the 4 lagged-inflow reads into ONE
  masked-coefficient reduction over the ring (4x less inflow-ring
  bandwidth).  Pure jnp; used on the fast path (exact-parity mode keeps
  the reference's 4-read summation order).
- :func:`fused_history_reads` is a Pallas TPU kernel computing all three
  ring reductions (cum_in lookback, cum_out lookback, diffusion) in one
  grid pass with a shared time-index iota, tiling [E, H] blocks through
  VMEM.
"""

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def diffusion_single_pass(inflow_ring, base, coefs, H: int):
    """diff_raw[e] = sum_k coefs[e,k] * inflow_ring[e, (base[e]-k) % H]
    for k in 0..3 with base[e]-k >= 0, computed in one pass.

    inflow_ring: [E, H]; base: [E] int; coefs: [E, 4].
    """
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)
    base_slot = jnp.mod(base, H)[:, None]
    k = jnp.mod(base_slot - h_ids, H)  # lag index of slot h
    valid = (k < 4) & ((base[:, None] - k) >= 0)
    # select (NOT gather: per-lane dynamic gathers serialize on TPU)
    coef = jnp.where(
        k == 0, coefs[:, 0:1],
        jnp.where(k == 1, coefs[:, 1:2],
                  jnp.where(k == 2, coefs[:, 2:3], coefs[:, 3:4])),
    )
    coef = jnp.where(valid, coef, 0.0)
    return (inflow_ring * coef).sum(axis=1)


def _fused_kernel(idx_ci_ref, idx_co_ref, base_ref, coef_ref,
                  ci_ring_ref, co_ring_ref, in_ring_ref,
                  ci_out_ref, co_out_ref, diff_out_ref, *, H: int):
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)

    def onehot_read(ring, idx2):  # idx2: [tile, 1]
        sel = (h_ids == jnp.mod(idx2, H)) & (idx2 >= 0)
        return jnp.where(sel, ring, 0.0).sum(axis=1, keepdims=True)

    ci_out_ref[:] = onehot_read(ci_ring_ref[:], idx_ci_ref[:])
    co_out_ref[:] = onehot_read(co_ring_ref[:], idx_co_ref[:])

    base2 = base_ref[:]  # [tile, 1]
    k = jnp.mod(jnp.mod(base2, H) - h_ids, H)
    valid = (k < 4) & ((base2 - k) >= 0)
    coefs = coef_ref[:]  # [tile, 4]
    coef = jnp.where(k == 0, coefs[:, 0:1],
                     jnp.where(k == 1, coefs[:, 1:2],
                               jnp.where(k == 2, coefs[:, 2:3], coefs[:, 3:4])))
    coef = jnp.where(valid, coef, 0.0)
    diff_out_ref[:] = (in_ring_ref[:] * coef).sum(axis=1, keepdims=True)


def fused_history_reads(cum_in_ring, cum_out_ring, inflow_ring,
                        idx_ci, idx_co, base, coefs, H: int,
                        tile: int = 256, interpret: bool = False):
    """All three per-step history reductions in one Pallas pass.

    Returns (cum_in_at[E], cum_out_at[E], diff_raw[E]).
    """
    E = cum_in_ring.shape[0]
    pad = (-E) % tile
    if pad:
        padf = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        cum_in_ring, cum_out_ring, inflow_ring = map(
            padf, (cum_in_ring, cum_out_ring, inflow_ring))
        idx_ci, idx_co, base = map(padf, (idx_ci, idx_co, base))
        coefs = padf(coefs)
    Ep = E + pad
    grid = (Ep // tile,)

    # scalars as [E, 1] so all kernel ops stay >= 2-D (Mosaic cannot
    # reshape 1-D i1 vectors)
    idx_ci2 = idx_ci.astype(jnp.int32)[:, None]
    idx_co2 = idx_co.astype(jnp.int32)[:, None]
    base2 = base.astype(jnp.int32)[:, None]

    col = lambda: pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ring = lambda: pl.BlockSpec((tile, H), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_fused_kernel, H=H),
        grid=grid,
        in_specs=[col(), col(), col(),
                  pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  ring(), ring(), ring()],
        out_specs=(col(), col(), col()),
        out_shape=(
            jax.ShapeDtypeStruct((Ep, 1), cum_in_ring.dtype),
            jax.ShapeDtypeStruct((Ep, 1), cum_out_ring.dtype),
            jax.ShapeDtypeStruct((Ep, 1), inflow_ring.dtype),
        ),
        interpret=interpret,
    )(idx_ci2, idx_co2, base2, coefs, cum_in_ring, cum_out_ring, inflow_ring)
    ci, co, diff = out
    return ci[:E, 0], co[:E, 0], diff[:E, 0]
