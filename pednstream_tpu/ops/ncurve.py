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

    def onehot_read(ring, idx):
        sel = (h_ids == jnp.mod(idx, H)[:, None]) & (idx >= 0)[:, None]
        return jnp.where(sel, ring, 0.0).sum(axis=1)

    ci_out_ref[:] = onehot_read(ci_ring_ref[:], idx_ci_ref[:])
    co_out_ref[:] = onehot_read(co_ring_ref[:], idx_co_ref[:])

    base = base_ref[:]
    base_slot = jnp.mod(base, H)[:, None]
    k = jnp.mod(base_slot - h_ids, H)
    valid = (k < 4) & ((base[:, None] - k) >= 0)
    kc = jnp.minimum(k, 3)
    coefs = coef_ref[:]  # [TILE, 4]
    coef = jnp.where(kc == 0, coefs[:, 0:1],
                     jnp.where(kc == 1, coefs[:, 1:2],
                               jnp.where(kc == 2, coefs[:, 2:3], coefs[:, 3:4])))
    coef = jnp.where(valid, coef, 0.0)
    diff_out_ref[:] = (in_ring_ref[:] * coef).sum(axis=1)


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

    vec = lambda: pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.ANY)
    ring = lambda: pl.BlockSpec((tile, H), lambda i: (i, 0), memory_space=pltpu.ANY)

    out = pl.pallas_call(
        partial(_fused_kernel, H=H),
        grid=grid,
        in_specs=[vec(), vec(), vec(), pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.ANY),
                  ring(), ring(), ring()],
        out_specs=(vec(), vec(), vec()),
        out_shape=(
            jax.ShapeDtypeStruct((Ep,), cum_in_ring.dtype),
            jax.ShapeDtypeStruct((Ep,), cum_out_ring.dtype),
            jax.ShapeDtypeStruct((Ep,), inflow_ring.dtype),
        ),
        interpret=interpret,
    )(idx_ci, idx_co, base, coefs, cum_in_ring, cum_out_ring, inflow_ring)
    ci, co, diff = out
    return ci[:E], co[:E], diff[:E]
