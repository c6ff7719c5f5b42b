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
  grid pass with a shared time-index iota, tiling [H, E] blocks through
  VMEM.

Rings are stored time-major [H, E]: the links axis rides the 128-lane
dimension (E is large, so lane padding is negligible) and the window axis
rides sublanes, so a windowed ring (H = 16..64) is not padded up to 128
lanes, and the per-step row write ``ring[t % H] = x`` touches one
contiguous row of tiles instead of one lane in every tile-column.
"""

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def diffusion_single_pass(inflow_ring, base, coefs, H: int):
    """diff_raw[e] = sum_k coefs[k,e] * inflow_ring[(base[e]-k) % H, e]
    for k in 0..3 with base[e]-k >= 0, computed in one pass.

    inflow_ring: [H, E] (time-major: H rides the sublane axis so windowed
    rings aren't padded to 128 lanes and row writes are tile-contiguous);
    base: [E] int; coefs: [4, E].
    """
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
    base_slot = jnp.mod(base, H)[None, :]
    k = jnp.mod(base_slot - h_ids, H)  # lag index of slot h: [H, E]
    valid = (k < 4) & ((base[None, :] - k) >= 0)
    # select (NOT gather: per-lane dynamic gathers serialize on TPU)
    coef = jnp.where(
        k == 0, coefs[0][None, :],
        jnp.where(k == 1, coefs[1][None, :],
                  jnp.where(k == 2, coefs[2][None, :], coefs[3][None, :])),
    )
    coef = jnp.where(valid, coef, 0.0)
    return (inflow_ring * coef).sum(axis=0)


def boundary_and_diffusion_reads(cum_in_ring, idx_ci, base, coefs, H: int):
    """The free-flow N-curve boundary AND the 4-lag diffusion term from
    ONE pass over the cumulative-inflow ring.

    The diffusion taps (get_outflow, link.py:199-214) are lagged
    *inflows*; since ``inflow[s] == cum_in[s] - cum_in[s-1]`` exactly
    (both are exact f32 integers below 2**24), the five consecutive
    cum_in values at slots ``base .. base-4`` recover all four taps —
    so the inflow ring never has to be read, halving the sending-flow
    HBM traffic.  All six masked reductions here share one input, which
    XLA multi-output-fuses into a single read of the ring.

    cum_in_ring: [H, E] time-major; idx_ci, base: [E] int; coefs: [4, E].
    Returns (cum_in_at[E], diff_raw[E]); diff_raw accumulates the taps
    left-to-right like the reference expression (link.py:210-212).
    """
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)

    sel_ci = (h_ids == jnp.mod(idx_ci, H)[None, :]) & (idx_ci[None, :] >= 0)
    base_slot = jnp.mod(base, H)[None, :]
    r = jnp.mod(base_slot - h_ids, H)  # slots base-r live at row h

    # five consecutive cum values v_k = cum_in[base - k], k = 0..4
    vs = []
    for k in range(5):
        mask = (r == k) & ((base[None, :] - k) >= 0)
        vs.append(jnp.where(mask, cum_in_ring, 0.0).sum(axis=0))
    ci = jnp.where(sel_ci, cum_in_ring, 0.0).sum(axis=0)

    # inflow[base-k] = v_k - v_{k+1} (v_{k+1} masked to 0 when base-k-1 < 0)
    diff = coefs[0] * (vs[0] - vs[1])
    for k in range(1, 4):
        diff = diff + coefs[k] * (vs[k] - vs[k + 1])
    return ci, diff


def _fused_kernel(idx_ci_ref, idx_co_ref, base_ref, coef_ref,
                  ci_ring_ref, co_ring_ref, in_ring_ref,
                  ci_out_ref, co_out_ref, diff_out_ref, *, H: int):
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)

    def onehot_read(ring, idx2):  # idx2: [1, tile]
        sel = (h_ids == jnp.mod(idx2, H)) & (idx2 >= 0)
        return jnp.where(sel, ring, 0.0).sum(axis=0, keepdims=True)

    ci_out_ref[:] = onehot_read(ci_ring_ref[:], idx_ci_ref[:])
    co_out_ref[:] = onehot_read(co_ring_ref[:], idx_co_ref[:])

    base2 = base_ref[:]  # [1, tile]
    k = jnp.mod(jnp.mod(base2, H) - h_ids, H)
    valid = (k < 4) & ((base2 - k) >= 0)
    coefs = coef_ref[:]  # [4, tile]
    coef = jnp.where(k == 0, coefs[0:1, :],
                     jnp.where(k == 1, coefs[1:2, :],
                               jnp.where(k == 2, coefs[2:3, :], coefs[3:4, :])))
    coef = jnp.where(valid, coef, 0.0)
    diff_out_ref[:] = (in_ring_ref[:] * coef).sum(axis=0, keepdims=True)


def fused_history_reads(cum_in_ring, cum_out_ring, inflow_ring,
                        idx_ci, idx_co, base, coefs, H: int,
                        tile: int = 512, interpret: bool = False):
    """All three per-step history reductions in one Pallas pass.

    Rings are time-major [H, E]; coefs is [4, E].
    Returns (cum_in_at[E], cum_out_at[E], diff_raw[E]).
    """
    E = cum_in_ring.shape[1]
    pad = (-E) % tile
    if pad:
        padr = lambda x: jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))
        cum_in_ring, cum_out_ring, inflow_ring = map(
            padr, (cum_in_ring, cum_out_ring, inflow_ring))
        idx_ci, idx_co, base = map(padr, (idx_ci, idx_co, base))
        coefs = padr(coefs)
    Ep = E + pad
    grid = (Ep // tile,)

    # scalars as [1, E] so all kernel ops stay >= 2-D (Mosaic cannot
    # reshape 1-D i1 vectors)
    idx_ci2 = idx_ci.astype(jnp.int32)[None, :]
    idx_co2 = idx_co.astype(jnp.int32)[None, :]
    base2 = base.astype(jnp.int32)[None, :]

    row = lambda: pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    ring = lambda: pl.BlockSpec((H, tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_fused_kernel, H=H),
        grid=grid,
        in_specs=[row(), row(), row(),
                  pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                  ring(), ring(), ring()],
        out_specs=(row(), row(), row()),
        out_shape=(
            jax.ShapeDtypeStruct((1, Ep), cum_in_ring.dtype),
            jax.ShapeDtypeStruct((1, Ep), cum_out_ring.dtype),
            jax.ShapeDtypeStruct((1, Ep), inflow_ring.dtype),
        ),
        interpret=interpret,
    )(idx_ci2, idx_co2, base2, coefs, cum_in_ring, cum_out_ring, inflow_ring)
    ci, co, diff = out
    return ci[0, :E], co[0, :E], diff[0, :E]
