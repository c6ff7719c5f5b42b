"""On-device domain randomization for batched training.

The reference randomizes per episode on the host (env_loader.py:160-424:
link capacity/speed incidents on ~20% of corridors, randomized demand
levels, randomized OD flow weights).  For batched TPU training those
perturbations must ride in a vmappable pytree: this module draws a
randomized :class:`EngineParams` per replica with the same perturbation
distributions (OD-node-set randomization changes topology and stays a
host-side rebuild; demand randomization perturbs levels rather than
re-drawing Poisson curves).
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from .state import EngineParams


def randomize_engine_params(scn, key: jax.Array) -> EngineParams:
    """One randomized EngineParams draw (same distributions as
    env_loader.py:363-424 for link incidents, :183-259 for demand/OD
    levels)."""
    ep = jax.tree_util.tree_map(jnp.asarray, scn.engine_params)
    E = scn.n_links
    nc = E // 2
    k_sel, k_cap, k_capf, k_spd, k_spdf, k_dem, k_od = jax.random.split(key, 7)

    # ~20% of corridors get an incident (both directions identically)
    corridor_hit = jax.random.uniform(k_sel, (nc,)) < 0.2
    hit = jnp.repeat(corridor_hit, 2)

    # capacity change with p=0.5: factor U(0.6, 1.2) on k_critical/k_jam
    cap_on = jnp.repeat(jax.random.uniform(k_cap, (nc,)) < 0.5, 2) & hit
    cap_f = jnp.repeat(jax.random.uniform(k_capf, (nc,), minval=0.6, maxval=1.2), 2)
    k_crit = jnp.where(cap_on, jnp.maximum(0.5, ep.k_critical * cap_f), ep.k_critical)
    k_jam = jnp.where(cap_on, jnp.maximum(k_crit * 2.0, ep.k_jam * cap_f), ep.k_jam)

    # speed reduction with p=0.5: factor U(0.6, 0.9)
    spd_on = jnp.repeat(jax.random.uniform(k_spd, (nc,)) < 0.5, 2) & hit
    spd_f = jnp.repeat(jax.random.uniform(k_spdf, (nc,), minval=0.6, maxval=0.9), 2)
    ffs = jnp.where(spd_on, ep.free_flow_speed * spd_f, ep.free_flow_speed)

    # demand randomization: the reference REPLACES each origin's demand
    # with fresh light-level curves — base_lambda ~ U(2, 10), peak_lambda
    # ~ U(10, 30) (env_loader.py:185-218) — independent of the scenario's
    # nominal levels (butterfly's nominal sudden-demand peaks at 90).  The
    # in-vmap analog rescales each origin's precomputed curve so its mean
    # rate lands in the same U(2, 10)..U(10, 30) band, preserving the
    # temporal shape.  (Scaling by the nominal level instead — an earlier
    # version — made randomized worlds far MORE jammed than the
    # reference's, drowning the RL signal.)
    T = ep.demand.shape[1]
    nom_mean = ep.demand.sum(axis=1) / T  # per-node mean rate
    target_mean = jax.random.uniform(k_dem, (scn.n_nodes,), minval=4.0,
                                     maxval=18.0)  # mid base..peak band
    dem_scale = jnp.where(nom_mean > 0, target_mean / jnp.maximum(nom_mean, 1e-6), 1.0)
    demand = ep.demand * dem_scale[:, None]

    # OD flow weights: U(1, 10) per pair (env_loader.py:224-259)
    if ep.od_table.shape[0] > 0:
        w = jax.random.uniform(k_od, (ep.od_table.shape[0],), minval=1.0, maxval=10.0)
        od_table = jnp.broadcast_to(w[:, None], ep.od_table.shape)
    else:
        od_table = ep.od_table

    # derived constants must track the perturbed physics: a replica with a
    # 0.6x speed incident gets the slower free-flow travel time and the
    # longer shockwave lookback, keeping speed/travel_time/reward mutually
    # consistent within the replica (scenario.derive_link_constants)
    from .scenario import derive_link_constants

    derived = derive_link_constants(
        ep.length, ffs, k_crit, k_jam, scn.unit_time, xp=jnp
    )
    return ep.replace(
        k_critical=k_crit.astype(ep.k_critical.dtype),
        k_jam=k_jam.astype(ep.k_jam.dtype),
        free_flow_speed=ffs.astype(ep.free_flow_speed.dtype),
        demand=demand.astype(ep.demand.dtype),
        od_table=od_table.astype(ep.od_table.dtype),
        **derived,
    )


def randomize_engine_params_batched(scn, key: jax.Array, batch: int) -> EngineParams:
    """B independent randomized EngineParams (leading batch axis)."""
    return jax.vmap(lambda k: randomize_engine_params(scn, k))(
        jax.random.split(key, batch)
    )
