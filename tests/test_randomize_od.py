"""In-vmap OD-node randomization (reference env_loader.py:261-359 does
topology rebuilds host-side; here candidate OD nodes open/close per
replica through EngineParams — see scenario.build_scenario
``od_candidates`` and randomize.randomize_engine_params)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pednstream_tpu.engine import simulate, simulate_batched
from pednstream_tpu.generator import NetworkEnvGenerator
from pednstream_tpu.randomize import (randomize_engine_params,
                                      randomize_engine_params_batched)


@pytest.fixture(scope="module")
def scn():
    gen = NetworkEnvGenerator()
    return gen.build_od_randomizable("butterfly_scC")


def test_superset_build_nominal_inert(scn):
    """Candidate OD nodes exist in the topology but start closed: zero
    demand rows, zero virtual receiving, zero od_table rows."""
    assert scn.od_randomizable
    assert scn.candidate_origin_mask.sum() > 0
    assert scn.candidate_dest_mask.sum() > 0
    ep = scn.engine_params
    cand = scn.candidate_origin_mask | scn.candidate_dest_mask
    nom = scn.nominal_origin_mask | scn.nominal_dest_mask
    cand_only = cand & ~nom
    assert np.asarray(ep.demand)[scn.candidate_origin_mask
                                 & ~scn.nominal_origin_mask].sum() == 0
    assert np.asarray(ep.virt_recv)[cand_only].sum() == 0
    assert np.asarray(ep.virt_recv)[nom].min() > 0
    # demand curves for candidates were generated (available to open)
    assert scn.demand_full[scn.candidate_origin_mask].sum() > 0
    pair_cand = (scn.candidate_origin_mask[scn.od_pair_origin]
                 | scn.candidate_dest_mask[scn.od_pair_dest])
    assert np.asarray(ep.od_table)[pair_cand].sum() == 0


def test_randomized_draws_open_candidates(scn):
    """Across draws, candidate nodes sometimes activate, nominal nodes
    sometimes drop, and no draw empties either side."""
    opened = dropped = 0
    for i in range(16):
        ep = randomize_engine_params(scn, jax.random.PRNGKey(i))
        vr = np.asarray(ep.virt_recv) > 0
        cand_only = ((scn.candidate_origin_mask | scn.candidate_dest_mask)
                     & ~(scn.nominal_origin_mask | scn.nominal_dest_mask))
        opened += int(vr[cand_only].any())
        # demand restricted to active origins
        dem_nodes = np.asarray(ep.demand).sum(axis=1) > 0
        assert dem_nodes.sum() > 0  # never empty
        assert (dem_nodes <= vr).all()  # injecting nodes are active
        dropped += int((~dem_nodes & scn.nominal_origin_mask).any())
    assert opened > 0
    assert dropped > 0


def test_closed_destination_absorbs_nothing(scn):
    """Zeroing a destination's virt_recv stops all exits there."""
    ep = scn.engine_params
    dest = int(np.where(scn.nominal_dest_mask)[0][0])
    vr = np.asarray(ep.virt_recv).copy()
    vr[dest] = 0.0
    ep_closed = ep.replace(virt_recv=jnp.asarray(vr))
    st = scn.init_state(jax.random.PRNGKey(0))
    fin_open, _ = simulate(scn, ep, st, 80, record=False)
    fin_closed, _ = simulate(scn, ep_closed, st, 80, record=False)
    arr_open = np.asarray(fin_open.virt_arr_cum)  # [N] per-node arrivals
    arr_closed = np.asarray(fin_closed.virt_arr_cum)
    assert arr_open[dest] > 0
    assert arr_closed[dest] == 0


@pytest.mark.slow
def test_batched_od_randomized_rollout(scn):
    B = 8
    eps = randomize_engine_params_batched(scn, jax.random.PRNGKey(3), B)
    vr = np.asarray(eps.virt_recv)
    assert len({tuple(row) for row in (vr > 0).astype(int)}) > 1, (
        "replicas should draw different OD activations")
    sts = jax.vmap(scn.init_state)(jax.random.split(jax.random.PRNGKey(4), B))
    fin = simulate_batched(scn, eps, sts, 60, stochastic=True, ep_batched=True)
    npd = np.asarray(fin.num_peds)
    assert np.isfinite(npd).all()
    err = np.abs((np.asarray(fin.cum_in) - np.asarray(fin.cum_out)) - npd)
    assert err.max() < 1e-2  # f32 mass conservation (fractional demand)


@pytest.mark.slow
def test_od_set_size_distribution_vs_reference_moves(scn):
    """Quantify the training-domain drift between the in-vmap independent
    per-node activations (nominal keep p=0.75, candidate open p=0.3) and
    the reference's sequential add/remove/swap edit moves
    (env_loader.py:261-359), so the divergence is a KNOWN quantity
    (docs/PARITY.md records the numbers).

    Compared on the ORIGIN-set-size marginal: active origins are directly
    observable from the randomized EngineParams (nonzero demand rows);
    the reference process is re-simulated move-for-move in NumPy on the
    same adjacency/controller sets."""
    rng = np.random.default_rng(0)
    adj = np.asarray(scn.topo.adj) if hasattr(scn.topo, "adj") else None
    if adj is None:
        from pednstream_tpu.generator import NetworkEnvGenerator

        adj = np.asarray(
            NetworkEnvGenerator().load_network_data("butterfly_scC")[
                "adjacency_matrix"])
    origins = sorted(np.where(scn.nominal_origin_mask)[0].tolist())
    controllers = {2}  # butterfly controller hub

    def khop2(nodes):
        nb = set()
        for n in nodes:
            nb.update(np.where(adj[n] == 1)[0].tolist())
        nb.update({m for n in list(nb)
                   for m in np.where(adj[n] == 1)[0].tolist()})
        return nb

    # --- reference edit-move process (origins part, env_loader.py:300-328)
    ref_sizes = []
    for _ in range(4000):
        new_o = list(origins)
        if rng.random() < 0.5:  # ADD (num_to_add = randint(1, 2) == 1)
            cands = [n for n in khop2(new_o)
                     if n not in new_o and n not in controllers]
            if cands:
                new_o.append(int(rng.choice(cands)))
        if len(new_o) > 1 and rng.random() < 0.5:  # REMOVE one
            new_o.pop(int(rng.integers(len(new_o))))
        # SWAP is size-preserving
        ref_sizes.append(len(new_o))
    ref_mean = float(np.mean(ref_sizes))

    # --- our in-vmap activation marginal, via the REAL code path
    eps = randomize_engine_params_batched(scn, jax.random.PRNGKey(7), 512)
    ours = (np.asarray(eps.demand).sum(axis=2) > 0).sum(axis=1)
    our_mean = float(ours.mean())

    # with candidate-open p = 0.5/n_candidates the means track closely
    # (measured: ours 2.08 vs reference 2.00 on butterfly_scC, docs/
    # PARITY.md); the residual drift is the independent-activation tail
    # (P[|O| >= 4] ~ 4% vs 0 for the reference's single-ADD move)
    assert abs(our_mean - ref_mean) <= 0.35, (
        f"origin-set-size drift too large: ours {our_mean:.2f} "
        f"(dist {np.bincount(ours).tolist()}), reference {ref_mean:.2f}")
    assert ours.min() >= 1  # empty-side fallback engaged
