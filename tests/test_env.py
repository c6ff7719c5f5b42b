"""RL environment tests: PettingZoo API conformance (mirrors
rl/test_pz_api.py), reset determinism as a hard assertion (the
reference's t-SNE-based test rl/test_reset_determinism.py made this a
plot; here it is an exact check), action clipping, and the vmapped
batched env."""

import numpy as np
import pytest

import jax


def _make_env(**kw):
    from pednstream_tpu.env import PedNetParallelEnv

    kw.setdefault("dataset", "butterfly_scC")
    kw.setdefault("seed", 42)
    return PedNetParallelEnv(**kw)


def test_pettingzoo_parallel_api():
    from pettingzoo.test import parallel_api_test

    env = _make_env(obs_mode="option2")
    parallel_api_test(env, num_cycles=30)


def test_reset_determinism():
    env = _make_env(obs_mode="option2", stochastic=True)
    trajs = []
    for _ in range(2):
        env.seed(123)
        obs, _ = env.reset()
        rows = [np.concatenate([o.ravel() for o in obs.values()])]
        for i in range(10):
            actions = {
                a: (env.action_space(a).low + env.action_space(a).high) / 2
                for a in env.possible_agents
            }
            obs, rewards, *_ = env.step(actions)
            rows.append(np.concatenate([o.ravel() for o in obs.values()]))
        trajs.append(np.stack(rows))
    np.testing.assert_array_equal(trajs[0], trajs[1])


def test_action_rate_clipping():
    """Gate width cannot move faster than 0.25*unit_time m/step
    (pz_pednet_env.py:84-85, builders.py:297-311)."""
    env = _make_env(obs_mode="option2", stochastic=False)
    env.reset()
    agent = "gate_2"
    links = env.spec_agents.gate_links[0]
    before = np.asarray(env._state.back_gate)[links]
    target = np.zeros(len(links), dtype=np.float32)  # slam gates shut
    env.step({agent: target})
    after = np.asarray(env._state.back_gate)[links]
    max_delta = 0.25 * env.scn.unit_time
    assert np.all(before - after <= max_delta + 1e-6)
    assert np.all(after >= 0)


def test_separator_coupling():
    """Separator width reallocates the reverse direction to keep total
    corridor width constant (link.py:462-478)."""
    from pednstream_tpu.env import PedNetParallelEnv

    env = PedNetParallelEnv("long_corridor", seed=1, stochastic=False)
    assert "sep_2_3" in env.possible_agents
    env.reset()
    fwd = env.scn.topo.link_id_to_idx[(2, 3)]
    rev = env.scn.topo.link_id_to_idx[(3, 2)]
    total = float(env.scn.topo.link_params.width[fwd])
    env.step({"sep_2_3": np.array([total - 1.5], dtype=np.float32)})
    sw = np.asarray(env._state.sep_width)
    assert abs(sw[fwd] + sw[rev] - total) < 1e-6
    bg = np.asarray(env._state.back_gate)
    assert abs(bg[fwd] - sw[fwd]) < 1e-6 and abs(bg[rev] - sw[rev]) < 1e-6


def test_batched_env_vmap():
    """Many env replicas step in lockstep through one XLA program."""
    env = _make_env(obs_mode="option1", stochastic=True)
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, obs = env.core.batch_reset(keys)
    assert np.asarray(obs["gate_2"]).shape[0] == B
    actions = {"gate_2": np.tile(
        env.spec_agents.gate_link_widths[0][None, :].astype(np.float32), (B, 1))}
    states, obs, rewards, done = env.core.batch_step(states, actions)
    assert np.asarray(states.t).shape == (B,)
    assert np.all(np.asarray(states.t) == 2)
    assert np.asarray(rewards["gate_2"]).shape == (B,)
    # different PRNG keys -> stochastic trajectories diverge across batch
    # (needs enough steps for flows to start moving through release draws)
    for _ in range(30):
        states, obs, rewards, done = env.core.batch_step(states, actions)
    dens = np.asarray(states.density)
    assert not np.allclose(dens[0], dens[1])


@pytest.mark.slow
def test_lockstep_shared_t_matches_per_replica_t():
    """batch_step's lockstep fast path (shared t closed over the vmap,
    engine.step_fn t_shared) must be numerically IDENTICAL to the
    heterogeneous per-replica-t path whenever all replicas share t —
    the invariant every batched caller in this package relies on."""
    env = _make_env(obs_mode="option2", stochastic=True)
    B = 6
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    s_fast, _ = env.core.batch_reset(keys)
    s_het, _ = env.core.batch_reset(keys)
    actions = {"gate_2": np.tile(
        env.spec_agents.gate_link_widths[0][None, :].astype(np.float32), (B, 1))}
    for _ in range(12):
        s_fast, o_fast, r_fast, d_fast = env.core.batch_step(
            s_fast, actions, lockstep=True)
        s_het, o_het, r_het, d_het = env.core.batch_step(
            s_het, actions, lockstep=False)
    np.testing.assert_array_equal(np.asarray(s_fast.t), np.asarray(s_het.t))
    np.testing.assert_allclose(
        np.asarray(s_fast.density), np.asarray(s_het.density), rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(s_fast.cum_in), np.asarray(s_het.cum_in), rtol=0, atol=0)
    for k in r_fast:
        np.testing.assert_allclose(
            np.asarray(r_fast[k]), np.asarray(r_het[k]), rtol=0, atol=0)


def test_lockstep_violation_poisons_outputs():
    """Stepping a heterogeneous-t batch through the lockstep fast path
    must fail LOUDLY (NaN obs/rewards, negative clock sentinel), not
    silently corrupt ring reads (env/core.py _poison_if_not_lockstep)."""
    env = _make_env(obs_mode="option1", stochastic=True)
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    states, _ = env.core.batch_reset(keys)
    actions = {"gate_2": np.tile(
        env.spec_agents.gate_link_widths[0][None, :].astype(np.float32), (B, 1))}
    # manually desynchronize one replica's clock
    t = np.asarray(states.t).copy()
    t[0] += 3
    states = states.replace(t=jax.numpy.asarray(t))
    states, obs, rewards, done = env.core.batch_step(states, actions)
    assert np.all(np.isnan(np.asarray(obs["gate_2"])))
    assert np.all(np.isnan(np.asarray(rewards["gate_2"])))
    assert np.all(np.asarray(states.t) < 0)
    # a well-formed batch through the same compiled fn stays clean
    states2, _ = env.core.batch_reset(keys)
    states2, obs2, r2, _ = env.core.batch_step(states2, actions)
    assert not np.any(np.isnan(np.asarray(obs2["gate_2"])))


def test_simulate_batched_matches_vmapped_simulate():
    """engine.simulate_batched (scan outside, vmap inside, shared t) ==
    vmap of the per-replica simulate scan, leaf for leaf."""
    from pednstream_tpu.engine import simulate, simulate_batched

    env = _make_env(obs_mode="option1", stochastic=True)
    scn = env.scn
    ep = scn.engine_params
    B, steps = 5, 25
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    states = jax.vmap(scn.init_state)(keys)

    out_lock = simulate_batched(scn, ep, states, steps, stochastic=True)
    out_vmap = jax.vmap(
        lambda s: simulate(scn, ep, s, steps, stochastic=True, record=False)[0]
    )(jax.vmap(scn.init_state)(keys))
    for name in ("t", "density", "cum_in", "cum_out", "num_peds", "avg_tt"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_lock, name)),
            np.asarray(getattr(out_vmap, name)), rtol=0, atol=0,
            err_msg=name)
