"""RLlib adapter contract smoke — against a vendored API stub.

ray[rllib] is not installable in this image, so the adapter's LIVE path
(reference rl/train_ppo_rllib.py:23-80) cannot execute here; that gap is
recorded in docs/INVENTORY.md.  What CAN be pinned without ray is the
adapter's side of the contract: which ray entry points it calls and
with what arguments.  This test injects a minimal stub of the public
RLlib surface the adapter imports (ParallelPettingZooEnv, PPOConfig,
tune.register_env) and asserts:

  * make_rllib_env hands the PettingZoo env to ParallelPettingZooEnv;
  * rllib_ppo_config registers the env factory under "pednet_rllib",
    builds ONE policy per live agent using the env's real per-agent
    spaces, and maps agent_id -> policy_id identically (the reference's
    independent-learner setup, train_ppo_rllib.py:36-64);
  * the registered factory is self-contained (calling it builds a
    working wrapped env).

If a future image ships ray, the stub steps aside automatically.
"""

import sys
import types

import numpy as np
import pytest


def _install_ray_stub(monkeypatch):
    calls = {"register": {}, "ppo_cfg": []}

    class ParallelPettingZooEnv:
        def __init__(self, env):
            self.par_env = env

    class PPOConfig:
        def __init__(self):
            self.kw = {}

        def environment(self, name):
            self.kw["env"] = name
            return self

        def env_runners(self, num_env_runners):
            self.kw["num_env_runners"] = num_env_runners
            return self

        def multi_agent(self, policies, policy_mapping_fn):
            self.kw["policies"] = policies
            self.kw["policy_mapping_fn"] = policy_mapping_fn
            return self

    ray = types.ModuleType("ray")
    tune = types.ModuleType("ray.tune")
    tune.register_env = lambda name, factory: calls["register"].update(
        {name: factory})
    rllib = types.ModuleType("ray.rllib")
    env_mod = types.ModuleType("ray.rllib.env")
    wrappers = types.ModuleType("ray.rllib.env.wrappers")
    pz = types.ModuleType("ray.rllib.env.wrappers.pettingzoo_env")
    pz.ParallelPettingZooEnv = ParallelPettingZooEnv
    algos = types.ModuleType("ray.rllib.algorithms")
    ppo_mod = types.ModuleType("ray.rllib.algorithms.ppo")
    ppo_mod.PPOConfig = PPOConfig
    ray.tune = tune
    for name, mod in {
        "ray": ray, "ray.tune": tune, "ray.rllib": rllib,
        "ray.rllib.env": env_mod, "ray.rllib.env.wrappers": wrappers,
        "ray.rllib.env.wrappers.pettingzoo_env": pz,
        "ray.rllib.algorithms": algos, "ray.rllib.algorithms.ppo": ppo_mod,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return calls, ParallelPettingZooEnv


@pytest.mark.skipif("ray" in sys.modules and hasattr(sys.modules["ray"], "__file__"),
                    reason="real ray present; run the live path instead")
def test_rllib_adapter_contract_with_stub(monkeypatch):
    calls, PPZEnv = _install_ray_stub(monkeypatch)

    from pednstream_tpu.env import PedNetParallelEnv
    from pednstream_tpu.rl.adapters import make_rllib_env, rllib_ppo_config

    wrapped = make_rllib_env("butterfly_scC", seed=0, action_gap=15)
    assert isinstance(wrapped, PPZEnv)
    assert isinstance(wrapped.par_env, PedNetParallelEnv)

    cfg = rllib_ppo_config("butterfly_scC", num_workers=3, seed=0,
                           action_gap=15)
    assert cfg.kw["env"] == "pednet_rllib"
    assert cfg.kw["num_env_runners"] == 3

    probe = PedNetParallelEnv("butterfly_scC", seed=0, action_gap=15)
    assert set(cfg.kw["policies"]) == set(probe.possible_agents)
    for aid, (cls, obs_sp, act_sp, overrides) in cfg.kw["policies"].items():
        assert cls is None and overrides == {}
        assert obs_sp.shape == probe.observation_space(aid).shape
        assert act_sp.shape == probe.action_space(aid).shape
    # independent learners: agent_id IS the policy id
    aid = probe.possible_agents[0]
    assert cfg.kw["policy_mapping_fn"](aid) == aid

    # the registered factory is self-contained and produces a live env
    factory = calls["register"]["pednet_rllib"]
    env2 = factory({})
    assert isinstance(env2, PPZEnv)
    obs, _ = env2.par_env.reset(seed=1)
    acts = {a: np.zeros(env2.par_env.action_space(a).shape, np.float32)
            for a in env2.par_env.agents}
    obs, rew, term, trunc, info = env2.par_env.step(acts)
    assert set(rew) == set(probe.possible_agents)
