"""Shipped zoo checkpoints stay loadable and sane.

Every artifacts/zoo/<prefix>_agents_<dataset> dir must load through the
eval harness (build_agents + load_all_agents, the reference's
checkpoint contract rl_utils.py:499-763) and produce finite actions on
a reset observation — pinning the artifact format to the code so a
trainer/export change that breaks the zoo fails here, not at eval time.
"""

import json
import os

import numpy as np
import pytest

ZOO = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "zoo")


def _entries():
    if not os.path.isdir(ZOO):
        return []
    out = []
    for d in sorted(os.listdir(ZOO)):
        if d.endswith(".candidate") or "_agents_" not in d:
            continue
        prefix, dataset = d.split("_agents_", 1)
        algo = "sac" if prefix == "sac" else "ppo"
        out.append((d, dataset, algo))
    return out


@pytest.mark.slow
@pytest.mark.parametrize("dirname,dataset,algo", _entries())
def test_zoo_checkpoint_loads_and_acts(dirname, dataset, algo):
    from pednstream_tpu.env import PedNetParallelEnv
    from pednstream_tpu.rl.rl_utils import RunningNormalizeWrapper, load_all_agents
    from pednstream_tpu.rl.train import build_agents

    path = os.path.join(ZOO, dirname)
    cfg = json.load(open(os.path.join(path, "config.json")))
    # two config schemas: save_all_agents writes {"agents": ...};
    # BatchedPPOTrainer zoo exports write the trainer config flat
    assert cfg.get("agents") or cfg.get("net_type"), dirname

    env = PedNetParallelEnv(dataset, obs_mode="option2", action_gap=15, seed=0)
    wrapped = RunningNormalizeWrapper(env)
    agents = build_agents(wrapped, algo=algo)
    if cfg.get("agents"):
        assert set(agents) == set(cfg["agents"]), (dirname, set(agents))
    for aid in agents:
        assert os.path.exists(os.path.join(path, f"{aid}.pkl")), (dirname, aid)
    load_all_agents(agents, path, env=wrapped)

    obs, _ = wrapped.reset()
    for aid, agent in agents.items():
        if hasattr(agent, "reset_hidden"):
            agent.reset_hidden()
        delta = agent.take_action(obs[aid], explore=False)
        act = agent.absolute_action(obs[aid], delta)
        assert np.all(np.isfinite(act)), (dirname, aid)
        space = wrapped.action_space(aid)
        assert np.all(act >= space.low - 1e-5), (dirname, aid)
        assert np.all(act <= space.high + 1e-5), (dirname, aid)
