"""Adapter tests: SB3 concat wrapper works with gymnasium alone; RLlib
pieces skip cleanly when ray is absent (mirrors rl/test_rllib_compat.py's
staged checks where the dependency allows)."""

import numpy as np
import pytest


def test_sb3_wrapper_spaces_and_step():
    from pednstream_tpu.rl.adapters import PedNetSB3Wrapper

    env = PedNetSB3Wrapper("butterfly_scC", obs_mode="option2", seed=3,
                           action_gap=20)
    obs, info = env.reset(seed=3)
    assert obs.shape == env.observation_space.shape
    action = env.action_space.sample()
    obs2, reward, term, trunc, info = env.step(action)
    assert obs2.shape == env.observation_space.shape
    assert isinstance(reward, float)
    assert isinstance(term, bool) and isinstance(trunc, bool)
    env.close()


def test_rllib_adapter_requires_ray():
    pytest.importorskip("ray", reason="ray not installed")
    from pednstream_tpu.rl.adapters import rllib_ppo_config

    config = rllib_ppo_config("butterfly_scC", num_workers=0, obs_mode="option2")
    algo = config.build()
    algo.stop()


def test_rllib_adapter_clean_error_without_ray():
    try:
        import ray  # noqa: F401

        pytest.skip("ray installed; error path not reachable")
    except ImportError:
        pass
    from pednstream_tpu.rl.adapters import make_rllib_env

    with pytest.raises(ImportError, match="ray"):
        make_rllib_env("butterfly_scC")
