"""The zoo pipeline's --mesh flag reaches both trainers: train_ppo and
train_sac_batched shard their env replicas over every visible device
(the 8-device virtual CPU mesh from conftest) and still export loadable
checkpoints through the validation gate."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import train_zoo  # noqa: E402


@pytest.mark.xslow  # end-to-end sharded training run, ~1 min on this host
def test_train_zoo_mesh_ppo(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(train_zoo, "ART", str(tmp_path))
    out = train_zoo.train_ppo("butterfly_scC", action_gap=15, iterations=2,
                              num_envs=16, rollout_len=2, use_mesh=True)
    captured = capsys.readouterr()
    n = len(jax.devices())
    assert n == 8
    assert f"training sharded over {n} devices" in captured.out
    assert os.path.isdir(out)
    assert any(f.endswith(".pkl") for f in os.listdir(out))


@pytest.mark.xslow  # end-to-end sharded SAC run, ~3-5 min on this host
def test_train_zoo_mesh_sac(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(train_zoo, "ART", str(tmp_path))
    out = train_zoo.train_sac_batched("butterfly_scC", action_gap=15,
                                      iterations=2, num_envs=16,
                                      use_mesh=True)
    captured = capsys.readouterr()
    assert "SAC training sharded over 8 devices" in captured.out
    assert os.path.isdir(out)
