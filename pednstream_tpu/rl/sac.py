"""Soft Actor-Critic in JAX/Flax/Optax.

Parity with the reference SACAgent (rl/agents/SAC_copy.py:313-482):
twin Q critics, tanh-squashed Gaussian actor over a frame-stacked
observation window (StackedEncoder, :62-76), automatic entropy tuning
via log_alpha (:399-420), soft target updates (:399-403), delta actions
scaled by max_delta (:362-378).
"""

import pickle
from functools import partial
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .networks import SACActor, SACCritic
from .rl_utils import ReplayBuffer


class SACAgent:
    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        stack_size: int = 4,
        hidden_dim: int = 64,
        actor_lr: float = 3e-4,
        critic_lr: float = 3e-4,
        alpha_lr: float = 3e-4,
        gamma: float = 0.99,
        tau: float = 0.005,
        max_delta: float = 2.5,
        buffer_capacity: int = 100_000,
        batch_size: int = 64,
        action_low: Optional[np.ndarray] = None,
        action_high: Optional[np.ndarray] = None,
        seed: int = 0,
        is_separator: bool = False,
    ):
        self.is_separator = is_separator
        # gate delta anchoring, mirroring PPOAgent: 'current' =
        # reference semantics (delta from current width — an integrator
        # that drifts gates shut under an imperfect policy); 'open' =
        # absolute target full-open + offset.  Travels with the
        # checkpoint so eval matches training.
        self.gate_anchor = "current"
        self.obs_dim = obs_dim
        self.act_dim = act_dim
        self.stack_size = stack_size
        self.gamma = gamma
        self.tau = tau
        self.max_delta = max_delta
        self.batch_size = batch_size
        self.action_low = None if action_low is None else np.asarray(action_low)
        self.action_high = None if action_high is None else np.asarray(action_high)
        self.target_entropy = -float(act_dim)
        self._key = jax.random.PRNGKey(seed)
        self._episode = 0

        self.actor = SACActor(act_dim, hidden_dim)
        self.critic = SACCritic(hidden_dim)
        k1, k2, self._key = jax.random.split(self._key, 3)
        dummy_obs = jnp.zeros((stack_size, obs_dim))
        dummy_act = jnp.zeros((act_dim,))
        self.actor_params = self.actor.init(k1, dummy_obs)
        self.critic_params = self.critic.init(k2, dummy_obs, dummy_act)
        self.target_critic_params = self.critic_params
        self.log_alpha = jnp.zeros(())

        self.actor_tx = optax.adam(actor_lr)
        self.critic_tx = optax.adam(critic_lr)
        self.alpha_tx = optax.adam(alpha_lr)
        self.actor_opt = self.actor_tx.init(self.actor_params)
        self.critic_opt = self.critic_tx.init(self.critic_params)
        self.alpha_opt = self.alpha_tx.init(self.log_alpha)

        self.buffer = ReplayBuffer(buffer_capacity)
        self._obs_stack = None
        self._jit_update = jax.jit(self._update_step)
        self._jit_sample = jax.jit(
            lambda p, o, k: self.actor.sample(p, o, k)
        )

    # -- frame stacking ------------------------------------------------------

    def reset_hidden(self):
        self._obs_stack = None

    def _stack(self, obs: np.ndarray) -> np.ndarray:
        obs = np.asarray(obs, np.float32)
        if self._obs_stack is None:
            self._obs_stack = np.tile(obs[None], (self.stack_size, 1))
        else:
            self._obs_stack = np.roll(self._obs_stack, -1, axis=0)
            self._obs_stack[-1] = obs
        return self._obs_stack.copy()

    # -- acting ------------------------------------------------------------------

    def peek_stack(self, obs: np.ndarray) -> np.ndarray:
        """The stack as it WILL look once ``obs`` is pushed, without
        mutating state — used to store the true next-state stack for a
        transition while the actual push happens at the next
        ``take_action``."""
        obs = np.asarray(obs, np.float32)
        if self._obs_stack is None:
            return np.tile(obs[None], (self.stack_size, 1))
        s = np.roll(self._obs_stack, -1, axis=0)
        s[-1] = obs
        return s

    def take_action(self, obs, explore: bool = True):
        stacked = self._stack(obs)
        if explore:
            self._key, sub = jax.random.split(self._key)
            a, _ = self._jit_sample(self.actor_params, jnp.asarray(stacked), sub)
        else:
            mu, _ = self.actor.apply(self.actor_params, jnp.asarray(stacked))
            a = jnp.tanh(mu)
        return np.asarray(a * self.max_delta, dtype=np.float32)

    def absolute_action(self, obs, delta):
        obs = np.asarray(obs, np.float32)
        # separator obs is 4 flows per separator, so the stacked per-link
        # reshape would anchor at a FLOW value; anchor at the width
        # midpoint instead (see PPOAgent.absolute_action)
        if self.is_separator and self.action_low is not None:
            current = (np.asarray(self.action_low)
                       + np.asarray(self.action_high)) / 2
        elif self.gate_anchor == "open" and self.action_high is not None:
            current = np.asarray(self.action_high, np.float32)
        else:
            current = obs.reshape(self.act_dim, -1)[:, -1] \
                if obs.size % self.act_dim == 0 else obs[-self.act_dim:]
        absolute = current + np.asarray(delta)
        if self.action_low is not None:
            absolute = np.clip(absolute, self.action_low, self.action_high)
        return absolute.astype(np.float32)

    def store_transition(self, stacked_obs, action, reward, next_stacked_obs, done):
        self.buffer.add(stacked_obs, action, reward, next_stacked_obs, done)

    @property
    def last_stack(self):
        return None if self._obs_stack is None else self._obs_stack.copy()

    # -- update -----------------------------------------------------------------

    def _update_step(self, actor_params, critic_params, target_params, log_alpha,
                     actor_opt, critic_opt, alpha_opt, batch, key):
        s, a, r, ns, d = batch
        k1, k2 = jax.random.split(key)
        alpha = jnp.exp(log_alpha)

        # critic target (SAC_copy.py:382-398)
        na, nlogp = jax.vmap(lambda o, k: self.actor.sample(actor_params, o, k))(
            ns, jax.random.split(k1, s.shape[0])
        )
        q1t, q2t = jax.vmap(lambda o, act: self.critic.apply(target_params, o, act))(ns, na)
        target_q = r + self.gamma * (1 - d) * (jnp.minimum(q1t, q2t) - alpha * nlogp)

        def critic_loss(p):
            q1, q2 = jax.vmap(lambda o, act: self.critic.apply(p, o, act))(s, a)
            return ((q1 - target_q) ** 2 + (q2 - target_q) ** 2).mean()

        c_loss, c_grads = jax.value_and_grad(critic_loss)(critic_params)
        c_up, critic_opt = self.critic_tx.update(c_grads, critic_opt)
        critic_params = optax.apply_updates(critic_params, c_up)

        def actor_loss(p):
            aa, logp = jax.vmap(lambda o, k: self.actor.sample(p, o, k))(
                s, jax.random.split(k2, s.shape[0])
            )
            q1, q2 = jax.vmap(lambda o, act: self.critic.apply(critic_params, o, act))(s, aa)
            return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

        (a_loss, logp), a_grads = jax.value_and_grad(actor_loss, has_aux=True)(actor_params)
        a_up, actor_opt = self.actor_tx.update(a_grads, actor_opt)
        actor_params = optax.apply_updates(actor_params, a_up)

        def alpha_loss(la):
            return (-jnp.exp(la) * (logp + self.target_entropy)).mean()

        al_loss, al_grad = jax.value_and_grad(alpha_loss)(log_alpha)
        al_up, alpha_opt = self.alpha_tx.update(al_grad, alpha_opt)
        log_alpha = optax.apply_updates(log_alpha, al_up)

        # soft target update (SAC_copy.py:399-403)
        target_params = jax.tree_util.tree_map(
            lambda t, s_: (1 - self.tau) * t + self.tau * s_, target_params, critic_params
        )
        return (actor_params, critic_params, target_params, log_alpha,
                actor_opt, critic_opt, alpha_opt, a_loss, c_loss)

    def update(self) -> Dict[str, float]:
        if self.buffer.size() < self.batch_size:
            return {}
        s, a, r, ns, d = self.buffer.sample(self.batch_size)
        self._key, sub = jax.random.split(self._key)
        batch = (jnp.asarray(s), jnp.asarray(a / max(self.max_delta, 1e-6)),
                 jnp.asarray(r, jnp.float32), jnp.asarray(ns), jnp.asarray(d, jnp.float32))
        (self.actor_params, self.critic_params, self.target_critic_params,
         self.log_alpha, self.actor_opt, self.critic_opt, self.alpha_opt,
         a_loss, c_loss) = self._jit_update(
            self.actor_params, self.critic_params, self.target_critic_params,
            self.log_alpha, self.actor_opt, self.critic_opt, self.alpha_opt,
            batch, sub,
        )
        return {"actor_loss": float(a_loss), "critic_loss": float(c_loss),
                "alpha": float(jnp.exp(self.log_alpha))}

    # -- persistence ---------------------------------------------------------------

    def get_config(self) -> dict:
        return {"obs_dim": self.obs_dim, "act_dim": self.act_dim,
                "stack_size": self.stack_size, "gamma": self.gamma,
                "tau": self.tau, "max_delta": self.max_delta,
                "gate_anchor": self.gate_anchor, "algo": "sac"}

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump({
                "config": self.get_config(),
                "actor": jax.device_get(self.actor_params),
                "critic": jax.device_get(self.critic_params),
                "target_critic": jax.device_get(self.target_critic_params),
                "log_alpha": float(self.log_alpha),
            }, f)

    def load(self, path: str):
        with open(path, "rb") as f:
            data = pickle.load(f)
        self.actor_params = jax.device_put(data["actor"])
        self.critic_params = jax.device_put(data["critic"])
        self.target_critic_params = jax.device_put(data["target_critic"])
        self.log_alpha = jnp.asarray(data["log_alpha"])
        cfg = data.get("config", {})
        self.gate_anchor = cfg.get("gate_anchor", self.gate_anchor)
        # action scaling and frame-stacking are part of the policy's
        # semantics, not the caller's choice: a checkpoint trained with
        # max_delta=4.0 must act with 4.0 at eval time (the actor outputs
        # tanh-normalized deltas that load() must rescale identically)
        self.max_delta = cfg.get("max_delta", self.max_delta)
        self.stack_size = cfg.get("stack_size", self.stack_size)
