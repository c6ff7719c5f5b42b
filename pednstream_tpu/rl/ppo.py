"""Independent-learner PPO in JAX/Flax/Optax.

Algorithmic parity with the reference PPOAgent (rl/agents/PPO_backup.py):
delta-action Gaussian policies clamped to ±max_delta (:1238-1245),
GAE + advantage normalization + clipped surrogate + approximate-KL early
stop + gradient clipping (:1247-1389), exploration-noise linear decay
(:1106-1181), selectable network families (attention default, LSTM,
stacked-conv; :25-760), checkpoint save/load (:1399-1483).

The whole per-epoch update — sequence re-forward through the recurrent
torso with lax.scan, surrogate loss, grads, optimizer step — is one
jitted function.
"""

import pickle
from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from . import networks as nets
from .rl_utils import compute_gae


def _gaussian_logprob(mu, log_std, action):
    std = jnp.exp(log_std)
    return (-0.5 * ((action - mu) / std) ** 2 - log_std - 0.5 * jnp.log(2 * jnp.pi)).sum(-1)


class PPOAgent:
    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        features_per_link: Optional[int] = None,
        net_type: str = "attention",
        hidden_dim: int = 64,
        actor_lr: float = 9e-5,
        critic_lr: float = 2e-4,
        gamma: float = 0.99,
        lmbda: float = 0.96,
        eps_clip: float = 0.2,
        epochs: int = 10,
        kl_target: float = 0.02,
        max_grad_norm: float = 0.5,
        max_delta: float = 2.5,
        action_low: Optional[np.ndarray] = None,
        action_high: Optional[np.ndarray] = None,
        noise_scale: float = 0.3,
        noise_decay_steps: int = 200,
        stack_size: int = 1,
        adj: Optional[np.ndarray] = None,
        seed: int = 0,
    ):
        self.obs_dim = obs_dim
        self.act_dim = act_dim
        self.features_per_link = features_per_link
        self.net_type = net_type
        self.hidden_dim = hidden_dim
        self.gamma = gamma
        self.lmbda = lmbda
        self.eps_clip = eps_clip
        self.epochs = epochs
        self.kl_target = kl_target
        self.max_delta = max_delta
        self.action_low = None if action_low is None else np.asarray(action_low)
        self.action_high = None if action_high is None else np.asarray(action_high)
        self.noise_scale = noise_scale
        self.noise_decay_steps = noise_decay_steps
        self.stack_size = stack_size
        # gate delta anchoring: 'current' = reference semantics
        # (PPO_backup.py:848-851, delta from the current width — an
        # integrator); 'open' = absolute target full-open + offset
        # (integrator-free; what BatchedPPOTrainer(gate_anchor='open')
        # trains).  Restored from the checkpoint on load so eval always
        # matches training.
        self.gate_anchor = "current"
        self._episode = 0
        self._key = jax.random.PRNGKey(seed)

        self._build_networks(adj)

        k1, k2, self._key = jax.random.split(self._key, 3)
        dummy = self._shape_obs(np.zeros(self._raw_obs_shape(), np.float32))
        carry = self._initial_carry(k1)
        self.actor_params = self.actor.init(k1, dummy, carry)
        self.critic_params = self.critic.init(k2, dummy, carry)

        self.actor_tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm), optax.adam(actor_lr)
        )
        self.critic_tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm), optax.adam(critic_lr)
        )
        self.actor_opt = self.actor_tx.init(self.actor_params)
        self.critic_opt = self.critic_tx.init(self.critic_params)

        self.reset_hidden()
        self._buffer = []
        self._jit_forward = jax.jit(self._forward)
        self._jit_epoch = jax.jit(self._epoch_update)
        self._jit_seq = jax.jit(self._sequence_forward)

    def _build_networks(self, adj=None):
        """Instantiate the actor/critic modules for self.net_type.

        Factored out of __init__ so load() can swap the architecture to
        the checkpoint's recorded net_type (a checkpoint's params are
        meaningless applied to a different module tree)."""
        net_type, hidden_dim = self.net_type, self.hidden_dim
        if net_type == "attention":
            assert self.features_per_link, "attention nets need features_per_link"
            self.num_links = self.obs_dim // self.features_per_link
            self.actor = nets.AttentionPolicy(self.num_links, hidden_dim)
            self.critic = nets.AttentionValue(self.num_links, hidden_dim)
        elif net_type == "gat":
            assert self.features_per_link, "gat nets need features_per_link"
            self.num_links = self.obs_dim // self.features_per_link
            self.actor = nets.GATLSTMPolicy(self.num_links, hidden_dim)
            self.critic = nets.GATLSTMValue(self.num_links, hidden_dim)
        elif net_type == "udlstm":
            assert self.features_per_link, "udlstm nets need features_per_link"
            self.num_links = self.obs_dim // self.features_per_link
            self.actor = nets.UDLSTMPolicy(self.num_links, hidden_dim)
            self.critic = nets.UDLSTMValue(self.num_links, hidden_dim)
        elif net_type == "lstm":
            self.num_links = None
            self.actor = nets.LSTMPolicy(self.act_dim, hidden_dim)
            self.critic = nets.LSTMValue(hidden_dim)
        elif net_type == "stacked":
            self.num_links = None
            self.actor = nets.StackedPolicy(self.act_dim, hidden_dim)
            self.critic = nets.StackedValue(hidden_dim)
        elif net_type == "mlp":
            self.num_links = None
            self.actor = nets.MLPPolicy(self.act_dim)
            self.critic = nets.MLPValue()
        else:
            raise ValueError(f"unknown net_type {net_type}")

        # controlled-links adjacency for the GAT family: by default the
        # links a gater controls all leave one node, so fully-connected
        # is the faithful graph; callers may pass a sparser mask (e.g.
        # shared-endpoint adjacency from env.agents.controlled_links_adjacency)
        self.adj = None
        if net_type == "gat":
            self.adj = (jnp.asarray(adj, jnp.float32) if adj is not None
                        else jnp.ones((self.num_links, self.num_links),
                                      jnp.float32))

    # -- shapes ----------------------------------------------------------------

    def _raw_obs_shape(self):
        if self.net_type == "stacked":
            return (self.stack_size, self.obs_dim)
        return (self.obs_dim,)

    def _shape_obs(self, obs):
        obs = jnp.asarray(obs, jnp.float32)
        if self.net_type in ("attention", "gat", "udlstm"):
            return obs.reshape(self.num_links, self.features_per_link)
        return obs

    def _initial_carry(self, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        if self.net_type in ("attention", "gat", "udlstm"):
            return nets.AttentionTorso.initial_carry(key, self.num_links, self.hidden_dim)
        if self.net_type == "lstm":
            return nets.LSTMPolicy.initial_carry(key, self.hidden_dim)
        return jnp.zeros(())  # unused for stacked/mlp

    def reset_hidden(self):
        self._actor_carry = self._initial_carry()
        self._critic_carry = self._initial_carry()

    # -- acting ------------------------------------------------------------------

    def _forward(self, actor_params, obs, carry):
        if self.net_type == "gat":
            return self.actor.apply(actor_params, obs, carry, self.adj)
        return self.actor.apply(actor_params, obs, carry)

    def take_action(self, obs, explore: bool = True):
        """Sample a delta action clamped to ±max_delta
        (PPO_backup.py:1238-1245); exploration noise decays linearly over
        episodes (:1106-1181)."""
        o = self._shape_obs(obs)
        mu, log_std, self._actor_carry = self._jit_forward(
            self.actor_params, o, self._actor_carry
        )
        if explore:
            self._key, sub = jax.random.split(self._key)
            decay = max(0.0, 1.0 - self._episode / self.noise_decay_steps)
            std = jnp.exp(log_std) + self.noise_scale * decay
            delta = mu + std * jax.random.normal(sub, mu.shape)
        else:
            delta = mu
        delta = jnp.clip(delta, -self.max_delta, self.max_delta)
        return np.asarray(delta, dtype=np.float32)

    def absolute_action(self, obs, delta):
        """delta -> absolute width using the gate-width feature (the last
        feature per link block; PPO_backup.py:848-851).

        Separator agents (no per-link features) anchor deltas at the
        width MIDPOINT instead: the reference expression would add the
        delta to the last flow observation (its separator obs is 4 flows,
        not widths — an untested path there, no separator checkpoints
        ship), which saturates the clip almost immediately.  The batched
        trainer uses the same midpoint rule, so train and eval agree."""
        obs = np.asarray(obs, np.float32)
        if self.features_per_link and self.gate_anchor == "open":
            current = np.asarray(self.action_high)
        elif self.features_per_link:
            current = obs.reshape(self.act_dim, -1)[:, -1]
        elif self.action_low is not None:
            current = (np.asarray(self.action_low)
                       + np.asarray(self.action_high)) / 2
        else:
            current = obs[-self.act_dim:]
        absolute = current + np.asarray(delta)
        if self.action_low is not None:
            absolute = np.clip(absolute, self.action_low, self.action_high)
        return absolute.astype(np.float32)

    # -- experience ----------------------------------------------------------------

    def store_transition(self, obs, action, reward, done):
        self._buffer.append((np.asarray(obs, np.float32),
                             np.asarray(action, np.float32), float(reward), bool(done)))

    # -- update ---------------------------------------------------------------------

    def _sequence_forward(self, actor_params, critic_params, obs_seq):
        """Re-forward the episode through the recurrent torso with scan."""
        carry0 = (self._initial_carry(), self._initial_carry())

        def body(carries, o):
            ac, cc = carries
            if self.net_type == "gat":
                mu, log_std, ac = self.actor.apply(actor_params, o, ac, self.adj)
                v, cc = self.critic.apply(critic_params, o, cc, self.adj)
            else:
                mu, log_std, ac = self.actor.apply(actor_params, o, ac)
                v, cc = self.critic.apply(critic_params, o, cc)
            return (ac, cc), (mu, log_std, v)

        _, (mu, log_std, v) = jax.lax.scan(body, carry0, obs_seq)
        return mu, log_std, v

    def _epoch_update(self, actor_params, critic_params, actor_opt, critic_opt,
                      obs_seq, act_seq, adv, returns, old_logp):
        def actor_loss(p):
            mu, log_std, _ = self._sequence_forward(p, critic_params, obs_seq)
            logp = _gaussian_logprob(mu, log_std, act_seq)
            ratio = jnp.exp(logp - old_logp)
            s1 = ratio * adv
            s2 = jnp.clip(ratio, 1 - self.eps_clip, 1 + self.eps_clip) * adv
            kl = jnp.mean(old_logp - logp)
            return -jnp.mean(jnp.minimum(s1, s2)), kl

        def critic_loss(p):
            _, _, v = self._sequence_forward(actor_params, p, obs_seq)
            return jnp.mean((v - returns) ** 2)

        (a_loss, kl), a_grads = jax.value_and_grad(actor_loss, has_aux=True)(actor_params)
        c_loss, c_grads = jax.value_and_grad(critic_loss)(critic_params)
        a_updates, actor_opt = self.actor_tx.update(a_grads, actor_opt)
        actor_params = optax.apply_updates(actor_params, a_updates)
        c_updates, critic_opt = self.critic_tx.update(c_grads, critic_opt)
        critic_params = optax.apply_updates(critic_params, c_updates)
        return actor_params, critic_params, actor_opt, critic_opt, a_loss, c_loss, kl

    def update(self) -> Dict[str, float]:
        """One PPO update over the stored episode
        (PPO_backup.py:1247-1389)."""
        if not self._buffer:
            return {}
        obs = np.stack([b[0] for b in self._buffer])
        acts = np.stack([b[1] for b in self._buffer])
        rews = np.array([b[2] for b in self._buffer])
        dones = np.array([b[3] for b in self._buffer])
        self._buffer = []

        obs_seq = jax.vmap(self._shape_obs)(jnp.asarray(obs))
        mu, log_std, values = self._jit_seq(self.actor_params, self.critic_params, obs_seq)
        old_logp = _gaussian_logprob(mu, log_std, jnp.asarray(acts))
        values = np.asarray(values)
        adv, returns = compute_gae(rews, values, 0.0, dones, self.gamma, self.lmbda)
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        a_loss = c_loss = kl = 0.0
        for _ in range(self.epochs):
            (self.actor_params, self.critic_params, self.actor_opt,
             self.critic_opt, a_loss, c_loss, kl) = self._jit_epoch(
                self.actor_params, self.critic_params, self.actor_opt,
                self.critic_opt, obs_seq, jnp.asarray(acts),
                jnp.asarray(adv, jnp.float32), jnp.asarray(returns, jnp.float32),
                old_logp,
            )
            if abs(float(kl)) > self.kl_target:  # KL early stop (:1345-1350)
                break
        self._episode += 1
        return {"actor_loss": float(a_loss), "critic_loss": float(c_loss),
                "kl": float(kl)}

    # -- persistence -------------------------------------------------------------------

    def get_config(self) -> dict:
        return {
            "obs_dim": self.obs_dim, "act_dim": self.act_dim,
            "features_per_link": self.features_per_link,
            "net_type": self.net_type, "hidden_dim": self.hidden_dim,
            "gamma": self.gamma, "lmbda": self.lmbda,
            "eps_clip": self.eps_clip, "epochs": self.epochs,
            "kl_target": self.kl_target, "max_delta": self.max_delta,
            "gate_anchor": self.gate_anchor,
        }

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "config": self.get_config(),
                    "actor": jax.device_get(self.actor_params),
                    "critic": jax.device_get(self.critic_params),
                    "episode": self._episode,
                },
                f,
            )

    def load(self, path: str):
        with open(path, "rb") as f:
            data = pickle.load(f)
        cfg = data.get("config", {})
        # rebuild the module tree when the checkpoint's architecture
        # differs from this agent's (e.g. build_agents defaulted to
        # attention but the zoo dir holds an lstm_ppo family variant)
        arch = {k: cfg[k] for k in ("net_type", "hidden_dim",
                                    "features_per_link") if k in cfg}
        if any(getattr(self, k) != v for k, v in arch.items()):
            # keep a real adjacency if the caller supplied one at
            # construction — rebuilding with adj=None would silently
            # swap a gat policy's graph for the all-ones default
            if arch.get("net_type") == "gat" and self.adj is None:
                raise ValueError(
                    "loading a 'gat' checkpoint into an agent built "
                    "without an adjacency: construct the agent with "
                    "net_type='gat' and the controlled-links adjacency")
            for k, v in arch.items():
                setattr(self, k, v)
            self._build_networks(adj=self.adj)
            self._jit_forward = jax.jit(self._forward)
            self._jit_epoch = jax.jit(self._epoch_update)
            self._jit_seq = jax.jit(self._sequence_forward)
            self.reset_hidden()
        self.actor_params = jax.device_put(data["actor"])
        self.critic_params = jax.device_put(data["critic"])
        # the action parameterization travels WITH the params: a policy
        # trained with the open anchor is meaningless under the
        # current-width integrator and vice versa
        self.gate_anchor = data.get("config", {}).get("gate_anchor",
                                                      self.gate_anchor)
        md = data.get("config", {}).get("max_delta")
        if md is not None:
            self.max_delta = md
        self._episode = data.get("episode", 0)
        self.actor_opt = self.actor_tx.init(self.actor_params)
        self.critic_opt = self.critic_tx.init(self.critic_params)
