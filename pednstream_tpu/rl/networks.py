"""Policy / value network families in Flax.

JAX re-design of the reference's Torch families (rl/agents/PPO_backup.py):
  - AttentionPolicy / AttentionValue (the default in use,
    PPO_backup.py:597-760): a per-link shared LSTM over time followed by
    all-to-all multi-head attention across the links an agent controls,
    with per-link Gaussian action heads.
  - LSTMPolicy / LSTMValue (PPO_backup.py:25-120): flat-obs LSTM.
  - StackedPolicy / StackedValue (PPO_backup.py:361-413 on the SAC
    StackedEncoder): frame-stacked obs through a 1-D conv encoder.

All recurrent state is explicit (carry in / carry out) so rollouts and
updates run under jit/vmap/scan.
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class AttentionTorso(nn.Module):
    """Per-link LSTM + link-to-link attention (PPO_backup.py:597-680)."""

    hidden_dim: int = 64
    num_heads: int = 2

    @nn.compact
    def __call__(self, obs_links: jnp.ndarray, carry):
        # obs_links: [L, F]; carry: LSTM carry with leading link axis
        x = nn.Dense(self.hidden_dim)(obs_links)
        x = nn.tanh(x)
        cell = nn.OptimizedLSTMCell(self.hidden_dim)
        new_carry, h = jax.vmap(cell)(carry, x)  # shared cell over links
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.hidden_dim
        )(h[None], h[None])[0]  # [L, H]
        z = nn.LayerNorm()(h + att)
        return z, new_carry

    @staticmethod
    def initial_carry(key, num_links: int, hidden_dim: int = 64):
        cell = nn.OptimizedLSTMCell(hidden_dim)
        return cell.initialize_carry(key, (num_links, hidden_dim))


class AttentionPolicy(nn.Module):
    """Per-link delta-action Gaussian policy."""

    num_links: int
    hidden_dim: int = 64
    num_heads: int = 2

    @nn.compact
    def __call__(self, obs_links: jnp.ndarray, carry):
        z, new_carry = AttentionTorso(self.hidden_dim, self.num_heads)(obs_links, carry)
        mu = nn.Dense(1)(z)[:, 0]  # [L] per-link delta mean
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.num_links,)
        )
        return mu, log_std, new_carry


class AttentionValue(nn.Module):
    num_links: int
    hidden_dim: int = 64
    num_heads: int = 2

    @nn.compact
    def __call__(self, obs_links: jnp.ndarray, carry):
        z, new_carry = AttentionTorso(self.hidden_dim, self.num_heads)(obs_links, carry)
        v = nn.Dense(1)(z.mean(axis=0))[0]
        return v, new_carry


class LSTMPolicy(nn.Module):
    """Flat-observation LSTM policy (PPO_backup.py:25-78)."""

    act_dim: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, obs: jnp.ndarray, carry):
        x = nn.tanh(nn.Dense(self.hidden_dim)(obs))
        carry, h = nn.OptimizedLSTMCell(self.hidden_dim)(carry, x)
        mu = nn.Dense(self.act_dim)(h)
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.act_dim,)
        )
        return mu, log_std, carry

    @staticmethod
    def initial_carry(key, hidden_dim: int = 64):
        return nn.OptimizedLSTMCell(hidden_dim).initialize_carry(key, (hidden_dim,))


class LSTMValue(nn.Module):
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, obs: jnp.ndarray, carry):
        x = nn.tanh(nn.Dense(self.hidden_dim)(obs))
        carry, h = nn.OptimizedLSTMCell(self.hidden_dim)(carry, x)
        return nn.Dense(1)(h)[0], carry


class StackedEncoder(nn.Module):
    """1-D conv over a frame-stacked observation window
    (SAC_copy.py:62-76)."""

    hidden_dim: int = 64

    @nn.compact
    def __call__(self, obs_stack: jnp.ndarray):  # [K, obs_dim]
        x = nn.Conv(features=32, kernel_size=(3,), padding="SAME")(obs_stack)
        x = nn.relu(x)
        x = nn.Conv(features=32, kernel_size=(3,), padding="SAME")(x)
        x = nn.relu(x)
        x = x.reshape(-1)
        return nn.relu(nn.Dense(self.hidden_dim)(x))


class StackedPolicy(nn.Module):
    act_dim: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, obs_stack: jnp.ndarray, carry=None):
        h = StackedEncoder(self.hidden_dim)(obs_stack)
        mu = nn.Dense(self.act_dim)(h)
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.act_dim,)
        )
        return mu, log_std, carry


class StackedValue(nn.Module):
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, obs_stack: jnp.ndarray, carry=None):
        h = StackedEncoder(self.hidden_dim)(obs_stack)
        return nn.Dense(1)(h)[0], carry


class MLPPolicy(nn.Module):
    act_dim: int
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs: jnp.ndarray, carry=None):
        x = obs
        for h in self.hidden:
            x = nn.tanh(nn.Dense(h)(x))
        mu = nn.Dense(self.act_dim)(x)
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.act_dim,)
        )
        return mu, log_std, carry


class MLPValue(nn.Module):
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs: jnp.ndarray, carry=None):
        x = obs
        for h in self.hidden:
            x = nn.tanh(nn.Dense(h)(x))
        return nn.Dense(1)(x)[0], carry


class UDLSTMTorso(nn.Module):
    """Per-link shared LSTM + upstream/downstream sum-minus-self
    aggregation (PPO_backup.py:419-596): each link's features are
    combined with the sum of every OTHER link's features, so a link's
    action sees the aggregate up/downstream context without pairwise
    attention."""

    hidden_dim: int = 64

    @nn.compact
    def __call__(self, obs_links: jnp.ndarray, carry):  # [L, F]
        cell = nn.OptimizedLSTMCell(self.hidden_dim)
        new_carry, h = jax.vmap(cell)(carry, obs_links)  # shared cell over links
        link_f = nn.Dense(self.hidden_dim)(h)  # [L, H]
        others = link_f.sum(axis=0, keepdims=True) - link_f  # sum of OTHER links
        ud = nn.Dense(self.hidden_dim)(
            jnp.concatenate([link_f, others], axis=-1)
        )  # [L, H]
        return ud, new_carry

    @staticmethod
    def initial_carry(key, num_links: int, hidden_dim: int = 64):
        cell = nn.OptimizedLSTMCell(hidden_dim)
        return cell.initialize_carry(key, (num_links, hidden_dim))


class UDLSTMPolicy(nn.Module):
    """UD-LSTM actor (PPO_backup.py:419-521): shared latent layer over
    the flattened link features for cross-link action coordination,
    per-link mean/std heads with state-dependent softplus std."""

    num_links: int
    hidden_dim: int = 64
    min_std: float = 1e-3
    max_std: float = 10.0

    @nn.compact
    def __call__(self, obs_links: jnp.ndarray, carry):
        ud, new_carry = UDLSTMTorso(self.hidden_dim)(obs_links, carry)
        shared = nn.Dense(self.num_links * self.hidden_dim)(ud.reshape(-1))
        z = nn.relu(shared.reshape(self.num_links, self.hidden_dim))
        mu = nn.Dense(1)(z)[:, 0]  # [L]
        std = jnp.clip(jax.nn.softplus(nn.Dense(1)(z)[:, 0]),
                       self.min_std, self.max_std)
        return mu, jnp.log(std), new_carry


class UDLSTMValue(nn.Module):
    """UD-LSTM critic (PPO_backup.py:523-596): mean-pool the per-link
    UD features, elu, scalar head."""

    num_links: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, obs_links: jnp.ndarray, carry):
        ud, new_carry = UDLSTMTorso(self.hidden_dim)(obs_links, carry)
        g = nn.elu(ud.mean(axis=0))
        return nn.Dense(1)(g)[0], new_carry


class GATLayer(nn.Module):
    """Dense graph-attention layer (the DenseGATConv role in the
    reference's GAT-LSTM family, PPO_backup.py:126-353): learned
    pairwise attention scores over link nodes, optionally masked by an
    adjacency matrix."""

    hidden_dim: int = 64

    @nn.compact
    def __call__(self, h: jnp.ndarray, adj: jnp.ndarray = None):  # h: [L, F]
        L = h.shape[0]
        wh = nn.Dense(self.hidden_dim, use_bias=False)(h)
        a_src = nn.Dense(1, use_bias=False)(wh)[:, 0]  # [L]
        a_dst = nn.Dense(1, use_bias=False)(wh)[:, 0]
        scores = nn.leaky_relu(a_src[:, None] + a_dst[None, :], 0.2)  # [L, L]
        if adj is not None:
            scores = jnp.where(adj > 0, scores, -1e9)
        att = jax.nn.softmax(scores, axis=-1)
        return nn.tanh(att @ wh)


class GATLSTMPolicy(nn.Module):
    """Per-link shared LSTM -> GAT spatial attention -> per-link heads
    (PPO_backup.py:126-353)."""

    num_links: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, obs_links: jnp.ndarray, carry, adj: jnp.ndarray = None):
        x = nn.tanh(nn.Dense(self.hidden_dim)(obs_links))
        cell = nn.OptimizedLSTMCell(self.hidden_dim)
        new_carry, h = jax.vmap(cell)(carry, x)
        z = GATLayer(self.hidden_dim)(h, adj)
        mu = nn.Dense(1)(z)[:, 0]
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.num_links,)
        )
        return mu, log_std, new_carry


class GATLSTMValue(nn.Module):
    num_links: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, obs_links: jnp.ndarray, carry, adj: jnp.ndarray = None):
        x = nn.tanh(nn.Dense(self.hidden_dim)(obs_links))
        cell = nn.OptimizedLSTMCell(self.hidden_dim)
        new_carry, h = jax.vmap(cell)(carry, x)
        z = GATLayer(self.hidden_dim)(h, adj)
        return nn.Dense(1)(z.mean(axis=0))[0], new_carry


# -- SAC networks (SAC_copy.py:313-420) --------------------------------------


class SACActor(nn.Module):
    """Tanh-squashed Gaussian actor over a frame-stacked window."""

    act_dim: int
    hidden_dim: int = 64
    log_std_min: float = -20.0
    log_std_max: float = 2.0

    @nn.compact
    def __call__(self, obs_stack: jnp.ndarray):
        h = StackedEncoder(self.hidden_dim)(obs_stack)
        h = nn.relu(nn.Dense(self.hidden_dim)(h))
        mu = nn.Dense(self.act_dim)(h)
        log_std = nn.Dense(self.act_dim)(h)
        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        return mu, log_std

    def sample(self, params, obs_stack, key):
        mu, log_std = self.apply(params, obs_stack)
        std = jnp.exp(log_std)
        eps = jax.random.normal(key, mu.shape)
        pre_tanh = mu + std * eps
        a = jnp.tanh(pre_tanh)
        # log prob with tanh correction
        logp = (-0.5 * (eps**2) - log_std - 0.5 * jnp.log(2 * jnp.pi)).sum()
        logp -= jnp.log(1 - a**2 + 1e-6).sum()
        return a, logp


class SACCritic(nn.Module):
    """Twin Q networks."""

    hidden_dim: int = 64

    @nn.compact
    def __call__(self, obs_stack: jnp.ndarray, action: jnp.ndarray):
        h = StackedEncoder(self.hidden_dim)(obs_stack)
        x = jnp.concatenate([h, action])
        q1 = nn.Dense(1)(nn.relu(nn.Dense(self.hidden_dim)(x)))[0]
        q2 = nn.Dense(1)(nn.relu(nn.Dense(self.hidden_dim)(x)))[0]
        return q1, q2
