"""Train the butterfly_scC gating policy with the batched PPO trainer and
save a checkpoint + training curve under artifacts/ (counterpart of the
reference's shipped rl/ppo_agents_* checkpoints).

Also evaluates the greedy trained policy against gates-wide-open
(no-control) on a fresh batch of envs.

Run:  python scripts/train_butterfly_demo.py [iterations]
"""

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def evaluate(core, spec, policy=None, params=None, B=64, steps=120, key=0):
    """Mean cumulative reward over B fresh envs for `steps` steps."""
    states, obs = core.batch_reset(jax.random.split(jax.random.PRNGKey(key), B))
    gid = spec.gate_ids[0]
    widths = jnp.asarray(spec.gate_link_widths[0], jnp.float32)
    total = np.zeros(B)
    for _ in range(steps):
        if policy is None:
            actions = {gid: jnp.tile(widths[None], (B, 1))}
        else:
            o = obs[gid]
            mu, _, _ = jax.vmap(lambda x: policy.apply(params, x))(o)
            cur = o.reshape(B, len(widths), -1)[:, :, -1]
            actions = {gid: jnp.clip(cur + jnp.clip(mu, -2.5, 2.5), 0.0, widths)}
        states, obs, rew, done = core.batch_step(states, actions)
        total += np.asarray(rew[gid])
    return float(total.mean())


def main(iterations=80):
    from pednstream_tpu.env import PedNetParallelEnv
    from pednstream_tpu.rl.batched_ppo import BatchedPPOTrainer

    env = PedNetParallelEnv("butterfly_scC", obs_mode="option2", seed=0,
                            action_gap=5, history_window=64)
    tr = BatchedPPOTrainer(env.core, num_envs=256, rollout_len=16,
                           minibatches=4, epochs=4, lr=1e-3)
    ts = tr.init(jax.random.PRNGKey(0))

    curve = []
    t0 = time.time()
    for i in range(iterations):
        ts, m = tr.train_iteration(ts)
        curve.append(m["gate_2/reward"])
        if i % 10 == 0:
            print(f"iter {i}: reward {m['gate_2/reward']:.0f}", flush=True)
    train_time = time.time() - t0

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/butterfly_ppo.pkl", "wb") as f:
        pickle.dump({
            "params": jax.device_get(ts.params),
            "value_params": jax.device_get(ts.value_params),
            "config": {"dataset": "butterfly_scC", "obs_mode": "option2",
                       "action_gap": 5, "num_envs": 256, "rollout_len": 16,
                       "iterations": iterations},
        }, f)

    gid = "gate_2"
    policy = tr._policy(gid)
    r_trained = evaluate(env.core, env.spec_agents, policy, ts.params[gid])
    r_nocontrol = evaluate(env.core, env.spec_agents, None, None)

    summary = {
        "iterations": iterations,
        "train_time_s": round(train_time, 1),
        "engine_steps_per_s": round(iterations * 256 * 16 * 5 / train_time),
        "reward_curve_first5": [round(r) for r in curve[:5]],
        "reward_curve_last5": [round(r) for r in curve[-5:]],
        "eval_mean_cum_reward_trained": round(r_trained, 1),
        "eval_mean_cum_reward_no_control": round(r_nocontrol, 1),
    }
    with open("artifacts/butterfly_ppo_training.json", "w") as f:
        json.dump({"summary": summary, "curve": curve}, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 80)
