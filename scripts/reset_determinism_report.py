"""Reset-determinism statistical report.

Counterpart of the reference rl/test_reset_determinism.py:29-120: run N
no-action episodes with a fixed seed, collect all agent observations,
embed episode distributions with PCA, and write episode_states.json /
statistics.json / a scatter PNG under outputs/reset_determinism_test/.
(The hard determinism guarantee is asserted in tests/test_env.py; this
script reproduces the reference's exploratory report.)

Run:  python scripts/reset_determinism_report.py --dataset butterfly_scC
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pca_2d(x: np.ndarray) -> np.ndarray:
    """2-component PCA via SVD (no sklearn dependency)."""
    xc = x - x.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    return xc @ vt[:2].T


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="butterfly_scC")
    parser.add_argument("--episodes", type=int, default=4)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--seed", type=int, default=123)
    parser.add_argument("--out", default="outputs/reset_determinism_test")
    args = parser.parse_args()

    import jax

    from pednstream_tpu.env import PedNetParallelEnv

    env = PedNetParallelEnv(args.dataset, obs_mode="option2", seed=args.seed,
                            action_gap=5)
    episodes = []
    for ep in range(args.episodes):
        env.seed(args.seed)  # same seed every episode: distributions must match
        obs, _ = env.reset()
        rows = []
        for _ in range(args.steps):
            actions = {
                a: (env.action_space(a).low + env.action_space(a).high) / 2
                for a in env.possible_agents
            }
            obs, *_ = env.step(actions)
            rows.append(np.concatenate([o.ravel() for o in obs.values()]))
        episodes.append(np.stack(rows))

    all_obs = np.concatenate(episodes)
    emb = pca_2d(all_obs)
    per_ep = {
        f"episode_{i}": {
            "mean": episodes[i].mean(axis=0).tolist(),
            "std": episodes[i].std(axis=0).tolist(),
        }
        for i in range(args.episodes)
    }
    max_dev = max(
        float(np.abs(episodes[i] - episodes[0]).max())
        for i in range(1, args.episodes)
    )

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "episode_states.json"), "w") as f:
        json.dump({f"episode_{i}": e.tolist() for i, e in enumerate(episodes)}, f)
    with open(os.path.join(args.out, "statistics.json"), "w") as f:
        json.dump({"per_episode": per_ep,
                   "max_cross_episode_deviation": max_dev,
                   "deterministic": max_dev == 0.0}, f, indent=2)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = args.steps
    fig, ax = plt.subplots(figsize=(6, 5))
    for i in range(args.episodes):
        ax.scatter(emb[i * n:(i + 1) * n, 0], emb[i * n:(i + 1) * n, 1],
                   s=12, alpha=0.6, label=f"episode {i}")
    ax.legend()
    ax.set_title(f"PCA of observations over {args.episodes} same-seed episodes\n"
                 f"max cross-episode deviation: {max_dev:g}")
    fig.savefig(os.path.join(args.out, "pca_episodes.png"), dpi=120,
                bbox_inches="tight")

    print(f"max cross-episode deviation: {max_dev} "
          f"({'DETERMINISTIC' if max_dev == 0 else 'NON-DETERMINISTIC'})")
    print(f"report written to {args.out}")


if __name__ == "__main__":
    main()
