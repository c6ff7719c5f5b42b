"""metered_corridor demo: the scenario where gating decisively matters.

Runs the nominal burst-demand world under three policies — no-control,
the best fixed meter, and the shipped trained PPO gater (if present) —
and prints the paired comparison.  Optionally exports the interactive
HTML map of the no-control collapse.

The physics (jam-discharge collapse behind an ungated bottleneck) are
documented in data/metered_corridor/sim_params.yaml; the training
pipeline and full tables are in scripts/train_zoo.py + docs/RESULTS.md.

Run:  python examples/metered_corridor.py [--html out.html]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def episode(env, policy, record=False):
    obs, _ = env.reset()
    for a in policy.values():
        if hasattr(a, "reset_hidden"):
            a.reset_hidden()
    total, done = 0.0, False
    while not done:
        acts = {}
        for aid, ag in policy.items():
            d = ag.take_action(obs[aid], explore=False)
            acts[aid] = (ag.absolute_action(obs[aid], d)
                         if hasattr(ag, "absolute_action") else d)
        obs, rew, terms, truncs, infos = env.step(acts)
        total += sum(infos[a].get("true_reward", rew.get(a, 0.0))
                     for a in rew)
        done = any(terms.values()) or any(truncs.values())
    arrived = float(np.asarray(env._state.virt_arr_cum).sum())
    return total, arrived


class FixedMeter:
    """Hold the feeder entrance at a fixed width (the best static policy
    from the sweep in tests/test_metered_corridor.py)."""

    def __init__(self, spec, topo, width):
        idx = {v: k for k, v in topo.link_id_to_idx.items()}
        links = [idx[int(e)] for e in np.asarray(spec.gate_links[0])]
        self.w = np.asarray(spec.gate_link_widths[0], np.float32).copy()
        self.w[links.index((3, 4))] = width

    def reset_hidden(self):
        pass

    def take_action(self, obs, explore=False):
        return self.w

    def absolute_action(self, obs, a):
        return a


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--html", default=None, metavar="OUT.html")
    args = parser.parse_args()

    from pednstream_tpu.env import PedNetParallelEnv
    from pednstream_tpu.rl.train import build_agents

    env = PedNetParallelEnv("metered_corridor", obs_mode="option2", seed=0,
                            action_gap=5, record_history=bool(args.html))
    spec, topo = env.spec_agents, env.scn.topo
    aid = spec.gate_ids[0]

    rows = [("no_control", build_agents(env, algo="no_control")),
            ("rule_based", build_agents(env, algo="rule_based")),
            ("fixed meter 0.6", {aid: FixedMeter(spec, topo, 0.6)})]

    zoo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "zoo",
        "ppo_agents_metered_corridor")
    if os.path.isdir(zoo):
        from pednstream_tpu.rl.rl_utils import load_all_agents

        ppo = build_agents(env, algo="ppo")
        load_all_agents(ppo, zoo)
        rows.append(("trained PPO (zoo)", ppo))

    print(f"{'policy':<20}{'total reward':>14}{'arrived':>9}")
    for name, policy in rows:
        total, arrived = episode(env, policy)
        print(f"{name:<20}{total:>14.0f}{arrived:>9.0f}")

    if args.html:
        # re-run no-control with history and export the interactive map
        env2 = PedNetParallelEnv("metered_corridor", obs_mode="option2",
                                 seed=0, action_gap=5, record_history=True)
        episode(env2, build_agents(env2, algo="no_control"))
        run_dir = os.path.join("outputs", "metered_corridor_demo")
        env2.save(os.path.basename(run_dir), base_dir=os.path.dirname(run_dir))
        from pednstream_tpu.viz.html_export import export_interactive_html

        export_interactive_html(run_dir, args.html)
        print(f"wrote {args.html} (no-control collapse)")


if __name__ == "__main__":
    main()
