"""Round-3 zoo retrain driver: all datasets (including the new
one_intersection_v0 / small_network / long_corridor separator entries),
MPC baseline on every gater dataset, plus the lstm_ppo family variant on
45_intersections (reference rl/lstm_ppo_agents_45_intersections).

Run:  nohup python scripts/retrain_r3.py > /tmp/retrain_r3.log 2>&1 &
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train_zoo import ART, DATASETS, evaluate_zoo, train_ppo, train_sac


def main():
    t0 = time.time()
    for name, (gap, ppo_iters, sac_eps) in DATASETS.items():
        try:
            print(f"=== {name} ===", flush=True)
            ppo_dir = train_ppo(name, gap, ppo_iters)
            sac_dir = train_sac(name, gap, sac_eps)
            evaluate_zoo(name, gap, ppo_dir, sac_dir, with_mpc=True)
        except Exception:
            print(f"[{name}] FAILED:\n{traceback.format_exc()}", flush=True)
        print(f"--- elapsed {time.time() - t0:.0f}s", flush=True)

    # lstm_ppo family variant on the 7x7 grid (reference
    # rl/lstm_ppo_agents_45_intersections)
    try:
        gap, ppo_iters, _ = DATASETS["45_intersections"]
        lstm_dir = train_ppo("45_intersections", gap, ppo_iters,
                             net_type="lstm", prefix="lstm_ppo")
        from pednstream_tpu.rl.evaluate import evaluate_agents, summarize

        res = evaluate_agents("45_intersections", ["ppo"], num_runs=3,
                              output_dir="outputs/eval_45_intersections_lstm",
                              obs_mode="option2", action_gap=gap,
                              checkpoint_dirs={"ppo": lstm_dir})
        res["lstm_ppo"] = res.pop("ppo")
        with open("outputs/eval_45_intersections_lstm/results.json", "w") as f:
            json.dump(res, f, indent=2, default=float)
        print(summarize(res), flush=True)
    except Exception:
        print(f"[lstm_ppo] FAILED:\n{traceback.format_exc()}", flush=True)
    print(f"=== retrain done in {time.time() - t0:.0f}s ===", flush=True)


if __name__ == "__main__":
    main()
