"""Regenerate the SAC rows of outputs/eval_<dataset>/results.json.

The round-3 SAC rows were evaluated with SACAgent.load not restoring
max_delta from the checkpoint config, so every policy trained with a
non-default action scale acted with 2.5 instead of its training-time
value at eval.  This re-runs ONLY the sac rows under the fixed loader,
with the same paired protocol (seed 0+run, run 0 nominal, runs 1+
randomized) and merges them into the stored results.json in place.

Run: python scripts/reeval_sac.py [dataset ...]   (default: all affected)
"""

import json
import os
import sys
import time

import jax

# the eval host loop must not touch the (possibly wedged) remote chip
jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from train_zoo import DATASETS  # noqa: E402

from pednstream_tpu.rl.evaluate import evaluate_agents  # noqa: E402

AFFECTED = ["45_intersections", "butterfly_scB", "butterfly_scC",
            "one_intersection_v0", "small_network", "two_coordinators"]


def reeval(dataset: str):
    action_gap = DATASETS[dataset][0]
    out_dir = os.path.join(REPO, "outputs", f"eval_{dataset}")
    res_path = os.path.join(out_dir, "results.json")
    with open(res_path) as f:
        results = json.load(f)
    t0 = time.time()
    new = evaluate_agents(
        dataset, ["sac"], num_runs=3, output_dir=out_dir,
        obs_mode="option2", action_gap=action_gap,
        checkpoint_dirs={"sac": os.path.join(REPO, "artifacts", "zoo",
                                             f"sac_agents_{dataset}")},
    )
    old = {r["run"]: r["total_reward"] for r in results.get("sac", [])}
    results["sac"] = new["sac"]
    with open(res_path, "w") as f:
        json.dump(results, f, indent=2, default=float)
    for r in new["sac"]:
        print(f"[{dataset}] run{r['run']}: reward {r['total_reward']:.0f} "
              f"(was {old.get(r['run'], float('nan')):.0f}), "
              f"delay {r.get('delay.total_delay', float('nan')):.0f}",
              flush=True)
    print(f"[{dataset}] done in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or AFFECTED
    for name in names:
        reeval(name)
