"""Round-3 zoo retrain driver, split by phase so each runs on its best
backend:

  --phase ppo   : batched PPO training on the TPU (fused scan trainer)
  --phase sac   : SAC host-loop training on CPU (the loop is
                  dispatch-bound; over the remote TPU tunnel it runs
                  ~4.5x slower than CPU for these tiny nets)
  --phase eval  : paired evaluations + MPC baselines on CPU
  --phase lstm  : the lstm_ppo family variant on 45_intersections (TPU)

Run:  nohup python scripts/retrain_r3.py --phase ppo  > /tmp/r3_ppo.log  2>&1 &
      nohup python scripts/retrain_r3.py --phase sac  > /tmp/r3_sac.log  2>&1 &
      # then, after both finish:
      nohup python scripts/retrain_r3.py --phase eval > /tmp/r3_eval.log 2>&1 &
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--phase", required=True,
                    choices=["ppo", "sac", "eval", "lstm"])
    ap.add_argument("--datasets", nargs="*", default=None)
    args = ap.parse_args()

    if args.phase in ("sac", "eval"):
        force_cpu()

    from train_zoo import ART, DATASETS, evaluate_zoo, train_ppo, train_sac

    names = args.datasets or list(DATASETS)
    t0 = time.time()
    for name in names:
        gap, ppo_iters, sac_eps = DATASETS[name]
        try:
            if args.phase == "ppo":
                train_ppo(name, gap, ppo_iters, seeds=3)
            elif args.phase == "sac":
                train_sac(name, gap, sac_eps)
            elif args.phase == "eval":
                ppo_dir = os.path.join(ART, f"ppo_agents_{name}")
                sac_dir = os.path.join(ART, f"sac_agents_{name}")
                evaluate_zoo(name, gap, ppo_dir,
                             sac_dir if os.path.isdir(sac_dir) else None,
                             with_mpc=True)
        except Exception:
            print(f"[{name}] FAILED:\n{traceback.format_exc()}", flush=True)
        print(f"--- elapsed {time.time() - t0:.0f}s", flush=True)

    if args.phase == "lstm":
        try:
            gap, ppo_iters, _ = DATASETS["45_intersections"]
            lstm_dir = train_ppo("45_intersections", gap, ppo_iters,
                                 net_type="lstm", prefix="lstm_ppo", seeds=2)
            print(f"lstm variant -> {lstm_dir}", flush=True)
        except Exception:
            print(f"[lstm_ppo] FAILED:\n{traceback.format_exc()}", flush=True)
    if args.phase == "eval" and os.path.isdir(
            os.path.join(ART, "lstm_ppo_agents_45_intersections")):
        try:
            from pednstream_tpu.rl.evaluate import evaluate_agents, summarize

            gap = DATASETS["45_intersections"][0]
            out = "outputs/eval_45_intersections_lstm"
            res = evaluate_agents(
                "45_intersections", ["ppo"], num_runs=3, output_dir=out,
                obs_mode="option2", action_gap=gap,
                checkpoint_dirs={
                    "ppo": os.path.join(ART, "lstm_ppo_agents_45_intersections")})
            res["lstm_ppo"] = res.pop("ppo")
            with open(os.path.join(out, "results.json"), "w") as f:
                json.dump(res, f, indent=2, default=float)
            print(summarize(res), flush=True)
        except Exception:
            print(f"[lstm_ppo eval] FAILED:\n{traceback.format_exc()}", flush=True)
    print(f"=== phase {args.phase} done in {time.time() - t0:.0f}s ===",
          flush=True)


if __name__ == "__main__":
    main()
