"""Round-3 grid_50x50 throughput sweep: B x H matrix toward the
BASELINE.json 10k-link north star (>= 1e5 env-steps/s).

Run:  nohup python scripts/sweep_grid.py > /tmp/sweep_grid.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(scn, batch, steps, seed0=1, reps=3):
    import jax

    from pednstream_tpu.engine import simulate_batched

    ep = scn.engine_params
    run = jax.jit(lambda ss: simulate_batched(scn, ep, ss, steps,
                                              stochastic=True))
    mk = lambda k: jax.vmap(scn.init_state)(jax.random.split(k, batch))

    # true-dependency warm fence (fire-ahead acks make block_until_ready
    # unreliable on the remote runtime)
    _ = float(run(mk(jax.random.PRNGKey(0))).num_peds.sum())
    times = []
    for i in range(reps):
        st = mk(jax.random.PRNGKey(seed0 + i))
        np.asarray(st.density)  # host materialization fence
        t0 = time.time()
        out = run(st)
        _ = float(out.num_peds.sum())  # device-side checksum dependency
        times.append(time.time() - t0)
    return steps * batch / min(times)


def main():
    from pednstream_tpu.generator import NetworkEnvGenerator
    from pednstream_tpu.scenario import build_scenario

    gen = NetworkEnvGenerator()
    data = gen.load_network_data("grid_50x50")
    steps = 500  # full horizon: windows under-report ~25% fixed overhead
    for H in (64, 32):
        for B in (128, 256, 512):
            scn = build_scenario(
                data["adjacency_matrix"], gen.config["params"],
                gen.config["origin_nodes"], gen.config["destination_nodes"],
                history_window=H, binomial_mode="fast",
            )
            try:
                v = measure(scn, B, steps)
                print(f"grid_50x50 H={H} B={B}: {v:.0f} env-steps/s "
                      f"({v / B * 1e3:.2f} us/step/env-inv, "
                      f"{B / v * 1e3:.2f} ms/step)", flush=True)
            except Exception as e:  # OOM at big B is informative, not fatal
                print(f"grid_50x50 H={H} B={B}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
