"""Round-4 melbourne throughput sweep on the live chip: H x B matrix
for the headline bench row.  PARITY.md: the deterministic windowed
trajectories on the nominal melbourne config are IDENTICAL to the exact
full-horizon run for both H=64 and H=32 (clamps never bind), so H=32 is
the same zero-error approximation class the grid row already reports.

Run:  python scripts/sweep_melbourne.py
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

    _ = float(run(mk(jax.random.PRNGKey(0))).num_peds.sum())  # warm fence
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
    data = gen.load_network_data("melbourne")
    steps = 500  # full horizon (windows under-report ~25% fixed overhead)
    for H, batches in ((32, (896, 1024, 1280)), (16, (1024, 1280, 1536))):
        for B in batches:
            scn = build_scenario(
                data["adjacency_matrix"], gen.config["params"],
                gen.config["origin_nodes"], gen.config["destination_nodes"],
                history_window=H, binomial_mode="fast",
            )
            try:
                v = measure(scn, B, steps)
                print(f"melbourne H={H} B={B}: {v:.0f} env-steps/s "
                      f"({B / v * 1e3:.2f} ms/step)", flush=True)
            except Exception as e:
                print(f"melbourne H={H} B={B}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
