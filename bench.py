"""Headline benchmark: LTM engine throughput on the melbourne network
(341 nodes / 938 directed links, T=500), the largest bundled real-world
scenario.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}

Baseline: the reference implementation (WaimenMak/PedNStream, pure
Python/NumPy) measured on this machine's CPU with the same scenario and
full 499-step horizon: 21.05 steps/s (see BASELINE.md; the reference
publishes no numbers, so the baseline is self-measured with
scripts/bench_reference.py).
"""

import json
import time

import numpy as np

REFERENCE_MELBOURNE_STEPS_PER_S = 21.05  # measured 2026-08-16, this host


def main():
    import jax

    from pednstream_tpu.generator import NetworkEnvGenerator
    from pednstream_tpu.engine import simulate

    gen = NetworkEnvGenerator()
    scn = gen.create_network("melbourne")
    T = scn.simulation_steps
    ep = scn.engine_params

    # warm up / compile
    st = scn.init_state(jax.random.PRNGKey(0))
    final, _ = simulate(scn, ep, st, T - 1, stochastic=True, record=False)
    jax.block_until_ready(final.density)

    # timed runs (cached executable)
    times = []
    for i in range(3):
        st = scn.init_state(jax.random.PRNGKey(i + 1))
        t0 = time.time()
        final, _ = simulate(scn, ep, st, T - 1, stochastic=True, record=False)
        jax.block_until_ready(final.density)
        times.append(time.time() - t0)

    steps_per_s = (T - 1) / min(times)
    print(
        json.dumps(
            {
                "metric": "melbourne LTM steps/s (938 links, stochastic, full horizon)",
                "value": round(steps_per_s, 2),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / REFERENCE_MELBOURNE_STEPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
