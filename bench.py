"""Benchmark: convex-MPC solves/s/chip on the Go1 trot QP (H=10).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.md): >= 10,000 solves/s/chip. The reference's implied
budget is one OSQP solve per 10 ms tick = 100 solves/s on a desktop CPU
(reference: LeggedParams.h:7).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    import __graft_entry__ as ge

    dtype = jnp.float32
    horizon = 10
    batch = 4096
    params, x0, contact = ge._make_problem_batch(batch, horizon, dtype)
    fn = jax.jit(ge._solve_batch_fn(params, horizon, iters=15))

    out = fn(x0, contact)
    out.block_until_ready()        # compile + warm up

    # timed runs
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(x0, contact)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep

    solves_per_s = batch / dt
    target = 10000.0
    print(json.dumps({
        "metric": "convex_mpc_solves_per_s_per_chip_go1_trot_h10",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / target, 3),
    }))


if __name__ == "__main__":
    main()
