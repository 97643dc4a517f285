"""Benchmark: convex-MPC solves/s/chip on the Go1 trot QP (H=10).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.md): >= 10,000 solves/s/chip. The reference's implied
budget is one OSQP solve per 10 ms tick = 100 solves/s on a desktop CPU
(reference: LeggedParams.h:7).

Measurement hygiene: inputs are cycled across timed repetitions — repeated
execution with bit-identical inputs can be served from result caches in
tunneled TPU setups and report fake speedups.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")

import jax
import jax.numpy as jnp


def main():
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.environ["JAX_COMPILATION_CACHE_DIR"])
        except Exception:
            pass

    import __graft_entry__ as ge

    dtype = jnp.float32
    horizon = 10
    batch = 16384
    backend = ("pallas" if jax.default_backend() not in ("cpu",)
               else "xla")
    params, x0, contact = ge._make_problem_batch(batch, horizon, dtype)
    fn = jax.jit(ge._solve_batch_fn(params, horizon, iters=15,
                                    backend=backend))

    # distinct input variants so no repetition sees identical inputs
    variants = [(x0 + 1e-3 * k, contact) for k in range(4)]
    out = fn(*variants[0])
    out.block_until_ready()        # compile + warm up
    # solution sanity: all finite, stance legs carry weight. A solver that
    # emits NaNs must never win the benchmark.
    assert bool(jnp.all(jnp.isfinite(out))), "non-finite GRFs"
    mean_fz = float(jnp.mean(jnp.sum(out[:, 2:12:3], axis=-1)))
    assert 0.3 * 9.8 * float(params.mass) < mean_fz < 2.0 * 9.8 * float(
        params.mass), f"implausible stance load {mean_fz}"

    n_rep = 8
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = fn(*variants[i % len(variants)])
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
