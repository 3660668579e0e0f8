"""Policy-forward latency sweep across network sizes.

Capability match for the reference's ppo_forward_time.py
(reference: environment/controller/ppo_forward_time.py:48-77: mean
inference latency per hidden size N in {16, 32, 64, 128, 256}). Measures
both single-observation latency (the real-robot deployment question the
reference asked) and large-batch throughput (the TPU training question).
Prints one JSON line per size.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from ..agents.networks import ActorCritic

SIZES = (16, 32, 64, 128, 256)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--batch", type=int, default=4096)
    return p


def main(argv=None) -> list[dict]:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    results = []
    for n in SIZES:
        model = ActorCritic(hidden=n)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
        fwd = jax.jit(lambda p, o: model.apply(p, o, method="actor_mean"))

        obs1 = jnp.zeros((1, 75))
        obsb = jnp.zeros((args.batch, 75))
        jax.block_until_ready(fwd(params, obs1))
        jax.block_until_ready(fwd(params, obsb))

        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(params, obs1)
        jax.block_until_ready(out)
        lat1 = (time.perf_counter() - t0) / args.iters

        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(params, obsb)
        jax.block_until_ready(out)
        latb = (time.perf_counter() - t0) / args.iters

        row = {
            "size": n,
            "latency_single_us": round(lat1 * 1e6, 1),
            "latency_batch_us": round(latb * 1e6, 1),
            "batch": args.batch,
            "throughput_obs_per_s": round(args.batch / latb),
        }
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
