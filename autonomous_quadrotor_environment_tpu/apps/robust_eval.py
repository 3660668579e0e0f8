"""Robust-control cross-evaluation: {nominal, robust} x {calm, windy}.

Capability match for evaluating the reference's `robust_control` training
mode (reference: environment/quadrotor_env.py:84-109) — per-episode
mass/KF/J/IR perturbations plus 5 m/s interpolated wind gusts. Reports,
per policy x environment cell, the strict stillness solve rate, the
station-keeping solve rate (survive the full episode AND hold post-settle
RMS velocity < 0.5 m/s — the defensible criterion under persistent gusts,
see agents/ppo.make_eval_fn), survival, and RMS velocity.

    python -m autonomous_quadrotor_environment_tpu.apps.robust_eval \
        --nominal fixtures/nn_solved_128_0.msgpack \
        --robust runs/ctrl_robust/nn_final_128_0.msgpack
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from ..agents import make_eval_fn
from ..agents.networks import ActorCritic
from ..config import EnvConfig, RandomizationConfig
from ..utils import load_params


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nominal", type=str, required=True)
    p.add_argument("--robust", type=str, default=None)
    p.add_argument("--size", type=int, default=128)
    p.add_argument(
        "--robust-size", type=int, default=None,
        help="hidden width of the robust policy when it differs from "
        "--size (the reference sweeps N in {16..256}; a wider robust net "
        "keeps the same 75-dim observation space)",
    )
    p.add_argument("--episodes", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--forensic", type=str, default=None, metavar="OUT_JSON",
        help="also run the per-episode diagnostic eval "
        "(agents.make_forensic_eval_fn): per-episode severity, domain "
        "draws, peak gust, criterion outcomes, and motor-saturation "
        "fraction, over the windy env at full severity AND with per-"
        "episode severity ~ U[0,1]; writes records + a failure taxonomy "
        "to OUT_JSON (VERDICT r4 next #3)",
    )
    return p


def _taxonomy(rec: dict) -> dict:
    """Classify episodes by the first criterion they fail and summarize the
    diagnostic features per class."""
    import numpy as np

    solved = np.asarray(rec["solved"], dtype=float) > 0.5
    survived = np.asarray(rec["survived"], dtype=float) > 0.5
    station = np.asarray(rec["station"], dtype=float) > 0.5
    classes = {
        "solved_strict": solved,
        "station_not_strict": station & ~solved,
        "survived_not_station": survived & ~station,
        "crashed": ~survived,
    }
    out = {}
    for name, mask in classes.items():
        n = int(mask.sum())
        entry = {"n": n, "frac": round(n / len(solved), 4)}
        if n:
            for k in ("severity", "peak_gust", "sat_frac", "rms_vel", "mass_factor", "kf_mean"):
                v = np.asarray(rec[k])[mask].astype(float)
                entry[k] = {"mean": round(float(v.mean()), 4), "max": round(float(v.max()), 4)}
            entry["length_mean"] = float(np.asarray(rec["length"])[mask].mean())
        out[name] = entry
    # Solve rate by severity quartile (informative for the sampled env).
    sev = np.asarray(rec["severity"]).astype(float)
    bins = {}
    for lo in (0.0, 0.25, 0.5, 0.75):
        m = (sev >= lo) & (sev < lo + 0.25 + (lo == 0.75) * 1e-6)
        if m.sum():
            bins[f"[{lo:.2f},{lo + 0.25:.2f})"] = {
                "n": int(m.sum()),
                "solved": round(float(solved[m].mean()), 4),
                "station": round(float(station[m].mean()), 4),
                "survived": round(float(survived[m].mean()), 4),
                "sat_frac_mean": round(float(np.asarray(rec["sat_frac"])[m].mean()), 4),
            }
    out["by_severity_quartile"] = bins
    return out


def main(argv=None) -> dict:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    model = ActorCritic(hidden=args.size)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
    policies = {"nominal": (model, load_params(args.nominal, template))}
    if args.robust:
        rsize = args.robust_size or args.size
        if rsize == args.size:
            model_r, tmpl_r = model, template
        else:
            model_r = ActorCritic(hidden=rsize)
            tmpl_r = model_r.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
        policies["robust"] = (model_r, load_params(args.robust, tmpl_r))

    envs = {
        "calm": EnvConfig(n_steps=1000),
        "windy": EnvConfig(
            n_steps=1000, randomization=RandomizationConfig(enabled=True)
        ),
    }
    key = jax.random.PRNGKey(args.seed)
    table = {}
    for env_name, cfg in envs.items():
        for pol_name, (pol_model, params) in policies.items():
            eval_fn = jax.jit(make_eval_fn(pol_model, cfg, episodes=args.episodes))
            out = {k: float(v) for k, v in eval_fn(params, key).items()}
            table[f"{pol_name}/{env_name}"] = out
    print(json.dumps(table, indent=2))

    if args.forensic:
        from ..agents import make_forensic_eval_fn

        pol_name = "robust" if "robust" in policies else "nominal"
        pol_model, params = policies[pol_name]
        forensic = {"policy": pol_name, "episodes": args.episodes, "seed": args.seed}
        forensic_envs = {
            "windy_full": EnvConfig(
                n_steps=1000, randomization=RandomizationConfig(enabled=True)
            ),
            "windy_sampled": EnvConfig(
                n_steps=1000,
                randomization=RandomizationConfig(enabled=True, severity_sample=True),
            ),
        }
        for env_name, cfg in forensic_envs.items():
            fn = jax.jit(make_forensic_eval_fn(pol_model, cfg, episodes=args.episodes))
            rec = {k: [round(float(x), 5) for x in v] for k, v in fn(params, key).items()}
            forensic[env_name] = {"taxonomy": _taxonomy(rec), "records": rec}
        import os

        os.makedirs(os.path.dirname(args.forensic) or ".", exist_ok=True)
        with open(args.forensic, "w") as f:
            json.dump(forensic, f, indent=1)
        for env_name in forensic_envs:
            print(env_name, json.dumps(forensic[env_name]["taxonomy"], indent=1))
    return table


if __name__ == "__main__":
    main()
