"""Round-4 artifact digest — run AFTER scripts/r4_driver.py completes.

Reads every round-4 artifact and prints the decision table the close-out
needs (CLAUDE.md §In flight): bench certification numbers, the u8 quality
gate, the best landing block config, sweep aggregates, robust-256
cross-eval vs the shipped N=128 fixture, and the small-batch velocity
episodes-to-solve. Pure host-side file reads — never touches the TPU.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)


def load(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def main():
    print("== bench_probe (runs/r4/bench_probe.json)")
    bench = load("runs/r4/bench_probe.json")
    if bench:
        print(f"  primary: {bench['value']:.0f} {bench['unit']} "
              f"(vs_baseline {bench['vs_baseline']:.0f}x)")
        for e in bench.get("extras", []):
            print(f"  extra: {e.get('metric')}: {e.get('value', e.get('error'))}")
        rl = bench.get("roofline")
        if rl:
            print(f"  roofline: {rl}")
    else:
        print("  MISSING")

    print("== u8 gate (runs/r3/landing_u8.json)")
    u8 = load("runs/r3/landing_u8.json")
    if u8:
        for k in ("bf16img", "u8img"):
            if k in u8:
                print(f"  {k}: {u8[k]}")
        lu, lb = u8.get("learn_u8img"), u8.get("learn_bf16img_ref")
        if lu and lb:
            drift = max(abs(a - b) for a, b in zip(lu, lb))
            print(f"  learn curves (u8 vs bf16 ref): max |d reward| = {drift:.4f}")
            print(f"  u8 : {lu}\n  bf16: {lb}")
            print(f"  GATE: {'PASS — flip image_dtype default to uint8' if drift < 0.5 else 'FAIL — keep bf16'}")
    else:
        print("  MISSING")

    print("== landing block grid (runs/r4/landing_block_probe.json)")
    grid = load("runs/r4/landing_block_probe.json")
    if grid:
        best = max(grid.items(), key=lambda kv: kv[1]["decisions_per_s"])
        for k, v in sorted(grid.items()):
            print(f"  {k}: {v['decisions_per_s']:.0f} dec/s ({v['ms_per_update']} ms)")
        print(f"  BEST: {best[0]} at {best[1]['decisions_per_s']:.0f} dec/s")
    else:
        print("  MISSING")

    print("== landing batch sweep (runs/r3/landing_bsweep.json)")
    bs = load("runs/r3/landing_bsweep.json")
    if bs:
        for k, v in sorted(bs.items()):
            print(f"  {k}: {v}")
    else:
        print("  MISSING")

    print("== size sweep (runs/sweep/summary.json)")
    sw = load("runs/sweep/summary.json")
    if sw:
        for size, row in sw.items():
            print(f"  N={size}: {row['seeds']} seeds, {row['solved_seeds']} solved, "
                  f"final reward {row['final_reward_mean']:.1f} ± {row['final_reward_std']:.1f}")
    else:
        print("  MISSING")

    print("== robust 256 cross-eval (runs/ctrl_robust256_mix/eval.json)")
    rb = load("runs/ctrl_robust256_mix/eval.json")
    if rb:
        for pol, row in rb.items():
            print(f"  {pol}: {row}")
        print("  shipped r5 N=128 reference: calm 98.0% / windy 57.4% strict")
    else:
        print("  MISSING")

    print("== small-batch velocity seeds (runs/seed_study_smallbatch/summary.json)")
    sb = load("runs/seed_study_smallbatch/summary.json")
    if sb:
        print(f"  {({k: v for k, v in sb.items() if not isinstance(v, list)})}")
        print("  reference scale: 1,935 ± 505 episodes (logger_analyzer.py)")
    else:
        print("  MISSING")

    print("== stacked 30-seed velocity study (runs/seed_study_vel_stacked/summary.json)")
    st = load("runs/seed_study_vel_stacked/summary.json")
    if st:
        print(f"  solved {st.get('solved_seeds')}/{st.get('seeds')} in "
              f"{st.get('wall_clock_s', '?')}s wall "
              f"(serial round-3 study: {st.get('serial_reference_s', 1020)}s; "
              f"reference: one SLURM job per seed)")
        print(f"  episodes-to-solve {st.get('episodes_to_solve_mean')} "
              f"± {st.get('episodes_to_solve_std')}")
    else:
        print("  MISSING")

    print("== classical r4 (runs/classical_r4/summary.json)")
    cl = load("runs/classical_r4/summary.json")
    if cl:
        for leg, row in cl.items():
            norms = row.get("episode_final_norms", [])
            near = [round(n, 4) for n in norms if 0.04 < n < 0.065]
            print(f"  {leg}: success {row['success_rate']:.0%}; norms near cut: {near}")
    else:
        print("  MISSING")


if __name__ == "__main__":
    sys.exit(main())
