"""Vectorized multi-seed training (agents/multiseed.py).

The stacked study must be the SAME experiment as the serial one
(reference: one SLURM job per seed, slurm_output/slurm-*.out, aggregated by
logger_analyzer.py:45-97): identical per-seed PRNG streams, so the stacked
init is bitwise the serial init and a stacked train step tracks the serial
step to f32 tolerance (vmap changes op scheduling, not semantics)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_quadrotor_environment_tpu.agents import (
    make_multiseed_eval_fn,
    make_multiseed_train_loop,
    make_multiseed_train_step,
    make_train_step,
    multiseed_init,
    ppo_init,
    seed_slice,
)
from autonomous_quadrotor_environment_tpu.config import EnvConfig, PPOConfig, TrainConfig

ENV = EnvConfig(n_steps=50)
PPO = PPOConfig(k_epochs=2, minibatch_size=0)
TRAIN = TrainConfig(num_envs=8, rollout_steps=8, network_size=16)
SEEDS = [0, 3]


def tree_allclose(a, b, rtol=1e-5, atol=1e-6):
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def test_stacked_init_matches_serial_per_seed():
    model, tx, stacked = multiseed_init(SEEDS, ENV, PPO, TRAIN)
    for i, s in enumerate(SEEDS):
        _m, _t, serial = ppo_init(jax.random.PRNGKey(s), ENV, PPO, TRAIN)
        tree_allclose(seed_slice(stacked.params, i), serial.params, rtol=0, atol=0)
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(seed_slice(stacked.key, i))),
            np.asarray(jax.random.key_data(serial.key)),
        )
        tree_allclose(
            seed_slice(stacked.env_states.x, i), serial.env_states.x, rtol=0, atol=0
        )


def test_stacked_step_tracks_serial_step():
    model, tx, stacked = multiseed_init(SEEDS, ENV, PPO, TRAIN)
    multi_step = jax.jit(make_multiseed_train_step(model, tx, ENV, PPO, TRAIN))
    stacked2, metrics = multi_step(stacked)
    assert metrics["loss"].shape == (len(SEEDS),)
    for i, s in enumerate(SEEDS):
        _m, _t, serial = ppo_init(jax.random.PRNGKey(s), ENV, PPO, TRAIN)
        step = jax.jit(make_train_step(model, tx, ENV, PPO, TRAIN))
        serial2, m = step(serial)
        tree_allclose(seed_slice(stacked2.params, i), serial2.params,
                      rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            float(metrics["loss"][i]), float(m["loss"]), rtol=1e-4
        )


def test_stacked_loop_shapes_and_progress():
    model, tx, stacked = multiseed_init(SEEDS, ENV, PPO, TRAIN)
    loop = jax.jit(make_multiseed_train_loop(model, tx, ENV, PPO, TRAIN, inner=3))
    stacked, metrics = loop(stacked)
    assert metrics["loss"].shape == (3, len(SEEDS))
    assert bool(jnp.all(jnp.isfinite(metrics["loss"])))
    assert int(stacked.update_i[0]) == 3
    evals = jax.jit(make_multiseed_eval_fn(model, ENV, episodes=4))(
        stacked.params, jax.vmap(jax.random.PRNGKey)(jnp.arange(len(SEEDS)))
    )
    assert evals["eval_reward"].shape == (len(SEEDS),)


def test_stacked_lr_grid_tracks_serial_lrs():
    """Per-replica learning rates (optax.inject_hyperparams): a stacked
    LR grid must match each serial run at that LR (reference lr_test ran
    one cluster job per cell)."""
    lrs = [1e-3, 1e-5]
    model, tx, stacked = multiseed_init([0, 0], ENV, PPO, TRAIN, lrs=lrs)
    multi_step = jax.jit(make_multiseed_train_step(model, tx, ENV, PPO, TRAIN))
    stacked2, metrics = multi_step(stacked)
    from autonomous_quadrotor_environment_tpu.config import PPOConfig as _PPO

    for i, lr in enumerate(lrs):
        cfg = _PPO(k_epochs=PPO.k_epochs, minibatch_size=0, lr=lr)
        _m, _t2, serial = ppo_init(jax.random.PRNGKey(0), ENV, cfg, TRAIN)
        from autonomous_quadrotor_environment_tpu.agents.ppo import make_optimizer

        step = jax.jit(make_train_step(model, make_optimizer(cfg), ENV, cfg, TRAIN))
        serial2, _ = step(serial)
        tree_allclose(seed_slice(stacked2.params, i), serial2.params,
                      rtol=1e-4, atol=1e-6)
    # The two replicas must actually differ (the big-LR one moved more).
    d0 = jax.tree.leaves(seed_slice(stacked2.params, 0))[0]
    d1 = jax.tree.leaves(seed_slice(stacked2.params, 1))[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    with pytest.raises(ValueError, match="lrs for"):
        multiseed_init([0, 1, 2], ENV, PPO, TRAIN, lrs=[1e-3])


def test_fused_configs_refused():
    with pytest.raises(ValueError, match="multiseed"):
        make_multiseed_train_step(
            None, None, ENV, PPOConfig(fused_update=True), TRAIN
        )
    with pytest.raises(ValueError, match="multiseed"):
        make_multiseed_train_step(
            None, None, ENV, PPO, TrainConfig(num_envs=8, fused_rollout=True)
        )


def test_seed_parallel_mesh_no_collectives():
    """Seed axis sharded over the dp mesh: linear scaling by construction —
    the compiled program must contain ZERO collectives (seed studies are
    embarrassingly parallel, unlike the gradient-pmean dp trainer), and the
    result must match the unsharded stacked loop."""
    from autonomous_quadrotor_environment_tpu.agents import make_multiseed_train_loop
    from autonomous_quadrotor_environment_tpu.parallel import (
        make_dp_mesh,
        make_multiseed_parallel_train_loop,
        multiseed_init_sharded,
    )

    mesh = make_dp_mesh(8)
    seeds = list(range(8))
    model, tx, state = multiseed_init_sharded(seeds, ENV, PPO, TRAIN, mesh)
    loop = make_multiseed_parallel_train_loop(model, tx, ENV, PPO, TRAIN, mesh, inner=2)
    state2, metrics = loop(state)
    assert metrics["loss"].shape == (2, len(seeds))
    assert bool(jnp.all(jnp.isfinite(metrics["loss"])))
    assert "dp" in str(jax.tree.leaves(state2.params)[0].sharding)
    hlo = loop.lower(state).compile().as_text()
    for op in ("all-reduce", "all-gather", "collective-permute",
               "reduce-scatter", "all-to-all"):
        assert op not in hlo, f"unexpected collective {op} in seed-parallel HLO"
    _m, _t, s0 = multiseed_init(seeds, ENV, PPO, TRAIN)
    ref_loop = jax.jit(make_multiseed_train_loop(model, tx, ENV, PPO, TRAIN, 2))
    _ref, mref = ref_loop(s0)
    np.testing.assert_allclose(
        np.asarray(metrics["loss"]), np.asarray(mref["loss"]), rtol=1e-5
    )
    with pytest.raises(ValueError, match="shard evenly"):
        multiseed_init_sharded([0, 1, 2], ENV, PPO, TRAIN, mesh)


def test_seed_study_stacked_app(tmp_path):
    from autonomous_quadrotor_environment_tpu.apps import seed_study

    out = str(tmp_path / "study")
    summary = seed_study.main([
        "--stacked", "--seeds", "2", "--size", "16", "--updates", "4",
        "--eval-every", "2", "--num-envs", "8", "--rollout-steps", "8",
        "--eval-episodes", "4", "--out", out,
    ])
    assert summary["seeds"] == 2
    for s in (0, 1):
        csv_path = f"{out}/log_16_{s}.csv"
        assert os.path.exists(csv_path)
        with open(csv_path) as f:
            rows = f.read().strip().splitlines()
        assert len(rows) == 1 + 2  # header + one row per eval point
        assert os.path.exists(f"{out}/nn_final_16_{s}.msgpack")
    assert os.path.exists(f"{out}/summary.json")
    with open(f"{out}/summary.json") as f:
        json.load(f)


def test_stacked_study_matches_train_control_csv(tmp_path):
    """End-to-end cross-check: one seed trained via seed_study --stacked
    must reproduce the serial train_control app's CSV evals (same PRNG
    streams, same fold_in eval keys) to f32 tolerance."""
    from autonomous_quadrotor_environment_tpu.apps import seed_study, train_control

    serial_out = str(tmp_path / "serial")
    train_control.main([
        "--seed", "0", "--size", "16", "--updates", "4", "--num-envs", "8",
        "--rollout-steps", "8", "--eval-every", "2", "--eval-episodes", "4",
        "--out", serial_out,
    ])
    stacked_out = str(tmp_path / "stacked")
    seed_study.main([
        "--stacked", "--seeds", "1", "--size", "16", "--updates", "4",
        "--eval-every", "2", "--num-envs", "8", "--rollout-steps", "8",
        "--eval-episodes", "4", "--out", stacked_out,
    ])
    import csv as _csv

    def evals(path):
        with open(path) as f:
            return [(int(r["Training Count"]), float(r["Reward avg"]),
                     int(r["Total Episodes"])) for r in _csv.DictReader(f)]

    serial = evals(f"{serial_out}/log_16_0.csv")
    stacked = evals(f"{stacked_out}/log_16_0.csv")
    assert len(serial) == len(stacked) == 2
    for (su, sr, se), (tu, tr, te) in zip(serial, stacked):
        assert su == tu
        assert se == te
        np.testing.assert_allclose(sr, tr, rtol=1e-4)


def test_size_sweep_stacked_app(tmp_path):
    """One-command reproduction of the reference's headline experiment:
    per-size stacked seeds, band figure, per-size aggregates, and
    skip-complete resume."""
    from autonomous_quadrotor_environment_tpu.apps import size_sweep

    out = str(tmp_path / "sweep")
    argv = [
        "--stacked", "--sizes", "16", "--seeds", "2", "--updates", "4",
        "--eval-every", "2", "--num-envs", "8", "--rollout-steps", "8",
        "--eval-episodes", "4", "--out", out, "--figure", f"{out}/band.png",
    ]
    summary = size_sweep.main(argv)
    assert summary["16"]["seeds"] == 2
    assert os.path.exists(f"{out}/band.png")
    for s in (0, 1):
        assert os.path.exists(f"{out}/log_16_{s}.csv")
    # Resume: everything complete -> all skipped, summary still produced.
    summary2 = size_sweep.main(argv)
    assert summary2["16"] == summary["16"]


def test_lr_sweep_stacked_app(tmp_path):
    """The LR x seed grid as one program (apps/stacked.py cells carrying
    per-cell lrs); CSVs land in the per-LR subdirs the serial path and the
    analyzers expect, with the cell's own LR in the LR column."""
    from autonomous_quadrotor_environment_tpu.apps import lr_sweep

    out = str(tmp_path / "lr")
    summary = lr_sweep.main([
        "--stacked", "--lrs", "1e-3,1e-5", "--seeds", "2", "--size", "16",
        "--updates", "4", "--eval-every", "2", "--num-envs", "8",
        "--rollout-steps", "8", "--out", out,
    ])
    assert set(summary) == {"0.001", "1e-05"}
    import csv as _csv

    for lr in ("0.001", "1e-05"):
        for s in (0, 1):
            path = f"{out}/lr_{lr}/log_16_{s}.csv"
            assert os.path.exists(path), path
            with open(path) as f:
                rows = list(_csv.DictReader(f))
            assert len(rows) == 2
            assert float(rows[0]["LR"]) == float(lr)
    # Resume: a second stacked invocation must skip every completed cell.
    summary2 = lr_sweep.main([
        "--stacked", "--lrs", "1e-3,1e-5", "--seeds", "2", "--size", "16",
        "--updates", "4", "--eval-every", "2", "--num-envs", "8",
        "--rollout-steps", "8", "--out", out,
    ])
    assert set(summary2) == set(summary)


def test_stacked_save_at_solve_snapshots_first_latching_eval(tmp_path, monkeypatch):
    """run_stacked_study must save a cell's params AT its first latching
    eval (the reference's save-at-solve semantics, ppo.py:428-429;
    VERDICT r4 missing #3), not the final state it later degrades to.

    A scripted eval (distinguishing eval rounds via the fold_in key the
    runner passes) latches cell 0 at the FIRST eval while cell 1 holds out
    until the SECOND, so training continues past cell 0's latch. The
    solved checkpoint must then be bitwise the params an independent
    2-update multiseed loop produces, and differ from the final state."""
    from autonomous_quadrotor_environment_tpu.apps import stacked as st
    from autonomous_quadrotor_environment_tpu.utils import load_params

    seeds = [0, 3]
    first_eval_keys = jax.random.key_data(
        jax.vmap(jax.random.fold_in, in_axes=(0, None))(
            jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds, jnp.int32)), 2
        )
    )

    def fake_eval_factory(model, env_cfg, episodes=None):
        def fake(params, keys):
            is_first = jnp.all(jax.random.key_data(keys) == first_eval_keys)
            solved = jnp.stack([1.0, jnp.where(is_first, 0.0, 1.0)])
            return {
                "eval_reward": jnp.ones(2),
                "eval_solved": solved,
                "eval_length": jnp.full(2, 10.0),
            }

        return fake

    monkeypatch.setattr(st, "make_multiseed_eval_fn", fake_eval_factory)

    cells = [
        st.StackedCell(
            seed=s,
            csv_path=f"{tmp_path}/log_16_{s}.csv",
            jsonl_path=f"{tmp_path}/train_16_{s}.jsonl",
            ckpt_path=f"{tmp_path}/nn_final_16_{s}.msgpack",
            solved_ckpt_path=f"{tmp_path}/nn_solved_16_{s}.msgpack",
        )
        for s in seeds
    ]
    st.run_stacked_study(
        cells, ENV, PPO, TRAIN, updates=4, eval_every=2, eval_episodes=4,
        solved_threshold=0.95,
    )

    # Ground truth: params after exactly 2 updates, same seeds/config.
    model, tx, state = multiseed_init(seeds, ENV, PPO, TRAIN)
    loop = jax.jit(make_multiseed_train_loop(model, tx, ENV, PPO, TRAIN, inner=2))
    state2, _ = loop(state)

    tmpl0 = seed_slice(state2.params, 0)
    snap0 = load_params(cells[0].solved_ckpt_path, tmpl0)
    tree_allclose(snap0, tmpl0, rtol=0, atol=0)  # saved AT the latch
    final0 = load_params(cells[0].ckpt_path, tmpl0)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(snap0), jax.tree.leaves(final0))
    )  # training continued past the latch; final differs
    # cell 1 latched at the LAST eval: snapshot == final there.
    tmpl1 = seed_slice(state2.params, 1)
    snap1 = load_params(cells[1].solved_ckpt_path, tmpl1)
    final1 = load_params(cells[1].ckpt_path, tmpl1)
    tree_allclose(snap1, final1, rtol=0, atol=0)
