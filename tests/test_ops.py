"""Pallas kernels vs their jnp reference implementations (interpret mode on
the CPU suite; compiled on TPU via the verify smoke)."""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_quadrotor_environment_tpu.config import CameraConfig, MarkerConfig
from autonomous_quadrotor_environment_tpu.ops import render_nadir_batch_pallas
from autonomous_quadrotor_environment_tpu.render import make_camera, render_nadir


def test_fused_ppo_grad_matches_xla():
    """The fused Pallas PPO update kernel reproduces
    jax.value_and_grad(ppo_loss) — loss, metrics, and every parameter
    gradient — on a shuffled block minibatch (the integration contract of
    PPOConfig.fused_update)."""
    from autonomous_quadrotor_environment_tpu.agents.networks import ActorCritic
    from autonomous_quadrotor_environment_tpu.agents.ppo import ppo_loss
    from autonomous_quadrotor_environment_tpu.config import PPOConfig
    from autonomous_quadrotor_environment_tpu.ops.ppo_fused import (
        fused_ppo_grad,
        pack_aux,
    )

    cfg = PPOConfig()
    tile, n_blocks, n = 8, 6, 96  # minibatch 48 of 96 rows, blocks of 8
    model = ActorCritic(hidden=32, action_std=cfg.action_std)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 75)))

    ks = jax.random.split(key, 6)
    obs = jax.random.normal(ks[0], (n, 75))
    actions = jnp.tanh(jax.random.normal(ks[1], (n, 4))) * 0.5
    # realistic old logprobs: evaluate the model on the obs plus noise so
    # ratios land both inside and outside the clip band
    mean, _, log_std = model.apply(params, obs)
    z = (actions - mean) / jnp.exp(log_std)
    old_lp = (
        -0.5 * z**2 - log_std - 0.5 * np.log(2 * np.pi)
        + jax.random.normal(ks[2], (n, 4)) * 0.2
    )
    rets = jax.random.normal(ks[3], (n,))
    advs = jax.random.normal(ks[4], (n,))
    perm = jax.random.permutation(ks[5], n // tile)[:n_blocks]

    rows = (perm[:, None] * tile + jnp.arange(tile)[None, :]).reshape(-1)

    def reference(dtype):
        p = jax.tree.map(lambda a: a.astype(dtype), params)
        return jax.value_and_grad(
            lambda pp: ppo_loss(
                model, pp, obs[rows].astype(dtype), actions[rows].astype(dtype),
                old_lp[rows].astype(dtype), rets[rows].astype(dtype),
                advs[rows].astype(dtype), cfg,
            ),
            has_aux=True,
        )(p)

    (want_loss, want_metrics), want_grads = reference(jnp.float32)

    aux = pack_aux(actions, old_lp, rets, advs)
    loss, metrics, grads = fused_ppo_grad(
        params, obs, aux, perm.astype(jnp.int32),
        tile=tile, action_std=cfg.action_std, clip_eps=cfg.clip_eps,
        entropy_coef=cfg.entropy_coef, interpret=True,
    )

    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    for k in ("actor_loss", "critic_loss", "entropy", "ratio_max"):
        np.testing.assert_allclose(
            float(metrics[k]), float(want_metrics[k]), rtol=1e-5, err_msg=k
        )
    flat_want = jax.tree.leaves(want_grads)
    flat_got = jax.tree.leaves(grads)
    assert len(flat_want) == len(flat_got) == 12

    # The kernel accumulates per row-block while XLA reduces one big batch,
    # so they differ by f32 summation-order noise (~2e-5 abs on the largest
    # grads). Calibrate against a float64 ground truth: the kernel must be
    # as close to the truth as XLA's own f32 evaluation (3x slack + eps).
    jax.config.update("jax_enable_x64", True)
    try:
        (_, _), true_grads = reference(jnp.float64)
    finally:
        jax.config.update("jax_enable_x64", False)
    for gw, gg, gt in zip(flat_want, flat_got, jax.tree.leaves(true_grads)):
        assert gw.shape == gg.shape
        err_xla = np.max(np.abs(np.asarray(gw, np.float64) - np.asarray(gt)))
        err_pal = np.max(np.abs(np.asarray(gg, np.float64) - np.asarray(gt)))
        assert err_pal <= 3.0 * err_xla + 1e-6, (gw.shape, err_pal, err_xla)

    # Mixed-precision variant (compute_dtype="bf16", the TPU default via
    # PPOConfig.fused_compute): loss/metrics and gradient DIRECTION must
    # track the f32 truth within bf16 rounding (~1e-2 relative), since only
    # the matmul operands are cast — accumulation and elementwise stay f32.
    loss16, metrics16, grads16 = fused_ppo_grad(
        params, obs, aux, perm.astype(jnp.int32),
        tile=tile, action_std=cfg.action_std, clip_eps=cfg.clip_eps,
        entropy_coef=cfg.entropy_coef, interpret=True, compute_dtype="bf16",
    )
    np.testing.assert_allclose(float(loss16), float(want_loss), rtol=2e-2)
    for gg, gt in zip(jax.tree.leaves(grads16), jax.tree.leaves(true_grads)):
        a, b = np.asarray(gg, np.float64).ravel(), np.asarray(gt).ravel()
        scale = np.max(np.abs(b)) + 1e-8
        # 5e-2: three chained bf16 matmuls + the (value - return) critic
        # cancellation compound to ~3% worst-case on this fixture.
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-2)


def test_fused_update_integration_matches_xla():
    """PPOConfig.fused_update swaps the minibatch gradient into the Pallas
    kernel inside ppo_update's epoch/minibatch scans; the resulting params
    after K epochs of Adam steps must track the XLA path (identical shuffle
    keys, f32-noise tolerance)."""
    import dataclasses

    from autonomous_quadrotor_environment_tpu.agents.networks import ActorCritic
    from autonomous_quadrotor_environment_tpu.agents.ppo import (
        Rollout,
        make_optimizer,
        ppo_update,
    )
    from autonomous_quadrotor_environment_tpu.config import PPOConfig

    cfg = PPOConfig(minibatch_size=32, shuffle_block=8, k_epochs=3)
    T, B = 4, 16
    model = ActorCritic(hidden=32, action_std=cfg.action_std)
    key = jax.random.PRNGKey(1)
    params = model.init(key, jnp.zeros((1, 75)))
    tx = make_optimizer(cfg)

    ks = jax.random.split(key, 7)
    obs = jax.random.normal(ks[0], (T, B, 75))
    mean, values, log_std = jax.vmap(lambda o: model.apply(params, o))(obs)
    actions = mean + jax.random.normal(ks[1], (T, B, 4)) * jnp.exp(log_std)
    z = (actions - mean) / jnp.exp(log_std)
    logprobs = -0.5 * z**2 - log_std - 0.5 * np.log(2 * np.pi)
    roll = Rollout(
        obs=obs, actions=actions, logprobs=logprobs, values=values,
        rewards=jax.random.normal(ks[2], (T, B)),
        dones=jax.random.bernoulli(ks[3], 0.1, (T, B)),
        solved=jnp.zeros((T, B), bool),
    )
    bootstrap = jax.random.normal(ks[4], (B,))
    upd_key = ks[5]

    outs = {}
    for name, kw in (
        ("xla", dict(fused_update=False)),
        ("fused_f32", dict(fused_update=True, fused_compute="f32")),
        ("fused_bf16", dict(fused_update=True, fused_compute="bf16")),
        # In-kernel optax.adam (fused_ppo_grad_adam): must track the XLA
        # path as tightly as the plain fused kernel does.
        ("fused_adam", dict(fused_update=True, fused_adam=True)),
    ):
        c = dataclasses.replace(cfg, **kw)
        outs[name] = ppo_update(
            model, tx, params, tx.init(params), roll, bootstrap, upd_key, c
        )

    p_x, opt_x, m_x = outs["xla"]
    for variant in ("fused_f32", "fused_adam"):
        p_f, opt_f, m_f = outs[variant]
        for k in ("loss", "actor_loss", "critic_loss", "entropy", "ratio_max"):
            np.testing.assert_allclose(
                float(m_f[k]), float(m_x[k]), rtol=5e-4, err_msg=f"{variant}:{k}"
            )
        # Adam divides by sqrt(second moment), amplifying f32 grad noise
        # where gradients are tiny — compare updated params at step scale.
        for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=cfg.lr * 0.05, rtol=0,
                err_msg=variant,
            )
    # The in-kernel Adam must also reproduce optax's OPTIMIZER state.
    assert int(outs["fused_adam"][1][0].count) == int(opt_x[0].count)
    for a, b in zip(
        jax.tree.leaves(outs["fused_adam"][1][0].mu),
        jax.tree.leaves(opt_x[0].mu),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=0)
    # bf16 operands (the PPOConfig.fused_compute default): Adam normalizes
    # step magnitude to ~lr, and bf16 grad rounding can flip the direction
    # of near-zero gradients, so after K*n_mb=9 steps the two walks may
    # differ by a few steps on tiny-grad params — bound the drift at 5 lr.
    p_b, _, m_b = outs["fused_bf16"]
    np.testing.assert_allclose(float(m_b["loss"]), float(m_x["loss"]), rtol=2e-2)
    for a, b in zip(jax.tree.leaves(p_b), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=cfg.lr * 5.0, rtol=0
        )


def test_pallas_render_matches_jnp_renderer():
    cam_cfg = CameraConfig()
    marker = MarkerConfig()
    cam = make_camera(cam_cfg)
    quad = jnp.asarray(
        [[0.0, 0.0, -2.0], [0.5, -0.3, -3.5], [-1.0, 1.0, -1.0]], jnp.float32
    )
    mxy = jnp.asarray([[0.0, 0.0], [0.2, 0.1], [-0.4, 0.6]], jnp.float32)

    want = jax.vmap(lambda p, m: render_nadir(cam, p, m, marker))(quad, mxy)
    got = render_nadir_batch_pallas(quad, mxy, cam_cfg, marker, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
