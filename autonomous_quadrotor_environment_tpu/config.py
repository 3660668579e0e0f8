"""Typed configuration tree for the whole framework.

The reference scatters its configuration across module-level constant blocks
(reference: environment/quadrotor_env.py:30-81, environment/controller/ppo.py:297-318,
visual_landing/rl_worker.py:25-66, visual_landing/ppo_trainer.py:28-38) and one
anti-pattern — detecting train vs. eval by inspecting the caller's file path
(quadrotor_env_opt.py:73-76). Here everything is an explicit frozen dataclass:
static fields feed `jit` as compile-time constants; per-episode randomized
physics live in pytrees (see core/randomization.py).
"""

from __future__ import annotations

import dataclasses
import math


# ---------------------------------------------------------------------------
# Physics constants (reference environment/quadrotor_env.py:30-67)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PhysicsConfig:
    """Quadrotor physical constants. Static under jit."""

    mass: float = 1.03            # M  [kg]
    gravity: float = 9.82         # G  [m/s^2]
    rho: float = 1.2041           # air density [kg/m^3]
    c_d: float = 1.1              # drag coefficient
    k_f: float = 1.435e-5         # motor thrust constant  [N/(rad/s)^2]
    k_m: float = 2.4086e-7        # motor moment constant  [N*m/(rad/s)^2]
    i_r: float = 5e-5             # rotor inertia [kg*m^2]
    t2wr: float = 2.0             # thrust-to-weight ratio
    j_xx: float = 16.83e-3        # inertia diagonal [kg*m^2]
    j_yy: float = 16.83e-3
    j_zz: float = 28.34e-3
    d_arm: float = 0.26           # motor distance to CG [m]
    beam_thickness: float = 0.05  # projected-area beam thickness [m]

    @property
    def area(self) -> tuple:
        """Projected areas (A_X, A_Y, A_Z) — reference quadrotor_env.py:62-66."""
        a_xy = self.beam_thickness * 2 * self.d_arm
        return (a_xy, a_xy, a_xy * 2)

    @property
    def max_motor_thrust(self) -> float:
        """Per-motor thrust ceiling T2WR*M*G/4 (reference quadrotor_env.py:219)."""
        return self.t2wr * self.mass * self.gravity / 4.0

    @property
    def hover_action_direct(self) -> float:
        """Neutral direct-mode action 2/T2WR - 1 (reference quadrotor_env.py:165)."""
        return 2.0 / self.t2wr - 1.0

    @property
    def arm_drag_sum(self) -> float:
        """sum(x_k^3) for x_k = linspace(0, D, 10) — the closed form of the
        reference's 10-segment arm-drag discretization (quadrotor_env.py:178-180,
        331-338). With x_k = D*k/9, sum x_k^3 = D^3/9^3 * sum_{k=0}^{9} k^3."""
        return self.d_arm**3 / 9.0**3 * sum(k**3 for k in range(10))


# ---------------------------------------------------------------------------
# Domain randomization (reference quadrotor_env.py:84-109 `robust_control`)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RandomizationConfig:
    """Magnitudes of per-episode physics perturbations and wind gusts."""

    enabled: bool = False
    d_kf: float = 0.1       # motor-constant degradation, U[0, d_kf) per motor
    d_m: float = 0.3        # mass factor, N(0, d_m)
    d_ir: float = 0.1       # rotor-inertia factor, U[0, d_ir) per motor
    d_j: float = 0.1        # inertia-diagonal factor, N(0, d_j) per axis
    gust_std: tuple = (5.0, 5.0, 2.0)  # wind gust std per axis [m/s]
    gust_period: int = 500  # integration steps between gust resamples
    # Per-EPISODE severity sampling: each reset draws s ~ U[0, 1] and scales
    # every perturbation magnitude (incl. mid-episode wind gusts, via
    # DomainParams.gust_scale) by s. Training then sees the full
    # calm-to-windy spectrum in every batch, so late robust training cannot
    # forget the calm regime — the failure mode of a staged curriculum
    # (round-2/3 result: staged curricula plateau at ~93-94% calm strict).
    # Composes with .scaled(): the stage severity becomes the UPPER bound.
    severity_sample: bool = False

    def scaled(self, severity: float) -> "RandomizationConfig":
        """Curriculum stage: all perturbation magnitudes scaled by
        ``severity`` in [0, 1] (0 = calm, 1 = the reference's full
        robust_control). Used by train_control --robust --curriculum."""
        return dataclasses.replace(
            self,
            enabled=self.enabled and severity > 0.0,
            d_kf=self.d_kf * severity,
            d_m=self.d_m * severity,
            d_ir=self.d_ir * severity,
            d_j=self.d_j * severity,
            gust_std=tuple(g * severity for g in self.gust_std),
        )


# ---------------------------------------------------------------------------
# Reward variants (reference quadrotor_env.py:69-81 vs quadrotor_env_opt.py:62-69)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RewardConfig:
    """Shaped hover/position reward. Defaults = primary training env."""

    solved_reward: float = 20.0
    broken_reward: float = -20.0
    # shaping = -(c0*|vel|/BB_VEL + c1*|psi|/4 + c2*|roll,pitch|/BB_ANG)
    # Primary env: SHAPING_WEIGHT/sum(W) * W = 5/20*(15,4,1) (quadrotor_env.py:529-531)
    # Opt env: 100*(1, 1, 0.3) (quadrotor_env_opt.py:437-440)
    shaping_coefs: tuple = (3.75, 1.0, 0.25)
    p_c: float = 0.003            # absolute control penalty
    tr: tuple = (0.005, 0.01, 0.1)       # cascading steady-state thresholds
    tr_p: tuple = (3.0, 2.0, 1.0)        # cascading bonuses
    # Primary env: inner cascade gate uses roll/pitch only, factor 4
    # (quadrotor_env.py:540); opt env: all 3 Euler angles, factor 2
    # (quadrotor_env_opt.py:450).
    cascade_ang_all3: bool = False
    cascade_ang_factor: float = 4.0
    # Terminal semantics: primary env *adds* solved/broken rewards
    # (quadrotor_env.py:563-572); opt env *replaces* (quadrotor_env_opt.py:470-480).
    terminal_replaces: bool = False

    @staticmethod
    def opt_variant() -> "RewardConfig":
        """The visual-landing worker's env reward (quadrotor_env_opt.py:62-69,
        :437-480): ~10x larger scale, replace-style terminal rewards."""
        return RewardConfig(
            solved_reward=500.0,
            broken_reward=-200.0,
            shaping_coefs=(100.0, 100.0, 30.0),
            p_c=1.0,
            tr=(0.001, 0.01, 0.1),
            tr_p=(300.0, 100.0, 10.0),
            cascade_ang_all3=True,
            cascade_ang_factor=2.0,
            terminal_replaces=True,
        )


# ---------------------------------------------------------------------------
# Environment
# ---------------------------------------------------------------------------

BB_POS = 5.0
BB_VEL = 10.0
BB_ANG = math.pi / 2


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Hover/position environment. All fields static under jit.

    Mirrors `quad.__init__` (reference quadrotor_env.py:111-187) plus the opt
    variant's differences (quadrotor_env_opt.py:95-104).
    """

    dt: float = 0.01              # integration time step [s]
    n_steps: int = 1000           # max env steps per episode (excl. warmup)
    warmup: int = 5               # T initial zero-action steps (reference T)
    hist_t: int = 5               # featurizer window length (obs = hist_t*15)
    direct_control: bool = True   # per-motor [-1,1] vs [F, Mx, My, Mz]
    clipped: bool = True          # motor clipping in indirect mode
    training: bool = True         # training mode: solve terminates episode
    rk_substeps: int = 1          # RK4 substeps per env step
    physics: PhysicsConfig = PhysicsConfig()
    reward: RewardConfig = RewardConfig()
    randomization: RandomizationConfig = RandomizationConfig()
    # Bounding boxes (reference quadrotor_env.py:139-145 vs opt :96-104):
    # checked against [|vel|(3), |euler|(3), |ang_vel|(3)].
    bb_vel: float = BB_VEL
    bb_ang_rp: float = BB_ANG
    bb_ang_psi: float = 3.0 / 4.0 * math.pi
    bb_ang_vel: float = BB_VEL * 2
    bb_scale: float = 1.0         # opt-env eval multiplies all bounds by 1000
    # (both reference env variants terminate at i >= n — the primary inside
    # reward_function :567-570, the opt inside done_condition :420-421 —
    # so timeout here is unconditional, envs/rewards.py:86)
    # opt env logs direct-mode step effort in Newtons, (a+1)*T2WR*M*G/8
    # (quadrotor_env_opt.py:384), primary env in normalized units (:474).
    effort_is_force: bool = False
    # Velocity-tracking task (the reference's dedicated velocity-trained
    # controllers: results/seeds/velocity_training/ checkpoints analyzed by
    # logger_analyzer.py:5-97; the frozen landing controller
    # PPO_continuous_drone_velocity_solved.pth is one of these). Per-episode
    # velocity target drawn U[-max, max] per axis; all-zero = hover task.
    # The policy observes state-minus-target (the reference's dl_input
    # convention, vel_control_ppo.py:129-137) and the reward/solve criteria
    # act on the velocity ERROR.
    vel_target_max: tuple = (0.0, 0.0, 0.0)

    @property
    def has_vel_target(self) -> bool:
        return any(m > 0.0 for m in self.vel_target_max)

    @property
    def max_steps(self) -> int:
        """Episode budget n + warmup (reference quadrotor_env.py:157)."""
        return self.n_steps + self.warmup

    @staticmethod
    def landing_variant(training: bool = True) -> "EnvConfig":
        """The opt env as used by the visual-landing worker
        (visual_landing/rl_worker.py:95: quad(0.01, 1500, 1, 5))."""
        return EnvConfig(
            dt=0.01,
            n_steps=1500,
            warmup=5,
            training=training,
            reward=RewardConfig.opt_variant(),
            bb_ang_psi=4.0,
            bb_ang_vel=BB_VEL * 3,
            bb_scale=1.0 if training else 1000.0,
            effort_is_force=True,
        )


# ---------------------------------------------------------------------------
# Sensors (reference quadrotor_env.py:587-591)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SensorConfig:
    accel_std: float = 0.1
    accel_bias_drift: float = 0.0005
    gyro_std: float = 0.035
    gyro_bias_drift: float = 0.00015
    magnet_std: float = 15.0
    magnet_bias_drift: float = 0.075
    gps_std_p: float = 1.71
    gps_std_v: float = 0.5
    enabled: bool = True          # reference `sensor.error` flag
    # Santo André magnetic vector in mG*0.01 (reference quadrotor_env.py:651-653)
    magnet_vec: tuple = (-40.47, 129.11, -98.99)


# ---------------------------------------------------------------------------
# PPO (reference ppo.py:297-318 and visual_landing/ppo_trainer.py:28-38)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PPOConfig:
    lr: float = 5e-4
    gamma: float = 0.99
    gae_lambda: float = 0.99
    clip_eps: float = 0.2
    entropy_coef: float = 0.006
    value_coef: float = 0.5
    k_epochs: int = 10
    minibatch_size: int = 0       # 0 = full batch (reference state PPO)
    action_std: float = 0.1
    learn_std: bool = False       # FIXED_STD=True in reference ppo.py:301
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    max_grad_norm: float = 0.0    # 0 = no clipping (reference has none)
    # Minibatch shuffling granularity: permute contiguous blocks of this many
    # rows instead of single rows. Rows are the flattened (T, B) batch, so a
    # block of adjacent rows is (mostly) different envs at one timestep —
    # i.i.d. samples already. Row-gathers of randomly permuted rows are ~5x
    # slower than block slices on TPU (measured: 425 ms vs 82 ms for the
    # K=10 x 131072-minibatch update at 2048x256). 1 = per-row permutation
    # (the reference's exact shuffle, ppo.py:176).
    shuffle_block: int = 128
    # Use the fused Pallas update kernel (ops/ppo_fused.py): forward + hand-
    # derived backward of one minibatch gradient step in a single HBM pass,
    # activations pinned in VMEM, the block shuffle expressed as the kernel's
    # DMA schedule. Only valid for the fixed-std ActorCritic (learn_std
    # False); ppo_update silently falls back to the XLA path when the batch
    # shape or model doesn't qualify.
    fused_update: bool = False
    # Matmul operand dtype inside the fused kernel ("f32" or "bf16").
    # Measured on-chip (runs/r3/bf16_probe.json): bf16 operands change
    # NOTHING (37.9 vs 37.6 ms/update) — the kernel is VPU-bound on
    # tanh/elementwise, not MXU-bound — so f32 (bit-identical to the XLA
    # path's math) stays the default. The bf16 path is kept, tested
    # (tests/test_ops.py) and quality-gated (same-seed 400-update training
    # curve matches) for models where the dots DO dominate.
    fused_compute: str = "f32"
    # Apply the optax.adam step inside the fused kernel's last grid step
    # (one pallas_call per COMPLETE minibatch gradient step; exact optax
    # semantics, pinned in tests/test_ops.py). Measured on-chip
    # (runs/r3/adam_probe.json): 40.0 vs 37.5 ms/update — the separate
    # optax step already overlaps into the kernel pipeline, and the fused
    # variant's 3x-larger I/O spec costs slightly more, so OFF by default;
    # kept as a tested capability (useful where dispatch overhead is real,
    # e.g. many tiny minibatches). Ignored under grad clipping, non-adam
    # optimizers, or the dp grad-reduction path.
    fused_adam: bool = False
    # Re-randomize minibatch composition ONCE per update: a single full-batch
    # row permutation (one gather) before the K epochs, after which
    # block == minibatch minibatches are contiguous slices. Restores fresh
    # random composition every update (vs FROZEN composition when
    # shuffle_block == minibatch, which splits the step-major rollout into
    # temporally-correlated fixed halves) at ~1/K the per-epoch gather cost.
    # Middle ground between the reference's per-epoch randperm
    # (ppo_trainer.py:188-197) and the round-4 contiguous-slice fast path.
    reshuffle_per_update: bool = False
    # EXACT reference shuffle semantics at amortized cost: one full-batch
    # row permutation per EPOCH (the reference's randperm), after which
    # minibatches are contiguous chunks of the permutation — the same
    # distribution as gathering each minibatch from a randperm, but the
    # data moves once per epoch instead of once per minibatch, and in
    # uint8 that stream is ~1/4 the round-3 f32 gather.
    reshuffle_per_epoch: bool = False

    @staticmethod
    def landing_variant() -> "PPOConfig":
        """Visual-landing PPO (reference ppo_trainer.py:28-38, :122).

        shuffle_block=1 is the reference's exact per-row randperm
        (ppo_trainer.py:188-197) and the round-5 CERTIFIED default: a full
        from-scratch training run under it (f32 rollout images + bf16
        conv) holds 100% in-training solved with no late collapse and
        scores 99%/98% on the official 100-episode benchmark
        (runs/r5/ablation/summary.json, arms f32_s0 / bf16conv_s0) — the
        shipped-fixture class. The round-4 frozen-composition fast path
        (shuffle_block == minibatch, 42k dec/s) FAILED that certification
        (74%/81%, late collapse) despite passing its 160-update curve
        gate, as did every uint8-image arm regardless of shuffle
        semantics; those modes remain reachable via train_landing flags
        with the risk documented. reshuffle_per_epoch offers the same
        randperm distribution with the gather amortized to once per epoch.
        """
        return PPOConfig(
            lr=2e-5,
            k_epochs=5,
            minibatch_size=1536,
            entropy_coef=0.01,
            learn_std=True,
            shuffle_block=1,
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Rollout/training-loop shape for the state controller."""

    num_envs: int = 64            # parallel envs per chip (vmap width)
    rollout_steps: int = 80       # steps per env per update (64*80≈5120 ≈ ref 5000)
    network_size: int = 128       # hidden width N (reference sweeps {16..256})
    hist_t: int = 5               # featurizer window T
    updates: int = 2000           # reference max_trainings=100 rounds of 20 eps
    eval_every: int = 5           # log_interval (reference ppo.py:310)
    eval_episodes: int = 40
    seed: int = 0
    # Fresh-episode pool per rollout for auto-reset (agents/ppo.rollout_batch);
    # 0 = exact per-step resets (recomputes the warmup scan every step).
    # Measured at 2048x256 on TPU: the hover env's physics is so cheap that
    # inline resets win (119.8 vs 144.7 ms/update) — default 0 here; the
    # landing trainer (10-frame intervals + render per reset) uses its pool.
    reset_pool: int = 0
    # Whole-rollout Pallas kernel (ops/rollout_fused.py): the T-step scan
    # runs as ONE pallas_call with per-step state resident in VMEM, replacing
    # ~30 XLA micro-kernels per step (the rollout was measured latency/HBM
    # bound at 131.9 ms of the 8192x256 train step, runs/r3/perf_probe.json).
    # Applies when ops.rollout_fused.supports() holds (direct control, no
    # randomization, fixed std); otherwise the XLA scan path runs. Auto-reset
    # uses a fused_pool-deep fresh-episode pool (same wrap-around semantics
    # as reset_pool).
    fused_rollout: bool = False
    fused_pool: int = 4


# ---------------------------------------------------------------------------
# Rendering / vision (reference img_2_cv.py:13-14, ppo_world_setup.py:92-103,
# visual_landing/rl_worker.py:37-66)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CameraConfig:
    width: int = 84
    height: int = 84
    film_w: float = 36.0          # mm (reference img_2_cv.py:13)
    film_h: float = 24.0
    focal: float = 35.0           # mm (onboard cam; chase cam uses 45)

    @property
    def fx(self) -> float:
        """Focal length in pixels along x."""
        return self.focal / self.film_w * self.width

    @property
    def fy(self) -> float:
        return self.focal / self.film_h * self.height


@dataclasses.dataclass(frozen=True)
class MarkerConfig:
    """Checkerboard landing marker (reference ppo_world_setup.py:97-103,
    computer_vision/detector_setup.py:10-15)."""

    cols: int = 9                 # inner corners
    rows: int = 6
    scale: float = 0.5
    sqr_size: float = 0.2046

    @property
    def square(self) -> float:
        """World-space square side = scale * sqr_size."""
        return self.scale * self.sqr_size


@dataclasses.dataclass(frozen=True)
class LandingConfig:
    """Hierarchical visual-landing task (reference rl_worker.py:25-66)."""

    total_steps: int = 1500       # physics steps per episode
    task_interval: int = 10       # physics steps per policy decision
    velocity_scale: tuple = (0.5, 0.5, 1.0)
    velocity_d: tuple = (0.0, 0.0, -1.0 / 1.5)
    image_size: int = 84
    image_channels: int = 3
    ground_z: float = -5.0        # landing plane in env world coords
    marker_std: float = 0.8       # marker position N(0, 0.8) in xy
    eval_episodes: int = 100      # reference rl_eval_worker.py:43
