"""TPU-native autonomous quadrotor environment & learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``rafaelcostafrf/autonomous_quadrotor_environment``: quaternion rigid-body
flight dynamics, PPO-trained state-feedback controllers, classical PID/LQR
baselines, simulated IMU/GPS/TRIAD sensors, an on-device camera renderer,
a checkerboard PnP computer-vision pose pipeline, and a hierarchical
vision-based landing policy — all expressed as pure functions that are
`vmap`-able over thousands of parallel quadrotors, `scan`-able over time
and `pjit`-able over TPU device meshes.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):

    core/      quaternion math, rigid-body dynamics, RK4, domain randomization
    envs/      batched hover/position env, sensor suite, rewards, featurizer
    agents/    Flax actor-critic MLP + PPO (GAE, clipped surrogate, rollouts)
    baselines/ cascaded PID, velocity PID, LQR
    missions/  reference trajectories, target tables, response metrics
    render/    pinhole-camera projective ground/marker renderer (on-device)
    vision/    corner detection, Gauss-Newton PnP, calibration, fusion
    landing/   hierarchical visual-landing env, CNN policy, PPO, PI oracle
    parallel/  mesh construction and shard_map data parallelism
    ops/       Pallas TPU kernels
    native/    C++ host-side chase-cam preview renderer (ctypes)
    fixtures/  shipped trained checkpoints (solved controller, landing CNN)
    analysis/  offline log analyzers
    utils/     metrics logging, checkpointing, timing, memory debug
    apps/      CLI entry points (training, eval, benchmarks, manual flight)
"""

__version__ = "0.1.0"
