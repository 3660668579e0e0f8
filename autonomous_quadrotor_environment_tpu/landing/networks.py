"""Landing CNN actor-critic.

Capability match for the reference's `rl_nn_model_v2`
(reference: visual_landing/rl_nn_model_v2.py:62-246):

  conv trunk: 3->64 k8 s4, 64->128 k4 s2, 128->128 k3 s1 (all VALID, tanh),
              flatten 128*7*7 -> fc 768 tanh                     (:67-96)
  actor:  concat(conv(image), sens 75) -> fc 768 tanh -> fc 3 tanh (:130-150)
  critic: concat(conv(image), sens, action 3) -> fc 768 tanh -> fc 1
          (action-conditioned, Q-like)                            (:152-182)
  shared learned scalar std, diagonal Gaussian (MultivariateNormal with
  cov = std^2 I => joint log-prob)                                (:216-221)

TPU-first: NHWC layout (flax default — feeds the conv MXU path directly),
bfloat16-capable compute dtype, separate conv trunks for actor and critic
like the reference (conv_ac / conv_ct).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


class ConvTrunk(nn.Module):
    """84x84x3 -> 768 feature vector (reference conv_forward :62-96).

    ``space_to_depth``: fold 4x4 pixel blocks into channels before the
    first conv — (84,84,3) -> (21,21,48) with an 8x8/stride-4 conv becoming
    a 2x2/stride-1 conv. Mathematically ISOMORPHIC (the kernel is the same
    weights under a fixed permutation; pinned in tests/test_landing.py),
    but the MXU sees 48 input channels instead of 3 against its 128-lane
    contraction padding. TPU-standard first-layer trick for small-channel
    images.
    """

    dtype: jnp.dtype = jnp.float32
    space_to_depth: bool = False

    @nn.compact
    def __call__(self, img):  # (..., 84, 84, 3)
        kw = dict(
            padding="VALID",
            dtype=self.dtype,
            kernel_init=nn.initializers.orthogonal(math.sqrt(2.0)),
        )
        if self.space_to_depth:
            from einops import rearrange

            x = rearrange(
                img, "... (h p1) (w p2) c -> ... h w (p1 p2 c)", p1=4, p2=4
            )
            x = jnp.tanh(nn.Conv(64, (2, 2), strides=(1, 1), **kw)(x))
        else:
            x = jnp.tanh(nn.Conv(64, (8, 8), strides=(4, 4), **kw)(img))
        x = jnp.tanh(nn.Conv(128, (4, 4), strides=(2, 2), **kw)(x))
        x = jnp.tanh(nn.Conv(128, (3, 3), strides=(1, 1), **kw)(x))
        x = x.reshape(x.shape[:-3] + (-1,))  # 7*7*128
        x = jnp.tanh(
            nn.Dense(
                768, dtype=self.dtype, kernel_init=nn.initializers.orthogonal(math.sqrt(2.0))
            )(x)
        )
        return x


class ConvTrunk3D(nn.Module):
    """Stacked-frame 3D-conv trunk (reference conv3D_forward :98-127,
    disabled by default there via conv_3D=False, rl_worker.py:27).

    Input (..., T, H, W, 3): T past frames (the reference selects frames
    [6,5,2,1,0] from a 7-deep ring, rl_worker.py:29). Same kernel/pool
    family as the reference: Conv3D(60, k=(2,3,3), SAME-spatial) -> tanh ->
    avgpool (1,3,3) -> Conv3D(120, k=(2,3,3)) -> tanh -> avgpool (2,3,3) ->
    fc 768 tanh. The fc width is inferred from the actual flatten — the
    reference hardcodes 120*8^2, which mismatches its own trace (a latent
    bug in dead code, deliberately not replicated).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (..., T, H, W, C)
        kw = dict(dtype=self.dtype, kernel_init=nn.initializers.orthogonal(math.sqrt(2.0)))
        x = jnp.tanh(
            nn.Conv(60, (2, 3, 3), strides=(1, 1, 1), padding=((0, 0), (1, 1), (1, 1)), **kw)(x)
        )
        x = nn.avg_pool(x, (1, 3, 3), strides=(1, 3, 3))
        x = jnp.tanh(
            nn.Conv(120, (2, 3, 3), strides=(1, 1, 1), padding=((0, 0), (1, 1), (1, 1)), **kw)(x)
        )
        x = nn.avg_pool(x, (2, 3, 3), strides=(2, 3, 3))
        x = x.reshape(x.shape[:-4] + (-1,))
        return jnp.tanh(nn.Dense(768, **kw)(x))


class ImageHistory:
    """Fixed-depth image ring buffer for the stacked-frame variant
    (reference image_roll, rl_worker.py:190-205): newest frame at index 0."""

    @staticmethod
    def init(depth: int, h: int = 84, w: int = 84, c: int = 3, dtype=jnp.float32):
        return jnp.zeros((depth, h, w, c), dtype)

    @staticmethod
    def push(buf: jnp.ndarray, frame: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([frame[None], buf[:-1]], axis=0)

    @staticmethod
    def select(buf: jnp.ndarray, times=(6, 5, 2, 1, 0)) -> jnp.ndarray:
        """The reference's T_visual_time frame selection (rl_worker.py:29)."""
        return buf[jnp.asarray(times)]


def detect_s2d(path: str) -> bool:
    """Does a saved LandingActorCritic checkpoint use the space-to-depth
    first-conv layout? Decided from the stored first-conv kernel shape
    ((2,2,48,64) vs (8,8,3,64)) so callers can build the matching model
    without a flag — old plain fixtures and new s2d checkpoints both load
    transparently (apps/eval_landing.py, fixtures.load_landing_policy)."""
    import numpy as np
    from flax import serialization

    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    k = np.asarray(tree["params"]["conv_ac"]["Conv_0"]["kernel"])
    return k.shape[:2] == (2, 2)


def params_to_s2d(params):
    """Convert plain-ConvTrunk LandingActorCritic params to the
    space-to-depth layout (ConvTrunk.space_to_depth): the 8x8x3 first-conv
    kernels become 2x2x48 under the fixed block permutation. Outputs are
    bitwise the same function (pinned in tests/test_landing.py), so
    existing checkpoints/fixtures serve unchanged under the MXU-friendly
    layout."""
    from einops import rearrange

    # Dict deep-copy preserving array leaves by reference.
    def _copy(d):
        return {k: _copy(v) if isinstance(v, dict) else v for k, v in d.items()}

    out = _copy(params)
    for trunk in ("conv_ac", "conv_ct"):
        k = out["params"][trunk]["Conv_0"]["kernel"]
        out["params"][trunk]["Conv_0"]["kernel"] = rearrange(
            k, "(di p1) (dj p2) c o -> di dj (p1 p2 c) o", p1=4, p2=4
        )
    return out


def params_from_s2d(params):
    """Inverse of :func:`params_to_s2d` — unfold the (2,2,48,64) s2d
    first-conv kernels back to the plain (8,8,3,64) layout (same fixed
    permutation, so round-tripping is bitwise)."""
    from einops import rearrange

    def _copy(d):
        return {k: _copy(v) if isinstance(v, dict) else v for k, v in d.items()}

    out = _copy(params)
    for trunk in ("conv_ac", "conv_ct"):
        k = out["params"][trunk]["Conv_0"]["kernel"]
        out["params"][trunk]["Conv_0"]["kernel"] = rearrange(
            k, "di dj (p1 p2 c) o -> (di p1) (dj p2) c o", p1=4, p2=4
        )
    return out


class LandingActorCritic(nn.Module):
    """(image, sens) -> (action mean (3,), q-value, log_std)."""

    action_std: float = 0.1
    conv_3d: bool = False   # stacked-frame variant (reference conv_3D flag)
    conv_s2d: bool = False  # space-to-depth first conv (ConvTrunk docstring)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.conv_3d:
            self.conv_ac = ConvTrunk3D(dtype=self.dtype)
            self.conv_ct = ConvTrunk3D(dtype=self.dtype)
        else:
            self.conv_ac = ConvTrunk(dtype=self.dtype, space_to_depth=self.conv_s2d)
            self.conv_ct = ConvTrunk(dtype=self.dtype, space_to_depth=self.conv_s2d)
        self.actor_fc1 = nn.Dense(
            768, dtype=self.dtype, kernel_init=nn.initializers.orthogonal(math.sqrt(2.0))
        )
        self.actor_out = nn.Dense(
            3, dtype=self.dtype, kernel_init=nn.initializers.orthogonal(0.01)
        )
        self.critic_fc1 = nn.Dense(
            768, dtype=self.dtype, kernel_init=nn.initializers.orthogonal(math.sqrt(2.0))
        )
        self.critic_out = nn.Dense(
            1, dtype=self.dtype, kernel_init=nn.initializers.orthogonal(1.0)
        )
        # ALWAYS f32, never self.dtype: flax's `dtype` is the COMPUTE dtype
        # (Conv/Dense master params stay f32 via param_dtype), and this
        # directly-created param must match. Round-5 postmortem: with
        # dtype=bf16 this param was stored in bf16, whose ~0.0156 ulp at
        # log(0.1) swallows every lr=2e-5 Adam update — the learned std was
        # silently FROZEN in every bf16 run since round 3 (the healthy f32
        # fixture runs show entropy evolving -2.62 -> -2.18; the collapsed
        # round-5 retrain sat at exactly -2.625 for 8000 updates).
        self.log_std = self.param(
            "log_std", lambda _k: jnp.full((), math.log(self.action_std), jnp.float32)
        )

    def actor(self, image, sens):
        x = self.conv_ac(image)
        x = jnp.concatenate([x, sens], axis=-1)
        x = jnp.tanh(self.actor_fc1(x))
        return jnp.tanh(self.actor_out(x))

    def critic(self, image, sens, action):
        x = self.conv_ct(image)
        x = jnp.concatenate([x, sens, action], axis=-1)
        x = jnp.tanh(self.critic_fc1(x))
        return jnp.squeeze(self.critic_out(x), -1)

    def __call__(self, image, sens, action=None):
        mean = self.actor(image, sens)
        value = self.critic(image, sens, mean if action is None else action)
        return mean, value, self.log_std
