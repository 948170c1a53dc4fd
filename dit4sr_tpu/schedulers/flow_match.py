"""Flow-match Euler discrete schedule as pure functions.

TPU-native replacement for the stateful diffusers FlowMatchEulerDiscreteScheduler
the reference instantiates twice (initialize.py:316-318): the schedule is a
static array pytree built on host, and `step` is a pure function usable inside
`lax.scan`.

Math (SD3 rectified flow):
  * training sigmas: s = t/1000 for t in [1000..1], time-shifted
    s' = shift*s / (1 + (shift-1)*s)  with shift=3.0 for SD3.5-medium;
  * noising: z_t = (1-s)*x + s*noise  (train_dit4sr.py:260-261);
  * model predicts velocity v = noise - x; Euler step
    x_{i+1} = x_i + (s_{i+1} - s_i) * v.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import SchedulerConfig


def _time_shift(shift: float, sigmas: np.ndarray) -> np.ndarray:
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


class FlowMatchSchedule(NamedTuple):
    """Inference schedule: `sigmas` has num_steps+1 entries (terminal 0)."""

    sigmas: jnp.ndarray      # (N+1,)
    timesteps: jnp.ndarray   # (N,) = sigmas[:-1] * num_train_timesteps

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    def step(self, i: jnp.ndarray, sample: jnp.ndarray, velocity: jnp.ndarray):
        """One Euler step in fp32 (the reference scheduler also steps in fp32)."""
        ds = self.sigmas[i + 1] - self.sigmas[i]
        out = sample.astype(jnp.float32) + ds * velocity.astype(jnp.float32)
        return out.astype(sample.dtype)


def train_sigmas(cfg: SchedulerConfig) -> np.ndarray:
    """The num_train_timesteps-entry shifted sigma table used for training
    (descending, sigma[0] ~= 1)."""
    t = np.linspace(1, cfg.num_train_timesteps, cfg.num_train_timesteps)[::-1]
    return _time_shift(cfg.shift, t / cfg.num_train_timesteps).astype(np.float32)


def make_schedule(cfg: SchedulerConfig, num_steps: int) -> FlowMatchSchedule:
    """Inference schedule for `num_steps` Euler steps.

    Mirrors diffusers set_timesteps: linspace from sigma_max to the smallest
    train sigma in unshifted t-space, then the same time shift, with a final 0.
    """
    table = train_sigmas(cfg)
    sigma_max, sigma_min = float(table[0]), float(table[-1])
    n = cfg.num_train_timesteps
    ts = np.linspace(sigma_max * n, sigma_min * n, num_steps)
    sigmas = _time_shift(cfg.shift, ts / n)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    timesteps = (sigmas[:-1] * n).astype(np.float32)
    return FlowMatchSchedule(jnp.asarray(sigmas), jnp.asarray(timesteps))


def sample_logit_normal_sigmas(
    rng,
    batch: int,
    cfg: SchedulerConfig,
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
):
    """Logit-normal timestep density for training (train_dit4sr.py:247-256;
    diffusers compute_density_for_timestep_sampling with weighting_scheme=
    'logit_normal'). Returns (sigmas, timesteps), both (batch,)."""
    import jax

    u = jax.random.normal(rng, (batch,)) * logit_std + logit_mean
    u = jax.nn.sigmoid(u)
    table = jnp.asarray(train_sigmas(cfg))
    idx = (u * cfg.num_train_timesteps).astype(jnp.int32)
    idx = jnp.clip(idx, 0, cfg.num_train_timesteps - 1)
    sigmas = table[idx]
    timesteps = sigmas * cfg.num_train_timesteps
    return sigmas, timesteps
