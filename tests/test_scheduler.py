"""Flow-match Euler schedule tests (golden values derived from the published
rectified-flow math the diffusers scheduler implements)."""

import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import SchedulerConfig
from dit4sr_tpu.schedulers.flow_match import (
    make_schedule,
    sample_logit_normal_sigmas,
    train_sigmas,
)


def test_train_sigmas_endpoints():
    cfg = SchedulerConfig()
    s = train_sigmas(cfg)
    assert s.shape == (1000,)
    # shift(1.0) = 1.0 ; shift(0.001) = 3*0.001/(1+2*0.001)
    np.testing.assert_allclose(s[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(s[-1], 3 * 0.001 / (1 + 2 * 0.001), rtol=1e-5)
    assert np.all(np.diff(s) < 0)


def test_schedule_shapes_and_terminal_zero():
    sched = make_schedule(SchedulerConfig(), 28)
    assert sched.sigmas.shape == (29,)
    assert sched.timesteps.shape == (28,)
    assert float(sched.sigmas[-1]) == 0.0
    np.testing.assert_allclose(float(sched.sigmas[0]), 1.0, atol=1e-6)


def test_euler_step_reaches_data_in_one_full_step():
    """With sigma going 1 -> 0 and a perfect velocity (noise - x), one Euler
    step recovers x exactly: x1 = noise + (0-1)*(noise-x) = x."""
    sched = make_schedule(SchedulerConfig(), 1)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 3)), jnp.float32)
    noise = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 4, 3)), jnp.float32)
    v = noise - x
    out = sched.step(0, noise, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_logit_normal_sampling_in_range():
    import jax

    cfg = SchedulerConfig()
    sig, ts = sample_logit_normal_sigmas(jax.random.PRNGKey(0), 512, cfg)
    s = np.asarray(sig)
    assert s.min() > 0.0 and s.max() <= 1.0
    np.testing.assert_allclose(np.asarray(ts), s * 1000)
    # logit-normal mass concentrates mid-range
    assert 0.3 < np.median(s) < 0.85
