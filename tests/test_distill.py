"""Progressive flow-matching distillation (train/distill.py).

The reference has no fast-sampling path (fixed 40-step protocol,
test/test.py:311); this capability is beyond-reference. Tests prove the
machinery: the teacher stays frozen, the loss is the right objective (it
decreases and the trained student tracks two teacher steps better than the
untrained one), and the phase ladder hands params down the 2x-halving
schedule into the existing sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dit4sr_tpu.config import SchedulerConfig, mmdit_tiny
from dit4sr_tpu.models.mmdit import init_mmdit
from dit4sr_tpu.train.distill import (
    distill_loss,
    distill_phases,
    make_distill_step,
)
from dit4sr_tpu.train.train_step import Batch, TrainState

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg = mmdit_tiny(sample_size=8)
    mmdit, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=8)
    rng = np.random.default_rng(0)
    batch = Batch(
        hq_latent=jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32),
        lq_latent=jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32),
        text_embeds=jnp.asarray(
            rng.normal(size=(2, 8, cfg.joint_attention_dim)), jnp.float32
        ),
        pooled_embeds=jnp.asarray(
            rng.normal(size=(2, cfg.pooled_projection_dim)), jnp.float32
        ),
    )
    return mmdit, params, batch


def _train(mmdit, teacher, batch, n_steps, num_student_steps=4, lr=2e-3):
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    step = jax.jit(
        make_distill_step(mmdit, tx, num_student_steps, SchedulerConfig())
    )
    state = TrainState(
        jax.tree.map(jnp.copy, teacher), tx.init(teacher),
        jnp.zeros((), jnp.int32),
    )
    losses = []
    for _ in range(n_steps):
        state, m = step(state, teacher, batch, jax.random.PRNGKey(7))
        losses.append(float(m["distill_loss"]))
    return state, losses


def test_step_trains_student_and_freezes_teacher(setup):
    mmdit, teacher, batch = setup
    teacher_before = jax.tree.map(np.asarray, teacher)
    state, losses = _train(mmdit, teacher, batch, n_steps=3)
    assert all(np.isfinite(losses))
    # teacher bitwise unchanged
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        teacher_before, teacher,
    )
    # student moved
    moved = jax.tree.map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        state.params, teacher,
    )
    assert any(jax.tree.leaves(moved))


def test_loss_decreases_and_student_tracks_two_teacher_steps(setup):
    """Minimizing the distillation objective at a fixed rng (fixed step
    indices + noise) must drive it well below its value at student==teacher
    — the student CAN track two teacher sub-steps with one step, and the
    gradient path through the loss is live. (Stochastic-rng training via
    make_distill_step is covered by test_step_trains_student_and_freezes
    _teacher; at 60 noisy b=2 steps its fixed-key eval is too flaky to
    assert a ratio on.)"""
    mmdit, teacher, batch = setup
    key = jax.random.PRNGKey(123)

    def objective(params):
        loss, _ = distill_loss(
            mmdit, params, teacher, batch, key, num_student_steps=4,
        )
        return loss

    tx = optax.adam(2e-3)
    grad_fn = jax.jit(jax.value_and_grad(objective))
    params = jax.tree.map(jnp.copy, teacher)
    opt_state = tx.init(params)
    before = float(objective(teacher))
    losses = []
    for _ in range(50):
        loss, grads = grad_fn(params)
        losses.append(float(loss))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    after = float(objective(params))
    assert np.isfinite(before) and before > 0
    assert after < 0.3 * before, (before, after, losses[-5:])


def test_precondition_weighting():
    """w = sigma^2 under preconditioning: the weighted loss can't exceed the
    unweighted velocity MSE (sigma <= 1)."""
    cfg = mmdit_tiny(sample_size=8)
    mmdit, params = init_mmdit(jax.random.PRNGKey(1), cfg, text_len=8)
    rng = np.random.default_rng(1)
    batch = Batch(
        hq_latent=jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32),
        lq_latent=jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32),
        text_embeds=jnp.asarray(
            rng.normal(size=(2, 8, cfg.joint_attention_dim)), jnp.float32
        ),
        pooled_embeds=jnp.asarray(
            rng.normal(size=(2, cfg.pooled_projection_dim)), jnp.float32
        ),
    )
    # student != teacher so the loss is nonzero
    student = jax.tree.map(lambda x: x * 1.01, params)
    loss_w, m = distill_loss(
        mmdit, student, params, batch, jax.random.PRNGKey(5),
        num_student_steps=4, precondition=True,
    )
    loss_u, _ = distill_loss(
        mmdit, student, params, batch, jax.random.PRNGKey(5),
        num_student_steps=4, precondition=False,
    )
    assert float(loss_w) <= float(loss_u) + 1e-6
    assert float(m["velocity_mse"]) == pytest.approx(float(loss_u), rel=1e-5)


def test_phase_ladder_hands_down_params(setup):
    mmdit, teacher, batch = setup

    def batches_fn():
        while True:
            yield batch

    seen = []
    results = distill_phases(
        mmdit, teacher,
        batches_fn=lambda: batches_fn(),
        steps_schedule=(8, 4, 2),
        train_steps_per_phase=2,
        rng=jax.random.PRNGKey(9),
        learning_rate=1e-3,
        on_phase_end=lambda r: seen.append(r.num_steps),
    )
    assert seen == [4, 2]
    assert len(results) == 2
    assert np.isfinite(results[-1].final_loss)
    # teacher survives the donated steps (the copy in distill_phases)
    assert not any(
        x.is_deleted() for x in jax.tree.leaves(teacher)
        if hasattr(x, "is_deleted")
    )
    # the final params drive the existing few-step sampler directly
    from dit4sr_tpu.config import SamplerConfig, vae_tiny
    from dit4sr_tpu.models.vae import AutoencoderKL
    from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline

    vcfg = vae_tiny(latent_channels=16)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )
    pipe = SRPipeline(
        mmdit, vae, mmdit.cfg, vcfg, SchedulerConfig(),
        SamplerConfig(num_inference_steps=2, align_method="adain"),
    )
    out = pipe(
        {"mmdit": results[-1].params, "vae": vparams},
        jax.random.PRNGKey(3),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 8, mmdit.cfg.joint_attention_dim), jnp.float32),
        jnp.zeros((1, mmdit.cfg.pooled_projection_dim), jnp.float32),
    )
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
