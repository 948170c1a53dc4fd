"""Progressive flow-matching distillation: a few-step sampling story.

The reference has NO fast-sampling path — its eval protocol is a fixed
40-step Euler loop (test/test.py:311, SURVEY.md §6) and inference latency
scales linearly in step count. This module adds the missing capability the
TPU way: **progressive distillation** (Salimans & Ho, "Progressive
Distillation for Fast Sampling of Diffusion Models") adapted to SD3's
rectified-flow velocity parameterization.

One phase: the student is trained so that ONE of its Euler steps on an
N-step sigma grid lands where TWO teacher Euler sub-steps land:

    z        at sigma_i               (forward-noised data)
    teacher: v1 = f_T(z, sigma_i);        z_mid = z + (s_mid - s_i) v1
             v2 = f_T(z_mid, sigma_mid);  z''   = z_mid + (s_next - s_mid) v2
    target velocity  v* = (z'' - z) / (s_next - s_i)        [stop-gradient]
    student loss     w(s_i) * || f_S(z, sigma_i) - v* ||^2

with w(s) = s^2 when `precondition_outputs` (x-space MSE: for velocity
parameterization x_hat = z - s*v, so the x-space error is s^2 times the
velocity error — matching the x-prediction loss the reference trains with,
train_dit4sr.py:318-336), else w = 1.

Iterating phases (student of phase k becomes teacher of phase k+1) halves
the step count each time, e.g. 28 -> 14 -> 7 -> 4. No new sampler is
needed: `SRPipeline` already takes `num_inference_steps`, and distilled
params are a drop-in replacement — a 4-step student turns the measured
28-step 1.57 s/image pipeline into a ~0.25 s/image one (velocity
evaluations dominate the budget; CLAUDE.md perf state).

The sigma midpoint is taken in shifted-sigma space ((s_i + s_next)/2): the
two teacher sub-steps discretize the same probability-flow ODE, so any
bracketing point is valid; the exact 2N grid need not nest the N grid
(linspace grids don't nest under the SD3 time shift).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dit4sr_tpu.config import SchedulerConfig
from dit4sr_tpu.models.mmdit import MMDiT
from dit4sr_tpu.schedulers.flow_match import make_schedule
from dit4sr_tpu.train.train_step import Batch, TrainState


def distill_loss(
    mmdit: MMDiT,
    student_params,
    teacher_params,
    batch: Batch,
    rng: jax.Array,
    num_student_steps: int,
    sched_cfg: SchedulerConfig = SchedulerConfig(),
    precondition: bool = True,
):
    """One-phase progressive-distillation loss. Returns (loss, metrics).

    The step index is sampled uniformly over the student's own inference
    grid (make_schedule(num_student_steps)) — the student is only ever
    queried at sigmas it will actually visit at sampling time.
    """
    sched = make_schedule(sched_cfg, num_student_steps)
    rng_i, rng_noise = jax.random.split(rng)
    b = batch.hq_latent.shape[0]

    i = jax.random.randint(rng_i, (b,), 0, num_student_steps)
    s_i = sched.sigmas[i]
    s_next = sched.sigmas[i + 1]
    s_mid = 0.5 * (s_i + s_next)
    n = sched_cfg.num_train_timesteps
    t_i, t_mid = s_i * n, s_mid * n

    x = batch.hq_latent.astype(jnp.float32)
    noise = jax.random.normal(rng_noise, x.shape, jnp.float32)

    def bc(s):  # (B,) -> (B,1,1,1)
        return s[:, None, None, None]

    z = (1.0 - bc(s_i)) * x + bc(s_i) * noise

    def velocity(params, zt, t):
        pred, _ = mmdit.apply(
            params,
            zt.astype(mmdit.cfg.dtype),
            batch.lq_latent.astype(mmdit.cfg.dtype),
            batch.text_embeds.astype(mmdit.cfg.dtype),
            batch.pooled_embeds.astype(mmdit.cfg.dtype),
            t,
        )
        return pred.astype(jnp.float32)

    # two teacher Euler sub-steps (no gradient flows into the teacher)
    v1 = velocity(teacher_params, z, t_i)
    z_mid = z + bc(s_mid - s_i) * v1
    v2 = velocity(teacher_params, z_mid, t_mid)
    z2 = z_mid + bc(s_next - s_mid) * v2
    v_target = jax.lax.stop_gradient((z2 - z) / bc(s_next - s_i))

    v_student = velocity(student_params, z, t_i)
    err = jnp.mean((v_student - v_target) ** 2, axis=(1, 2, 3))
    w = s_i**2 if precondition else jnp.ones_like(s_i)
    loss = jnp.mean(w * err)
    return loss, {
        "distill_loss": loss,
        "velocity_mse": jnp.mean(err),
    }


def make_distill_step(
    mmdit: MMDiT,
    tx: optax.GradientTransformation,
    num_student_steps: int,
    sched_cfg: SchedulerConfig = SchedulerConfig(),
    precondition: bool = True,
) -> Callable:
    """Build the jittable (state, teacher_params, batch, rng) ->
    (state, metrics) distillation step.

    Unlike the finetuning step (train_step.py), the WHOLE student is
    trainable — distillation moves the base SD3.5 weights, not just the
    control branches — so there is no mask/partition; `tx` covers the full
    tree. Non-finite steps are skipped, same containment as train_step."""

    def loss_fn(params, teacher_params, batch, rng):
        return distill_loss(
            mmdit, params, teacher_params, batch, rng,
            num_student_steps, sched_cfg, precondition,
        )

    def step(state: TrainState, teacher_params, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, teacher_params, batch, rng
        )
        gnorm = optax.global_norm(grads)
        metrics["grad_norm"] = gnorm
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        finite = jnp.isfinite(gnorm)
        metrics["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
        new_params = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_params, state.params
        )
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old)
            if hasattr(new, "shape") and new.shape == getattr(old, "shape", None)
            else new,
            opt_state,
            state.opt_state,
        )
        return TrainState(new_params, opt_state, state.step + 1), metrics

    return step


class PhaseResult(NamedTuple):
    num_steps: int
    params: object
    final_loss: float


def distill_phases(
    mmdit: MMDiT,
    teacher_params,
    batches_fn: Callable[[], object],
    steps_schedule,
    train_steps_per_phase: int,
    rng: jax.Array,
    sched_cfg: SchedulerConfig = SchedulerConfig(),
    learning_rate: float = 1e-5,
    max_grad_norm: float = 1.0,
    precondition: bool = True,
    on_metrics: Optional[Callable[[int, int, dict], None]] = None,
    on_phase_end: Optional[Callable[[PhaseResult], None]] = None,
):
    """Run the full halving schedule. `steps_schedule` is the descending
    step-count ladder, e.g. (28, 14, 7, 4): the teacher starts at
    steps_schedule[0]; each subsequent entry is one student phase. The
    phase-k student becomes the phase-(k+1) teacher.

    `batches_fn()` returns a fresh iterator of `Batch` (latent-space)
    batches per phase. Returns the list of PhaseResult (one per trained
    phase; the last one holds the final few-step params)."""
    results = []
    for phase_idx, n_steps in enumerate(steps_schedule[1:]):
        tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adamw(learning_rate),
        )
        step_fn = jax.jit(
            make_distill_step(mmdit, tx, int(n_steps), sched_cfg, precondition),
            donate_argnums=0,
        )
        # REAL copy (jnp.asarray would alias the teacher's buffers, and the
        # donated step would then invalidate the teacher mid-phase)
        state = TrainState(
            jax.tree.map(jnp.copy, teacher_params),
            tx.init(teacher_params),
            jnp.zeros((), jnp.int32),
        )
        loss = float("nan")
        it = iter(batches_fn())
        for k in range(train_steps_per_phase):
            batch = next(it)
            state, metrics = step_fn(
                state, teacher_params, batch, jax.random.fold_in(rng, phase_idx)
            )
            loss = float(metrics["distill_loss"])
            if on_metrics is not None:
                on_metrics(int(n_steps), k, metrics)
        res = PhaseResult(int(n_steps), state.params, loss)
        results.append(res)
        if on_phase_end is not None:
            on_phase_end(res)
        teacher_params = state.params
    return results
