"""Trainer integration tests: stage1/stage3 end-to-end on tiny configs,
orbax checkpoint save/resume with real step restoration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dit4sr_tpu.config import testr_tiny as make_testr_tiny
from dit4sr_tpu.config import (
    SchedulerConfig,
    TrainConfig,
    mmdit_tiny,
    vae_tiny,
)
from dit4sr_tpu.data.kernels import sample_degradation_kernels
from dit4sr_tpu.models.vae import AutoencoderKL
from dit4sr_tpu.train.trainer import Trainer
from dit4sr_tpu.train.train_step import TrainState

pytestmark = pytest.mark.slow

B = 2
IMG = 64          # tiny vae: /8 -> 8x8 latent
TEXT_LEN = 8


def _batches(cfg_testr=None, n=4):
    rng = np.random.default_rng(0)
    for _ in range(n):
        ks = [sample_degradation_kernels(rng) for _ in range(B)]
        batch = {
            "gt": rng.uniform(size=(B, IMG, IMG, 3)).astype(np.float32),
            "kernel1": np.stack([k[0] for k in ks]),
            "kernel2": np.stack([k[1] for k in ks]),
            "sinc_kernel": np.stack([k[2] for k in ks]),
            "prompt": ["hello"] * B,
        }
        if cfg_testr is not None:
            from dit4sr_tpu.models.testr.detector import pad_targets

            raw = [
                {
                    "labels": np.zeros((2,), np.int32),
                    "boxes": rng.uniform(0.3, 0.6, (2, 4)).astype(np.float32),
                    "ctrl_points": rng.uniform(0.1, 0.9, (2, cfg_testr.num_ctrl_points, 2)).astype(np.float32),
                    "texts": rng.integers(0, 10, (2, cfg_testr.max_text_len)).astype(np.int32),
                }
                for _ in range(B)
            ]
            batch["ocr_targets"] = pad_targets(raw, cfg_testr)
        yield batch


def _prompt_fn(prompts):
    rng = np.random.default_rng(1)
    return (
        jnp.asarray(rng.normal(size=(len(prompts), TEXT_LEN, 24)), jnp.float32),
        jnp.asarray(rng.normal(size=(len(prompts), 16)), jnp.float32),
    )


def _mk_trainer(tmp_path, stage, with_testr):
    mcfg = mmdit_tiny(
        in_channels=4, out_channels=4, sample_size=8,
        feat_extract_layers=(0, 1) if with_testr else (),
    )
    vcfg = vae_tiny()
    tcfg = TrainConfig(
        stage=stage, gradient_accumulation_steps=1, finetune_layer_names=(),
        checkpointing_steps=2, num_train_steps=3,
    )
    testr_cfg = None
    if with_testr:
        testr_cfg = make_testr_tiny(
            num_feature_levels=2, num_dit_layers=2,
            dit_dim=mcfg.inner_dim // 4 * 2,
        )
    return Trainer(
        mcfg, vcfg, tcfg, testr_cfg, SchedulerConfig(),
        out_dir=str(tmp_path),
    ), mcfg, vcfg, testr_cfg


def test_stage1_training_runs_and_checkpoints(tmp_path):
    trainer, mcfg, vcfg, _ = _mk_trainer(tmp_path, "stage1", with_testr=False)
    state = trainer.init_state(jax.random.PRNGKey(0), text_len=TEXT_LEN, latent_size=8)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3), vcfg.dtype))

    state = trainer.fit(
        state, _batches(), vparams, _prompt_fn, jax.random.PRNGKey(2), resume=False
    )
    assert int(state.step) == 3
    assert trainer.ckpt.latest_step() == 2

    # resume restores the step and params
    state0 = trainer.init_state(jax.random.PRNGKey(0), text_len=TEXT_LEN, latent_size=8)
    restored = trainer.ckpt.restore(state0)
    assert int(restored.step) == 2
    # restored params differ from freshly initialized (training moved them)
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), restored.params, state0.params
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_stage3_joint_training(tmp_path):
    trainer, mcfg, vcfg, testr_cfg = _mk_trainer(tmp_path, "stage3", with_testr=True)
    state = trainer.init_state(jax.random.PRNGKey(0), text_len=TEXT_LEN, latent_size=8)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3), vcfg.dtype))

    state = trainer.fit(
        state, _batches(testr_cfg, n=2), vparams, _prompt_fn,
        jax.random.PRNGKey(2), num_steps=2, resume=False,
    )
    assert int(state.step) == 2
    # metrics include both losses
    import json

    lines = [json.loads(l) for l in open(trainer.logger.path)]
    keys = set().union(*(l.keys() for l in lines))
    assert "diff_loss" in keys
    assert "ocr_loss" in keys
    assert "total_loss" in keys


def test_in_training_validation(tmp_path):
    trainer, mcfg, vcfg, _ = _mk_trainer(tmp_path, "stage1", with_testr=False)
    state = trainer.init_state(jax.random.PRNGKey(0), text_len=TEXT_LEN, latent_size=8)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3), vcfg.dtype))

    rng = np.random.default_rng(0)
    val_samples = [
        {
            "lq": rng.uniform(size=(32, 32, 3)).astype(np.float32),
            "gt": rng.uniform(size=(32, 32, 3)).astype(np.float32),
            "prompt": "text",
            "img_id": "v0",
        }
    ]
    agg = trainer.validate(
        state, vparams, val_samples, _prompt_fn, jax.random.PRNGKey(2), num_steps=2
    )
    assert "full/psnr" in agg and np.isfinite(agg["full/psnr"])


def test_frozen_params_stored_in_compute_dtype(tmp_path):
    """frozen_params_in_compute_dtype: frozen leaves live in bf16, trainable
    leaves keep the fp32 master, and training still runs + checkpoints."""
    import dataclasses

    from flax import traverse_util

    trainer, mcfg, vcfg, _ = _mk_trainer(tmp_path, "stage1", with_testr=False)
    trainer.train_cfg = dataclasses.replace(
        trainer.train_cfg,
        finetune_layer_names=("to_q",),  # freeze most of the model
        frozen_params_in_compute_dtype=True,
    )
    state = trainer.init_state(jax.random.PRNGKey(0), text_len=TEXT_LEN, latent_size=8)

    flat_p = traverse_util.flatten_dict(state.params, sep="/")
    flat_m = traverse_util.flatten_dict(trainer.mask, sep="/")
    froz = [k for k in flat_p if not flat_m[k]]
    trn = [k for k in flat_p if flat_m[k]]
    assert froz and trn
    assert all(flat_p[k].dtype == mcfg.dtype for k in froz)
    assert all(flat_p[k].dtype == jnp.float32 for k in trn)

    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3), vcfg.dtype))
    state = trainer.fit(
        state, _batches(n=2), vparams, _prompt_fn, jax.random.PRNGKey(2),
        num_steps=2, resume=False,
    )
    assert int(state.step) == 2
    new_flat = traverse_util.flatten_dict(state.params, sep="/")
    assert all(new_flat[k].dtype == mcfg.dtype for k in froz)


def test_preemption_checkpoints_and_exits_cleanly(tmp_path):
    """SIGTERM mid-training -> checkpoint at the current step + clean return
    (the reference has no preemption handling, SURVEY.md §5)."""
    import os
    import signal

    trainer, mcfg, vcfg, _ = _mk_trainer(tmp_path, "stage1", with_testr=False)
    state = trainer.init_state(jax.random.PRNGKey(0), text_len=TEXT_LEN, latent_size=8)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3), vcfg.dtype))

    def batches_with_sigterm():
        for i, b in enumerate(_batches(n=10)):
            if i == 2:
                os.kill(os.getpid(), signal.SIGTERM)
            yield b

    state = trainer.fit(
        state, batches_with_sigterm(), vparams, _prompt_fn,
        jax.random.PRNGKey(2), num_steps=10, resume=False,
    )
    # 2 steps completed before the signal landed; step 2 is checkpointed
    assert int(state.step) == 2
    assert trainer.ckpt.latest_step() == 2
    # callers must be able to tell preemption from completion: a multi-stage
    # driver that pickles the returned state as "trained" would otherwise
    # continue on a half-trained model (quality_probe_ocr guards on this)
    assert trainer.preempted
    # default handlers restored? fit re-installs on every call, but after a
    # preempted run the process must still be alive to get here — and a
    # fresh fit must run normally
    import json

    lines = [json.loads(l) for l in open(trainer.logger.path)]
    assert any(l.get("preempted") for l in lines)


def test_lora_finetune_mode(tmp_path):
    """lora_rank > 0: only the mmdit_lora adapter trains; the base MMDiT is
    bit-frozen, and the adapter actually moves."""
    import dataclasses

    from flax import traverse_util

    trainer, mcfg, vcfg, _ = _mk_trainer(tmp_path, "stage1", with_testr=False)
    trainer.train_cfg = dataclasses.replace(
        trainer.train_cfg, lora_rank=2, finetune_layer_names=("mmdit_lora",)
    )
    state = trainer.init_state(jax.random.PRNGKey(0), text_len=TEXT_LEN, latent_size=8)
    assert "mmdit_lora" in state.params
    base_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params["mmdit"])

    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3), vcfg.dtype))
    state = trainer.fit(
        state, _batches(n=2), vparams, _prompt_fn, jax.random.PRNGKey(2),
        num_steps=2, resume=False,
    )
    assert int(state.step) == 2
    for a, b in zip(jax.tree.leaves(base_before),
                    jax.tree.leaves(state.params["mmdit"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    flat_l = traverse_util.flatten_dict(state.params["mmdit_lora"])
    assert any(
        float(np.abs(np.asarray(v)).max()) > 0
        for k, v in flat_l.items() if k[-1] == "b"
    ), "adapter b factors never moved"


def test_in_training_validation_schedule(tmp_path):
    """validation_steps > 0 + val_samples: fit logs val/* metrics on cadence."""
    import dataclasses
    import json

    trainer, mcfg, vcfg, _ = _mk_trainer(tmp_path, "stage1", with_testr=False)
    trainer.train_cfg = dataclasses.replace(
        trainer.train_cfg, validation_steps=2, validation_num_inference_steps=2
    )
    state = trainer.init_state(jax.random.PRNGKey(0), text_len=TEXT_LEN, latent_size=8)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3), vcfg.dtype))

    rng = np.random.default_rng(0)
    val_samples = [{
        "lq": rng.uniform(size=(32, 32, 3)).astype(np.float32),
        "gt": rng.uniform(size=(32, 32, 3)).astype(np.float32),
        "prompt": "text", "img_id": "v0",
    }]
    trainer.fit(
        state, _batches(n=2), vparams, _prompt_fn, jax.random.PRNGKey(2),
        num_steps=2, resume=False, val_samples=val_samples,
    )
    lines = [json.loads(l) for l in open(trainer.logger.path)]
    assert any(any(k.startswith("val/") for k in l) for l in lines)


@pytest.mark.parametrize("mode", ["host_staged", "device_staged", "orbax"])
def test_async_checkpointing_survives_immediate_mutation(tmp_path, mode):
    """async save: the write may land after the caller overwrites the state;
    the restored checkpoint must hold the values at save time. host_staged
    is the axon-safe mode (foreground device_get + background disk write);
    orbax is orbax's own async save (stalls on axon, fine on CPU)."""
    import dataclasses

    trainer, mcfg, vcfg, _ = _mk_trainer(tmp_path, "stage1", with_testr=False)
    trainer.train_cfg = dataclasses.replace(
        trainer.train_cfg, async_checkpointing=True, async_checkpoint_mode=mode
    )
    trainer.ckpt.async_save = True
    trainer.ckpt.async_mode = mode
    state = trainer.init_state(jax.random.PRNGKey(0), text_len=TEXT_LEN, latent_size=8)
    snap = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)

    trainer.ckpt.save(1, state)
    # immediately clobber the live state (what donation does between saves)
    state = TrainState(
        jax.tree.map(lambda x: x * 0 + 7.0, state.params),
        state.opt_state, state.step, state.ema,
    )
    trainer.ckpt.wait()

    state0 = trainer.init_state(jax.random.PRNGKey(4), text_len=TEXT_LEN, latent_size=8)
    restored = trainer.ckpt.restore(state0)
    for a, b in zip(jax.tree.leaves(snap), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_host_staged_pending_step_visible(tmp_path):
    """latest_step() must report an in-flight host_staged write — the
    preemption path uses it to guard against a duplicate save of the same
    step (orbax raises StepAlreadyExistsError on one)."""
    from dit4sr_tpu.train.trainer import Checkpointer

    trainer, *_ = _mk_trainer(tmp_path, "stage1", with_testr=False)
    state = trainer.init_state(jax.random.PRNGKey(0), text_len=TEXT_LEN, latent_size=8)
    ckpt = Checkpointer(str(tmp_path / "ck2"), async_save=True,
                        async_mode="host_staged")
    ckpt.save(3, state)
    assert ckpt.latest_step() == 3  # whether in flight or already landed
    ckpt.wait()
    assert ckpt.latest_step() == 3
    # back-to-back saves serialize on the single writer slot
    ckpt.save(4, state)
    ckpt.save(5, state)
    ckpt.wait()
    assert ckpt.latest_step() == 5


def test_save_overwrites_stale_step(tmp_path):
    """A fresh (non-resumed) run over an out_dir holding a previous run's
    checkpoint at the same step must overwrite it, not die on orbax's
    StepAlreadyExistsError (hit by scripts/quality_probe.py reruns)."""
    from dit4sr_tpu.train.trainer import Checkpointer

    trainer, *_ = _mk_trainer(tmp_path, "stage1", with_testr=False)
    state_a = trainer.init_state(jax.random.PRNGKey(0), text_len=TEXT_LEN, latent_size=8)
    ck_dir = str(tmp_path / "ck_dup")
    Checkpointer(ck_dir).save(3, state_a)

    # a new run over the same dir reaches step 3 with different values
    state_b = TrainState(
        jax.tree.map(lambda x: x * 0 + 5.0, state_a.params),
        state_a.opt_state, state_a.step, state_a.ema,
    )
    ck2 = Checkpointer(ck_dir)
    ck2.save(3, state_b)  # must not raise
    restored = ck2.restore(
        trainer.init_state(jax.random.PRNGKey(9), text_len=TEXT_LEN, latent_size=8)
    )
    for a, b in zip(jax.tree.leaves(state_b.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partition_aware_checkpointing(tmp_path):
    """checkpoint_frozen_once: the frozen partition is written once to
    <ckpt>/frozen; per-step items hold only the trainable tree. Restore
    from a DIFFERENT random init must recombine to the values at save time
    for BOTH partitions (the frozen part comes from disk, not the template)."""
    import dataclasses
    import os

    from flax import traverse_util

    trainer, mcfg, vcfg, _ = _mk_trainer(tmp_path, "stage1", with_testr=False)
    trainer.train_cfg = dataclasses.replace(
        trainer.train_cfg, finetune_layer_names=("to_q",)  # freeze most
    )
    state = trainer.init_state(jax.random.PRNGKey(0), text_len=TEXT_LEN, latent_size=8)
    assert trainer.ckpt._mask is not None  # split mode active
    snap = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)

    trainer.ckpt.save(2, state)
    trainer.ckpt.wait()
    frozen_dir = os.path.join(str(tmp_path), "ckpt", "frozen")
    assert os.path.isdir(frozen_dir)

    # a second save must NOT rewrite the frozen partition
    mtime = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(frozen_dir) for f in fs
    )
    trainer.ckpt.save(4, state)
    trainer.ckpt.wait()
    mtime2 = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(frozen_dir) for f in fs
    )
    assert mtime2 == mtime

    # restore from a fresh DIFFERENT init: every leaf (frozen included)
    # must match the saved values, not the new random init
    state0 = trainer.init_state(jax.random.PRNGKey(9), text_len=TEXT_LEN, latent_size=8)
    restored = trainer.ckpt.restore(state0)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(snap), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(a, np.asarray(b))

    # the per-step item on disk must be smaller than the frozen partition
    # (it holds only the trainable slice + opt state for that slice)
    def tree_bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d) for f in fs
        )
    flat_m = traverse_util.flatten_dict(trainer.mask)
    assert not all(flat_m.values())  # sanity: something IS frozen
    step_dir = os.path.join(str(tmp_path), "ckpt", "4")
    assert tree_bytes(step_dir) < tree_bytes(frozen_dir)


@pytest.mark.parametrize("mode", ["sync", "host_staged", "device_staged"])
def test_bf16_transport_roundtrip(tmp_path, mode):
    """checkpoint_transport_dtype='bfloat16': fp32 leaves travel as bf16
    (halving the axon device->host pull) and restore back to fp32 within
    bf16 tolerance; non-fp32 leaves are untouched exactly."""
    from dit4sr_tpu.train.trainer import Checkpointer

    trainer, *_ = _mk_trainer(tmp_path, "stage1", with_testr=False)
    state = trainer.init_state(jax.random.PRNGKey(0), text_len=TEXT_LEN, latent_size=8)
    snap = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)

    ckpt = Checkpointer(
        str(tmp_path / f"ck_{mode}"),
        async_save=(mode != "sync"),
        async_mode=mode if mode != "sync" else "host_staged",
        transport_dtype="bfloat16",
    )
    ckpt.save(1, state)
    ckpt.wait()

    state0 = trainer.init_state(jax.random.PRNGKey(4), text_len=TEXT_LEN, latent_size=8)
    restored = ckpt.restore(state0)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(snap), jax.tree.leaves(restored.params)):
        b = np.asarray(b)
        assert b.dtype == a.dtype  # cast back to the live dtype
        if a.dtype == np.float32:
            np.testing.assert_allclose(a, b, rtol=8e-3, atol=1e-6)
        else:
            np.testing.assert_array_equal(a, b)


def test_bf16_transport_marker_adoption_and_conflict(tmp_path):
    """A bf16-transport dir is self-describing: a Checkpointer constructed
    WITHOUT the flag still restores it correctly (marker adoption); and a
    conflicting dtype on an existing dir raises instead of corrupting."""
    import os

    from dit4sr_tpu.train.trainer import Checkpointer

    trainer, *_ = _mk_trainer(tmp_path, "stage1", with_testr=False)
    state = trainer.init_state(jax.random.PRNGKey(0), text_len=TEXT_LEN, latent_size=8)
    snap = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)

    ck_dir = str(tmp_path / "ck_marker")
    Checkpointer(ck_dir, transport_dtype="bfloat16").save(2, state)

    # no flag: the on-disk marker is adopted
    plain = Checkpointer(ck_dir)
    assert plain._transport == "bfloat16"
    restored = plain.restore(
        trainer.init_state(jax.random.PRNGKey(9), text_len=TEXT_LEN, latent_size=8)
    )
    for a, b in zip(jax.tree.leaves(snap), jax.tree.leaves(restored.params)):
        if a.dtype == np.float32:
            np.testing.assert_allclose(a, np.asarray(b), rtol=8e-3, atol=1e-6)

    # an exact-fp32 dir cannot be reopened as bf16 mid-run
    ck_plain = str(tmp_path / "ck_plain")
    Checkpointer(ck_plain).save(1, state)
    # (no marker was written for the exact dir, so bf16 reopen writes one —
    # but a bf16 dir reopened with a DIFFERENT lossy dtype must raise)
    import json as _json
    with open(os.path.join(ck_dir, "transport.json")) as f:
        assert _json.load(f)["dtype"] == "bfloat16"
    with pytest.raises(ValueError):
        # simulate a future conflicting dtype against the bf16 marker
        c = Checkpointer.__new__(Checkpointer)
        c.dir = ck_dir
        c._transport = "float16"
        c._sync_transport_marker()
