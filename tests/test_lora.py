"""LoRA folding tests: delta math + application to the MMDiT tree."""

import jax
import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import mmdit_tiny
from dit4sr_tpu.models.mmdit import MMDiT, init_mmdit
from dit4sr_tpu.utils.lora import apply_lora, collect_lora_deltas


def test_lora_apply_changes_output():
    cfg = mmdit_tiny()
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=8)
    D, r = cfg.inner_dim, 4
    rng = np.random.default_rng(0)
    lora_sd = {
        "transformer.transformer_blocks.0.attn.to_q.lora_A.weight": rng.normal(0, 0.1, (r, D)).astype(np.float32),
        "transformer.transformer_blocks.0.attn.to_q.lora_B.weight": rng.normal(0, 0.1, (D, r)).astype(np.float32),
        "transformer.transformer_blocks.1.ff.net.2.lora_A.weight": rng.normal(0, 0.1, (r, 4 * D)).astype(np.float32),
        "transformer.transformer_blocks.1.ff.net.2.lora_B.weight": rng.normal(0, 0.1, (D, r)).astype(np.float32),
    }
    deltas = collect_lora_deltas(lora_sd)
    assert set(deltas) == {"blocks_0/attn/to_q/kernel", "blocks_1/ff/proj_out/kernel"}
    # torch delta (B@A) acts as y += (B@A) x; flax kernel delta is its T
    a = lora_sd["transformer.transformer_blocks.0.attn.to_q.lora_A.weight"]
    b = lora_sd["transformer.transformer_blocks.0.attn.to_q.lora_B.weight"]
    np.testing.assert_allclose(
        deltas["blocks_0/attn/to_q/kernel"], (b @ a).T, rtol=1e-6
    )

    new_params, applied = apply_lora(params, lora_sd)
    assert applied == 2

    lat = jnp.zeros((1, 16, 16, cfg.in_channels)) + 0.3
    txt = jnp.ones((1, 8, cfg.joint_attention_dim)) * 0.1
    pool = jnp.ones((1, cfg.pooled_projection_dim)) * 0.1
    t = jnp.asarray([500.0])
    out0, _ = model.apply(params, lat, lat, txt, pool, t)
    out1, _ = model.apply(new_params, lat, lat, txt, pool, t)
    assert float(jnp.abs(out0 - out1).max()) > 1e-6

    # scale=0 is a no-op
    same_params, _ = apply_lora(params, lora_sd, scale=0.0)
    out2, _ = model.apply(same_params, lat, lat, txt, pool, t)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out2), atol=1e-7)
