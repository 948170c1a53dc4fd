"""Numeric parity of the flax text encoders vs HF torch (random weights)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch

from dit4sr_tpu.text import convert
from dit4sr_tpu.text.encoders import (
    CLIPConfig,
    CLIPTextEncoder,
    T5Config,
    T5Encoder,
    TripleTextEncoder,
)


@pytest.mark.slow
def test_clip_parity_with_hf():
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    # eos_token_id must be the max id present (119): HF pools at the first
    # eos occurrence; our encoder pools at the first argmax — identical when
    # eos is the highest id, as with the real CLIP tokenizers (eos=49407)
    hf_cfg = CLIPTextConfig(
        vocab_size=120, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=16, projection_dim=24, hidden_act="quick_gelu",
        eos_token_id=119,
    )
    torch.manual_seed(0)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()

    cfg = CLIPConfig(
        vocab_size=120, hidden_size=32, intermediate_size=64, num_layers=3,
        num_heads=4, max_positions=16, projection_dim=24, hidden_act="quick_gelu",
    )
    params = convert.convert_clip(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg
    )
    model = CLIPTextEncoder(cfg)

    ids = np.array([[5, 30, 42, 119, 7, 3, 2, 1]], np.int32)  # 119 = "eos" argmax
    with torch.no_grad():
        out = hf(torch.from_numpy(ids).long(), output_hidden_states=True)
    ref_hidden = out.hidden_states[-2].numpy()
    ref_pooled = out.text_embeds.numpy()

    hidden, pooled = model.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(ids)
    )
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_t5_parity_with_hf():
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=120, d_model=32, d_kv=8, d_ff=48, num_layers=3,
        num_heads=4, feed_forward_proj="gated-gelu", dropout_rate=0.0,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()

    cfg = T5Config(
        vocab_size=120, d_model=32, d_kv=8, d_ff=48, num_layers=3, num_heads=4,
    )
    params = convert.convert_t5(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg
    )
    model = T5Encoder(cfg)

    ids = np.array([[5, 30, 42, 7, 3, 2, 1, 0, 0, 0]], np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids).long()).last_hidden_state.numpy()
    got = model.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_triple_encoder_contract():
    """Concat/pad contract: (B, 77+Tt, 4096) embeds + (B, l+g pooled)."""
    rng = jax.random.PRNGKey(0)
    ccfg_l = CLIPConfig(vocab_size=50, hidden_size=16, intermediate_size=32,
                        num_layers=2, num_heads=2, max_positions=8, projection_dim=16)
    ccfg_g = CLIPConfig(vocab_size=50, hidden_size=24, intermediate_size=48,
                        num_layers=2, num_heads=2, max_positions=8,
                        projection_dim=24, hidden_act="gelu")
    tcfg = T5Config(vocab_size=50, d_model=64, d_kv=8, d_ff=32, num_layers=2,
                    num_heads=2)

    ids = jnp.asarray(np.random.default_rng(0).integers(0, 50, (2, 8)), jnp.int32)
    l = CLIPTextEncoder(ccfg_l)
    g = CLIPTextEncoder(ccfg_g)
    t = T5Encoder(tcfg)
    enc = TripleTextEncoder(
        (l, l.init(rng, ids)), (g, g.init(rng, ids)), (t, t.init(rng, ids)),
        joint_dim=64,
    )
    embeds, pooled = enc(ids, ids)
    assert embeds.shape == (2, 16, 64)
    assert pooled.shape == (2, 16 + 24)
    # clip part zero-padded from 40 -> 64
    np.testing.assert_array_equal(np.asarray(embeds[:, :8, 40:]), 0.0)
