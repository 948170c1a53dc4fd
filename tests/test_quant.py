"""w8a8 int8 serving mode (ops/quant.py): QuantDense must approximate
nn.Dense within quantization error, and a quantized tiny MMDiT forward must
track the bf16/fp32 forward closely. Opt-in + approximate — the exact path
(bench.py, training) never goes through it."""

import jax
import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import mmdit_tiny
from dit4sr_tpu.models.mmdit import MMDiT, init_mmdit
from dit4sr_tpu.ops.quant import QuantDense, quantize_kernel, quantize_mmdit_params


def test_quant_dense_matches_dense():
    from flax import linen as nn

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    dense = nn.Dense(32, dtype=jnp.float32)
    params = dense.init(jax.random.PRNGKey(0), x)

    k_i8, scale = quantize_kernel(params["params"]["kernel"])
    qparams = {
        "params": {
            "kernel_i8": k_i8,
            "scale": scale,
            "bias": params["params"]["bias"].astype(jnp.float32),
        }
    }
    want = dense.apply(params, x)
    got = QuantDense(32, dtype=jnp.float32).apply(qparams, x)

    denom = np.linalg.norm(np.asarray(want))
    rel = np.linalg.norm(np.asarray(got) - np.asarray(want)) / denom
    assert rel < 0.02, f"relative error {rel}"


def test_quantized_tree_structure_matches_w8a8_init():
    cfg = mmdit_tiny()
    _, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=12)
    qcfg = cfg.with_(w8a8=True)
    qmodel = MMDiT(qcfg)
    ref = jax.jit(
        lambda: qmodel.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16, 16, cfg.in_channels)),
            jnp.zeros((1, 16, 16, cfg.in_channels)),
            jnp.zeros((1, 12, cfg.joint_attention_dim)),
            jnp.zeros((1, cfg.pooled_projection_dim)),
            jnp.zeros((1,)),
        )
    )()
    qparams = quantize_mmdit_params(params, cfg)
    assert jax.tree_util.tree_structure(ref) == jax.tree_util.tree_structure(
        qparams
    )


def test_quantized_mmdit_forward_tracks_fp32():
    cfg = mmdit_tiny(dtype=jnp.float32)
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=12)

    # zero-init control projections quantize to zero; perturb them so the
    # quantized path is exercised with real (non-degenerate) values
    def bump(tree, key_prefix=()):
        if isinstance(tree, dict):
            return {k: bump(v, key_prefix + (k,)) for k, v in tree.items()}
        if tree.ndim == 2 and "blocks" in "/".join(key_prefix):
            g = jax.random.normal(
                jax.random.PRNGKey(hash(key_prefix) % (2**31)), tree.shape
            )
            return tree + 0.02 * g
        return tree

    params = bump(params)
    qparams = quantize_mmdit_params(params, cfg)
    qmodel = MMDiT(cfg.with_(w8a8=True, dtype=jnp.float32))

    rng = np.random.default_rng(1)
    latent = jnp.asarray(rng.normal(size=(2, 16, 16, cfg.in_channels)), jnp.float32)
    control = jnp.asarray(rng.normal(size=(2, 16, 16, cfg.in_channels)), jnp.float32)
    text = jnp.asarray(
        rng.normal(size=(2, 12, cfg.joint_attention_dim)), jnp.float32
    )
    pooled = jnp.asarray(
        rng.normal(size=(2, cfg.pooled_projection_dim)), jnp.float32
    )
    t = jnp.full((2,), 500.0, jnp.float32)

    want, _ = model.apply(params, latent, control, text, pooled, t)
    got, _ = qmodel.apply(qparams, latent, control, text, pooled, t)

    w = np.asarray(want).ravel()
    g = np.asarray(got).ravel()
    cos = float(np.dot(w, g) / (np.linalg.norm(w) * np.linalg.norm(g) + 1e-12))
    rel = float(np.linalg.norm(g - w) / (np.linalg.norm(w) + 1e-12))
    assert cos > 0.995, f"cosine {cos}"
    assert rel < 0.1, f"relative L2 {rel}"
