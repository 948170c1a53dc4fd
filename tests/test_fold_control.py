"""Folded control projections must match the composed form exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import mmdit_tiny
from dit4sr_tpu.models.mmdit import MMDiT, fold_control_projections, init_mmdit


def test_folding_is_exact():
    cfg = mmdit_tiny()
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=8)

    # make the zero-init control projections non-trivial
    import flax
    from flax import traverse_util

    flat = traverse_util.flatten_dict(flax.core.unfreeze(params), sep="/")
    rng = np.random.default_rng(0)
    for k in flat:
        if any(t in k for t in ("to_q_control", "to_k_control", "to_v_control")):
            flat[k] = jnp.asarray(rng.normal(0, 0.05, flat[k].shape), jnp.float32)
    params = traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()}
    )

    inputs = (
        jnp.asarray(rng.normal(size=(1, 16, 16, cfg.in_channels)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 16, 16, cfg.in_channels)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 8, cfg.joint_attention_dim)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, cfg.pooled_projection_dim)), jnp.float32),
        jnp.asarray([500.0], jnp.float32),
    )

    ref, _ = model.apply(params, *inputs)

    folded_params = fold_control_projections(params, cfg)
    folded_model = MMDiT(cfg.with_(folded_control=True))
    got, _ = folded_model.apply(folded_params, *inputs)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)
