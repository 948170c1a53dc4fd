"""Model materialization from checkpoint assets (with loud fallbacks).

TPU counterpart of the reference's `initialize.load_model`
(initialize.py:304-457): build VAE, MMDiT variant, TESTR and the triple
text-encoder stack, loading real weights through the tested converters in
`utils/weights.py` / `text/convert.py` whenever checkpoint files exist, and
falling back to random init / hash embeddings (with an unmissable banner)
when they don't — this environment has zero egress, so weight assets may be
absent, but every wiring path must be one flag away from real.

Checkpoint layout conventions (diffusers SD3.5-medium):
  <sd3_root>/transformer/diffusion_pytorch_model*.safetensors
  <sd3_root>/vae/diffusion_pytorch_model.safetensors
  <sd3_root>/text_encoder{,_2,_3}/model*.safetensors
  <sd3_root>/tokenizer{,_2,_3}/
TESTR checkpoints are torch .pt files with key 'ts_module' or 'model'
(reference initialize.py:413-446).
"""

from __future__ import annotations

import os
import sys
from glob import glob
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import MMDiTConfig, TESTRConfig, VAEConfig


def banner(msg: str) -> None:
    """Unmissable stderr warning (VERDICT round-1: silent random-weight eval
    produced tables that looked like results)."""
    bar = "!" * 78
    print(f"\n{bar}\n!! {msg}\n{bar}\n", file=sys.stderr, flush=True)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch state dict from a .safetensors file, a directory of
    (possibly sharded) .safetensors, or a torch .pt/.pth file."""
    from dit4sr_tpu.utils.weights import load_safetensors

    if os.path.isdir(path):
        files = sorted(glob(os.path.join(path, "*.safetensors")))
        if not files:
            raise FileNotFoundError(f"no .safetensors under {path}")
        sd: Dict[str, np.ndarray] = {}
        for f in files:
            sd.update(load_safetensors(f))
        return sd
    if path.endswith((".pt", ".pth", ".bin")):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        for key in ("ts_module", "model", "state_dict"):
            if isinstance(obj, dict) and key in obj:
                obj = obj[key]
                break
        return {k: v.float().numpy() for k, v in obj.items()}
    return load_safetensors(path)


def _resolve(path: Optional[str], *candidates: str) -> Optional[str]:
    """Accept either a direct file/dir or a root containing one of the
    conventional sub-paths."""
    if not path:
        return None
    if os.path.isfile(path):
        return path
    for c in candidates:
        p = os.path.join(path, c)
        if os.path.exists(p):
            return p
    if os.path.isdir(path) and glob(os.path.join(path, "*.safetensors")):
        return path
    return None


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------


def build_mmdit(
    cfg: MMDiTConfig,
    rng: jax.Array,
    ckpt: Optional[str] = None,
    text_len: int = 154,
):
    """(model, params, loaded). `ckpt` may be the SD3 root, the transformer
    subdir, or a safetensors file; missing control/ocr params are zero-init
    seeded per the reference's non-strict load (transformer_sd3.py:412-458)."""
    from dit4sr_tpu.models.mmdit import MMDiT, init_mmdit
    from dit4sr_tpu.utils.weights import convert_mmdit

    resolved = _resolve(
        ckpt, "transformer", "diffusion_pytorch_model.safetensors"
    )
    model, params = init_mmdit(rng, cfg, text_len=text_len)
    if resolved is None:
        if ckpt:
            banner(f"MMDiT checkpoint not found at {ckpt!r} — RANDOM weights")
        return model, params, False
    sd = load_state_dict(resolved)
    params = jax.tree.map(jnp.asarray, convert_mmdit(sd, cfg))
    return model, params, True


def build_vae(cfg: VAEConfig, rng: jax.Array, ckpt: Optional[str] = None):
    from dit4sr_tpu.models.vae import AutoencoderKL
    from dit4sr_tpu.utils.weights import convert_vae

    vae = AutoencoderKL(cfg)
    resolved = _resolve(ckpt, "vae", "diffusion_pytorch_model.safetensors")
    if resolved is None:
        if ckpt:
            banner(f"VAE checkpoint not found at {ckpt!r} — RANDOM weights")
        params = jax.jit(
            lambda: vae.init(
                jax.random.PRNGKey(0) if rng is None else rng,
                jnp.zeros((1, 64, 64, cfg.in_channels), cfg.dtype),
            )
        )()
        return vae, params, False
    sd = load_state_dict(resolved)
    params = jax.tree.map(jnp.asarray, convert_vae(sd, cfg))
    return vae, params, True


def build_testr(
    cfg: TESTRConfig,
    rng: jax.Array,
    feats_shape: Tuple[int, ...],
    ckpt: Optional[str] = None,
    feat_hw: Tuple[int, int] = (64, 64),
):
    """(spotter, params, loaded). feats_shape: (Lext, B, H, W, C)."""
    from dit4sr_tpu.models.testr.detector import TextSpotter
    from dit4sr_tpu.utils.weights import convert_testr

    spotter = TextSpotter(cfg, feat_hw=feat_hw)
    if ckpt and os.path.exists(ckpt):
        sd = load_state_dict(ckpt)
        params = jax.tree.map(jnp.asarray, convert_testr(sd, cfg))
        return spotter, params, True
    if ckpt:
        banner(f"TESTR checkpoint not found at {ckpt!r} — RANDOM weights")
    params = spotter.init(rng, jnp.zeros(feats_shape, jnp.float32))
    return spotter, params, False


class PromptEncoder:
    """list[str] -> (text_embeds (B, 77+T5, 4096), pooled (B, 2048)) through
    the real tokenizer + flax triple-encoder stack."""

    def __init__(self, tokenizers, triple):
        self.tokenizers = tokenizers
        self.triple = triple

    def __call__(self, prompts: List[str]):
        clip_ids, t5_ids = self.tokenizers(prompts)
        return self.triple(jnp.asarray(clip_ids), jnp.asarray(t5_ids))


def build_prompt_encoder(
    ckpt_root: Optional[str] = None,
    t5_length: int = 77,
    dtype: Any = jnp.float32,
) -> Tuple[Callable, bool]:
    """(encode_prompt_fn, loaded). With an SD3 checkpoint root containing the
    three text_encoder dirs + tokenizers, builds the real CLIP-L/CLIP-bigG/T5
    stack (encode_prompt contract, train/train_utils.py:76-120); otherwise a
    deterministic HashTextEncoder with a loud banner."""
    from dit4sr_tpu.text.encoders import (
        CLIPTextEncoder,
        HashTextEncoder,
        T5Config,
        T5Encoder,
        TripleTextEncoder,
        clip_bigg_config,
        clip_l_config,
    )
    from dit4sr_tpu.text.tokenize import SD3Tokenizers

    seq_len = 77 + t5_length
    dirs = (
        [os.path.join(ckpt_root, f"text_encoder{s}") for s in ("", "_2", "_3")]
        if ckpt_root
        else []
    )
    if not dirs or not all(os.path.isdir(d) for d in dirs):
        if ckpt_root:
            banner(
                f"text encoders not found under {ckpt_root!r} — HASH embeddings"
            )
        return HashTextEncoder(seq_len=seq_len), False

    from dit4sr_tpu.text.convert import convert_clip, convert_t5

    cfg_l = clip_l_config()
    cfg_g = clip_bigg_config()
    cfg_t5 = T5Config(dtype=dtype)
    enc_l = CLIPTextEncoder(cfg_l)
    enc_g = CLIPTextEncoder(cfg_g)
    enc_t5 = T5Encoder(cfg_t5)
    p_l = jax.tree.map(jnp.asarray, convert_clip(load_state_dict(dirs[0]), cfg_l))
    p_g = jax.tree.map(jnp.asarray, convert_clip(load_state_dict(dirs[1]), cfg_g))
    p_t5 = jax.tree.map(jnp.asarray, convert_t5(load_state_dict(dirs[2]), cfg_t5))
    triple = TripleTextEncoder((enc_l, p_l), (enc_g, p_g), (enc_t5, p_t5))
    tokenizers = SD3Tokenizers(
        checkpoint_dir=ckpt_root if os.path.isdir(os.path.join(ckpt_root, "tokenizer")) else None,
        t5_length=t5_length,
    )
    return PromptEncoder(tokenizers, triple), True
