"""On-device text encoders: CLIP text towers + T5 encoder in flax.

The reference keeps the triple text-encoder stack (CLIP-L + CLIP-bigG +
T5-XXL) as frozen HF torch modules on GPU (initialize.py:322-353) and
re-encodes the prompt on every OCR-guided denoising step
(pipeline_dit4sr.py:1425-1446). Rebuilding them in flax lets prompt
re-encoding run on the TPU inside the jitted step instead of bouncing to a
host torch process.

Both models are numerically parity-tested against randomly initialized HF
torch modules (tests/test_text_encoders.py) — the same conversion then loads
the real SD3.5 checkpoint weights.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# CLIP text model (CLIPTextModelWithProjection semantics)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CLIPConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"   # CLIP-L; bigG uses "gelu"
    dtype: Any = jnp.float32


def clip_l_config() -> CLIPConfig:
    return CLIPConfig()


def clip_bigg_config() -> CLIPConfig:
    """OpenCLIP bigG text tower (SD3's text_encoder_2)."""
    return CLIPConfig(
        hidden_size=1280, intermediate_size=5120, num_layers=32, num_heads=20,
        projection_dim=1280, hidden_act="gelu",
    )


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: jax.nn.gelu(x, approximate=False)


class CLIPLayer(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        d, M = cfg.hidden_size, cfg.num_heads
        dh = d // M

        def proj(name, y):
            return nn.Dense(d, name=name)(y).reshape(*y.shape[:-1], M, dh)

        q = proj("q_proj", h) * (dh ** -0.5)
        k = proj("k_proj", h)
        v = proj("v_proj", h)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) + causal_mask
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(*x.shape)
        x = x + nn.Dense(d, name="out_proj")(attn)

        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        return x + nn.Dense(d, name="fc2")(h)


class CLIPTextEncoder(nn.Module):
    """Returns (penultimate_hidden, pooled_projected) — the SD3 contract
    (train/train_utils.py:60-73: hidden_states[-2] + projected EOS pool)."""

    cfg: CLIPConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        cfg = self.cfg
        B, T = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_positions, cfg.hidden_size),
        )
        x = tok + pos[None, :T]

        mask = jnp.triu(jnp.full((T, T), jnp.finfo(jnp.float32).min), k=1)
        mask = mask[None, None]

        penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penultimate = x
            x = CLIPLayer(cfg, name=f"layers_{i}")(x, mask)

        final = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        # EOS = highest token id (the CLIP eot token), HF argmax convention
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = final[jnp.arange(B), eos_idx]
        pooled = nn.Dense(cfg.projection_dim, use_bias=False, name="text_projection")(
            pooled
        )
        return penultimate, pooled


# ---------------------------------------------------------------------------
# T5 encoder (t5-v1.1 / T5-XXL geometry: gated gelu, RMS norm, no biases)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    rel_buckets: int = 32
    rel_max_distance: int = 128
    dtype: Any = jnp.float32


class T5LayerNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype) * scale


def t5_relative_buckets(
    rel_pos: jnp.ndarray, num_buckets: int = 32, max_distance: int = 128
) -> jnp.ndarray:
    """Bidirectional relative position bucketing (T5 paper / HF)."""
    num_buckets = num_buckets // 2
    ret = jnp.where(rel_pos > 0, num_buckets, 0)
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(n < max_exact, n, large)


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, pos_bias, attn_mask):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        h = T5LayerNorm(cfg.d_model, name="norm_attn")(x)

        def proj(name, y):
            return (
                nn.Dense(inner, use_bias=False, name=name)(y)
                .reshape(*y.shape[:-1], cfg.num_heads, cfg.d_kv)
            )

        q = proj("q", h)  # NOTE: T5 does not scale q by 1/sqrt(d_kv)
        k = proj("k", h)
        v = proj("v", h)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) + pos_bias
        if attn_mask is not None:
            logits = jnp.where(attn_mask[:, None, None, :], logits, -1e9)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(*x.shape[:-1], inner)
        x = x + nn.Dense(cfg.d_model, use_bias=False, name="o")(attn)

        h = T5LayerNorm(cfg.d_model, name="norm_ff")(x)
        # HF "gated-gelu" resolves to gelu_new = tanh approximation
        gate = jax.nn.gelu(
            nn.Dense(cfg.d_ff, use_bias=False, name="wi_0")(h), approximate=True
        )
        lin = nn.Dense(cfg.d_ff, use_bias=False, name="wi_1")(h)
        return x + nn.Dense(cfg.d_model, use_bias=False, name="wo")(gate * lin)


class T5Encoder(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attn_mask: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        B, T = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.d_model, name="embed_tokens")(input_ids)

        rel = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]  # (Tq, Tk) = mem - query
        buckets = t5_relative_buckets(rel, cfg.rel_buckets, cfg.rel_max_distance)
        bias_table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (cfg.rel_buckets, cfg.num_heads),
        )
        pos_bias = bias_table[buckets].transpose(2, 0, 1)[None]  # (1, H, T, T)

        for i in range(cfg.num_layers):
            x = T5Block(cfg, name=f"block_{i}")(x, pos_bias, attn_mask)
        return T5LayerNorm(cfg.d_model, name="final_layer_norm")(x)


# ---------------------------------------------------------------------------
# SD3 triple-encoder prompt contract
# ---------------------------------------------------------------------------


class TripleTextEncoder:
    """CLIP-L + CLIP-bigG + T5: prompt ids -> (embeds (B, Tc+Tt, 4096),
    pooled (B, 2048)), the exact concat/pad contract of
    train/train_utils.py:76-120 and pipeline encode_prompt (:254-561)."""

    def __init__(
        self,
        clip_l: Tuple[CLIPTextEncoder, Any],
        clip_g: Tuple[CLIPTextEncoder, Any],
        t5: Tuple[T5Encoder, Any],
        joint_dim: int = 4096,
    ):
        self.clip_l, self.clip_l_params = clip_l
        self.clip_g, self.clip_g_params = clip_g
        self.t5, self.t5_params = t5
        self.joint_dim = joint_dim

    def __call__(self, clip_ids: jnp.ndarray, t5_ids: jnp.ndarray):
        """clip_ids: (B, 77) shared CLIP token ids; t5_ids: (B, T_t5)."""
        h_l, p_l = self.clip_l.apply(self.clip_l_params, clip_ids)
        h_g, p_g = self.clip_g.apply(self.clip_g_params, clip_ids)
        clip_embeds = jnp.concatenate([h_l, h_g], axis=-1)
        pooled = jnp.concatenate([p_l, p_g], axis=-1)
        pad = self.joint_dim - clip_embeds.shape[-1]
        clip_embeds = jnp.pad(clip_embeds, ((0, 0), (0, 0), (0, pad)))
        t5_embeds = self.t5.apply(self.t5_params, t5_ids)
        return jnp.concatenate([clip_embeds, t5_embeds], axis=1), pooled


class HashTextEncoder:
    """Deterministic stand-in when no checkpoint weights are available
    (zero-egress environments): prompt string -> pseudo-embeddings seeded by
    a stable hash. Lets every pipeline/bench path run end to end."""

    def __init__(self, seq_len: int = 333, joint_dim: int = 4096, pooled_dim: int = 2048):
        self.seq_len, self.joint_dim, self.pooled_dim = seq_len, joint_dim, pooled_dim

    def __call__(self, prompts):
        import hashlib

        embeds, pooled = [], []
        for p in prompts:
            seed = int.from_bytes(
                hashlib.sha256(p.encode()).digest()[:4], "little"
            )
            rng = np.random.default_rng(seed)
            embeds.append(rng.normal(size=(self.seq_len, self.joint_dim)))
            pooled.append(rng.normal(size=(self.pooled_dim,)))
        return (
            jnp.asarray(np.stack(embeds), jnp.float32),
            jnp.asarray(np.stack(pooled), jnp.float32),
        )


class WordHashTextEncoder:
    """Word-compositional deterministic encoder for zero-asset probes.

    HashTextEncoder hashes the WHOLE prompt, so a held-out word combination
    maps to an embedding unrelated to anything seen in training — prompt
    conditioning cannot generalize, which makes it useless for demonstrating
    the text-aware mechanism (OCR-guided prompt rewriting,
    pipeline_dit4sr.py:1214-1446). This encoder instead extracts the QUOTED
    words from the prompt (both `synthesize_prompt` styles quote every word,
    data/satext.py:84-94) and embeds each word independently from a
    word-seeded hash: the word "OPEN" contributes the same rows whether it
    appears in a training or an eval prompt, so the MMDiT can learn
    word -> glyph associations that transfer. A prompt with no quoted words
    (the null prompt) maps to all-zero embeddings — a stable learned-null.

    Caching: per-word embeddings are memoized; the per-step prompt re-encode
    in the OCR-guided loop is then just array assembly.
    """

    def __init__(
        self,
        seq_len: int = 16,
        joint_dim: int = 256,
        pooled_dim: int = 128,
        tokens_per_word: int = 4,
    ):
        self.seq_len = seq_len
        self.joint_dim = joint_dim
        self.pooled_dim = pooled_dim
        self.tokens_per_word = tokens_per_word
        self._cache = {}

    def _word_vecs(self, word: str):
        got = self._cache.get(word)
        if got is None:
            import hashlib

            seed = int.from_bytes(
                hashlib.sha256(word.encode()).digest()[:4], "little"
            )
            rng = np.random.default_rng(seed)
            got = (
                rng.normal(size=(self.tokens_per_word, self.joint_dim)).astype(
                    np.float32
                ),
                rng.normal(size=(self.pooled_dim,)).astype(np.float32),
            )
            self._cache[word] = got
        return got

    def __call__(self, prompts):
        import re

        embeds = np.zeros((len(prompts), self.seq_len, self.joint_dim), np.float32)
        pooled = np.zeros((len(prompts), self.pooled_dim), np.float32)
        for b, p in enumerate(prompts):
            words = re.findall(r'"([^"]+)"', p)
            vecs = []
            for w in words:
                e, pl = self._word_vecs(w)
                vecs.append(e)
                pooled[b] += pl
            if vecs:
                flat = np.concatenate(vecs, axis=0)[: self.seq_len]
                embeds[b, : flat.shape[0]] = flat
                pooled[b] /= len(vecs)
        return jnp.asarray(embeds), jnp.asarray(pooled)
