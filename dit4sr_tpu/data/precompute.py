"""Offline precompute utilities + the precomputed-pair dataset.

Rebuild of the reference's utils_data/ toolchain:
  * `precompute_latents`  == make_latents.py:37-54 (VAE-encode an image dir
    to .npy latents)
  * `precompute_embeddings` == make_embedding.py (prompt + NULL embeddings)
  * `precompute_paired_data` == make_paired_data.py (offline Real-ESRGAN LQ
    generation)
  * `PairedLatentDataset` == dataloaders/paired_dataset_sd3_latent.py:10-86
    (precomputed latent/embedding pairs with NULL-embed dropout)

Artifacts are .npz per image id (the torch reference uses .pt).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from glob import glob
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def precompute_latents(
    image_paths: List[str],
    encode_fn: Callable[[jnp.ndarray], jnp.ndarray],
    out_dir: str,
    batch_size: int = 8,
    size: int = 512,
):
    """VAE-encode images to latents. encode_fn: (B,H,W,3)[0,1] -> latents."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    for i in range(0, len(image_paths), batch_size):
        chunk = image_paths[i : i + batch_size]
        imgs = []
        for p in chunk:
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            if img.shape[:2] != (size, size):
                img = cv2.resize(img, (size, size))
            imgs.append(img.astype(np.float32) / 255.0)
        latents = np.asarray(encode_fn(jnp.asarray(np.stack(imgs))))
        for p, z in zip(chunk, latents):
            img_id = os.path.splitext(os.path.basename(p))[0]
            np.savez(os.path.join(out_dir, f"{img_id}.npz"), latent=z)


def precompute_embeddings(
    prompts: dict,  # img_id -> prompt string
    encode_prompt_fn: Callable,
    out_dir: str,
    batch_size: int = 16,
):
    """Prompt embeddings incl. the NULL embedding (make_embedding.py)."""
    os.makedirs(out_dir, exist_ok=True)
    ids = sorted(prompts)
    for i in range(0, len(ids), batch_size):
        chunk = ids[i : i + batch_size]
        embeds, pooled = encode_prompt_fn([prompts[j] for j in chunk])
        embeds, pooled = np.asarray(embeds), np.asarray(pooled)
        for j, img_id in enumerate(chunk):
            np.savez(
                os.path.join(out_dir, f"{img_id}.npz"),
                prompt_embeds=embeds[j],
                pooled_prompt_embeds=pooled[j],
            )
    null_e, null_p = encode_prompt_fn([""])
    np.savez(
        os.path.join(out_dir, "NULL.npz"),
        prompt_embeds=np.asarray(null_e)[0],
        pooled_prompt_embeds=np.asarray(null_p)[0],
    )


def precompute_paired_data(
    image_paths: List[str],
    out_dir: str,
    seed: int = 0,
    batch_size: int = 4,
    size: int = 512,
):
    """Offline Real-ESRGAN degradation: HQ dir -> (gt, lq) pairs
    (make_paired_data.py; the multi-GPU sharding becomes a start/stride
    split of image_paths by the caller)."""
    import cv2

    from dit4sr_tpu.data.degradation import realesrgan_degradation, sample_params
    from dit4sr_tpu.data.kernels import sample_degradation_kernels

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    fn = jax.jit(lambda k, g, p: realesrgan_degradation(k, g, p))
    for i in range(0, len(image_paths), batch_size):
        chunk = image_paths[i : i + batch_size]
        imgs = []
        for p in chunk:
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            if img.shape[:2] != (size, size):
                img = cv2.resize(img, (size, size))
            imgs.append(img.astype(np.float32) / 255.0)
        gt = np.stack(imgs)
        ks = [sample_degradation_kernels(rng) for _ in chunk]
        kernels = tuple(np.stack([k[j] for k in ks]) for j in range(3))
        params = sample_params(rng, len(chunk), kernels)
        gt_out, lq = fn(jax.random.PRNGKey(int(rng.integers(1 << 31))), jnp.asarray(gt), params)
        for p, g, l in zip(chunk, np.asarray(gt_out), np.asarray(lq)):
            img_id = os.path.splitext(os.path.basename(p))[0]
            np.savez(os.path.join(out_dir, f"{img_id}.npz"), gt=g, lq=l)


@dataclass
class PairedLatentDataset:
    """Precomputed latents + prompt embeddings with NULL-embed dropout
    (paired_dataset_sd3_latent.py:10-86). Expects per-id .npz with keys
    latent_lr, latent_hr + embedding .npz with prompt_embeds/pooled."""

    latent_dir: str
    embed_dir: str
    null_text_ratio: float = 0.1
    seed: int = 0

    def __post_init__(self):
        self.ids = sorted(
            os.path.splitext(os.path.basename(p))[0]
            for p in glob(os.path.join(self.latent_dir, "*.npz"))
        )
        self._rng = np.random.default_rng(self.seed)
        null = np.load(os.path.join(self.embed_dir, "NULL.npz"))
        self._null = (null["prompt_embeds"], null["pooled_prompt_embeds"])

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, idx: int) -> dict:
        img_id = self.ids[idx]
        lat = np.load(os.path.join(self.latent_dir, f"{img_id}.npz"))
        emb = np.load(os.path.join(self.embed_dir, f"{img_id}.npz"))
        if self._rng.uniform() < self.null_text_ratio:
            pe, pp = self._null
        else:
            pe, pp = emb["prompt_embeds"], emb["pooled_prompt_embeds"]
        return {
            "latent_hr": lat["latent_hr"],
            "latent_lr": lat["latent_lr"],
            "prompt_embeds": pe,
            "pooled_prompt_embeds": pp,
            "img_id": img_id,
        }

    def iter_batches(self, batch_size: int, shuffle: bool = True, epochs=None):
        epoch = 0
        while epochs is None or epoch < epochs:
            order = np.arange(len(self))
            if shuffle:
                self._rng.shuffle(order)
            for i in range(0, len(order) - batch_size + 1, batch_size):
                items = [self[int(j)] for j in order[i : i + batch_size]]
                yield {
                    k: np.stack([it[k] for it in items])
                    if k != "img_id"
                    else [it[k] for it in items]
                    for k in items[0]
                }
            epoch += 1
