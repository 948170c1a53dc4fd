"""OCR-guided sampling: per-step text spotting feeds the prompt (TSM).

Rebuild of the reference's defining inference loop
(pipelines/pipeline_dit4sr.py:1214-1446): at every denoising step the TESTR
module reads the MMDiT's intermediate features, predicts scene text, the
predicted words are rewritten into the prompt, and the prompt is re-encoded
for the next step. Optionally a VLM can correct the OCR words at chosen
iterations (:1288-1379).

TPU structure: one jitted step computes [velocity + feature extraction +
TESTR inference + Euler update] on device; only the tiny (K,) word ids and
scores come back to host, where the prompt is rewritten and re-encoded
(host because it needs tokenization). Embedding shapes are static so the
step compiles exactly once.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import TESTRConfig
from dit4sr_tpu.data import charset
from dit4sr_tpu.data.satext import synthesize_prompt
from dit4sr_tpu.models.testr.detector import SpotterPredictions, TextSpotter
from dit4sr_tpu.models.testr.model import fuse_dit_features
from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline
from dit4sr_tpu.schedulers.flow_match import make_schedule
from dit4sr_tpu.train.ocr_loss import num_streams_extracted


@dataclass
class OCRStepResult:
    texts: List[List[str]]          # per batch element: kept words
    scores: np.ndarray              # (B, K)
    keep: np.ndarray                # (B, K)
    polygons: np.ndarray            # (B, K, Np, 2)
    recs: np.ndarray = None         # (B, K) argmax char ids for EVERY query
    # accumulated cross-step word belief at this step (vote_frac mode): the
    # words that built this step's prompt. None when voting is off.
    voted_texts: Optional[List[List[str]]] = None

    def topk_words(self, k: int) -> List[List[str]]:
        """Per image: words of the k highest-scoring queries regardless of
        the keep threshold (telemetry / threshold-free eval fallback)."""
        out = []
        for b in range(self.scores.shape[0]):
            order = np.argsort(-self.scores[b])[:k]
            words = [charset.decode(self.recs[b, q]) for q in order]
            out.append([w for w in words if w])
        return out


class OCRGuidedSampler:
    """SRPipeline + TextSpotter with per-step prompt rewriting."""

    def __init__(
        self,
        pipeline: SRPipeline,
        spotter: TextSpotter,
        encode_prompt_fn: Callable[[List[str]], Tuple[jnp.ndarray, jnp.ndarray]],
        caption_style: str = "descriptive",
        correct_fn: Optional[Callable[[List[str], int], List[str]]] = None,
        correct_steps: Tuple[int, ...] = (),
        threshold: Optional[float] = None,
        spot_every: int = 1,
        correct_with_image: bool = False,
        vote_frac: Optional[float] = None,
        vote_topk: Optional[int] = None,
    ):
        self.pipe = pipeline
        self.spotter = spotter
        self.encode_prompt_fn = encode_prompt_fn
        self.caption_style = caption_style
        self.correct_fn = correct_fn
        # host-side override of TESTRConfig.inference_th_test: the keep mask
        # is recomputed from scores in decode_predictions, so a calibrated
        # threshold (quality_probe_ocr.py calibrates on train scenes — the
        # reference's fixed 0.45 is tuned for a converged full-size model)
        # needs no retrace. None = use the in-graph keep mask.
        self.threshold = threshold
        # spotting cadence: 1 = read features + rewrite the prompt every
        # denoising step (the reference's default TSM protocol); K > 1 spots
        # only every K-th step and runs a cheaper no-extraction step between
        # (the reference's VLM analogue corrects only at chosen iterations,
        # pipeline_dit4sr.py:1288-1379 — cadence is the latency lever when
        # per-step spotting + host re-encode dominates)
        self.spot_every = max(1, spot_every)
        # reference Qwen-VL correction sees the CURRENT decoded preview
        # (pipeline_dit4sr.py:1288-1379): with correct_with_image=True the
        # sampler decodes the latent at each correction step and calls
        # correct_fn(words, step, image=preview_b) — pair with
        # text.vlm.VLMCorrectionAgent
        self.correct_with_image = correct_with_image
        # Temporal voting over spotting steps (None = reference-parity
        # per-step prompts). Motivation (artifacts/spotter_diagnosis.json):
        # the spotter's per-step reads are noisy and WORST at low sigma —
        # exactly where a final-step-only read happens — while true words
        # recur across the mid-sigma sweet spot and garbage reads vary
        # step to step. With vote_frac=v the prompt at each step is built
        # from the words seen (post-correct_fn) in >= v of the spotting
        # steps so far, ranked by vote count; the final belief is exposed
        # per step as OCRStepResult.voted_texts. This is the zero-asset
        # analogue of the reference accumulating VLM-corrected words
        # across iterations (pipeline_dit4sr.py:1288-1379) rather than
        # trusting a single read.
        self.vote_frac = vote_frac
        # Cap the belief at the top-K words by vote count (ties: first
        # seen). Without a cap the belief accretes every persistent misread
        # — and a wrong word fed into the prompt tends to get RENDERED and
        # then re-read (feedback amplification), so the set only grows.
        # K should track the expected instance count per image.
        self.vote_topk = vote_topk
        self.correct_steps = set(correct_steps)
        self._n_ext = num_streams_extracted(pipeline.model_cfg)
        # memoized per num_steps: __call__ is invoked repeatedly (per-step
        # telemetry during probe training, calibration passes, eval) and a
        # fresh jit closure per call would retrace every time
        self._step_fns: Dict[int, Callable] = {}

    def make_step_fn(self, num_steps: int) -> Callable:
        if num_steps in self._step_fns:
            return self._step_fns[num_steps]
        pipe = self.pipe
        sched = make_schedule(pipe.scheduler_cfg, num_steps)
        mcfg = pipe.model_cfg
        spotter = self.spotter
        n_ext = self._n_ext

        use_cfg = pipe.sampler_cfg.guidance_scale > 1.0
        scale = pipe.sampler_cfg.guidance_scale

        @jax.jit
        def step(params, i, latents, control_latent, text_embeds, pooled_embeds,
                 neg_text_embeds=None, neg_pooled_embeds=None):
            b = latents.shape[0]
            if use_cfg:
                if neg_text_embeds is None or neg_pooled_embeds is None:
                    raise ValueError(
                        "guidance_scale > 1 requires negative embeddings "
                        "(the reference's TSM val configs run guidance 8.0 "
                        "with a null negative prompt, pipeline_dit4sr.py:1107)"
                    )
                latents_in = jnp.concatenate([latents, latents])
                control_in = jnp.concatenate([control_latent, control_latent])
                text_in = jnp.concatenate([neg_text_embeds, text_embeds])
                pooled_in = jnp.concatenate([neg_pooled_embeds, pooled_embeds])
            else:
                latents_in, control_in = latents, control_latent
                text_in, pooled_in = text_embeds, pooled_embeds
            t = jnp.broadcast_to(sched.timesteps[i], (latents_in.shape[0],))
            out, feats = pipe.mmdit.apply(
                params["mmdit"],
                latents_in.astype(mcfg.dtype),
                control_in.astype(mcfg.dtype),
                text_in.astype(mcfg.dtype),
                pooled_in.astype(mcfg.dtype),
                t,
                extract_features=True,
            )
            if use_cfg:
                uncond, cond = out[:b], out[b:]
                out = uncond + scale * (cond - uncond)
                # TESTR reads the COND half's features. (The reference indexes
                # ocr_result[0], which under its [neg, pos] batching is the
                # *negative* sample — an apparent quirk we deliberately do not
                # replicate; pipeline_dit4sr.py:1246.)
                feats = feats[:, b:]
            new_latents = sched.step(i, latents, out)
            maps = fuse_dit_features(
                feats.astype(jnp.float32), mcfg.patch_size, n_ext
            )
            preds = spotter.predict(params["testr"], maps)
            return new_latents, preds

        @jax.jit
        def plain_step(params, i, latents, control_latent, text_embeds,
                       pooled_embeds, neg_text_embeds=None,
                       neg_pooled_embeds=None):
            """Non-spotting step (spot_every > 1 cadence): no feature
            extraction, no TESTR — just the velocity + Euler update."""
            b = latents.shape[0]
            if use_cfg:
                latents_in = jnp.concatenate([latents, latents])
                control_in = jnp.concatenate([control_latent, control_latent])
                text_in = jnp.concatenate([neg_text_embeds, text_embeds])
                pooled_in = jnp.concatenate([neg_pooled_embeds, pooled_embeds])
            else:
                latents_in, control_in = latents, control_latent
                text_in, pooled_in = text_embeds, pooled_embeds
            t = jnp.broadcast_to(sched.timesteps[i], (latents_in.shape[0],))
            out, _ = pipe.mmdit.apply(
                params["mmdit"],
                latents_in.astype(mcfg.dtype),
                control_in.astype(mcfg.dtype),
                text_in.astype(mcfg.dtype),
                pooled_in.astype(mcfg.dtype),
                t,
            )
            if use_cfg:
                uncond, cond = out[:b], out[b:]
                out = uncond + scale * (cond - uncond)
            return sched.step(i, latents, out)

        self._step_fns[num_steps] = (step, plain_step)
        return self._step_fns[num_steps]

    def decode_predictions(self, preds: SpotterPredictions) -> OCRStepResult:
        recs = np.asarray(preds.recs)
        scores = np.asarray(preds.scores)
        if self.threshold is not None:
            keep = scores >= self.threshold
        else:
            keep = np.asarray(preds.keep)
        texts: List[List[str]] = []
        for b in range(keep.shape[0]):
            words = [
                charset.decode(recs[b, k]) for k in np.nonzero(keep[b])[0]
            ]
            texts.append([w for w in words if w])
        return OCRStepResult(
            texts, scores, keep, np.asarray(preds.polygons), recs
        )

    def __call__(
        self,
        params: Dict[str, Any],
        rng: jax.Array,
        lq_image: jnp.ndarray,
        initial_prompts: List[str],
        num_steps: Optional[int] = None,
        return_ocr_log: bool = False,
        negative_prompts: Optional[List[str]] = None,
    ):
        """LQ image + initial prompt -> SR image, with per-step TSM feedback.
        With guidance_scale > 1, `negative_prompts` (default: null prompts)
        are encoded once and CFG-combined every step."""
        pipe = self.pipe
        n = num_steps or pipe.sampler_cfg.num_inference_steps
        neg_text = neg_pooled = None
        if pipe.sampler_cfg.guidance_scale > 1.0:
            if negative_prompts is None:
                negative_prompts = [""] * len(initial_prompts)
            neg_text, neg_pooled = self.encode_prompt_fn(negative_prompts)
        rng_enc, rng_noise = jax.random.split(rng)
        control_latent = pipe.encode_image(params["vae"], lq_image, rng_enc)
        noise = jax.random.normal(rng_noise, control_latent.shape, jnp.float32)
        sched = make_schedule(pipe.scheduler_cfg, n)
        if pipe.sampler_cfg.start_point == "lr":
            s0 = sched.sigmas[0]
            latents = (1.0 - s0) * control_latent.astype(jnp.float32) + s0 * noise
        else:
            latents = noise

        step_fn, plain_step_fn = self.make_step_fn(n)
        text_embeds, pooled = self.encode_prompt_fn(initial_prompts)
        ocr_log = []
        # vote accumulators: per image, word -> (count, first-seen order)
        votes: List[Dict[str, List[float]]] = [dict() for _ in initial_prompts]
        n_spot = 0
        for i in range(n):
            if i % self.spot_every:
                latents = plain_step_fn(
                    params, jnp.asarray(i), latents, control_latent,
                    text_embeds, pooled, neg_text, neg_pooled,
                )
                continue
            latents, preds = step_fn(
                params, jnp.asarray(i), latents, control_latent,
                text_embeds, pooled, neg_text, neg_pooled,
            )
            if i < n - 1:
                result = self.decode_predictions(preds)
                ocr_log.append(result)
                correcting = self.correct_fn is not None and i in self.correct_steps
                preview = None
                if correcting and self.correct_with_image:
                    preview = np.asarray(
                        pipe.decode_latent(params["vae"], latents)
                    )
                prompts = []
                if self.vote_frac is not None:
                    n_spot += 1
                    result.voted_texts = []
                for b, words in enumerate(result.texts):
                    if correcting:
                        if preview is not None:
                            words = self.correct_fn(words, i, image=preview[b])
                        else:
                            words = self.correct_fn(words, i)
                    if self.vote_frac is not None:
                        # dict.fromkeys, NOT set(): set iteration order
                        # depends on string-hash randomization, which would
                        # make belief order (and vote_topk truncation, and
                        # the prompts) nondeterministic across processes
                        for w in dict.fromkeys(words):
                            if w in votes[b]:
                                votes[b][w][0] += 1.0
                            else:
                                votes[b][w] = [1.0, len(votes[b])]
                        need = max(1.0, self.vote_frac * n_spot)
                        words = [
                            w for w, (c, _) in sorted(
                                votes[b].items(),
                                key=lambda kv: (-kv[1][0], kv[1][1]),
                            )
                            if c >= need
                        ]
                        if self.vote_topk is not None:
                            words = words[: self.vote_topk]
                        result.voted_texts.append(words)
                    if words:
                        prompts.append(synthesize_prompt(words, self.caption_style))
                    else:
                        prompts.append(initial_prompts[b])
                text_embeds, pooled = self.encode_prompt_fn(prompts)

        image = pipe.decode_latent(params["vae"], latents)
        from dit4sr_tpu.ops.color_fix import apply_color_fix

        image = apply_color_fix(image, lq_image, pipe.sampler_cfg.align_method)
        if return_ocr_log:
            return image, ocr_log
        return image
