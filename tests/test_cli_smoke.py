"""CLI smoke tests: the shipped YAMLs must drive the real entry points.

Round-1 shipped train configs that crashed the shipped loader
(VERDICT.md "What's weak" #1-2); these tests run the actual scripts in a
subprocess, end to end, on tiny synthetic data."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single virtual device: faster startup
    return subprocess.run(
        [sys.executable] + args,
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        # generous: the stage-3 smoke compiles a (tiny) joint step in a
        # subprocess that may share one host core with concurrent jobs
        timeout=2400,
    )


# stage3 is the superset path (diffusion + TESTR + matcher); stage1/2 CLI
# paths are the same code minus pieces and are covered by unit tests
@pytest.mark.parametrize("stage", ["stage3"])
def test_train_cli_smoke(stage, tmp_path):
    r = _run(
        [
            "scripts/train.py",
            "--config", f"configs/train_{stage}.yaml",
            "--smoke",
            "--out_dir", str(tmp_path / stage),
        ],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "finished at step 2" in r.stdout
    assert (tmp_path / stage / "metrics.jsonl").exists()
    # per-experiment artifacts (reference initialize.py:124, train_dit4sr.py:163-172)
    assert (tmp_path / stage / "train_config.yaml").exists()
    listing = (tmp_path / stage / "train_params.txt").read_text()
    assert "TRAIN" in listing and "frozen" in listing


def test_evaluate_cli_smoke(tmp_path):
    r = _run(
        [
            "scripts/evaluate.py",
            "--config", "configs/val_realtext.yaml",
            "--smoke",
            "--out_dir", str(tmp_path / "eval"),
        ],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "psnr" in r.stdout


def test_evaluate_cli_refuses_random_weights(tmp_path):
    """Without --allow_random/--smoke, random-weight eval must refuse
    (VERDICT weak #5: noise tables that look like results)."""
    r = _run(
        [
            "scripts/evaluate.py",
            "--config", "configs/val_realtext.yaml",
            "--num_images", "1",
            "--out_dir", str(tmp_path / "eval2"),
        ],
        tmp_path,
    )
    # exits 2 from the refusal path before touching the (absent) dataset --
    # or earlier with a clear error; it must NOT print an aggregate table
    assert r.returncode != 0
    assert "psnr" not in r.stdout


def test_demo_cli_smoke(tmp_path):
    out = tmp_path / "demo"
    r = _run(
        ["scripts/demo.py", "--smoke", "--steps", "2", "--out_dir", str(out)],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    for f in ("sr.png", "side_by_side.png", "ocr_overlay.png", "ocr_per_step.json"):
        assert (out / f).exists(), f


def test_llm_eval_cli_smoke(tmp_path):
    import json

    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    (log_dir / "img0.json").write_text(json.dumps({
        "gt_words": ["STOP", "EXIT"],
        "steps": [["ST0P"], ["STOP", "EXIT"]],
    }))
    out = tmp_path / "judge.json"
    r = _run(
        ["scripts/llm_eval.py", "--log_dir", str(log_dir), "--out", str(out)],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert out.exists()
    data = json.loads(out.read_text())
    assert data, "empty judge output"


def test_distill_cli_smoke(tmp_path):
    r = _run(
        ["scripts/distill.py", "--config", "configs/train_stage1.yaml",
         "--smoke", "--out_dir", str(tmp_path / "distill")],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "distilled 4 -> 2 steps" in r.stdout
    # both phase checkpoints written
    assert (tmp_path / "distill" / "phase_2").exists()
    assert (tmp_path / "distill" / "phase_1").exists() is False  # ladder is 4,2
    assert (tmp_path / "distill" / "metrics.jsonl").exists()


def test_serve_cli_smoke(tmp_path):
    r = _run(
        ["scripts/serve.py", "--smoke", "--once", "--port", "0",
         "--steps", "2"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "serving on" in r.stdout
    # --once prints the stats JSON as the last line
    import json

    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["warm"] and stats["requests"] == 0


def test_serve_cli_smoke_w8a8(tmp_path):
    # the int8 serving path must build, warm up, and answer stats
    r = _run(
        ["scripts/serve.py", "--smoke", "--once", "--port", "0",
         "--steps", "2", "--w8a8"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    import json

    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["warm"]


def test_serve_cli_smoke_lora(tmp_path):
    # a diffusers/PEFT-format SD3 LoRA must load, merge, and serve
    import numpy as np
    from safetensors.numpy import save_file

    r, d = 2, 32  # mmdit_tiny inner_dim = 4 heads x 8
    rng = np.random.default_rng(0)
    sd = {
        "transformer.transformer_blocks.0.attn.to_q.lora_A.weight":
            rng.normal(size=(r, d)).astype(np.float32),
        "transformer.transformer_blocks.0.attn.to_q.lora_B.weight":
            0.01 * rng.normal(size=(d, r)).astype(np.float32),
        "transformer.transformer_blocks.0.attn.to_q.alpha":
            np.asarray(4.0, np.float32),
    }
    path = tmp_path / "lora.safetensors"
    save_file(sd, str(path))
    res = _run(
        ["scripts/serve.py", "--smoke", "--once", "--port", "0",
         "--steps", "2", "--lora_ckpt", str(path), "--lora_scale", "0.5"],
        tmp_path,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    import json

    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["warm"]


def test_precompute_captions_cli_smoke(tmp_path):
    import cv2
    import numpy as np

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        cv2.imwrite(
            str(img_dir / f"im{i}.jpg"),
            (np.random.default_rng(i).uniform(size=(32, 32, 3)) * 255).astype("uint8"),
        )
    out_dir = tmp_path / "caps"
    r = _run(
        ["scripts/precompute_captions.py", "--img_dir", str(img_dir),
         "--out_dir", str(out_dir)],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    txts = list(out_dir.glob("*.txt"))
    assert len(txts) == 2
    assert txts[0].read_text().strip()


def test_train_cli_smoke_lora(tmp_path):
    # adapter-only finetune mode drives the same CLI end to end
    r = _run(
        [
            "scripts/train.py",
            "--config", "configs/train_stage1.yaml",
            "--smoke", "--lora_rank", "2",
            "--out_dir", str(tmp_path / "lora"),
        ],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "finished at step 2" in r.stdout
    listing = (tmp_path / "lora" / "train_params.txt").read_text()
    assert "mmdit_lora" in listing


def test_serve_distilled_student_cli_smoke(tmp_path):
    """distill --smoke then serve its phase_2 student: the few-step
    deployment chain works end to end."""
    r = _run(
        ["scripts/distill.py", "--config", "configs/train_stage1.yaml",
         "--smoke", "--out_dir", str(tmp_path / "d")],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    phase = tmp_path / "d" / "phase_2"
    assert phase.exists()
    res = _run(
        ["scripts/serve.py", "--smoke", "--once", "--port", "0",
         "--steps", "2", "--distilled_ckpt", str(phase)],
        tmp_path,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    import json

    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["warm"]


def test_serve_cli_smoke_ocr2hq2ocr_variant(tmp_path):
    # the flagship 3-stream variant must build and serve
    r = _run(
        ["scripts/serve.py", "--smoke", "--once", "--port", "0",
         "--steps", "2", "--variant", "ocr2hq2ocr"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    import json

    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["warm"]


def test_serve_cli_smoke_tsm(tmp_path):
    # per-step OCR -> prompt rewriting (pred_tsm) must build, warm, serve
    r = _run(
        ["scripts/serve.py", "--smoke", "--once", "--port", "0",
         "--steps", "2", "--tsm"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    import json

    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["warm"]


def test_serve_cli_smoke_cfg(tmp_path):
    # CFG serving (guidance > 1 encodes a negative prompt per request)
    r = _run(
        ["scripts/serve.py", "--smoke", "--once", "--port", "0",
         "--steps", "2", "--guidance", "2.0", "--negative_prompt", "blurry"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    import json

    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["warm"]


def test_quality_probe_cli_smoke(tmp_path):
    """The self-contained quality probe (VAE train -> diffusion train ->
    pipeline sample -> metrics.json) must run end to end at smoke size."""
    import json

    out = tmp_path / "qprobe"
    r = _run(
        ["scripts/quality_probe.py", "--smoke", "--out_dir", str(out)],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "SMOKE-OK" in r.stdout
    m = json.loads((out / "metrics.json").read_text())
    agg = m["aggregate"]
    for k in ("psnr_sr", "psnr_lq", "ssim_sr", "ssim_lq", "psnr_vae_ceiling"):
        assert k in agg and agg[k] == agg[k]  # present and not NaN
    assert len(m["per_image"]) == 2


def test_quality_probe_ocr_cli_smoke(tmp_path):
    """The stage-2/3 OCR probe (VAE -> stage1 -> stage2 TESTR -> stage3 joint
    -> A/B/C sampling incl. the OCR-guided TSM loop -> metrics.json) must run
    end to end at smoke size."""
    import json

    out = tmp_path / "qprobe_ocr"
    r = _run(
        ["scripts/quality_probe_ocr.py", "--smoke", "--out_dir", str(out)],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "SMOKE-OK" in r.stdout
    m = json.loads((out / "metrics.json").read_text())
    agg = m["aggregate"]
    for variant in ("A_null", "B_tsm", "C_oracle", "LQ"):
        assert "psnr" in agg[variant] and agg[variant]["psnr"] == agg[variant]["psnr"]
    assert "word_f1_voted" in agg and "word_f1_snapped_last_step" in agg
    assert len(m["words"]) == 2

    # chain the serving-quality sweep off the probe's smoke pickles (one
    # probe run feeds both: the sweep reloads vae.pkl + stage3.pkl through
    # eval/probe_setup.py's shared geometry)
    sweep_out = tmp_path / "sweep"
    r = _run(
        [
            "scripts/serving_quality_sweep.py", "--smoke",
            "--probe_dir", str(out), "--out_dir", str(sweep_out),
        ],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    sm = json.loads((sweep_out / "metrics.json").read_text())
    modes = {row["mode"] for row in sm["rows"]}
    assert {"exact", "bf16", "w8a8", "cache2", "cache3", "w8a8_cache2",
            "w8a8_cache3", "steps7", "steps4"} <= modes
    assert any(mode.startswith("distill") for mode in modes)
    for row in sm["rows"]:
        assert row["psnr"] == row["psnr"]          # finite
        assert row["latency_s_per_image"] > 0
    assert (sweep_out / "table.md").exists()
