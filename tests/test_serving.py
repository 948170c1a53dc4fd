"""Serving layer: in-process server + real HTTP round trip on a tiny model.

The reference has no serving layer (SURVEY.md §1: batch scripts only);
this tests the deployment surface the rebuild adds."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    import jax.numpy as jnp

    from dit4sr_tpu.config import (
        SamplerConfig, SchedulerConfig, mmdit_tiny, vae_tiny,
    )
    from dit4sr_tpu.models.mmdit import MMDiT, init_mmdit
    from dit4sr_tpu.models.vae import AutoencoderKL
    from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline
    from dit4sr_tpu.serving import SRServer
    from dit4sr_tpu.text.encoders import HashTextEncoder

    vcfg = vae_tiny()
    mcfg = mmdit_tiny(in_channels=vcfg.latent_channels,
                      out_channels=vcfg.latent_channels)
    mmdit, mparams = init_mmdit(jax.random.PRNGKey(0), mcfg, text_len=16)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(
        jax.random.PRNGKey(1), np.zeros((1, 16, 16, 3), np.float32)
    )
    pipe = SRPipeline(
        mmdit, vae, mcfg, vcfg, SchedulerConfig(),
        SamplerConfig(num_inference_steps=2, align_method="adain"),
    )
    enc = HashTextEncoder(
        seq_len=16, joint_dim=mcfg.joint_attention_dim,
        pooled_dim=mcfg.pooled_projection_dim,
    )
    return SRServer(pipe, {"mmdit": mparams, "vae": vparams}, enc,
                    lq_size=16, upscale=4)


def test_infer_shapes_and_stats(server):
    server.warmup()
    img = (np.random.default_rng(0).uniform(size=(16, 16, 3)) * 255).astype(
        np.uint8
    )
    out = server.infer(img, prompt="a sign that says STOP")
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8

    # arbitrary input size: resized in, output is 4x the ORIGINAL size
    img2 = (np.random.default_rng(1).uniform(size=(20, 12, 3)) * 255).astype(
        np.uint8
    )
    out2 = server.infer(img2)
    assert out2.shape == (80, 48, 3)

    s = server.stats()
    assert s["requests"] == 2 and s["warm"] and s["latency_p50_s"] > 0


def test_deterministic_rng_advances(server):
    """Two identical requests must NOT return bitwise-identical images
    (the server advances its rng per request)."""
    img = (np.random.default_rng(2).uniform(size=(16, 16, 3)) * 255).astype(
        np.uint8
    )
    a = server.infer(img)
    b = server.infer(img)
    assert a.shape == b.shape
    assert not np.array_equal(a, b)


def test_concurrent_requests_serialize(server):
    """ThreadingHTTPServer accepts in parallel; the device lock must
    serialize inference with every request answered (no drops/errors)."""
    import cv2

    from dit4sr_tpu.serving import serve

    server.warmup()
    httpd = serve(server, host="127.0.0.1", port=0, warmup=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    before = server.stats()["requests"]
    results = []

    def post(i):
        img = (np.random.default_rng(10 + i).uniform(size=(16, 16, 3)) * 255
               ).astype(np.uint8)
        ok, buf = cv2.imencode(".png", img)
        req = urllib.request.Request(
            f"{base}/v1/sr", data=buf.tobytes(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            results.append((r.status, len(r.read())))

    try:
        threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert len(results) == 3
        assert all(code == 200 and n > 0 for code, n in results)
        assert server.stats()["requests"] == before + 3
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_round_trip(server):
    import cv2

    from dit4sr_tpu.serving import serve

    httpd = serve(server, host="127.0.0.1", port=0, warmup=True)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert r.status == 200 and r.read() == b"ok"

        img = (np.random.default_rng(3).uniform(size=(16, 16, 3)) * 255
               ).astype(np.uint8)
        ok, buf = cv2.imencode(".png", img)
        assert ok
        req = urllib.request.Request(
            f"{base}/v1/sr?prompt=hello", data=buf.tobytes(), method="POST",
            headers={"Content-Type": "image/png"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "image/png"
            sr = cv2.imdecode(
                np.frombuffer(r.read(), np.uint8), cv2.IMREAD_COLOR
            )
        assert sr.shape == (64, 64, 3)

        with urllib.request.urlopen(f"{base}/v1/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 1

        # bad input -> 400, server stays up
        req = urllib.request.Request(
            f"{base}/v1/sr", data=b"not an image", method="POST"
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 400
        assert raised
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert r.status == 200
    finally:
        httpd.shutdown()
        httpd.server_close()
