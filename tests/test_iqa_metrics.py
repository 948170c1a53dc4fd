"""DISTS / CLIPIQA parity vs independent torch oracles + converter layout.

Each oracle is written here from the published architecture description,
reading an official-layout torch state dict functionally — so the test
checks both the flax arch and the converter key mapping at once.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dit4sr_tpu.eval.clipiqa import (  # noqa: E402
    clipiqa_score,
    convert_clip_text,
    convert_clipiqa_torch,
    random_clipiqa_params,
    text_forward,
)
from dit4sr_tpu.eval.dists import (  # noqa: E402
    _CHNS,
    _STAGES,
    convert_dists_torch,
    dists_score,
    random_dists_params,
)


def _img(rng, size=64, b=2):
    return rng.uniform(size=(b, size, size, 3)).astype(np.float32)


# --------------------------------------------------------------------------
# DISTS
# --------------------------------------------------------------------------

def _dists_torch_sd(rng):
    """Random weights in the official DISTS checkpoint layout (OIHW)."""
    # vgg16.features conv indices per stage
    idxs = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
    sd = {}
    cin = 3
    for s, (stage, ii) in enumerate(zip(_STAGES, idxs), start=1):
        for cout, i in zip(stage, ii):
            sd[f"stage{s}.{i}.weight"] = rng.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32)
            sd[f"stage{s}.{i}.bias"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)
            cin = cout
    total = sum(_CHNS)
    sd["alpha"] = rng.uniform(0, 1, (1, total, 1, 1)).astype(np.float32)
    sd["beta"] = rng.uniform(0, 1, (1, total, 1, 1)).astype(np.float32)
    return sd


def _l2pool_torch(x):
    a = np.hanning(5)[1:-1]
    g = torch.tensor((np.outer(a, a) / np.outer(a, a).sum()).astype(np.float32))
    c = x.shape[1]
    filt = g[None, None].repeat(c, 1, 1, 1)
    return (F.conv2d(x * x, filt, stride=2, padding=1, groups=c) + 1e-12).sqrt()


def _dists_torch(sd, a, b):
    """Oracle: official DISTS forward, functional."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    idxs = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]

    def feats(x):
        out = [x]
        h = (x - mean) / std
        for s, ii in enumerate(idxs, start=1):
            if s > 1:
                h = _l2pool_torch(h)
            for i in ii:
                w = torch.tensor(sd[f"stage{s}.{i}.weight"])
                bb = torch.tensor(sd[f"stage{s}.{i}.bias"])
                h = F.relu(F.conv2d(h, w, bb, padding=1))
            out.append(h)
        return out

    fa, fb = feats(a), feats(b)
    alpha = torch.tensor(sd["alpha"])
    beta = torch.tensor(sd["beta"])
    w_sum = alpha.sum() + beta.sum()
    al = torch.split(alpha / w_sum, _CHNS, dim=1)
    be = torch.split(beta / w_sum, _CHNS, dim=1)
    c1 = c2 = 1e-6
    d1 = d2 = 0
    for k in range(len(_CHNS)):
        xm = fa[k].mean([2, 3], keepdim=True)
        ym = fb[k].mean([2, 3], keepdim=True)
        s1 = (2 * xm * ym + c1) / (xm ** 2 + ym ** 2 + c1)
        d1 = d1 + (al[k] * s1).sum(1, keepdim=True)
        xv = ((fa[k] - xm) ** 2).mean([2, 3], keepdim=True)
        yv = ((fb[k] - ym) ** 2).mean([2, 3], keepdim=True)
        cov = (fa[k] * fb[k]).mean([2, 3], keepdim=True) - xm * ym
        s2 = (2 * cov + c2) / (xv + yv + c2)
        d2 = d2 + (be[k] * s2).sum(1, keepdim=True)
    return (1 - (d1 + d2)).squeeze(-1).squeeze(-1).squeeze(-1)


@pytest.mark.slow
def test_dists_matches_torch_oracle():
    rng = np.random.default_rng(0)
    sd = _dists_torch_sd(rng)
    params = {k: jnp.asarray(v) for k, v in convert_dists_torch(sd).items()}
    a, b = _img(rng), _img(np.random.default_rng(1))
    ours = np.asarray(dists_score(params, jnp.asarray(a), jnp.asarray(b)))
    ta = torch.tensor(a.transpose(0, 3, 1, 2))
    tb = torch.tensor(b.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref = _dists_torch(sd, ta, tb).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_dists_identity_and_order():
    rng = np.random.default_rng(2)
    params = {k: jnp.asarray(v) for k, v in random_dists_params(rng).items()}
    a = jnp.asarray(_img(rng, b=1))
    same = float(dists_score(params, a, a)[0])
    assert abs(same) < 1e-4
    noisy = jnp.clip(a + 0.2 * jnp.asarray(rng.normal(size=a.shape), jnp.float32), 0, 1)
    noisier = jnp.clip(a + 0.5 * jnp.asarray(rng.normal(size=a.shape), jnp.float32), 0, 1)
    d1 = float(dists_score(params, a, noisy)[0])
    d2 = float(dists_score(params, a, noisier)[0])
    assert same < d1 < d2


# --------------------------------------------------------------------------
# CLIPIQA — visual encoder vs torch oracle (reduced depth for CPU speed)
# --------------------------------------------------------------------------

def _clip_visual_torch_sd(rng, blocks=(3, 4, 6, 3), widths=(64, 128, 256, 512),
                          spacial=7, out_dim=1024):
    def n(*s):
        return rng.normal(0, 0.04, s).astype(np.float32)

    sd = {}
    stem = [(3, 32), (32, 32), (32, 64)]
    for i, (ci, co) in enumerate(stem, start=1):
        sd[f"visual.conv{i}.weight"] = n(co, ci, 3, 3)
        sd[f"visual.bn{i}.weight"] = np.ones((co,), np.float32)
        sd[f"visual.bn{i}.bias"] = np.zeros((co,), np.float32)
        sd[f"visual.bn{i}.running_mean"] = n(co)
        sd[f"visual.bn{i}.running_var"] = np.abs(n(co)) + 1.0
    cin = 64
    for li, (nb, planes) in enumerate(zip(blocks, widths), start=1):
        for bi in range(nb):
            tp = f"visual.layer{li}.{bi}"
            cmid, cout = planes, planes * 4
            sd[f"{tp}.conv1.weight"] = n(cmid, cin, 1, 1)
            sd[f"{tp}.conv2.weight"] = n(cmid, cmid, 3, 3)
            sd[f"{tp}.conv3.weight"] = n(cout, cmid, 1, 1)
            for ci, c in (("1", cmid), ("2", cmid), ("3", cout)):
                sd[f"{tp}.bn{ci}.weight"] = np.ones((c,), np.float32)
                sd[f"{tp}.bn{ci}.bias"] = np.zeros((c,), np.float32)
                sd[f"{tp}.bn{ci}.running_mean"] = n(c)
                sd[f"{tp}.bn{ci}.running_var"] = np.abs(n(c)) + 1.0
            if bi == 0 and (li > 1 or cin != cout):
                sd[f"{tp}.downsample.0.weight"] = n(cout, cin, 1, 1)
                sd[f"{tp}.downsample.1.weight"] = np.ones((cout,), np.float32)
                sd[f"{tp}.downsample.1.bias"] = np.zeros((cout,), np.float32)
                sd[f"{tp}.downsample.1.running_mean"] = n(cout)
                sd[f"{tp}.downsample.1.running_var"] = np.abs(n(cout)) + 1.0
            cin = cout
    embed = cin
    sd["visual.attnpool.positional_embedding"] = n(spacial * spacial + 1, embed)
    for k in ("q_proj", "k_proj", "v_proj"):
        sd[f"visual.attnpool.{k}.weight"] = n(embed, embed)
        sd[f"visual.attnpool.{k}.bias"] = n(embed)
    sd["visual.attnpool.c_proj.weight"] = n(out_dim, embed)
    sd["visual.attnpool.c_proj.bias"] = n(out_dim)
    sd["logit_scale"] = np.float32(np.log(100.0))
    return sd


def _bn_t(x, sd, p):
    return F.batch_norm(
        x, torch.tensor(sd[f"{p}.running_mean"]), torch.tensor(sd[f"{p}.running_var"]),
        torch.tensor(sd[f"{p}.weight"]), torch.tensor(sd[f"{p}.bias"]), False, 0.0, 1e-5,
    )


def _clip_visual_torch(sd, x, blocks=(3, 4, 6, 3), heads=32):
    """Oracle: CLIP ModifiedResNet forward, functional, from the paper/repo
    description (stem, avgpool strides, attention pooling)."""
    mean = torch.tensor([0.48145466, 0.4578275, 0.40821073]).view(1, 3, 1, 1)
    std = torch.tensor([0.26862954, 0.26130258, 0.27577711]).view(1, 3, 1, 1)
    h = (x - mean) / std
    h = F.relu(_bn_t(F.conv2d(h, torch.tensor(sd["visual.conv1.weight"]), stride=2, padding=1), sd, "visual.bn1"))
    h = F.relu(_bn_t(F.conv2d(h, torch.tensor(sd["visual.conv2.weight"]), padding=1), sd, "visual.bn2"))
    h = F.relu(_bn_t(F.conv2d(h, torch.tensor(sd["visual.conv3.weight"]), padding=1), sd, "visual.bn3"))
    h = F.avg_pool2d(h, 2)
    for li, nb in enumerate(blocks, start=1):
        for bi in range(nb):
            tp = f"visual.layer{li}.{bi}"
            stride = 2 if (li > 1 and bi == 0) else 1
            out = F.relu(_bn_t(F.conv2d(h, torch.tensor(sd[f"{tp}.conv1.weight"])), sd, f"{tp}.bn1"))
            out = F.relu(_bn_t(F.conv2d(out, torch.tensor(sd[f"{tp}.conv2.weight"]), padding=1), sd, f"{tp}.bn2"))
            if stride > 1:
                out = F.avg_pool2d(out, stride)
            out = _bn_t(F.conv2d(out, torch.tensor(sd[f"{tp}.conv3.weight"])), sd, f"{tp}.bn3")
            if f"{tp}.downsample.0.weight" in sd:
                idn = F.avg_pool2d(h, stride) if stride > 1 else h
                idn = _bn_t(F.conv2d(idn, torch.tensor(sd[f"{tp}.downsample.0.weight"])), sd, f"{tp}.downsample.1")
            else:
                idn = h
            h = F.relu(out + idn)
    # attention pool
    B, C, H, W = h.shape
    toks = h.flatten(2).permute(2, 0, 1)  # (HW, B, C)
    toks = torch.cat([toks.mean(0, keepdim=True), toks], 0)
    pos = torch.tensor(sd["visual.attnpool.positional_embedding"])  # (1+S*S, C)
    toks = toks + pos[:, None]
    out, _ = F.multi_head_attention_forward(
        query=toks[:1], key=toks, value=toks,
        embed_dim_to_check=C, num_heads=heads,
        q_proj_weight=torch.tensor(sd["visual.attnpool.q_proj.weight"]),
        k_proj_weight=torch.tensor(sd["visual.attnpool.k_proj.weight"]),
        v_proj_weight=torch.tensor(sd["visual.attnpool.v_proj.weight"]),
        in_proj_weight=None, in_proj_bias=torch.cat([
            torch.tensor(sd["visual.attnpool.q_proj.bias"]),
            torch.tensor(sd["visual.attnpool.k_proj.bias"]),
            torch.tensor(sd["visual.attnpool.v_proj.bias"])]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=torch.tensor(sd["visual.attnpool.c_proj.weight"]),
        out_proj_bias=torch.tensor(sd["visual.attnpool.c_proj.bias"]),
        use_separate_proj_weight=True, training=False, need_weights=False,
    )
    return out[0]


@pytest.mark.slow
def test_clipiqa_matches_torch_oracle():
    rng = np.random.default_rng(0)
    sd = _clip_visual_torch_sd(rng)
    text_features = rng.normal(0, 1, (2, 1024)).astype(np.float32)
    params = {
        k: jnp.asarray(v)
        for k, v in convert_clipiqa_torch(sd, text_features=text_features).items()
    }
    # 224 input -> 7x7 grid matches the pos embedding, no interpolation.
    x = _img(rng, size=224, b=1)
    ours = np.asarray(clipiqa_score(params, jnp.asarray(x)))
    with torch.no_grad():
        img = _clip_visual_torch(sd, torch.tensor(x.transpose(0, 3, 1, 2)))
        img = img / img.norm(dim=-1, keepdim=True)
        txt = torch.tensor(text_features)
        txt = txt / txt.norm(dim=-1, keepdim=True)
        logits = 100.0 * img @ txt.t()
        ref = logits.softmax(-1)[:, 0].numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_clipiqa_arbitrary_size_runs():
    """Non-224 inputs go through pos-embedding interpolation."""
    rng = np.random.default_rng(3)
    params = {k: jnp.asarray(v) for k, v in random_clipiqa_params(rng).items()}
    s = np.asarray(clipiqa_score(params, jnp.asarray(_img(rng, size=160, b=2))))
    assert s.shape == (2,) and np.all((s >= 0) & (s <= 1))


@pytest.mark.slow
def test_clip_text_encoder_matches_torch_oracle():
    """Flax CLIP text transformer vs torch functional oracle (tiny geometry
    via real layout keys: 2 layers, width 64, 4 heads... width must divide 8
    heads in our fwd — use width 64 with heads=8)."""
    rng = np.random.default_rng(0)

    def n(*s):
        return rng.normal(0, 0.05, s).astype(np.float32)

    vocab, width, layers, ctx, out_dim = 50, 64, 2, 12, 32
    sd = {
        "token_embedding.weight": n(vocab, width),
        "positional_embedding": n(ctx, width),
        "ln_final.weight": np.ones((width,), np.float32),
        "ln_final.bias": np.zeros((width,), np.float32),
        "text_projection": n(width, out_dim),
    }
    for i in range(layers):
        tp = f"transformer.resblocks.{i}"
        sd[f"{tp}.ln_1.weight"] = np.ones((width,), np.float32)
        sd[f"{tp}.ln_1.bias"] = np.zeros((width,), np.float32)
        sd[f"{tp}.attn.in_proj_weight"] = n(3 * width, width)
        sd[f"{tp}.attn.in_proj_bias"] = n(3 * width)
        sd[f"{tp}.attn.out_proj.weight"] = n(width, width)
        sd[f"{tp}.attn.out_proj.bias"] = n(width)
        sd[f"{tp}.ln_2.weight"] = np.ones((width,), np.float32)
        sd[f"{tp}.ln_2.bias"] = np.zeros((width,), np.float32)
        sd[f"{tp}.mlp.c_fc.weight"] = n(4 * width, width)
        sd[f"{tp}.mlp.c_fc.bias"] = n(4 * width)
        sd[f"{tp}.mlp.c_proj.weight"] = n(width, 4 * width)
        sd[f"{tp}.mlp.c_proj.bias"] = n(width)

    ids = np.zeros((2, ctx), np.int32)
    ids[0, :4] = [30, 5, 7, 49]  # 49 = max id -> eot position 3
    ids[1, :6] = [30, 8, 9, 2, 4, 49]

    params = {k: jnp.asarray(v) for k, v in convert_clip_text(sd).items()}
    ours = np.asarray(text_forward(params, jnp.asarray(ids)))

    with torch.no_grad():
        x = torch.tensor(sd["token_embedding.weight"])[torch.tensor(ids.astype(np.int64))]
        x = x + torch.tensor(sd["positional_embedding"])
        mask = torch.full((ctx, ctx), float("-inf")).triu(1)
        for i in range(layers):
            tp = f"transformer.resblocks.{i}"
            h = F.layer_norm(x, (width,), torch.tensor(sd[f"{tp}.ln_1.weight"]),
                             torch.tensor(sd[f"{tp}.ln_1.bias"]))
            hq = h.transpose(0, 1)
            o, _ = F.multi_head_attention_forward(
                hq, hq, hq, width, 8,
                torch.tensor(sd[f"{tp}.attn.in_proj_weight"]),
                torch.tensor(sd[f"{tp}.attn.in_proj_bias"]),
                None, None, False, 0.0,
                torch.tensor(sd[f"{tp}.attn.out_proj.weight"]),
                torch.tensor(sd[f"{tp}.attn.out_proj.bias"]),
                training=False, need_weights=False, attn_mask=mask,
            )
            x = x + o.transpose(0, 1)
            h = F.layer_norm(x, (width,), torch.tensor(sd[f"{tp}.ln_2.weight"]),
                             torch.tensor(sd[f"{tp}.ln_2.bias"]))
            h = h @ torch.tensor(sd[f"{tp}.mlp.c_fc.weight"]).t() + torch.tensor(sd[f"{tp}.mlp.c_fc.bias"])
            h = h * torch.sigmoid(1.702 * h)
            x = x + (h @ torch.tensor(sd[f"{tp}.mlp.c_proj.weight"]).t() + torch.tensor(sd[f"{tp}.mlp.c_proj.bias"]))
        x = F.layer_norm(x, (width,), torch.tensor(sd["ln_final.weight"]),
                         torch.tensor(sd["ln_final.bias"]))
        eot = torch.tensor(ids.astype(np.int64)).argmax(-1)
        feats = x[torch.arange(2), eot] @ torch.tensor(sd["text_projection"])
        ref = feats.numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


# --------------------------------------------------------------------------
# MANIQA
# --------------------------------------------------------------------------

def _maniqa_timm_sd(rng):
    """Random weights in the official MANIQA checkpoint layout."""
    def n(*s):
        return rng.normal(0, 0.02, s).astype(np.float32)

    E, G2 = 768, 28 * 28
    sd = {
        "vit.patch_embed.proj.weight": n(E, 3, 8, 8),
        "vit.patch_embed.proj.bias": n(E),
        "vit.cls_token": n(1, 1, E),
        "vit.pos_embed": n(1, G2 + 1, E),
    }
    for i in range(12):
        tp = f"vit.blocks.{i}"
        sd[f"{tp}.norm1.weight"] = np.ones((E,), np.float32)
        sd[f"{tp}.norm1.bias"] = np.zeros((E,), np.float32)
        sd[f"{tp}.attn.qkv.weight"] = n(3 * E, E)
        sd[f"{tp}.attn.qkv.bias"] = n(3 * E)
        sd[f"{tp}.attn.proj.weight"] = n(E, E)
        sd[f"{tp}.attn.proj.bias"] = n(E)
        sd[f"{tp}.norm2.weight"] = np.ones((E,), np.float32)
        sd[f"{tp}.norm2.bias"] = np.zeros((E,), np.float32)
        sd[f"{tp}.mlp.fc1.weight"] = n(4 * E, E)
        sd[f"{tp}.mlp.fc1.bias"] = n(4 * E)
        sd[f"{tp}.mlp.fc2.weight"] = n(E, 4 * E)
        sd[f"{tp}.mlp.fc2.bias"] = n(E)
    dims = {1: (4 * E, E), 2: (E, E // 2)}
    for st, (cin, cout) in dims.items():
        for i in range(2):
            for ch in "qkv":
                sd[f"tablock{st}.{i}.c_{ch}.weight"] = n(G2, G2)
                sd[f"tablock{st}.{i}.c_{ch}.bias"] = n(G2)
        sd[f"conv{st}.weight"] = n(cout, cin, 1, 1)
        sd[f"conv{st}.bias"] = n(cout)
        for bi in range(2):
            tp = f"swintransformer{st}.layers.{bi}"
            sd[f"{tp}.norm1.weight"] = np.ones((cout,), np.float32)
            sd[f"{tp}.norm1.bias"] = np.zeros((cout,), np.float32)
            sd[f"{tp}.attn.qkv.weight"] = n(3 * cout, cout)
            sd[f"{tp}.attn.qkv.bias"] = n(3 * cout)
            sd[f"{tp}.attn.proj.weight"] = n(cout, cout)
            sd[f"{tp}.attn.proj.bias"] = n(cout)
            sd[f"{tp}.attn.relative_position_bias_table"] = n(49, 4)
            sd[f"{tp}.norm2.weight"] = np.ones((cout,), np.float32)
            sd[f"{tp}.norm2.bias"] = np.zeros((cout,), np.float32)
            sd[f"{tp}.mlp.fc1.weight"] = n(E, cout)
            sd[f"{tp}.mlp.fc1.bias"] = n(E)
            sd[f"{tp}.mlp.fc2.weight"] = n(cout, E)
            sd[f"{tp}.mlp.fc2.bias"] = n(cout)
    for br in ("fc_score", "fc_weight"):
        sd[f"{br}.0.weight"] = n(E // 2, E // 2)
        sd[f"{br}.0.bias"] = n(E // 2)
        sd[f"{br}.3.weight"] = n(1, E // 2)
        sd[f"{br}.3.bias"] = n(1)
    return sd


def _maniqa_vit_torch(sd, x):
    """Torch ViT-B/8 feature oracle (timm layout); x NHWC np in [0,1].
    Returns (B, 784, 3072) torch tensor (blocks 6-9 concatenated)."""
    E = 768
    h = (torch.tensor(x.transpose(0, 3, 1, 2)) - 0.5) / 0.5
    h = F.conv2d(h, torch.tensor(sd["vit.patch_embed.proj.weight"]),
                 torch.tensor(sd["vit.patch_embed.proj.bias"]), stride=8)
    h = h.flatten(2).transpose(1, 2)
    cls = torch.tensor(sd["vit.cls_token"]).expand(h.shape[0], -1, -1)
    h = torch.cat([cls, h], 1) + torch.tensor(sd["vit.pos_embed"])
    feats = []
    for i in range(12):
        tp = f"vit.blocks.{i}"
        y = F.layer_norm(h, (E,), torch.tensor(sd[f"{tp}.norm1.weight"]),
                         torch.tensor(sd[f"{tp}.norm1.bias"]), eps=1e-6)
        qkv = y @ torch.tensor(sd[f"{tp}.attn.qkv.weight"]).t() + torch.tensor(sd[f"{tp}.attn.qkv.bias"])
        q, k, v = qkv.chunk(3, -1)
        B, T = q.shape[:2]
        q = q.view(B, T, 12, 64).transpose(1, 2)
        k = k.view(B, T, 12, 64).transpose(1, 2)
        v = v.view(B, T, 12, 64).transpose(1, 2)
        a = ((q @ k.transpose(-2, -1)) / 8.0).softmax(-1)
        o = (a @ v).transpose(1, 2).reshape(B, T, E)
        h = h + (o @ torch.tensor(sd[f"{tp}.attn.proj.weight"]).t() + torch.tensor(sd[f"{tp}.attn.proj.bias"]))
        y = F.layer_norm(h, (E,), torch.tensor(sd[f"{tp}.norm2.weight"]),
                         torch.tensor(sd[f"{tp}.norm2.bias"]), eps=1e-6)
        y = F.gelu(y @ torch.tensor(sd[f"{tp}.mlp.fc1.weight"]).t() + torch.tensor(sd[f"{tp}.mlp.fc1.bias"]))
        h = h + (y @ torch.tensor(sd[f"{tp}.mlp.fc2.weight"]).t() + torch.tensor(sd[f"{tp}.mlp.fc2.bias"]))
        if i in (6, 7, 8, 9):
            feats.append(h[:, 1:])
    return torch.cat(feats, -1)


@pytest.mark.slow
def test_maniqa_vit_matches_torch_oracle():
    """Flax ViT-B/8 feature extraction vs a functional torch oracle in the
    timm layout (checks both arch and converter)."""
    from dit4sr_tpu.eval.maniqa import convert_maniqa_torch, vit_features

    rng = np.random.default_rng(0)
    sd = _maniqa_timm_sd(rng)
    params = {k: jnp.asarray(v) for k, v in convert_maniqa_torch(sd).items()}
    x = rng.uniform(size=(1, 224, 224, 3)).astype(np.float32)
    ours = np.asarray(vit_features(params, jnp.asarray(x)))

    with torch.no_grad():
        ref = _maniqa_vit_torch(sd, x).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def _maniqa_tablock_t(sd, tp, x):
    """Official TABlock: transposed attention over channels; x (B, C, N).
    Replicates the (attn@v).transpose(1,2).reshape(B,C,N) quirk."""
    B, C, N = x.shape
    q = x @ torch.tensor(sd[f"{tp}.c_q.weight"]).t() + torch.tensor(sd[f"{tp}.c_q.bias"])
    k = x @ torch.tensor(sd[f"{tp}.c_k.weight"]).t() + torch.tensor(sd[f"{tp}.c_k.bias"])
    v = x @ torch.tensor(sd[f"{tp}.c_v.weight"]).t() + torch.tensor(sd[f"{tp}.c_v.bias"])
    attn = ((q @ k.transpose(-2, -1)) * N ** -0.5).softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(B, C, N)
    return out + x


def _maniqa_swin_t(sd, tp, x, shift, heads=4, win=4):
    """MANIQA swin stage block: window attention with relative position
    bias, fixed scale 0.8, cyclic shift (periodic, no border mask),
    nn.LayerNorm default eps 1e-5. x (B, H, W, C)."""
    B, H, W, C = x.shape
    hd = C // heads
    res = x
    y = F.layer_norm(x, (C,), torch.tensor(sd[f"{tp}.norm1.weight"]),
                     torch.tensor(sd[f"{tp}.norm1.bias"]), eps=1e-5)
    if shift:
        y = torch.roll(y, (-shift, -shift), dims=(1, 2))
    y = y.view(B, H // win, win, W // win, win, C).permute(0, 1, 3, 2, 4, 5)
    y = y.reshape(-1, win * win, C)
    qkv = y @ torch.tensor(sd[f"{tp}.attn.qkv.weight"]).t() + torch.tensor(sd[f"{tp}.attn.qkv.bias"])
    q, k, v = qkv.chunk(3, -1)
    nw = y.shape[0]
    q = q.view(nw, win * win, heads, hd).transpose(1, 2)
    k = k.view(nw, win * win, heads, hd).transpose(1, 2)
    v = v.view(nw, win * win, heads, hd).transpose(1, 2)
    coords = np.stack(np.meshgrid(np.arange(win), np.arange(win), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0) + (win - 1)
    idx = rel[..., 0] * (2 * win - 1) + rel[..., 1]
    table = torch.tensor(sd[f"{tp}.attn.relative_position_bias_table"])
    bias = table[torch.tensor(idx.reshape(-1))].view(win * win, win * win, heads)
    attn = (q @ k.transpose(-2, -1) * 0.8 + bias.permute(2, 0, 1)[None]).softmax(-1)
    o = (attn @ v).transpose(1, 2).reshape(nw, win * win, C)
    o = o @ torch.tensor(sd[f"{tp}.attn.proj.weight"]).t() + torch.tensor(sd[f"{tp}.attn.proj.bias"])
    o = o.view(B, H // win, W // win, win, win, C).permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
    if shift:
        o = torch.roll(o, (shift, shift), dims=(1, 2))
    x = res + o
    y = F.layer_norm(x, (C,), torch.tensor(sd[f"{tp}.norm2.weight"]),
                     torch.tensor(sd[f"{tp}.norm2.bias"]), eps=1e-5)
    y = F.gelu(y @ torch.tensor(sd[f"{tp}.mlp.fc1.weight"]).t() + torch.tensor(sd[f"{tp}.mlp.fc1.bias"]))
    return x + (y @ torch.tensor(sd[f"{tp}.mlp.fc2.weight"]).t() + torch.tensor(sd[f"{tp}.mlp.fc2.bias"]))


@pytest.mark.slow
def test_maniqa_full_matches_torch_oracle():
    """FULL MANIQA score path (ViT -> TAB -> conv -> swin -> TAB -> conv ->
    swin -> dual-branch head) vs a functional torch oracle in the official
    checkpoint layout — extends the ViT-only oracle to the score head."""
    from dit4sr_tpu.eval.maniqa import convert_maniqa_torch, maniqa_score

    rng = np.random.default_rng(5)
    sd = _maniqa_timm_sd(rng)
    params = {k: jnp.asarray(v) for k, v in convert_maniqa_torch(sd).items()}
    x = rng.uniform(size=(2, 224, 224, 3)).astype(np.float32)
    ours = np.asarray(maniqa_score(params, jnp.asarray(x)))

    g = 28
    with torch.no_grad():
        h = _maniqa_vit_torch(sd, x)                        # (B, 784, 3072)
        B = h.shape[0]
        h = h.transpose(1, 2)                               # (B, C, N)
        for i in range(2):
            h = _maniqa_tablock_t(sd, f"tablock1.{i}", h)
        hh = F.conv2d(h.view(B, -1, g, g), torch.tensor(sd["conv1.weight"]),
                      torch.tensor(sd["conv1.bias"]))
        y = hh.permute(0, 2, 3, 1)                          # (B, g, g, 768)
        for bi in range(2):
            y = _maniqa_swin_t(sd, f"swintransformer1.layers.{bi}", y,
                               shift=2 * (bi % 2))
        h = y.reshape(B, g * g, -1).transpose(1, 2)
        for i in range(2):
            h = _maniqa_tablock_t(sd, f"tablock2.{i}", h)
        hh = F.conv2d(h.view(B, -1, g, g), torch.tensor(sd["conv2.weight"]),
                      torch.tensor(sd["conv2.bias"]))
        y = hh.permute(0, 2, 3, 1)
        for bi in range(2):
            y = _maniqa_swin_t(sd, f"swintransformer2.layers.{bi}", y,
                               shift=2 * (bi % 2))
        feat = y.reshape(B, g * g, -1)
        s = F.relu(feat @ torch.tensor(sd["fc_score.0.weight"]).t() + torch.tensor(sd["fc_score.0.bias"]))
        s = F.relu(s @ torch.tensor(sd["fc_score.3.weight"]).t() + torch.tensor(sd["fc_score.3.bias"]))
        w = F.relu(feat @ torch.tensor(sd["fc_weight.0.weight"]).t() + torch.tensor(sd["fc_weight.0.bias"]))
        w = torch.sigmoid(w @ torch.tensor(sd["fc_weight.3.weight"]).t() + torch.tensor(sd["fc_weight.3.bias"]))
        ref = ((s * w).sum(dim=(1, 2)) / w.sum(dim=(1, 2)).clamp_min(1e-8)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_maniqa_score_runs():
    from dit4sr_tpu.eval.maniqa import maniqa_score, random_maniqa_params

    rng = np.random.default_rng(1)
    params = {k: jnp.asarray(v) for k, v in random_maniqa_params(rng).items()}
    x = jnp.asarray(rng.uniform(size=(2, 224, 224, 3)).astype(np.float32))
    s = np.asarray(maniqa_score(params, x))
    assert s.shape == (2,) and np.all(np.isfinite(s)) and np.all(s >= 0)


# --------------------------------------------------------------------------
# MUSIQ
# --------------------------------------------------------------------------

def test_musiq_mask_invariance():
    """Padded patch slots must not influence the score."""
    from dit4sr_tpu.eval.musiq import musiq_score, prepare_inputs, random_musiq_params

    rng = np.random.default_rng(0)
    params = {k: jnp.asarray(v) for k, v in random_musiq_params(rng).items()}
    img = rng.uniform(size=(1, 96, 96, 3)).astype(np.float32)
    inp = prepare_inputs(img, budgets=(16, 16, 16))  # 96->9 patches/scale: padding
    assert inp["mask"].sum() < inp["mask"].size
    s1 = float(musiq_score(params, {k: jnp.asarray(v) for k, v in inp.items()})[0])
    mutated = dict(inp)
    pad = inp["mask"][0] == 0
    mutated["patches"] = inp["patches"].copy()
    mutated["patches"][0, pad] = 0.777
    s2 = float(musiq_score(params, {k: jnp.asarray(v) for k, v in mutated.items()})[0])
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)
    assert np.isfinite(s1)


def test_musiq_multiscale_shapes():
    from dit4sr_tpu.eval.musiq import prepare_inputs

    rng = np.random.default_rng(2)
    img = rng.uniform(size=(2, 160, 128, 3)).astype(np.float32)
    inp = prepare_inputs(img, budgets=(32, 24, 12))
    assert inp["patches"].shape == (2, 68, 32, 32, 3)
    assert inp["scale_idx"].max() == 2
    # native 160x128 -> 5x4=20 patches valid in scale 0
    assert inp["mask"][0, :32].sum() == 20


def _musiq_torch_sd(rng):
    """Random weights in the torch-port layout convert_musiq_torch expects."""
    def n(*s):
        return rng.normal(0, 0.05, s).astype(np.float32)

    def g(c):  # non-trivial norm affines to catch scale/bias mix-ups
        return rng.uniform(0.5, 1.5, c).astype(np.float32)

    sd = {
        "conv_root.weight": n(64, 3, 7, 7),
        "gn_root.weight": g(64), "gn_root.bias": n(64),
        "block1.preact_gn.weight": g(64), "block1.preact_gn.bias": n(64),
        "block1.proj_conv.weight": n(256, 64, 1, 1),
        "block1.conv1.weight": n(64, 64, 1, 1),
        "block1.gn1.weight": g(64), "block1.gn1.bias": n(64),
        "block1.conv2.weight": n(64, 64, 3, 3),
        "block1.gn2.weight": g(64), "block1.gn2.bias": n(64),
        "block1.conv3.weight": n(256, 64, 1, 1),
        "embedding.weight": n(384, 4096), "embedding.bias": n(384),
        "cls_token": n(1, 1, 384),
        "spatial_embedding": n(100, 384),
        "scale_embedding": n(3, 384),
        "encoder_norm.weight": g(384), "encoder_norm.bias": n(384),
        "head.weight": n(1, 384), "head.bias": n(1),
    }
    for i in range(14):
        tp = f"transformer.layers.{i}"
        sd[f"{tp}.norm1.weight"] = g(384)
        sd[f"{tp}.norm1.bias"] = n(384)
        sd[f"{tp}.attn.qkv.weight"] = n(3 * 384, 384)
        sd[f"{tp}.attn.qkv.bias"] = n(3 * 384)
        sd[f"{tp}.attn.proj.weight"] = n(384, 384)
        sd[f"{tp}.attn.proj.bias"] = n(384)
        sd[f"{tp}.norm2.weight"] = g(384)
        sd[f"{tp}.norm2.bias"] = n(384)
        sd[f"{tp}.mlp.fc1.weight"] = n(1152, 384)
        sd[f"{tp}.mlp.fc1.bias"] = n(1152)
        sd[f"{tp}.mlp.fc2.weight"] = n(384, 1152)
        sd[f"{tp}.mlp.fc2.bias"] = n(384)
    return sd


def _musiq_torch(sd, inp):
    """Functional torch MUSIQ oracle over prepare_inputs outputs: BiT patch
    encoder (weight-standardized convs, GN eps 1e-5, 3x3/2 maxpool,
    pre-activation bottleneck), hash-grid spatial + scale embeddings, CLS +
    masked 14-layer pre-LN transformer (LN eps 1e-6), linear head."""
    def t(k):
        return torch.tensor(sd[k])

    def ws(w):
        m = w.mean(dim=(1, 2, 3), keepdim=True)
        v = w.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
        return (w - m) / torch.sqrt(v + 1e-10)

    def gn(x, p):
        return F.group_norm(x, 32, t(f"{p}.weight"), t(f"{p}.bias"), eps=1e-5)

    patches = torch.tensor(inp["patches"]) * 2.0 - 1.0      # (B, T, 32, 32, 3)
    B, T = patches.shape[:2]
    x = patches.reshape(B * T, 32, 32, 3).permute(0, 3, 1, 2)
    h = F.conv2d(x, ws(t("conv_root.weight")), stride=2, padding=3)
    h = F.relu(gn(h, "gn_root"))
    h = F.max_pool2d(h, 3, 2, 1)
    y = F.relu(gn(h, "block1.preact_gn"))
    sc = F.conv2d(y, ws(t("block1.proj_conv.weight")), stride=2)
    y = F.conv2d(y, ws(t("block1.conv1.weight")))
    y = F.relu(gn(y, "block1.gn1"))
    y = F.conv2d(y, ws(t("block1.conv2.weight")), stride=2, padding=1)
    y = F.relu(gn(y, "block1.gn2"))
    y = F.conv2d(y, ws(t("block1.conv3.weight")))
    h = sc + y                                              # (BT, 256, 4, 4)
    flat = h.permute(0, 2, 3, 1).reshape(B * T, -1)         # (h, w, c) order
    emb = (flat @ t("embedding.weight").t() + t("embedding.bias")).view(B, T, 384)

    gi = np.clip(np.round(inp["coords"][..., 0] * 9), 0, 9)
    gj = np.clip(np.round(inp["coords"][..., 1] * 9), 0, 9)
    hse = t("spatial_embedding")[torch.tensor((gi * 10 + gj).astype(np.int64))]
    sce = t("scale_embedding")[torch.tensor(inp["scale_idx"].astype(np.int64))]
    x = emb + hse + sce
    cls = t("cls_token").view(1, 1, 384).expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1)
    mask = torch.cat([torch.ones(B, 1), torch.tensor(inp["mask"])], dim=1)
    bias = (1.0 - mask)[:, None, None, :] * -1e9
    for i in range(14):
        tp = f"transformer.layers.{i}"
        y = F.layer_norm(x, (384,), t(f"{tp}.norm1.weight"), t(f"{tp}.norm1.bias"), eps=1e-6)
        qkv = y @ t(f"{tp}.attn.qkv.weight").t() + t(f"{tp}.attn.qkv.bias")
        q, k, v = qkv.chunk(3, -1)
        S = q.shape[1]
        q = q.view(B, S, 6, 64).transpose(1, 2)
        k = k.view(B, S, 6, 64).transpose(1, 2)
        v = v.view(B, S, 6, 64).transpose(1, 2)
        a = ((q @ k.transpose(-2, -1)) / 8.0 + bias).softmax(-1)
        o = (a @ v).transpose(1, 2).reshape(B, S, 384)
        x = x + (o @ t(f"{tp}.attn.proj.weight").t() + t(f"{tp}.attn.proj.bias"))
        y = F.layer_norm(x, (384,), t(f"{tp}.norm2.weight"), t(f"{tp}.norm2.bias"), eps=1e-6)
        y = F.gelu(y @ t(f"{tp}.mlp.fc1.weight").t() + t(f"{tp}.mlp.fc1.bias"))
        x = x + (y @ t(f"{tp}.mlp.fc2.weight").t() + t(f"{tp}.mlp.fc2.bias"))
    x = F.layer_norm(x, (384,), t("encoder_norm.weight"), t("encoder_norm.bias"), eps=1e-6)
    return (x[:, 0] @ t("head.weight").t() + t("head.bias"))[:, 0]


@pytest.mark.slow
def test_musiq_matches_torch_oracle():
    """FULL MUSIQ (patch encoder + embeddings + masked transformer + head)
    vs a functional torch oracle in the converter's expected layout —
    checks arch AND converter end to end, including padded-slot masking."""
    from dit4sr_tpu.eval.musiq import (
        convert_musiq_torch, musiq_score, prepare_inputs,
    )

    rng = np.random.default_rng(7)
    sd = _musiq_torch_sd(rng)
    params = {k: jnp.asarray(v) for k, v in convert_musiq_torch(sd).items()}
    img = rng.uniform(size=(2, 96, 128, 3)).astype(np.float32)
    inp = prepare_inputs(img, budgets=(16, 16, 8))  # scale0: 12 of 16 valid
    assert 0 < inp["mask"].sum() < inp["mask"].size  # real + padded slots
    ours = np.asarray(musiq_score(params, {k: jnp.asarray(v) for k, v in inp.items()}))
    with torch.no_grad():
        ref = _musiq_torch(sd, inp).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_musiq_converter_chw_embed_order():
    """embed_order='chw' must permute the embedding input axis so a port
    that flattens NCHW directly still scores identically."""
    from dit4sr_tpu.eval.musiq import convert_musiq_torch

    rng = np.random.default_rng(8)
    sd = _musiq_torch_sd(rng)
    ref = convert_musiq_torch(sd)["embed_w"]                 # (4096, 384)
    sd_chw = dict(sd)
    w = sd["embedding.weight"].reshape(384, 4, 4, 256)       # (out, h, w, c)
    sd_chw["embedding.weight"] = np.ascontiguousarray(
        w.transpose(0, 3, 1, 2).reshape(384, 4096))          # (out, c, h, w)
    got = convert_musiq_torch(sd_chw, embed_order="chw")["embed_w"]
    np.testing.assert_array_equal(got, ref)


# --------------------------------------------------------------------------
# MetricBank activation
# --------------------------------------------------------------------------

def test_metric_bank_all_learned_metrics_activate(tmp_path):
    from dit4sr_tpu.eval.clipiqa import random_clipiqa_params
    from dit4sr_tpu.eval.dists import random_dists_params
    from dit4sr_tpu.eval.lpips import random_lpips_params
    from dit4sr_tpu.eval.maniqa import random_maniqa_params
    from dit4sr_tpu.eval.metrics import MetricBank
    from dit4sr_tpu.eval.musiq import random_musiq_params
    from dit4sr_tpu.eval.niqe import niqe_available

    rng = np.random.default_rng(0)
    np.savez(tmp_path / "lpips_alex.npz", **random_lpips_params(rng))
    np.savez(tmp_path / "dists.npz", **random_dists_params(rng))
    np.savez(tmp_path / "clipiqa.npz", **random_clipiqa_params(rng))
    np.savez(tmp_path / "maniqa.npz", **random_maniqa_params(rng))
    np.savez(tmp_path / "musiq.npz", **random_musiq_params(rng))

    bank = MetricBank(weights_dir=str(tmp_path))
    expected_missing = [] if niqe_available() else ["niqe"]
    assert bank.unavailable == expected_missing

    pred = jnp.asarray(rng.uniform(size=(1, 96, 96, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(size=(1, 96, 96, 3)).astype(np.float32))
    out = bank.compute(pred, gt)
    for name in ("psnr", "ssim", "lpips", "dists", "clipiqa", "maniqa", "musiq"):
        assert name in out, f"{name} missing from bank output"
        assert np.all(np.isfinite(out[name]))
