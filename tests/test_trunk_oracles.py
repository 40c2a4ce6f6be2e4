"""Independent numeric oracles for the timm-trunk families (VERDICT r3
weak #3 / next #3).

timm itself is not installed in this container, so each family gets a
hand-written torch forward implementing the PUBLISHED architecture
(timm `eva.py`, `vitamin.py`, `swin_transformer.py`,
`vision_transformer_relpos.py` — the trunks the reference reaches via
`timm.create_model`, `src/open_clip/timm_model.py:62-90`), consuming a
synthetic timm-layout state dict directly.  The same state dict is
ingested by `timm_*_to_params` and run through the native JAX tower;
outputs must agree.  This catches transposed weights, wrong LN
placement, rope/bias-table construction errors — anything the
shape/ingestion tests cannot see.  (Same approach as the numpy
reparameterization oracle in tests/test_mci.py.)

The oracles use torch ops in the timm forward ORDER, not the JAX
implementation's vectorised form: python loops over blocks, conv2d in
NCHW, explicit window partition slicing, meshgrid-based rope/relpos
tables — independently re-derived from the published sources.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

torch.manual_seed(0)


def _t(*shape, scale=0.05):
    return torch.randn(*shape, dtype=torch.float64).float() * scale


def _ln(x, w, b, eps):
    return F.layer_norm(x, (x.shape[-1],), w, b, eps)


# ===========================================================================
# EVA (timm eva.py: EVA01 fused-qkv, EVA02 rope+SwiGLU+sub-LN, post-norm)
# ===========================================================================

def _eva_sd(spec):
    """Synthetic state dict in the timm Eva key layout."""
    D, L, Hn, p = spec.width, spec.layers, spec.mlp_hidden, spec.patch_size
    n_tok = spec.grid_size ** 2 + 1
    sd = {
        "visual.trunk.patch_embed.proj.weight": _t(D, 3, p, p),
        "visual.trunk.patch_embed.proj.bias": _t(D),
        "visual.trunk.cls_token": _t(1, 1, D),
        "visual.trunk.pos_embed": _t(1, n_tok, D),
        "visual.trunk.norm.weight": 1 + _t(D),
        "visual.trunk.norm.bias": _t(D),
        "visual.trunk.head.weight": _t(spec.output_dim, D),
        "visual.trunk.head.bias": _t(spec.output_dim),
    }
    for i in range(L):
        b = f"visual.trunk.blocks.{i}."
        if spec.fused_qkv:
            sd[b + "attn.qkv.weight"] = _t(3 * D, D)
            sd[b + "attn.q_bias"] = _t(D)
            sd[b + "attn.v_bias"] = _t(D)
        else:
            sd[b + "attn.q_proj.weight"] = _t(D, D)
            sd[b + "attn.q_proj.bias"] = _t(D)
            sd[b + "attn.k_proj.weight"] = _t(D, D)
            sd[b + "attn.v_proj.weight"] = _t(D, D)
            sd[b + "attn.v_proj.bias"] = _t(D)
        sd[b + "attn.proj.weight"] = _t(D, D)
        sd[b + "attn.proj.bias"] = _t(D)
        if spec.inner_attn_ln:
            sd[b + "attn.norm.weight"] = 1 + _t(D)
            sd[b + "attn.norm.bias"] = _t(D)
        if spec.swiglu:
            sd[b + "mlp.fc1_g.weight"] = _t(Hn, D)
            sd[b + "mlp.fc1_g.bias"] = _t(Hn)
            sd[b + "mlp.fc1_x.weight"] = _t(Hn, D)
            sd[b + "mlp.fc1_x.bias"] = _t(Hn)
        else:
            sd[b + "mlp.fc1.weight"] = _t(Hn, D)
            sd[b + "mlp.fc1.bias"] = _t(Hn)
        if spec.mlp_ln:
            sd[b + "mlp.norm.weight"] = 1 + _t(Hn)
            sd[b + "mlp.norm.bias"] = _t(Hn)
        sd[b + "mlp.fc2.weight"] = _t(D, Hn)
        sd[b + "mlp.fc2.bias"] = _t(D)
        sd[b + "norm1.weight"] = 1 + _t(D)
        sd[b + "norm1.bias"] = _t(D)
        sd[b + "norm2.weight"] = 1 + _t(D)
        sd[b + "norm2.bias"] = _t(D)
    return sd


def _eva_rope(spec):
    """timm build_rotary_pos_embed(in_pixels=False, ref_feat_shape):
    per-axis t = arange(g)/g*ref, meshgrid 'ij', grid*bands, flatten to
    [N, 2*nb], repeat_interleave(2), emb = cat([sin, cos], -1)."""
    g, hd = spec.grid_size, spec.width // spec.heads
    nb = hd // 4
    bands = 1.0 / (10000.0 ** (torch.arange(nb, dtype=torch.float64) / nb))
    t = torch.arange(g, dtype=torch.float64) / g * spec.ref_feat_size
    grid = torch.stack(torch.meshgrid(t, t, indexing="ij"), dim=-1)
    pos = grid.unsqueeze(-1) * bands                     # [g, g, 2, nb]
    pos = pos.reshape(g * g, -1)                         # [N, 2*nb]
    sin = pos.sin().repeat_interleave(2, -1).float()     # [N, hd]
    cos = pos.cos().repeat_interleave(2, -1).float()
    return torch.cat([sin, cos], dim=-1)                 # [N, 2*hd]


def _rot(x):
    # timm rot(): stack([-x[..., 1::2], x[..., ::2]], -1).reshape
    return torch.stack([-x[..., 1::2], x[..., ::2]], dim=-1).reshape(x.shape)


def _apply_rot_cat(x, emb):
    sin_emb, cos_emb = emb.tensor_split(2, -1)
    return x * cos_emb + _rot(x) * sin_emb


def eva_oracle(sd, spec, images_nchw):
    """timm eva.py forward, re-derived from the published source."""
    g = lambda k: sd["visual.trunk." + k]
    eps = spec.ln_eps
    x = F.conv2d(images_nchw, g("patch_embed.proj.weight"),
                 g("patch_embed.proj.bias"), stride=spec.patch_size)
    B, D, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)                     # [B, N, D]
    x = torch.cat([g("cls_token").expand(B, -1, -1), x], dim=1)
    x = x + g("pos_embed")
    rope = _eva_rope(spec) if spec.rope else None
    H = spec.heads
    hd = D // H

    for i in range(spec.layers):
        b = f"blocks.{i}."

        def attn(y):
            if spec.fused_qkv:
                qkv_bias = torch.cat([g(b + "attn.q_bias"),
                                      torch.zeros(D),
                                      g(b + "attn.v_bias")])
                qkv = F.linear(y, g(b + "attn.qkv.weight"), qkv_bias)
                q, k, v = qkv.chunk(3, dim=-1)
            else:
                q = F.linear(y, g(b + "attn.q_proj.weight"),
                             g(b + "attn.q_proj.bias"))
                k = F.linear(y, g(b + "attn.k_proj.weight"))
                v = F.linear(y, g(b + "attn.v_proj.weight"),
                             g(b + "attn.v_proj.bias"))
            q = q.reshape(B, -1, H, hd).transpose(1, 2)
            k = k.reshape(B, -1, H, hd).transpose(1, 2)
            v = v.reshape(B, -1, H, hd).transpose(1, 2)
            if rope is not None:
                q = torch.cat(
                    [q[:, :, :1], _apply_rot_cat(q[:, :, 1:], rope)], dim=2)
                k = torch.cat(
                    [k[:, :, :1], _apply_rot_cat(k[:, :, 1:], rope)], dim=2)
            a = (q @ k.transpose(-2, -1)) * hd ** -0.5
            a = a.softmax(dim=-1)
            o = (a @ v).transpose(1, 2).reshape(B, -1, D)
            if spec.inner_attn_ln:
                o = _ln(o, g(b + "attn.norm.weight"),
                        g(b + "attn.norm.bias"), eps)
            return F.linear(o, g(b + "attn.proj.weight"),
                            g(b + "attn.proj.bias"))

        def mlp(y):
            if spec.swiglu:
                h = F.silu(F.linear(y, g(b + "mlp.fc1_g.weight"),
                                    g(b + "mlp.fc1_g.bias"))) \
                    * F.linear(y, g(b + "mlp.fc1_x.weight"),
                               g(b + "mlp.fc1_x.bias"))
            else:
                h = F.gelu(F.linear(y, g(b + "mlp.fc1.weight"),
                                    g(b + "mlp.fc1.bias")))
            if spec.mlp_ln:
                h = _ln(h, g(b + "mlp.norm.weight"),
                        g(b + "mlp.norm.bias"), eps)
            return F.linear(h, g(b + "mlp.fc2.weight"), g(b + "mlp.fc2.bias"))

        n1w, n1b = g(b + "norm1.weight"), g(b + "norm1.bias")
        n2w, n2b = g(b + "norm2.weight"), g(b + "norm2.bias")
        if spec.post_norm:
            x = x + _ln(attn(x), n1w, n1b, eps)
            x = x + _ln(mlp(x), n2w, n2b, eps)
        else:
            x = x + attn(_ln(x, n1w, n1b, eps))
            x = x + mlp(_ln(x, n2w, n2b, eps))

    x = _ln(x, g("norm.weight"), g("norm.bias"), eps)
    return F.linear(x[:, 0], g("head.weight"), g("head.bias"))


@pytest.mark.parametrize("variant", ["eva02", "eva01", "postnorm"])
def test_eva_matches_torch_oracle(variant):
    from leaf_tpu.models.eva import (
        EvaVisionSpec,
        encode_image_eva,
        timm_eva_to_params,
    )

    kw = dict(name=f"tiny-{variant}", image_size=32, patch_size=8,
              width=32, layers=2, heads=4, output_dim=16,
              ref_feat_size=8, ln_eps=1e-6)
    if variant == "eva02":
        kw.update(mlp_hidden=20, swiglu=True, rope=True,
                  inner_attn_ln=True, mlp_ln=True, fused_qkv=False)
    elif variant == "eva01":
        kw.update(mlp_hidden=64)
    else:
        kw.update(mlp_hidden=64, post_norm=True)
    spec = EvaVisionSpec(**kw)

    sd = _eva_sd(spec)
    imgs = np.random.default_rng(1).standard_normal(
        (2, 32, 32, 3)).astype(np.float32)
    want = eva_oracle(sd, spec, torch.from_numpy(
        imgs.transpose(0, 3, 1, 2))).detach().numpy()

    params = timm_eva_to_params(sd, spec)
    got = np.asarray(encode_image_eva(params, spec, imgs))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


# ===========================================================================
# ViTamin (timm vitamin.py: Stem, MbConvLNBlock, StridedConv pool,
# ViT stage with GeGluMlp, avg pool + fc_norm + open_clip linear head)
# ===========================================================================

def _vitamin_sd(spec):
    d0, d1, d2 = spec.dims
    be = "visual.trunk.patch_embed.backbone."
    sd = {
        be + "stem.conv1.weight": _t(d0, 3, 3, 3),
        be + "stem.conv1.bias": _t(d0),
        be + "stem.norm1.weight": 1 + _t(d0),
        be + "stem.norm1.bias": _t(d0),
        be + "stem.conv2.weight": _t(d0, d0, 3, 3),
        be + "stem.conv2.bias": _t(d0),
        be + "pool.norm.weight": 1 + _t(d1),
        be + "pool.norm.bias": _t(d1),
        be + "pool.proj.weight": _t(d2, d1, 3, 3),
        be + "pool.proj.bias": _t(d2),
        "visual.trunk.fc_norm.weight": 1 + _t(d2),
        "visual.trunk.fc_norm.bias": _t(d2),
        "visual.head.proj.weight": _t(spec.output_dim, d2),
    }
    for si, (cin, cout) in enumerate([(d0, d0), (d0, d1)]):
        for bi in range(spec.depths[si]):
            b = f"{be}stages.{si}.blocks.{bi}."
            ci = cin if bi == 0 else cout
            mid = cout * spec.expand_ratio
            sd.update({
                b + "pre_norm.weight": 1 + _t(ci),
                b + "pre_norm.bias": _t(ci),
                b + "conv1_1x1.weight": _t(mid, ci, 1, 1),
                b + "conv1_1x1.bias": _t(mid),
                b + "conv2_kxk.weight": _t(mid, 1, 3, 3),
                b + "conv2_kxk.bias": _t(mid),
                b + "conv3_1x1.weight": _t(cout, mid, 1, 1),
                b + "conv3_1x1.bias": _t(cout),
            })
            if bi == 0 and ci != cout:
                # Downsample2d.expand exists only on channel change
                sd[b + "shortcut.expand.weight"] = _t(cout, ci, 1, 1)
                sd[b + "shortcut.expand.bias"] = _t(cout)
    for i in range(spec.vit_depth):
        b = f"visual.trunk.blocks.{i}."
        sd.update({
            b + "norm1.weight": 1 + _t(d2), b + "norm1.bias": _t(d2),
            b + "attn.qkv.weight": _t(3 * d2, d2),
            b + "attn.qkv.bias": _t(3 * d2),
            b + "attn.proj.weight": _t(d2, d2),
            b + "attn.proj.bias": _t(d2),
            b + "norm2.weight": 1 + _t(d2), b + "norm2.bias": _t(d2),
            b + "mlp.norm.weight": 1 + _t(d2), b + "mlp.norm.bias": _t(d2),
            b + "mlp.w0.weight": _t(2 * d2, d2), b + "mlp.w0.bias": _t(2 * d2),
            b + "mlp.w1.weight": _t(2 * d2, d2), b + "mlp.w1.bias": _t(2 * d2),
            b + "mlp.w2.weight": _t(d2, 2 * d2), b + "mlp.w2.bias": _t(d2),
        })
    return sd


def _ln2d(x, w, b, eps=1e-6):
    # timm LayerNorm2d: LN over C of an NCHW tensor
    return _ln(x.permute(0, 2, 3, 1), w, b, eps).permute(0, 3, 1, 2)


def vitamin_oracle(sd, spec, images_nchw):
    g = lambda k: sd["visual.trunk." + k]
    be = "patch_embed.backbone."
    x = F.conv2d(images_nchw, g(be + "stem.conv1.weight"),
                 g(be + "stem.conv1.bias"), stride=2, padding=1)
    x = F.gelu(_ln2d(x, g(be + "stem.norm1.weight"),
                     g(be + "stem.norm1.bias")))
    x = F.conv2d(x, g(be + "stem.conv2.weight"), g(be + "stem.conv2.bias"),
                 padding=1)

    d0, d1, d2 = spec.dims
    for si, (cin, cout) in enumerate([(d0, d0), (d0, d1)]):
        for bi in range(spec.depths[si]):
            b = f"{be}stages.{si}.blocks.{bi}."
            stride = 2 if bi == 0 else 1
            if stride == 2:
                sc = F.avg_pool2d(x, 2, 2, ceil_mode=True,
                                  count_include_pad=False)
                if b + "shortcut.expand.weight" in {
                        k.replace("visual.trunk.", "") for k in sd}:
                    sc = F.conv2d(sc, g(b + "shortcut.expand.weight"),
                                  g(b + "shortcut.expand.bias"))
            else:
                sc = x
            h = _ln2d(x, g(b + "pre_norm.weight"), g(b + "pre_norm.bias"))
            h = F.conv2d(h, g(b + "conv1_1x1.weight"),
                         g(b + "conv1_1x1.bias"))
            h = F.gelu(h)
            mid = h.shape[1]
            h = F.conv2d(h, g(b + "conv2_kxk.weight"),
                         g(b + "conv2_kxk.bias"), stride=stride, padding=1,
                         groups=mid)
            h = F.gelu(h)
            h = F.conv2d(h, g(b + "conv3_1x1.weight"),
                         g(b + "conv3_1x1.bias"))
            x = sc + h

    x = _ln2d(x, g(be + "pool.norm.weight"), g(be + "pool.norm.bias"))
    x = F.conv2d(x, g(be + "pool.proj.weight"), g(be + "pool.proj.bias"),
                 stride=2, padding=1)
    B, D, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)                 # [B, N, D]
    H = spec.heads
    hd = D // H
    for i in range(spec.vit_depth):
        b = f"blocks.{i}."
        y = _ln(x, g(b + "norm1.weight"), g(b + "norm1.bias"), 1e-6)
        qkv = F.linear(y, g(b + "attn.qkv.weight"), g(b + "attn.qkv.bias"))
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.reshape(B, -1, H, hd).transpose(1, 2)
        k = k.reshape(B, -1, H, hd).transpose(1, 2)
        v = v.reshape(B, -1, H, hd).transpose(1, 2)
        a = ((q @ k.transpose(-2, -1)) * hd ** -0.5).softmax(dim=-1)
        o = (a @ v).transpose(1, 2).reshape(B, -1, D)
        x = x + F.linear(o, g(b + "attn.proj.weight"), g(b + "attn.proj.bias"))
        y = _ln(x, g(b + "norm2.weight"), g(b + "norm2.bias"), 1e-6)
        # GeGluMlp: input norm, gelu(w0)·w1, w2
        y = _ln(y, g(b + "mlp.norm.weight"), g(b + "mlp.norm.bias"), 1e-6)
        h = F.gelu(F.linear(y, g(b + "mlp.w0.weight"), g(b + "mlp.w0.bias"))) \
            * F.linear(y, g(b + "mlp.w1.weight"), g(b + "mlp.w1.bias"))
        x = x + F.linear(h, g(b + "mlp.w2.weight"), g(b + "mlp.w2.bias"))

    pooled = x.mean(dim=1)                           # global_pool='avg'
    pooled = _ln(pooled, g("fc_norm.weight"), g("fc_norm.bias"), 1e-6)
    return F.linear(pooled, sd["visual.head.proj.weight"])


def test_vitamin_matches_torch_oracle():
    from leaf_tpu.models.vitamin import (
        ViTaminVisionSpec,
        encode_image_vitamin,
        timm_vitamin_to_params,
    )

    spec = ViTaminVisionSpec(name="tiny", image_size=32, dims=(8, 16, 32),
                             depths=(1, 2), vit_depth=2, heads=2,
                             output_dim=24)
    sd = _vitamin_sd(spec)
    imgs = np.random.default_rng(2).standard_normal(
        (2, 32, 32, 3)).astype(np.float32)
    want = vitamin_oracle(sd, spec, torch.from_numpy(
        imgs.transpose(0, 3, 1, 2))).detach().numpy()

    params = timm_vitamin_to_params(sd, spec)
    got = np.asarray(encode_image_vitamin(params, spec, imgs))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


# ===========================================================================
# Swin (published Swin Transformer: shifted 7x7 window attention with
# relative-position bias table, PatchMerging, avg pool + linear head)
# ===========================================================================

def _swin_sd(spec):
    p = spec.patch_size
    D = spec.embed_dim
    sd = {
        "visual.trunk.patch_embed.proj.weight": _t(D, 3, p, p),
        "visual.trunk.patch_embed.proj.bias": _t(D),
        "visual.trunk.patch_embed.norm.weight": 1 + _t(D),
        "visual.trunk.patch_embed.norm.bias": _t(D),
    }
    for s in range(len(spec.depths)):
        C = spec.stage_dim(s)
        Hn = int(C * spec.mlp_ratio)
        w = spec.stage_window(s)
        pre = f"visual.trunk.layers.{s}."
        if s > 0:
            Cin = spec.stage_dim(s - 1)
            sd[pre + "downsample.norm.weight"] = 1 + _t(4 * Cin)
            sd[pre + "downsample.norm.bias"] = _t(4 * Cin)
            sd[pre + "downsample.reduction.weight"] = _t(2 * Cin, 4 * Cin)
        for i in range(spec.depths[s]):
            b = pre + f"blocks.{i}."
            sd.update({
                b + "norm1.weight": 1 + _t(C), b + "norm1.bias": _t(C),
                b + "attn.qkv.weight": _t(3 * C, C),
                b + "attn.qkv.bias": _t(3 * C),
                b + "attn.proj.weight": _t(C, C),
                b + "attn.proj.bias": _t(C),
                b + "attn.relative_position_bias_table":
                    _t((2 * w - 1) ** 2, spec.heads[s]),
                b + "norm2.weight": 1 + _t(C), b + "norm2.bias": _t(C),
                b + "mlp.fc1.weight": _t(Hn, C), b + "mlp.fc1.bias": _t(Hn),
                b + "mlp.fc2.weight": _t(C, Hn), b + "mlp.fc2.bias": _t(C),
            })
    Cl = spec.stage_dim(len(spec.depths) - 1)
    sd["visual.trunk.norm.weight"] = 1 + _t(Cl)
    sd["visual.trunk.norm.bias"] = _t(Cl)
    sd["visual.head.proj.weight"] = _t(spec.output_dim, Cl)
    return sd


def _swin_rel_index(w):
    """Published Swin construction (gen_relative_position_index)."""
    coords = torch.stack(torch.meshgrid(
        torch.arange(w), torch.arange(w), indexing="ij")).flatten(1)
    rel = coords[:, :, None] - coords[:, None, :]      # [2, w², w²]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)                                 # [w², w²]


def _swin_shift_mask(grid, w, s):
    """Published img_mask construction for shifted windows."""
    img = torch.zeros(1, grid, grid, 1)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -s), slice(-s, None)):
        for ws in (slice(0, -w), slice(-w, -s), slice(-s, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = img.view(1, grid // w, w, grid // w, w, 1) \
        .permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w)
    diff = win.unsqueeze(1) - win.unsqueeze(2)
    return torch.where(diff == 0, 0.0, -1e9)           # [nW, w², w²]


def swin_oracle(sd, spec, images_nchw):
    g = lambda k: sd["visual.trunk." + k]
    eps = spec.ln_eps
    x = F.conv2d(images_nchw, g("patch_embed.proj.weight"),
                 g("patch_embed.proj.bias"), stride=spec.patch_size)
    B, D, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)
    x = _ln(x, g("patch_embed.norm.weight"), g("patch_embed.norm.bias"), eps)
    x = x.reshape(B, gh, gw, D)

    for s in range(len(spec.depths)):
        pre = f"layers.{s}."
        if s > 0:
            # original PatchMerging: cat [x00, x10, x01, x11] → LN →
            # bias-less reduction
            x0 = x[:, 0::2, 0::2]
            x1 = x[:, 1::2, 0::2]
            x2 = x[:, 0::2, 1::2]
            x3 = x[:, 1::2, 1::2]
            x = torch.cat([x0, x1, x2, x3], dim=-1)
            x = _ln(x, g(pre + "downsample.norm.weight"),
                    g(pre + "downsample.norm.bias"), eps)
            x = F.linear(x, g(pre + "downsample.reduction.weight"))
        Bc, H, W, C = x.shape
        w = spec.stage_window(s)
        nh = spec.heads[s]
        hd = C // nh
        base_shift = 0 if w >= H else w // 2
        index = _swin_rel_index(w)
        for i in range(spec.depths[s]):
            b = pre + f"blocks.{i}."
            sh = base_shift if (i % 2 == 1) else 0
            y = _ln(x, g(b + "norm1.weight"), g(b + "norm1.bias"), eps)
            if sh:
                y = torch.roll(y, (-sh, -sh), dims=(1, 2))
            yw = y.view(B, H // w, w, W // w, w, C) \
                .permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)
            qkv = F.linear(yw, g(b + "attn.qkv.weight"),
                           g(b + "attn.qkv.bias"))
            q, k, v = qkv.chunk(3, dim=-1)
            Bw, N = yw.shape[0], w * w
            q = q.reshape(Bw, N, nh, hd).transpose(1, 2)
            k = k.reshape(Bw, N, nh, hd).transpose(1, 2)
            v = v.reshape(Bw, N, nh, hd).transpose(1, 2)
            a = (q @ k.transpose(-2, -1)) * hd ** -0.5
            bias = g(b + "attn.relative_position_bias_table")[
                index.view(-1)].view(N, N, nh).permute(2, 0, 1)
            a = a + bias.unsqueeze(0)
            if sh:
                mask = _swin_shift_mask(H, w, sh)
                nW = mask.shape[0]
                a = a.view(Bw // nW, nW, nh, N, N) \
                    + mask.unsqueeze(1).unsqueeze(0)
                a = a.view(Bw, nh, N, N)
            a = a.softmax(dim=-1)
            o = (a @ v).transpose(1, 2).reshape(Bw, N, C)
            o = F.linear(o, g(b + "attn.proj.weight"), g(b + "attn.proj.bias"))
            o = o.view(B, H // w, W // w, w, w, C) \
                .permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
            if sh:
                o = torch.roll(o, (sh, sh), dims=(1, 2))
            x = x + o
            y = _ln(x, g(b + "norm2.weight"), g(b + "norm2.bias"), eps)
            h = F.gelu(F.linear(y, g(b + "mlp.fc1.weight"),
                                g(b + "mlp.fc1.bias")))
            x = x + F.linear(h, g(b + "mlp.fc2.weight"), g(b + "mlp.fc2.bias"))

    x = _ln(x, g("norm.weight"), g("norm.bias"), eps)
    pooled = x.mean(dim=(1, 2))
    return F.linear(pooled, sd["visual.head.proj.weight"])


def test_swin_matches_torch_oracle():
    from leaf_tpu.models.swin import (
        SwinVisionSpec,
        encode_image_swin,
        timm_swin_to_params,
    )

    # grid 8, window 4 → shifted block in stage 0; stage 1 grid 4 =
    # window → shift clamped to 0 (the timm grid<=window rule)
    spec = SwinVisionSpec(name="tiny", image_size=32, patch_size=4,
                          embed_dim=8, depths=(2, 2), heads=(2, 4),
                          window=4, output_dim=24)
    sd = _swin_sd(spec)
    imgs = np.random.default_rng(3).standard_normal(
        (2, 32, 32, 3)).astype(np.float32)
    want = swin_oracle(sd, spec, torch.from_numpy(
        imgs.transpose(0, 3, 1, 2))).detach().numpy()

    params = timm_swin_to_params(sd, spec)
    got = np.asarray(encode_image_swin(params, spec, imgs))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


# ===========================================================================
# RelPos ViT (timm vision_transformer_relpos.py: RelPosMlp mode='cr' —
# ReLU MLP over signed-log relative coords, class-token row/col
# zero-padded, qkv bias-less, token pooling + linear head)
# ===========================================================================

def _relpos_sd(spec):
    D, L, Hn, R = (spec.width, spec.layers, spec.mlp_hidden,
                   spec.rel_pos_dim)
    p = spec.patch_size
    sd = {
        "visual.trunk.patch_embed.proj.weight": _t(D, 3, p, p),
        "visual.trunk.patch_embed.proj.bias": _t(D),
        "visual.trunk.cls_token": _t(1, 1, D),
        "visual.trunk.norm.weight": 1 + _t(D),
        "visual.trunk.norm.bias": _t(D),
        "visual.head.proj.weight": _t(spec.output_dim, D),
    }
    for i in range(L):
        b = f"visual.trunk.blocks.{i}."
        sd.update({
            b + "norm1.weight": 1 + _t(D), b + "norm1.bias": _t(D),
            b + "attn.qkv.weight": _t(3 * D, D),
            b + "attn.rel_pos.mlp.fc1.weight": _t(R, 2),
            b + "attn.rel_pos.mlp.fc1.bias": _t(R),
            b + "attn.rel_pos.mlp.fc2.weight": _t(spec.heads, R),
            b + "attn.rel_pos.mlp.fc2.bias": _t(spec.heads),
            b + "attn.proj.weight": _t(D, D),
            b + "attn.proj.bias": _t(D),
            b + "norm2.weight": 1 + _t(D), b + "norm2.bias": _t(D),
            b + "mlp.fc1.weight": _t(Hn, D), b + "mlp.fc1.bias": _t(Hn),
            b + "mlp.fc2.weight": _t(D, Hn), b + "mlp.fc2.bias": _t(D),
        })
    return sd


def relpos_oracle(sd, spec, images_nchw):
    g = lambda k: sd["visual.trunk." + k]
    eps = spec.ln_eps
    x = F.conv2d(images_nchw, g("patch_embed.proj.weight"),
                 g("patch_embed.proj.bias"), stride=spec.patch_size)
    B, D, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)
    x = torch.cat([g("cls_token").expand(B, -1, -1), x], dim=1)

    # gen_relative_log_coords(mode='cr'): [(2g-1), (2g-1), 2] of
    # sign(Δ)·log1p(|Δ|) — and the usual relative index (window = grid)
    gr = spec.grid_size
    r = torch.arange(-(gr - 1), gr, dtype=torch.float32)
    table = torch.stack(torch.meshgrid(r, r, indexing="ij"), dim=-1)
    table = torch.sign(table) * torch.log1p(table.abs())    # [2g-1, 2g-1, 2]
    index = _swin_rel_index(gr).view(-1)                    # [N²]
    N = gr * gr
    H, hd = spec.heads, spec.width // spec.heads

    for i in range(spec.layers):
        b = f"blocks.{i}."
        # RelPosMlp.get_bias(): mlp over the coord table, gather,
        # [H, N, N], zero-pad the prefix (class) token row/column
        h = F.relu(F.linear(table.view(-1, 2),
                            g(b + "attn.rel_pos.mlp.fc1.weight"),
                            g(b + "attn.rel_pos.mlp.fc1.bias")))
        bias_tab = F.linear(h, g(b + "attn.rel_pos.mlp.fc2.weight"),
                            g(b + "attn.rel_pos.mlp.fc2.bias"))
        bias = bias_tab[index].view(N, N, H).permute(2, 0, 1)
        bias = F.pad(bias, (1, 0, 1, 0))                    # [H, N+1, N+1]

        y = _ln(x, g(b + "norm1.weight"), g(b + "norm1.bias"), eps)
        qkv = F.linear(y, g(b + "attn.qkv.weight"))         # qkv_bias=False
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.reshape(B, -1, H, hd).transpose(1, 2)
        k = k.reshape(B, -1, H, hd).transpose(1, 2)
        v = v.reshape(B, -1, H, hd).transpose(1, 2)
        a = (q @ k.transpose(-2, -1)) * hd ** -0.5 + bias.unsqueeze(0)
        a = a.softmax(dim=-1)
        o = (a @ v).transpose(1, 2).reshape(B, -1, D)
        x = x + F.linear(o, g(b + "attn.proj.weight"), g(b + "attn.proj.bias"))
        y = _ln(x, g(b + "norm2.weight"), g(b + "norm2.bias"), eps)
        hm = F.gelu(F.linear(y, g(b + "mlp.fc1.weight"),
                             g(b + "mlp.fc1.bias")))
        x = x + F.linear(hm, g(b + "mlp.fc2.weight"), g(b + "mlp.fc2.bias"))

    x = _ln(x, g("norm.weight"), g("norm.bias"), eps)
    return F.linear(x[:, 0], sd["visual.head.proj.weight"])


def test_relpos_matches_torch_oracle():
    from leaf_tpu.models.relpos_vit import (
        RelPosViTSpec,
        encode_image_relpos,
        timm_relpos_to_params,
    )

    spec = RelPosViTSpec(name="tiny", image_size=32, patch_size=8,
                         width=32, layers=2, heads=4, rel_pos_dim=16,
                         output_dim=24)
    sd = _relpos_sd(spec)
    imgs = np.random.default_rng(4).standard_normal(
        (2, 32, 32, 3)).astype(np.float32)
    want = relpos_oracle(sd, spec, torch.from_numpy(
        imgs.transpose(0, 3, 1, 2))).detach().numpy()

    params = timm_relpos_to_params(sd, spec)
    got = np.asarray(encode_image_relpos(params, spec, imgs))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
