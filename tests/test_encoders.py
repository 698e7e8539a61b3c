"""Parity tests: bicubic resize, umt5 encoder, CLIP visual tower vs torch."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from scail_tpu.models.clip_vit import (
    ClipVisionConfig, clip_preprocess, clip_vision_params_from_state_dict,
    clip_visual_tokens,
)
from scail_tpu.models.umt5 import (
    UMT5Config, relative_position_buckets, umt5_encode, umt5_params_from_state_dict,
)
from scail_tpu.ops.resize import resize_bicubic, resize_bilinear


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------
def test_bicubic_matches_torch_no_antialias(rng):
    x = rng.standard_normal((2, 3, 17, 23)).astype(np.float32)
    for out in [(224, 224), (8, 40), (34, 46)]:
        want = F.interpolate(torch.tensor(x), size=out, mode="bicubic",
                             align_corners=False).numpy()
        got = np.asarray(resize_bicubic(jnp.asarray(x), *out, antialias=False))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_bicubic_matches_torch_antialias(rng):
    x = rng.standard_normal((1, 3, 64, 48)).astype(np.float32)
    want = F.interpolate(torch.tensor(x), size=(20, 30), mode="bicubic",
                         align_corners=False, antialias=True).numpy()
    got = np.asarray(resize_bicubic(jnp.asarray(x), 20, 30, antialias=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_bilinear_matches_torch(rng):
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    want = F.interpolate(torch.tensor(x), scale_factor=0.5, mode="bilinear",
                         align_corners=False).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), 16, 16))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# umt5 oracle (reference math, tiny config)
# ---------------------------------------------------------------------------
class _T5LN(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(d) * 0.1 + 1.0)

    def forward(self, x):
        x = x * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + 1e-6)
        return self.weight * x


class _T5Attn(nn.Module):
    def __init__(self, d, nh):
        super().__init__()
        self.q = nn.Linear(d, d, bias=False)
        self.k = nn.Linear(d, d, bias=False)
        self.v = nn.Linear(d, d, bias=False)
        self.o = nn.Linear(d, d, bias=False)
        self.nh = nh

    def forward(self, x, mask, pos_bias):
        b, s, d = x.shape
        n, c = self.nh, d // self.nh
        q = self.q(x).view(b, s, n, c)
        k = self.k(x).view(b, s, n, c)
        v = self.v(x).view(b, s, n, c)
        bias = pos_bias + torch.where(
            mask.view(b, 1, 1, s) > 0, 0.0, torch.finfo(torch.float32).min
        )
        attn = torch.einsum("binc,bjnc->bnij", q, k) + bias
        attn = F.softmax(attn.float(), dim=-1)
        out = torch.einsum("bnij,bjnc->binc", attn, v).reshape(b, s, d)
        return self.o(out)


class _T5RelEmb(nn.Module):
    def __init__(self, buckets, nh, max_dist=128):
        super().__init__()
        self.embedding = nn.Embedding(buckets, nh)
        self.buckets, self.max_dist = buckets, max_dist

    def forward(self, lq, lk):
        rel = torch.arange(lk)[None] - torch.arange(lq)[:, None]
        nb = self.buckets // 2
        rb = (rel > 0).long() * nb
        rel = rel.abs()
        me = nb // 2
        large = me + (torch.log(rel.float().clamp(min=1) / me)
                      / math.log(self.max_dist / me) * (nb - me)).long()
        large = torch.minimum(large, torch.full_like(large, nb - 1))
        rb = rb + torch.where(rel < me, rel, large)
        return self.embedding(rb).permute(2, 0, 1)[None]


class _T5FFN(nn.Module):
    def __init__(self, d, dff):
        super().__init__()
        self.gate0 = nn.Linear(d, dff, bias=False)
        self.fc1 = nn.Linear(d, dff, bias=False)
        self.fc2 = nn.Linear(dff, d, bias=False)

    def forward(self, x):
        g = F.gelu(self.gate0(x), approximate="tanh")
        return self.fc2(self.fc1(x) * g)


class _T5Block(nn.Module):
    def __init__(self, d, dff, nh, buckets):
        super().__init__()
        self.norm1, self.norm2 = _T5LN(d), _T5LN(d)
        self.attn = _T5Attn(d, nh)
        self.ffn = _T5FFN(d, dff)
        self.pos = _T5RelEmb(buckets, nh)

    def forward(self, x, mask):
        e = self.pos(x.shape[1], x.shape[1])
        x = x + self.attn(self.norm1(x), mask, e)
        x = x + self.ffn(self.norm2(x))
        return x


class _T5Enc(nn.Module):
    def __init__(self, vocab, d, dff, nh, L, buckets):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, d)
        self.blocks = nn.ModuleList([_T5Block(d, dff, nh, buckets) for _ in range(L)])
        self.norm = _T5LN(d)

    def forward(self, ids, mask):
        x = self.token_embedding(ids)
        for blk in self.blocks:
            x = blk(x, mask)
        return self.norm(x) * mask[:, :, None]


def test_umt5_matches_oracle(rng):
    torch.manual_seed(0)
    cfg = UMT5Config(vocab_size=100, dim=32, dim_attn=32, dim_ffn=48,
                     num_heads=4, num_layers=2, num_buckets=8, dtype="float32")
    oracle = _T5Enc(100, 32, 48, 4, 2, 8)

    sd = {}
    for k, v in oracle.state_dict().items():
        k = (k.replace(".gate0.", ".gate.0.")
             .replace(".pos.embedding.", ".pos_embedding.embedding."))
        k = k.replace(".attn.q.", ".attn.q.").replace(".ffn.fc", ".ffn.fc")
        # oracle uses .attn/.ffn directly; reference names are identical
        sd[k] = v.detach().numpy()
    params = umt5_params_from_state_dict(sd, cfg)

    ids = rng.integers(2, 100, (2, 11)).astype(np.int32)
    mask = np.ones((2, 11), np.int32)
    mask[0, 8:] = 0
    want = oracle(torch.tensor(ids, dtype=torch.long), torch.tensor(mask)).detach().numpy()
    got = np.asarray(umt5_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_relative_buckets_match_torch():
    rel = torch.arange(20)[None] - torch.arange(20)[:, None]
    emb = _T5RelEmb(32, 1)
    # reproduce bucket path only
    nb = 16
    rb = (rel > 0).long() * nb
    rrel = rel.abs()
    me = 8
    large = me + (torch.log(rrel.float().clamp(min=1) / me)
                  / math.log(128 / me) * (nb - me)).long()
    large = torch.minimum(large, torch.full_like(large, nb - 1))
    want = (rb + torch.where(rrel < me, rrel, large)).numpy()
    got = relative_position_buckets(20, 20, 32, 128)
    np.testing.assert_array_equal(got, want)


def test_umt5_varlen_trim():
    """varlen_text trims to valid tokens padded to the shard multiple
    (umt5.py:516-535)."""
    from scail_tpu.models.umt5 import T5EncoderModel, UMT5Config, init_umt5_params

    emb = T5EncoderModel(max_length=16, varlen_text=True, uncond_text_length=1)
    emb.config = UMT5Config(vocab_size=100, dim=32, dim_attn=32, dim_ffn=48,
                            num_heads=4, num_layers=1, num_buckets=8,
                            dtype="float32")
    import jax

    emb.init(jax.random.PRNGKey(0), emb.config)
    emb.cond_length_multiple = 4
    z = emb(["three token prompt"])      # 3 words + eos = 4 valid -> stays 4
    assert z.shape[1] == 4
    z2 = emb(["five tokens in this prompt"])  # 6 valid -> pad to 8
    assert z2.shape[1] == 8
    z3 = emb([""])                        # 1 valid (eos) -> uncond_text_length
    assert z3.shape[1] == 1


# ---------------------------------------------------------------------------
# CLIP visual oracle
# ---------------------------------------------------------------------------
class _ClipBlock(nn.Module):
    def __init__(self, d, nh):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-5)
        self.attn_qkv = nn.Linear(d, 3 * d)
        self.attn_proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-5)
        self.mlp0 = nn.Linear(d, 4 * d)
        self.mlp2 = nn.Linear(4 * d, d)
        self.nh = nh

    def forward(self, x):
        b, s, d = x.shape
        n, hd = self.nh, d // self.nh
        y = self.norm1(x)
        q, k, v = self.attn_qkv(y).view(b, s, 3, n, hd).permute(0, 3, 2, 1, 4).unbind(2)
        o = F.scaled_dot_product_attention(q, k, v)
        x = x + self.attn_proj(o.permute(0, 2, 1, 3).reshape(b, s, d))
        x = x + self.mlp2(F.gelu(self.mlp0(self.norm2(x))))
        return x


class _ClipViT(nn.Module):
    def __init__(self, d=32, nh=4, L=3, patch=8, img=32):
        super().__init__()
        self.patch_embedding = nn.Conv2d(3, d, patch, stride=patch, bias=False)
        n = (img // patch) ** 2
        self.cls_embedding = nn.Parameter(torch.randn(1, 1, d) / d ** 0.5)
        self.pos_embedding = nn.Parameter(torch.randn(1, n + 1, d) / d ** 0.5)
        self.pre_norm = nn.LayerNorm(d, eps=1e-5)
        self.blocks = nn.ModuleList([_ClipBlock(d, nh) for _ in range(L)])

    def forward(self, x, use_31_block=True):
        b = x.shape[0]
        x = self.patch_embedding(x).flatten(2).permute(0, 2, 1)
        x = torch.cat([self.cls_embedding.expand(b, -1, -1), x], dim=1)
        x = self.pre_norm(x + self.pos_embedding)
        blocks = self.blocks[:-1] if use_31_block else self.blocks
        for blk in blocks:
            x = blk(x)
        return x


def test_clip_visual_matches_oracle(rng):
    torch.manual_seed(1)
    cfg = ClipVisionConfig(image_size=32, patch_size=8, dim=32, num_heads=4,
                           num_layers=3, dtype="float32")
    oracle = _ClipViT(d=32, nh=4, L=3, patch=8, img=32)

    sd = {}
    for k, v in oracle.state_dict().items():
        k = (k.replace("blocks.", "transformer.")
             .replace(".attn_qkv.", ".attn.to_qkv.")
             .replace(".attn_proj.", ".attn.proj.")
             .replace(".mlp0.", ".mlp.0.")
             .replace(".mlp2.", ".mlp.2."))
        sd[k] = v.detach().numpy()
    params = clip_vision_params_from_state_dict(sd, cfg)

    imgs = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    want = oracle(torch.tensor(imgs)).detach().numpy()
    got = np.asarray(clip_visual_tokens(params, cfg, jnp.asarray(imgs)))
    assert got.shape == want.shape == (2, 17, 32)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_clip_preprocess_matches_torch(rng):
    frames = rng.uniform(-1, 1, (2, 3, 50, 70)).astype(np.float32)
    ft = torch.tensor(frames)
    want = F.interpolate(ft, size=(224, 224), mode="bicubic", align_corners=False)
    want = want.mul(0.5).add(0.5)
    mean = torch.tensor([0.48145466, 0.4578275, 0.40821073]).view(1, 3, 1, 1)
    std = torch.tensor([0.26862954, 0.26130258, 0.27577711]).view(1, 3, 1, 1)
    want = ((want - mean) / std).numpy()
    got = np.asarray(clip_preprocess(jnp.asarray(frames)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
