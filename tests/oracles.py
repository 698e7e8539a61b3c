"""Torch oracles implementing the reference math for parity tests.

These are independent, test-only reimplementations of the documented
reference semantics (dit_video_crossattn_sc_xc.py et al.); they intentionally
use SAT's state-dict naming so the production checkpoint converter is
exercised by the same tests.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# RoPE oracle (dit:382-645), interleaved variant
# ---------------------------------------------------------------------------
def torch_rope_tables(head_dim, T, H_total, W_total, theta=10000.0):
    dim_t = head_dim - 4 * (head_dim // 6)
    dim_h = (head_dim // 6) * 2

    def axis_freqs(dim):
        return 1.0 / theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim)

    ft, fh, fw = axis_freqs(dim_t), axis_freqs(dim_h), axis_freqs(dim_h)
    grid_t = torch.arange(1, T + 1, dtype=torch.float32)
    grid_h = torch.arange(H_total, dtype=torch.float32)
    grid_w = torch.arange(W_total + 120, dtype=torch.float32)
    ext_t = torch.tensor([0.0])

    def table(gt, gh, gw):
        at = torch.einsum("t,f->tf", gt, ft).repeat_interleave(2, dim=-1)
        ah = torch.einsum("h,f->hf", gh, fh).repeat_interleave(2, dim=-1)
        aw = torch.einsum("w,f->wf", gw, fw).repeat_interleave(2, dim=-1)
        Tn, Hn, Wn = len(gt), len(gh), len(gw)
        return torch.cat(
            [
                at[:, None, None, :].expand(Tn, Hn, Wn, -1),
                ah[None, :, None, :].expand(Tn, Hn, Wn, -1),
                aw[None, None, :, :].expand(Tn, Hn, Wn, -1),
            ],
            dim=-1,
        )

    freqs = table(grid_t, grid_h, grid_w)
    freqs_ext = table(
        ext_t,
        torch.arange(H_total, dtype=torch.float32),
        torch.arange(W_total, dtype=torch.float32),
    )
    return freqs, freqs_ext


def torch_rotate_half_interleaved(x):
    y = x.reshape(*x.shape[:-1], -1, 2)
    a, b = y.unbind(dim=-1)
    return torch.stack((-b, a), dim=-1).reshape(*x.shape)


def torch_apply_rope(t, cos, sin):
    return t * cos + torch_rotate_half_interleaved(t) * sin


class RopeOracle:
    """Per-segment cos/sin like Rotary3DPositionEmbeddingMixin.rotary*."""

    def __init__(self, head_dim, T, H, W, h_shift=0, w_shift=0):
        freqs, freqs_ext = torch_rope_tables(head_dim, T, H + h_shift, W + w_shift)
        vid = freqs[:T, h_shift : H + h_shift, w_shift : W + w_shift]
        ref = freqs_ext[0:1, h_shift : H + h_shift, w_shift : W + w_shift]
        pose = freqs[:T, h_shift : H + h_shift, 120 + w_shift : 120 + W + w_shift]

        def flat_cs(f):
            return (
                f.cos().reshape(-1, head_dim)[None, None],
                f.sin().reshape(-1, head_dim)[None, None],
            )

        def pooled_cs(f):
            cs = F.avg_pool2d(f.cos().permute(0, 3, 1, 2), 2, 2).permute(0, 2, 3, 1)
            sn = F.avg_pool2d(f.sin().permute(0, 3, 1, 2), 2, 2).permute(0, 2, 3, 1)
            return (
                cs.reshape(-1, head_dim)[None, None],
                sn.reshape(-1, head_dim)[None, None],
            )

        self.ref = flat_cs(ref)
        self.vid = flat_cs(vid)
        self.pose = pooled_cs(pose)

    def __call__(self, t, ref_len, seq_len):
        # t: (b, n, s, d)
        parts = [
            torch_apply_rope(t[:, :, :ref_len], *self.ref),
            torch_apply_rope(t[:, :, ref_len : ref_len + seq_len], *self.vid),
            torch_apply_rope(t[:, :, ref_len + seq_len :], *self.pose),
        ]
        return torch.cat(parts, dim=2)


# ---------------------------------------------------------------------------
# DiT oracle with SAT state-dict naming
# ---------------------------------------------------------------------------
class _FullWidthRMS(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(dim) * 0.1 + 1.0)
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (self.weight * (x.float() * torch.rsqrt(var + self.eps))).to(x.dtype)


class _OracleLayerAttention(nn.Module):
    def __init__(self, h):
        super().__init__()
        self.query_key_value = nn.Linear(h, 3 * h)
        self.dense = nn.Linear(h, h)


class _OracleLayerCross(nn.Module):
    def __init__(self, h):
        super().__init__()
        self.query = nn.Linear(h, h)
        self.key_value = nn.Linear(h, 2 * h)
        self.dense = nn.Linear(h, h)


class _OracleLayerMLP(nn.Module):
    def __init__(self, h, inner):
        super().__init__()
        self.dense_h_to_4h = nn.Linear(h, inner)
        self.dense_4h_to_h = nn.Linear(inner, h)


class _OracleLayer(nn.Module):
    def __init__(self, h, inner):
        super().__init__()
        self.attention = _OracleLayerAttention(h)
        self.cross_attention = _OracleLayerCross(h)
        self.mlp = _OracleLayerMLP(h, inner)


class _Transformer(nn.Module):
    def __init__(self, h, inner, L):
        super().__init__()
        self.layers = nn.ModuleList([_OracleLayer(h, inner) for _ in range(L)])


class _PatchEmbed(nn.Module):
    def __init__(self, in_ch, h, patch):
        super().__init__()
        self.proj = nn.Conv3d(in_ch, h, kernel_size=patch, stride=patch)
        self.proj_pose = nn.Conv3d(in_ch, h, kernel_size=patch, stride=patch)


class _AdaLNMixin(nn.Module):
    def __init__(self, h, L, use_clip=True):
        super().__init__()
        self.adaLN_modulations = nn.ParameterList(
            [nn.Parameter(torch.randn(1, 6, h) / h ** 0.5) for _ in range(L)]
        )
        self.query_layernorm_list = nn.ModuleList([_FullWidthRMS(h) for _ in range(L)])
        self.key_layernorm_list = nn.ModuleList([_FullWidthRMS(h) for _ in range(L)])
        self.cross_query_layernorm_list = nn.ModuleList([_FullWidthRMS(h) for _ in range(L)])
        self.cross_key_layernorm_list = nn.ModuleList([_FullWidthRMS(h) for _ in range(L)])
        if use_clip:
            self.clip_feature_key_layernorm_list = nn.ModuleList(
                [_FullWidthRMS(h) for _ in range(L)]
            )
            self.clip_feature_key_value_list = nn.ModuleList(
                [nn.Linear(h, 2 * h) for _ in range(L)]
            )


class _FinalLayer(nn.Module):
    def __init__(self, h, patch, out_ch):
        super().__init__()
        self.linear = nn.Linear(h, patch[0] * patch[1] * patch[2] * out_ch)
        self.adaLN_modulation = nn.Parameter(torch.randn(1, 2, h) / h ** 0.5)


class _Mixins(nn.Module):
    def __init__(self, h, inner, L, in_ch, out_ch, patch, use_clip):
        super().__init__()
        self.patch_embed = _PatchEmbed(in_ch, h, patch)
        self.adaln_layer = _AdaLNMixin(h, L, use_clip)
        self.final_layer = _FinalLayer(h, patch, out_ch)


class _ClipProj(nn.Module):
    def __init__(self, clip_dim, h):
        super().__init__()
        self.proj = nn.Sequential(
            nn.LayerNorm(clip_dim), nn.Linear(clip_dim, clip_dim), nn.GELU(),
            nn.Linear(clip_dim, h), nn.LayerNorm(h),
        )


class OracleDiT(nn.Module):
    """Reference-math DiT (share_adaln, qk_ln full-width, dual cross-attn)."""

    def __init__(self, *, hidden, heads, layers, inner, in_ch=20, out_ch=16,
                 patch=(1, 2, 2), text_dim=12, time_freq=16, clip_dim=10):
        super().__init__()
        h = hidden
        self.h, self.heads, self.patch = h, heads, patch
        self.out_ch, self.time_freq = out_ch, time_freq
        self.time_embed = nn.Sequential(nn.Linear(time_freq, h), nn.SiLU(), nn.Linear(h, h))
        self.adaln_projection = nn.Sequential(nn.SiLU(), nn.Linear(h, 6 * h))
        self.text_embedding = nn.Sequential(
            nn.Linear(text_dim, h), nn.GELU(approximate="tanh"), nn.Linear(h, h)
        )
        self.clip_proj = _ClipProj(clip_dim, h)
        self.mixins = _Mixins(h, inner, layers, in_ch, out_ch, patch, True)
        self.transformer = _Transformer(h, inner, layers)

    @staticmethod
    def timestep_embedding(t, dim):
        half = dim // 2
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float64) / half)
        args = t[:, None].float() * freqs[None].float()
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1).float()

    def _heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, -1).permute(0, 2, 1, 3)

    @staticmethod
    def _attn(q, k, v):
        scores = q @ k.transpose(-1, -2) / q.shape[-1] ** 0.5
        return torch.softmax(scores, dim=-1) @ v

    def forward(self, x, timesteps, context, ref_concat, pose, clip_feats):
        b, T, _, H, W = x.shape
        pt, ph, pw = self.patch
        Hp, Wp = H // ph, W // pw
        x = torch.cat([x, torch.zeros(b, T, 4, H, W)], dim=2)
        ref = torch.cat([ref_concat, torch.ones(b, 1, 4, H, W)], dim=2)
        pose = torch.cat([pose, torch.ones(b, T, 4, H // 2, W // 2)], dim=2)

        context = self.text_embedding(context)
        clip_tokens = self.clip_proj.proj(clip_feats)
        emb = self.time_embed(self.timestep_embedding(timesteps, self.time_freq))
        adaln_emb = self.adaln_projection(emb)

        vid = torch.cat([ref, x], dim=1).permute(0, 2, 1, 3, 4)
        vid = self.mixins.patch_embed.proj(vid)  # (b, h, T+1, Hp, Wp)
        vid = vid.flatten(2).transpose(1, 2)
        pse = self.mixins.patch_embed.proj_pose(pose.permute(0, 2, 1, 3, 4))
        pse = pse.flatten(2).transpose(1, 2)
        hidden = torch.cat([vid, pse], dim=1)

        ref_len, seq_len = Hp * Wp, T * Hp * Wp
        rope = RopeOracle(self.h // self.heads, T, Hp, Wp)

        for i, layer in enumerate(self.transformer.layers):
            table = self.mixins.adaln_layer.adaLN_modulations[i]
            mod = adaln_emb.unflatten(1, (6, self.h)) + table
            s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = mod.chunk(6, dim=1)

            ai = F.layer_norm(hidden, (self.h,), eps=1e-6)
            ai = ai * (1 + sc_msa) + s_msa
            qkv = layer.attention.query_key_value(ai)
            q, k, v = qkv.chunk(3, dim=-1)
            q = self.mixins.adaln_layer.query_layernorm_list[i](q)
            k = self.mixins.adaln_layer.key_layernorm_list[i](k)
            q, k, v = self._heads(q), self._heads(k), self._heads(v)
            q = rope(q, ref_len, seq_len)
            k = rope(k, ref_len, seq_len)
            attn = self._attn(q, k, v).permute(0, 2, 1, 3).flatten(2)
            hidden = hidden + g_msa * layer.attention.dense(attn)

            ci = F.layer_norm(hidden, (self.h,), eps=1e-6)
            cq = layer.cross_attention.query(ci)
            ck, cv = layer.cross_attention.key_value(context).chunk(2, dim=-1)
            pkv = self.mixins.adaln_layer.clip_feature_key_value_list[i](clip_tokens)
            pk, pv = pkv.chunk(2, dim=-1)
            cq = self.mixins.adaln_layer.cross_query_layernorm_list[i](cq)
            ck = self.mixins.adaln_layer.cross_key_layernorm_list[i](ck)
            pk = self.mixins.adaln_layer.clip_feature_key_layernorm_list[i](pk)
            cqh = self._heads(cq)
            cross = self._attn(cqh, self._heads(ck), self._heads(cv))
            cross = cross + self._attn(cqh, self._heads(pk), self._heads(pv))
            cross = cross.permute(0, 2, 1, 3).flatten(2)
            hidden = hidden + layer.cross_attention.dense(cross)

            mi = F.layer_norm(hidden, (self.h,), eps=1e-6)
            mi = mi * (1 + sc_mlp) + s_mlp
            mo = layer.mlp.dense_4h_to_h(F.gelu(layer.mlp.dense_h_to_4h(mi), approximate="tanh"))
            hidden = hidden + g_mlp * mo

        fmod = emb.unsqueeze(1) + self.mixins.final_layer.adaLN_modulation
        shift, scale = fmod.chunk(2, dim=1)
        out = F.layer_norm(hidden, (self.h,), eps=1e-6) * (1 + scale) + shift
        out = self.mixins.final_layer.linear(out)
        out = out[:, ref_len : ref_len + seq_len]
        # unpatchify (o p q c) -> (b, T, c, H, W)
        out = out.reshape(b, T, Hp, Wp, pt, ph, pw, self.out_ch)
        out = out.permute(0, 1, 4, 7, 2, 5, 3, 6)
        return out.reshape(b, T * pt, self.out_ch, H, W)
