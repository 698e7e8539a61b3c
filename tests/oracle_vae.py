"""Torch oracle of the Wan 3D causal VAE with the reference's streaming
feature-cache semantics (sgm/models/wan_vae.py), used to validate both the
full-sequence closed forms and the streamed scan in scail_tpu.models.wan_vae.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

CACHE_T = 2


class CausalConv3d(nn.Conv3d):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._time_pad = 2 * self.padding[0]
        self._space_pad = (self.padding[2], self.padding[2],
                           self.padding[1], self.padding[1])
        self.padding = (0, 0, 0)

    def forward(self, x, cache_x=None):
        tpad = self._time_pad
        if cache_x is not None and tpad > 0:
            x = torch.cat([cache_x, x], dim=2)
            tpad -= cache_x.shape[2]
        x = F.pad(x, self._space_pad + (tpad, 0))
        return super().forward(x)


class RMS(nn.Module):
    def __init__(self, dim, images=True):
        super().__init__()
        shape = (dim, 1, 1) if images else (dim, 1, 1, 1)
        self.gamma = nn.Parameter(torch.randn(shape) * 0.1 + 1.0)
        self.scale = dim ** 0.5

    def forward(self, x):
        return F.normalize(x, dim=1) * self.scale * self.gamma


class Resample(nn.Module):
    def __init__(self, dim, mode):
        super().__init__()
        self.mode = mode
        if mode in ("upsample2d", "upsample3d"):
            self.resample = nn.Sequential(
                nn.Upsample(scale_factor=(2.0, 2.0), mode="nearest-exact"),
                nn.Conv2d(dim, dim // 2, 3, padding=1),
            )
            if mode == "upsample3d":
                self.time_conv = CausalConv3d(dim, dim * 2, (3, 1, 1), padding=(1, 0, 0))
        elif mode in ("downsample2d", "downsample3d"):
            self.resample = nn.Sequential(
                nn.ZeroPad2d((0, 1, 0, 1)), nn.Conv2d(dim, dim, 3, stride=(2, 2))
            )
            if mode == "downsample3d":
                self.time_conv = CausalConv3d(dim, dim, (3, 1, 1),
                                              stride=(2, 1, 1), padding=(0, 0, 0))
        else:
            self.resample = nn.Identity()

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        b, c, t, h, w = x.size()
        if self.mode == "upsample3d" and feat_cache is not None:
            idx = feat_idx[0]
            if feat_cache[idx] is None:
                feat_cache[idx] = "Rep"
                feat_idx[0] += 1
            else:
                cache_x = x[:, :, -CACHE_T:].clone()
                if cache_x.shape[2] < 2 and feat_cache[idx] != "Rep":
                    cache_x = torch.cat(
                        [feat_cache[idx][:, :, -1:], cache_x], dim=2
                    )
                if cache_x.shape[2] < 2 and feat_cache[idx] == "Rep":
                    cache_x = torch.cat([torch.zeros_like(cache_x), cache_x], dim=2)
                if feat_cache[idx] == "Rep":
                    x = self.time_conv(x)
                else:
                    x = self.time_conv(x, feat_cache[idx])
                feat_cache[idx] = cache_x
                feat_idx[0] += 1
                x = x.reshape(b, 2, c, t, h, w)
                x = torch.stack((x[:, 0], x[:, 1]), 3).reshape(b, c, t * 2, h, w)
        t = x.shape[2]
        x = x.permute(0, 2, 1, 3, 4).reshape(-1, *x.shape[1:2], *x.shape[3:])
        x = self.resample(x)
        x = x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)
        if self.mode == "downsample3d" and feat_cache is not None:
            idx = feat_idx[0]
            if feat_cache[idx] is None:
                feat_cache[idx] = x.clone()
                feat_idx[0] += 1
            else:
                cache_x = x[:, :, -1:].clone()
                x = self.time_conv(torch.cat([feat_cache[idx][:, :, -1:], x], 2))
                feat_cache[idx] = cache_x
                feat_idx[0] += 1
        return x


def _cached_conv(layer, x, feat_cache, feat_idx):
    idx = feat_idx[0]
    cache_x = x[:, :, -CACHE_T:].clone()
    if cache_x.shape[2] < 2 and feat_cache[idx] is not None:
        cache_x = torch.cat([feat_cache[idx][:, :, -1:], cache_x], dim=2)
    y = layer(x, feat_cache[idx])
    feat_cache[idx] = cache_x
    feat_idx[0] += 1
    return y


class ResBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.residual = nn.Sequential(
            RMS(cin, images=False), nn.SiLU(),
            CausalConv3d(cin, cout, 3, padding=1),
            RMS(cout, images=False), nn.SiLU(), nn.Dropout(0.0),
            CausalConv3d(cout, cout, 3, padding=1),
        )
        self.shortcut = CausalConv3d(cin, cout, 1) if cin != cout else nn.Identity()

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        h = self.shortcut(x)
        for layer in self.residual:
            if isinstance(layer, CausalConv3d) and feat_cache is not None:
                x = _cached_conv(layer, x, feat_cache, feat_idx)
            else:
                x = layer(x)
        return x + h


class AttnBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = RMS(dim)
        self.to_qkv = nn.Conv2d(dim, dim * 3, 1)
        self.proj = nn.Conv2d(dim, dim, 1)

    def forward(self, x):
        identity = x
        b, c, t, h, w = x.size()
        y = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        y = self.norm(y)
        q, k, v = (
            self.to_qkv(y).reshape(b * t, 1, c * 3, -1).permute(0, 1, 3, 2).chunk(3, dim=-1)
        )
        y = F.scaled_dot_product_attention(q, k, v)
        y = y.squeeze(1).permute(0, 2, 1).reshape(b * t, c, h, w)
        y = self.proj(y)
        return y.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4) + identity


class Encoder3d(nn.Module):
    def __init__(self, dim, z_dim, dim_mult, num_res_blocks, temporal_down):
        super().__init__()
        dims = [dim * u for u in [1] + list(dim_mult)]
        self.conv1 = CausalConv3d(3, dims[0], 3, padding=1)
        blocks = []
        for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
            for _ in range(num_res_blocks):
                blocks.append(ResBlock(cin, cout))
                cin = cout
            if i != len(dim_mult) - 1:
                blocks.append(Resample(cout, "downsample3d" if temporal_down[i] else "downsample2d"))
        self.downsamples = nn.Sequential(*blocks)
        d = dims[-1]
        self.middle = nn.Sequential(ResBlock(d, d), AttnBlock(d), ResBlock(d, d))
        self.head = nn.Sequential(RMS(d, images=False), nn.SiLU(),
                                  CausalConv3d(d, z_dim, 3, padding=1))

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        if feat_cache is not None:
            x = _cached_conv(self.conv1, x, feat_cache, feat_idx)
        else:
            x = self.conv1(x)
        for layer in self.downsamples:
            x = layer(x, feat_cache, feat_idx) if feat_cache is not None else layer(x)
        for layer in self.middle:
            if isinstance(layer, ResBlock) and feat_cache is not None:
                x = layer(x, feat_cache, feat_idx)
            else:
                x = layer(x)
        for layer in self.head:
            if isinstance(layer, CausalConv3d) and feat_cache is not None:
                x = _cached_conv(layer, x, feat_cache, feat_idx)
            else:
                x = layer(x)
        return x


class Decoder3d(nn.Module):
    def __init__(self, dim, z_dim, dim_mult, num_res_blocks, temporal_up):
        super().__init__()
        dims = [dim * u for u in [dim_mult[-1]] + list(dim_mult)[::-1]]
        self.conv1 = CausalConv3d(z_dim, dims[0], 3, padding=1)
        d0 = dims[0]
        self.middle = nn.Sequential(ResBlock(d0, d0), AttnBlock(d0), ResBlock(d0, d0))
        blocks = []
        for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
            if i in (1, 2, 3):
                cin = cin // 2
            for _ in range(num_res_blocks + 1):
                blocks.append(ResBlock(cin, cout))
                cin = cout
            if i != len(dim_mult) - 1:
                blocks.append(Resample(cout, "upsample3d" if temporal_up[i] else "upsample2d"))
        self.upsamples = nn.Sequential(*blocks)
        self.head = nn.Sequential(RMS(dims[-1], images=False), nn.SiLU(),
                                  CausalConv3d(dims[-1], 3, 3, padding=1))

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        if feat_cache is not None:
            x = _cached_conv(self.conv1, x, feat_cache, feat_idx)
        else:
            x = self.conv1(x)
        for layer in self.middle:
            if isinstance(layer, ResBlock) and feat_cache is not None:
                x = layer(x, feat_cache, feat_idx)
            else:
                x = layer(x)
        for layer in self.upsamples:
            x = layer(x, feat_cache, feat_idx) if feat_cache is not None else layer(x)
        for layer in self.head:
            if isinstance(layer, CausalConv3d) and feat_cache is not None:
                x = _cached_conv(layer, x, feat_cache, feat_idx)
            else:
                x = layer(x)
        return x


def count_causal(model):
    return sum(1 for m in model.modules() if isinstance(m, CausalConv3d))


class OracleWanVAE(nn.Module):
    def __init__(self, dim=8, z_dim=4, dim_mult=(1, 1, 2, 2), num_res_blocks=1,
                 temporal_down=(False, True, True)):
        super().__init__()
        self.z_dim = z_dim
        self.encoder = Encoder3d(dim, z_dim * 2, dim_mult, num_res_blocks, temporal_down)
        self.conv1 = CausalConv3d(z_dim * 2, z_dim * 2, 1)
        self.conv2 = CausalConv3d(z_dim, z_dim, 1)
        self.decoder = Decoder3d(dim, z_dim, dim_mult, num_res_blocks,
                                 list(temporal_down)[::-1])

    @torch.no_grad()
    def encode_streamed(self, x):
        """(wan_vae.py:516-542): chunks of [1,4,4,...] frames."""
        feat_map = [None] * count_causal(self.encoder)
        t = x.shape[2]
        outs = []
        for i in range(1 + (t - 1) // 4):
            idx = [0]
            lo = 0 if i == 0 else 1 + 4 * (i - 1)
            hi = 1 if i == 0 else 1 + 4 * i
            outs.append(self.encoder(x[:, :, lo:hi], feat_cache=feat_map, feat_idx=idx))
        out = torch.cat(outs, 2)
        mu = self.conv1(out).chunk(2, dim=1)[0]
        return mu

    @torch.no_grad()
    def decode_streamed(self, z):
        """(wan_vae.py:544-568): one latent frame at a time."""
        feat_map = [None] * count_causal(self.decoder)
        x = self.conv2(z)
        outs = []
        for i in range(z.shape[2]):
            idx = [0]
            outs.append(self.decoder(x[:, :, i : i + 1], feat_cache=feat_map, feat_idx=idx))
        return torch.cat(outs, 2)
