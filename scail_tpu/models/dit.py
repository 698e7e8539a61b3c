"""The SCAIL DiT, TPU-native.

Functional reimplementation of the reference's 14B rectified-flow video DiT
(`dit_video_crossattn_sc_xc.DiffusionTransformer`, dit:1209-1587 — "sc" =
separate-channel ref/pose in-context tokens, "xc" = CLIP cross-attention).
The SAT mixin/hook machinery (BaseModel/BaseMixin, sat/model/base_model.py)
is replaced by one explicit forward; layers are stacked on a leading axis
and executed with `lax.scan` so 40 layers trace/compile once.

Architecture (citations into /root/reference):
  * patch embed: conv3d(patch=(1,2,2)) of [ref ‖ video] + separate conv for
    half-res pose tokens, fused sequence [ref | video | pose]
    (ImagePatchEmbeddingMixin, dit:76-130).  Stride==kernel, so it is a
    reshape+matmul here (MXU-friendly).
  * 3-regime interleaved 3D RoPE (Rotary3DPositionEmbeddingMixin,
    dit:382-757) — see scail_tpu.ops.rotary.
  * AdaLN blocks with shared adaln projection + per-layer learned tables
    (AdaLNMixin, dit:844-1051), full-width q/k RMSNorm (dit:895-956 with
    YAML hidden_size_head == hidden_size), dual cross-attention over text
    and CLIP tokens summed (dit:1107-1203).
  * MLP: GELU(tanh) (dit:1295-1298), no gating for the released configs.
  * final layer: AdaLN-modulated LN + linear + unpatchify of video tokens
    only (FinalLayerMixin, dit:787-841, unpatchify dit:764-784).

Multi-query attention (num_multi_query_heads>0) is not used by any SCAIL
config and is not implemented.
"""

from __future__ import annotations

import dataclasses

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scail_tpu.models.common import (
    dense,
    dense_init,
    gelu_exact,
    gelu_tanh,
    normal_init,
    silu,
    timestep_embedding,
    xavier_uniform,
)
from scail_tpu.ops.attention import attention, resolve_impl
from scail_tpu.ops.norms import layer_norm, modulate, rms_norm
from scail_tpu.ops.rotary import apply_rotary, build_scail_rope
from scail_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS
from scail_tpu.parallel.sharding import PathRules
from scail_tpu.utils.registry import register


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    hidden_size: int = 5120
    num_layers: int = 40
    num_heads: int = 40
    inner_hidden_size: int = 13824
    in_channels: int = 20          # 16 latent + 4 mask channels
    out_channels: int = 16
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_dim: int = 4096
    time_freq_dim: int = 256
    time_embed_dim: int = 5120
    clip_dim: int = 1280
    clip_tokens: int = 257
    cfg_embed_dim: Optional[int] = None  # guidance-scale conditioning (dit:1538-1549)
    share_adaln: bool = True
    use_i2v_clip: bool = True
    qk_ln: bool = True
    qk_ln_affine: bool = True
    elementwise_affine: bool = False
    layernorm_epsilon: float = 1e-6
    interleaved_rope: bool = True
    rope_theta: float = 10000.0
    pose_w_offset: int = 120       # global_rope_W (dit:1571)
    num_experts: int = 1           # local MoE MLP (sat/model/transformer.py:257-297)
    moe_top_k: int = 2             # mixtral-style top-k routing
    dtype: str = "bfloat16"
    remat: bool = False            # rematerialize each layer in the scan
    # 'default': recompute everything (lowest memory).
    # 'save_attn': save the flash kernel's (out, lse) so the remat bwd skips
    #   re-running flash forward (~80% of layer FLOPs) at +~(S*h*2B)/layer.
    # 'offload_attn': same, but parked in host memory instead of HBM.
    # 'save_attn_frac': save_attn for the first remat_save_frac of the
    #   layers, full recompute for the rest -- buys most of save_attn's
    #   FLOP saving within a fixed HBM budget (full save_attn needs
    #   ~4.5GB extra at the 512p 1.3B geometry and misses one chip).
    #   Measured on v5e-16GB at that geometry (pre-split layer stack,
    #   split_layer_params): 0.7 -> 18.3s/step 47.3% MFU (best; 0.76+
    #   hits HBM-edge spill and regresses, 0.8+ OOMs) vs default
    #   19.9s/43.5%.
    remat_policy: str = "default"
    remat_save_frac: float = 0.7
    # shard the inter-layer hidden states (= the remat carries) over the
    # model axis too: 14B pod training's dominant live tensor is the
    # 40-layer carry stack (9.3 GB at seq=2), which otherwise replicates
    # the 5120-wide hidden on every TP chip.  XLA inserts the per-layer
    # all-gather at the qkv/mlp entry; off for inference (the gather is
    # pure overhead when memory fits).
    shard_activations: bool = False
    attn_impl: str = "auto"
    # attn_impl='sta' knobs: strip tiles of (sta_tile[0] latent frames,
    # sta_tile[1] latent rows, full width); clamped window in tiles.
    # Tiles must divide (T, Hp) of the geometry (ops/sta.py).  Defaults
    # measured best on v5e at 512p/21f (scripts/bench_sta.py): tile
    # (3,8) window (3,2) = 0.74x dense attention time (smaller tiles
    # are sparser but starve the MXU: (3,4)x(3,3) runs at 88 TF/s vs
    # 111 here).
    sta_tile: tuple = (3, 8)
    sta_window: tuple = (3, 2)
    # also window the half-res pose queries over video (pose tile
    # (it,ih) covers the same spatial region); ref queries and all
    # attention INTO ref stay dense
    sta_windowed_pose: bool = True
    # temporal window (in t-strips) for attention INTO the pose region
    # (0 = dense pose kv); pose conditioning is spatially local, so
    # distant-frame pose tokens carry no signal for a video token
    sta_pose_kv_window: int = 3

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def compute_dtype(self):
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                "float16": jnp.float16}[self.dtype]

    @staticmethod
    def from_network_config(params: dict, **overrides) -> "DiTConfig":
        """Map a reference `network_config.params` YAML block onto DiTConfig
        (configs/video_model/Wan2.1-i2v-14Bsc-pose-xc-latent.yaml:22-88)."""
        p = dict(params)
        modules = p.get("modules", {}) or {}
        adaln = dict(modules.get("adaln_layer_config", {}).get("params", {}) or {})
        pos = dict(modules.get("pos_embed_config", {}).get("params", {}) or {})
        kw = dict(
            hidden_size=p.get("hidden_size", 5120),
            num_layers=p.get("num_layers", 40),
            num_heads=p.get("num_attention_heads", 40),
            inner_hidden_size=p.get("inner_hidden_size") or p.get("hidden_size", 5120) * 4,
            in_channels=p.get("in_channels", 20),
            out_channels=p.get("out_channels", 16),
            patch_size=tuple(p.get("patch_size", (1, 2, 2))),
            text_dim=p.get("text_dim", 4096),
            time_freq_dim=p.get("time_freq_dim") or p.get("hidden_size", 5120),
            time_embed_dim=p.get("time_embed_dim") or p.get("hidden_size", 5120),
            share_adaln=p.get("share_adaln", False),
            use_i2v_clip=p.get("use_i2v_clip", False),
            clip_dim=p.get("clip_dim", 1280),
            cfg_embed_dim=p.get("cfg_embed_dim"),
            qk_ln=adaln.get("qk_ln", True),
            qk_ln_affine=adaln.get("qk_ln_affine", True),
            elementwise_affine=p.get("elementwise_affine", False),
            layernorm_epsilon=float(p.get("layernorm_epsilon", 1e-6)),
            interleaved_rope=pos.get("interleaved_rope", False),
            num_experts=p.get("num_experts", 1),
            moe_top_k=p.get("moe_top_k", 2),
            attn_impl=p.get("attn_impl", "auto"),
            remat=p.get("remat", False),
            remat_policy=p.get("remat_policy", "default"),
            remat_save_frac=p.get("remat_save_frac", 0.7),
            shard_activations=p.get("shard_activations", False),
            sta_tile=tuple(p.get("sta_tile", (3, 8))),
            sta_window=tuple(p.get("sta_window", (3, 2))),
            sta_windowed_pose=p.get("sta_windowed_pose", True),
            sta_pose_kv_window=p.get("sta_pose_kv_window", 3),
            dtype={"bf16": "bfloat16", "fp16": "float16", "fp32": "float32"}.get(
                p.get("dtype", "bf16"), p.get("dtype", "bfloat16")
            ),
        )
        assert p.get("num_multi_query_heads", 0) == 0, "MQA unsupported (unused by SCAIL)"
        assert not p.get("use_SwiGLU", False), "SCAIL configs use GELU-tanh MLPs"
        kw.update(overrides)
        return DiTConfig(**kw)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------
def init_dit_params(key, cfg: DiTConfig):
    h, inner, L = cfg.hidden_size, cfg.inner_hidden_size, cfg.num_layers
    te, hd = cfg.time_embed_dim, cfg.head_dim
    pt, ph, pw = cfg.patch_size
    patch_in = cfg.in_channels * pt * ph * pw
    patch_out = cfg.out_channels * pt * ph * pw
    keys = iter(jax.random.split(key, 64))

    def ln_affine(dim):
        return {"scale": jnp.ones((dim,), jnp.float32),
                "bias": jnp.zeros((dim,), jnp.float32)}

    params = {
        "patch_embed": {
            "proj": {"kernel": xavier_uniform(next(keys), (patch_in, h)),
                     "bias": jnp.zeros((h,), jnp.float32)},
            "proj_pose": {"kernel": xavier_uniform(next(keys), (patch_in, h)),
                          "bias": jnp.zeros((h,), jnp.float32)},
        },
        "time_embed": {
            "fc1": dense_init(next(keys), cfg.time_freq_dim, te),
            "fc2": dense_init(next(keys), te, te),
        },
        "text_embedding": {
            "fc1": dense_init(next(keys), cfg.text_dim, h),
            "fc2": dense_init(next(keys), h, h),
        },
        "final_layer": {
            "linear": {"kernel": xavier_uniform(next(keys), (h, patch_out)),
                       "bias": jnp.zeros((patch_out,), jnp.float32)},
        },
    }
    if cfg.share_adaln:
        params["adaln_projection"] = {"fc": dense_init(next(keys), te, 6 * h)}
        # final-layer table: randn/sqrt(h) (dit:813-816)
        params["final_layer"]["adaln"] = normal_init(next(keys), (2, h), std=h ** -0.5)
    else:
        params["final_layer"]["adaln_mlp"] = dense_init(next(keys), te, 2 * h, zero=True)
    if cfg.use_i2v_clip:
        params["clip_proj"] = {
            "ln_in": ln_affine(cfg.clip_dim),
            "fc1": dense_init(next(keys), cfg.clip_dim, cfg.clip_dim),
            "fc2": dense_init(next(keys), cfg.clip_dim, h),
            "ln_out": ln_affine(h),
        }
    if cfg.cfg_embed_dim:
        # guidance-scale embedding MLP, zero-init output (dit:1350-1355)
        params["cfg_embed"] = {
            "fc1": dense_init(next(keys), cfg.time_freq_dim, cfg.cfg_embed_dim),
            "fc2": dense_init(next(keys), cfg.cfg_embed_dim, cfg.cfg_embed_dim,
                              zero=True),
        }

    lp = {
        "qkv": dense_init(next(keys), h, 3 * h, prefix_shape=(L,)),
        "attn_out": dense_init(next(keys), h, h, prefix_shape=(L,)),
        "cross_q": dense_init(next(keys), h, h, prefix_shape=(L,)),
        "cross_kv": dense_init(next(keys), h, 2 * h, prefix_shape=(L,)),
        "cross_out": dense_init(next(keys), h, h, prefix_shape=(L,)),
        "mlp_in": dense_init(next(keys), h, inner, prefix_shape=(L,)),
        "mlp_out": dense_init(next(keys), inner, h, prefix_shape=(L,)),
    }
    if cfg.num_experts > 1:
        # stacked experts + router gate (sat/model/transformer.py:257-297);
        # the reference stores expert 0 under the base mlp names and experts
        # 1..E-1 under dense_h_to_4h_{i} — a converter stacks them onto the
        # (L, E, ...) expert axis here; mlp_in/mlp_out are replaced entirely
        E = cfg.num_experts
        del lp["mlp_in"], lp["mlp_out"]
        lp["moe_gate"] = dense_init(next(keys), h, E, bias=False,
                                    prefix_shape=(L,))
        lp["moe_in"] = dense_init(next(keys), h, inner, prefix_shape=(L, E))
        lp["moe_out"] = dense_init(next(keys), inner, h, prefix_shape=(L, E))
    if cfg.share_adaln:
        # per-layer tables: randn/sqrt(h) (dit:888-893)
        lp["adaln"] = normal_init(next(keys), (L, 6, h), std=h ** -0.5)
    else:
        lp["adaln_mlp"] = dense_init(next(keys), te, 6 * h, zero=True, prefix_shape=(L,))
    if cfg.qk_ln:
        ones = lambda: {"scale": jnp.ones((L, h), jnp.float32)}
        lp["q_norm"], lp["k_norm"] = ones(), ones()
        lp["cross_q_norm"], lp["cross_k_norm"] = ones(), ones()
        if cfg.use_i2v_clip:
            lp["clip_k_norm"] = ones()
    if cfg.use_i2v_clip:
        lp["clip_kv"] = dense_init(next(keys), h, 2 * h, prefix_shape=(L,))
    params["layers"] = lp
    return params


# ---------------------------------------------------------------------------
# Sharding rules: TP over 'model' (column = output dim, row = input dim),
# replacing sat/mpu/layers.py Column/RowParallelLinear.
# ---------------------------------------------------------------------------
def dit_param_rules() -> PathRules:
    # the optional (head|tail)_layers segment matches the pre-split
    # layout used by the save_attn_frac remat policy (split_layer_params)
    seg = r"layers/(?:(?:head|tail)_layers/)?"
    return PathRules([
        (seg + r"(qkv|cross_q|cross_kv|clip_kv|mlp_in)/kernel$", P(None, None, MODEL_AXIS)),
        (seg + r"(qkv|cross_q|cross_kv|clip_kv|mlp_in)/bias$", P(None, MODEL_AXIS)),
        (seg + r"(attn_out|cross_out|mlp_out)/kernel$", P(None, MODEL_AXIS, None)),
        # expert parallelism: experts shard over 'model' (EP; the reference
        # instead TP-shards each expert's inner dim — on TPU whole-expert
        # sharding keeps each expert matmul MXU-dense)
        (seg + r"(moe_in|moe_out)/kernel$", P(None, MODEL_AXIS, None, None)),
        (seg + r"(moe_in|moe_out)/bias$", P(None, MODEL_AXIS, None)),
    ])


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------
def _patchify_tokens(x, proj, patch_size):
    """(b, T, C, H, W) -> (b, T*(H/ph)*(W/pw), hidden) in (t h w) token order,
    exactly the stride==kernel conv3d of ImagePatchEmbeddingMixin (dit:104-124)."""
    pt, ph, pw = patch_size
    assert pt == 1, "temporal patching >1 not used by SCAIL configs"
    b, T, C, H, W = x.shape
    x = x.reshape(b, T, C, H // ph, ph, W // pw, pw)
    # token feature order must match torch conv weight flattening (c, kh, kw)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6).reshape(b, T * (H // ph) * (W // pw), C * ph * pw)
    return dense(proj, x)


def _unpatchify(x, T, Hp, Wp, patch_size, out_channels):
    """tokens (b, T*Hp*Wp, pt*ph*pw*c) -> (b, T, c, H, W); inverse of the
    final linear's (o p q c) output layout (dit:764-784)."""
    pt, ph, pw = patch_size
    b = x.shape[0]
    x = x.reshape(b, T, Hp, Wp, pt, ph, pw, out_channels)
    # -> (b, T*pt, c, Hp*ph, Wp*pw)
    x = x.transpose(0, 1, 4, 7, 2, 5, 3, 6)
    return x.reshape(b, T * pt, out_channels, Hp * ph, Wp * pw)


def _split_heads(x, n_heads):
    b, s, _ = x.shape
    return x.reshape(b, s, n_heads, -1)


def _merge_heads(x):
    b, s, n, d = x.shape
    return x.reshape(b, s, n * d)


def _rope_per_head(x, cos, sin, interleaved):
    # x: (b, s, n, d); cos/sin: (s, d)
    return apply_rotary(x, cos[None, :, None, :], sin[None, :, None, :], interleaved)


def _shard_tokens(x, mesh, shard_hidden: bool = False):
    if mesh is None:
        return x
    from jax.sharding import NamedSharding

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS,
                                 MODEL_AXIS if shard_hidden else None))
    )


def _mesh_rowwise_attn(fn, mesh, q, *kvs):
    """Run an attention call per-shard under a mesh: heads over 'model',
    q tokens over 'seq', kv gathered (replicated over 'seq').

    Exact for cross-attention (kv is short and replicated) AND as a
    fallback for self-attention (each shard computes its q rows against
    the full kv) — attention rows are independent.  Needed because the
    Pallas flash kernels are opaque custom calls the SPMD partitioner
    cannot split; without this the real-TPU multi-chip compile fails
    ("Mosaic kernels cannot be automatically partitioned") — caught by
    scripts/aot_14b_v5e8.py on the v5e-8 topology.  Falls back to the
    plain call when shapes don't divide the mesh.
    """
    if mesh is None:
        return fn(q, *kvs)
    d = mesh.shape.get(DATA_AXIS, 1)
    s = mesh.shape.get(SEQ_AXIS, 1)
    m = mesh.shape.get(MODEL_AXIS, 1)
    if d * s * m == 1:
        return fn(q, *kvs)
    if (q.shape[0] % d or q.shape[1] % s or q.shape[2] % m
            or any(t.shape[2] % m for t in kvs)):
        return fn(q, *kvs)
    qspec = P(DATA_AXIS, SEQ_AXIS, MODEL_AXIS, None)
    kvspec = P(DATA_AXIS, None, MODEL_AXIS, None)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(qspec,) + (kvspec,) * len(kvs),
        out_specs=qspec, check_vma=False)(q, *kvs)


def dit_forward(
    params,
    cfg: DiTConfig,
    x,                      # (b, T, 16, H, W) noisy latent, model dtype
    timesteps,              # (b,) c_noise (= sigma*1000 for RF)
    context,                # (b, S_txt, text_dim) text encoder states
    *,
    ref_concat,             # (b, 1, 16, H, W) reference-image latent
    concat_smpl_render,     # (b, T, 16, H/2, W/2) half-res pose latent
    image_clip_features: Optional[jnp.ndarray] = None,  # (b, 257, 1280)
    history_mask: Optional[jnp.ndarray] = None,          # (b, T, 4, H, W)
    cfg_scale=None,          # guidance-scale cond (needs cfg_embed_dim)
    h_shift: int = 0,
    w_shift: int = 0,       # sequence-parallel RoPE shifts (dit:1576-1585)
    mesh=None,
):
    """One DiT forward; returns the velocity prediction (b, T, 16, H, W).

    Mirrors DiffusionTransformer.forward (dit:1452-1587) + the transformer
    stack (sat/model/transformer.py:572-746 under AdaLNMixin hooks).
    """
    cdtype = cfg.compute_dtype
    eps = cfg.layernorm_epsilon
    b, T, c_lat, H, W = x.shape
    pt, ph, pw = cfg.patch_size
    Hp, Wp = H // ph, W // pw
    x = x.astype(cdtype)

    # channel-concat masks (dit:1462-1503)
    if history_mask is None:
        history_mask = jnp.zeros((b, T, 4, H, W), cdtype)
    x = jnp.concatenate([x, history_mask.astype(cdtype)], axis=2)
    ref = jnp.concatenate(
        [ref_concat.astype(cdtype), jnp.ones((b, 1, 4, H, W), cdtype)], axis=2
    )
    pose = jnp.concatenate(
        [concat_smpl_render.astype(cdtype),
         jnp.ones((b, T, 4, H // 2, W // 2), cdtype)], axis=2
    )

    # conditioning embeddings
    context = dense(params["text_embedding"]["fc2"],
                    gelu_tanh(dense(params["text_embedding"]["fc1"],
                                    context.astype(cdtype))))
    clip_tokens = None
    if cfg.use_i2v_clip:
        assert image_clip_features is not None
        cp = params["clip_proj"]
        y = layer_norm(image_clip_features.astype(cdtype),
                       cp["ln_in"]["scale"], cp["ln_in"]["bias"], eps=1e-5)
        y = gelu_exact(dense(cp["fc1"], y))
        y = dense(cp["fc2"], y)
        clip_tokens = layer_norm(y, cp["ln_out"]["scale"], cp["ln_out"]["bias"], eps=1e-5)

    # time embedding (dit:1521-1524); fp32 through the MLP like the reference
    # (linear layers created by sgm `linear` run in model dtype; we keep the
    # sinusoid fp32 then cast)
    t_emb = timestep_embedding(timesteps, cfg.time_freq_dim, dtype=cdtype)
    emb = dense(params["time_embed"]["fc2"],
                silu(dense(params["time_embed"]["fc1"], t_emb)))  # (b, te)
    if cfg.cfg_embed_dim and cfg_scale is not None:
        # guidance-scale conditioning for distilled models (dit:1538-1549)
        cs = jnp.broadcast_to(jnp.asarray(cfg_scale, jnp.float32).reshape(-1), (b,))
        cfg_emb = timestep_embedding(cs, cfg.time_freq_dim, dtype=cdtype)
        cfg_emb = dense(params["cfg_embed"]["fc2"],
                        silu(dense(params["cfg_embed"]["fc1"], cfg_emb)))
        emb = emb + cfg_emb

    if cfg.share_adaln:
        adaln_emb = dense(params["adaln_projection"]["fc"], silu(emb))  # (b, 6h)
        adaln_emb = adaln_emb.reshape(b, 6, cfg.hidden_size)

    # patch embed -> fused sequence [ref | video | pose] (dit:99-130)
    vid_tokens = _patchify_tokens(
        jnp.concatenate([ref, x], axis=1), params["patch_embed"]["proj"], cfg.patch_size
    )  # (b, (T+1)*Hp*Wp, h)
    pose_tokens = _patchify_tokens(pose, params["patch_embed"]["proj_pose"], cfg.patch_size)
    hidden = jnp.concatenate([vid_tokens, pose_tokens], axis=1)
    hidden = _shard_tokens(hidden, mesh, cfg.shard_activations)

    ref_len = Hp * Wp
    seq_len = T * Hp * Wp
    pose_len = T * (Hp // 2) * (Wp // 2)
    assert hidden.shape[1] == ref_len + seq_len + pose_len

    rope = build_scail_rope(
        cfg.head_dim, T, Hp, Wp,
        h_shift=h_shift, w_shift=w_shift,
        pose_w_offset=cfg.pose_w_offset,
        theta=cfg.rope_theta, interleaved=cfg.interleaved_rope,
    )

    # sta: keep the whole layer stack in the tile-major token layout --
    # one gather here + one inverse after the scan, instead of several
    # full-sequence gathers per layer inside the attention.  The RoPE
    # tables are row-permuted to match, which also collapses the
    # 3-segment apply into a single full-table apply (the per-segment
    # split is only about which table rows hold which regime).
    sta_resident = cfg.attn_impl == "sta"
    if sta_resident and (T % cfg.sta_tile[0] or Hp % cfg.sta_tile[1]):
        # e.g. RFSamplerLong tiles with a frame count the strip tile
        # doesn't divide: fall back to dense rather than assert deep in
        # the kernel (visible once per trace)
        print(f"[sta] tile {cfg.sta_tile} does not divide (T={T}, Hp={Hp}); "
              f"falling back to dense attention for this geometry")
        sta_resident = False
    self_impl = "auto" if (cfg.attn_impl == "sta" and not sta_resident) \
        else cfg.attn_impl
    sta_windowed_pose = cfg.sta_windowed_pose
    if sta_resident and sta_windowed_pose and (
            Wp % 2 or cfg.sta_tile[1] % 2
            or (cfg.sta_tile[0] * cfg.sta_tile[1] * Wp) % 32):
        print(f"[sta] windowed pose disabled: needs even Wp/tile_h and "
              f"ts % 32 == 0 (Wp={Wp}, tile={cfg.sta_tile}); pose "
              f"queries stay dense")
        sta_windowed_pose = False
    if sta_resident:
        from scail_tpu.ops.sta import sta_order

        _order, _inv = sta_order((T, Hp, Wp), ref_len, pose_len, cfg.sta_tile,
                                 windowed_pose=sta_windowed_pose)
        hidden = hidden[:, jnp.asarray(_order)]
        sta_cos = rope.cos[jnp.asarray(_order)]
        sta_sin = rope.sin[jnp.asarray(_order)]

    n_heads = cfg.num_heads

    # Dense single-shard self-attention on TPU: skip the XLA rotary
    # pre-pass and let the flash kernel rotate the q/k tiles in VMEM
    # (ops/attention.py fused-rope kernels; the per-segment table split in
    # _apply_scail_rope is contiguous, so the full fused table applies
    # identically).  Saves the q/k HBM round-trip per layer that the
    # reference's triton rotary kernels also paid.
    _mesh_trivial = mesh is None or all(
        int(v) == 1 for v in dict(mesh.shape).values())
    import os as _os

    # 'auto' impls resolve against the TARGET platform: the mesh's when
    # one is given (AOT lowering runs with a CPU default backend while
    # targeting a TPU topology — the production kernels must still win),
    # else the default backend's
    import numpy as _np

    _platform = (_np.asarray(mesh.devices).flat[0].platform
                 if mesh is not None else None)
    fused_rope_dense = (
        not sta_resident and cfg.attn_impl not in ("ulysses", "ring")
        and _mesh_trivial
        and resolve_impl(self_impl, hidden.shape[1], _platform) == "pallas"
        and not _os.environ.get("SCAIL_NO_FUSED_ROPE"))  # A/B escape hatch

    def layer_fn(hidden, lp):
        # AdaLN shift/scale/gate (dit:1020-1028)
        if cfg.share_adaln:
            mod = (adaln_emb + lp["adaln"][None].astype(adaln_emb.dtype))
        else:
            mod = dense(lp["adaln_mlp"], silu(emb)).reshape(b, 6, cfg.hidden_size)
        s_msa, sc_msa, g_msa = mod[:, 0:1], mod[:, 1:2], mod[:, 2:3]
        s_mlp, sc_mlp, g_mlp = mod[:, 3:4], mod[:, 4:5], mod[:, 5:6]

        # ---- self attention (dit:1030-1036, :1058-1105)
        ai = layer_norm(hidden, eps=eps)
        ai = modulate(ai, s_msa, sc_msa)
        qkv = dense(lp["qkv"], ai)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if cfg.qk_ln:
            # full-width RMS over the whole projection (see module docstring)
            q = rms_norm(q, lp["q_norm"]["scale"] if cfg.qk_ln_affine else None, eps=eps)
            k = rms_norm(k, lp["k_norm"]["scale"] if cfg.qk_ln_affine else None, eps=eps)
        q, k, v = (_split_heads(t, n_heads) for t in (q, k, v))
        if sta_resident:
            q = _rope_per_head(q, sta_cos, sta_sin, cfg.interleaved_rope)
            k = _rope_per_head(k, sta_cos, sta_sin, cfg.interleaved_rope)
        elif not fused_rope_dense:
            q = _apply_scail_rope(q, rope, ref_len, seq_len, pose_len, cfg.interleaved_rope)
            k = _apply_scail_rope(k, rope, ref_len, seq_len, pose_len, cfg.interleaved_rope)
        if cfg.attn_impl == "ulysses" and mesh is not None:
            # sequence-parallel full attention (sat/mpu/ulysses_attn_layer.py)
            from scail_tpu.parallel.ulysses import ulysses_attention

            attn = ulysses_attention(q, k, v, mesh, impl="auto")
        elif cfg.attn_impl == "ring" and mesh is not None:
            # beyond-reference: KV ppermute ring over 'seq' — for seq
            # shards beyond the head count, where Ulysses cannot go
            from scail_tpu.parallel.ring import ring_attention

            attn = ring_attention(q, k, v, mesh)
        elif sta_resident:
            # opt-in sliding-tile sparse sampling mode (ops/sta.py);
            # ref+pose streams stay dense, video attends a clamped
            # (t, h)-strip tile window; tokens are already tile-major
            from scail_tpu.ops.sta import sta_attention

            def _sta(q, k, v):
                return sta_attention(
                    q, k, v, grid_thw=(T, Hp, Wp), ref_len=ref_len,
                    pose_len=pose_len, tile=cfg.sta_tile,
                    window=cfg.sta_window, pre_tiled=True,
                    windowed_pose=sta_windowed_pose,
                    pose_kv_window=cfg.sta_pose_kv_window)

            if mesh is not None and mesh.shape.get(SEQ_AXIS, 1) > 1:
                # sequence-parallel STA: the Ulysses head scatter gives
                # each shard the FULL (tile-major) sequence for its head
                # subset, so the windowed kernel runs unchanged inside
                from scail_tpu.parallel.ulysses import ulysses_attention

                attn = ulysses_attention(q, k, v, mesh, attn_fn=_sta)
            elif mesh is not None and mesh.shape.get(MODEL_AXIS, 1) > 1:
                # TP composition: heads are embarrassingly parallel in
                # the kernel, so run per-shard over the model axis (the
                # SPMD partitioner cannot split a bare pallas_call)
                from jax.experimental.shard_map import shard_map

                spec = P(None, None, MODEL_AXIS, None)
                attn = shard_map(
                    _sta, mesh=mesh, in_specs=(spec, spec, spec),
                    out_specs=spec, check_rep=False)(q, k, v)
            else:
                attn = _sta(q, k, v)
        elif fused_rope_dense:
            attn = attention(q, k, v, impl="pallas",
                             rope=(rope.cos, rope.sin),
                             rope_interleaved=cfg.interleaved_rope)
        else:
            attn = _mesh_rowwise_attn(
                lambda a, bb, c: attention(a, bb, c, impl=self_impl,
                                           platform=_platform),
                mesh, q, k, v)
        attn = dense(lp["attn_out"], _merge_heads(attn))
        hidden = hidden + g_msa * attn
        hidden = _shard_tokens(hidden, mesh, cfg.shard_activations)

        # ---- dual cross attention, no adaln modulation/gate (dit:1038-1042)
        ci = layer_norm(hidden, eps=eps)
        cq = dense(lp["cross_q"], ci)
        kv_txt = dense(lp["cross_kv"], context)
        ck, cv = jnp.split(kv_txt, 2, axis=-1)
        if cfg.qk_ln:
            cq = rms_norm(cq, lp["cross_q_norm"]["scale"] if cfg.qk_ln_affine else None, eps=eps)
            ck = rms_norm(ck, lp["cross_k_norm"]["scale"] if cfg.qk_ln_affine else None, eps=eps)
        cqh = _split_heads(cq, n_heads)
        # cross attention has short replicated KV: plain SPMD attention even
        # under Ulysses (the reference also keeps cross-attn un-Ulyssed);
        # same under STA -- 'sta' is a SELF-attention impl, and letting it
        # fall through here picked the XLA reference path with a
        # materialized f32 logit tensor (3.7GB at 14B)
        cross_impl = ("auto" if cfg.attn_impl in ("ulysses", "ring", "sta",
                                                  "pallas_int8")
                      else cfg.attn_impl)
        if cfg.use_i2v_clip:
            # text and CLIP streams share q and their results are summed
            # (dit:1159-1197) -- fused into one kernel on TPU
            kv_clip = dense(lp["clip_kv"], clip_tokens)
            pk, pv = jnp.split(kv_clip, 2, axis=-1)
            if cfg.qk_ln:
                pk = rms_norm(pk, lp["clip_k_norm"]["scale"] if cfg.qk_ln_affine else None, eps=eps)
            from scail_tpu.ops.attention import dual_cross_attention

            cross = _mesh_rowwise_attn(
                lambda qq, k1, v1, k2, v2: dual_cross_attention(
                    qq, k1, v1, k2, v2, impl=cross_impl,
                    platform=_platform),
                mesh, cqh,
                _split_heads(ck, n_heads), _split_heads(cv, n_heads),
                _split_heads(pk, n_heads), _split_heads(pv, n_heads),
            )
        else:
            cross = _mesh_rowwise_attn(
                lambda qq, kk, vv: attention(qq, kk, vv, impl=cross_impl,
                                             platform=_platform),
                mesh, cqh, _split_heads(ck, n_heads),
                _split_heads(cv, n_heads))
        hidden = hidden + dense(lp["cross_out"], _merge_heads(cross))

        # ---- MLP (dit:1044-1050); MoE dispatch when num_experts > 1
        # (sat/transformer_defaults.py:163-209)
        mi = layer_norm(hidden, eps=eps)
        mi = modulate(mi, s_mlp, sc_mlp)
        if cfg.num_experts > 1:
            from scail_tpu.ops.moe import moe_mlp

            mo = moe_mlp(mi, lp["moe_gate"], lp["moe_in"], lp["moe_out"],
                         top_k=cfg.moe_top_k, act=gelu_tanh)
        else:
            mo = dense(lp["mlp_out"], gelu_tanh(dense(lp["mlp_in"], mi)))
        hidden = hidden + g_mlp * mo
        hidden = _shard_tokens(hidden, mesh, cfg.shard_activations)
        return hidden, None

    if cfg.remat:
        if cfg.remat_policy in ("save_attn", "save_attn_frac"):
            policy = jax.checkpoint_policies.save_only_these_names(
                "flash_out", "flash_lse")
            body = jax.checkpoint(layer_fn, policy=policy)
        elif cfg.remat_policy == "offload_attn":
            policy = jax.checkpoint_policies.save_and_offload_only_these_names(
                names_which_can_be_saved=[],
                names_which_can_be_offloaded=["flash_out", "flash_lse"],
                offload_src="device", offload_dst="pinned_host")
            body = jax.checkpoint(layer_fn, policy=policy)
        else:
            body = jax.checkpoint(layer_fn)
    else:
        body = layer_fn
    # cast float leaves only (int8/uint8 quantized kernels keep their dtype)
    layer_params = jax.tree.map(
        lambda p: p.astype(cdtype) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params["layers"],
    )
    if cfg.remat and cfg.remat_policy == "save_attn_frac":
        # two scans: save-attn remat for the first k layers, full-recompute
        # remat for the rest.  In-graph slicing of the stacked layer stack
        # would MATERIALIZE head/tail copies next to the live originals
        # (+2x layer params HBM, measured +2.6GB at 1.3B); trainers should
        # pre-split with split_layer_params() outside jit, which this
        # consumes as-is.
        if isinstance(layer_params, dict) and "head_layers" in layer_params:
            k = jax.tree.leaves(layer_params["head_layers"])[0].shape[0]
            head_p, tail_p = (layer_params["head_layers"],
                              layer_params["tail_layers"])
        else:
            k = save_attn_head_layers(cfg)
            head_p = jax.tree.map(lambda p: p[:k], layer_params)
            tail_p = jax.tree.map(lambda p: p[k:], layer_params)
        if k:
            hidden, _ = jax.lax.scan(body, hidden, head_p)
        if k < cfg.num_layers:
            hidden, _ = jax.lax.scan(jax.checkpoint(layer_fn), hidden, tail_p)
    else:
        hidden, _ = jax.lax.scan(body, hidden, layer_params)

    if sta_resident:
        hidden = hidden[:, jnp.asarray(_inv)]

    # ---- final layer (dit:818-835)
    fl = params["final_layer"]
    if cfg.share_adaln:
        fmod = emb[:, None, :] + fl["adaln"][None].astype(emb.dtype)  # (b, 2, h)
    else:
        fmod = dense(fl["adaln_mlp"], silu(emb)).reshape(b, 2, cfg.hidden_size)
    shift, scale = fmod[:, 0:1], fmod[:, 1:2]
    out = modulate(layer_norm(hidden, eps=eps), shift, scale)
    out = dense(fl["linear"], out)
    out = out[:, ref_len : ref_len + seq_len]
    return _unpatchify(out, T, Hp, Wp, cfg.patch_size, cfg.out_channels)


def save_attn_head_layers(cfg: DiTConfig) -> int:
    """Number of leading layers the save_attn_frac policy keeps flash
    state for."""
    return max(0, min(cfg.num_layers,
                      int(cfg.num_layers * cfg.remat_save_frac)))


def split_layer_params(params, cfg: DiTConfig):
    """Restructure params['layers'] (stacked (L, ...) leaves) into
    {'head_layers': (k, ...), 'tail_layers': (L-k, ...)} for the
    save_attn_frac remat policy.  Call OUTSIDE jit (once, at trainer
    startup) so the split buffers replace the stacked ones instead of
    coexisting with them; init optimizer state after this so its tree
    matches."""
    k = save_attn_head_layers(cfg)
    out = dict(params)
    out["layers"] = {
        "head_layers": jax.tree.map(lambda p: p[:k], params["layers"]),
        "tail_layers": jax.tree.map(lambda p: p[k:], params["layers"]),
    }
    return out


def unsplit_layer_params(params):
    """Inverse of split_layer_params (for checkpoint export)."""
    if not (isinstance(params.get("layers"), dict)
            and "head_layers" in params["layers"]):
        return params
    out = dict(params)
    out["layers"] = jax.tree.map(
        lambda h, t: jnp.concatenate([h, t], axis=0),
        params["layers"]["head_layers"], params["layers"]["tail_layers"])
    return out


def _apply_scail_rope(t, rope, ref_len, seq_len, pose_len, interleaved):
    """Apply the per-segment rotary to (b, s, n, d) (dit:668-746)."""
    tr = _rope_per_head(t[:, :ref_len], rope.cos[:ref_len], rope.sin[:ref_len], interleaved)
    tv = _rope_per_head(
        t[:, ref_len : ref_len + seq_len],
        rope.cos[ref_len : ref_len + seq_len],
        rope.sin[ref_len : ref_len + seq_len],
        interleaved,
    )
    tp = _rope_per_head(
        t[:, ref_len + seq_len :],
        rope.cos[ref_len + seq_len :],
        rope.sin[ref_len + seq_len :],
        interleaved,
    )
    return jnp.concatenate([tr, tv, tp], axis=1)


@register(alias="dit_video_crossattn_sc_xc.DiffusionTransformer")
class DiffusionTransformer:
    """Config-driven wrapper so `instantiate_from_config` on reference YAML
    yields a (config, init, apply) bundle."""

    def __init__(self, **network_params):
        targs = dict(network_params.get("transformer_args", {}) or {})
        # strip reference-only plumbing keys
        for k in ("transformer_args", "num_frames", "time_compressed_rate",
                  "latent_width", "latent_height", "use_RMSNorm", "parallel_output"):
            network_params.pop(k, None)
        self.config = DiTConfig.from_network_config(
            network_params,
            remat=bool(targs.get("checkpoint_activations", False)),
        )

    def init(self, key):
        return init_dit_params(key, self.config)

    def apply(self, params, *args, **kwargs):
        return dit_forward(params, self.config, *args, **kwargs)

    def param_rules(self) -> PathRules:
        return dit_param_rules()
