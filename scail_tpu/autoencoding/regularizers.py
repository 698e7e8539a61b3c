"""Latent regularizers for autoencoder training: diagonal-Gaussian KL,
vector quantization (plain + EMA codebook), and lookup-free quantization.

Functional ports of the reference's regularizer zoo
(sgm/modules/autoencoding/regularizers/__init__.py:13-31 KL,
regularizers/quantize.py:172-320 VQ, :323-445 EMA-VQ,
regularizers/lookup_free_quantization.py:53-302 LFQ); math golden-tested
against the actual torch modules (tests/test_autoencoding.py).

Conventions: latents are channels-LAST (..., c) everywhere (the repo's
native layout); the torch originals are channels-first and permute
internally, so the math lines up 1:1.  All functions are pure; EMA-VQ
returns its updated codebook state instead of mutating buffers.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Diagonal Gaussian (KL) -- regularizers/__init__.py:13-31 +
# sgm/modules/distributions/distributions.py:24-60
# ---------------------------------------------------------------------------
def diagonal_gaussian_regularizer(z, key=None, *, sample: bool = True):
    """z: (..., 2c) moments (mean ‖ logvar on the last axis).  Returns
    (latent (..., c), {'kl_loss': scalar}).  logvar clamped to [-30, 20]
    like DiagonalGaussianDistribution (distributions.py:28); kl summed
    over non-batch dims then averaged over batch (regularizers
    __init__.py:28-29)."""
    mean, logvar = jnp.split(z, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    if sample:
        assert key is not None, "sampling regularizer needs a PRNG key"
        std = jnp.exp(0.5 * logvar)
        out = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    else:
        out = mean
    var = jnp.exp(logvar)
    kl_per_item = 0.5 * jnp.sum(
        (mean.astype(jnp.float32) ** 2) + var.astype(jnp.float32)
        - 1.0 - logvar.astype(jnp.float32),
        axis=tuple(range(1, mean.ndim)))
    kl = jnp.sum(kl_per_item) / z.shape[0]
    return out, {"kl_loss": kl}


def identity_regularizer(z, key=None):
    """regularizers/base.py:21-26."""
    return z, {}


def measure_perplexity(indices, num_centroids: int):
    """regularizers/base.py:29-40: codebook usage perplexity + count."""
    onehot = jax.nn.one_hot(indices.reshape(-1), num_centroids,
                            dtype=jnp.float32)
    avg = onehot.mean(axis=0)
    perplexity = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))
    cluster_use = jnp.sum(avg > 0)
    return perplexity, cluster_use


# ---------------------------------------------------------------------------
# Vector quantization -- quantize.py:172-320
# ---------------------------------------------------------------------------
def init_vector_quantizer(key, n_e: int, e_dim: int) -> Dict:
    """Codebook init U(-1/n_e, 1/n_e) (quantize.py:204)."""
    emb = jax.random.uniform(key, (n_e, e_dim), jnp.float32,
                             -1.0 / n_e, 1.0 / n_e)
    return {"embedding": emb}


def _nearest_code(zf, emb):
    """(N, d) x (n, d) -> argmin_j ||z - e_j||^2 via the expanded form
    (quantize.py:250-259)."""
    d = (jnp.sum(zf ** 2, axis=1, keepdims=True)
         + jnp.sum(emb ** 2, axis=1)[None, :]
         - 2.0 * zf @ emb.T)
    return jnp.argmin(d, axis=1)


def vector_quantize(params, z, *, beta: float = 0.25,
                    log_perplexity: bool = False):
    """z: (..., e_dim) channels-last.  Returns (z_q (straight-through),
    log dict with 'loss/vq' and 'min_encoding_indices').

    loss = beta * mean((sg[z_q] - z)^2) + mean((z_q - sg[z])^2)
    (quantize.py:269-271); gradients pass straight through the codebook
    lookup (quantize.py:275)."""
    emb = params["embedding"]
    zf = z.reshape(-1, emb.shape[1]).astype(jnp.float32)
    idx = _nearest_code(zf, emb)
    z_q = emb[idx].reshape(z.shape).astype(z.dtype)
    loss = (beta * jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
            + jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2))
    log = {"loss/vq": loss,
           "min_encoding_indices": idx.reshape(z.shape[:-1])}
    if log_perplexity:
        p, c = measure_perplexity(idx, emb.shape[0])
        log.update({"perplexity": p, "cluster_usage": c})
    z_q = z + jax.lax.stop_gradient(z_q - z)
    return z_q, log


# ---------------------------------------------------------------------------
# EMA vector quantization -- quantize.py:323-445
# ---------------------------------------------------------------------------
def init_ema_quantizer(key, n_embed: int, embedding_dim: int) -> Dict:
    """EmbeddingEMA state (quantize.py:323-332): weight, cluster_size,
    embed_avg.  All non-trainable (updated by EMA, not SGD)."""
    w = jax.random.normal(key, (n_embed, embedding_dim), jnp.float32)
    return {"weight": w, "cluster_size": jnp.zeros((n_embed,), jnp.float32),
            "embed_avg": w.copy()}


def ema_vector_quantize(state, z, *, beta: float, decay: float = 0.99,
                        eps: float = 1e-5, update: bool = True):
    """z: (..., d).  Returns (z_q, log, new_state).  EMA codebook update
    (quantize.py:416-425) followed by the Laplace-smoothed weight
    normalization (quantize.py:345-352); loss = beta*mse(sg[z_q], z)."""
    w = state["weight"]
    n, d = w.shape
    zf = z.reshape(-1, d).astype(jnp.float32)
    idx = _nearest_code(zf, w)
    z_q = w[idx].reshape(z.shape).astype(z.dtype)
    onehot = jax.nn.one_hot(idx, n, dtype=jnp.float32)
    avg_probs = onehot.mean(axis=0)
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

    new_state = state
    if update:
        cluster = state["cluster_size"] * decay + onehot.sum(0) * (1 - decay)
        embed_avg = state["embed_avg"] * decay + (onehot.T @ zf) * (1 - decay)
        tot = cluster.sum()
        smoothed = (cluster + eps) / (tot + n * eps) * tot
        new_w = embed_avg / smoothed[:, None]
        new_state = {"weight": new_w, "cluster_size": cluster,
                     "embed_avg": embed_avg}

    loss = beta * jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
    z_q = z + jax.lax.stop_gradient(z_q - z)
    log = {"loss/vq": loss, "encoding_indices": idx,
           "perplexity": perplexity}
    return z_q, log, new_state


# ---------------------------------------------------------------------------
# Lookup-free quantization -- lookup_free_quantization.py:53-302
# (MagViT-2, arXiv:2310.05737): each latent dim quantizes to {-1,+1};
# entropy aux loss encourages confident, uniformly-used codes.
# ---------------------------------------------------------------------------
def init_lfq(key, *, dim: Optional[int] = None,
             codebook_size: Optional[int] = None,
             num_codebooks: int = 1) -> Dict:
    """Optional in/out projections when dim != log2(codebook_size) *
    num_codebooks (lookup_free_quantization.py:81-84)."""
    assert dim is not None or codebook_size is not None
    codebook_size = codebook_size if codebook_size is not None else 2 ** dim
    codebook_dim = int(math.log2(codebook_size))
    assert 2 ** codebook_dim == codebook_size, "codebook size must be 2^k"
    codebook_dims = codebook_dim * num_codebooks
    dim = dim if dim is not None else codebook_dims
    params = {}
    if dim != codebook_dims:
        k1, k2 = jax.random.split(key)
        s1 = 1.0 / math.sqrt(dim)
        s2 = 1.0 / math.sqrt(codebook_dims)
        params["project_in"] = {
            "kernel": jax.random.uniform(k1, (dim, codebook_dims),
                                         jnp.float32, -s1, s1),
            "bias": jnp.zeros((codebook_dims,), jnp.float32)}
        params["project_out"] = {
            "kernel": jax.random.uniform(k2, (codebook_dims, dim),
                                         jnp.float32, -s2, s2),
            "bias": jnp.zeros((dim,), jnp.float32)}
    return params


def _lfq_entropy(prob):
    return jnp.sum(-prob * jnp.log(jnp.clip(prob, 1e-5, None)), axis=-1)


def lfq_quantize(params, x, *, codebook_size: int, num_codebooks: int = 1,
                 codebook_scale: float = 1.0, inv_temperature: float = 100.0,
                 diversity_gamma: float = 1.0,
                 entropy_loss_weight: float = 0.1,
                 commitment_loss_weight: float = 0.25,
                 training: bool = True):
    """x: (..., dim) channels-last.  Returns (quantized, indices,
    aux_loss, breakdown dict).

    quantize: sign(x) * scale with straight-through grads
    (lookup_free_quantization.py:199-212); entropy aux: per-sample
    entropy low + batch codebook entropy high (:218-255); commit:
    mse(x, sg[quantized]) (:260-268).
    """
    codebook_dim = int(math.log2(codebook_size))
    in_shape = x.shape
    x = x.astype(jnp.float32)
    if "project_in" in params:
        x = x @ params["project_in"]["kernel"] + params["project_in"]["bias"]
    x = x.reshape(*x.shape[:-1], num_codebooks, codebook_dim)
    original_input = x

    quantized = jnp.where(x > 0, codebook_scale, -codebook_scale)
    if training:
        x = x + jax.lax.stop_gradient(quantized - x)
    else:
        x = quantized

    mask_np = 2 ** np.arange(codebook_dim - 1, -1, -1, dtype=np.int64)
    indices = jnp.sum((x > 0).astype(jnp.int32)
                      * jnp.asarray(mask_np, jnp.int32), axis=-1)

    if training:
        # codebook of all 2^d sign patterns (:121-125); mask stays a
        # host array so the quantizer traces under jit
        all_codes = np.arange(codebook_size)
        bits = ((all_codes[:, None] & mask_np) != 0).astype(np.float32)
        codebook = jnp.asarray(bits * codebook_scale * 2 - codebook_scale)
        distance = -2.0 * jnp.einsum("...id,jd->...ij", original_input,
                                     codebook)
        prob = jax.nn.softmax(-distance * inv_temperature, axis=-1)
        prob_flat = prob.reshape(-1, num_codebooks, codebook_size)
        per_sample_entropy = _lfq_entropy(prob_flat).mean()
        avg_prob = prob_flat.mean(axis=0)
        codebook_entropy = _lfq_entropy(avg_prob).mean()
        entropy_aux = per_sample_entropy - diversity_gamma * codebook_entropy
        commit = jnp.mean((original_input
                           - jax.lax.stop_gradient(quantized)) ** 2)
    else:
        entropy_aux = per_sample_entropy = codebook_entropy = jnp.zeros(())
        commit = jnp.zeros(())

    x = x.reshape(*x.shape[:-2], num_codebooks * codebook_dim)
    if "project_out" in params:
        x = x @ params["project_out"]["kernel"] + params["project_out"]["bias"]
    x = x.reshape(in_shape)
    if num_codebooks == 1:
        indices = indices[..., 0]

    aux_loss = (entropy_aux * entropy_loss_weight
                + commit * commitment_loss_weight)
    breakdown = {"per_sample_entropy": per_sample_entropy,
                 "batch_entropy": codebook_entropy, "commitment": commit}
    return x, indices, aux_loss, breakdown
