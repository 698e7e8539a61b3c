"""Image tokenizer: discrete codes through a VQ first stage (reference:
sat/tokenization/cogview/vqvae_tokenizer.py).

The reference wraps its CogView VQVAE; here any autoencoding.vqgan
VQModel/MOVQ serves as the codec — EncodeAsIds flattens the code grid
per image, DecodeIds reshapes (inferring a square grid like the
reference's sqrt_int) and decodes.  Channels-last images (b, h, w, 3).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


def sqrt_int(x: int) -> int:
    r = int(math.sqrt(x) + 1e-4)
    assert r * r == x, f"{x} is not a perfect square"
    return r


class ImageTokenizer:
    # CogView channel statistics (vqvae_tokenizer.py:52)
    MEAN = np.asarray([0.79093, 0.76271, 0.75340], np.float32)
    STD = np.asarray([0.30379, 0.32279, 0.32800], np.float32)

    def __init__(self, model, params):
        """model: a VQModel/MOVQ shell; params: its weight tree."""
        self.model = model
        self.params = params
        self.num_tokens = model.n_embed
        self.image_tokens = model.n_embed

    def __len__(self):
        return self.num_tokens

    def normalize(self, img):
        return (img - self.MEAN) / self.STD

    def EncodeAsIds(self, img, add_normalization: bool = False):
        """img (b, h, w, 3) -> (b, h'*w') int codes
        (vqvae_tokenizer.py:57-61)."""
        assert img.ndim == 4
        if add_normalization:
            img = self.normalize(img)
        _, _, idx = self.model.encode(self.params, img)
        return idx.reshape(img.shape[0], -1)

    def DecodeIds(self, code, shape: Optional[tuple] = None):
        """codes -> (b, h, w, 3) reconstruction (vqvae_tokenizer.py:63-72);
        shape=None infers a single square grid."""
        code = jnp.asarray(code)
        if shape is None:
            s = sqrt_int(int(np.prod(code.shape)))
            shape = (1, s, s)
        return self.model.decode_code(self.params, code.reshape(shape))
