"""FVD between two sets of videos (reference: eval/calculate_fvd.py).

The reference extracts I3D features with two backbones (videogpt
`i3d_pretrained_400.pt` and the styleganv torchscript module,
eval/calculate_fvd.py:14-21) and computes the Frechet distance.  The I3D
weights are external downloads; feature extraction is gated on their
presence (torch CPU runs the torchscript module).  The Frechet math and the
video preprocessing (resize to 224, [0,1] -> I3D range) are weight-free and
always available.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from scail_tpu.evals.frechet import frechet_from_features


def preprocess_for_i3d(videos01: np.ndarray, size: int = 224) -> np.ndarray:
    """(B, T, H, W, 3) in [0,1] -> (B, 3, T, size, size) in [-1, 1]."""
    import jax.numpy as jnp

    from scail_tpu.ops.resize import resize_bilinear

    v = np.asarray(videos01, np.float32).transpose(0, 1, 4, 2, 3)  # bt chw
    b, t = v.shape[:2]
    v = np.asarray(resize_bilinear(jnp.asarray(v.reshape(b * t, *v.shape[2:])),
                                   size, size))
    v = v.reshape(b, t, 3, size, size).transpose(0, 2, 1, 3, 4)
    return v * 2.0 - 1.0


class I3DFeatureExtractor:
    """I3D 400-d FVD features, JAX extractor by default.

    - weights_path to `i3d_pretrained_400.pt` (the videogpt state dict,
      eval/fvd/videogpt/fvd.py:8-19): converted and run in JAX.
    - weights_path to a torchscript `i3d_torchscript.pt` (styleganv
      flavour): run through torch on CPU.
    - weights_path=None: random-init smoke mode (full pipeline runs
      end-to-end without external downloads; distances are meaningful
      only relatively, for harness testing).
    """

    def __init__(self, weights_path: Optional[str] = None, batch: int = 4,
                 size: int = 224):
        import jax

        from scail_tpu.evals.i3d import (i3d_logits, init_i3d_params,
                                         load_i3d_params)

        self.batch = batch
        self.size = size
        self._ts_model = None
        if weights_path is None:
            self.params = init_i3d_params(jax.random.PRNGKey(0))
        elif weights_path.endswith("torchscript.pt"):
            import torch

            self._ts_model = torch.jit.load(weights_path).eval()
        else:
            if not os.path.exists(weights_path):
                raise FileNotFoundError(
                    f"I3D weights not found at {weights_path}; download "
                    "i3d_pretrained_400.pt (eval/fvd/videogpt/fvd.py:8-14)")
            self.params = load_i3d_params(weights_path)
        if self._ts_model is None:
            self._fn = jax.jit(i3d_logits)

    def __call__(self, videos01: np.ndarray, batch: Optional[int] = None) -> np.ndarray:
        batch = batch or self.batch
        x = preprocess_for_i3d(videos01, size=self.size)
        feats = []
        for i in range(0, x.shape[0], batch):
            chunk = x[i : i + batch]
            if self._ts_model is not None:
                import torch

                kwargs = dict(rescale=False, resize=False, return_features=True)
                with torch.no_grad():
                    feats.append(self._ts_model(torch.tensor(chunk), **kwargs).numpy())
            else:
                feats.append(np.asarray(self._fn(self.params, chunk)))
        return np.concatenate(feats)


def compute_fvd(real_videos01: np.ndarray, fake_videos01: np.ndarray,
                i3d_path: Optional[str] = None,
                features: Optional[tuple] = None,
                i3d_size: int = 224) -> float:
    """Either pass raw videos (+ optional i3d weights; random-init smoke
    mode without them), or precomputed (real, fake) feature arrays."""
    if features is not None:
        return frechet_from_features(features[0], features[1])
    extractor = I3DFeatureExtractor(i3d_path, size=i3d_size)
    return frechet_from_features(extractor(real_videos01), extractor(fake_videos01))


def load_video_dir(path: str, max_videos: Optional[int] = None) -> List[np.ndarray]:
    """Read every video file in a directory -> list of (T, H, W, 3) in [0,1]
    (reference dataset: eval/calculate_fvd.py:24-80)."""
    from scail_tpu.data.video import load_video_frames

    names = sorted(
        f for f in os.listdir(path)
        if f.endswith((".mp4", ".gif", ".npz", ".npy")))
    if max_videos:
        names = names[:max_videos]
    out = []
    for n in names:
        frames, _ = load_video_frames(os.path.join(path, n))
        out.append(frames.astype(np.float32) / 255.0)
    return out
