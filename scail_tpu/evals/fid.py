"""FID (reference: eval/eval_fid.py, EDM-style).

`ref` mode builds (mu, cov) stats over a directory of images into an .npz;
`calc` mode compares generated images against stored stats.  The InceptionV3
feature extractor is an external torchscript download (eval/eval_fid.py uses
the EDM detector); extraction is gated on its presence.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from scail_tpu.evals.frechet import feature_stats, frechet_distance


class InceptionFeatureExtractor:
    """2048-d FID features.

    - weights_path to a pytorch-fid `pt_inception-2015-12-05*.pth` state
      dict: converted and run by the JAX InceptionV3 (evals/inception.py).
    - weights_path to an EDM torchscript/pkl: run through torch on CPU.
    - weights_path=None: random-init JAX smoke mode (harness runs without
      external downloads).
    """

    def __init__(self, weights_path: Optional[str] = None, batch: int = 16):
        import jax

        from scail_tpu.evals.inception import (inception_features,
                                               init_inception_params,
                                               load_inception_params)

        self.batch = batch
        self._ts_model = None
        if weights_path is None:
            self.params = init_inception_params(jax.random.PRNGKey(0))
        elif weights_path.endswith((".pkl", "torchscript.pt")):
            import torch

            self.model = torch.jit.load(weights_path).eval()
            self._ts_model = self.model
        else:
            if not os.path.exists(weights_path):
                raise FileNotFoundError(
                    f"inception weights not found at {weights_path} "
                    "(pt_inception-2015-12-05*.pth or EDM torchscript)")
            self.params = load_inception_params(weights_path)
        if self._ts_model is None:
            self._fn = jax.jit(inception_features)

    def __call__(self, images_u8: np.ndarray, batch: Optional[int] = None) -> np.ndarray:
        batch = batch or self.batch
        feats = []
        for i in range(0, images_u8.shape[0], batch):
            xb = images_u8[i : i + batch]
            if self._ts_model is not None:
                import torch

                with torch.no_grad():
                    t = torch.tensor(xb).permute(0, 3, 1, 2)
                    feats.append(self._ts_model(t, return_features=True).numpy())
            else:
                x = np.asarray(xb, np.float32).transpose(0, 3, 1, 2) / 255.0
                feats.append(np.asarray(self._fn(self.params, x)))
        return np.concatenate(feats)


def save_ref_stats(features: np.ndarray, out_path: str):
    mu, cov = feature_stats(features)
    np.savez(out_path, mu=mu, sigma=cov)


def fid_from_stats(features: np.ndarray, ref_stats_path: str) -> float:
    ref = np.load(ref_stats_path)
    mu, cov = feature_stats(features)
    return frechet_distance(mu, cov, ref["mu"], ref["sigma"])
