"""SCAIL-TPU: a TPU-native JAX framework for pose-conditioned character-animation
video diffusion, with the capabilities of zai-org/SCAIL.

The reference stack (SCAIL @ /root/reference, built on SwissArmyTransformer +
sgm) is CUDA/torch; this package is a ground-up reimplementation designed for
TPU: functional models over parameter pytrees, `jax.jit`-compiled sampling
loops (`lax.scan`), SPMD parallelism over a `jax.sharding.Mesh`
('data','seq','model'), and Pallas kernels for the hot paths.

Layer map (mirrors SURVEY.md section 1):
  scail_tpu.parallel   <- sat/mpu (process groups, TP/SP)  [mesh + shardings]
  scail_tpu.ops        <- sat/ops + triton kernels          [Pallas + XLA ops]
  scail_tpu.models     <- dit_video_crossattn_sc_xc.py, sgm encoders/VAE
  scail_tpu.diffusion  <- sgm/modules/diffusionmodules      [denoiser/sampler/loss]
  scail_tpu.engine     <- diffusion_video.SATVideoDiffusionEngine
  scail_tpu.training   <- sat/training                      [train loop, ckpt, EMA]
  scail_tpu.cli        <- sample_video.py / arguments.py
"""

__version__ = "0.1.0"

from scail_tpu.utils.registry import instantiate_from_config, register  # noqa: F401
