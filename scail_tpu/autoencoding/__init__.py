"""VAE training stack: regularizers (KL/VQ/LFQ), GAN discriminators and
losses, and the functional AutoencodingEngine equivalent.

TPU-native counterpart of the reference's autoencoder-training surface
(sgm/models/autoencoder.py:109-443, sgm/modules/autoencoding/losses/
discriminator_loss.py, losses/video_loss.py, regularizers/).
"""

from scail_tpu.autoencoding.regularizers import (  # noqa: F401
    diagonal_gaussian_regularizer, identity_regularizer, lfq_quantize,
    init_lfq, init_vector_quantizer, init_ema_quantizer, vector_quantize,
    ema_vector_quantize, measure_perplexity)
from scail_tpu.autoencoding.discriminator import (  # noqa: F401
    init_nlayer_discriminator, nlayer_discriminator,
    init_video_discriminator, video_discriminator)
from scail_tpu.autoencoding.gan_loss import (  # noqa: F401
    hinge_d_loss, vanilla_d_loss, hinge_gen_loss, hinge_discr_loss,
    LPIPSWithDiscriminator, VideoAutoencoderLoss)
from scail_tpu.autoencoding.engine import AutoencoderTrainer  # noqa: F401
