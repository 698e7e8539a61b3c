"""SD-era image inference API (reference: sgm/inference/)."""

from scail_tpu.inference.api import (ModelArchitecture, Sampler,  # noqa: F401
                                     Discretization, Guider, Thresholder,
                                     SamplingParams, SamplingSpec,
                                     SamplingPipeline, model_specs,
                                     get_discretization_config,
                                     get_guider_config, get_sampler_config)
from scail_tpu.inference.helpers import (Img2ImgDiscretizationWrapper,  # noqa: F401
                                         do_img2img, do_sample)
from scail_tpu.inference.watermark import (WATERMARK_BITS,  # noqa: F401
                                            WatermarkEmbedder,
                                            decode_watermark,
                                            embed_watermark)
