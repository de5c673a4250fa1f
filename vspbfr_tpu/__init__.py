"""VSPBFR-TPU: a TPU-native blind face restoration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
LonglongaaaGo/VSPBFR ("Visual Style Prompt Learning Using Diffusion Models for
Blind Face Restoration", Pattern Recognition 2025):

  * style encoder (e4e/pSp over IR-SE-50)     -> vspbfr_tpu.models.e4e
  * frozen StyleGAN2 decoder                  -> vspbfr_tpu.models.stylegan2
  * code diffuser (4-step latent DDPM)        -> vspbfr_tpu.models.code_diffuser
                                                 + vspbfr_tpu.diffusion.ddpm
  * RestoreNet (SMART-layer U-Net generator)  -> vspbfr_tpu.models.restorenet
  * losses (LPIPS / ArcFace-ID / GAN / ADA)   -> vspbfr_tpu.losses
  * degradation data pipeline                 -> vspbfr_tpu.data
  * data-parallel training over a TPU mesh    -> vspbfr_tpu.parallel, vspbfr_tpu.train

Design: NHWC layouts, pure-functional flax models, explicit PRNG threading,
jit-compiled train steps sharded with jax.sharding over a device Mesh, and
Pallas kernels for the resampling/activation hot ops.
"""

__version__ = "0.1.0"
