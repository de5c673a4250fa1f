"""Flax model zoo: every trained/frozen network of the reference pipeline.

  layers         — StyleGAN2 building blocks + SMART layers (models/RestoreNet.py:24-787)
  stylegan2      — frozen 1024px Generator w/ return_features (e4e/models/stylegan2/model.py:367-552)
  e4e            — IR-SE-50 Encoder4Editing / GradualStyleEncoder (e4e/models/encoders/*)
  psp            — pSp facade: encode->W+, decode->features (e4e/models/psp.py, Loss/e4e_embedding.py)
  code_diffuser  — TACC-block latent denoiser (models/CodeDiffuser.py)
  restorenet     — Restoration_net + Discriminator (models/RestoreNet.py:791-1265)
"""

from vspbfr_tpu.models import layers  # noqa: F401
