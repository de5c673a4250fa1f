from vspbfr_tpu.convert.torch_import import (
    convert_code_diffuser,
    convert_discriminator,
    convert_e4e_encoder,
    convert_inception_v3,
    convert_lpips,
    convert_psp_checkpoint,
    convert_resnet101,
    convert_restoration_net,
    convert_stylegan2_generator,
    load_torch_state_dict,
)

__all__ = [
    "convert_code_diffuser",
    "convert_discriminator",
    "convert_e4e_encoder",
    "convert_inception_v3",
    "convert_lpips",
    "convert_psp_checkpoint",
    "convert_resnet101",
    "convert_restoration_net",
    "convert_stylegan2_generator",
    "load_torch_state_dict",
]
