from vspbfr_tpu.diffusion.ddpm import DDPMSchedule, LatentDDPM

__all__ = ["DDPMSchedule", "LatentDDPM"]
