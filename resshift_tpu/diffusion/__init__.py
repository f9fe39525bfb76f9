from .schedule import Schedule, build_schedule, exponential_sqrt_etas, space_timesteps
from .ddpm import DDPMSchedule, build_ddpm_schedule
from . import ddpm, losses, resshift

__all__ = ["Schedule", "build_schedule", "exponential_sqrt_etas", "space_timesteps",
           "DDPMSchedule", "build_ddpm_schedule", "ddpm", "losses", "resshift"]
