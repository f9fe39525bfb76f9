from .schedule import Schedule, build_schedule, exponential_sqrt_etas, space_timesteps
from . import resshift

__all__ = ["Schedule", "build_schedule", "exponential_sqrt_etas", "space_timesteps", "resshift"]
