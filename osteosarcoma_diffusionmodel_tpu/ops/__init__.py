from .schedules import DiffusionSchedule, ddim_timesteps, get_beta_schedule

__all__ = ["DiffusionSchedule", "ddim_timesteps", "get_beta_schedule"]
