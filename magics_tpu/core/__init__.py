"""Core numerics: constants, variable-timestep spacing, GBP schedules, linalg."""

from magics_tpu.core.constants import DOFS
from magics_tpu.core.timesteps import get_variable_timesteps
from magics_tpu.core.schedule import schedule_booleans, ScheduleKind

__all__ = ["DOFS", "get_variable_timesteps", "schedule_booleans", "ScheduleKind"]
