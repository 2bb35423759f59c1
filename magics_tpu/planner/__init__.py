from magics_tpu.planner.global_planner import GlobalPlanner

__all__ = ["GlobalPlanner"]
