from .mesh import FRAME_AXIS, StepCounters, default_mesh, make_sim_step

__all__ = ["FRAME_AXIS", "StepCounters", "default_mesh", "make_sim_step"]
