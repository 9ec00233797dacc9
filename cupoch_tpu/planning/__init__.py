"""Path planning (TPU-native replacement for src/cupoch/planning/)."""
from .planner import PlannerBase, Pos3DPlanner

__all__ = ["PlannerBase", "Pos3DPlanner"]
