"""Application shell: pipeline, recorder, CLI."""

from .pipeline import LoopbackRobot, RobotLink, SlamPipeline
from .recorder import DataRecorder, State

__all__ = ["RobotLink", "SlamPipeline", "LoopbackRobot", "DataRecorder", "State"]
