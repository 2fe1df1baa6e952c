from .gradients import camera_grad, mse_loss, render_once, scene_grad
from .replay import record_decisions, render_replay, replay_trace

__all__ = [
    "camera_grad",
    "mse_loss",
    "render_once",
    "scene_grad",
    "record_decisions",
    "render_replay",
    "replay_trace",
]
