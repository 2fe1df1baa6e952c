"""Differentiable rendering: gradients of image losses w.r.t. scene and
camera parameters.

Three replay tiers exist, newest-first:

* ``replay_kernel.replay_grads_sorted`` — **the production path** (used
  by bench.py and the fwd+bwd benchmark): Pallas backward replay over
  rays sorted by recorded path length, one-hot MXU table-gradient
  reduction. 44.5M rays/s fwd+bwd on the final-scene workload (round 4).
* ``replay_fast`` — pure-XLA table-gather replay; CPU/debug tier and
  the source of ``build_replay_table`` (which the kernel tier reuses).
* ``replay`` — original full-recompute XLA replay; slowest, kept as the
  maximally-simple correctness oracle for the other two (all three are
  tested bit-compatible in tests/test_replay*.py).
"""
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
