"""svo_pro_universal_tpu — TPU-native semi-direct VIO/SLAM engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
C++ reference `svo_pro_universal` (SVO Pro 2.0): sparse image alignment,
recursive Bayesian depth filters, direct patch matching, motion-only and
sliding-window bundle adjustment, IMU preintegration, pose-graph
optimization — all as batched device programs on fixed-capacity state.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: keep `import svo_pro_universal_tpu` light; the facade pulls in
    # the full frontend only when used.
    if name in ("Odometry", "PipelineType"):
        from svo_pro_universal_tpu import api
        return getattr(api, name)
    raise AttributeError(name)
