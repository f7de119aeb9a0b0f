"""stdd_tpu — TPU-native spatiotemporal deepfake detection for live video calls.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch system (Mariachiar/Spatiotemporal-Deepfake-Detection-for-Live-Video-Calls):

- face detection (YuNet ported to XLA convs + fixed-shape NMS)
- multi-face tracking (ByteTrack host state machine, device cost matrices)
- clip-stable similarity-warp crop/align (FasterCropAlignXRay semantics)
- I3D-ResNet50 spatiotemporal classifier (AltFreezing) and FTCN variant
- dual-branch AU+LMK transformer detector with alternating-freeze training
- streaming scoring engine with clip→track→video aggregation and hysteresis
- offline evaluation harnesses with CSV outputs and bootstrap variability

Everything device-side is channels-last ([B, T, H, W, C]), bfloat16-friendly,
and designed to run under ``jit``/``pjit`` over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
