"""stereotracking_tpu: TPU-native stereo-video multi-object tracking.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
Superjie13/StereoTracking: depth-guided OC-SORT tracking of small airborne
objects with a dual RGB/disparity YOLOX detector, built fixed-shape and
jit-compiled end-to-end for TPU.
"""

__version__ = '0.1.0'
