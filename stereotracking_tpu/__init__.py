"""stereotracking_tpu: TPU-native stereo-video multi-object tracking.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
Superjie13/StereoTracking: depth-guided OC-SORT tracking of small airborne
objects with a dual RGB/disparity YOLOX detector, built fixed-shape and
jit-compiled end-to-end for TPU.
"""

__version__ = '0.1.0'

import os as _os

if _os.environ.get('JAX_PLATFORMS'):
    # Honor an explicit JAX_PLATFORMS choice even when a pre-imported
    # accelerator plugin (sitecustomize) would otherwise win: the env var
    # alone does not override an already-initialized registration, so
    # ``JAX_PLATFORMS=cpu python tools/test.py`` could silently land on
    # the accelerator without this.
    import jax as _jax

    _jax.config.update('jax_platforms', _os.environ['JAX_PLATFORMS'])
