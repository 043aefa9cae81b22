"""Device-side batch preparation: modality-consistent pad/stack/cast.

Replaces the reference's host-side ``TrackDataPreprocessor_Disparity_V1``
(/root/reference/mmtrack/models/data_preprocessors/data_preprocessor_disparity_v1.py:21-84)
and the uint16-PNG post-processing in ``LoadDisparityFromFile``
(loading_disparity.py:82-134).  Raw decoded frames (uint8 BGR image, uint16
disparity) go to the device once; everything else — invalid-pixel masking,
/16 fixed-point conversion, 3-channel repeat, pad-to-divisor — is fused on
device in one jit, NHWC.  The canonical config applies no mean/std
normalization or channel swap (the model consumes raw 0-255 BGR floats).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

PAD_DIVISOR = 32
PAD_VALUE_IMG = 0.0   # stack_batch pads with 0 (utils/misc.py:13-64)


def padded_shape(h: int, w: int, divisor: int = PAD_DIVISOR) -> Tuple[int, int]:
    return (-(-h // divisor) * divisor, -(-w // divisor) * divisor)


def preprocess_frame_pure(img_u8: jnp.ndarray, disp_u16: jnp.ndarray,
                          out_h: int, out_w: int,
                          depth_raw: Optional[jnp.ndarray] = None,
                          ) -> Dict[str, jnp.ndarray]:
    """Traceable body of ``preprocess_frame`` — compose this inside a larger
    jitted program (e.g. the per-frame MOT step) so the cast/mask/pad fuses
    with the consumer instead of costing an extra HBM round-trip."""
    h, w = img_u8.shape[:2]
    ph, pw = out_h - h, out_w - w

    img = img_u8.astype(jnp.float32)
    img = jnp.pad(img, ((0, ph), (0, pw), (0, 0)),
                  constant_values=PAD_VALUE_IMG)

    disp = disp_u16.astype(jnp.int32)
    mask = (disp < 65535).astype(jnp.float32)
    disp_postp = jnp.where(disp == 65535, 0, disp).astype(jnp.float32) / 16.0
    disp_postp = jnp.pad(disp_postp, ((0, ph), (0, pw)))
    mask = jnp.pad(mask, ((0, ph), (0, pw)))

    out = {
        'img': img[None],
        'disp_postp': jnp.repeat(disp_postp[None, :, :, None], 3, axis=-1),
        'disp_mask': mask[None, :, :, None],
    }
    if depth_raw is not None:
        depth = jnp.pad(depth_raw.astype(jnp.float32), ((0, ph), (0, pw)))
        out['depth_postp'] = depth[None, :, :, None]
    return out


@partial(jax.jit, static_argnames=('out_h', 'out_w'))
def preprocess_frame(img_u8: jnp.ndarray, disp_u16: jnp.ndarray,
                     out_h: int, out_w: int,
                     depth_raw: Optional[jnp.ndarray] = None,
                     ) -> Dict[str, jnp.ndarray]:
    """uint8 BGR (H, W, 3) + uint16 disparity (H, W) -> padded NHWC floats.

    Returns dict with 'img' (1, H', W', 3), 'disp_postp' (1, H', W', 3),
    'disp_mask' (1, H', W', 1), and optionally 'depth_postp'.
    """
    return preprocess_frame_pure(img_u8, disp_u16, out_h, out_w, depth_raw)
