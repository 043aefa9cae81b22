from . import kalman  # noqa: F401
from .motion import (CameraMotionCompensation, LinearMotion,  # noqa: F401
                     warp_bboxes)
