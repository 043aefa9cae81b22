from . import bbox  # noqa: F401
from .bbox import (bbox_area, bbox_cxcyah_to_xyxy, bbox_cxcywh_to_xyxy,  # noqa: F401
                   bbox_iou_aligned, bbox_iou_matrix, bbox_xyxy_to_cxcyah,
                   bbox_xyxy_to_cxcywh, bbox_xyxy_to_x1y1wh, scale_bbox)
