from . import transforms  # noqa: F401
from .coco_video import CocoVideo  # noqa: F401
from .datasets import (CocoDispDataset, MOTDispDataset,  # noqa: F401
                       MOTKittiDataset)
from .loader import PrefetchIterator, device_prefetch  # noqa: F401
from .tao_dancetrack import DanceTrackDataset, TAODataset  # noqa: F401
from .samplers import (EntireVideoBatchSampler, QuotaSampler,  # noqa: F401
                       VideoSampler)
