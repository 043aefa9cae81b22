"""Video-object-detection model family (DFF / FGFA / SELSA).

TPU-native re-creation of /root/reference/mmtrack/models/vid/: functional
streaming detectors with fixed-shape feature ring buffers.
"""
from .flownet import (FlowNetSimple, flow_warp_feats,  # noqa: F401
                      prepare_flow_input)
from .vid_models import (DFF, FGFA, SELSA, DFFState,  # noqa: F401
                         EmbedAggregator, FGFAState)
