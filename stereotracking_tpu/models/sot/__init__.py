"""Single-object-tracking model family (SiamRPN++ / Stark / PrDiMP).

TPU-native re-creation of the reference's SOT zoo
(/root/reference/mmtrack/models/sot/): fixed-shape jitted per-frame
programs with functional tracker state.
"""
from .resnet import SOTResNet, frozen_param_paths  # noqa: F401
from .siamrpn import (ChannelMapperNeck, CorrelationHead,  # noqa: F401
                      SiameseRPNHead, SiamRPNModule, SiamRPNState,
                      SiamRPNTestCfg, SiamRPNTracker, crop_resize,
                      depthwise_correlation, hanning_window,
                      siamese_rpn_anchors)
from .siamrpn_loss import (SiamRPNTrainCfg, siamrpn_loss,  # noqa: F401
                           siamrpn_targets)
from .prdimp import (PrDiMPModule, PrDiMPState,  # noqa: F401
                     PrDiMPTestCfg, PrDiMPTracker)
from .stark import (StarkModule, StarkState, StarkTestCfg,  # noqa: F401
                    StarkTracker)
