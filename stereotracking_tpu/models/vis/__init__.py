"""Video-instance-segmentation model family (MaskTrack R-CNN,
Mask2Former).

TPU-native re-creation of /root/reference/mmtrack/models/vis/.
"""
from .masktrack_rcnn import (FCNMaskHead, MaskTrackRCNNModule,  # noqa: F401
                             MaskTrackRCNNStreaming, RoIEmbedHead,
                             VISTrackState, init_vis_state,
                             masktrack_assign, masktrack_match_scores,
                             masktrack_update, similarity_logits)
from .mask2former import (Mask2FormerConfig, Mask2FormerVIS,  # noqa: F401
                          mask2former_loss, mask2former_predict)
