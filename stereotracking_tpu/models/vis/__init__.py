"""Video-instance-segmentation model family (MaskTrack R-CNN).

TPU-native re-creation of /root/reference/mmtrack/models/vis/.
"""
from .masktrack_rcnn import (FCNMaskHead, MaskTrackRCNNModule,  # noqa: F401
                             RoIEmbedHead, VISTrackState, init_vis_state,
                             masktrack_assign, masktrack_match_scores,
                             masktrack_update, similarity_logits)
