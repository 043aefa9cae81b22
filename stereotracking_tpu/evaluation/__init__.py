from .clear_identity_hota import (VideoData, clear_metrics,  # noqa: F401
                                  combine_videos, hota_metrics,
                                  identity_metrics)
from .coco_metric import CocoMAPEvaluator  # noqa: F401
from .mot_metrics import (MOTChallengeMetrics, MOTDroneMetrics,  # noqa: F401
                          MOTKittiMetrics, gather_across_hosts)
from .postprocess import interpolate_tracklets  # noqa: F401
from .aflink import AFLinkModel, AppearanceFreeLink  # noqa: F401
from .kitti_protocol import KittiEvaluator  # noqa: F401
from .sot_metrics import SOTMetric, eval_sot_ope  # noqa: F401
from .reid_metrics import evaluate_reid  # noqa: F401
from .track_ap import TAOMetric, TrackAPEvaluator, YTVISMetric  # noqa: F401
from .vot_metrics import (eval_sot_accuracy_robustness,  # noqa: F401
                          eval_sot_eao)
