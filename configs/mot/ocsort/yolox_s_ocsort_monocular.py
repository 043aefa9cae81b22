# Monocular OC-SORT (no disparity): the reference's plain OCSORT path
# (mmtrack/models/mot/ocsort.py + trackers/ocsort_tracker.py) — same
# association algorithm, single-branch backbone, scale fixed to 1.
_base_ = ['../../_base_/yolox_s.py']

num_classes = 1
classes = ('drone',)
img_scale = (720, 1280)

model = dict(
    type='OCSORT',
    detector=dict(
        type='YOLODetector',
        backbone=dict(type='YOLOXCSPDarknet',
                      deepen_factor=0.33, widen_factor=0.5),
        bbox_head=dict(head_module=dict(num_classes=num_classes)),
        test_cfg=dict(score_thr=0.01,
                      nms=dict(type='nms', iou_threshold=0.5)),
    ),
    motion=dict(type='KalmanFilter'),
    tracker=dict(
        type='OCSORTTracker',
        obj_score_thr=0.3,
        init_track_thr=0.7,
        weight_iou_with_det_scores=True,
        match_iou_thr=0.3,
        num_tentatives=3,
        vel_consist_weight=0.2,
        vel_delta_t=3,
        num_frames_retain=30))

val_dataloader = dict(
    dataset=dict(
        type='MOTDispDataset',
        data_root='data/DroneVsBird/',
        ann_file='annotations/val_cocoformat.json',
        img_prefix='val/',
        classes=classes))
test_dataloader = val_dataloader

val_evaluator = [
    dict(type='MOTChallengeMetrics', metric=['HOTA', 'CLEAR', 'Identity'])]
test_evaluator = val_evaluator
