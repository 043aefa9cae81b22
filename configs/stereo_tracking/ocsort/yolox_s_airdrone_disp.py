# Canonical depth-guided stereo tracking run (AirDrone).
# Key layout follows the reference's
# configs/stereo_tracking/ocsort/yolox_s_mmyolo_mot_airdrone_disp.py.
_base_ = ['../../_base_/yolox_s.py']

data_root = 'data/AirSim_drone/'

DEPTH_RANGE = 80

img_scale = (720, 1280)  # height, width
num_classes = 1
classes = ('drone',)

deepen_factor = 0.33
widen_factor = 0.5

save_epoch_intervals = 5
train_batch_size_per_gpu = 8
val_batch_size_per_gpu = 1

max_epochs = 50
num_last_epochs = 5

model = dict(
    type='OCSORT_Disparity',
    baseline=0.25,
    focal_length=640,
    # parity protocol: re-extract depth on the un-inflated box exactly like
    # the reference (ocsort_disparity.py:100-104) instead of reusing the
    # pre-inflation detection depth
    reuse_det_depth=False,
    # production serving kernels: host-packed pallas Focus stems +
    # fused pallas depth extraction on real TPU, XLA elsewhere
    stem_backend='auto',
    depth_backend='auto',
    stage1_backend='auto',
    stage2_backend='auto',
    # stage-3 'auto' resolves to XLA everywhere: the fused kernel measured
    # 3.7 ms/step SLOWER than XLA's stage3+4+neck fusion on the chip
    # (r5 A/B, apis/builder._resolve_stage_backends)
    stage3_backend='auto',
    # raw frames are packed for the pallas stems ON DEVICE (MXU
    # selection matmuls, bit-identical to the C++ host packer) on real
    # TPU: zero per-frame host layout work; 'host' restores the loader
    # C++ SIMD pack
    pack_backend='auto',
    detector=dict(
        type='YOLODetector_Disparity_V1',
        backbone=dict(type='YOLOXCSPDarknet_Disparity_V1_MMYOLO',
                      input_channels=3,
                      deepen_factor=deepen_factor,
                      widen_factor=widen_factor),
        bbox_head=dict(head_module=dict(num_classes=num_classes)),
        test_cfg=dict(score_thr=0.01,
                      nms=dict(type='nms', iou_threshold=0.5)),
    ),
    motion=dict(type='KalmanFilter'),
    tracker=dict(
        type='OCSORTTracker_Disparity',
        obj_score_thr=0.3,
        init_track_thr=0.7,
        weight_iou_with_det_scores=False,
        match_iou_thr=0.1,
        num_tentatives=3,
        vel_consist_weight=0.2,
        vel_delta_t=3,
        num_frames_retain=30))

train_dataloader = dict(
    batch_size=train_batch_size_per_gpu,
    dataset=dict(
        type='CocoDispDataset',
        data_root=data_root,
        ann_file='annotations/train_cocoformat_80.json',
        img_prefix='train/',
        classes=classes))

val_dataloader = dict(
    batch_size=val_batch_size_per_gpu,
    dataset=dict(
        type='MOTDispDataset',
        data_root=data_root,
        ann_file='annotations/val_cocoformat_80.json',
        img_prefix='val/',
        depth_dir_name='depth',
        classes=classes))
test_dataloader = val_dataloader

# optimizer (reference :154-160)
base_lr = 0.001 / 8 * train_batch_size_per_gpu

optim_wrapper = dict(
    optimizer=dict(type='SGD', lr=base_lr, momentum=0.9, weight_decay=5e-4,
                   nesterov=True))

val_evaluator = [
    dict(type='CocoMetric', metric='bbox'),
    dict(type='MOTDroneMetrics',
         metric=['HOTA', 'CLEAR', 'Identity'],
         depth_thr=DEPTH_RANGE,
         ignore_depth=False),
]
test_evaluator = val_evaluator
