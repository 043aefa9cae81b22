# YOLOX-S base (same key layout as the reference's
# configs/_base_/yolox_s_8x8_mmyolo.py so configs port over directly).
img_scale = (640, 640)  # height, width
deepen_factor = 0.33
widen_factor = 0.5

model = dict(
    detector=dict(
        type='YOLODetector',
        backbone=dict(
            type='YOLOXCSPDarknet',
            deepen_factor=deepen_factor,
            widen_factor=widen_factor,
            out_indices=(2, 3, 4),
            spp_kernal_sizes=(5, 9, 13),
        ),
        neck=dict(
            type='YOLOXPAFPN',
            deepen_factor=deepen_factor,
            widen_factor=widen_factor,
            in_channels=[256, 512, 1024],
            out_channels=256,
        ),
        bbox_head=dict(
            type='YOLOXHead',
            head_module=dict(
                type='YOLOXHeadModule',
                num_classes=80,
                in_channels=256,
                feat_channels=256,
                widen_factor=widen_factor,
                stacked_convs=2,
                featmap_strides=(8, 16, 32),
            ),
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                          reduction='sum', loss_weight=1.0),
            loss_bbox=dict(type='IoULoss', mode='square', eps=1e-16,
                           reduction='sum', loss_weight=5.0),
            loss_obj=dict(type='CrossEntropyLoss', use_sigmoid=True,
                          reduction='sum', loss_weight=1.0),
            loss_bbox_aux=dict(type='L1Loss', reduction='sum',
                               loss_weight=1.0)),
        train_cfg=dict(
            assigner=dict(type='SimOTAAssigner', center_radius=2.5)),
        test_cfg=dict(
            yolox_style=True,
            multi_label=True,
            score_thr=0.001,
            max_per_img=300,
            nms=dict(type='nms', iou_threshold=0.65),
        ),
    ),
)
