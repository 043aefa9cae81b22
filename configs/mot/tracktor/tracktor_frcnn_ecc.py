# Tracktor with ECC camera-motion compensation (the reference's
# moving-camera Tracktor composition, mmtrack/models/mot/tracktor.py:49-64:
# motion=[CameraMotionCompensation, LinearMotion]): previous-frame track
# boxes are ECC-warped into the current frame before RoI regression.
model = dict(
    type='Tracktor',
    detector=dict(type='FasterRCNN', num_classes=1),
    reid=dict(embed_dim=128),
    motion=dict(type='CameraMotionCompensation',
                warp_mode='cv2.MOTION_EUCLIDEAN',
                num_iters=50, stop_eps=0.001),
    tracker=dict(
        type='TracktorTracker',
        obj_score_thr=0.5,
        regression=dict(obj_score_thr=0.5, nms=dict(iou_threshold=0.6),
                        match_iou_thr=0.3),
        reid=dict(num_samples=10, img_scale=(256, 128),
                  match_score_thr=2.0, match_iou_thr=0.2),
        momentums=None,
        num_frames_retain=10))
