# Monocular OC-SORT with camera-motion compensation: the moving-camera
# variant (reference GLME_affine CMC, mmtrack/models/trackers/utils.py:6-55,
# applied to Kalman states before association).  backend='device' runs the
# on-device block-matching + RANSAC chain (ops/gmc.py); 'opencv' runs the
# exact reference Farneback chain on the host (ops/gmc_host.py).
_base_ = ['./yolox_s_ocsort_monocular.py']

model = dict(
    cmc=dict(backend='device', step=16, search=8,
             ransac_iters=128, ransac_thr=5.0, min_inlier_ratio=0.3))
