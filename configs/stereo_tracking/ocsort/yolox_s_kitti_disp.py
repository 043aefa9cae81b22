# KITTI stereo tracking variant (reference MOTKittiDataset path: img2 ->
# disparity derivation, KITTI-format evaluation).
_base_ = ['./yolox_s_airdrone_disp.py']

data_root = 'data/kitti/'
classes = ('car', 'pedestrian')
num_classes = 2

model = dict(
    detector=dict(bbox_head=dict(head_module=dict(num_classes=num_classes))))

val_dataloader = dict(
    dataset=dict(
        type='MOTKittiDataset',
        data_root=data_root,
        ann_file='annotations/val_cocoformat.json',
        img_prefix='val/',
        depth_dir_name=None,
        classes=classes))
test_dataloader = val_dataloader

val_evaluator = [
    dict(type='MOTKittiMetrics', metric=['HOTA', 'CLEAR', 'Identity'])]
test_evaluator = val_evaluator
