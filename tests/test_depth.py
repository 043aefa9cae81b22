"""Depth-extraction parity vs a numpy replica of the reference algorithm."""
import numpy as np
import pytest

from stereotracking_tpu.ops.depth import disp_to_depth, extract_box_depths

BASELINE, FOCAL = 0.25, 640


def reference_extract(depth, boxes):
    """Numpy oracle of ocsort_disparity.py extract_depth (test-only)."""
    values, scales = [], []
    for box in boxes:
        box = box.astype(int)
        if box[0] < 0 or box[1] < 0:
            # negative numpy indices wrap; for our test data that yields an
            # empty slice, which the reference maps to (-1, 1)
            values.append(-1)
            scales.append(1.0)
            continue
        depth_box = depth[box[1]:box[3], box[0]:box[2]]
        w = box[2] - box[0]
        d_v = depth_box[(depth_box < 150) & (depth_box > 0)]
        n = len(d_v)
        if n < 1 or w > 800:
            values.append(-1)
            scales.append(1.0)
            continue
        d_sorted = np.sort(d_v, axis=None)
        d_mid = d_sorted[n // 2]
        v_tl = np.mean(depth[box[1]:box[1] + 2, box[0]:box[0] + 2])
        v_tr = np.mean(depth[box[1]:box[1] + 2, box[2] - 2:box[2]])
        v_bl = np.mean(depth[box[3] - 2:box[3], box[0]:box[0] + 2])
        v_br = np.mean(depth[box[3] - 2:box[3], box[2] - 2:box[2]])
        w_start = min(1 - sum(np.array([v_tl, v_tr, v_bl, v_br]) > d_mid) / 4,
                      0.4) * n
        w_end = w_start + 0.6 * n
        d_seg = d_sorted[int(w_start):int(w_end)]
        if len(d_seg) == 0:
            d_seg = d_sorted[:-1]
        d = np.mean(d_seg) if len(d_seg) else float(d_sorted[0])
        values.append(d)
        scales.append(max(min(d * d, 3.0), 1.0))
    return np.array(values), np.array(scales)


def synthetic_scene(seed=0, h=360, w=640):
    """Disparity map: background sky (invalid -> 0) + ground plane + objects."""
    rng = np.random.RandomState(seed)
    disp = np.zeros((h, w), np.float32)
    # ground plane: quantized to 1/16 like SGBM fixed point
    rows = np.linspace(8, 80, h)[:, None] * np.ones((1, w))
    disp[h // 2:] = rows[h // 2:]
    disp = np.round(disp * 16) / 16
    objects = []
    for _ in range(12):
        bw, bh = rng.randint(8, 60), rng.randint(8, 50)
        x = rng.randint(0, w - bw)
        y = rng.randint(0, h - bh)
        d_m = rng.uniform(5, 120)
        disp_obj = round(BASELINE * FOCAL / d_m * 16) / 16
        disp[y:y + bh, x:x + bw] = disp_obj
        objects.append([x, y, x + bw, y + bh])
    return disp, np.array(objects, np.float32)


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_matches_reference_oracle(seed):
    disp, boxes = synthetic_scene(seed)
    depth = np.asarray(disp_to_depth(disp, BASELINE, FOCAL))
    # jitter boxes so they cover object + background mixtures
    rng = np.random.RandomState(seed + 100)
    jit_boxes = boxes + rng.uniform(-6, 6, boxes.shape).astype(np.float32)
    jit_boxes[:, 0] = np.clip(jit_boxes[:, 0], 0, None)
    jit_boxes[:, 1] = np.clip(jit_boxes[:, 1], 0, None)
    exp_d, exp_s = reference_extract(depth.astype(np.float64), jit_boxes)
    got_d, got_s = extract_box_depths(
        depth, jit_boxes, np.ones(len(jit_boxes), bool))
    np.testing.assert_allclose(np.asarray(got_d), exp_d, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got_s), exp_s, rtol=1e-3, atol=1e-3)


def test_invalid_and_edge_boxes():
    disp, _ = synthetic_scene(3)
    depth = np.asarray(disp_to_depth(disp, BASELINE, FOCAL))
    boxes = np.array([
        [-10, 50, 30, 90],     # negative corner -> skipped
        [0, 0, 40, 30],        # sky region: all invalid depth -> -1
        [900, 50, 950, 90],    # fully outside -> -1
        [100, 300, 980, 340],  # wider than 800 -> skipped
        [50, 200, 52, 202],    # tiny 2x2 box
    ], np.float32)
    d, s = extract_box_depths(depth, boxes, np.ones(5, bool))
    d, s = np.asarray(d), np.asarray(s)
    assert d[0] == -1 and s[0] == 1
    assert d[1] == -1 and s[1] == 1
    assert d[2] == -1 and s[2] == 1
    assert d[3] == -1 and s[3] == 1
    assert d[4] > 0  # ground plane depth


def test_invalid_mask_respected():
    disp, boxes = synthetic_scene(4)
    depth = np.asarray(disp_to_depth(disp, BASELINE, FOCAL))
    valid = np.zeros(len(boxes), bool)
    d, s = extract_box_depths(depth, boxes, valid)
    assert (np.asarray(d) == -1).all()
    assert (np.asarray(s) == 1).all()


def test_scale_saturates_at_3_for_distant_objects():
    disp = np.full((100, 100), BASELINE * FOCAL / 50.0, np.float32)  # 50 m
    depth = np.asarray(disp_to_depth(disp, BASELINE, FOCAL))
    d, s = extract_box_depths(
        depth, np.array([[10, 10, 50, 50]], np.float32), np.ones(1, bool))
    assert abs(float(d[0]) - 50.0) < 0.1
    assert float(s[0]) == 3.0


# ---------------------------------------------------------------------------
# integer-domain (disparity) extraction: must be BIT-identical to the float
# chain disp_to_depth -> extract_box_depths under the uint16/16 fixed-point
# contract (ops/depth.py extract_box_depths_disp)
# ---------------------------------------------------------------------------

from stereotracking_tpu.ops.depth import extract_box_depths_disp  # noqa: E402


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_disp_domain_bit_identical(seed):
    disp, boxes = synthetic_scene(seed)
    rng = np.random.RandomState(seed + 17)
    jit_boxes = boxes + rng.uniform(-8, 8, boxes.shape).astype(np.float32)
    # include pathological boxes: edge-clipped, negative, huge, tiny, and
    # boxes protruding past the padded image (pyramid pad-region corners)
    extra = np.array([
        [-10, 50, 30, 90],
        [0, 0, 40, 30],
        [900, 50, 950, 90],
        [100, 300, 980, 340],
        [50, 200, 52, 202],
        [600, 330, 700, 420],   # bottom-right overhang
        [630, 10, 660, 40],
    ], np.float32)
    all_boxes = np.concatenate([jit_boxes, extra]).astype(np.float32)
    valid = np.ones(len(all_boxes), bool)
    valid[3] = False

    depth = np.asarray(disp_to_depth(disp, BASELINE, FOCAL))
    exp_d, exp_s = extract_box_depths(depth, all_boxes, valid, crop=96)
    got_d, got_s = extract_box_depths_disp(disp, all_boxes, valid,
                                           BASELINE, FOCAL, crop=96)
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(exp_d))
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(exp_s))


def test_disp_domain_bit_identical_dense_random():
    """Random fixed-point disparity (every raw value possible), random boxes."""
    rng = np.random.RandomState(99)
    raw = rng.randint(0, 65536, (160, 224)).astype(np.uint16)
    raw[rng.rand(160, 224) < 0.3] = 0            # invalid holes
    disp = (raw.astype(np.float32) / 16.0)
    boxes = rng.uniform(-20, 240, (40, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(1, 120, (40, 2))
    valid = rng.rand(40) > 0.2

    depth = np.asarray(disp_to_depth(disp, BASELINE, FOCAL))
    exp_d, exp_s = extract_box_depths(depth, boxes, valid, crop=64)
    got_d, got_s = extract_box_depths_disp(disp, boxes, valid,
                                           BASELINE, FOCAL, crop=64)
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(exp_d))
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(exp_s))
