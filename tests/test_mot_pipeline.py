"""End-to-end MOT pipeline smoke/behavior tests (random-weight detector)."""
import jax.numpy as jnp
import numpy as np

from stereotracking_tpu.models import tracker as trk
from stereotracking_tpu.models.detector import DetectorConfig
from stereotracking_tpu.models.mot import (FrameResult, MOTConfig,
                                           OCSORTDisparity, predict_frame)
from stereotracking_tpu.models.preprocessor import (padded_shape,
                                                    preprocess_frame)
from synthetic import SyntheticSequence

SMALL = MOTConfig(
    detector=DetectorConfig(pre_nms_top_k=256, max_per_img=64),
    tracker=trk.TrackerConfig(num_slots=16, num_dets=16))


def test_preprocess_shapes_and_values():
    seq = SyntheticSequence(seed=0, h=250, w=330)
    img, disp, _ = seq.frame(0)
    oh, ow = padded_shape(250, 330)
    assert (oh, ow) == (256, 352)
    out = preprocess_frame(jnp.asarray(img), jnp.asarray(disp), oh, ow)
    assert out['img'].shape == (1, 256, 352, 3)
    assert out['disp_postp'].shape == (1, 256, 352, 3)
    assert out['disp_mask'].shape == (1, 256, 352, 1)
    # invalid (sky) disparity must be zeroed, not 65535/16
    d = np.asarray(out['disp_postp'][0, :, :, 0])
    assert d[0, 0] == 0.0
    m = np.asarray(out['disp_mask'][0, :, :, 0])
    assert m[0, 0] == 0.0 and m[250 - 1, 0] == 1.0
    # valid region: 1/16 fixed-point scaling
    raw = disp[200, 10]
    assert abs(d[200, 10] - raw / 16.0) < 1e-6
    # padding area zero
    assert np.asarray(out['img'])[0, 255, 351].sum() == 0.0


def test_pipeline_runs_and_is_stable_over_frames():
    seq = SyntheticSequence(seed=1, h=128, w=160)
    model = OCSORTDisparity(SMALL, input_shape=(128, 160))
    oh, ow = padded_shape(128, 160)
    results = []
    for t in range(3):
        img, disp, _ = seq.frame(t)
        inputs = preprocess_frame(jnp.asarray(img), jnp.asarray(disp), oh, ow)
        res = model.track(inputs, t)
        assert isinstance(res, FrameResult)
        assert res.det_bboxes.shape == (64, 4)
        assert res.track_bboxes.shape == (16, 4)
        assert np.isfinite(np.asarray(res.det_bboxes)).all()
        results.append(res)
    # with random weights there may be junk detections; pipeline must not
    # produce NaN scales/depths for valid outputs
    for res in results:
        v = np.asarray(res.track_valid)
        assert np.isfinite(np.asarray(res.track_scales)[v]).all()
        assert np.isfinite(np.asarray(res.track_depths)[v]).all()


def test_reset_clears_ids():
    model = OCSORTDisparity(SMALL, input_shape=(64, 64))
    seq = SyntheticSequence(seed=2, h=64, w=64, n_obj=1)
    img, disp, _ = seq.frame(0)
    inputs = preprocess_frame(jnp.asarray(img), jnp.asarray(disp), 64, 64)
    model.track(inputs, 0)
    model.reset()
    assert int(np.asarray(model.state.num_tracks)) == 0
    # frame_id==0 also resets inside step
    model.track(inputs, 0)
    st = model.state
    assert int(np.asarray(st.num_tracks)) >= 0


def test_track_video_scan_matches_per_frame_loop():
    """Whole-clip lax.scan path produces identical results to the per-frame
    streaming loop."""
    import jax
    from stereotracking_tpu.models.mot import track_video

    seq = SyntheticSequence(seed=5, h=96, w=128)
    oh, ow = padded_shape(96, 128)
    model = OCSORTDisparity(SMALL, input_shape=(oh, ow))

    per_frame = []
    frames = []
    for t in range(4):
        img, disp, _ = seq.frame(t)
        inputs = preprocess_frame(jnp.asarray(img), jnp.asarray(disp), oh, ow)
        frames.append(inputs)
        per_frame.append(model.track(inputs, t))

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    state0 = trk.init_state(SMALL.tracker)
    scan_fn = jax.jit(lambda v, s, f, ids: track_video(
        v, model.module, s, f, ids, SMALL))
    _, results = scan_fn(model.variables, state0, stacked,
                         jnp.arange(4, dtype=jnp.int32))
    for t in range(4):
        np.testing.assert_array_equal(
            np.asarray(results.track_ids)[t],
            np.asarray(per_frame[t].track_ids))
        np.testing.assert_allclose(
            np.asarray(results.track_bboxes)[t],
            np.asarray(per_frame[t].track_bboxes), atol=1e-3)
        np.testing.assert_array_equal(
            np.asarray(results.track_valid)[t],
            np.asarray(per_frame[t].track_valid))
