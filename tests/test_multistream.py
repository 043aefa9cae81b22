"""Multi-stream batched tracking: equivalence with per-stream runs + mesh
sharding over the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from stereotracking_tpu.models import tracker as trk
from stereotracking_tpu.models.detector import DetectorConfig
from stereotracking_tpu.models.mot import MOTConfig, OCSORTDisparity
from stereotracking_tpu.models.preprocessor import (padded_shape,
                                                    preprocess_frame)
from stereotracking_tpu.parallel.mesh import make_mesh
from stereotracking_tpu.parallel.multistream import MultiStreamTracker
from synthetic import SyntheticSequence

SMALL = MOTConfig(
    detector=DetectorConfig(pre_nms_top_k=128, max_per_img=32),
    tracker=trk.TrackerConfig(num_slots=8, num_dets=8))
H, W = 96, 128


def make_inputs(seqs, t, oh, ow):
    frames = [s.frame(t)[:2] for s in seqs]
    ins = [preprocess_frame(jnp.asarray(img), jnp.asarray(disp), oh, ow)
           for img, disp in frames]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *ins)


def test_batched_equals_sequential():
    oh, ow = padded_shape(H, W)
    seqs = [SyntheticSequence(seed=i, h=H, w=W) for i in range(2)]

    ms = MultiStreamTracker(SMALL, n_streams=2, input_shape=(oh, ow))
    singles = [OCSORTDisparity(SMALL, variables=ms.variables,
                               input_shape=(oh, ow)) for _ in seqs]
    for t in range(3):
        batched = ms.track(make_inputs(seqs, t, oh, ow), [t, t])
        for s, seq in enumerate(seqs):
            img, disp, _ = seq.frame(t)
            inputs = preprocess_frame(jnp.asarray(img), jnp.asarray(disp),
                                      oh, ow)
            res = singles[s].track(inputs, t)
            np.testing.assert_allclose(
                np.asarray(batched.track_bboxes)[s],
                np.asarray(res.track_bboxes), atol=1e-2)
            np.testing.assert_array_equal(
                np.asarray(batched.track_ids)[s], np.asarray(res.track_ids))
            np.testing.assert_array_equal(
                np.asarray(batched.track_valid)[s],
                np.asarray(res.track_valid))


def test_chunked_equals_per_frame():
    """track_raw_chunk (T frames in one scanned program) must carry the
    tracker state identically to T per-frame track_raw dispatches."""
    oh, ow = padded_shape(H, W)
    rng = np.random.RandomState(0)
    T, S = 3, 2
    imgs = rng.randint(0, 255, (T, S, H, W, 3), np.uint8)
    disps = rng.randint(16, 1600, (T, S, H, W), np.uint16)
    fids = np.asarray([[t] * S for t in range(T)], np.int32)

    ms_a = MultiStreamTracker(SMALL, n_streams=S, input_shape=(oh, ow))
    ms_b = MultiStreamTracker(SMALL, n_streams=S, variables=ms_a.variables,
                              input_shape=(oh, ow))
    per_frame = [ms_a.track_raw(jnp.asarray(imgs[t]), jnp.asarray(disps[t]),
                                fids[t]) for t in range(T)]
    chunked = ms_b.track_raw_chunk(jnp.asarray(imgs), jnp.asarray(disps),
                                   jnp.asarray(fids))
    for t in range(T):
        np.testing.assert_array_equal(
            np.asarray(chunked.track_ids)[t],
            np.asarray(per_frame[t].track_ids))
        np.testing.assert_array_equal(
            np.asarray(chunked.track_valid)[t],
            np.asarray(per_frame[t].track_valid))
        np.testing.assert_allclose(
            np.asarray(chunked.track_bboxes)[t],
            np.asarray(per_frame[t].track_bboxes), atol=1e-2)
    # carried states identical after the chunk
    np.testing.assert_array_equal(np.asarray(ms_a.states.num_tracks),
                                  np.asarray(ms_b.states.num_tracks))


def test_streams_sharded_over_mesh():
    oh, ow = padded_shape(H, W)
    mesh = make_mesh(8)
    seqs = [SyntheticSequence(seed=i, h=H, w=W) for i in range(8)]
    ms = MultiStreamTracker(SMALL, n_streams=8, input_shape=(oh, ow),
                            mesh=mesh)
    for t in range(2):
        res = ms.track(make_inputs(seqs, t, oh, ow), [t] * 8)
    assert res.track_bboxes.shape[0] == 8
    # per-stream id counters are independent
    counters = np.asarray(ms.states.num_tracks)
    assert counters.shape == (8,)
    assert np.isfinite(np.asarray(res.track_scales)).all()
