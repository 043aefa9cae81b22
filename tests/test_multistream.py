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
