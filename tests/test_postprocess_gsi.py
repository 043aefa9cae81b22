"""GSI / interpolation exactness tests.

The reference (/root/reference/mmtrack/models/task_modules/track/
interpolation.py) smooths with sklearn ``GPR(RBF(len_scale, 'fixed'))``;
our closed-form posterior mean must equal sklearn's output, and the full
``forward`` must reproduce an independent transcription of the reference
semantics (strict gap bound, <=2-row track dropping, score-1 fills).
"""
import numpy as np
import pytest

from stereotracking_tpu.evaluation.postprocess import (
    gaussian_smoothed_interpolation, gpr_rbf_posterior_mean,
    gsi_length_scale, interpolate_track_rows, interpolate_tracklets,
    interpolate_tracks)

sklearn = pytest.importorskip('sklearn')


def _random_track(rng, tid, n, drop=0.3):
    frames = np.arange(n)[rng.rand(n) > drop]
    if len(frames) == 0:
        frames = np.array([0])
    cx = 50 + np.cumsum(rng.randn(len(frames)) * 3)
    cy = 40 + np.cumsum(rng.randn(len(frames)) * 2)
    w = 10 + rng.rand(len(frames)) * 5
    h = 8 + rng.rand(len(frames)) * 4
    rows = np.stack([frames, np.full(len(frames), tid),
                     cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2,
                     rng.rand(len(frames))], axis=1)
    return rows


def test_gpr_posterior_mean_matches_sklearn():
    from sklearn.gaussian_process import GaussianProcessRegressor as GPR
    from sklearn.gaussian_process.kernels import RBF
    rng = np.random.RandomState(0)
    t = np.sort(rng.choice(200, size=37, replace=False)).astype(float)
    y = rng.randn(37, 4) * 20 + 100
    # large length scales make K + 1e-10 I ill-conditioned (cond ~ 1e10),
    # so solve-order rounding shows up at ~1e-4; the old Gaussian-kernel
    # smoother differed from GPR by whole pixels.
    for tau, atol in ((2.0, 1e-8), (10.0, 1e-3)):
        ls = gsi_length_scale(len(t), tau)
        want = np.stack([
            GPR(RBF(ls, 'fixed')).fit(t[:, None], y[:, d]).predict(t[:, None])
            for d in range(4)], axis=1)
        got = gpr_rbf_posterior_mean(t, y, ls)
        np.testing.assert_allclose(got, want, atol=atol)


def test_gsi_track_matches_sklearn_reference_form():
    """Full per-track GSI == reference gaussian_smoothed_interpolation
    transcribed with sklearn."""
    from sklearn.gaussian_process import GaussianProcessRegressor as GPR
    from sklearn.gaussian_process.kernels import RBF
    rng = np.random.RandomState(1)
    track = _random_track(rng, tid=3, n=60)
    tau = 10
    ls = np.clip(tau * np.log(tau ** 3 / len(track)), tau ** -1, tau ** 2)
    t = track[:, 0:1]
    want = track.copy()
    for c in range(2, 6):
        g = GPR(RBF(ls, 'fixed')).fit(t, track[:, c:c + 1])
        want[:, c] = g.predict(t).reshape(-1)
    got = gaussian_smoothed_interpolation(track, tau)
    np.testing.assert_allclose(got, want, atol=1e-3)


def _reference_forward(pred_tracks, min_num_frames, max_num_frames,
                       use_gsi, smooth_tau):
    """Independent numpy+sklearn transcription of
    InterpolateTracklets.forward (interpolation.py:33-161)."""
    from sklearn.gaussian_process import GaussianProcessRegressor as GPR
    from sklearn.gaussian_process.kernels import RBF
    outs = []
    for tid in range(int(pred_tracks[:, 1].min()),
                     int(pred_tracks[:, 1].max()) + 1):
        track = pred_tracks[pred_tracks[:, 1] == tid]
        if len(track) <= 2:
            continue
        if len(track) > min_num_frames:
            new = np.zeros((0, 7))
            fids = track[:, 0]
            for i in np.where(np.diff(fids) > 1)[0]:
                gap = int(fids[i + 1] - fids[i])
                if 1 < gap < max_num_frames:
                    for j in range(1, gap):
                        row = np.ones((7,))
                        row[0] = fids[i] + j
                        row[1] = tid
                        row[2:6] = (j / gap) * (track[i + 1, 2:6]
                                                - track[i, 2:6]) \
                            + track[i, 2:6]
                        new = np.concatenate((new, row[None]))
            track = np.concatenate((track, new))
        if use_gsi:
            ls = np.clip(smooth_tau * np.log(smooth_tau ** 3 / len(track)),
                         smooth_tau ** -1, smooth_tau ** 2)
            t = track[:, 0:1]
            sm = track.copy()
            for c in range(2, 6):
                sm[:, c] = GPR(RBF(ls, 'fixed')).fit(
                    t, track[:, c:c + 1]).predict(t).reshape(-1)
            track = sm
        outs.append(track)
    outs = np.concatenate(outs)
    return outs[outs[:, 0].argsort(kind='stable')]


@pytest.mark.parametrize('use_gsi', [False, True])
def test_forward_matches_reference_transcription(use_gsi):
    rng = np.random.RandomState(2)
    tracks = [_random_track(rng, tid, n=40, drop=0.4)
              for tid in range(1, 6)]
    tracks.append(_random_track(rng, 6, n=2, drop=0.0))  # dropped (<=2 rows)
    pred = np.concatenate(tracks)
    got = interpolate_tracks(pred, 5, 20, use_gsi, 10.0)
    want = _reference_forward(pred, 5, 20, use_gsi, 10.0)
    # row order within a frame may differ (argsort stability over different
    # concat orders) -> compare as sorted sets of rows
    got = got[np.lexsort(got.T[::-1])]
    want = want[np.lexsort(want.T[::-1])]
    np.testing.assert_allclose(got, want, atol=1e-3)
    assert not (got[:, 1] == 6).any()


def test_strict_gap_semantics():
    """gap == max_num_frames is NOT filled (strict '<', the reference's
    off-by-one vs our old '<=')."""
    rows = np.array([[f, 1, 0, 0, 10, 10, 0.9]
                     for f in [0, 1, 2, 3, 4, 5, 25]])
    out = interpolate_track_rows(rows, 1, max_num_frames=20)
    assert len(out) == len(rows)  # gap of 20 not filled
    out2 = interpolate_track_rows(rows, 1, max_num_frames=21)
    assert len(out2) == len(rows) + 19
    assert (out2[len(rows):, 6] == 1.0).all()  # fills carry score 1


def test_dict_adapter_roundtrip():
    frames = {f: (np.array([1]), np.array([[f, f, f + 10., f + 10.]]))
              for f in [0, 1, 2, 3, 4, 5, 8]}
    out = interpolate_tracklets(frames, min_num_frames=5, max_num_frames=5)
    assert set(out) >= set(frames)
    assert 6 in out and len(out[6][0]) == 1
    np.testing.assert_allclose(out[6][1][0],
                               [6, 6, 16, 16], atol=1e-9)
