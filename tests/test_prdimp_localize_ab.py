"""A/B PrDiMP localize_target (4-state distractor logic) against an
independent numpy transcription over random score maps (reference
prdimp_cls_head.py:364-474)."""
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.sot.prdimp import (HARD_NEGATIVE,
                                                  NORMAL, NOT_FOUND,
                                                  UNCERTAIN,
                                                  PrDiMPTestCfg,
                                                  localize_target)


def np_localize(scores, prev_bbox, sample_center, scale_factor, cfg):
    h, w = scores.shape
    score_size = np.array([w, h], float)
    output_size = score_size - (cfg.filter_size + 1) % 2
    score_center = score_size / 2
    flat = scores.reshape(-1)
    mi = int(flat.argmax())
    max_score = flat[mi]
    max_pos = np.array([mi % w, mi // w], float)
    t_map = max_pos - score_center
    ratio = (cfg.img_sample_size / output_size) * scale_factor
    t_disp = t_map * ratio

    neigh = cfg.target_neighborhood_scale * prev_bbox[2:4] / ratio
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    inn = (np.abs(gx - max_pos[0]) <= neigh[0] / 2) \
        & (np.abs(gy - max_pos[1]) <= neigh[1] / 2)
    masked = np.where(inn, 0.0, scores).reshape(-1)
    si = int(masked.argmax())
    snd_score = masked[si]
    snd_pos = np.array([si % w, si // w], float)
    s_map = snd_pos - score_center
    s_disp = s_map * ratio
    prev_map = (prev_bbox[:2] - sample_center) / ratio

    t_diff = np.sqrt(((t_map - prev_map) ** 2).sum())
    d_diff = np.sqrt(((s_map - prev_map) ** 2).sum())
    disp_thres = cfg.displacement_scale * np.sqrt(
        score_size[0] * score_size[1]) / 2

    not_found = max_score < cfg.no_target_min_score
    has_distr = snd_score > cfg.distractor_thres * max_score
    hard_only = (snd_score > cfg.hard_neg_thres * max_score) \
        and (snd_score > cfg.no_target_min_score)
    case_a = (d_diff > disp_thres) and (t_diff < disp_thres)
    case_b = (d_diff < disp_thres) and (t_diff > disp_thres)
    if has_distr and case_b and not not_found:
        center = s_disp + sample_center
    else:
        center = t_disp + sample_center
    if not_found:
        state = NOT_FOUND
    elif has_distr:
        state = HARD_NEGATIVE if (case_a or case_b) else UNCERTAIN
    elif hard_only:
        state = HARD_NEGATIVE
    else:
        state = NORMAL
    return center, state, max_score


@pytest.mark.parametrize('seed', list(range(12)))
def test_localize_matches_numpy(seed):
    cfg = PrDiMPTestCfg()
    rng = np.random.RandomState(seed)
    # a mix of regimes: flat noise, one peak, two peaks near/far
    scores = np.abs(rng.randn(18, 18)).astype(np.float32) * 0.02
    if seed % 4 != 0:
        scores[rng.randint(18), rng.randint(18)] += rng.rand() * 1.2
    if seed % 3 == 0:
        scores[rng.randint(18), rng.randint(18)] += rng.rand()
    prev = np.array([150. + 40 * rng.rand(), 140., 40., 30.], np.float32)
    center = np.array([160., 150.], np.float32)
    sf = np.float32(0.8 + 0.4 * rng.rand())

    c, st, sc = localize_target(jnp.asarray(scores), jnp.asarray(prev),
                                jnp.asarray(center), jnp.asarray(sf), cfg)
    rc, rst, rsc = np_localize(scores.astype(np.float64), prev, center,
                               float(sf), cfg)
    assert int(st) == rst, f'seed={seed}: state {int(st)} != {rst}'
    np.testing.assert_allclose(np.asarray(c), rc, rtol=1e-4, atol=1e-3)
    assert abs(float(sc) - rsc) < 1e-5
