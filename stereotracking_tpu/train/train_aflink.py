"""AFLink training on synthetic motion tracklets.

The reference ships a *pretrained* AFLink checkpoint and loads it in
``AppearanceFreeLink.__init__`` (mmtrack/models/task_modules/track/
aflink.py:150-168); it is appearance-free, trained purely on motion
windows, so an equivalent checkpoint can be produced from synthetic
trajectories: positives are the two halves of one noisy linear walk split
by a random gap, negatives pair halves of different walks.  Binary
cross-entropy over the (B, 30, 5) window pairs.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..evaluation.aflink import AFLinkModel, normalize_pair


def _walk(rng: np.random.RandomState, n_frames: int, t0: int) -> np.ndarray:
    """One noisy linear trajectory: rows (frame, cx, cy, w, h)."""
    x0, y0 = rng.uniform(50, 1800), rng.uniform(50, 1000)
    vx, vy = rng.uniform(-8, 8), rng.uniform(-6, 6)
    w = rng.uniform(15, 80)
    h = rng.uniform(12, 60)
    t = np.arange(n_frames, dtype=np.float32)
    rows = np.stack([
        t0 + t,
        x0 + vx * t + rng.normal(0, 1.5, n_frames),
        y0 + vy * t + rng.normal(0, 1.5, n_frames),
        w * (1 + rng.normal(0, 0.02, n_frames)),
        h * (1 + rng.normal(0, 0.02, n_frames)),
    ], axis=1).astype(np.float32)
    return rows


def _window(rows: np.ndarray, tail: bool, window: int) -> np.ndarray:
    out = np.zeros((window, 5), np.float32)
    seg = rows[-window:] if tail else rows[:window]
    if tail:
        out[-len(seg):] = seg
    else:
        out[:len(seg)] = seg
    return out


def synthesize_batch(rng: np.random.RandomState, batch: int,
                     window: int = 30
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (x1, x2, labels): label 1 = same object, 0 = different."""
    x1 = np.zeros((batch, window, 5), np.float32)
    x2 = np.zeros((batch, window, 5), np.float32)
    y = np.zeros(batch, np.int32)
    for i in range(batch):
        positive = rng.rand() < 0.5
        n = rng.randint(20, 80)
        a = _walk(rng, n, t0=rng.randint(0, 200))
        if positive:
            cut = rng.randint(5, n - 5)
            gap = rng.randint(1, 25)
            head, tail = a[:cut], a[cut:].copy()
            tail[:, 0] += gap           # temporal gap between the halves
            w1 = _window(head, tail=True, window=window)
            w2 = _window(tail, tail=False, window=window)
            y[i] = 1
        else:
            b = _walk(rng, rng.randint(20, 80), t0=rng.randint(0, 200))
            w1 = _window(a, tail=True, window=window)
            w2 = _window(b, tail=False, window=window)
        x1[i], x2[i] = normalize_pair(w1, w2)
    return x1, x2, y


def train_aflink(seed: int = 0, steps: int = 300, batch: int = 128,
                 lr: float = 1e-3, window: int = 30,
                 log_every: int = 50) -> Tuple[dict, float]:
    """Train AFLinkModel on synthetic tracklets; returns (variables,
    final accuracy on a held-out batch)."""
    model = AFLinkModel()
    rng = np.random.RandomState(seed)
    dummy = jnp.zeros((1, window, 5))
    variables = model.init(jax.random.PRNGKey(seed), dummy, dummy)
    tx = optax.adam(lr)
    opt_state = tx.init(variables['params'])

    @jax.jit
    def step(params, opt_state, x1, x2, y):
        def loss_fn(p):
            probs = model.apply({'params': p}, x1, x2)
            logp = jnp.log(jnp.clip(probs, 1e-8))
            ll = jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            return -ll.mean(), probs
        (loss, probs), grads = jax.value_and_grad(loss_fn,
                                                  has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = (jnp.argmax(probs, -1) == y).mean()
        return params, opt_state, loss, acc

    params = variables['params']
    for it in range(steps):
        x1, x2, y = synthesize_batch(rng, batch, window)
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(x1), jnp.asarray(x2),
            jnp.asarray(y))
        if log_every and it % log_every == 0:
            print(f'[aflink] step {it}/{steps} loss {float(loss):.4f} '
                  f'acc {float(acc):.3f}', flush=True)

    # held-out accuracy
    x1, x2, y = synthesize_batch(np.random.RandomState(seed + 1), 512,
                                 window)
    probs = model.apply({'params': params}, jnp.asarray(x1),
                        jnp.asarray(x2))
    acc = float((np.asarray(jnp.argmax(probs, -1)) == y).mean())
    return {'params': params}, acc
