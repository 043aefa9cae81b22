import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
t00=time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
from stereotracking_tpu.ops.pallas_jv import solve_rect_lap_pallas
from stereotracking_tpu.ops.assignment import linear_assignment_with_limit
from scipy.optimize import linear_sum_assignment
from stereotracking_tpu.models import tracker as trk
from stereotracking_tpu.models.mot import MOTConfig

# correctness on TPU vs scipy oracle
rng = np.random.RandomState(0)
for trial in range(5):
    k, n = 64, 64
    cost = (1.0 - rng.uniform(0, 1, (k, n))**3).astype(np.float32)
    row_mask = rng.rand(k) < 0.5
    col_mask = rng.rand(n) < 0.5
    grow, gcol = linear_assignment_with_limit(cost, row_mask, col_mask, 0.9)
    grow = np.asarray(grow)
    # scipy oracle on active subproblem
    act = cost[np.ix_(row_mask, col_mask)]
    ka, na = act.shape
    ext = np.full((ka+na, ka+na), 0.45); ext[ka:, na:] = 0; ext[:ka,:na] = act
    rr, cc = linear_sum_assignment(ext)
    exp_pairs = {(r, c) for r, c in zip(rr, cc) if r < ka and c < na}
    ridx = np.where(row_mask)[0]; cidx = np.where(col_mask)[0]
    got_pairs = set()
    for i in np.where(grow >= 0)[0]:
        got_pairs.add((int(np.searchsorted(ridx, i)), int(np.searchsorted(cidx, grow[i]))))
    assert got_pairs == exp_pairs, (trial, got_pairs ^ exp_pairs)
log("TPU pallas JV correctness vs scipy: OK (5 trials)")

# tracker speed with pallas JV
cfg = MOTConfig()
boxes = np.zeros((64,4), np.float32)
boxes[:,0] = rng.uniform(0, 1800, 64); boxes[:,1] = rng.uniform(0, 1000, 64)
boxes[:,2] = boxes[:,0] + rng.uniform(10, 70, 64)
boxes[:,3] = boxes[:,1] + rng.uniform(10, 50, 64)
dets = trk.Detections(jnp.asarray(boxes), jnp.full((64,),0.9), jnp.zeros(64,jnp.int32),
                      jnp.ones(64), jnp.full((64,),10.0), jnp.ones(64,bool))
state = trk.init_state(cfg.tracker)
step_fn = jax.jit(lambda s, d, f: trk.step(s, d, f, cfg.tracker))
log("compiling tracker (pallas JV)")
st1,_ = step_fn(state, dets, jnp.int32(0)); jax.block_until_ready(st1)
st2,_ = step_fn(st1, dets, jnp.int32(1)); jax.block_until_ready(st2)
log("tracker compiled")
ts=[]
for _ in range(20):
    t0=time.perf_counter(); jax.block_until_ready(step_fn(st2, dets, jnp.int32(2))[0]); ts.append(time.perf_counter()-t0)
log(f"tracker step (64 tracks, 64 dets): {min(ts)*1000:.2f} ms")
