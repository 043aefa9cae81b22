import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
t00=time.time()
def log(msg): print(f"[{time.time()-t00:6.1f}s] {msg}", flush=True)
from stereotracking_tpu.ops.depth import disp_to_depth, extract_box_depths
from stereotracking_tpu.models import tracker as trk
from stereotracking_tpu.models.mot import MOTConfig
log("imports done")

h, w = 1088, 1920
rng = np.random.RandomState(0)
depth_map = jnp.asarray(np.clip(rng.rand(h, w).astype(np.float32)*200, 0, None))
boxes = np.zeros((64,4), np.float32)
boxes[:,0] = rng.uniform(0, w-80, 64); boxes[:,1] = rng.uniform(0, h-60, 64)
boxes[:,2] = boxes[:,0] + rng.uniform(10, 70, 64)
boxes[:,3] = boxes[:,1] + rng.uniform(10, 50, 64)
boxes = jnp.asarray(boxes)
valid = jnp.ones(64, bool)
log("data ready; compiling depth extract")
r = extract_box_depths(depth_map, boxes, valid, 128)
jax.block_until_ready(r)
log("depth compile+run done")
ts=[]
for _ in range(10):
    t0=time.perf_counter(); jax.block_until_ready(extract_box_depths(depth_map, boxes, valid, 128)); ts.append(time.perf_counter()-t0)
log(f"depth extract 64 boxes: {min(ts)*1000:.2f} ms")

cfg = MOTConfig()
dets = trk.Detections(boxes, jnp.full((64,),0.9), jnp.zeros(64,jnp.int32),
                      jnp.ones(64), jnp.full((64,),10.0), valid)
state = trk.init_state(cfg.tracker)
step_fn = jax.jit(lambda s, d, f: trk.step(s, d, f, cfg.tracker))
log("compiling tracker")
st1,_ = step_fn(state, dets, jnp.int32(0)); jax.block_until_ready(st1)
st2,_ = step_fn(st1, dets, jnp.int32(1)); jax.block_until_ready(st2)
log("tracker compiled")
ts=[]
for _ in range(10):
    t0=time.perf_counter(); jax.block_until_ready(step_fn(st2, dets, jnp.int32(2))[0]); ts.append(time.perf_counter()-t0)
log(f"tracker step: {min(ts)*1000:.2f} ms")
