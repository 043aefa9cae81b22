import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from stereotracking_tpu.models.mot import MOTConfig, OCSORTDisparity, predict_frame
from stereotracking_tpu.models.preprocessor import padded_shape, preprocess_frame
from stereotracking_tpu.models import tracker as trk
from stereotracking_tpu.models.detector import detector_predict
from stereotracking_tpu.ops.depth import disp_to_depth, extract_box_depths
from stereotracking_tpu.structures.bbox import scale_bbox
from bench import make_frames

h, w = 1080, 1920
oh, ow = padded_shape(h, w)
cfg = MOTConfig()
model = OCSORTDisparity(cfg, dtype=jnp.bfloat16, input_shape=(oh, ow))
img, disp = make_frames(1, h, w)[0]
img_d, disp_d = jax.device_put((jnp.asarray(img), jnp.asarray(disp)))
inputs = jax.block_until_ready(preprocess_frame(img_d, disp_d, oh, ow))

def timeit(name, fn, n=10):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s} {min(ts)*1000:8.2f} ms (min of {n})", flush=True)

det_fn = jax.jit(lambda v, i: detector_predict(v, model.module, i))
timeit("detector fwd+decode+nms", lambda: det_fn(model.variables, inputs))
det = jax.block_until_ready(det_fn(model.variables, inputs))
print("num valid dets:", int(np.asarray(det.valid).sum()), flush=True)

depth_map = jax.block_until_ready(disp_to_depth(inputs['disp_postp'][0,:,:,0], 0.25, 640.0))
timeit("depth extract 300", lambda: extract_box_depths(depth_map, det.boxes, det.valid, 128))
timeit("depth extract 64", lambda: extract_box_depths(depth_map, det.boxes[:64], det.valid[:64], 128))

dets = trk.Detections(det.boxes[:64], det.scores[:64], det.labels[:64],
                      jnp.ones(64), jnp.full((64,), 10.0), det.valid[:64])
state = trk.init_state(cfg.tracker)
step_fn = jax.jit(lambda s, d, f: trk.step(s, d, f, cfg.tracker))
st1, _ = jax.block_until_ready(step_fn(state, dets, jnp.int32(0)))
st2, _ = jax.block_until_ready(step_fn(st1, dets, jnp.int32(1)))
timeit("tracker step main", lambda: step_fn(st2, dets, jnp.int32(2)))

t0 = time.perf_counter()
full = model._step
st, res = full(model.variables, state=st2, inputs=inputs, frame_id=jnp.int32(2), scale_factor=(1.0,1.0))
jax.block_until_ready(res)
print(f"full compile+first: {(time.perf_counter()-t0):.1f} s", flush=True)
timeit("full predict_frame", lambda: full(model.variables, state=st2, inputs=inputs, frame_id=jnp.int32(2), scale_factor=(1.0,1.0))[1])
