import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


# probe 1: trivial kernel
def k1(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


x = jnp.ones((8, 128), jnp.float32)
r = pl.pallas_call(k1, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                   out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
log(f"probe1 trivial kernel: {float(np.asarray(r)[0,0])}")


# probe 2: while_loop with scalar carry + scratch write
def k2(x_ref, o_ref, s_ref):
    s_ref[...] = x_ref[...]

    def cond(i):
        return i < 5

    def body(i):
        s_ref[...] = s_ref[...] + 1.0
        return i + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))
    o_ref[...] = s_ref[...]


r = pl.pallas_call(k2, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
                   in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                   out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
log(f"probe2 while+scratch: {float(np.asarray(r)[0,0])} (expect 6)")


# probe 3: while whose cond READS a scratch ref
def k3(x_ref, o_ref, s_ref):
    s_ref[...] = x_ref[...] * 0.0
    ci = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def cond(i):
        return jnp.sum(jnp.where(ci == i, s_ref[...], 0.0)) < 0.5

    def body(i):
        s_ref[...] = jnp.where(ci == (i + 1), 1.0, s_ref[...])
        return i + 1

    last = jax.lax.while_loop(cond, body, jnp.int32(0))
    o_ref[...] = s_ref[...] + last.astype(jnp.float32)


r = pl.pallas_call(k3, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
                   in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                   out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
log(f"probe3 cond-reads-scratch: {float(np.asarray(r)[0,0])}")


# probe 4: dynamic row slice from input ref inside fori
def k4(x_ref, o_ref):
    def body(i, acc):
        row = x_ref[pl.ds(i, 1), :]
        return acc + jnp.sum(row)

    acc = jax.lax.fori_loop(0, 8, k4_body := body, jnp.float32(0.0))
    o_ref[...] = x_ref[...] + acc


r = pl.pallas_call(k4, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                   out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
log(f"probe4 dynamic row slice: {float(np.asarray(r)[0,0])} (expect 1025)")
