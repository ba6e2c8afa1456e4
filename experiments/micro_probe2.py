"""Systematic probe of Mosaic dynamic-gather shapes/axes in Pallas."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def mk_kernel(axis):
    def k(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=axis)
    return k


def probe(shape_src, shape_idx, axis, dtype=np.int32):
    name = f"src{shape_src} idx{shape_idx} axis={axis} {np.dtype(dtype).name}"
    try:
        src = jnp.asarray(rng.integers(0, 99, size=shape_src).astype(dtype))
        idx = jnp.asarray(
            rng.integers(0, shape_src[axis], size=shape_idx).astype(np.int32))
        out = pl.pallas_call(
            mk_kernel(axis),
            out_shape=jax.ShapeDtypeStruct(shape_idx, src.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)
        out = np.asarray(out)
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=axis)
        ok = np.array_equal(out, ref)
        print(f"{'OK ' if ok else 'WRONG'} {name}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:120]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)


# same-shape lane gather
probe((8, 128), (8, 128), 1)
probe((8, 128), (8, 128), 0)
probe((16, 128), (16, 128), 1)
probe((64, 128), (64, 128), 1)
probe((256, 128), (256, 128), 1)
probe((1024, 128), (1024, 128), 1)
probe((8, 256), (8, 256), 1)
probe((8, 512), (8, 512), 1)
# sublane gather same shape
probe((64, 128), (64, 128), 0)
probe((256, 128), (256, 128), 0)
probe((1024, 128), (1024, 128), 0)
# f32
probe((256, 128), (256, 128), 1, np.float32)
probe((256, 128), (256, 128), 0, np.float32)
# 3d?
probe((8, 8, 128), (8, 8, 128), 2)
