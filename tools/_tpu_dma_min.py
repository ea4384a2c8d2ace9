"""Minimal repro: double-buffered DMA from HBM with dynamic cluster ids."""
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, W, K = 128, 48, 16

def kern(meta_ref, big_ref, out_ref, scratch, sem):
    trip = meta_ref[0, 0]

    def dma(slot, j):
        cid = jnp.minimum(j, K - 1)
        return pltpu.make_async_copy(
            big_ref.at[pl.ds(cid * M, M)], scratch.at[slot], sem.at[slot])

    @pl.when(trip > 0)
    def _():
        dma(0, 0).start()

    def body(j, acc):
        slot = jax.lax.rem(j, 2)
        @pl.when(j + 1 < trip)
        def _():
            dma(jax.lax.rem(j + 1, 2), j + 1).start()
        dma(slot, j).wait()
        return acc + jnp.sum(scratch[slot], axis=0, keepdims=True)

    acc = jax.lax.fori_loop(0, trip, body, jnp.zeros((1, W), jnp.float32))
    out_ref[0:1, :] = acc

x = jnp.asarray(np.random.rand(K * M, W), jnp.float32)
meta = jnp.asarray([[K, 0]], jnp.int32)
out = pl.pallas_call(
    kern,
    grid=(1,),
    out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
    in_specs=[
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ],
    out_specs=pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((2, M, W), jnp.float32), pltpu.SemaphoreType.DMA((2,))],
)(meta, x)
print("ok", float(out.sum()), float(x.sum()), flush=True)
