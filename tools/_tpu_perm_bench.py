"""Microbench lane-permutation strategies for bounce compaction @ R=1M."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
R = 1024 * 1024
rng = np.random.default_rng(0)
active_np = rng.random(R) < 0.2

def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(*args); jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(f"{name}: {min(times)*1e3:.2f} ms", flush=True)

a = jnp.asarray(active_np)
state15 = jnp.asarray(rng.random((15, R)).astype(np.float32))

def perm_idx(a):
    rl = jnp.cumsum(a, dtype=jnp.int32) - 1
    rd = jnp.cumsum(~a, dtype=jnp.int32) - 1
    n = rl[-1] + 1
    pos = jnp.where(a, rl, n + rd)
    return jnp.zeros(R, jnp.int32).at[pos].set(
        jnp.arange(R, dtype=jnp.int32), unique_indices=True)

timeit("perm-idx (2 cumsum + scatter)", perm_idx, a)

idx = jax.jit(perm_idx)(a)

timeit("15 separate gathers", lambda s, i: tuple(s[j][i] for j in range(15)),
       state15, idx)
timeit("1 batched (15,R) gather", lambda s, i: s[:, i], state15, idx)
timeit("transposed (R,15) row gather", lambda s, i: s.T[i], state15, idx)
timeit("scatter (15,R) by pos", lambda s, p: jnp.zeros_like(s).at[:, p].set(s, unique_indices=True),
       state15, jax.jit(lambda a: jnp.where(a, jnp.cumsum(a, dtype=jnp.int32)-1,
                (jnp.cumsum(a, dtype=jnp.int32)[-1]) + jnp.cumsum(~a, dtype=jnp.int32)-1))(a))

def sort_based(a, s):
    key = (~a).astype(jnp.int32)
    outs = jax.lax.sort((key,) + tuple(s[j] for j in range(15)),
                        is_stable=True, num_keys=1)
    return outs[1:]
timeit("lax.sort key + 15 payloads", sort_based, a, state15)

def sort_idx_then_gather(a, s):
    key = (~a).astype(jnp.int32)
    _, idx = jax.lax.sort((key, jnp.arange(R, dtype=jnp.int32)),
                          is_stable=True, num_keys=1)
    return s[:, idx]
timeit("lax.sort idx + batched gather", sort_idx_then_gather, a, state15)
