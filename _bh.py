import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from sema_tpu.ops.topk import batched_topk_scores
from sema_tpu.ops.hier_topk import batched_topk_scores_hier

rows, dim, k, qb = 1_000_000, 384, 10, 64
key = jax.random.key(0); ks, kq = jax.random.split(key)
store = jax.jit(lambda k_: (lambda x: (x/jnp.linalg.norm(x,axis=1,keepdims=True)).astype(jnp.bfloat16))(jax.random.normal(k_, (rows,dim))))(ks)
store = jax.block_until_ready(store); print("store ready", flush=True)
valid = jnp.ones((rows,), bool)
qs = jax.random.normal(kq, (4, qb, dim), dtype=jnp.float32)
qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)

def timeit(fn_one, label):
    t0=time.perf_counter()
    mapped = jax.jit(lambda xs: jax.lax.map(fn_one, xs))
    jax.block_until_ready(mapped(qs))
    print(f"{label}: compile+first {time.perf_counter()-t0:.0f}s", flush=True)
    t0=time.perf_counter(); jax.block_until_ready(mapped(qs)); dt=(time.perf_counter()-t0)/4
    print(f"{label}: {dt*1e3:.2f} ms/batch{qb} -> {qb/dt:.0f} QPS", flush=True)

timeit(lambda q: batched_topk_scores_hier(store, q, valid, k, group=128), "hier g=128")
timeit(lambda q: batched_topk_scores(store, q, valid, k), "naive")
sv, iv = jax.jit(partial(batched_topk_scores, k=k))(store, qs[0], valid)
hv, hi = jax.jit(partial(batched_topk_scores_hier, k=k, group=128))(store, qs[0], valid)
agree = np.mean([len(set(np.asarray(iv)[i]) & set(np.asarray(hi)[i]))/k for i in range(qb)])
print("recall vs naive:", agree, flush=True)
