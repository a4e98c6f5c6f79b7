"""One-off: compare measurement strategies on the real TPU (run after bench)."""
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from sema_tpu.utils.jaxcache import enable
enable()
from sema_tpu.ops.hier_topk import batched_topk_scores_hier

rows, dim, k, qb = 1_048_576, 384, 10, 64
key = jax.random.key(0); ks, kq = jax.random.split(key)
store = jax.jit(lambda k_: (lambda x: (x/jnp.linalg.norm(x,axis=1,keepdims=True)).astype(jnp.bfloat16))(jax.random.normal(k_, (rows,dim))))(ks)
store = jax.block_until_ready(store); print("store ready", flush=True)
valid = jnp.ones((rows,), bool)
scan = jax.jit(partial(batched_topk_scores_hier, k=k, group=128))
qs = jax.random.normal(kq, (16, qb, dim), dtype=jnp.float32)
qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
qs = jax.block_until_ready(qs)

# warm (compile cached from bench run at qb=64)
jax.block_until_ready(scan(store, qs[0], valid))
print("warm ok", flush=True)

# (a) sync per-call e2e
times = []
for i in range(8):
    t0 = time.perf_counter(); jax.block_until_ready(scan(store, qs[i % 16], valid))
    times.append(time.perf_counter() - t0)
print(f"sync per-call e2e: {np.median(times)*1e3:.2f} ms", flush=True)

# (b) async pipelined: dispatch all, block once
for n in (4, 16):
    t0 = time.perf_counter()
    outs = [scan(store, qs[i % 16], valid) for i in range(n)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n
    print(f"async pipelined n={n}: {dt*1e3:.2f} ms/call", flush=True)
