import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from sema_tpu.utils.jaxcache import enable
enable()
from sema_tpu.ops.hier_topk import batched_topk_scores_hier

rows, dim, k, qb = 1_048_576, 384, 10, 64
key = jax.random.key(0); ks, kq = jax.random.split(key)
store = jax.block_until_ready(jax.jit(lambda k_: (lambda x: (x/jnp.linalg.norm(x,axis=1,keepdims=True)).astype(jnp.bfloat16))(jax.random.normal(k_, (rows,dim))))(ks))
valid = jnp.ones((rows,), bool)
scan = jax.jit(partial(batched_topk_scores_hier, k=k, group=128))
qs = jax.block_until_ready(jax.random.normal(kq, (16, qb, dim), dtype=jnp.float32))
np.asarray(scan(store, qs[0], valid)[0])  # warm + fetch

# force full result materialization on host each call
times = []
for i in range(10):
    t0 = time.perf_counter()
    s, idx = scan(store, qs[i % 16], valid)
    _ = np.asarray(s); _ = np.asarray(idx)
    times.append(time.perf_counter() - t0)
print("per-call with fetch: median %.2f ms  min %.2f  max %.2f" % (
    np.median(times)*1e3, min(times)*1e3, max(times)*1e3), flush=True)

# throughput: 64 calls pipelined, fetch last
t0 = time.perf_counter()
outs = [scan(store, qs[i % 16], valid) for i in range(64)]
_ = np.asarray(outs[-1][0])
dt = time.perf_counter() - t0
print(f"pipelined 64 calls + final fetch: {dt/64*1e3:.2f} ms/call -> {qb*64/dt:.0f} QPS", flush=True)
