import time, jax, jax.numpy as jnp, numpy as np
from tmrnet_tpu.ops.nl_attention import nl_attention, nl_attention_reference
from tmrnet_tpu.ops.time_conv import time_conv_fused, time_conv_reference

def timeit(f, *a, n=20):
    out = f(*a); np.asarray(out)
    t0=time.perf_counter()
    for _ in range(n): out = f(*a)
    np.asarray(out)
    return (time.perf_counter()-t0)/n

b, w, f = 512, 30, 512
rng = jax.random.PRNGKey(0)
q = jax.random.normal(rng, (b, f), jnp.bfloat16)
k = jax.random.normal(jax.random.fold_in(rng,1), (b, w, f), jnp.bfloat16)
v = jax.random.normal(jax.random.fold_in(rng,2), (b, w, f), jnp.bfloat16)
got = nl_attention(q, k, v)
want = nl_attention_reference(q, k, v)
err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32)).max()
print("nl_attention TPU maxerr:", err, flush=True)
print("nl pallas:", timeit(nl_attention, q, k, v)*1e3, "ms")
print("nl xla   :", timeit(jax.jit(nl_attention_reference), q, k, v)*1e3, "ms")

x = jax.random.normal(rng, (b, w, f), jnp.bfloat16)
r = np.random.RandomState(0)
ws = [jnp.asarray(a) for a in (
    r.randn(3,f,f).astype(np.float32)*0.05, r.randn(f).astype(np.float32)*0.1,
    r.randn(5,f,f).astype(np.float32)*0.05, r.randn(f).astype(np.float32)*0.1,
    r.randn(7,f,f).astype(np.float32)*0.05, r.randn(f).astype(np.float32)*0.1)]
got = time_conv_fused(x, *ws)
want = time_conv_reference(x, *ws)
err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32)).max()
print("time_conv TPU maxerr:", err, flush=True)
print("tc pallas:", timeit(time_conv_fused, x, *ws)*1e3, "ms")
print("tc xla   :", timeit(jax.jit(time_conv_reference), x, *ws)*1e3, "ms")
