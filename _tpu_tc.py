import time, jax, jax.numpy as jnp, numpy as np
from tmrnet_tpu.ops.time_conv import time_conv_fused, time_conv_reference
b, w, f = 256, 30, 512
x = jax.random.normal(jax.random.PRNGKey(0), (b, w, f), jnp.bfloat16)
r = np.random.RandomState(0)
ws = [jnp.asarray(a) for a in (
    r.randn(3,f,f).astype(np.float32)*0.05, r.randn(f).astype(np.float32)*0.1,
    r.randn(5,f,f).astype(np.float32)*0.05, r.randn(f).astype(np.float32)*0.1,
    r.randn(7,f,f).astype(np.float32)*0.05, r.randn(f).astype(np.float32)*0.1)]
got = time_conv_fused(x, *ws)
want = time_conv_reference(x, *ws)
print("tc maxerr:", np.abs(np.asarray(got,np.float32)-np.asarray(want,np.float32)).max(), flush=True)
def timeit(fn,*a,n=20):
    out=fn(*a); np.asarray(out)
    t0=time.perf_counter()
    for _ in range(n): out=fn(*a)
    np.asarray(out)
    return (time.perf_counter()-t0)/n
print("tc pallas ms:", timeit(time_conv_fused, x, *ws)*1e3)
print("tc xla    ms:", timeit(jax.jit(time_conv_reference), x, *ws)*1e3)
from tmrnet_tpu.ops.nl_attention import nl_attention, nl_attention_reference
q = jax.random.normal(jax.random.PRNGKey(1), (b, f), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(2), (b, w, f), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(3), (b, w, f), jnp.bfloat16)
print("nl pallas ms:", timeit(nl_attention, q, k, v)*1e3)
print("nl xla    ms:", timeit(jax.jit(nl_attention_reference), q, k, v)*1e3)
