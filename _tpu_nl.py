import jax, jax.numpy as jnp, numpy as np
from tmrnet_tpu.ops.nl_attention import nl_attention, nl_attention_reference
b, w, f = 256, 30, 512
rng = jax.random.PRNGKey(0)
q = jax.random.normal(rng, (b, f), jnp.bfloat16)
k = jax.random.normal(jax.random.fold_in(rng,1), (b, w, f), jnp.bfloat16)
v = jax.random.normal(jax.random.fold_in(rng,2), (b, w, f), jnp.bfloat16)
got = nl_attention(q, k, v)
want = nl_attention_reference(q, k, v)
print("nl maxerr:", np.abs(np.asarray(got,np.float32)-np.asarray(want,np.float32)).max())
