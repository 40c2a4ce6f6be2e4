import time, numpy as np, jax, jax.numpy as jnp
from leaf_tpu.ops.flash_attention import flash_attention, _reference_attention
from leaf_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

B, H, S, d = 32, 16, 257, 64
rng = np.random.default_rng(0)
q, k, v = (jnp.asarray(rng.standard_normal((B,H,S,d)).astype(np.float32),
                       dtype=jnp.bfloat16) for _ in range(3))

f_flash = jax.jit(lambda q,k,v: flash_attention(q,k,v))
f_ref = jax.jit(lambda q,k,v: _reference_attention(q,k,v, d**-0.5, False))

for name, f in [("xla", f_ref), ("flash", f_flash)]:
    out = f(q,k,v); _ = np.asarray(out[0,0,0,:2])
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(q,k,v)
    _ = np.asarray(out[0,0,0,:2])
    dt = (time.perf_counter()-t0)/20
    print(f"{name}: {dt*1000:.2f} ms")
# parity on tpu
o1 = np.asarray(f_flash(q,k,v), dtype=np.float32)
o2 = np.asarray(f_ref(q,k,v), dtype=np.float32)
print("max diff:", np.abs(o1-o2).max())
