import time, numpy as np, jax, jax.numpy as jnp
# raw MXU calibration
for N in (4096, 8192):
    a = jnp.asarray(np.random.randn(N, N).astype(np.float32), dtype=jnp.bfloat16)
    b = jnp.asarray(np.random.randn(N, N).astype(np.float32), dtype=jnp.bfloat16)
    f = jax.jit(lambda a, b: a @ b)
    r = f(a, b); np.asarray(r)  # warm + real sync
    t0 = time.perf_counter()
    it = 20
    for _ in range(it):
        r = f(a, b)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / it
    print(f"matmul {N}: {dt*1000:.2f} ms → {2*N**3/dt/1e12:.1f} TF/s")

# text encoder shape: [6400*77, 768] x [768, 3072]
M, K, Nn = 6400*77, 768, 3072
a = jnp.asarray(np.random.randn(M, K).astype(np.float32), jnp.bfloat16)
b = jnp.asarray(np.random.randn(K, Nn).astype(np.float32), jnp.bfloat16)
f = jax.jit(lambda a, b: a @ b)
r = f(a,b); np.asarray(r)
t0 = time.perf_counter()
for _ in range(10): r = f(a, b)
np.asarray(r)
dt = (time.perf_counter()-t0)/10
print(f"mlp-shaped: {dt*1000:.2f} ms → {2*M*K*Nn/dt/1e12:.1f} TF/s")
