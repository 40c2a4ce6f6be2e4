import time, numpy as np, jax
from leaf_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import __graft_entry__ as ge
fn, args = ge.entry()
t0 = time.time()
out = jax.jit(fn)(*args)
out = np.asarray(out)
print(f"entry OK: logits {out.shape}, finite={np.isfinite(out).all()}, {time.time()-t0:.1f}s")
