import time, numpy as np, jax, jax.numpy as jnp
from leaf_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from leaf_tpu.attacks.engine import CandidateScorer
from leaf_tpu.models import create_model
from leaf_tpu.tokenizer import get_tokenizer

model = create_model("ViT-L-14", precision="bf16")
cfg = model.cfg
scorer = CandidateScorer(cfg, dtype=jnp.bfloat16)
tok = get_tokenizer()
rng = np.random.default_rng(0)
texts = ["stock market rally hits record high today again"] * 128
anchors = scorer.encode_text(model.params["text"], tok(texts))
base = tok(texts)

for N in (5, 25, 50):
    cand = np.repeat(base[:, None, :], N, axis=1)
    mask = jnp.ones((128, N), bool)
    tj = jnp.asarray(cand)
    def run():
        best, bf, loss = scorer._score_rows(model.params["text"], tj, anchors, mask, "l2")
        return np.asarray(best)
    run()
    t0 = time.perf_counter()
    for _ in range(4): run()
    print(f"N={N}: {(time.perf_counter()-t0)/4*1000:.0f} ms")

# single big text encode without argmax/gather:
for M in (640, 3200, 6400):
    toks = jnp.asarray(np.repeat(base, M//128, axis=0))
    enc = scorer._encode
    def run2():
        f = enc(model.params["text"], toks, False)
        f.block_until_ready()
        return np.asarray(f[:1,:4])
    run2()
    t0 = time.perf_counter()
    for _ in range(4): run2()
    print(f"encode M={M}: {(time.perf_counter()-t0)/4*1000:.0f} ms")
