import time, numpy as np, jax, jax.numpy as jnp
from leaf_tpu.attacks import edits
from leaf_tpu.attacks.engine import CandidateScorer
from leaf_tpu.models import create_model
from leaf_tpu.tokenizer import get_tokenizer
B, RHO = 128, 50
model = create_model("ViT-L-14", precision="bf16")
cfg = model.cfg
scorer = CandidateScorer(cfg, dtype=jnp.bfloat16)
tok = get_tokenizer()
words = "the quick brown fox jumps over lazy dog stock market rally world cup final".split()
rng = np.random.default_rng(0)
texts = [" ".join(rng.choice(words, size=10)) for _ in range(B)]
anchors = scorer.encode_text(model.params["text"], tok(texts))

def timed(label, fn, n=3):
    fn()
    t0=time.perf_counter()
    for _ in range(n): r = fn()
    print(f"{label}: {(time.perf_counter()-t0)/n*1000:.1f} ms")
    return r

# phase 1 real: generate mutated probes then tokenize then score
positions = [edits.sample_positions(len(S), RHO, rng=rng) for S in texts]
probe_rows = [[edits.apply_edit(S, int(z), 0, edits.SPACE_VOCAB, alternative=-1) for z in positions[i]] for i, S in enumerate(texts)]
flat = [s for row in probe_rows for s in row]
timed("tokenize mutated 6400", lambda: tok(flat))
tokens = tok(flat).reshape(B, RHO, -1)
timed("upload tokens", lambda: jax.block_until_ready(jnp.asarray(tokens)))
tokens_j = jnp.asarray(tokens)
mask = jnp.ones((B, RHO), bool)
def full_score():
    best, bf, loss = scorer._score_rows(model.params["text"], tokens_j, anchors, mask, "l2")
    return np.asarray(best)   # host sync like the attack does
timed("score+sync(best)", full_score, n=5)
def score_nosync():
    best, bf, loss = scorer._score_rows(model.params["text"], tokens_j, anchors, mask, "l2")
    jax.block_until_ready(loss)
timed("score+block(loss)", score_nosync, n=5)
def score_upload():
    tj = jnp.asarray(tokens)
    best, bf, loss = scorer._score_rows(model.params["text"], tj, anchors, mask, "l2")
    return np.asarray(best)
timed("upload+score+sync", score_upload, n=5)
