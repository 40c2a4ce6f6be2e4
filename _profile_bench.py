import time, numpy as np, jax, jax.numpy as jnp
from leaf_tpu.attacks import attack_text_leaf, edits
from leaf_tpu.attacks.engine import CandidateScorer
from leaf_tpu.models import create_model
from leaf_tpu.tokenizer import get_tokenizer
from leaf_tpu.train.optim import make_optimizer
from leaf_tpu.train.schedules import cosine_lr
from leaf_tpu.train.step import TrainState, make_anchor_encode, make_train_step

B, RHO = 128, 50
model = create_model("ViT-L-14", precision="bf16")
cfg = model.cfg
scorer = CandidateScorer(cfg, dtype=jnp.bfloat16)
tok = get_tokenizer()
tx = make_optimizer(cosine_lr(1e-5, 10, 1000), weight_decay=1e-4)
state = TrainState.create(jax.tree.map(jnp.copy, model.params["text"]), tx)
train_step = make_train_step(cfg, tx, dtype=jnp.bfloat16, donate=False)
anchor_encode = make_anchor_encode(cfg, dtype=jnp.bfloat16)
frozen = jax.tree.map(jnp.copy, model.params["text"])

words = "the quick brown fox jumps over lazy dog stock market rally world cup final".split()
rng = np.random.default_rng(0)
texts = [" ".join(rng.choice(words, size=10)) for _ in range(B)]

def t(label, fn, n=3):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n): fn()
    print(f"{label}: {(time.perf_counter()-t0)/n*1000:.1f} ms")

# 1. tokenize B texts
t("tokenize B=128", lambda: tok(texts))
# 2. tokenize candidate batch 6400
flat = texts * RHO
t("tokenize 6400", lambda: tok(flat))
# 3. host candidate generation phase1
def gen_phase1():
    positions = [edits.sample_positions(len(S), RHO, rng=rng) for S in texts]
    return [[edits.apply_edit(S, int(z), 0, edits.SPACE_VOCAB, alternative=-1) for z in positions[i]] for i, S in enumerate(texts)]
t("host gen phase1", gen_phase1)
def gen_phase2():
    return [edits.generate_random_sentences_at_z(S, 3, edits.DEFAULT_VOCAB, RHO, alternative=-1, rng=rng) for S in texts]
t("host gen phase2", gen_phase2)
# 4. anchor encode [128]
tokens = tok(texts)
def anchor():
    jax.block_until_ready(anchor_encode(frozen, tokens))
t("anchor encode 128", anchor)
# 5. score_rows [128,50,77]
cand = np.repeat(tokens[:, None, :], RHO, axis=1)
def score():
    best, bf, loss = scorer._score_rows(state.text_params, jnp.asarray(cand), anchor_encode(frozen, tokens), jnp.ones((B,RHO), bool), "l2")
    jax.block_until_ready(loss)
t("score_rows 6400", score)
# 6. train step
anchors = anchor_encode(frozen, tokens)
def ts():
    s2, m = train_step(state, jnp.asarray(tokens), anchors)
    jax.block_until_ready(m["loss"])
t("train_step 128", ts)
# 7. full attack
def atk():
    attack_text_leaf(scorer, state.text_params, tok, texts, anchors, objective="l2", n=RHO, k=1, rng=rng)
t("full attack", atk, n=2)
