"""PEZ hard-prompt inversion (text-embedding → prompt reconstruction).

Re-expression of the reference's fork of "Hard Prompts Made Easy"
(`/root/reference/src/pez/optim_utils.py:26-232`): optimise continuous
prompt embeddings with AdamW, where each step (1) projects every slot
to its nearest vocabulary embedding by cosine similarity
(`nn_project`), (2) scores the *projected* prompt against the target
CLIP features through the text tower's embeddings-input forward
(`encode_text_embedding` — the capability the pez fork patches into
open_clip, `src/pez/open_clip_pez/model.py:204-246`), and (3) applies
the gradient at the projected point to the continuous embeddings
(straight-through).

The whole step — 49408-way nearest-neighbour, text-tower forward,
backward, AdamW update — is ONE jitted computation.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import CLIPConfig


def nn_project(embeds: jnp.ndarray, table: jnp.ndarray):
    """[B, P, D] → (projected embeds, nn ids) by cosine similarity
    against the [V, D] embedding table."""
    q = lclip.l2_normalize(embeds)
    t = lclip.l2_normalize(table)
    sims = jnp.einsum("bpd,vd->bpv", q, t)
    idx = jnp.argmax(sims, axis=-1)
    return table[idx], idx


def optimize_prompt(
    text_params,
    cfg: CLIPConfig,
    target_features,            # [N, D] image (or text) CLIP features
    prompt_len: int = 8,
    iters: int = 100,
    lr: float = 0.1,
    weight_decay: float = 0.1,
    loss_weight: float = 1.0,
    seed: int = 0,
    batch_size: Optional[int] = None,
) -> Dict:
    """Returns {'ids': best prompt ids [P], 'sim': best cosine sim,
    'per_step_sims': history}.  Decode ids with
    `tokenizer.decode(ids)`."""
    tcfg = cfg.text
    table = text_params["token_embedding"]
    D = table.shape[1]
    key = jax.random.PRNGKey(seed)
    k_init, key = jax.random.split(key)

    target = lclip.l2_normalize(jnp.asarray(target_features))

    # init from random vocab ids (reference initialize_prompt)
    init_ids = jax.random.randint(k_init, (1, prompt_len), 0,
                                  tcfg.vocab_size - 2)
    prompt_embeds = table[init_ids]

    # fixed surrounding tokens: SOT + P slots + EOT (+ pad); tokens only
    # drive the argmax-EOT pooling
    tokens = np.zeros((1, tcfg.context_length), np.int32)
    tokens[0, 0] = 49406
    tokens[0, prompt_len + 1] = 49407
    tokens = jnp.asarray(tokens)
    n_pad = tcfg.context_length - prompt_len - 2

    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(prompt_embeds)

    # text_params/target are jit ARGUMENTS (closing over them would
    # bake the whole tower into the module as constants)
    @jax.jit
    def step(text_params, target, prompt_embeds, opt_state):
        table = text_params["token_embedding"]
        sot = table[jnp.asarray([49406])]
        eot = table[jnp.asarray([49407])]
        pad = table[jnp.asarray([0])]
        projected, ids = nn_project(prompt_embeds, table)

        def forward_sim(slot_embeds):
            full = jnp.concatenate(
                [sot[None], slot_embeds,
                 eot[None], jnp.tile(pad[None], (1, n_pad, 1))], axis=1)
            feats = lclip.encode_text_embedding(
                text_params, tcfg, full, tokens, cfg.quick_gelu,
                normalize=True)
            return feats @ target.T  # [1, N]

        def loss_fn(slot_embeds):
            sims = forward_sim(slot_embeds)
            return loss_weight * (1.0 - sims.mean()), sims.mean()

        (loss, mean_sim), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(projected)   # straight-through
        updates, opt_state = tx.update(grads, opt_state, prompt_embeds)
        prompt_embeds = optax.apply_updates(prompt_embeds, updates)
        return prompt_embeds, opt_state, ids, mean_sim

    # reference optimize_prompt_loop subsamples `batch_size` targets
    # per iteration when more targets exist (stochastic multi-image
    # optimisation; also bounds the per-step similarity matrix)
    n_targets = int(target.shape[0])
    subsample = (batch_size is not None and 0 < batch_size < n_targets)

    best_sim = -np.inf
    best_ids = None
    history = []
    for _ in range(iters):
        step_target = target
        if subsample:
            key, sub = jax.random.split(key)
            idx = jax.random.choice(sub, n_targets, (batch_size,),
                                    replace=False)
            step_target = target[idx]
        prompt_embeds, opt_state, ids, sim = step(text_params, step_target,
                                                  prompt_embeds, opt_state)
        sim = float(sim)
        history.append(sim)
        if sim > best_sim:
            best_sim = sim
            best_ids = np.asarray(ids)[0].tolist()
    return {"ids": best_ids, "sim": best_sim, "per_step_sims": history}
