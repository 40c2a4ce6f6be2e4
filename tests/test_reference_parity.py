"""Golden parity against the ACTUAL reference implementation.

When the upstream LEAF checkout is present (developer machines / CI
with the reference mounted at /root/reference), build the reference's
torch models with random weights, convert the state dict into our
pytree, and require matching outputs.  This is the strongest possible
parity gate — the reference asserts the same against HF
(`conversion/convert_2.py:237-265`).

Stubs for ftfy/torchvision (absent in this environment, unused by the
compute path) live in tests/_shims.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference checkout not present")

_SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_shims")


@pytest.fixture(scope="module")
def ref_open_clip():
    for p in (_SHIMS, os.path.join(REFERENCE, "src")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import open_clip
    return open_clip


@pytest.fixture(scope="module")
def torch():
    import torch
    return torch


def test_tokenizer_parity_vs_reference(ref_open_clip):
    """Our tokenizer vs the reference SimpleTokenizer on a battery of
    texts (ftfy shimmed to identity on both sides — ASCII inputs)."""
    from leaf_tpu.tokenizer import get_tokenizer
    ref_tok = ref_open_clip.get_tokenizer("ViT-B-32")
    ours = get_tokenizer()
    texts = [
        "a photo of a cat.", "Wall St. Bears Claw Back Into the Black",
        "don't stop believing!", "x", "", "123 mixed42 tokens",
        "punctuation!@#$%^*()[]{};':\",./<>?",
        "a very long sentence " * 20,
    ]
    ref_ids = ref_tok(texts).numpy()
    our_ids = ours(texts)
    np.testing.assert_array_equal(our_ids, ref_ids.astype(np.int32))


def test_clip_forward_parity_vs_reference(ref_open_clip, torch):
    """Random-init reference CLIP ViT-B-32 → our pytree → identical
    text/image features."""
    import jax.numpy as jnp
    from leaf_tpu.models import clip as lclip, interop
    from leaf_tpu.models.config import get_model_config

    torch.manual_seed(0)
    ref = ref_open_clip.create_model("ViT-B-32", pretrained=None).eval()
    cfg = get_model_config("ViT-B-32")
    params = interop.openclip_to_params(ref.state_dict(), cfg)

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 49406, size=(2, 77))
    tokens[:, 0] = 49406
    eots = [9, 30]
    for i, e in enumerate(eots):
        tokens[i, e] = 49407
        tokens[i, e + 1:] = 0
    images = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        ref_t = ref.encode_text(torch.from_numpy(tokens)).numpy()
        ref_i = ref.encode_image(
            torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()

    our_t = np.asarray(lclip.encode_text(
        params["text"], cfg.text, jnp.asarray(tokens), cfg.quick_gelu))
    our_i = np.asarray(lclip.encode_image(
        params["visual"], cfg.vision, jnp.asarray(images), cfg.quick_gelu))

    np.testing.assert_allclose(our_t, ref_t, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(our_i, ref_i, atol=2e-4, rtol=1e-3)


def test_edit_machinery_parity_vs_reference():
    """Our slot-edit functions vs the reference's generate_sentence —
    imported standalone (utils_attacks has heavy deps; we exec just the
    pure functions it defines up to the wrappers)."""
    import importlib.util
    src = open(os.path.join(REFERENCE, "utils_attacks.py")).read()
    # cut the module at the first attack function — everything above
    # generate_* that we need is pure python + numpy
    marker = "def attack_text_leaf"
    header = src[:src.index(marker)]
    # drop imports of heavy deps
    lines = [l for l in header.splitlines()
             if not any(l.startswith(p) for p in
                        ("import torch", "from torchmetrics", "import nltk",
                         "nltk.download", "from nltk"))]
    ns = {}
    exec("\n".join(lines), ns)  # noqa: S102 — test-only oracle

    from leaf_tpu.attacks import edits
    V = edits.DEFAULT_VOCAB
    assert ns["generate_sentence"] is not None
    rng = np.random.default_rng(0)
    for s in ["cat", "hello world", "a", "Wall St. falls 2%"]:
        total = edits.num_slots(len(s))
        for _ in range(50):
            z = int(rng.integers(total))
            u = int(rng.integers(len(V)))
            ref_out = ns["generate_sentence"](s, z, u, V, k=1, alternative=-1)
            our_out = edits.apply_edit(s, z, u, V, k=1, alternative=-1)
            assert our_out == ref_out, (s, z, u)
        # space-probe enumeration
        ref_all = ns["generate_all_sentences"](s, [ord(" ")], alternative=-1)
        our_all = edits.generate_all_sentences(s, edits.SPACE_VOCAB,
                                               alternative=-1)
        assert our_all == ref_all


def test_coca_forward_parity(ref_open_clip, torch):
    """Random-init reference CoCa → our pytree → matching contrastive
    latents and caption logits."""
    import jax.numpy as jnp
    from leaf_tpu.models import coca as lcoca
    from leaf_tpu.models.coca_interop import coca_openclip_to_params

    torch.manual_seed(0)
    ref = ref_open_clip.create_model("coca_ViT-B-32", pretrained=None).eval()
    # open_clip random-init leaves the caption head's text_projection
    # all-zero, which would make the logits comparison below vacuous
    # (both sides identically zero); randomise it so it discriminates
    with torch.no_grad():
        ref.text_decoder.text_projection.normal_(0, 0.02)
    cfg = lcoca.coca_vit_b_32()
    params = coca_openclip_to_params(ref.state_dict(), cfg)

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 49406, size=(2, 76))
    tokens[:, 0] = 49406
    for i, e in enumerate([10, 40]):
        tokens[i, e] = 49407
        tokens[i, e + 1:] = 0
    images = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        out = ref(torch.from_numpy(images.transpose(0, 3, 1, 2)),
                  torch.from_numpy(tokens))

    import jax
    ours = jax.jit(lambda p, im, t: lcoca.forward(p, cfg, im, t))(
        params, jnp.asarray(images), jnp.asarray(tokens))

    np.testing.assert_allclose(np.asarray(ours["image_features"]),
                               out["image_features"].numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours["text_features"]),
                               out["text_features"].numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours["labels"]),
                               out["labels"].numpy())
    np.testing.assert_allclose(np.asarray(ours["logits"]),
                               out["logits"].numpy(), atol=2e-3, rtol=1e-2)


def _enable_reference_generation(monkeypatch, cm):
    """Re-enable the reference's generation path: its module import of
    transformers helpers fails on the first name (BeamSearchScorer was
    dropped from transformers' public __init__, `coca_model.py:17-43`),
    leaving `_has_transformers=False`.  All the classes still exist —
    BeamSearchScorer at its private module path — so install the REAL
    HF objects into the reference module's namespace."""
    from transformers import (LogitsProcessorList, MaxLengthCriteria,
                              MinLengthLogitsProcessor,
                              RepetitionPenaltyLogitsProcessor,
                              StoppingCriteriaList, TopKLogitsWarper,
                              TopPLogitsWarper)
    from transformers.generation.beam_search import BeamSearchScorer
    for name, val in (("BeamSearchScorer", BeamSearchScorer),
                      ("LogitsProcessorList", LogitsProcessorList),
                      ("MinLengthLogitsProcessor", MinLengthLogitsProcessor),
                      ("RepetitionPenaltyLogitsProcessor",
                       RepetitionPenaltyLogitsProcessor),
                      ("MaxLengthCriteria", MaxLengthCriteria),
                      ("StoppingCriteriaList", StoppingCriteriaList),
                      ("_has_transformers", True),
                      ("GENERATION_TYPES",
                       {"top_k": TopKLogitsWarper,
                        "top_p": TopPLogitsWarper,
                        "beam_search": "beam_search"})):
        monkeypatch.setattr(cm, name, val, raising=False)


def test_coca_generation_decision_parity(ref_open_clip, torch, monkeypatch):
    """Greedy caption generation decisions vs the reference's OWN
    HF-style sampling loop (`coca_model.py:204-327`, top_k=1): same
    random-init weights → token-for-token identical captions,
    including the MinLengthLogitsProcessor EOS block, the forced EOS
    in the final slot (MaxLengthCriteria counts the SOT), and the
    RepetitionPenaltyLogitsProcessor discount.

    The installed transformers dropped BeamSearchScorer from its PUBLIC
    API, so the reference module self-disabled generation at import
    (`coca_model.py:17-43`) — but every helper it names still exists
    (BeamSearchScorer at its private path), so the loop under test runs
    with the real HF classes, exactly as the reference shipped."""
    import jax.numpy as jnp
    from leaf_tpu.models import coca as lcoca
    from leaf_tpu.models.coca_interop import coca_openclip_to_params

    import open_clip.coca_model as cm
    _enable_reference_generation(monkeypatch, cm)

    torch.manual_seed(0)
    ref = ref_open_clip.create_model("coca_ViT-B-32", pretrained=None).eval()
    # open_clip random-init leaves the caption head's text_projection
    # all-zero → identically-zero logits, which would make greedy
    # decisions vacuous (argmax over zeros); randomise it like the RN50
    # test randomises BN running stats
    with torch.no_grad():
        ref.text_decoder.text_projection.normal_(0, 0.02)
    cfg = lcoca.coca_vit_b_32()
    import jax
    params = jax.tree.map(jnp.asarray,
                          coca_openclip_to_params(ref.state_dict(), cfg))

    rng = np.random.default_rng(3)
    images = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    img_t = torch.from_numpy(images.transpose(0, 3, 1, 2))
    key = jax.random.PRNGKey(0)  # unused at top_k=1 (argmax)

    for rep_pen, min_len in ((1.0, 5), (1.3, 3)):
        with torch.no_grad():
            ref_out = ref.generate(
                img_t, generation_type="top_k", top_k=1, seq_len=12,
                min_seq_len=min_len, repetition_penalty=rep_pen).numpy()
        ours = np.asarray(lcoca.generate(
            params, cfg, jnp.asarray(images), key, seq_len=12, top_k=1,
            min_seq_len=min_len, repetition_penalty=rep_pen))
        L = ref_out.shape[1]
        np.testing.assert_array_equal(
            ours[:, :L], ref_out,
            err_msg=f"rep_pen={rep_pen} min_len={min_len}")
        assert (ours[:, L:] == cfg.pad_id).all()


def test_coca_beamsearch_decision_parity(ref_open_clip, torch, monkeypatch):
    """Group beam search decisions vs the reference's OWN
    `_generate_beamsearch` (`coca_model.py:329-476`) running the REAL
    HF BeamSearchScorer (imported from its private module path — see
    _enable_reference_generation): same random-init weights →
    token-for-token identical captions across group/beam shapes,
    min-length blocks, and a repetition-penalty recipe.  This pins the
    whole chain our jitted scan re-implements: raw-logit accumulation,
    the -1e9 beam init, the sorted 2*bg candidate buffer with
    rank<bg EOS routing into replace-worst hypothesis pools, the
    early_stopping=False retirement heuristic, and finalize's
    normalisation + EOS append."""
    import jax
    import jax.numpy as jnp
    from leaf_tpu.models import coca as lcoca
    from leaf_tpu.models.coca_interop import coca_openclip_to_params

    import open_clip.coca_model as cm
    _enable_reference_generation(monkeypatch, cm)

    torch.manual_seed(0)
    ref = ref_open_clip.create_model("coca_ViT-B-32", pretrained=None).eval()
    with torch.no_grad():
        ref.text_decoder.text_projection.normal_(0, 0.02)
    cfg = lcoca.coca_vit_b_32()
    params = jax.tree.map(jnp.asarray,
                          coca_openclip_to_params(ref.state_dict(), cfg))

    rng = np.random.default_rng(7)
    images = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    img_t = torch.from_numpy(images.transpose(0, 3, 1, 2))

    for K, G, min_len, rep_pen, seq_len in ((6, 3, 5, 1.0, 12),
                                            (4, 2, 3, 1.3, 10),
                                            (2, 1, 2, 1.0, 15)):
        with torch.no_grad():
            ref_out = ref.generate(
                img_t, generation_type="beam_search", num_beams=K,
                num_beam_groups=G, min_seq_len=min_len, seq_len=seq_len,
                repetition_penalty=rep_pen,
                fixed_output_length=True).numpy()
        ours = np.asarray(lcoca.generate_beamsearch(
            params, cfg, jnp.asarray(images), num_beams=K,
            num_beam_groups=G, min_seq_len=min_len, seq_len=seq_len,
            repetition_penalty=rep_pen))
        assert ref_out.shape[1] == seq_len
        np.testing.assert_array_equal(
            ours[:, :seq_len], ref_out,
            err_msg=f"K={K} G={G} min={min_len} rep={rep_pen}")
        assert (ours[:, seq_len:] == cfg.pad_id).all()


def test_rn50_forward_parity(ref_open_clip, torch):
    """Random-init reference RN50 vision tower → our pytree → identical
    image features (BN inference mode)."""
    import jax
    import jax.numpy as jnp
    from leaf_tpu.models.resnet import (
        ResNetVisionConfig,
        encode_image_resnet,
        resnet_openclip_to_params,
    )

    torch.manual_seed(0)
    ref = ref_open_clip.create_model("RN50", pretrained=None).eval()
    # randomise BN running stats so the test exercises them
    with torch.no_grad():
        for m in ref.visual.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    cfg = ResNetVisionConfig(layers=(3, 4, 6, 3), width=64, image_size=224,
                             heads=32, output_dim=1024)
    params = resnet_openclip_to_params(ref.state_dict(), "visual.", cfg)

    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.encode_image(
            torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(jax.jit(
        lambda p, im: encode_image_resnet(p, cfg, im))(
            params, jnp.asarray(images)))
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=1e-3)


def test_rn50_full_model_via_factory(ref_open_clip, torch):
    """Full RN50 CLIP through create_model-style conversion: get_logits
    parity vs the reference model."""
    import jax
    import jax.numpy as jnp
    from leaf_tpu.models import clip as lclip, interop
    from leaf_tpu.models.config import get_model_config

    torch.manual_seed(1)
    ref = ref_open_clip.create_model("RN50", pretrained=None).eval()
    cfg = get_model_config("RN50")
    params = interop.openclip_to_params(ref.state_dict(), cfg)

    rng = np.random.default_rng(1)
    tokens = rng.integers(1, 49406, size=(2, 77))
    tokens[:, 0] = 49406
    tokens[:, 20] = 49407
    tokens[:, 21:] = 0
    images = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        ref_i = ref.encode_image(
            torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()
        ref_t = ref.encode_text(torch.from_numpy(tokens)).numpy()

    ours_i = np.asarray(jax.jit(
        lambda p, im: lclip.encode_image_model(p, cfg, im))(
            params, jnp.asarray(images)))
    ours_t = np.asarray(jax.jit(
        lambda p, t: lclip.encode_text(p["text"], cfg.text, t,
                                       cfg.quick_gelu))(
            params, jnp.asarray(tokens)))
    np.testing.assert_allclose(ours_i, ref_i, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(ours_t, ref_t, atol=5e-4, rtol=1e-3)


def _extract_block(src: str, header: str) -> str:
    """Slice a top-level def/class block out of module source: from the
    line starting with `header` to the next top-level def/class."""
    start = src.index(header)
    rest = src[start + 1:]
    ends = [rest.find("\ndef "), rest.find("\nclass ")]
    ends = [e for e in ends if e != -1]
    return src[start:start + 1 + min(ends)] if ends else src[start:]


class _SharedStreamDraws:
    """Attack randomness drawn lazily from a private stream, recording
    every `(n, size, replace)` call.  Both sides of the trajectory test
    run one instance seeded identically: as long as the two
    implementations issue the same call sequence they receive the same
    draws — and for k>1 the call sequence itself depends on the
    evolving sentences (round r+1's position space is
    ``2*len(winner)+1``), so a winner divergence on either side
    surfaces as a call-log mismatch instead of silent drift.  Pre-drawn
    schedules cannot cover k>1 because the draw spaces aren't known
    until the previous round's winner is scored."""

    def __init__(self, seed):
        self._rng = np.random.default_rng(seed)
        self.log = []

    def choice(self, a, size=None, replace=True):
        n = int(a) if isinstance(a, (int, np.integer)) else len(a)
        self.log.append((n, int(size), bool(replace)))
        return self._rng.choice(n, size=size, replace=replace)


class _RandomProxy:
    def __init__(self, real, stub):
        self._real, self._stub = real, stub

    def choice(self, a, size=None, replace=True):
        return self._stub.choice(a, size=size, replace=replace)

    def __getattr__(self, name):
        return getattr(self._real, name)


class _NumpyProxy:
    """numpy with `random.choice` redirected to the schedule."""

    def __init__(self, stub):
        self.random = _RandomProxy(np.random, stub)

    def __getattr__(self, name):
        return getattr(np, name)


@pytest.mark.parametrize("k_adv,constrain,n_steps", [
    (1, True, 24),   # the released-model recipe (pipelined k=1 path)
    (2, True, 10),   # multi-round: round 2 retokenises round-1 winners
    (1, False, 10),  # unconstrained recipe (train_AT default)
])
def test_train_trajectory_parity_vs_reference(ref_open_clip, torch, tmp_path,
                                              monkeypatch, k_adv, constrain,
                                              n_steps):
    """Integrated LEAF training trajectory vs the reference's
    OWN `train_one_epoch_text_only` (`utils_AT.py:262-426`) driving its
    OWN `attack_text_leaf` (`utils_attacks.py:297-393`), exec'd from
    source in CPU torch: same tiny CLIP weights (via interop), same
    captions, same shared-stream attack randomness,
    AdamW + weight-decay mask + grad clipping on both sides.  Asserts
    the per-step TextFARE losses and the final trained parameters
    agree — the compositional gate the per-component parity tests
    cannot provide (VERDICT r3 next #2).  The k=2 case additionally
    pins the multi-round composition: round 2's position space is
    ``2*len(round-1 winner)+1``, so the call-log equality check at the
    end fails if the two sides ever disagree on a winner."""
    import contextlib
    import types

    import jax
    import jax.numpy as jnp

    from leaf_tpu.attacks import edits
    from leaf_tpu.attacks.constraint import WordConstraint, word_tokenize
    from leaf_tpu.models import interop
    from leaf_tpu.models.config import get_model_config
    from leaf_tpu.tokenizer import get_tokenizer
    from leaf_tpu.train.fused import FusedLeafStep
    from leaf_tpu.train.optim import make_optimizer
    from leaf_tpu.train.step import TrainState

    monkeypatch.chdir(tmp_path)  # the ref loop writes times_*.csv to cwd
    N_STEPS, BS, RHO = n_steps, 4, 6
    LR, WD, CLIP_NORM = 1e-3, 1e-4, 1.0
    V = list(edits.DEFAULT_VOCAB)
    wc = WordConstraint()

    # -- shared caption stream (real words so the constraint binds) ----
    word_pool = ("the cat market stocks rally falls government quick "
                 "brown tech announces fox giant jumps discover lazy "
                 "ancient dog new world final policy").split()
    cap_rng = np.random.default_rng(7)
    batches = [[" ".join(cap_rng.choice(word_pool, size=5))
                for _ in range(BS)] for _ in range(N_STEPS)]

    # -- reference side: tiny CLIP + exec'd attack + exec'd train loop -
    from open_clip.model import CLIP, CLIPTextCfg, CLIPVisionCfg
    torch.manual_seed(3)
    ref = CLIP(embed_dim=64,
               vision_cfg=CLIPVisionCfg(layers=2, width=64, head_width=64,
                                        patch_size=16, image_size=64),
               text_cfg=CLIPTextCfg(context_length=77, vocab_size=49408,
                                    width=64, heads=2, layers=2),
               quick_gelu=False)
    for p in ref.visual.parameters():
        p.requires_grad = False
    init_state_dict = {k: v.clone() for k, v in ref.state_dict().items()}
    from copy import deepcopy
    ref_frozen = deepcopy(ref).eval()

    atk_src = open(os.path.join(REFERENCE, "utils_attacks.py")).read()
    atk_hdr = atk_src[:atk_src.index("def attack_text_bruteforce")]
    atk_lines = [l for l in atk_hdr.splitlines()
                 if not any(l.startswith(p) for p in
                            ("from torchmetrics", "import nltk",
                             "nltk.download", "from nltk"))]

    class _WordsStub:
        def words(self):
            return list(wc.words)

    atk_ns = {"words": _WordsStub(), "word_tokenize": word_tokenize}
    exec("\n".join(atk_lines), atk_ns)  # noqa: S102 — test-only oracle
    ref_sched = _SharedStreamDraws(42)
    atk_ns["np"] = _NumpyProxy(ref_sched)

    at_src = open(os.path.join(REFERENCE, "utils_AT.py")).read()
    loop_ns = {
        "torch": torch, "F": torch.nn.functional, "math": __import__("math"),
        "time": __import__("time"), "logging": __import__("logging"),
        "np": np, "wandb": None,
        "pd": types.SimpleNamespace(
            DataFrame=lambda *a, **k: types.SimpleNamespace(
                to_csv=lambda *a2, **k2: None)),
        "is_master": lambda args: True,
        "get_autocast": lambda precision: contextlib.nullcontext,
        "get_input_dtype": lambda precision: torch.float32,
        "attack_text": atk_ns["attack_text_leaf"],
        "attack_text_charmer_inference": None,
    }
    for block in ("class AverageMeter", "def unwrap_model", "def backward",
                  "def train_one_epoch_text_only"):
        exec(_extract_block(at_src, block), loop_ns)  # noqa: S102

    ref_losses = []
    real_backward = loop_ns["backward"]

    def recording_backward(total_loss, scaler):
        ref_losses.append(float(total_loss.item()))
        real_backward(total_loss, scaler)
    loop_ns["backward"] = recording_backward

    exclude = lambda n, p: (p.ndim < 2 or "bn" in n or "ln" in n  # noqa: E731
                            or "bias" in n or "logit_scale" in n)
    named = [(n, p) for n, p in ref.named_parameters() if p.requires_grad]
    opt = torch.optim.AdamW(
        [{"params": [p for n, p in named if exclude(n, p)],
          "weight_decay": 0.0},
         {"params": [p for n, p in named if not exclude(n, p)],
          "weight_decay": WD}],
        lr=LR, betas=(0.9, 0.98), eps=1e-6)

    class _Loader:
        def __init__(self, bs):
            self._b = bs
            self.num_batches = len(bs)
            self.num_samples = sum(len(t) for _, t in bs)

        def __iter__(self):
            return iter(self._b)

    loader = _Loader([(None, list(t)) for t in batches])
    data = {"train": types.SimpleNamespace(dataloader=loader,
                                           set_epoch=lambda e: None)}
    args = types.SimpleNamespace(
        device="cpu", precision="fp32", accum_freq=1, skip_scheduler=True,
        use_charmer=False, rho=RHO, k_adv=k_adv, constrain=constrain,
        normalize_fare=False, grad_clip_norm=CLIP_NORM, horovod=False,
        log_every_n_steps=10 ** 6, batch_size=BS, world_size=1, wandb=False)
    ref_tok = ref_open_clip.get_tokenizer("ViT-B-32")

    # attack_text_leaf's default V matches train_AT_text_only.py:93, but
    # pass ours explicitly so index→char is identical by construction
    loop_ns["attack_text"] = lambda *a, **k: atk_ns["attack_text_leaf"](
        *a, **{**k, "V": V})
    loop_ns["train_one_epoch_text_only"](
        ref, ref_frozen, ref_tok, V, data, None, 0, opt, None, None, args)
    assert len(ref_losses) == N_STEPS
    # per attack round: BS position draws then BS char draws
    assert len(ref_sched.log) == N_STEPS * k_adv * 2 * BS

    # -- our side: identical weights, fused production step -----------
    cfg = get_model_config("ViT-tiny-test")
    params = interop.openclip_to_params(init_state_dict, cfg)
    tx = make_optimizer(LR, weight_decay=WD, beta1=0.9, beta2=0.98,
                        eps=1e-6, grad_clip_norm=CLIP_NORM)
    state = TrainState.create(jax.tree.map(jnp.asarray, params["text"]), tx)
    frozen_text = jax.tree.map(jnp.asarray, params["text"])
    fused = FusedLeafStep(cfg, tx, get_tokenizer(), rho=RHO, k=k_adv,
                          dtype=jnp.float32, objective="l2",
                          constraint=WordConstraint() if constrain else None)
    our_sched = _SharedStreamDraws(42)
    our_losses = []
    for texts in batches:
        state, info = fused(state, frozen_text, texts, our_sched)
        our_losses.append(float(np.asarray(info["metrics"]["loss"])))
    # identical draw-call sequences = identical randomness; for k>1 the
    # round-2 position spaces depend on round-1 winners, so this also
    # asserts both sides crowned the same winners every round
    assert our_sched.log == ref_sched.log

    # per-step loss trajectories agree to fp32 tolerance
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=1e-5)

    # and the trained weights themselves agree at the end
    final_ref = interop.openclip_to_params(
        {k: v.detach() for k, v in ref.state_dict().items()}, cfg)
    jax.tree.map(
        lambda ours, theirs: np.testing.assert_allclose(
            np.asarray(ours), np.asarray(theirs), rtol=1e-3, atol=5e-4),
        state.text_params, final_ref["text"])


def _scrub_k_gauge(path, x):
    """Zero the K slice of attention qkv biases before a trained-param
    comparison.  The K bias is a gauge direction: adding a constant
    vector to every key shifts all of a query's logits equally, which
    softmax ignores — its true gradient is exactly zero.  Adam divides
    the fp-noise gradient there by its own magnitude, so the K bias
    performs an independent ±lr random walk on EACH side (measured:
    every other leaf agrees to ~1e-8 after a step while K-bias elements
    differ by ~lr).  Trajectory tests pair this scrub with a
    feature-level check proving the scrub hides no real drift."""
    x = np.array(x)
    if any(getattr(k, "key", None) == "qkv_b" for k in path):
        w = x.shape[-1] // 3
        x[..., w:2 * w] = 0
    return x


def test_fare_train_trajectory_parity_vs_reference(ref_open_clip, torch,
                                                   monkeypatch):
    """Integrated FARE training trajectory vs the reference's OWN
    `train_one_epoch` + `pgd` (`robust_vlm/train/
    adversarial_training_clip.py:309-497`, `pgd_train.py:6-66`), exec'd
    from source in CPU torch: same tiny CLIP weights (via interop),
    same image stream, same PGD init perturbations (the only
    randomness, injected into both sides), same AdamW(wd on all
    params) + robust_vlm cosine/warmup schedule.  Asserts per-step
    adversarial losses and the final trained vision tower agree — the
    FARE counterpart of the LEAF trajectory gate above: it pins the
    composition (frozen-anchor encode, inner PGD on the live tower,
    embedding-L2 outer step, schedule stepping order) that the
    per-component PGD/loss/forward parity tests cannot."""
    import types

    import jax
    import jax.numpy as jnp

    from leaf_tpu.attacks.image import pgd as our_pgd
    from leaf_tpu.models import interop
    from leaf_tpu.models.config import get_model_config
    from leaf_tpu.models.preprocess import (OPENAI_DATASET_MEAN,
                                            OPENAI_DATASET_STD)
    from leaf_tpu.train import fare as fare_mod

    N_STEPS, BS, IMG = 8, 4, 64
    EPS, ITER, STEP_SZ = 4 / 255, 5, 1 / 255
    LR, WD, WARMUP = 1e-3, 1e-4, 2

    # -- shared image stream + shared PGD init perturbations (NHWC) ----
    rng = np.random.default_rng(11)
    images = rng.uniform(0, 1, (N_STEPS, BS, IMG, IMG, 3)).astype(np.float32)
    perts = rng.uniform(-EPS, EPS,
                        (N_STEPS, BS, IMG, IMG, 3)).astype(np.float32)

    # -- reference side: tiny CLIP + exec'd trainer ---------------------
    from open_clip.model import CLIP, CLIPTextCfg, CLIPVisionCfg
    torch.manual_seed(5)
    ref = CLIP(embed_dim=64,
               vision_cfg=CLIPVisionCfg(layers=2, width=64, head_width=64,
                                        patch_size=16, image_size=IMG),
               text_cfg=CLIPTextCfg(context_length=77, vocab_size=49408,
                                    width=64, heads=2, layers=2),
               quick_gelu=False)
    init_state_dict = {k: v.clone() for k, v in ref.state_dict().items()}

    ROBUST = os.path.join(REFERENCE, "src", "robust_vlm", "train")
    util_src = open(os.path.join(ROBUST, "utils.py")).read()
    at_src = open(os.path.join(ROBUST, "adversarial_training_clip.py")).read()
    pgd_src = open(os.path.join(ROBUST, "pgd_train.py")).read()

    recorded = {}

    class _RecMeter:
        """AverageMeter stand-in that records every update by name."""

        def __init__(self, name, fmt=":f"):
            self.vals = recorded.setdefault(name, [])
            self.val = self.avg = 0.0

        def update(self, val, n=1):
            self.vals.append(float(val))
            self.val = val

    ns = {"torch": torch, "F": torch.nn.functional, "np": np,
          "time": __import__("time"), "logging": __import__("logging"),
          "os": os, "wandb": None, "evaluate": None, "unwrap_model": None,
          "AverageMeter": _RecMeter, "apgd": None,
          # ClipVisionModel only isinstance-checks transformers.CLIPModel
          "transformers": types.SimpleNamespace(CLIPModel=())}
    for block in ("def assign_learning_rate", "def _warmup_lr",
                  "def cosine_lr", "def project_perturbation",
                  "def normalize_grad"):
        exec(_extract_block(util_src, block), ns)  # noqa: S102 — oracle
    exec(_extract_block(pgd_src, "def pgd"), ns)  # noqa: S102
    for block in ("class ClipVisionModel", "class ComputeLossWrapper",
                  "def compute_acc", "def compute_loss", "def l2",
                  "def l1", "def ce", "def train_one_epoch"):
        exec(_extract_block(at_src, block), ns)  # noqa: S102

    # inject the shared init perturbation (the loop draws it inline:
    # `torch.zeros_like(data).uniform_(-eps, eps)`, :352)
    real_pgd, ctr = ns["pgd"], {"i": 0}

    def pgd_shared_init(**kw):
        p0 = perts[ctr["i"]].transpose(0, 3, 1, 2).copy()
        ctr["i"] += 1
        kw["perturbation"] = torch.tensor(p0).requires_grad_(True)
        return real_pgd(**kw)
    ns["pgd"] = pgd_shared_init

    # the reference loop is CUDA-hardwired; run its .cuda() as identity
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)

    mean_t = torch.tensor(OPENAI_DATASET_MEAN).view(1, 3, 1, 1)
    std_t = torch.tensor(OPENAI_DATASET_STD).view(1, 3, 1, 1)
    model = ns["ClipVisionModel"](
        model=ref, args=None, normalize=lambda x: (x - mean_t) / std_t)
    from copy import deepcopy
    model_orig = deepcopy(model).eval()
    opt = torch.optim.AdamW(model.model.parameters(), lr=LR,
                            weight_decay=WD)
    scheduler = ns["cosine_lr"](opt, LR, WARMUP, N_STEPS)
    scheduler(0)  # reference main(): scheduler(args.start_step), :220

    args = types.SimpleNamespace(
        attack="pgd", norm="linf", eps=EPS, iterations_adv=ITER,
        stepsize_adv=STEP_SZ, output_normalize=False, inner_loss="l2",
        loss="l2", loss_clean="l2", clean_weight=0.0, trades=False,
        steps=N_STEPS, total_epochs=1, eval_freq=10 ** 6,
        log_freq=10 ** 6, save_checkpoints=False, output_dir="")
    loader = [(torch.tensor(b.transpose(0, 3, 1, 2).copy()),
               ["cap"] * BS) for b in images]
    steps_done = ns["train_one_epoch"](
        0, model, model_orig, loader, opt, scheduler, None, None, args,
        epoch=0)
    assert steps_done == N_STEPS and ctr["i"] == N_STEPS
    ref_losses = recorded["loss"]

    # -- our side: identical weights through train_fare ----------------
    cfg = get_model_config("ViT-tiny-test")
    params = jax.tree.map(jnp.asarray,
                          interop.openclip_to_params(init_state_dict, cfg))
    fcfg = fare_mod.FareConfig(
        steps=N_STEPS, warmup=WARMUP, batch_size=BS, lr=LR, wd=WD,
        attack="pgd", norm="linf", eps=EPS, iterations_adv=ITER,
        stepsize_adv=STEP_SZ, clean_weight=0.0, output_normalize=False,
        log_freq=10 ** 6, fallback_freq=0, eval_freq=10 ** 6, remat=False)

    def fake_make_attack(cfg_, fcfg_, dtype=jnp.float32):
        ctr2 = {"i": 0}

        def attack(visual_params, imgs, embedding_orig, targets, cls, key):
            def loss_fn(x_adv):
                emb = fare_mod.encode_vision(visual_params, cfg_, x_adv,
                                             fcfg_.output_normalize, dtype)
                return fare_mod.embedding_loss(fcfg_.inner_loss, emb,
                                               embedding_orig,
                                               reduction="mean")
            p0 = jnp.asarray(perts[ctr2["i"]])
            ctr2["i"] += 1
            return our_pgd(loss_fn, imgs, norm=fcfg_.norm, eps=fcfg_.eps,
                           iterations=fcfg_.iterations_adv,
                           stepsize=fcfg_.stepsize_adv, mode="max",
                           perturbation=p0)
        return attack

    monkeypatch.setattr(fare_mod, "make_fare_attack", fake_make_attack)
    our_losses = []
    out = fare_mod.train_fare(
        params, cfg, fcfg, iter([(b, None) for b in images]),
        on_step=lambda stp, m: our_losses.append(m["loss"]))
    assert out["steps"] == N_STEPS

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3, atol=1e-5)

    final_ref = interop.openclip_to_params(
        {k: v.detach() for k, v in ref.state_dict().items()}, cfg)

    import jax.tree_util as jtu
    jax.tree.map(
        lambda ours, theirs: np.testing.assert_allclose(
            ours, theirs, rtol=2e-3, atol=1e-3),
        jtu.tree_map_with_path(_scrub_k_gauge, out["params"]["visual"]),
        jtu.tree_map_with_path(_scrub_k_gauge, final_ref["visual"]))

    # functional equivalence of the two trained towers on fresh images
    # (covers the scrubbed gauge slice: K-bias cannot change features)
    probe = rng.uniform(0, 1, (BS, IMG, IMG, 3)).astype(np.float32)
    ours_emb = np.asarray(fare_mod.encode_vision(
        out["params"]["visual"], cfg, jnp.asarray(probe), False))
    with torch.no_grad():
        ref_emb = model(torch.tensor(probe.transpose(0, 3, 1, 2).copy()),
                        output_normalize=False).numpy()
    np.testing.assert_allclose(ours_emb, ref_emb, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("accum_freq", [1, 2])
def test_contrastive_train_trajectory_parity_vs_reference(
        ref_open_clip, torch, accum_freq):
    """Integrated contrastive training trajectory vs the reference's
    OWN `train_one_epoch` + ClipLoss (`open_clip_train/train.py:70-246`,
    `open_clip/loss.py`), exec'd/imported in CPU torch: same tiny CLIP
    weights, same normalized-image + token batches, AdamW with the
    gain-or-bias decay split (`main.py:311-326`), the open_clip cosine
    warmup schedule, grad clipping, and the post-step ln(100)
    logit-scale clamp.  accum_freq=2 exercises the feature-cache
    gradient accumulation (`train.py:120-136`): cached no-grad
    features of all microbatches, per-microbatch re-forward spliced
    into the global negatives matrix, per-microbatch backward SUMMED
    (not averaged) into one optimizer step — composition the smoke
    tests never checked against the reference."""
    import contextlib
    import types

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from leaf_tpu.models import interop
    from leaf_tpu.models.config import get_model_config
    from leaf_tpu.train.contrastive import (
        make_accum_contrastive_train_step, make_contrastive_train_step)
    from leaf_tpu.train.optim import make_optimizer
    from leaf_tpu.train.schedules import make_scheduler
    from leaf_tpu.train.step import TrainState

    N_BATCHES, BS, IMG = 8, 4, 64
    N_STEPS = N_BATCHES // accum_freq
    LR, WD, WARMUP, CLIP_NORM = 1e-3, 0.1, 2, 1.0
    BETA1, BETA2, EPS_ADAM = 0.9, 0.98, 1e-6

    rng = np.random.default_rng(23)
    # already-normalized model inputs (the pipelines normalize upstream)
    images = rng.normal(0, 1, (N_BATCHES, BS, IMG, IMG, 3)) \
        .astype(np.float32)
    word_pool = ("a photo of the cat dog market rally tech fox giant "
                 "ancient world policy").split()
    caps = [[" ".join(rng.choice(word_pool, size=5)) for _ in range(BS)]
            for _ in range(N_BATCHES)]
    ref_tok = ref_open_clip.get_tokenizer("ViT-B-32")
    tokens = [ref_tok(c) for c in caps]  # shared token batches

    # -- reference side ------------------------------------------------
    from open_clip.loss import ClipLoss
    from open_clip.model import CLIP, CLIPTextCfg, CLIPVisionCfg
    torch.manual_seed(9)
    ref = CLIP(embed_dim=64,
               vision_cfg=CLIPVisionCfg(layers=2, width=64, head_width=64,
                                        patch_size=16, image_size=IMG),
               text_cfg=CLIPTextCfg(context_length=77, vocab_size=49408,
                                    width=64, heads=2, layers=2),
               quick_gelu=False, output_dict=True)
    init_state_dict = {k: v.clone() for k, v in ref.state_dict().items()}

    OCT = os.path.join(REFERENCE, "src", "open_clip_train")
    tr_src = open(os.path.join(OCT, "train.py")).read()
    sch_src = open(os.path.join(OCT, "scheduler.py")).read()
    ns = {"torch": torch, "math": __import__("math"), "np": np,
          "time": __import__("time"), "logging": __import__("logging"),
          "wandb": None, "is_master": lambda args, local=False: True,
          "get_autocast": lambda precision: contextlib.nullcontext,
          "get_input_dtype": lambda precision: torch.float32}
    for block in ("def assign_learning_rate", "def _warmup_lr",
                  "def cosine_lr"):
        exec(_extract_block(sch_src, block), ns)  # noqa: S102 — oracle
    for block in ("class AverageMeter", "def unwrap_model",
                  "def backward", "def train_one_epoch"):
        exec(_extract_block(tr_src, block), ns)  # noqa: S102

    ref_losses = []
    real_backward = ns["backward"]

    def recording_backward(total_loss, scaler):
        ref_losses.append(float(total_loss.item()))
        real_backward(total_loss, scaler)
    ns["backward"] = recording_backward

    exclude = lambda n, p: (p.ndim < 2 or "bn" in n or "ln" in n  # noqa: E731
                            or "bias" in n or "logit_scale" in n)
    named = list(ref.named_parameters())
    opt = torch.optim.AdamW(
        [{"params": [p for n, p in named if exclude(n, p)],
          "weight_decay": 0.0},
         {"params": [p for n, p in named if not exclude(n, p)],
          "weight_decay": WD}],
        lr=LR, betas=(BETA1, BETA2), eps=EPS_ADAM)
    scheduler = ns["cosine_lr"](opt, LR, WARMUP, N_STEPS)

    class _Loader:
        def __init__(self, batches):
            self._b = batches
            self.num_batches = len(batches)
            self.num_samples = len(batches) * BS

        def __iter__(self):
            return iter(self._b)

    loader = _Loader([(torch.tensor(b.transpose(0, 3, 1, 2).copy()), t)
                      for b, t in zip(images, tokens)])
    data = {"train": types.SimpleNamespace(dataloader=loader,
                                           set_epoch=lambda e: None)}
    args = types.SimpleNamespace(
        device="cpu", precision="fp32", distill=False, horovod=False,
        skip_scheduler=False, accum_freq=accum_freq, batch_size=BS,
        world_size=1, wandb=False, log_every_n_steps=10 ** 6,
        grad_clip_norm=CLIP_NORM)
    loss = ClipLoss(local_loss=False, gather_with_grad=False,
                    cache_labels=True, rank=0, world_size=1)
    ns["train_one_epoch"](ref, data, loss, 0, opt, None, scheduler, None,
                          args)
    assert len(ref_losses) == N_BATCHES  # one backward per microbatch
    # per optimizer step the reference backwards accum_freq losses
    ref_step_losses = np.asarray(ref_losses).reshape(
        N_STEPS, accum_freq).mean(axis=1)

    # -- our side: identical weights through the driver's step fns -----
    cfg = get_model_config("ViT-tiny-test")
    params = jax.tree.map(jnp.asarray,
                          interop.openclip_to_params(init_state_dict, cfg))
    schedule = make_scheduler("cosine", LR, WARMUP, N_STEPS)
    tx = make_optimizer(lambda step: jnp.asarray(schedule(step)),
                        weight_decay=WD, beta1=BETA1, beta2=BETA2,
                        eps=EPS_ADAM, grad_clip_norm=CLIP_NORM)
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    if accum_freq == 1:
        step_fn = make_contrastive_train_step(cfg, tx, mesh=None,
                                              local_loss=False)
        feed = [(jnp.asarray(images[i]),
                 jnp.asarray(np.asarray(tokens[i]), jnp.int32))
                for i in range(N_BATCHES)]
    else:
        step_fn = make_accum_contrastive_train_step(cfg, tx,
                                                    accum_freq=accum_freq)
        feed = [(jnp.asarray(images[s * accum_freq:(s + 1) * accum_freq]),
                 jnp.asarray(np.stack(
                     [np.asarray(t) for t in
                      tokens[s * accum_freq:(s + 1) * accum_freq]]),
                     jnp.int32))
                for s in range(N_STEPS)]
    our_losses = []
    for im, tk in feed:
        state, metrics = step_fn(state, im, tk)
        our_losses.append(float(np.asarray(metrics["loss"])))

    np.testing.assert_allclose(our_losses, ref_step_losses, rtol=2e-3,
                               atol=1e-5)

    final_ref = interop.openclip_to_params(
        {k: v.detach() for k, v in ref.state_dict().items()}, cfg)
    jax.tree.map(
        lambda ours, theirs: np.testing.assert_allclose(
            np.asarray(ours), np.asarray(theirs), rtol=2e-3, atol=1e-3),
        jtu.tree_map_with_path(_scrub_k_gauge, state.text_params),
        jtu.tree_map_with_path(_scrub_k_gauge, final_ref))

    # functional equivalence of the trained models on fresh inputs
    # (covers the scrubbed K-gauge slices)
    from leaf_tpu.models import clip as lclip
    probe_im = rng.normal(0, 1, (BS, IMG, IMG, 3)).astype(np.float32)
    probe_tk = ref_tok([" ".join(rng.choice(word_pool, size=4))
                        for _ in range(BS)])
    ours_out = lclip.forward(state.text_params, cfg,
                             jnp.asarray(probe_im),
                             jnp.asarray(np.asarray(probe_tk), jnp.int32),
                             jnp.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(probe_im.transpose(0, 3, 1, 2).copy()),
                      probe_tk)
    np.testing.assert_allclose(np.asarray(ours_out["image_features"]),
                               ref_out["image_features"].numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours_out["text_features"]),
                               ref_out["text_features"].numpy(),
                               rtol=2e-3, atol=2e-4)


def test_loss_value_and_grad_parity_vs_reference(ref_open_clip, torch):
    """Every training loss family — Clip, SigLip, CoCa, DistillClip —
    against the reference's OWN loss classes (`open_clip/loss.py`,
    world_size=1): values AND input gradients (features + logit scale),
    pinning sign/scale conventions, the SigLIP 1/n normalisation, the
    CoCa ignore_index caption masking, and the distill soft-CE exactly.
    The multi-shard forms are pinned separately by the local==global
    invariance tests in test_loss.py; this gate anchors the
    single-shard math they reduce to."""
    import jax
    import jax.numpy as jnp

    from leaf_tpu.models import loss as L

    from open_clip.loss import (ClipLoss, CoCaLoss, DistillClipLoss,
                                SigLipLoss)

    B, D, V, S = 6, 16, 50, 12
    rng = np.random.default_rng(31)
    img = rng.normal(0, 1, (B, D)).astype(np.float32)
    txt = rng.normal(0, 1, (B, D)).astype(np.float32)
    t_img = rng.normal(0, 1, (B, D)).astype(np.float32)   # teacher
    t_txt = rng.normal(0, 1, (B, D)).astype(np.float32)
    cap_logits = rng.normal(0, 1, (B, S, V)).astype(np.float32)
    cap_labels = rng.integers(0, V, (B, S))
    cap_labels[:, -3:] = 0  # pad tail → exercises ignore_index=0
    scale, bias, t_scale = 30.0, -10.0, 50.0

    def _t(x):
        return torch.tensor(x, requires_grad=True)

    def _check(name, our_fn, our_args, ref_loss, ref_args):
        t_args = [_t(a) for a in ref_args]
        ref_val = ref_loss(*t_args)
        if isinstance(ref_val, tuple):
            ref_val = sum(ref_val)
        ref_val.backward()
        val, grads = jax.value_and_grad(
            lambda *a: our_fn(*a), argnums=tuple(range(len(our_args))))(
                *[jnp.asarray(a) for a in our_args])
        np.testing.assert_allclose(float(val), float(ref_val.detach()),
                                   rtol=1e-5, err_msg=name)
        for g_ours, t_arg in zip(grads, t_args):
            if t_arg.grad is None:
                continue
            np.testing.assert_allclose(
                np.asarray(g_ours), t_arg.grad.numpy(), rtol=1e-4,
                atol=1e-6, err_msg=name)

    _check("clip",
           lambda i, t, s: L.clip_loss(i, t, s),
           (img, txt, scale),
           ClipLoss(), (img, txt, scale))

    _check("siglip",
           lambda i, t, s, b: L.siglip_loss(i, t, s, b),
           (img, txt, scale, bias),
           SigLipLoss(), (img, txt, scale, bias))

    _check("coca",
           lambda i, t, cl, s: sum(L.coca_loss(
               i, t, cl, jnp.asarray(cap_labels), s,
               caption_loss_weight=2.0, clip_loss_weight=1.0, pad_id=0)),
           (img, txt, cap_logits, scale),
           lambda i, t, cl, s: CoCaLoss(caption_loss_weight=2.0,
                                        clip_loss_weight=1.0, pad_id=0)(
               i, t, cl, torch.tensor(cap_labels), s),
           (img, txt, cap_logits, scale))

    _check("distill",
           lambda i, t, s, di, dt, ds: sum(L.distill_clip_loss(
               i, t, s, di, dt, ds)),
           (img, txt, scale, t_img, t_txt, t_scale),
           DistillClipLoss(), (img, txt, scale, t_img, t_txt, t_scale))


def test_valid_sentence_logic_parity_vs_reference():
    """The constrained-attack validity LOGIC vs the reference's
    valid_sentence (`utils_attacks.py:80-108`), exec-extracted with the
    same lexicon + tokenizer injected (nltk's corpus is absent in this
    container — the reference's own W would differ only by word list,
    which is pluggable in WordConstraint)."""
    src = open(os.path.join(REFERENCE, "utils_attacks.py")).read()
    start = src.index("def valid_sentence(")
    end = src.index("def valid_sentence_batched(")
    code = src[start:end]

    from leaf_tpu.attacks.constraint import WordConstraint, word_tokenize
    wc = WordConstraint()

    class _WordsStub:
        def words(self):
            return list(wc.words)

    ns = {"words": _WordsStub(), "word_tokenize": word_tokenize,
          "time": __import__("time").time}
    exec(code, ns)  # noqa: S102 — test-only oracle
    valid_sentence = ns["valid_sentence"]

    from leaf_tpu.attacks import edits
    rng = np.random.default_rng(0)
    originals = ["the cat sat on the mat", "stocks rally as tech gains",
                 "it's a trap", "Wall St. falls 2%"]
    for s in originals:
        cands = [edits.apply_edit(s, int(z), int(u), edits.DEFAULT_VOCAB,
                                  alternative=-1)
                 for z, u in zip(rng.integers(0, edits.num_slots(len(s)), 40),
                                 rng.integers(0, len(edits.DEFAULT_VOCAB), 40))]
        assert wc.valid(s, cands) == valid_sentence(s, cands)
        # and the vectorised mask used by the fused constrained step
        zs = edits.sample_positions(len(s), 20, rng=rng)[None, :]
        us = rng.integers(0, len(edits.DEFAULT_VOCAB), (1, 20))
        cps = np.asarray(edits.DEFAULT_VOCAB, np.int32)[us]
        strs = [edits.apply_edit(s, int(z), int(u), edits.DEFAULT_VOCAB,
                                 alternative=-1)
                for z, u in zip(zs[0], us[0])]
        np.testing.assert_array_equal(
            wc.valid_edits_batch([s], zs, cps)[0],
            np.asarray(valid_sentence(s, strs)))
