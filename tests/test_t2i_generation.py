"""Native SD generation loop without SD weights (VERDICT r3 next #6).

`generate_images` implements the denoise orchestration itself (DDIM
eta=0 with leading spacing + steps_offset, classifier-free guidance,
latent scaling, VAE decode — reference `eval_text_to_image.py:172-242`
drives the same loop through StableDiffusionPipeline); these tests
inject tiny random-weight components so the branch runs in CI.  The
only remaining gap vs the reference eval is literal SD weights."""
import numpy as np
import pytest
import torch

from leaf_tpu.evals.text_to_image import SDComponents, generate_images


class _DummyUNet(torch.nn.Module):
    """Noise predictor that depends on latents, timestep, AND the text
    embedding (so guidance and the text path are exercised)."""

    def __init__(self, ch=4, emb_dim=16):
        super().__init__()
        torch.manual_seed(0)
        self.conv = torch.nn.Conv2d(ch, ch, 3, padding=1)
        self.emb_proj = torch.nn.Linear(emb_dim, ch)

    def forward(self, x, t, emb):
        e = self.emb_proj(emb.mean(dim=1))[:, :, None, None]
        return self.conv(x) + e + 0.001 * float(t) * torch.tanh(x)


def _dummy_components(image_size=64, emb_dim=16):
    torch.manual_seed(1)
    text_emb = torch.nn.Embedding(49408, emb_dim)
    unet = _DummyUNet(emb_dim=emb_dim)
    decode = torch.nn.ConvTranspose2d(4, 3, 4, stride=4)

    from leaf_tpu.tokenizer import get_tokenizer
    tok = get_tokenizer()

    with torch.no_grad():
        return SDComponents(
            tokenize=lambda caps: torch.from_numpy(
                np.asarray(tok(caps))).long(),
            text_encoder=lambda ids: text_emb(ids).detach(),
            unet=lambda x, t, emb: unet(x, t, emb).detach(),
            vae_decode=lambda z: torch.tanh(decode(z)).detach(),
            latent_channels=4, image_size=image_size, vae_factor=4,
            latent_scale=0.18215)


def test_generate_images_e2e_and_deterministic():
    caps = ["a photo of a cat", "stocks rally on earnings",
            "the match ended in a draw"]
    comps = _dummy_components()
    imgs = generate_images(caps, components=comps,
                           num_inference_steps=5, seed=3)
    assert imgs.shape == (3, 64, 64, 3)
    assert np.isfinite(imgs).all()
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # same seed reproduces bit-exactly; a different seed does not
    again = generate_images(caps, components=comps,
                            num_inference_steps=5, seed=3)
    np.testing.assert_array_equal(imgs, again)
    other = generate_images(caps, components=comps,
                            num_inference_steps=5, seed=4)
    assert np.abs(other - imgs).max() > 1e-4
    # guidance changes the result (the CFG path is live)
    cfg0 = generate_images(caps, components=comps,
                           num_inference_steps=5, seed=3,
                           guidance_scale=1.0)
    assert np.abs(cfg0 - imgs).max() > 1e-4


def test_ddim_zero_noise_closed_form():
    """With eps ≡ 0, each DDIM step multiplies the latents by
    sqrt(a_prev/a_t); the chain telescopes to
    sqrt(final_alpha/a_{t_max}) (set_alpha_to_one=False — the SD v1
    config — makes the last step's a_prev = alphas_cumprod[0], not 1).
    Pins the scheduler arithmetic: betas, alphas_cumprod, leading
    spacing, steps_offset, final_alpha."""
    comps = _dummy_components()
    holder = {}
    comps.unet = lambda x, t, emb: torch.zeros_like(x)
    comps.vae_decode = lambda z: holder.setdefault("z", z) * 0.0

    n_steps, seed = 4, 7
    generate_images(["a", "b"], components=comps,
                    num_inference_steps=n_steps, seed=seed)

    betas = torch.linspace(comps.beta_start ** 0.5, comps.beta_end ** 0.5,
                           comps.train_steps, dtype=torch.float64) ** 2
    a_cum = torch.cumprod(1.0 - betas, dim=0)
    ratio = comps.train_steps // n_steps
    t_max = (n_steps - 1) * ratio + comps.steps_offset
    gen = torch.Generator().manual_seed(seed)
    size = comps.image_size // comps.vae_factor
    init = torch.randn(2, comps.latent_channels, size, size, generator=gen)
    want = init * (a_cum[0] / a_cum[t_max]).float().sqrt()
    got = holder["z"] * comps.latent_scale     # loop decodes z/scale
    np.testing.assert_allclose(got.numpy(), want.numpy(), rtol=1e-5)


def test_ddim_v_prediction_zero_output_closed_form():
    """prediction_type='v_prediction' (SD 2.x): with the model output
    v ≡ 0, x0 = sqrt(a_t)·x and eps = sqrt(1−a_t)·x, so each step
    scales the latents by sqrt(a_prev·a_t) + sqrt((1−a_prev)(1−a_t)).
    Pins the v-prediction conversion against that closed form."""
    comps = _dummy_components()
    comps.prediction_type = "v_prediction"
    holder = {}
    comps.unet = lambda x, t, emb: torch.zeros_like(x)
    comps.vae_decode = lambda z: holder.setdefault("z", z) * 0.0

    n_steps, seed = 3, 11
    generate_images(["a"], components=comps,
                    num_inference_steps=n_steps, seed=seed)

    betas = torch.linspace(comps.beta_start ** 0.5, comps.beta_end ** 0.5,
                           comps.train_steps, dtype=torch.float64) ** 2
    a_cum = torch.cumprod(1.0 - betas, dim=0).float()
    ratio = comps.train_steps // n_steps
    final_alpha = a_cum[0]
    gen = torch.Generator().manual_seed(seed)
    size = comps.image_size // comps.vae_factor
    x = torch.randn(1, comps.latent_channels, size, size, generator=gen)
    for t in ((torch.arange(n_steps) * ratio).flip(0)
              + comps.steps_offset).tolist():
        a_t = a_cum[t]
        a_prev = a_cum[t - ratio] if t - ratio >= 0 else final_alpha
        x = ((a_prev * a_t).sqrt()
             + ((1 - a_prev) * (1 - a_t)).sqrt()) * x
    got = holder["z"] * comps.latent_scale
    np.testing.assert_allclose(got.numpy(), x.numpy(), rtol=1e-5)


def test_generate_rejects_too_many_steps():
    comps = _dummy_components()
    with pytest.raises(ValueError, match="num_inference_steps"):
        generate_images(["a"], components=comps,
                        num_inference_steps=comps.train_steps + 1)


def test_full_t2i_pipeline_attack_generate_score(tmp_path):
    """The reference eval's full orchestration: charmer-attack the
    captions → generate (dummy diffusion) → CLIPScore → CSV."""
    import jax

    from leaf_tpu.attacks.engine import CandidateScorer
    from leaf_tpu.evals.clipscore import compute_clipscores
    from leaf_tpu.evals.text_to_image import attack_captions
    from leaf_tpu.models import clip as lclip
    from leaf_tpu.models.config import get_model_config
    from leaf_tpu.tokenizer import get_tokenizer

    cfg = get_model_config("ViT-tiny-test")
    params = lclip.init_clip(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer()
    scorer = CandidateScorer(cfg)
    caps = ["a photo of a cat", "stocks rally on earnings"]

    csv = str(tmp_path / "captions_adv.csv")
    adv = attack_captions(scorer, params["text"], tok, caps,
                          rho=2, k=1, out_csv=csv)
    assert len(adv) == 2
    assert (tmp_path / "captions_adv.csv").exists()

    comps = _dummy_components(image_size=cfg.vision.image_size)
    imgs = generate_images(adv, components=comps,
                           num_inference_steps=3, seed=0)
    assert imgs.shape == (2, cfg.vision.image_size,
                          cfg.vision.image_size, 3)

    scores = compute_clipscores(params, cfg, tok, adv, imgs)
    assert scores["n"] == 2
    assert np.isfinite(scores["clipscore_gen_caption"])
