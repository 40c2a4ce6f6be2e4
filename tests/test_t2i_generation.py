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


def test_plms_zero_noise_closed_form():
    """PLMS (the SD v1.x PNDMScheduler path): with eps ≡ 0 every
    multistep combination is 0 and the transfer step reduces to
    multiplying by sqrt(a_prev/a_t); the corrector replay redoes the
    first interval to the same value, so the chain telescopes to
    sqrt(final_alpha/a_{t_max}) — identical to the DDIM telescope.
    Pins the PLMS timestep schedule (duplicated second step, leading
    spacing, steps_offset) and the transfer-step arithmetic."""
    comps = _dummy_components()
    comps.scheduler = "pndm"
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
    got = holder["z"] * comps.latent_scale
    np.testing.assert_allclose(got.numpy(), want.numpy(), rtol=1e-5)


def test_plms_single_step_equals_ddim():
    """With one inference step PLMS never reaches a multistep
    combination (counter-0 path) and its transfer step is the DDIM
    eta=0 formula rearranged — the two schedulers must agree exactly."""
    comps_d = _dummy_components()
    comps_p = _dummy_components()
    comps_p.scheduler = "pndm"
    caps = ["a photo of a cat"]
    d = generate_images(caps, components=comps_d,
                        num_inference_steps=1, seed=5)
    p = generate_images(caps, components=comps_p,
                        num_inference_steps=1, seed=5)
    np.testing.assert_allclose(p, d, rtol=1e-5, atol=1e-6)


def test_plms_multistep_matches_independent_recurrence():
    """Full PLMS trajectory vs an independent numpy implementation of
    the PNDM paper's linear-multistep recurrence (Heun-corrected first
    interval, then 2/3/4-point Adams-Bashforth on stored eps), with a
    deterministic latents-dependent noise model."""
    comps = _dummy_components()
    comps.scheduler = "pndm"
    holder = {}
    comps.unet = lambda x, t, emb: 0.05 * x + 0.01 * float(t) / 1000.0
    comps.vae_decode = lambda z: holder.setdefault("z", z) * 0.0

    n_steps, seed = 6, 13
    generate_images(["a"], components=comps,
                    num_inference_steps=n_steps, seed=seed,
                    guidance_scale=3.0)  # uncond==cond → CFG is identity

    betas = (np.linspace(comps.beta_start ** 0.5, comps.beta_end ** 0.5,
                         comps.train_steps) ** 2)
    a_cum = np.cumprod(1.0 - betas)
    ratio = comps.train_steps // n_steps
    base = np.arange(n_steps) * ratio + comps.steps_offset
    gen = torch.Generator().manual_seed(seed)
    size = comps.image_size // comps.vae_factor
    x = torch.randn(1, comps.latent_channels, size, size,
                    generator=gen).numpy().astype(np.float64)

    def eps_model(x, t):
        return 0.05 * x + 0.01 * t / 1000.0

    def transfer(sample, t, t_prev, e):
        a_t = a_cum[t]
        a_prev = a_cum[t_prev] if t_prev >= 0 else a_cum[0]
        denom = a_t * np.sqrt(1 - a_prev) \
            + np.sqrt(a_t * (1 - a_t) * a_prev)
        return np.sqrt(a_prev / a_t) * sample \
            - (a_prev - a_t) * e / denom

    # predictor: plain transfer over [t_N → t_{N-1}] with e(t_N)
    ts = base[::-1]
    e0 = eps_model(x, ts[0])
    ets = [e0]
    x_pred = transfer(x, ts[0], ts[1], e0)
    # corrector (Heun): redo the interval from the ORIGINAL sample with
    # the average of e(t_N, x) and e(t_{N-1}, x_pred); the corrector's
    # eps is NOT stored — the multistep history instead re-evaluates at
    # the corrected sample
    e1 = eps_model(x_pred, ts[1])
    x = transfer(x, ts[0], ts[1], (e0 + e1) / 2)
    # then Adams-Bashforth of increasing order on the stored eps
    for i in range(1, n_steps):
        t, t_prev = ts[i], (ts[i + 1] if i + 1 < n_steps else ts[i] - ratio)
        ets = (ets + [eps_model(x, t)])[-4:]
        if len(ets) == 2:
            comb = (3 * ets[-1] - ets[-2]) / 2
        elif len(ets) == 3:
            comb = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
        else:
            comb = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3]
                    - 9 * ets[-4]) / 24
        x = transfer(x, t, t_prev, comb)

    got = (holder["z"] * comps.latent_scale).numpy()
    np.testing.assert_allclose(got, x.astype(np.float32), rtol=2e-4,
                               atol=1e-6)


def test_plms_parity_vs_diffusers_pndm():
    """Gated oracle: the native PLMS loop must reproduce diffusers'
    PNDMScheduler (skip_prk_steps=true) step for step."""
    diffusers = pytest.importorskip("diffusers")
    sched = diffusers.PNDMScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        num_train_timesteps=1000, skip_prk_steps=True, steps_offset=1,
        set_alpha_to_one=False)
    n_steps, seed = 5, 3
    sched.set_timesteps(n_steps)
    comps = _dummy_components()
    comps.scheduler = "pndm"
    holder = {}
    comps.vae_decode = lambda z: holder.setdefault("z", z) * 0.0
    unet = comps.unet
    caps = ["a photo of a cat", "stocks rally on earnings"]
    generate_images(caps, components=comps, num_inference_steps=n_steps,
                    seed=seed, guidance_scale=7.5)

    gen = torch.Generator().manual_seed(seed)
    size = comps.image_size // comps.vae_factor
    lat = torch.randn(2, comps.latent_channels, size, size, generator=gen)
    cond = comps.text_encoder(comps.tokenize(caps))
    uncond = comps.text_encoder(comps.tokenize(["", ""]))
    emb = torch.cat([uncond, cond])
    with torch.no_grad():
        for t in sched.timesteps:
            out = unet(torch.cat([lat, lat]), int(t), emb)
            ou, oc = out.chunk(2)
            out = ou + 7.5 * (oc - ou)
            lat = sched.step(out, t, lat).prev_sample
    np.testing.assert_allclose((holder["z"] * comps.latent_scale).numpy(),
                               lat.numpy(), rtol=1e-4, atol=1e-5)


def test_scheduler_from_config_mapping():
    from leaf_tpu.evals.text_to_image import _scheduler_from_config
    assert _scheduler_from_config({}) == "ddim"
    assert _scheduler_from_config(
        {"_class_name": "DDIMScheduler"}) == "ddim"
    # the SD v1.x shipped config
    assert _scheduler_from_config(
        {"_class_name": "PNDMScheduler", "skip_prk_steps": True}) == "pndm"
    # unimplemented variants fall back to DDIM (with a warning)
    assert _scheduler_from_config(
        {"_class_name": "PNDMScheduler", "skip_prk_steps": False}) == "ddim"
    assert _scheduler_from_config(
        {"_class_name": "EulerDiscreteScheduler"}) == "ddim"


def test_generate_rejects_offset_past_alpha_table():
    """num_inference_steps == train_steps with steps_offset=1 puts the
    largest timestep at train_steps — past the table; the loop must
    reject it rather than silently clamp/remap (ADVICE r4)."""
    comps = _dummy_components()
    with pytest.raises(ValueError, match="past the"):
        generate_images(["a"], components=comps,
                        num_inference_steps=comps.train_steps)


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
