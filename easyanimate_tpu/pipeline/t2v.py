"""Text-to-video pipeline: the full denoise loop compiled as one lax.scan.

Parity target: EasyAnimatePipeline.__call__ (pipeline_easyanimate.py:769-1149):
  prompt embeds (+ negative) -> CFG batch -> prepare latents (frame remap)
  -> 3D RoPE grid from the 720x480 base -> N denoise steps -> VAE decode.

TPU design: the reference steps the python loop once per denoise iteration
with xm.mark_step (pipeline_easyanimate.py:1130); here the entire loop is a
single compiled program (scan over steps), and the VAE decode is a separate
jit so it can run off the critical path / be dispatched asynchronously.
"""
import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mmdit import EasyAnimateTransformer3D, MMDiTConfig
from ..models.vae import (
    AutoencoderKLMagvit,
    MagvitVAEConfig,
    latent_frame_count,
    vae_decode,
)
from ..ops.rope import (
    get_2d_rotary_pos_embed,
    get_3d_rotary_pos_embed,
    get_resize_crop_region_for_grid,
)
from .schedulers import (
    DDIMConfig,
    DPMSolverConfig,
    EulerAncestralConfig,
    EulerConfig,
    FlowMatchEulerConfig,
    PNDMConfig,
    ddim_schedule,
    ddim_step,
    dpm_solver_step,
    euler_ancestral_step,
    euler_scale_model_input,
    euler_schedule,
    euler_step,
    flow_match_schedule,
    flow_match_step,
    init_noise_sigma,
    pndm_combine,
    pndm_prev_sample,
    pndm_schedule,
    rescale_noise_cfg,
)


def _cfg_half(a, i, b):
    """Half i (0=uncond, 1=cond) of a CFG-batched array. Arrays whose
    leading dim is exactly 2*b are sliced; everything else (None, scalars,
    batch-b conditioning that is not CFG-duplicated) passes through. The
    single definition of the "which cond entries are CFG-batched" rule used
    by both cfg_split halves and the cfg_skip cond-only tail."""
    if (a is None or not hasattr(a, "shape") or a.ndim < 1
            or a.shape[0] != 2 * b):
        return a
    return a[i * b:(i + 1) * b]


# TeaCache rel-L1 -> skip-score polynomial (reference
# transformer3d.py:1485-1491 default coefficients; highest degree first)
TEACACHE_COEFFICIENTS = (
    -10.47857366, 8.33844143, -0.78477557, 0.68798618, 0.0136149)


def get_teacache_coefficients(model_name: str):
    """Per-model TeaCache polynomials (reference transformer3d.py:124-137,
    calibrated on T2V CompBench samples); None for unsupported models."""
    name = model_name.lower()
    if "v5.1-7b" in name:
        return (1.07862322, -4.19362456, 3.06725828, 0.33161686, 0.02374758)
    if "v5.1-12b" in name:
        return TEACACHE_COEFFICIENTS
    return None


def teacache_gate(mod, prev_mod, acc, idx, n_steps, threshold, coefficients):
    """Jittable TeaCache decision (reference transformer3d.py:1564-1584):
    rel-L1 between this step's modulated input and the previous one is
    rescaled through the calibrated polynomial and accumulated; compute
    runs when the accumulator crosses `threshold` (resetting it) and is
    forced at the first and last steps. Returns (should_calc, rel, acc_out).

    Matches the reference exactly: at endpoints the accumulator resets
    without the polynomial contributing, elsewhere acc += poly(rel) and a
    crossing resets to 0."""
    rel = (jnp.mean(jnp.abs(mod.astype(jnp.float32)
                            - prev_mod.astype(jnp.float32)))
           / jnp.maximum(jnp.mean(jnp.abs(prev_mod.astype(jnp.float32))),
                         1e-8))
    acc_new = acc + jnp.polyval(jnp.asarray(coefficients), rel)
    endpoint = (idx == 0) | (idx == n_steps - 1)
    should = endpoint | (acc_new >= threshold)
    return should, rel, jnp.where(should, 0.0, acc_new)


def build_rope(cfg: MMDiTConfig, height: int, width: int, latent_frames: int,
               vae_scale: Optional[int] = None):
    """RoPE tables for a (height, width, frames) generation
    (pipeline_easyanimate.py:998-1019)."""
    s = (vae_scale or cfg.vae_scale_factor) * cfg.patch_size
    gh, gw = height // s, width // s
    if cfg.time_position_encoding_type == "3d_rope":
        base_w = cfg.rope_base_width // s
        base_h = cfg.rope_base_height // s
        crop = get_resize_crop_region_for_grid((gh, gw), base_w, base_h)
        cos, sin = get_3d_rotary_pos_embed(
            cfg.attention_head_dim, crop, (gh, gw), latent_frames)
    else:
        # 2d_rope (V4 Hunyuan): single-frame tables; the model tiles them
        # over frames inside each block (transformer3d.py:1078-1085)
        base = 512 // s
        crop = get_resize_crop_region_for_grid((gh, gw), base, base)
        cos, sin = get_2d_rotary_pos_embed(cfg.attention_head_dim, crop, (gh, gw))
    return jnp.asarray(cos), jnp.asarray(sin)


@dataclasses.dataclass
class EasyAnimatePipeline:
    """T2V generation. Construct once; calls jit-cache per shape bucket."""

    transformer: EasyAnimateTransformer3D
    vae: AutoencoderKLMagvit
    transformer_params: dict
    vae_params: dict
    scheduler: object = dataclasses.field(default_factory=FlowMatchEulerConfig)
    # per-model TeaCache polynomial (get_teacache_coefficients; the loader
    # sets this from the checkpoint name like the reference controller)
    teacache_coefficients: tuple = TEACACHE_COEFFICIENTS

    @property
    def mmdit_cfg(self) -> MMDiTConfig:
        return self.transformer.cfg

    @property
    def vae_cfg(self) -> MagvitVAEConfig:
        return self.vae.cfg

    # -- latent preparation ------------------------------------------------

    def latent_shape(self, batch: int, video_length: int, height: int,
                     width: int) -> Tuple[int, ...]:
        lf = latent_frame_count(video_length, self.vae_cfg)
        sf = self.vae_cfg.spatial_compression
        return (batch, self.vae_cfg.latent_channels, lf,
                height // sf, width // sf)

    # -- main entry ---------------------------------------------------------

    def __call__(
        self,
        prompt_embeds: jnp.ndarray,            # (B, S, D)
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        *,
        height: int = 384,
        width: int = 672,
        video_length: int = 49,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        guidance_rescale: float = 0.0,
        rng: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        prompt_embeds_t5: Optional[jnp.ndarray] = None,
        negative_prompt_embeds_t5: Optional[jnp.ndarray] = None,
        output_type: str = "np",               # 'np' | 'latent'
        decode: bool = True,
        teacache_threshold: Optional[float] = None,
        scan_chunk: Optional[int] = None,
        cfg_split: bool = False,
        cfg_skip_ratio: Optional[float] = None,
    ):
        b = prompt_embeds.shape[0]
        do_cfg = guidance_scale > 1.0
        if do_cfg:
            assert negative_prompt_embeds is not None, "CFG needs negatives"
        if rng is None:
            rng = jax.random.PRNGKey(0)

        shape = self.latent_shape(b, video_length, height, width)
        if latents is None:
            latents = jax.random.normal(rng, shape, jnp.float32)
        # sigma-space samplers start from sigma_max-scaled noise; applies to
        # caller-supplied unit-variance latents too (diffusers
        # prepare_latents scales both paths; == 1.0 for flow/DDIM/DPM/PNDM)
        latents = latents * init_noise_sigma(self.scheduler,
                                             num_inference_steps)
        latents = latents.astype(self.mmdit_cfg.jdtype)

        txt = prompt_embeds
        txt_t5 = prompt_embeds_t5
        if do_cfg:
            txt = jnp.concatenate([negative_prompt_embeds, prompt_embeds])
            if prompt_embeds_t5 is not None:
                txt_t5 = jnp.concatenate(
                    [negative_prompt_embeds_t5, prompt_embeds_t5])

        rope = build_rope(self.mmdit_cfg, height, width, shape[2],
                          vae_scale=self.vae_cfg.spatial_compression)
        denoise = self._denoise_fn(
            num_inference_steps, float(guidance_scale),
            float(guidance_rescale), txt_t5 is not None, 0,
            teacache_threshold, scan_chunk=scan_chunk, cfg_split=cfg_split,
            cfg_skip_ratio=cfg_skip_ratio)
        latents = denoise(self.transformer_params, latents, txt, txt_t5, rope,
                          {}, rng=jax.random.fold_in(rng, 0x5A))

        if output_type == "latent" or not decode:
            return latents
        return self.decode_latents(latents,
                                   as_numpy=(output_type != "device"))

    # -- compiled pieces ----------------------------------------------------

    def schedule_arrays(self, steps: int, t_start: int = 0, sched=None):
        """Per-step scan inputs; column schema depends on the sampler family
        (flow/Euler: (t, sigma, sigma_next); DDIM/DPM: (t, t_prev, 0); PNDM:
        the 6-column pndm_schedule rows). t_start implements `strength`
        (get_timesteps, pipeline_easyanimate_inpaint.py:760-767)."""
        sched = self.scheduler if sched is None else sched
        if isinstance(sched, FlowMatchEulerConfig):
            timesteps, sigmas = flow_match_schedule(sched, steps, mu=1.0)
            per_step = np.stack([timesteps, sigmas[:-1], sigmas[1:]], axis=1)
            extras = None
        elif isinstance(sched, EulerConfig):  # incl. EulerAncestralConfig
            timesteps, sigmas, _ = euler_schedule(sched, steps)
            per_step = np.stack([timesteps, sigmas[:-1], sigmas[1:]], axis=1)
            extras = None
        elif isinstance(sched, PNDMConfig):
            rows, alphas_cumprod, final_alpha = pndm_schedule(
                sched, steps, t_start)
            return jnp.asarray(rows), (alphas_cumprod, final_alpha)
        elif isinstance(sched, DDIMConfig):
            t_arr, alphas_cumprod, final_alpha = ddim_schedule(sched, steps)
            t_prev = np.concatenate(
                [t_arr[1:], [-1]]) if steps > 1 else np.array([-1])
            per_step = np.stack(
                [t_arr.astype(np.float32), t_prev.astype(np.float32),
                 np.zeros_like(t_arr, np.float32)], axis=1)
            extras = (jnp.asarray(alphas_cumprod), final_alpha)
        else:
            raise TypeError(f"unknown scheduler {type(sched)}")
        return jnp.asarray(per_step[t_start:]), extras

    def _denoise_fn(self, steps: int, guidance_scale: float,
                    guidance_rescale: float, has_t5: bool, t_start: int = 0,
                    teacache_threshold: Optional[float] = None,
                    clip_apply_ratio: Optional[float] = None,
                    scan_chunk: Optional[int] = None,
                    cfg_split: bool = False,
                    cfg_skip_ratio: Optional[float] = None):
        # reference refuses to enable TeaCache for models with no calibrated
        # polynomial (ui.py:477-478 `coefficients is not None and ...`)
        if teacache_threshold is not None and self.teacache_coefficients is None:
            if not getattr(self, "_teacache_warned", False):
                # once per pipeline, not per request (servers call this
                # wrapper on every generate)
                print("TeaCache disabled: no calibrated coefficients for "
                      "this model (reference get_teacache_coefficients "
                      "returned None)")
                self._teacache_warned = True
            teacache_threshold = None
        # the live scheduler enters the cache key so runtime sampler
        # switching (controller.generate sampler=..., reference ui.py:472)
        # rebuilds the compiled loop
        return self._denoise_fn_for(
            self.scheduler, steps, guidance_scale, guidance_rescale, has_t5,
            t_start, teacache_threshold, clip_apply_ratio, scan_chunk,
            cfg_split, cfg_skip_ratio)

    @functools.lru_cache(maxsize=16)
    def _denoise_fn_for(self, sched, steps: int, guidance_scale: float,
                        guidance_rescale: float, has_t5: bool,
                        t_start: int = 0,
                        teacache_threshold: Optional[float] = None,
                        clip_apply_ratio: Optional[float] = None,
                        scan_chunk: Optional[int] = None,
                        cfg_split: bool = False,
                        cfg_skip_ratio: Optional[float] = None):
        model = self.transformer
        latent_channels = self.vae_cfg.latent_channels
        do_cfg = guidance_scale > 1.0
        per_step, sched_extras = self.schedule_arrays(steps, t_start, sched)
        if (isinstance(sched, (DDIMConfig,))
                and not isinstance(sched, EulerConfig)):
            alphas_cumprod, final_alpha = sched_extras
        n_steps = per_step.shape[0]
        # per-step inputs gain a step-index column (for TeaCache endpoints)
        per_step = jnp.concatenate(
            [per_step, jnp.arange(n_steps, dtype=jnp.float32)[:, None]], axis=1)

        def forward(params, lat, step, txt, txt_t5, rope, cond, tea_carry,
                    use_cfg=True):
            """One transformer eval, optionally TeaCache-gated. use_cfg is
            STATIC: False compiles the cond-only tail of a cfg_skip run (txt
            and cond arrive pre-sliced to the positive half)."""
            cfg_here = do_cfg and use_cfg
            if (clip_apply_ratio is not None
                    and "clip_encoder_hidden_states" in cond):
                # zero CLIP conditioning for the first (1 - ratio) of the
                # schedule (pipeline_easyanimate_inpaint.py:1509-1515)
                gate = step[-1] >= (1.0 - clip_apply_ratio) * n_steps
                cond = dict(cond)
                cond["clip_encoder_hidden_states"] = jnp.where(
                    gate, cond["clip_encoder_hidden_states"], 0.0)
                cond["clip_attention_mask"] = jnp.where(
                    gate, cond["clip_attention_mask"], 0.0)
            if cfg_here and cfg_split and teacache_threshold is None:
                # sequential CFG: run uncond and cond halves through the
                # backbone one after the other -- same math, roughly half
                # the activation peak (what fits 576x1008x49f beside the
                # resident 12B on one 16 GB chip)
                t_vec = jnp.full((lat.shape[0],), step[0], jnp.float32)
                hb = txt.shape[0] // 2

                def half(i):
                    sl = lambda a: _cfg_half(a, i, hb)
                    return model.apply(
                        params, lat, t_vec, sl(txt), rope,
                        encoder_hidden_states_t5=sl(txt_t5),
                        **{k: sl(v) for k, v in cond.items()})

                return jnp.concatenate([half(0), half(1)]), tea_carry
            lat_in = jnp.concatenate([lat, lat]) if cfg_here else lat
            t_vec = jnp.full((lat_in.shape[0],), step[0], jnp.float32)
            if teacache_threshold is None:
                pred = model.apply(params, lat_in, t_vec, txt, rope,
                                   encoder_hidden_states_t5=txt_t5, **cond)
                return pred, tea_carry
            b, c, t_, hh, ww = lat_in.shape
            vid0, txt_tok, temb = model.apply(
                params, lat_in, t_vec, txt,
                encoder_hidden_states_t5=txt_t5, method="embed", **cond)
            mod = model.apply(params, vid0, txt_tok, temb,
                              method="modulated_input")
            prev_mod, prev_res, acc, skips = tea_carry
            should, _, acc_out = teacache_gate(
                mod, prev_mod, acc, step[-1], n_steps, teacache_threshold,
                self.teacache_coefficients)

            def calc(_):
                p_ = self.mmdit_cfg.patch_size
                out = model.apply(params, vid0, txt_tok, temb, rope,
                                  grid_size=(t_, hh // p_, ww // p_),
                                  method="backbone")
                return out, out - vid0

            def skip(_):
                return vid0 + prev_res, prev_res

            vid_out, res = jax.lax.cond(should, calc, skip, None)
            pred = model.apply(params, vid_out, t_, hh, ww, method="head")
            return pred, (mod, res, acc_out,
                          skips + jnp.where(should, 0, 1))

        def scan_segment(params, carry, seg_steps, txt, txt_t5, rope, cond,
                         sample_rng, use_cfg=True):
            def body(carry, step):
                lat, tea, extra = carry
                # Euler-family latents live in sigma space: scale the model
                # input by 1/sqrt(sigma^2+1) (diffusers scale_model_input)
                lat_model = (euler_scale_model_input(lat, step[1])
                             if isinstance(sched, EulerConfig) else lat)
                pred, tea = forward(params, lat_model, step, txt, txt_t5,
                                    rope, cond, tea, use_cfg=use_cfg)
                if pred.shape[1] != latent_channels:   # learned sigma
                    pred = pred[:, :latent_channels]
                if do_cfg and use_cfg:
                    uncond, text = jnp.split(pred, 2)
                    pred = uncond + guidance_scale * (text - uncond)
                    if guidance_rescale > 0:
                        pred = rescale_noise_cfg(pred, text, guidance_rescale)
                if isinstance(sched, FlowMatchEulerConfig):
                    lat = flow_match_step(lat, pred, step[1], step[2])
                elif isinstance(sched, EulerAncestralConfig):
                    noise = jax.random.normal(
                        jax.random.fold_in(sample_rng,
                                           step[-1].astype(jnp.int32)),
                        lat.shape, jnp.float32)
                    lat = euler_ancestral_step(sched, lat, pred, step[1],
                                               step[2], noise)
                elif isinstance(sched, EulerConfig):
                    lat = euler_step(sched, lat, pred, step[1], step[2])
                elif isinstance(sched, PNDMConfig):
                    # ets stores RAW model outputs (v or epsilon); the
                    # v->epsilon conversion happens inside pndm_prev_sample
                    # on the combined output (diffusers ordering)
                    ets, cur = extra
                    eps = pred.astype(jnp.float32)
                    order = step[3].astype(jnp.int32)
                    out = pndm_combine(order, eps, ets)
                    ets = jnp.where(step[4] > 0.5,
                                    jnp.concatenate([eps[None], ets[:3]]),
                                    ets)
                    lat32 = lat.astype(jnp.float32)
                    sample_used = jnp.where(step[5] > 0.5, cur, lat32)
                    cur = jnp.where(step[-1] == 0, lat32, cur)
                    lat = pndm_prev_sample(
                        sched, sample_used, out, step[1].astype(jnp.int32),
                        step[2].astype(jnp.int32), alphas_cumprod,
                        final_alpha).astype(lat.dtype)
                    extra = (ets, cur)
                elif isinstance(sched, DPMSolverConfig):
                    lat, extra = dpm_solver_step(
                        sched, lat, pred, step[0].astype(jnp.int32),
                        step[1].astype(jnp.int32), extra,
                        step[-1].astype(jnp.int32), alphas_cumprod)
                else:
                    lat = ddim_step(sched, lat, pred,
                                    step[0].astype(jnp.int32),
                                    step[1].astype(jnp.int32),
                                    alphas_cumprod, final_alpha)
                return (lat, tea, extra), None

            return jax.lax.scan(body, carry, seg_steps)[0]

        seg_jit = jax.jit(scan_segment, donate_argnums=(1,),
                          static_argnames=("use_cfg",))

        def run(params, latents, txt, txt_t5, rope, cond, rng=None):
            if isinstance(sched, DPMSolverConfig):
                extra0 = jnp.zeros_like(latents, jnp.float32)
            elif isinstance(sched, PNDMConfig):
                extra0 = (jnp.zeros((4, *latents.shape), jnp.float32),
                          jnp.zeros(latents.shape, jnp.float32))
            else:
                extra0 = None
            if rng is None and isinstance(sched, EulerAncestralConfig):
                rng = jax.random.PRNGKey(0)
            if teacache_threshold is not None:
                b = latents.shape[0] * (2 if do_cfg else 1)
                s_vid = ((latents.shape[3] // self.mmdit_cfg.patch_size)
                         * (latents.shape[4] // self.mmdit_cfg.patch_size)
                         * latents.shape[2])
                shape_tok = (b, s_vid, self.mmdit_cfg.inner_dim)
                # two distinct buffers: the donated carry may not alias.
                # Under an sp scope the carry shards on the token axis like
                # the activations (~320 MB per buffer at flagship shapes
                # would otherwise replicate on every chip)
                from ..parallel.context import sp_constraint

                tok = lambda: sp_constraint(
                    jnp.zeros(shape_tok, self.mmdit_cfg.jdtype),
                    ("dp", "sp", None))
                tea0 = (tok(), tok(), jnp.zeros((), jnp.float32),
                        jnp.zeros((), jnp.int32))  # skipped-step counter
            else:
                tea0 = None
            # the segments donate their carry; copy so the caller's latents
            # buffer survives (it may be reused across calls)
            carry = (jnp.copy(latents), tea0, extra0)
            # Chunk the schedule into bounded-runtime device programs: a
            # single program running for minutes can exceed the TPU runtime's
            # execution deadline (observed on tunneled single-chip setups as
            # a worker "kernel fault"). Segments of equal length share one
            # compilation; the loop carry (latents + TeaCache state) threads
            # through unchanged, so the result is bit-identical to one scan.
            n = per_step.shape[0]
            # cfg_skip: the last round(ratio*n) steps run cond-only (the
            # low-noise tail where guidance matters least -- the authors'
            # follow-up VideoX-Fun ships this as cfg_skip_ratio). Those
            # steps cost one batch-1 forward instead of a CFG pair.
            m = n
            if do_cfg and cfg_skip_ratio:
                m = n - min(n, max(0, int(round(cfg_skip_ratio * n))))
            c = scan_chunk if scan_chunk else n
            for k in range(0, m, c):
                carry = seg_jit(params, carry, per_step[k:min(k + c, m)],
                                txt, txt_t5, rope, cond, rng)
            if m < n:
                b = carry[0].shape[0]
                sl = lambda a: _cfg_half(a, 1, b)
                txt_c, txt_t5_c = sl(txt), sl(txt_t5)
                cond_c = {k_: sl(v) for k_, v in cond.items()}
                lat, tea, extra = carry
                if tea is not None:  # keep the positive half of the carry
                    tea = (tea[0][b:], tea[1][b:], tea[2], tea[3])
                carry = (lat, tea, extra)
                for k in range(m, n, c):
                    carry = seg_jit(params, carry,
                                    per_step[k:min(k + c, n)], txt_c,
                                    txt_t5_c, rope, cond_c, rng,
                                    use_cfg=False)
            # measured TeaCache artifact (device scalar; int() it to sync):
            # how many steps the gate skipped this run
            self.last_teacache_skips = (carry[1][3]
                                        if carry[1] is not None else None)
            return carry[0]

        return run

    def decode_latents(self, latents: jnp.ndarray,
                       smooth: Optional[bool] = None,
                       to_uint8: bool = False,
                       as_numpy: bool = True) -> np.ndarray:
        """latents -> video (B, C, T, H, W): float in [0, 1], or uint8 when
        to_uint8 (rounded ON DEVICE -- 4x less device-to-host traffic, which
        dominates decode wall-clock on remote/tunneled chips).

        Spatial tiling engages automatically above tile_latent_min_size
        (HBM headroom when the 12B transformer stays resident on the chip).

        smooth: blend VAE chunk seams by re-decoding the half-chunk-shifted
        middle and averaging (reference pipeline_easyanimate.py:706-742).
        Default None follows the reference gating: on for slice chunk modes,
        off for cache modes (whose causal caches have no seams).
        """
        if smooth is None:
            smooth = self.smooth_default()
        tile_latent = (self.vae_cfg.tile_sample_min_size
                       // self.vae_cfg.spatial_compression)
        tiled = max(latents.shape[-2:]) > tile_latent
        smooth = (smooth and not tiled
                  and latents.shape[2] > 1)  # image decode: nothing to blend
        video = self._decode_fn(tiled, smooth, to_uint8)(
            self.vae_params, latents)
        # as_numpy=False returns the still-async device array so callers can
        # overlap the device->host transfer with later dispatched work
        # (generate_long_video pipelines chunk i's fetch+blend under chunk
        # i+1's denoise this way)
        return np.asarray(video) if as_numpy else video

    def smooth_default(self) -> bool:
        """Reference gating (pipeline_easyanimate.py:729-731): blend chunk
        seams for slice-mode VAEs; cache modes carry causal state across
        chunks and have no seams."""
        return self.vae_cfg.chunk_mode in ("slice_mag", "slice_compression")

    @functools.lru_cache(maxsize=6)
    def _decode_fn(self, tiled: bool = False, smooth: bool = False,
                   to_uint8: bool = False, yuv420: bool = False):
        vae = self.vae
        scale = self.vae_cfg.scaling_factor

        @jax.jit
        def run(vae_params, latents):
            lat = (latents.astype(jnp.float32) / scale).astype(vae.cfg.jdtype)
            if tiled:
                from ..models.vae import vae_decode_tiled

                video = vae_decode_tiled(vae, vae_params, lat)
            else:
                video = vae_decode(vae, vae_params, lat)
            if smooth:
                from ..models.vae import smooth_output

                video = jnp.clip(video, -1.0, 1.0)
                video = smooth_output(vae, vae_params, video)
                video = jnp.clip(video, -1.0, 1.0)
            out = jnp.clip(video.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
            if yuv420:
                # full-range BT.601; chroma 2x2 box-averaged in float
                # BEFORE quantization (see decode_latents_yuv420)
                r, g, b = out[:, 0], out[:, 1], out[:, 2]
                y = 0.299 * r + 0.587 * g + 0.114 * b
                u = -0.168736 * r - 0.331264 * g + 0.5 * b + 0.5
                v = 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5

                def sub(p):
                    return 0.25 * (p[..., 0::2, 0::2] + p[..., 1::2, 0::2]
                                   + p[..., 0::2, 1::2] + p[..., 1::2, 1::2])

                to8 = lambda p: jnp.round(
                    jnp.clip(p, 0.0, 1.0) * 255.0).astype(jnp.uint8)
                return to8(y), to8(sub(u)), to8(sub(v))
            if to_uint8:
                out = jnp.round(out * 255.0).astype(jnp.uint8)
            return out

        return run

    def decode_latents_yuv420(self, latents: jnp.ndarray,
                              smooth: Optional[bool] = None,
                              as_numpy: bool = True):
        """latents -> (y, u, v) uint8 planes: y (B, T, H, W), u/v
        (B, T, H/2, W/2), full-range BT.601 with 2x2 box-averaged chroma.

        The mp4 the serving layer writes is 4:2:0 anyway, so doing the
        chroma subsample ON DEVICE halves the device->host bytes (1.5 vs 3
        per pixel) with zero loss in the delivered video -- the transfer is
        the dominant decode cost on remote/tunneled chips (CLAUDE.md:
        20-29 MB/s). utils.media.yuv420_to_rgb reconstructs RGB host-side
        for non-mp4 consumers (with ordinary 4:2:0 chroma loss).
        """
        if smooth is None:
            smooth = self.smooth_default()
        tile_latent = (self.vae_cfg.tile_sample_min_size
                       // self.vae_cfg.spatial_compression)
        tiled = max(latents.shape[-2:]) > tile_latent
        smooth = smooth and not tiled and latents.shape[2] > 1
        y, u, v = self._decode_fn(tiled, smooth, True, True)(
            self.vae_params, latents)
        if as_numpy:
            return np.asarray(y), np.asarray(u), np.asarray(v)
        return y, u, v

    def decode_latents_overlapped(self, latents: jnp.ndarray,
                                  to_uint8: bool = True) -> np.ndarray:
        """Chunked decode with the device->host copy OFF the critical path.

        decode_latents compiles the whole chunk loop into one program and
        fetches one big buffer afterwards, so the transfer (1.3-1.9 s for a
        49f clip on a tunneled chip) is serial after the compute. Here each
        cache_mag chunk is its own device program dispatched asynchronously;
        chunk i's host copy then runs while chunks i+1.. still compute.
        Outputs are bit-identical to decode_latents with the same
        decode_chunk_frames (the causal cache threads exact conv state).

        Untiled: per-chunk activation peaks are small (the group-norm stats
        rewrite keeps temps in bf16), so no spatial tiling is needed at the
        published workloads once the transformer is freed. cache_mag only --
        other chunk modes fall back to decode_latents.

        Measured caveat (tunneled v5e, 384x672x49f, chunk 4): this path runs
        5.3 s vs 3.3 s for the untiled SINGLE-program decode_latents -- the
        tunnel's per-program dispatch/fetch round-trips cost more than the
        copy/compute overlap saves, so bench.py uses decode_latents. On
        directly-attached hosts (DMA-overlapped D2H) this path is the one
        that takes the transfer off the critical path.
        """
        if self.vae_cfg.chunk_mode != "cache_mag" or latents.shape[2] == 1:
            return self.decode_latents(latents, to_uint8=to_uint8)
        chunk = (self.vae_cfg.decode_chunk_frames
                 or self.vae_cfg.mini_batch_decoder)
        run = self._decode_chunk_fn(to_uint8)
        lat = jnp.transpose(latents, (0, 2, 3, 4, 1))  # BCTHW -> BTHWC
        t = lat.shape[1]
        outs = []
        out, cache = run(self.vae_params, lat[:, :1], None)
        outs.append(out)
        for i in range(1, t, chunk):
            out, cache = run(self.vae_params, lat[:, i: i + chunk], cache)
            outs.append(out)
        # everything above is dispatched async; fetch in order so each copy
        # overlaps the still-running later chunks
        return np.concatenate([np.asarray(o) for o in outs], axis=2)

    @functools.lru_cache(maxsize=2)
    def _decode_chunk_fn(self, to_uint8: bool = False):
        vae = self.vae
        scale = self.vae_cfg.scaling_factor

        @jax.jit
        def run(vae_params, z, cache):
            z = (z.astype(jnp.float32) / scale).astype(vae.cfg.jdtype)
            video, cache = vae.apply(vae_params, z, cache,
                                     method=vae.decode_chunk)
            out = jnp.clip(video.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
            if to_uint8:
                out = jnp.round(out * 255.0).astype(jnp.uint8)
            return jnp.transpose(out, (0, 4, 1, 2, 3)), cache  # -> BCTHW

        return run

    def __hash__(self):  # lru_cache on methods needs a stable hash
        return id(self)

    def __eq__(self, other):
        return self is other
