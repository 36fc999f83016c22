"""Checkpoint-aware sampling: read a checkpoint's metadata and dispatch to
the right model family, schedule, and sampler. One entry point shared by the
CLI and the public API so a user can sample any igdm_tpu checkpoint (or a
reference .bson) without knowing how it was trained.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from igdm_tpu.config import DiffusionConfig, config_from_dict

# small-LRU checkpoint cache keyed (abspath, mtime, prefer_ema): repeated
# sampling from one checkpoint (the igdm-quality protocol draws many chunks)
# must not re-read + re-upload the file per chunk (round-4 review finding).
# 4 slots so alternating between a few checkpoints (e.g. a latent model and
# its teacher in a comparison loop) doesn't thrash re-reads/re-uploads, and
# long-lived processes don't pin unbounded device memory (round-4 advisor).
_CACHE_SLOTS = 4
_LOAD_CACHE: dict = {}
# same idea for the latent family's VAE + its jitted decoder, keyed by the
# resolved autoencoder path's mtime
_AE_CACHE: dict = {}
_DECODE_JIT = None


def _lru_get(cache: dict, key, build):
    """Tiny insertion-ordered LRU over a plain dict (py3.7+ dict ordering)."""
    if key in cache:
        cache[key] = cache.pop(key)  # mark most-recent
        return cache[key]
    val = build()
    cache[key] = val
    while len(cache) > _CACHE_SLOTS:
        cache.pop(next(iter(cache)))  # evict least-recent; device refs drop
    return val


def clear_caches():
    """Release every cached checkpoint/VAE device buffer (long-lived server
    processes call this to free HBM between model swaps)."""
    _LOAD_CACHE.clear()
    _AE_CACHE.clear()


def _load_ae_cached(ae_path: str):
    import os as _os

    key = (ae_path, _os.path.getmtime(ae_path))

    def build():
        from igdm_tpu.training.latent import load_autoencoder

        return load_autoencoder(ae_path)[0]

    return _lru_get(_AE_CACHE, key, build)


def _decode(ae_params, z):
    global _DECODE_JIT
    if _DECODE_JIT is None:
        from igdm_tpu.models import autoencoder

        _DECODE_JIT = jax.jit(autoencoder.decode)
    return _DECODE_JIT(ae_params, z)


def _lmeta_scale(lmeta) -> float:
    """The checkpoint's LDM scale_factor — REQUIRED: a silent 1.0 default
    would decode mis-scaled latents (every trainer here stores it; only a
    hand-built/corrupt checkpoint can lack it, and that must be loud)."""
    if "scale" not in lmeta:
        raise ValueError(
            "latent checkpoint metadata lacks 'scale' (the LDM scale_factor "
            "stored by training/latent.py) — cannot decode; re-save the "
            "checkpoint with its autoencoder scale"
        )
    return float(lmeta["scale"])


def _decode01(lmeta, ae_params, z):
    """Shared latent epilogue: unscale, decode, clip, channel-squeeze, [0,1]."""
    out = _decode(ae_params, z / _lmeta_scale(lmeta))
    arr = np.clip(np.asarray(out), -1.0, 1.0)
    pc = int(lmeta.get("pixel_channels", 1))
    return (arr[..., 0] + 1.0) / 2.0 if pc == 1 else (arr + 1.0) / 2.0


def _reject_eta(eta, where):
    """eta only modulates DDIM-family noise; silently ignoring it on other
    samplers made eta sweeps meaningless (round-5 review) — be loud."""
    if eta:
        raise ValueError(
            f"eta={eta} is not supported by the {where} sampler — eta applies "
            "to ddim / latent-ddim / guided-CFG sampling only"
        )


def sample_from_checkpoint(
    path: str,
    key,
    *,
    num_images: int = 16,
    sampler: str = "auto",  # auto | ancestral | ddim | dpmpp | heun | textbook
    ddim_steps: int = 50,
    timesteps: int | None = None,
    prefer_ema: bool = False,
    label: int | None = None,
    guidance_scale: float = 2.0,
    steps: int | None = None,
    eta: float = 0.0,
):
    """Load any checkpoint and sample from it.

    Returns (images01 ndarray (N,H,W[,C]) scaled to [0,1], info dict).

    Dispatch rules:
      * .bson -> reference SimpleUNet import, T=5 (the committed config),
        reference-exact ancestral sampler.
      * modern (gen-3) checkpoints (meta has modern_cfg) -> sigma-schedule
        sampler with the TRAINING schedule and stored mu/sigma.
      * class-conditional checkpoints (meta has ``conditional``) ->
        classifier-free-guided DDIM at ``guidance_scale``; ``label`` fixes
        one class for every image, None cycles through all classes.
      * rectified-flow checkpoints (meta has ``flow``) -> deterministic ODE
        integration with ``ddim_steps`` steps (Euler; ``sampler="heun"``
        selects the 2nd-order solver).
      * DDPM checkpoints -> schedule/model read from metadata; 'auto' picks
        the reference-exact ancestral sampler for unet_small and the textbook
        posterior sampler for unet4.
    """
    if str(path).endswith(".bson"):
        from igdm_tpu.checkpoint.bson_import import import_simple_unet
        from igdm_tpu.sampling.ancestral import sample_ddpm

        _reject_eta(eta, "reference-bson ancestral")

        params, state, meta = import_simple_unet(str(path))
        params = jax.tree_util.tree_map(jnp.asarray, params)
        state = jax.tree_util.tree_map(jnp.asarray, state)
        cfg = DiffusionConfig(num_steps=timesteps or 5)
        out = sample_ddpm(params, state, key, num_images=num_images, cfg=cfg)
        imgs01 = (np.asarray(out)[..., 0] + 1.0) / 2.0
        return imgs01, {"model": "unet_small(bson)", "T": cfg.num_steps, "sampler": "ancestral"}

    import os as _os

    from igdm_tpu.checkpoint.pytree_io import load_for_sampling

    _ap = _os.path.abspath(str(path))
    _ck = (_ap, _os.path.getmtime(_ap), prefer_ema)

    def _build():
        p, s, m = load_for_sampling(str(path), prefer_ema=prefer_ema)
        return (
            jax.tree_util.tree_map(jnp.asarray, p),
            jax.tree_util.tree_map(jnp.asarray, s),
            m,
        )

    params, state, meta = _lru_get(_LOAD_CACHE, _ck, _build)
    model_kind = meta.get("model", "unet_small")

    if "modern_cfg" in meta:  # gen-3 recipe: sample with its training schedule
        _reject_eta(eta, "modern sigma-schedule")
        from igdm_tpu.sampling.ancestral import sample_with_sigmas
        from igdm_tpu.training.modern import ModernTrainConfig, sigma_schedule

        cfg4 = config_from_dict(ModernTrainConfig, meta.get("modern_cfg", {}))
        norm = meta.get("norm", {})
        out = sample_with_sigmas(
            params, key, sigma_schedule(cfg4), num_images=num_images,
            mu=norm.get("mu", 0.0), sigma=norm.get("sigma", 1.0),
            final_sigmoid=cfg4.final_sigmoid,
        )
        imgs01 = np.clip(np.asarray(out)[..., 0], 0.0, 1.0)
        return imgs01, {"model": "unet4(modern)", "T": cfg4.num_steps, "sampler": "sigma"}

    if "flow" in meta:  # rectified-flow checkpoint: deterministic ODE solve
        _reject_eta(eta, "flow-ODE")
        from igdm_tpu.sampling.flow import sample_flow

        if timesteps is not None:
            raise ValueError(
                "--timesteps applies to discrete DDPM schedules; a flow "
                "checkpoint is continuous-time — use --ddim-steps to set the "
                "ODE step count."
            )
        data_meta = meta.get("data", {})
        channels = int(data_meta.get("channels", 1))
        image_size = tuple(data_meta.get("image_size", (32, 32)))
        method = "heun" if sampler == "heun" else "euler"
        # `steps` (the consistency families' call-count knob) means the same
        # thing here; honor it so the documented 1-call reflow point is
        # reachable via either kwarg (round-4 review finding)
        ode_steps = int(steps) if steps is not None else ddim_steps
        lmeta = meta.get("latent")
        ae_params = None
        if lmeta is not None:  # resolve the VAE BEFORE paying for the solve
            from igdm_tpu.training.latent import resolve_ae_path

            ae_params = _load_ae_cached(resolve_ae_path(path, lmeta))
        out = sample_flow(
            params, key, num_images=num_images, image_size=image_size,
            channels=channels, steps=ode_steps, method=method,
            time_scale=float(meta["flow"].get("time_scale", 1000.0)),
        )
        if lmeta is not None:  # latent flow / latent reflow: ODE endpoint
            # is a latent (naturally unclamped) — unscale and decode
            return _decode01(lmeta, ae_params, out), {
                "model": f"{model_kind}(latent-flow)", "T": ode_steps,
                "sampler": f"latent-flow-{method}",
            }
        arr = np.asarray(out)
        imgs01 = np.clip(
            (arr[..., 0] + 1.0) / 2.0 if channels == 1 else (arr + 1.0) / 2.0,
            0.0, 1.0,
        )
        return imgs01, {
            "model": model_kind, "T": ode_steps, "sampler": f"flow-{method}",
        }

    cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
    if timesteps and timesteps != cfg.num_steps:
        # A distilled student's step grid holds indices into the ORIGINAL
        # training schedule, and a conditional checkpoint's guided sampler
        # rebuilds the training schedule from diff_cfg — overriding T for
        # either silently mis-indexes (jnp clamps out-of-bounds gathers)
        # instead of erroring, so refuse up front.
        if "distill" in meta or "conditional" in meta or "consistency" in meta:
            kind = (
                "distilled" if "distill" in meta
                else "consistency" if "consistency" in meta
                else "conditional"
            )
            raise ValueError(
                f"--timesteps {timesteps} conflicts with this {kind} checkpoint's "
                f"training schedule (T={cfg.num_steps}); the override is only valid "
                "for plain DDPM checkpoints. Use --ddim-steps to control sampling cost."
            )
        import dataclasses

        cfg = dataclasses.replace(cfg, num_steps=timesteps)
    data_meta = meta.get("data", {})
    channels = int(data_meta.get("channels", 1))
    image_size = tuple(data_meta.get("image_size", (32, 32)))

    if "latent" in meta:  # latent-diffusion checkpoint: sample z, decode
        from igdm_tpu.sampling.latent import sample_latent
        from igdm_tpu.training.latent import resolve_ae_path

        lmeta = meta["latent"]
        ae_params = _load_ae_cached(resolve_ae_path(path, lmeta))
        if sampler not in ("auto", "ddim", "ancestral", "textbook"):
            raise ValueError(
                f"sampler {sampler!r} is not implemented for latent checkpoints "
                "(supported: ddim [default], ancestral/textbook)"
            )

        def decode01(z):
            return _decode01(lmeta, ae_params, z)

        if "consistency" in meta:  # latent consistency model: 1-call + decode
            _reject_eta(eta, "latent-consistency")
            from igdm_tpu.sampling.consistency import sample_consistency

            cmeta = meta["consistency"]
            n_calls = int(steps) if steps is not None else int(cmeta.get("default_steps", 1))
            z = sample_consistency(
                params, cmeta["grid"], key, num_images=num_images,
                steps=n_calls, cfg=cfg, channels=channels,
                image_size=image_size, model_kind=model_kind,
                model_state=state, sigma_data=float(cmeta.get("sigma_data", 0.5)),
            )
            return decode01(z), {
                "model": f"{model_kind}(latent-cd)", "T": n_calls,
                "sampler": "latent-consistency",
            }

        if "conditional" in meta:  # conditional LDM: guided CFG in latent space
            from igdm_tpu.sampling.guided import sample_cfg

            num_classes = int(meta["conditional"]["num_classes"])
            lab = (
                np.full((num_images,), int(label) % num_classes)
                if label is not None
                else np.arange(num_images) % num_classes
            )
            z = sample_cfg(
                params, key, jnp.asarray(lab), guidance_scale=guidance_scale,
                cfg=cfg, num_sample_steps=ddim_steps, image_size=image_size,
                channels=channels, clip_x0=False, eta=eta,
                objective=(meta.get("train_cfg") or {}).get("objective", "eps"),
            )
            return decode01(z), {
                "model": f"{model_kind}(latent-cond)", "T": ddim_steps,
                "sampler": "latent-cfg", "guidance_scale": guidance_scale,
            }

        _lat_method = "ddim" if sampler in ("auto", "ddim") else "ancestral"
        if _lat_method != "ddim":
            _reject_eta(eta, "latent-ancestral")
        z = sample_latent(
            params, ae_params, key, cfg=cfg, decode=False,  # decode01 decodes
            num_images=num_images, latent_size=image_size, latent_ch=channels,
            method=_lat_method,
            num_sample_steps=ddim_steps, model_kind=model_kind,
            model_state=state, eta=eta,
        )
        return decode01(z), {
            "model": f"{model_kind}(latent)",
            "T": len(np.unique(np.linspace(1, cfg.num_steps, ddim_steps).round()))
            if sampler in ("auto", "ddim") else cfg.num_steps,
            "sampler": "latent-ddim" if sampler in ("auto", "ddim") else "latent-ancestral",
        }

    if "distill" in meta:  # progressively-distilled student: its own grid
        _reject_eta(eta, "distilled")
        from igdm_tpu.sampling.ancestral import sample_distilled

        grid = meta["distill"]["grid"]
        out = sample_distilled(
            params, grid, key, num_images=num_images, cfg=cfg,
            channels=channels, image_size=image_size, model_kind=model_kind,
            model_state=state,
        )
        arr = np.asarray(out)
        imgs01 = (arr[..., 0] + 1.0) / 2.0 if channels == 1 else (arr + 1.0) / 2.0
        return imgs01, {
            "model": model_kind, "T": len(grid) - 1, "sampler": "distilled",
        }

    if "consistency" in meta:  # consistency-distilled model: 1-2 call f
        _reject_eta(eta, "consistency")
        from igdm_tpu.sampling.consistency import sample_consistency

        cmeta = meta["consistency"]
        grid = cmeta["grid"]
        # explicit ``steps`` (CLI --steps) overrides the checkpoint's
        # default_steps, making the multistep 2/4-call operating points
        # reachable through this entry point (round-3 advisor finding)
        n_calls = int(steps) if steps is not None else int(cmeta.get("default_steps", 1))
        out = sample_consistency(
            params, grid, key, num_images=num_images, steps=n_calls, cfg=cfg,
            channels=channels, image_size=image_size, model_kind=model_kind,
            model_state=state, sigma_data=float(cmeta.get("sigma_data", 0.5)),
        )
        arr = np.clip(np.asarray(out), -1.0, 1.0)
        imgs01 = (arr[..., 0] + 1.0) / 2.0 if channels == 1 else (arr + 1.0) / 2.0
        return imgs01, {
            "model": model_kind, "T": n_calls, "sampler": "consistency",
        }

    if "conditional" in meta:  # classifier-free-guided sampling
        from igdm_tpu.sampling.guided import sample_cfg

        num_classes = int(meta["conditional"]["num_classes"])
        lab = (
            np.full((num_images,), int(label) % num_classes)
            if label is not None
            else np.arange(num_images) % num_classes
        )
        out = sample_cfg(
            params, key, jnp.asarray(lab), guidance_scale=guidance_scale,
            cfg=cfg, num_sample_steps=ddim_steps, image_size=image_size,
            channels=channels, eta=eta,
            objective=(meta.get("train_cfg") or {}).get("objective", "eps"),
        )
        arr = np.asarray(out)
        imgs01 = (arr[..., 0] + 1.0) / 2.0 if channels == 1 else (arr + 1.0) / 2.0
        return imgs01, {
            "model": model_kind, "T": cfg.num_steps, "sampler": "cfg",
            "guidance_scale": guidance_scale, "labels": lab.tolist(),
        }

    # v-prediction checkpoints (TrainConfig.objective="v"): adapt the model
    # to the eps interface once; every sampler below consumes eps.
    apply_fn = None
    objective = (meta.get("train_cfg") or {}).get("objective", "eps")
    if objective == "v":
        from igdm_tpu.diffusion.schedules import alphas_cumprod, betas_for_config
        from igdm_tpu.sampling.ancestral import v_to_eps_apply_fn
        from igdm_tpu.training.ddpm import make_apply_fn

        apply_fn = v_to_eps_apply_fn(
            make_apply_fn(model_kind, cfg.embed_dim),
            alphas_cumprod(betas_for_config(cfg)),
        )

    if sampler == "auto":
        sampler = "textbook" if (model_kind == "unet4" or objective == "v") else "ancestral"
    if sampler == "ancestral" and objective == "v":
        sampler = "textbook"  # the reference-exact path is eps-only by design

    if sampler == "ddim":
        from igdm_tpu.sampling.ancestral import sample_ddim

        out = sample_ddim(
            params, state, key, num_images=num_images, cfg=cfg,
            num_sample_steps=ddim_steps, eta=eta, channels=channels,
            image_size=image_size, model_kind=model_kind, apply_fn=apply_fn,
        )
    elif sampler == "dpmpp":
        _reject_eta(eta, "dpmpp")
        from igdm_tpu.sampling.ancestral import sample_dpmpp2m

        out = sample_dpmpp2m(
            params, state, key, num_images=num_images, cfg=cfg,
            num_sample_steps=ddim_steps, channels=channels, image_size=image_size,
            model_kind=model_kind, apply_fn=apply_fn,
        )
    elif sampler == "heun":
        _reject_eta(eta, "heun")
        from igdm_tpu.sampling.ancestral import sample_heun

        out = sample_heun(
            params, state, key, num_images=num_images, cfg=cfg,
            num_sample_steps=ddim_steps, channels=channels, image_size=image_size,
            model_kind=model_kind, apply_fn=apply_fn,
        )
    elif sampler == "ancestral" and model_kind == "unet_small":
        _reject_eta(eta, "ancestral")
        from igdm_tpu.sampling.ancestral import sample_ddpm

        out = sample_ddpm(
            params, state, key, num_images=num_images, cfg=cfg,
            channels=channels, image_size=image_size,
        )
    else:  # textbook posterior works for both families
        _reject_eta(eta, "textbook-ancestral")
        from igdm_tpu.sampling.ancestral import make_textbook_sampler

        fn = make_textbook_sampler(
            params, state, cfg=cfg, num_images=num_images,
            image_size=image_size, channels=channels, model_kind=model_kind,
            apply_fn=apply_fn,
        )
        out = fn(key)
        sampler = "textbook"

    arr = np.asarray(out)
    imgs01 = (arr[..., 0] + 1.0) / 2.0 if channels == 1 else (arr + 1.0) / 2.0
    return imgs01, {"model": model_kind, "T": cfg.num_steps, "sampler": sampler}


def inpaint_from_checkpoint(
    path: str,
    key,
    known01,
    mask,
    *,
    num_images: int = 1,
    resample: int = 1,
    prefer_ema: bool = False,
):
    """Inpaint the masked-out region of ``known01`` with any plain DDPM
    checkpoint (RePaint sampling, :func:`igdm_tpu.sampling.edit.sample_inpaint`).

    Args:
      known01: (H, W) or (H, W, C) image in [0, 1]; mask==1 pixels are kept.
      mask: same spatial shape, 1.0 = keep, 0.0 = regenerate.
      num_images: number of independent completions to draw.
      resample: RePaint time-travel count r (r=1 is a single pass).

    Returns (images01 (N,H,W[,C]) in [0,1], info dict). Distilled /
    conditional / modern checkpoints are rejected — inpainting projects
    through the training schedule's forward marginals, which only the plain
    DDPM checkpoints expose.
    """
    import jax as _jax

    from igdm_tpu.checkpoint.pytree_io import load_for_sampling
    from igdm_tpu.sampling.edit import sample_inpaint

    params, state, meta = load_for_sampling(str(path), prefer_ema=prefer_ema)
    for kind in (
        "distill", "conditional", "modern_cfg", "superres", "flow", "consistency"
    ):
        if kind in meta:
            raise ValueError(
                f"--inpaint needs a plain DDPM checkpoint; {path} is a "
                f"'{kind}' checkpoint"
            )
    params = _jax.tree_util.tree_map(jnp.asarray, params)
    state = _jax.tree_util.tree_map(jnp.asarray, state)
    model_kind = meta.get("model", "unet_small")
    cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
    channels = int(meta.get("data", {}).get("channels", 1))

    known01 = np.asarray(known01, np.float32)
    squeeze = known01.ndim == 2
    if squeeze:
        known01 = known01[..., None]
    if known01.shape[-1] != channels:
        raise ValueError(
            f"input has {known01.shape[-1]} channel(s); checkpoint expects {channels}"
        )
    known = jnp.asarray(known01 * 2.0 - 1.0)[None].repeat(num_images, axis=0)
    mask = jnp.broadcast_to(
        jnp.asarray(mask, jnp.float32).reshape(known01.shape[0], known01.shape[1], -1),
        known.shape[1:],
    )[None].repeat(num_images, axis=0)

    apply_fn = None
    if (meta.get("train_cfg") or {}).get("objective") == "v":
        from igdm_tpu.diffusion.schedules import alphas_cumprod, betas_for_config
        from igdm_tpu.sampling.ancestral import v_to_eps_apply_fn
        from igdm_tpu.training.ddpm import make_apply_fn

        apply_fn = v_to_eps_apply_fn(
            make_apply_fn(model_kind, cfg.embed_dim),
            alphas_cumprod(betas_for_config(cfg)),
        )
    out = sample_inpaint(
        params, state, key, known, mask, cfg=cfg, resample=resample,
        model_kind=model_kind, apply_fn=apply_fn,
    )
    arr = (np.asarray(out) + 1.0) / 2.0
    if squeeze:
        arr = arr[..., 0]
    return arr, {
        "model": model_kind, "T": cfg.num_steps, "sampler": "inpaint",
        "resample": resample,
    }
