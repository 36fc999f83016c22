"""Flat-pytree checkpoints (npz).

Replaces the reference's BSON whole-object dumps (src/train_brain.jl:295-300)
with a portable format that actually supports resume: every checkpoint stores
params + BatchNorm state + full optimizer state + step + RNG key + the frozen
configs as JSON. The reference never saved the Adam moments (SURVEY.md 5.4) —
a resumed run there silently restarts the optimizer; here resume is exact.

Keys are '/'-joined pytree paths; arrays are saved as-is (no pickling), so
checkpoints are language-neutral and mmap-friendly.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

import jax
import numpy as np

from igdm_tpu.training.train_state import TrainState


def _flatten_with_paths(tree) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_into(template, flat: dict[str, np.ndarray]):
    paths_and_leaves = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_and_leaves[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path
        )
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        leaves.append(flat[key])
    return jax.tree_util.tree_unflatten(paths_and_leaves[1], leaves)


def save_checkpoint(path: str, state: TrainState, *, epoch: int | None = None, **configs) -> str:
    """Save a TrainState plus any dataclass configs (stored as JSON)."""
    payload = {}
    for section in ("params", "model_state", "opt_state"):
        for k, v in _flatten_with_paths(getattr(state, section)).items():
            payload[f"{section}/{k}"] = v
    if getattr(state, "ema_params", None) is not None:
        for k, v in _flatten_with_paths(state.ema_params).items():
            payload[f"ema_params/{k}"] = v
    payload["step"] = np.asarray(state.step)
    payload["rng"] = np.asarray(jax.random.key_data(state.rng)) if hasattr(
        jax.random, "key_data"
    ) and jax.dtypes.issubdtype(state.rng.dtype, jax.dtypes.prng_key) else np.asarray(state.rng)
    meta = {"epoch": epoch}
    for name, cfg in configs.items():
        meta[name] = dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) else cfg
    payload["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **payload)
    return path


def _nest(flat: dict[str, np.ndarray]) -> dict:
    """'a/b/c' keys -> nested dicts (inverse of _flatten_with_paths for plain
    dict pytrees — which is what all igdm_tpu model params are)."""
    out: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = val
    return out


def load_for_sampling(path: str, *, prefer_ema: bool = False) -> tuple[dict, dict, dict]:
    """Load just (params, model_state, meta) from a checkpoint — no template
    needed; nested dicts are rebuilt from the flat '/'-joined keys.

    prefer_ema: return the EMA weights instead of the raw ones when present.
    """
    flat, meta = load_checkpoint(path)
    prefix = "ema_params/" if prefer_ema and any(
        k.startswith("ema_params/") for k in flat
    ) else "params/"
    params = _nest({k[len(prefix) :]: v for k, v in flat.items() if k.startswith(prefix)})
    mstate = _nest(
        {k[len("model_state/") :]: v for k, v in flat.items() if k.startswith("model_state/")}
    )
    return params, mstate, meta


def load_checkpoint(path: str, template: TrainState | None = None) -> tuple[dict | TrainState, dict]:
    """Load a checkpoint.

    With a template TrainState, returns (TrainState, meta) with arrays slotted
    into the template's structure. Without, returns (flat dict, meta).
    """
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat.pop("__meta__").tobytes()).decode()) if "__meta__" in flat else {}
    if template is None:
        return flat, meta
    sections = {}
    for section in ("params", "model_state", "opt_state"):
        prefix = section + "/"
        sub = {k[len(prefix) :]: v for k, v in flat.items() if k.startswith(prefix)}
        sections[section] = _unflatten_into(getattr(template, section), sub)
    rng = flat["rng"]
    if hasattr(jax.random, "wrap_key_data") and jax.dtypes.issubdtype(
        template.rng.dtype, jax.dtypes.prng_key
    ):
        rng = jax.random.wrap_key_data(rng)
    ema = getattr(template, "ema_params", None)
    if ema is not None and any(k.startswith("ema_params/") for k in flat):
        sub = {k[len("ema_params/") :]: v for k, v in flat.items() if k.startswith("ema_params/")}
        ema = _unflatten_into(ema, sub)
    state = template.replace(
        params=sections["params"],
        model_state=sections["model_state"],
        opt_state=sections["opt_state"],
        step=flat["step"],
        rng=rng,
        ema_params=ema,
    )
    return state, meta


def strip_for_sampling(path: str, out_path: str) -> str:
    """Copy a checkpoint keeping only what sampling needs: params, EMA
    params, model_state (BatchNorm stats) and metadata. Optimizer moments,
    step and RNG are dropped — they triple the file and only matter for
    resume (artifacts/README.md size policy)."""
    with np.load(path, allow_pickle=False) as z:
        keep = {
            k: z[k]
            for k in z.files
            if k == "__meta__"
            or k.split("/")[0] in ("params", "ema_params", "model_state")
        }
    np.savez(out_path, **keep)
    return out_path
