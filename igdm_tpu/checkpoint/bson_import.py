"""Import the reference's BSON checkpoints into igdm_tpu pytrees.

Handles the committed train_brain checkpoints (ddpm_epoch_*.bson,
trained_model.bson: keys model/opt[/epoch], SimpleUNet struct — layout
documented in SURVEY.md section 2.5) and last_desperate_attempt checkpoints
(model/mu/sigma).

Weight-layout conversions (validated empirically by the eps-prediction
discriminator test in tests/test_bson_import.py):

* Julia arrays decode column-major; a Flux Conv weight arrives as
  (k1, k2, Cin, Cout) where k1/k2 index the same spatial dims as our H/W
  (we map MATLAB/Julia dim1 -> H, dim2 -> W everywhere).
* Flux ``Conv`` performs *true convolution* (NNlib flips kernels); XLA's
  conv is cross-correlation, so imported kernels are flipped along both
  spatial dims.
* Flux ``ConvTranspose`` weight is (k1, k2, Cout, Cin) and its forward is the
  adjoint of the flipped conv; for lax.conv_transpose (transpose_kernel=False,
  cross-correlation semantics) this maps to swapping the channel axes with NO
  spatial flip (adjoint-of-flip == unflipped correlation).
* Flux ``BatchNorm`` fields in struct order: lambda, beta(bias), gamma(scale),
  mu(mean), sigma^2(var), eps, momentum, ... — running stats imported for
  eval; eps=1e-5 momentum=0.1 match ops.nn.batch_norm defaults.

The reference's ``opt`` subtree holds only the Adam *rule* (lr/betas/eps) —
no moment state was ever saved (src/train_brain.jl:295-300), so imported
checkpoints can seed evaluation or fresh fine-tuning but not exact resume.
"""

from __future__ import annotations

import numpy as np

from igdm_tpu.checkpoint.bson_reader import JuliaStruct, load_bson


def _is_type(node, name: str) -> bool:
    return isinstance(node, JuliaStruct) and node.typename.endswith(name)


def _conv_params(conv: JuliaStruct, *, flip: bool = True) -> dict:
    w, b = conv.arrays()[:2]
    w = np.asarray(w, np.float32)
    if flip:
        w = w[::-1, ::-1, :, :]
    return {"w": np.ascontiguousarray(w), "b": np.asarray(b, np.float32)}


def _convtranspose_params(convt: JuliaStruct) -> dict:
    w, b = convt.arrays()[:2]
    # (k1, k2, Cout, Cin) -> (k1, k2, Cin, Cout); no spatial flip (see module doc)
    w = np.transpose(np.asarray(w, np.float32), (0, 1, 3, 2))
    return {"w": np.ascontiguousarray(w), "b": np.asarray(b, np.float32)}


def _bn_params(bn: JuliaStruct) -> tuple[dict, dict]:
    beta, gamma, mean, var = bn.arrays()[:4]
    params = {"scale": np.asarray(gamma, np.float32), "bias": np.asarray(beta, np.float32)}
    state = {"mean": np.asarray(mean, np.float32), "var": np.asarray(var, np.float32)}
    return params, state


def _chain_layers(chain: JuliaStruct) -> list:
    (layers,) = chain.fields
    return list(layers)


def _import_conv_bn_block(layers: list, *, expect: int) -> tuple[dict, dict]:
    """Consume alternating Conv/BatchNorm layers -> {conv_i, bn_i} params/state."""
    params: dict = {}
    state: dict = {}
    idx = 0
    for layer in layers:
        if _is_type(layer, "Conv"):
            idx += 1
            params[f"conv{idx}"] = _conv_params(layer)
        elif _is_type(layer, "BatchNorm"):
            p, s = _bn_params(layer)
            params[f"bn{idx}"] = p
            state[f"bn{idx}"] = s
    if idx != expect:
        raise ValueError(f"expected {expect} convs in chain, found {idx}")
    return params, state


def import_simple_unet(path: str) -> tuple[dict, dict, dict]:
    """Load a train_brain SimpleUNet checkpoint -> (params, state, meta).

    Struct field order (src/train_brain.jl:89-96): down1, down2, mid, up2,
    up1, final.
    """
    doc = load_bson(path)
    model = doc["model"]
    if not _is_type(model, "SimpleUNet"):
        raise ValueError(f"not a SimpleUNet checkpoint: {model}")
    down1, down2, mid, up2, up1, final = model.fields

    params: dict = {}
    state: dict = {}

    params["down1"], state["down1"] = _import_conv_bn_block(_chain_layers(down1), expect=2)
    params["down2"], state["down2"] = _import_conv_bn_block(_chain_layers(down2), expect=2)
    params["mid"], state["mid"] = _import_conv_bn_block(_chain_layers(mid), expect=2)

    up2_layers = _chain_layers(up2)
    convt = up2_layers[0]
    if not _is_type(convt, "ConvTranspose"):
        raise ValueError("up2 chain must start with ConvTranspose")
    p, s = _import_conv_bn_block(up2_layers[1:], expect=2)
    p["convt"] = _convtranspose_params(convt)
    params["up2"], state["up2"] = p, s

    params["up1"], state["up1"] = _import_conv_bn_block(_chain_layers(up1), expect=2)
    params["final"] = _conv_params(final)

    meta = {"epoch": int(doc["epoch"]) if "epoch" in doc else None}
    opt = doc.get("opt")
    if isinstance(opt, JuliaStruct) and opt.typename.endswith("Adam"):
        # fields: eta (lr), (b1, b2), epsilon — the rule only, no moments
        meta["adam_lr"] = float(opt.fields[0])
        meta["adam_betas"] = tuple(float(x) for x in opt.fields[1])
    n = sum(int(a.size) for a in _tree_arrays(params))
    meta["num_params"] = n
    return params, state, meta


def _tree_arrays(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _tree_arrays(v)
    else:
        yield tree


def import_shared_unet4(path: str) -> tuple[dict, dict]:
    """Load a last_desperate_attempt Shared.SimpleUNet checkpoint ->
    (params pytree for models.unet4, meta with mu/sigma).

    Struct field order: last_desperate_attempt/src/shared.jl:128-172.
    """
    doc = load_bson(path)
    model = doc["model"]
    if not _is_type(model, "SimpleUNet"):
        raise ValueError(f"not a Shared.SimpleUNet checkpoint: {model}")
    f = model.fields
    # field order: time_mlp; (down{i}_conv, down{i}_timebias, down{i}_pool) x4;
    # mid_conv, mid_timebias; (up{i}_upsample, up{i}_conv, up{i}_timebias) x4; final_conv
    time_mlp = f[0]

    def _dense(d: JuliaStruct) -> dict:
        w, b = d.arrays()[:2]
        # Flux Dense weight is (out, in); ours is (in, out)
        return {"w": np.ascontiguousarray(np.asarray(w, np.float32).T), "b": np.asarray(b, np.float32)}

    def _gn_block(chain: JuliaStruct) -> dict:
        layers = _chain_layers(chain)
        out: dict = {}
        idx = 0
        for layer in layers:
            if _is_type(layer, "Conv"):
                idx += 1
                arrays = layer.arrays()
                p = _conv_params(layer) if len(arrays) >= 2 else {
                    "w": np.ascontiguousarray(np.asarray(arrays[0], np.float32)[::-1, ::-1, :, :])
                }
                out[f"conv{idx}"] = p
            elif _is_type(layer, "GroupNorm"):
                # Flux GroupNorm field order (normalise.jl, Flux 0.16): G, λ,
                # β(bias), γ(scale), μ, σ², ϵ, momentum, affine, track_stats,
                # active, chs. GroupNorm defaults track_stats=false, so μ/σ²
                # are nothing and the array-typed fields are exactly [β, γ] —
                # the same β-before-γ relative order as BatchNorm, which is
                # validated empirically against the reference's real gen-2
                # checkpoints (tests/test_bson_import.py discriminator test).
                # Round-tripped via checkpoint.bson_writer in tests.
                arrs = layer.arrays()
                if len(arrs) != 2:
                    raise ValueError(
                        f"GroupNorm: expected 2 array fields (beta, gamma; "
                        f"track_stats=false), found {len(arrs)}"
                    )
                beta, gamma = arrs[0], arrs[1]
                out[f"gn{idx}"] = {
                    "scale": np.asarray(gamma, np.float32),
                    "bias": np.asarray(beta, np.float32),
                }
        return out

    params: dict = {
        "time_mlp": {
            "dense1": _dense(time_mlp.fields[0]),
            "dense2": _dense(time_mlp.fields[1]),
        }
    }
    # down path: fields 1..12 step 3
    names = ["down1", "down2", "down3", "down4"]
    for i, name in enumerate(names):
        conv = f[1 + 3 * i]
        tbias = f[2 + 3 * i]
        params[name] = {"block": _gn_block(conv), "tbias": _dense(tbias)}
    params["mid"] = {"block": _gn_block(f[13]), "tbias": _dense(f[14])}
    upnames = ["up3", "up2", "up1", "up0"]
    for i, name in enumerate(upnames):
        conv = f[16 + 3 * i]
        tbias = f[17 + 3 * i]
        params[name] = {"block": _gn_block(conv), "tbias": _dense(tbias)}
    final_chain = _chain_layers(f[27])
    final_conv = final_chain[0]
    params["final"] = {
        "w": np.ascontiguousarray(np.asarray(final_conv.arrays()[0], np.float32)[::-1, ::-1, :, :])
    }
    meta = {"mu": float(doc.get("μ", 0.0)), "sigma": float(doc.get("σ", 1.0))}
    return params, meta
