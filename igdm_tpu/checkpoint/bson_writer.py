"""Minimal BSON.jl-format writer — the inverse of :mod:`bson_reader`.

Two purposes:

* **Export**: write igdm_tpu checkpoints back into the reference's BSON.jl
  container (``export_shared_unet4``) so Julia-side tooling can read them —
  a capability the reference has only one-way.
* **Fixtures**: the reference never committed a gen-3
  (last_desperate_attempt) checkpoint, so ``import_shared_unet4`` is tested
  against a synthetic checkpoint produced here (tests/test_bson_import.py),
  exercising the full bytes -> load_bson -> import path.

Format notes (mirrors what bson_reader handles): standard BSON documents
with julia tag conventions — ``{"tag": "struct", "type": <datatype>,
"data": [...]}``, ``{"tag": "array", ...}`` with column-major binary data.
Nodes are emitted inline (no ``_backrefs`` indirection — the reader treats
backrefs as an optional compression, not a requirement).

Flux struct field orders used below (Flux 0.16 normalise.jl / layers, the
version the reference pins in Project.toml; the shared β-before-γ array
order for BatchNorm was validated empirically against the reference's real
gen-2 checkpoints by the eps-prediction discriminator test):

* ``Conv``:      σ, weight(k1,k2,Cin,Cout), bias, stride, pad, dilation, groups
* ``Dense``:     weight(out,in), bias, σ
* ``GroupNorm``: G, λ, β(bias), γ(scale), μ, σ², ϵ, momentum, affine,
                 track_stats, active, chs — arrays in field order: β then γ
                 (same relative order as the validated BatchNorm layout).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Node builders (the duals of bson_reader._Resolver's tag handlers)
# ---------------------------------------------------------------------------


def jl_datatype(*name_parts: str) -> dict:
    return {"tag": "datatype", "name": list(name_parts), "params": []}


def jl_struct(typename: str, fields: list) -> dict:
    """A Julia struct node; typename is dotted (e.g. 'Flux.Conv')."""
    return {"tag": "struct", "type": jl_datatype(*typename.split(".")), "data": list(fields)}


def jl_array(arr) -> dict:
    """A Float32 Julia array node (column-major binary payload)."""
    arr = np.asarray(arr, np.float32)
    return {
        "tag": "array",
        "type": jl_datatype("Core", "Float32"),
        "size": [int(s) for s in arr.shape],
        "data": arr.ravel(order="F").tobytes(),
    }


def jl_tuple(items) -> dict:
    return {"tag": "tuple", "data": list(items)}


# ---------------------------------------------------------------------------
# BSON byte encoding
# ---------------------------------------------------------------------------


def _enc_element(key: str, val) -> bytes:
    k = key.encode() + b"\x00"
    if isinstance(val, bool) or isinstance(val, np.bool_):
        return b"\x08" + k + (b"\x01" if val else b"\x00")
    if isinstance(val, (float, np.floating)):
        return b"\x01" + k + struct.pack("<d", float(val))
    if isinstance(val, (int, np.integer)):
        return b"\x12" + k + struct.pack("<q", int(val))
    if val is None:
        return b"\x0a" + k
    if isinstance(val, str):
        s = val.encode() + b"\x00"
        return b"\x02" + k + struct.pack("<i", len(s)) + s
    if isinstance(val, (bytes, bytearray)):
        return b"\x05" + k + struct.pack("<i", len(val)) + b"\x00" + bytes(val)
    if isinstance(val, (list, tuple)):
        return b"\x04" + k + _enc_doc({str(i): v for i, v in enumerate(val)})
    if isinstance(val, dict):
        return b"\x03" + k + _enc_doc(val)
    raise TypeError(f"cannot BSON-encode {type(val)} for key {key!r}")


def _enc_doc(d: dict) -> bytes:
    body = b"".join(_enc_element(k, v) for k, v in d.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def save_bson(path: str, doc: dict) -> None:
    """Write a root document of (tag-)nodes to a BSON.jl-compatible file."""
    with open(path, "wb") as fh:
        fh.write(_enc_doc(doc))


# ---------------------------------------------------------------------------
# Gen-3 (Shared.SimpleUNet) checkpoint export
# ---------------------------------------------------------------------------


def _jl_conv(p: dict) -> dict:
    """unet4 conv params (HWIO cross-correlation) -> Flux Conv node.

    Flux Conv is true convolution (flipped kernels) over (k1,k2,Cin,Cout);
    the spatial flip is its own inverse, so export flips exactly like import
    (bson_import._conv_params)."""
    w = np.asarray(p["w"], np.float32)[::-1, ::-1, :, :]
    fields = [jl_datatype("NNlib", "identity"), jl_array(np.ascontiguousarray(w))]
    fields.append(jl_array(p["b"]) if "b" in p else False)  # bias=false -> Bool field
    fields += [jl_tuple([1, 1]), jl_tuple([1, 1, 1, 1]), jl_tuple([1, 1]), 1]
    return jl_struct("Flux.Conv", fields)


def _jl_dense(p: dict) -> dict:
    """ours (in,out) -> Flux (out,in)."""
    w = np.ascontiguousarray(np.asarray(p["w"], np.float32).T)
    return jl_struct(
        "Flux.Dense", [jl_array(w), jl_array(p["b"]), jl_datatype("NNlib", "identity")]
    )


def _jl_groupnorm(gn: dict, groups: int = 8) -> dict:
    chs = int(np.asarray(gn["scale"]).shape[0])
    return jl_struct(
        "Flux.GroupNorm",
        [
            groups,                        # G
            jl_datatype("NNlib", "identity"),  # λ
            jl_array(gn["bias"]),          # β
            jl_array(gn["scale"]),         # γ
            None,                          # μ (track_stats=false)
            None,                          # σ²
            1e-5,                          # ϵ
            0.1,                           # momentum
            True,                          # affine
            False,                         # track_stats
            None,                          # active
            chs,
        ],
    )


def _jl_chain(layers: list) -> dict:
    return jl_struct("Flux.Chain", [jl_tuple(layers)])


def _jl_gn_conv_block(block: dict) -> dict:
    """{conv1, gn1[, conv2, gn2]} -> Chain(Conv, GroupNorm, swish[, ...])."""
    swish = jl_datatype("NNlib", "swish")
    layers = [_jl_conv(block["conv1"]), _jl_groupnorm(block["gn1"]), swish]
    if "conv2" in block:
        layers += [_jl_conv(block["conv2"]), _jl_groupnorm(block["gn2"]), swish]
    return _jl_chain(layers)


def export_shared_unet4(path: str, params: dict, mu: float = 0.0, sigma: float = 1.0) -> None:
    """Write a models.unet4 params pytree as a Shared.SimpleUNet BSON
    checkpoint (struct field order: last_desperate_attempt/src/shared.jl:128-172;
    checkpoint keys model/μ/σ per train_net.jl:231-233). Requires levels=4
    (the Shared topology)."""
    levels = sum(1 for k in params if k.startswith("down"))
    if levels != 4:
        raise ValueError(f"Shared.SimpleUNet export requires a 4-level unet4, got {levels}")

    maxpool = jl_struct("Flux.MaxPool", [jl_tuple([2, 2]), jl_tuple([2, 2]), jl_tuple([0, 0, 0, 0])])
    upsample = jl_struct("Flux.Upsample", [jl_tuple([2, 2]), None])

    tm = params["time_mlp"]
    fields: list = [
        jl_struct("Main.Shared.TimeEmbedMLP", [_jl_dense(tm["dense1"]), _jl_dense(tm["dense2"])])
    ]
    for name in ("down1", "down2", "down3", "down4"):
        fields += [
            _jl_gn_conv_block(params[name]["block"]),
            _jl_dense(params[name]["tbias"]),
            maxpool,
        ]
    fields += [_jl_gn_conv_block(params["mid"]["block"]), _jl_dense(params["mid"]["tbias"])]
    for name in ("up3", "up2", "up1", "up0"):
        fields += [
            upsample,
            _jl_gn_conv_block(params[name]["block"]),
            _jl_dense(params[name]["tbias"]),
        ]
    final_w = np.asarray(params["final"]["w"], np.float32)[::-1, ::-1, :, :]
    final_conv = jl_struct(
        "Flux.Conv",
        [
            jl_datatype("NNlib", "identity"),
            jl_array(np.ascontiguousarray(final_w)),
            False,  # bias=false (shared.jl:274)
            jl_tuple([1, 1]),
            jl_tuple([0, 0, 0, 0]),
            jl_tuple([1, 1]),
            1,
        ],
    )
    fields.append(_jl_chain([final_conv, jl_datatype("NNlib", "sigmoid")]))

    model = jl_struct("Main.Shared.SimpleUNet", fields)
    save_bson(path, {"model": model, "μ": float(mu), "σ": float(sigma)})
