"""Serving export/load: self-contained compiled inference artifacts.

A TPU-native capability with no reference analogue (the reference serves
by instantiating the torch model in Python): the full jitted inference
program — backbone + heads + anchors + static-shape post-processing,
with the checkpoint's weights baked in as constants — is serialized to a
portable StableHLO artifact via ``jax.export``. The artifact is
self-describing (JSON header with shapes and output keys) and callable
without any paa_tpu model-building code or config, so a serving fleet
only needs jax + the artifact file.

Produced by ``tools/export_model.py``; loaded with ``load_exported``.
"""

from __future__ import annotations

import json
import struct

import jax

_MAGIC = b"PAATPU01"


def export_inference(model, variables, batch, hw, platforms=None):
    """Export the model's eval fn at a static (batch, *hw) input shape.

    Returns (exported, meta): a ``jax.export.Exported`` plus the JSON
    header dict. ``platforms`` defaults to the current backend; pass
    e.g. ("tpu", "cpu") for a multi-platform artifact.
    """
    import jax.numpy as jnp

    eval_fn = model.make_eval_fn(variables)
    # re-wrap: Exported functions must be jitted at the top level
    fn = jax.jit(lambda images, sizes: eval_fn(images, sizes))
    img_spec = jax.ShapeDtypeStruct((batch, *hw, 3), jnp.float32)
    size_spec = jax.ShapeDtypeStruct((batch, 2), jnp.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax.export.export(fn, **kwargs)(img_spec, size_spec)
    meta = {
        "input_shape": [batch, *hw, 3],
        "sizes_shape": [batch, 2],
        "platforms": list(exported.platforms),
        "outputs": ["boxes", "scores", "labels", "valid"],
    }
    return exported, meta


def save_exported(path, exported, meta):
    """magic | u32 header_len | JSON header | serialized Exported."""
    header = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(exported.serialize())


def load_exported(path):
    """Returns (call, meta): ``call(images, sizes)`` -> detection dict.

    Needs only jax — no config, no model code, no checkpoint.
    """
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a paa_tpu serving artifact")
        (hlen,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(hlen).decode())
        exported = jax.export.deserialize(bytearray(f.read()))
    return jax.jit(exported.call), meta
