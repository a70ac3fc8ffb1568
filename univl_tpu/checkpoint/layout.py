"""Parameter-layout conversion between unrolled and scanned tower stacks.

``TransformerStack(scan_layers=True)`` stores each tower's layers as ONE
subtree ``encoder/layers/...`` whose leaves carry a leading [num_layers]
axis, instead of ``encoder/layer_0 .. encoder/layer_{N-1}``. The math is
identical; only the parameter tree shape differs. These helpers convert
checkpoints between the two layouts so that:

  - torch-converted checkpoints (always emitted in layer_i layout, matching
    the reference's state_dict structure) load into scanned models,
  - checkpoints written by a scanned model load into unrolled models (the
    KV-cache fast decoder and older tools read layer_i paths).

Only the three encoder towers (text/visual/cross) are affected; the caption
decoder is always unrolled (3 layers; evals/fast_decoder.py reads its raw
``layer_i`` paths).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import numpy as np

_LAYER_RE = re.compile(r"^layer_(\d+)$")


def _is_loop_encoder(node: Any) -> bool:
    return (
        isinstance(node, dict)
        and len(node) > 0
        and all(_LAYER_RE.match(k) for k in node)
    )


def _is_scan_encoder(node: Any) -> bool:
    return isinstance(node, dict) and set(node.keys()) == {"layers"}


def stack_encoder_layers(encoder: Dict) -> Dict:
    """{layer_0: t, ..., layer_{N-1}: t} -> {layers: t with leading [N] axis}."""
    if _is_scan_encoder(encoder):
        return encoder
    if not _is_loop_encoder(encoder):
        raise ValueError(
            f"not an unrolled encoder node (keys: {sorted(encoder)[:4]}...)"
        )
    n = len(encoder)
    trees = [encoder[f"layer_{i}"] for i in range(n)]  # KeyError if gappy

    def stack(*leaves):
        return np.stack([np.asarray(l) for l in leaves], axis=0)

    import jax

    return {"layers": jax.tree.map(stack, *trees)}


def unstack_encoder_layers(encoder: Dict) -> Dict:
    """{layers: t with leading [N] axis} -> {layer_0: t, ..., layer_{N-1}: t}."""
    if _is_loop_encoder(encoder):
        return encoder
    if not _is_scan_encoder(encoder):
        raise ValueError(
            f"not a scanned encoder node (keys: {sorted(encoder)[:4]}...)"
        )
    import jax

    stacked = encoder["layers"]
    leaves = jax.tree.leaves(stacked)
    if not leaves:
        raise ValueError("empty scanned encoder node")
    n = int(np.asarray(leaves[0]).shape[0])
    return {
        f"layer_{i}": jax.tree.map(lambda l: np.asarray(l)[i], stacked)
        for i in range(n)
    }


def _convert(tree: Any, fn) -> Any:
    """Recursively apply `fn` to every ``encoder`` node that is a tower stack.

    Walks ANY nested dict tree (params, or optimizer-state subtrees that
    mirror the params structure, e.g. Adam's mu/nu) and converts each dict
    child named ``encoder`` that matches a stack pattern. The caption
    decoder is untouched: its ``layer_i`` children sit beside embedding
    keys, never under an ``encoder`` wrapper.
    """
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        if (
            k == "encoder"
            and isinstance(v, dict)
            and (_is_loop_encoder(v) or _is_scan_encoder(v))
        ):
            out[k] = fn(v)
        else:
            out[k] = _convert(v, fn)
    return out


def to_scan_layout(params: Dict) -> Dict:
    """Convert a UniVL params (or train-state) tree's towers to the scanned
    (stacked) layout. No-op on already-scanned nodes."""
    return _convert(params, stack_encoder_layers)


def to_loop_layout(params: Dict) -> Dict:
    """Convert a UniVL params (or train-state) tree's towers to the unrolled
    layer_i layout. No-op on already-unrolled nodes."""
    return _convert(params, unstack_encoder_layers)


def _target_is_scan(like: Any) -> bool | None:
    """Infer the tower layout used by `like` (None if no tower found)."""
    if not isinstance(like, dict):
        return None
    for k, v in like.items():
        if k == "encoder" and isinstance(v, dict):
            if _is_scan_encoder(v):
                return True
            if _is_loop_encoder(v):
                return False
        found = _target_is_scan(v)
        if found is not None:
            return found
    return None


def _rechunk_1d(src: Any, tgt: Any) -> Any:
    """Copy a 1-D flat vector into the 2-D [rows, width] chunked layout
    (prefix-copy + zero-fill; padding is zero in both layouts)."""
    if getattr(src, "ndim", None) == 1 and getattr(tgt, "ndim", None) == 2:
        flat = np.asarray(src)
        rows, width = tgt.shape
        new = np.zeros(rows * width, flat.dtype)
        n = min(new.size, flat.size)
        new[:n] = flat[:n]
        return new.reshape(rows, width)
    return src


def _adapt_zero1_moments(raw: Any, like: Any, root_params: Any = None) -> Any:
    """Upgrade old ZeRO-1 checkpoints to the current Zero1State layout
    (train/zero1.py):

      - pre-v2: m/v moments stored as ONE flat 1-D [T_pad] vector; v2+
        stores [T_pad // 8192, 8192]. Both pad with zeros past the true
        param total and padding moments stay zero (their gradient is
        zero), so conversion is copy-the-common-prefix + zero-fill.
      - pre-v3: no flat fp32 master-param vector ``p``. The master is
        bitwise equal to the replicated param tree by construction, so it
        is synthesized from the CHECKPOINT's own params (``root_params``,
        the raw state dict's 'params' subtree) in jax.tree.leaves order —
        exactly zero1.py's _flatten. A bare Zero1State checkpoint with no
        params in the tree cannot be upgraded and fails loudly.

    Walks any state tree and fixes each {step, m, v[, p]} node that
    mismatches the template's."""
    if not (isinstance(raw, dict) and isinstance(like, dict)):
        return raw
    if root_params is None and "params" in raw:
        root_params = raw["params"]
    keys, lkeys = set(raw.keys()), set(like.keys())
    if keys in ({"step", "m", "v"}, {"step", "m", "v", "p"}) and lkeys in (
        {"step", "m", "v"}, {"step", "m", "v", "p"}
    ):
        out = dict(raw)
        for k in ("m", "v"):
            out[k] = _rechunk_1d(raw[k], like[k])
        if "p" in lkeys and "p" not in keys:
            if root_params is None:
                raise ValueError(
                    "cannot upgrade a pre-v3 ZeRO-1 checkpoint without its "
                    "params: the flat fp32 master is rebuilt from the "
                    "checkpoint's own 'params' subtree (train/zero1.py v3)"
                )
            leaves = [
                np.asarray(l, np.float32).reshape(-1)
                for l in jax.tree.leaves(root_params)
            ]
            flat = np.concatenate(leaves) if len(leaves) > 1 else leaves[0]
            rows, width = like["p"].shape
            new = np.zeros(rows * width, np.float32)
            new[: flat.size] = flat
            out["p"] = new.reshape(rows, width)
        return out
    return {
        k: _adapt_zero1_moments(v, like[k], root_params) if k in like else v
        for k, v in raw.items()
    }


def adapt_layout(params: Dict, like: Dict) -> Dict:
    """Convert `params`' towers to match the layout used by `like`.

    `like` is typically the freshly-initialized model params (or an
    eval_shape of them); it may also be a full train-state tree. Returns
    `params` unchanged when `like` contains no tower or layouts match.
    Also upgrades old ZeRO-1 states to the current Zero1State layout (see
    _adapt_zero1_moments) — AFTER the tower-layout conversion, so a
    synthesized v3 master is flattened in the template's leaf order.
    """
    target_scan = _target_is_scan(like)
    if target_scan is not None:
        params = to_scan_layout(params) if target_scan else to_loop_layout(params)
    return _adapt_zero1_moments(params, like)
