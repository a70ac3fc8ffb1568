"""torch state_dict -> flax params converter for univl.pretrained.bin.

Maps the reference's parameter names (modules/modeling.py layout) onto the
UniVL flax tree (see univl_tpu/models/univl.py docstring). Handles:
  - gamma/beta -> weight/bias renaming (reference until_module.py:94-104)
  - torch Linear [out, in] -> flax kernel [in, out] transpose
  - LayerNorm weight -> scale
  - tied tensors stored once (decoder embeddings / LM-head decoder weights
    are the BERT tables; the visual MFM head weight is the feature projection)
  - unused reference params (bert/visual poolers) reported, not loaded

Loading the .bin requires torch (CPU) only for unpickling; the converter
also accepts a plain {name: np.ndarray} dict.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np


def load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def _rename_gamma_beta(name: str) -> str:
    return name.replace("gamma", "weight").replace("beta", "bias")


def _set(tree: dict, path: List[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# encoder-block suffix map (shared by text/visual/cross towers)
_BLOCK_MAP: List[Tuple[str, List[str], str]] = [
    # (torch suffix regex, flax sub-path, kind)
    (r"attention\.self\.query\.(weight|bias)", ["attention", "query"], "linear"),
    (r"attention\.self\.key\.(weight|bias)", ["attention", "key"], "linear"),
    (r"attention\.self\.value\.(weight|bias)", ["attention", "value"], "linear"),
    (r"attention\.output\.dense\.(weight|bias)", ["attention_output", "dense"], "linear"),
    (r"attention\.output\.LayerNorm\.(weight|bias)", ["attention_output", "ln"], "ln"),
    (r"intermediate\.dense\.(weight|bias)", ["intermediate"], "linear"),
    (r"output\.dense\.(weight|bias)", ["output", "dense"], "linear"),
    (r"output\.LayerNorm\.(weight|bias)", ["output", "ln"], "ln"),
]

_DECODER_BLOCK_MAP: List[Tuple[str, List[str], str]] = [
    (r"slf_attn\.att\.query\.(weight|bias)", ["self_attn", "query"], "linear"),
    (r"slf_attn\.att\.key\.(weight|bias)", ["self_attn", "key"], "linear"),
    (r"slf_attn\.att\.value\.(weight|bias)", ["self_attn", "value"], "linear"),
    (r"slf_attn\.output\.dense\.(weight|bias)", ["self_attn_output", "dense"], "linear"),
    (r"slf_attn\.output\.LayerNorm\.(weight|bias)", ["self_attn_output", "ln"], "ln"),
    (r"enc_attn\.att\.query\.(weight|bias)", ["enc_attn", "query"], "linear"),
    (r"enc_attn\.att\.key\.(weight|bias)", ["enc_attn", "key"], "linear"),
    (r"enc_attn\.att\.value\.(weight|bias)", ["enc_attn", "value"], "linear"),
    (r"enc_attn\.output\.dense\.(weight|bias)", ["enc_attn_output", "dense"], "linear"),
    (r"enc_attn\.output\.LayerNorm\.(weight|bias)", ["enc_attn_output", "ln"], "ln"),
    (r"intermediate\.dense\.(weight|bias)", ["intermediate"], "linear"),
    (r"output\.dense\.(weight|bias)", ["output", "dense"], "linear"),
    (r"output\.LayerNorm\.(weight|bias)", ["output", "ln"], "ln"),
]


def _leaf(kind: str, torch_param: str, value: np.ndarray) -> Tuple[str, np.ndarray]:
    """Map (kind, weight|bias) to flax leaf name + layout."""
    if kind == "linear":
        if torch_param == "weight":
            return "kernel", value.T  # [out,in] -> [in,out]
        return "bias", value
    if kind == "ln":
        return ("scale", value) if torch_param == "weight" else ("bias", value)
    if kind == "embed":
        return "embedding", value
    raise ValueError(kind)


def convert_torch_state_dict(
    state_dict: Dict[str, np.ndarray], strict_report: bool = True
) -> Tuple[dict, Dict[str, List[str]]]:
    """Returns (flax_params_tree, report{converted, skipped, unknown}).

    The tree contains only keys present in the state dict; merge it over an
    initialized params tree with `merge_params`.
    """
    sd = { _rename_gamma_beta(k): np.asarray(v) for k, v in state_dict.items() }
    tree: dict = {}
    converted, skipped, unknown = [], [], []

    # tensors that are tied duplicates in torch: stored once in flax
    tied_skip = re.compile(
        r"^(decoder\.embeddings\.(word|position)_embeddings\.weight"
        r"|decoder\.classifier\.cls\.predictions\.decoder\.weight"
        r"|cls\.predictions\.decoder\.weight"
        r"|cls_visual\.predictions\.weight)$"
    )
    # reference params with no consumer in UniVL's forward
    unused = re.compile(r"^(bert|visual)\.pooler\.")

    top_map = {
        "bert.embeddings.word_embeddings.weight": (["word_embed"], "embed"),
        "bert.embeddings.position_embeddings.weight": (["text_pos_embed"], "embed"),
        "bert.embeddings.token_type_embeddings.weight": (["text", "type_embed"], "embed"),
        "visual.embeddings.position_embeddings.weight": (["visual", "pos_embed"], "embed"),
        "cross.embeddings.position_embeddings.weight": (["cross", "pos_embed"], "embed"),
        "cross.embeddings.token_type_embeddings.weight": (["cross", "type_embed"], "embed"),
    }

    for name, value in sd.items():
        if tied_skip.match(name):
            skipped.append(name)
            continue
        if unused.match(name):
            skipped.append(name)
            continue

        if name in top_map:
            path, kind = top_map[name]
            leaf, v = _leaf(kind, "weight", value)
            _set(tree, path + [leaf], v)
            converted.append(name)
            continue

        m = re.match(r"^(bert|visual|cross)\.embeddings\.LayerNorm\.(weight|bias)$", name)
        if m:
            tower = {"bert": "text"}.get(m.group(1), m.group(1))
            leaf, v = _leaf("ln", m.group(2), value)
            _set(tree, [tower, "embed_ln", leaf], v)
            converted.append(name)
            continue

        m = re.match(r"^visual\.embeddings\.word_embeddings\.(weight|bias)$", name)
        if m:
            if m.group(1) == "weight":
                _set(tree, ["feature_proj", "kernel"], value.T)
            else:
                _set(tree, ["feature_proj", "bias"], value)
            converted.append(name)
            continue

        m = re.match(r"^(bert|visual|cross)\.encoder\.layer\.(\d+)\.(.+)$", name)
        if m:
            tower = {"bert": "text"}.get(m.group(1), m.group(1))
            layer = f"layer_{m.group(2)}"
            rest = m.group(3)
            for pat, sub, kind in _BLOCK_MAP:
                mm = re.match(pat + "$", rest)
                if mm:
                    leaf, v = _leaf(kind, mm.group(1), value)
                    _set(tree, [tower, "encoder", layer] + sub + [leaf], v)
                    converted.append(name)
                    break
            else:
                unknown.append(name)
            continue

        m = re.match(r"^cross\.pooler\.dense\.(weight|bias)$", name)
        if m:
            leaf, v = _leaf("linear", m.group(1), value)
            _set(tree, ["cross", "pooler", "dense", leaf], v)
            converted.append(name)
            continue

        m = re.match(r"^decoder\.embeddings\.LayerNorm\.(weight|bias)$", name)
        if m:
            leaf, v = _leaf("ln", m.group(1), value)
            _set(tree, ["decoder", "embed_ln", leaf], v)
            converted.append(name)
            continue

        m = re.match(r"^decoder\.decoder\.layer\.(\d+)\.(.+)$", name)
        if m:
            layer = f"layer_{m.group(1)}"
            rest = m.group(2)
            for pat, sub, kind in _DECODER_BLOCK_MAP:
                mm = re.match(pat + "$", rest)
                if mm:
                    leaf, v = _leaf(kind, mm.group(1), value)
                    _set(tree, ["decoder", layer] + sub + [leaf], v)
                    converted.append(name)
                    break
            else:
                unknown.append(name)
            continue

        m = re.match(
            r"^decoder\.classifier\.cls\.predictions\.transform\."
            r"(dense|LayerNorm)\.(weight|bias)$",
            name,
        )
        if m:
            kind = "linear" if m.group(1) == "dense" else "ln"
            sub = "dense" if m.group(1) == "dense" else "ln"
            leaf, v = _leaf(kind, m.group(2), value)
            _set(tree, ["decoder", "classifier_transform", sub, leaf], v)
            converted.append(name)
            continue

        if name == "decoder.classifier.cls.predictions.bias":
            _set(tree, ["decoder", "classifier_bias"], value)
            converted.append(name)
            continue

        m = re.match(
            r"^(cls|cls_visual)\.predictions\.transform\.(dense|LayerNorm)\.(weight|bias)$",
            name,
        )
        if m:
            head = "mlm_head" if m.group(1) == "cls" else "mfm_head"
            kind = "linear" if m.group(2) == "dense" else "ln"
            sub = "dense" if m.group(2) == "dense" else "ln"
            leaf, v = _leaf(kind, m.group(3), value)
            _set(tree, [head, "transform", sub, leaf], v)
            converted.append(name)
            continue

        m = re.match(r"^(cls|cls_visual)\.predictions\.bias$", name)
        if m:
            head = "mlm_head" if m.group(1) == "cls" else "mfm_head"
            _set(tree, [head, "bias"], value)
            converted.append(name)
            continue

        m = re.match(r"^normalize_video\.visual_norm2d\.(weight|bias)$", name)
        if m:
            leaf, v = _leaf("ln", m.group(1), value)
            _set(tree, ["video_norm", leaf], v)
            converted.append(name)
            continue

        m = re.match(r"^similarity_dense\.(weight|bias)$", name)
        if m:
            leaf, v = _leaf("linear", m.group(1), value)
            _set(tree, ["similarity_dense", leaf], v)
            converted.append(name)
            continue

        unknown.append(name)

    report = {"converted": converted, "skipped": skipped, "unknown": unknown}
    return tree, report


# flax sub-path -> (torch suffix, kind): exact inverses of _BLOCK_MAP /
# _DECODER_BLOCK_MAP above (kept adjacent so the two stay in sync).
_INV_BLOCK = {
    "attention/query": ("attention.self.query", "linear"),
    "attention/key": ("attention.self.key", "linear"),
    "attention/value": ("attention.self.value", "linear"),
    "attention_output/dense": ("attention.output.dense", "linear"),
    "attention_output/ln": ("attention.output.LayerNorm", "ln"),
    "intermediate": ("intermediate.dense", "linear"),
    "output/dense": ("output.dense", "linear"),
    "output/ln": ("output.LayerNorm", "ln"),
}

_INV_DECODER_BLOCK = {
    "self_attn/query": ("slf_attn.att.query", "linear"),
    "self_attn/key": ("slf_attn.att.key", "linear"),
    "self_attn/value": ("slf_attn.att.value", "linear"),
    "self_attn_output/dense": ("slf_attn.output.dense", "linear"),
    "self_attn_output/ln": ("slf_attn.output.LayerNorm", "ln"),
    "enc_attn/query": ("enc_attn.att.query", "linear"),
    "enc_attn/key": ("enc_attn.att.key", "linear"),
    "enc_attn/value": ("enc_attn.att.value", "linear"),
    "enc_attn_output/dense": ("enc_attn.output.dense", "linear"),
    "enc_attn_output/ln": ("enc_attn.output.LayerNorm", "ln"),
    "intermediate": ("intermediate.dense", "linear"),
    "output/dense": ("output.dense", "linear"),
    "output/ln": ("output.LayerNorm", "ln"),
}

_INV_TOP = {
    "word_embed/embedding": "bert.embeddings.word_embeddings.weight",
    "text_pos_embed/embedding": "bert.embeddings.position_embeddings.weight",
    "text/type_embed/embedding": "bert.embeddings.token_type_embeddings.weight",
    "visual/pos_embed/embedding": "visual.embeddings.position_embeddings.weight",
    "cross/pos_embed/embedding": "cross.embeddings.position_embeddings.weight",
    "cross/type_embed/embedding": "cross.embeddings.token_type_embeddings.weight",
    "decoder/classifier_bias": "decoder.classifier.cls.predictions.bias",
    "mlm_head/bias": "cls.predictions.bias",
    "mfm_head/bias": "cls_visual.predictions.bias",
}


def _torch_leaf(kind: str, flax_leaf: str, value: np.ndarray):
    """Inverse of _leaf: (kind, kernel|bias|scale|embedding) -> torch
    param name + layout."""
    if kind == "linear":
        if flax_leaf == "kernel":
            return "weight", value.T  # [in,out] -> [out,in]
        return "bias", value
    if kind == "ln":
        return ("weight", value) if flax_leaf == "scale" else ("bias", value)
    raise ValueError((kind, flax_leaf))


def export_torch_state_dict(params: dict) -> Dict[str, np.ndarray]:
    """flax params tree -> reference-layout torch state_dict (the exact
    inverse of convert_torch_state_dict): torch Linear [out,in] transposes,
    LayerNorm scale->weight, and the tied tensors the reference stores as
    duplicates (decoder embeddings, LM-head decoder weights, the visual MFM
    head weight) materialized from their single flax copies.

    Not exported: (bert|visual).pooler.* — UniVL never consumes them, the
    forward converter drops them, and the reference's tolerant
    init_preweight (until_module.py:115-141) leaves them at init.

    scan_layers (stacked) trees are converted to loop layout first. Raises
    on a flax path it does not recognize — a renamed module would silently
    vanish from the exported checkpoint otherwise."""
    from univl_tpu.checkpoint.layout import to_loop_layout

    import jax

    params = to_loop_layout(
        jax.tree.map(lambda l: np.asarray(l, dtype=np.float32), params)
    )
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
    }
    sd: Dict[str, np.ndarray] = {}
    for path, value in flat.items():
        if path in _INV_TOP:
            sd[_INV_TOP[path]] = value
            continue
        m = re.match(r"^(text|visual|cross)/embed_ln/(scale|bias)$", path)
        if m:
            tower = {"text": "bert"}.get(m.group(1), m.group(1))
            name, v = _torch_leaf("ln", m.group(2), value)
            sd[f"{tower}.embeddings.LayerNorm.{name}"] = v
            continue
        m = re.match(r"^feature_proj/(kernel|bias)$", path)
        if m:
            name, v = _torch_leaf("linear", m.group(1), value)
            sd[f"visual.embeddings.word_embeddings.{name}"] = v
            continue
        m = re.match(r"^(text|visual|cross)/encoder/layer_(\d+)/(.+)/(\w+)$", path)
        if m and m.group(3) in _INV_BLOCK:
            tower = {"text": "bert"}.get(m.group(1), m.group(1))
            suffix, kind = _INV_BLOCK[m.group(3)]
            name, v = _torch_leaf(kind, m.group(4), value)
            sd[f"{tower}.encoder.layer.{m.group(2)}.{suffix}.{name}"] = v
            continue
        m = re.match(r"^cross/pooler/dense/(kernel|bias)$", path)
        if m:
            name, v = _torch_leaf("linear", m.group(1), value)
            sd[f"cross.pooler.dense.{name}"] = v
            continue
        m = re.match(r"^decoder/embed_ln/(scale|bias)$", path)
        if m:
            name, v = _torch_leaf("ln", m.group(1), value)
            sd[f"decoder.embeddings.LayerNorm.{name}"] = v
            continue
        m = re.match(r"^decoder/layer_(\d+)/(.+)/(\w+)$", path)
        if m and m.group(2) in _INV_DECODER_BLOCK:
            suffix, kind = _INV_DECODER_BLOCK[m.group(2)]
            name, v = _torch_leaf(kind, m.group(3), value)
            sd[f"decoder.decoder.layer.{m.group(1)}.{suffix}.{name}"] = v
            continue
        m = re.match(
            r"^decoder/classifier_transform/(dense|ln)/(\w+)$", path
        )
        if m:
            kind = "linear" if m.group(1) == "dense" else "ln"
            tname = "dense" if m.group(1) == "dense" else "LayerNorm"
            name, v = _torch_leaf(kind, m.group(2), value)
            sd[f"decoder.classifier.cls.predictions.transform.{tname}.{name}"] = v
            continue
        m = re.match(r"^(mlm_head|mfm_head)/transform/(dense|ln)/(\w+)$", path)
        if m:
            head = "cls" if m.group(1) == "mlm_head" else "cls_visual"
            kind = "linear" if m.group(2) == "dense" else "ln"
            tname = "dense" if m.group(2) == "dense" else "LayerNorm"
            name, v = _torch_leaf(kind, m.group(3), value)
            sd[f"{head}.predictions.transform.{tname}.{name}"] = v
            continue
        m = re.match(r"^video_norm/(scale|bias)$", path)
        if m:
            name, v = _torch_leaf("ln", m.group(1), value)
            sd[f"normalize_video.visual_norm2d.{name}"] = v
            continue
        m = re.match(r"^similarity_dense/(kernel|bias)$", path)
        if m:
            name, v = _torch_leaf("linear", m.group(1), value)
            sd[f"similarity_dense.{name}"] = v
            continue
        raise ValueError(f"unrecognized flax param path: {path}")

    # tied duplicates the reference stores explicitly
    word = sd.get("bert.embeddings.word_embeddings.weight")
    pos = sd.get("bert.embeddings.position_embeddings.weight")
    if "decoder.embeddings.LayerNorm.weight" in sd and word is not None:
        sd["decoder.embeddings.word_embeddings.weight"] = word
        if pos is not None:
            sd["decoder.embeddings.position_embeddings.weight"] = pos
        sd["decoder.classifier.cls.predictions.decoder.weight"] = word
    if "cls.predictions.bias" in sd and word is not None:
        sd["cls.predictions.decoder.weight"] = word
    if (
        "cls_visual.predictions.bias" in sd
        and "visual.embeddings.word_embeddings.weight" in sd
    ):
        sd["cls_visual.predictions.weight"] = sd[
            "visual.embeddings.word_embeddings.weight"
        ]
    return sd


def save_torch_bin(path: str, params: dict) -> None:
    """Write the exported state dict as a torch .bin (reference format)."""
    import torch

    sd = export_torch_state_dict(params)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)


def merge_params(init_params: dict, loaded: dict, require_all: bool = False):
    """Overlay loaded leaves onto an initialized tree; returns
    (merged, missing_paths). Shapes must match; dtypes follow init."""
    import jax.numpy as jnp

    missing: List[str] = []

    def rec(init_node, loaded_node, path):
        if isinstance(init_node, dict):
            out = {}
            for k, v in init_node.items():
                if isinstance(loaded_node, dict) and k in loaded_node:
                    out[k] = rec(v, loaded_node[k], path + [k])
                else:
                    missing.append("/".join(path + [k]))
                    out[k] = v
            return out
        got = np.asarray(loaded_node)
        assert got.shape == tuple(init_node.shape), (
            "/".join(path), got.shape, init_node.shape
        )
        return jnp.asarray(got, dtype=init_node.dtype)

    merged = rec(init_params, loaded, [])
    if require_all and missing:
        raise ValueError(f"missing params not covered by checkpoint: {missing}")
    return merged, missing
