"""PyTorch checkpoint interop: import reference .pth weights into JAX pytrees.

Two checkpoint families are supported (reference: engine/trainer.py:588-606,
README instructions for SAM2.1 weights):

* SPEGNet training checkpoints: ``{'model_state_dict': ..., 'config': ...}``
  with keys ``encoder.encoder.* / fusion.* / context.* / edge_detector.* /
  decoder.*``.
* Raw SAM2.1 checkpoints: ``{'model': ...}`` with keys
  ``image_encoder.trunk.*`` — imported into the encoder subtree only.

Conventions converted:
  conv  OIHW -> HWIO            linear [out,in] -> [in,out]
  BN weight/bias -> scale/bias (params), running_mean/var -> mean/var
  (batch_stats)                 pos embeds [1,C,H,W] -> [H,W,C]
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _t_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _t_posembed(w: np.ndarray) -> np.ndarray:
    return np.transpose(w[0], (1, 2, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STAT = {"running_mean": "mean", "running_var": "var"}
_LN = {"weight": "scale", "bias": "bias"}


def _map_hiera_key(key: str):
    """Map a Hiera trunk key (already stripped of its prefix) to
    (collection, path, transform)."""
    if key == "pos_embed":
        return "params", ("pos_embed",), _t_posembed
    if key == "pos_embed_window":
        return "params", ("pos_embed_window",), _t_posembed
    if key == "patch_embed.proj.weight":
        return "params", ("patch_embed", "kernel"), _t_conv
    if key == "patch_embed.proj.bias":
        return "params", ("patch_embed", "bias"), None
    m = re.match(r"blocks\.(\d+)\.(.+)", key)
    if not m:
        return None
    i, rest = int(m.group(1)), m.group(2)
    blk = f"block{i}"
    for ln in ("norm1", "norm2"):
        for tk, fk in _LN.items():
            if rest == f"{ln}.{tk}":
                return "params", (blk, ln, fk), None
    table = {
        "attn.qkv.weight": ((blk, "attn", "qkv", "kernel"), _t_linear),
        "attn.qkv.bias": ((blk, "attn", "qkv", "bias"), None),
        "attn.proj.weight": ((blk, "attn", "proj", "kernel"), _t_linear),
        "attn.proj.bias": ((blk, "attn", "proj", "bias"), None),
        "mlp.layers.0.weight": ((blk, "mlp_fc1", "kernel"), _t_linear),
        "mlp.layers.0.bias": ((blk, "mlp_fc1", "bias"), None),
        "mlp.layers.1.weight": ((blk, "mlp_fc2", "kernel"), _t_linear),
        "mlp.layers.1.bias": ((blk, "mlp_fc2", "bias"), None),
        "proj.weight": ((blk, "proj", "kernel"), _t_linear),
        "proj.bias": ((blk, "proj", "bias"), None),
    }
    if rest in table:
        path, tf = table[rest]
        return "params", path, tf
    return None


def _map_spegnet_key(key: str):
    """Map a SPEGNet model_state_dict key to (collection, path, transform)."""
    if key.endswith("num_batches_tracked"):
        return "skip", (), None
    if key.startswith("encoder.encoder."):
        mapped = _map_hiera_key(key[len("encoder.encoder."):])
        if mapped is None:
            return None
        col, path, tf = mapped
        return col, ("encoder",) + path, tf

    def bn(mod_path, rest):
        if rest in _BN_PARAM:
            return "params", mod_path + (_BN_PARAM[rest],), None
        if rest in _BN_STAT:
            return "batch_stats", mod_path + (_BN_STAT[rest],), None
        return None

    # fusion
    if key.startswith("fusion."):
        rest = key[len("fusion."):]
        if rest == "conv1x1.weight":
            return "params", ("fusion", "conv1x1", "kernel"), _t_conv
        m = re.match(r"bn\.(.+)", rest)
        if m:
            return bn(("fusion", "bn"), m.group(1))
        m = re.match(r"se_block\.fc\.(0|2)\.weight", rest)
        if m:
            fc = "fc1" if m.group(1) == "0" else "fc2"
            return "params", ("fusion", "se_block", fc, "kernel"), _t_linear
        return None

    # context (EfficientASPP): sequential index 0 = conv, 1 = bn
    if key.startswith("context."):
        rest = key[len("context."):]
        seq_map = {
            "reduce": "reduce",
            "global_branch": "global_branch",
            "fusion": "fusion",
            "expand": "expand",
        }
        m = re.match(r"branches\.(\d+)\.(\d+)\.(.+)", rest)
        if m:
            mod = ("context", f"branch{m.group(1)}")
            idx, leaf = m.group(2), m.group(3)
            if idx == "0" and leaf == "weight":
                return "params", mod + ("conv", "kernel"), _t_conv
            if idx == "1":
                return bn(mod + ("bn",), leaf)
            return None
        for tname, fname in seq_map.items():
            m = re.match(rf"{tname}\.(\d+)\.(.+)", rest)
            if m:
                idx, leaf = m.group(1), m.group(2)
                mod = ("context", fname)
                # global_branch Sequential = [AdaptiveAvgPool, Conv, BN]
                conv_idx = "1" if tname == "global_branch" else "0"
                bn_idx = "2" if tname == "global_branch" else "1"
                if idx == conv_idx and leaf == "weight":
                    return "params", mod + ("conv", "kernel"), _t_conv
                if idx == bn_idx:
                    return bn(mod + ("bn",), leaf)
                return None
        return None

    # edge detector (EFE)
    if key.startswith("edge_detector."):
        rest = key[len("edge_detector."):]
        if rest == "conv1.weight":
            return "params", ("edge_detector", "conv1", "kernel"), _t_conv
        m = re.match(r"bn1\.(.+)", rest)
        if m:
            return bn(("edge_detector", "bn1"), m.group(1))
        if rest == "edge_conv.weight":
            return "params", ("edge_detector", "edge_conv", "kernel"), _t_conv
        if rest == "edge_conv.bias":
            return "params", ("edge_detector", "edge_conv", "bias"), None
        return None

    # decoder (PED)
    if key.startswith("decoder."):
        rest = key[len("decoder."):]
        m = re.match(r"decoder_blocks\.(\d+)\.(conv|bn)(\d)\.(.+)", rest)
        if m:
            blk = ("decoder", f"block{m.group(1)}")
            kind, num, leaf = m.group(2), m.group(3), m.group(4)
            if kind == "conv":
                tf = _t_conv if leaf == "weight" else None
                name = "kernel" if leaf == "weight" else "bias"
                return "params", blk + (f"conv{num}", name), tf
            return bn(blk + (f"bn{num}",), leaf)
        m = re.match(r"pred_heads\.(\d+)\.(weight|bias)", rest)
        if m:
            tf = _t_conv if m.group(2) == "weight" else None
            name = "kernel" if m.group(2) == "weight" else "bias"
            return "params", ("decoder", f"head{m.group(1)}", name), tf
        return None
    return None


def convert_spegnet_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Convert a reference SPEGNet ``model_state_dict`` to flax variables.

    Returns ``{'params': ..., 'batch_stats': ...}``.  Raises on any key that
    cannot be mapped (so silent drift is impossible).
    """
    out: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    unmapped = []
    for key, value in state_dict.items():
        mapped = _map_spegnet_key(key)
        if mapped is None:
            unmapped.append(key)
            continue
        col, path, tf = mapped
        if col == "skip":
            continue
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        if tf is not None:
            arr = tf(arr)
        _set(out[col], path, arr)
    if unmapped:
        raise ValueError(f"Unmapped checkpoint keys: {unmapped[:10]} "
                         f"({len(unmapped)} total)")
    return out


def convert_sam2_trunk_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """Convert a raw SAM2 checkpoint's ``image_encoder.trunk.*`` keys into the
    encoder params subtree (no batch stats: Hiera has none)."""
    params: Dict = {}
    for key, value in state_dict.items():
        if not key.startswith("image_encoder.trunk."):
            continue
        mapped = _map_hiera_key(key[len("image_encoder.trunk."):])
        if mapped is None:
            raise ValueError(f"Unmapped SAM2 trunk key: {key}")
        _, path, tf = mapped
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        if tf is not None:
            arr = tf(arr)
        _set(params, path, arr)
    if not params:
        raise ValueError("No image_encoder.trunk.* keys found in checkpoint")
    return params


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a .pth file on CPU (torch is a host-side dependency only)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def import_checkpoint(
    path: str,
) -> Tuple[Dict[str, Dict], Optional[Dict[str, Any]]]:
    """Load a .pth and return ``(flax_variables, embedded_config_or_None)``.

    Handles both SPEGNet training checkpoints and raw SAM2 checkpoints; for
    the latter only the encoder subtree is populated.
    """
    ckpt = load_torch_checkpoint(path)
    if "model_state_dict" in ckpt:
        variables = convert_spegnet_state_dict(ckpt["model_state_dict"])
        return variables, ckpt.get("config")
    if "model" in ckpt:
        enc = convert_sam2_trunk_state_dict(ckpt["model"])
        return {"params": {"encoder": enc}, "batch_stats": {}}, None
    raise ValueError(f"Unrecognized checkpoint schema at {path}: {list(ckpt)[:5]}")


# ---------------------------------------------------------------------------
# Export: JAX variables -> reference-schema .pth (two-way interop).
# ---------------------------------------------------------------------------

_INV_LN = {"scale": "weight", "bias": "bias"}
_INV_BN_PARAM = {"scale": "weight", "bias": "bias"}
_INV_BN_STAT = {"mean": "running_mean", "var": "running_var"}


def _inv_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))


def _inv_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _inv_posembed(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 0, 1))[None]


def _export_hiera(params: Dict, out: Dict, prefix: str) -> None:
    for name, sub in params.items():
        if name == "pos_embed":
            out[f"{prefix}pos_embed"] = _inv_posembed(sub)
        elif name == "pos_embed_window":
            out[f"{prefix}pos_embed_window"] = _inv_posembed(sub)
        elif name == "patch_embed":
            out[f"{prefix}patch_embed.proj.weight"] = _inv_conv(sub["kernel"])
            out[f"{prefix}patch_embed.proj.bias"] = sub["bias"]
        elif name.startswith("block"):
            i = int(name[5:])
            b = f"{prefix}blocks.{i}."
            for ln in ("norm1", "norm2"):
                for fk, tk in _INV_LN.items():
                    out[f"{b}{ln}.{tk}"] = sub[ln][fk]
            for flax_name, torch_name in (
                (("attn", "qkv"), "attn.qkv"), (("attn", "proj"), "attn.proj"),
                (("mlp_fc1",), "mlp.layers.0"), (("mlp_fc2",), "mlp.layers.1"),
                (("proj",), "proj"),
            ):
                node = sub
                for k in flax_name:
                    node = node.get(k) if isinstance(node, dict) else None
                    if node is None:
                        break
                if node is None:
                    continue
                out[f"{b}{torch_name}.weight"] = _inv_linear(node["kernel"])
                if "bias" in node:
                    out[f"{b}{torch_name}.bias"] = node["bias"]


def _export_conv_bn(params, stats, out, conv_key, bn_key):
    out[f"{conv_key}.weight"] = _inv_conv(params["conv"]["kernel"])
    for fk, tk in _INV_BN_PARAM.items():
        out[f"{bn_key}.{tk}"] = params["bn"][fk]
    for fk, tk in _INV_BN_STAT.items():
        out[f"{bn_key}.{tk}"] = stats["bn"][fk]
    out[f"{bn_key}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_spegnet_state_dict(variables: Dict[str, Dict]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_spegnet_state_dict`: produce a reference-
    schema ``model_state_dict`` (NumPy arrays; wrap with torch for .pth) so
    models trained here can be consumed by the reference stack."""
    p = jax_to_numpy(variables["params"])
    s = jax_to_numpy(variables.get("batch_stats", {}))
    out: Dict[str, np.ndarray] = {}
    _export_hiera(p["encoder"], out, "encoder.encoder.")

    out["fusion.conv1x1.weight"] = _inv_conv(p["fusion"]["conv1x1"]["kernel"])
    for fk, tk in _INV_BN_PARAM.items():
        out[f"fusion.bn.{tk}"] = p["fusion"]["bn"][fk]
    for fk, tk in _INV_BN_STAT.items():
        out[f"fusion.bn.{tk}"] = s["fusion"]["bn"][fk]
    out["fusion.bn.num_batches_tracked"] = np.asarray(0, np.int64)
    out["fusion.se_block.fc.0.weight"] = _inv_linear(p["fusion"]["se_block"]["fc1"]["kernel"])
    out["fusion.se_block.fc.2.weight"] = _inv_linear(p["fusion"]["se_block"]["fc2"]["kernel"])

    ctx_p, ctx_s = p["context"], s["context"]
    _export_conv_bn(ctx_p["reduce"], ctx_s["reduce"], out, "context.reduce.0", "context.reduce.1")
    k = 0
    while f"branch{k}" in ctx_p:
        _export_conv_bn(ctx_p[f"branch{k}"], ctx_s[f"branch{k}"], out,
                        f"context.branches.{k}.0", f"context.branches.{k}.1")
        k += 1
    _export_conv_bn(ctx_p["global_branch"], ctx_s["global_branch"], out,
                    "context.global_branch.1", "context.global_branch.2")
    _export_conv_bn(ctx_p["fusion"], ctx_s["fusion"], out,
                    "context.fusion.0", "context.fusion.1")
    _export_conv_bn(ctx_p["expand"], ctx_s["expand"], out,
                    "context.expand.0", "context.expand.1")

    out["edge_detector.conv1.weight"] = _inv_conv(p["edge_detector"]["conv1"]["kernel"])
    for fk, tk in _INV_BN_PARAM.items():
        out[f"edge_detector.bn1.{tk}"] = p["edge_detector"]["bn1"][fk]
    for fk, tk in _INV_BN_STAT.items():
        out[f"edge_detector.bn1.{tk}"] = s["edge_detector"]["bn1"][fk]
    out["edge_detector.bn1.num_batches_tracked"] = np.asarray(0, np.int64)
    out["edge_detector.edge_conv.weight"] = _inv_conv(p["edge_detector"]["edge_conv"]["kernel"])
    out["edge_detector.edge_conv.bias"] = p["edge_detector"]["edge_conv"]["bias"]

    dec_p, dec_s = p["decoder"], s["decoder"]
    i = 0
    while f"block{i}" in dec_p:
        b = f"decoder.decoder_blocks.{i}"
        for num in (1, 2):
            out[f"{b}.conv{num}.weight"] = _inv_conv(dec_p[f"block{i}"][f"conv{num}"]["kernel"])
            out[f"{b}.conv{num}.bias"] = dec_p[f"block{i}"][f"conv{num}"]["bias"]
            for fk, tk in _INV_BN_PARAM.items():
                out[f"{b}.bn{num}.{tk}"] = dec_p[f"block{i}"][f"bn{num}"][fk]
            for fk, tk in _INV_BN_STAT.items():
                out[f"{b}.bn{num}.{tk}"] = dec_s[f"block{i}"][f"bn{num}"][fk]
            out[f"{b}.bn{num}.num_batches_tracked"] = np.asarray(0, np.int64)
        out[f"decoder.pred_heads.{i}.weight"] = _inv_conv(dec_p[f"head{i}"]["kernel"])
        out[f"decoder.pred_heads.{i}.bias"] = dec_p[f"head{i}"]["bias"]
        i += 1
    return out


def jax_to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x, dtype=np.float32), tree)


def save_torch_checkpoint(path: str, variables: Dict, config: Optional[Dict] = None,
                          epoch: int = 0, metrics: Optional[Dict] = None) -> None:
    """Write a reference-schema .pth (reference: engine/trainer.py:588-606)."""
    import torch

    state_dict = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_spegnet_state_dict(variables).items()
    }
    torch.save(
        {
            "epoch": epoch,
            "model_state_dict": state_dict,
            "optimizer_state_dict": {},
            "scheduler_state_dict": {},
            "scaler": {},
            "metrics": metrics or {},
            "config": config or {},
        },
        path,
    )


def validate_against(variables: Dict, expected: Dict) -> None:
    """Check the imported tree matches an expected (eval_shape) structure."""
    import jax

    got = jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), variables)
    want = jax.tree_util.tree_map(lambda x: tuple(x.shape), expected)
    flat_got = jax.tree_util.tree_flatten_with_path(got)[0]
    flat_want = dict(jax.tree_util.tree_flatten_with_path(want)[0])
    errors = []
    for path, shape in flat_got:
        if path not in flat_want:
            errors.append(f"unexpected leaf {jax.tree_util.keystr(path)}")
        elif flat_want[path] != shape:
            errors.append(
                f"shape mismatch {jax.tree_util.keystr(path)}: "
                f"got {shape}, want {flat_want[path]}"
            )
    missing = set(flat_want) - {p for p, _ in flat_got}
    for path in missing:
        errors.append(f"missing leaf {jax.tree_util.keystr(path)}")
    if errors:
        raise ValueError("Checkpoint import mismatch:\n" + "\n".join(sorted(errors)[:20]))
