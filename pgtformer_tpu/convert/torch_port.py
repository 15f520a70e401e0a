"""Port PyTorch reference checkpoints into this framework's variable trees.

Consumes a reference-format state_dict (e.g. the released
`kepeng/pgtformer-base` HF checkpoint, or a BasicSR `net_g_*.pth` under key
`params_ema` — reference inference_cn.py:118-129) and fills our flax
variables: `params`, `batch_stats` (BiSeNet BN running stats), and
`codebook` (EMA codebooks).

Layout transforms:
  * conv weight  (O, I, kH, kW)  ->  kernel (kH, kW, I, O)
  * linear weight (O, I)         ->  kernel (I, O)
  * norm weight                  ->  scale
  * BN running_mean/var          ->  batch_stats mean/var
  * MultiheadAttention in_proj_weight (3C, C) -> in_proj_kernel (C, 3C)
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np
import jax.numpy as jnp
from flax import traverse_util
from flax.core import unfreeze


_MODULE_RENAMES = [
    (re.compile(r"^down_(\d+)_block_(\d+)$"), r"down.\1.block.\2"),
    (re.compile(r"^down_(\d+)_attn_(\d+)$"), r"down.\1.attn.\2"),
    (re.compile(r"^down_(\d+)_downsample$"), r"down.\1.downsample"),
    (re.compile(r"^up_(\d+)_block_(\d+)$"), r"up.\1.block.\2"),
    (re.compile(r"^up_(\d+)_attn_(\d+)$"), r"up.\1.attn.\2"),
    (re.compile(r"^up_(\d+)_upsample$"), r"up.\1.upsample"),
    (re.compile(r"^mid_block_(\d+)$"), r"mid.block_\1"),
    (re.compile(r"^mid_attn_(\d+)$"), r"mid.attn_\1"),
    (re.compile(r"^blocks_(\d+)$"), r"blocks.\1"),
    (re.compile(r"^ft_layers_(\d+)$"), r"ft_layers.\1"),
    (re.compile(r"^blocks_(\d+)_conv$"), r"blocks.\1.conv"),
    (re.compile(r"^main_(\d+)$"), r"main.\1"),
    (re.compile(r"^fuse_convs_(\d+)$"), r"fuse_convs_dict.\1"),
    (re.compile(r"^layer(\d+)_(\d+)$"), r"layer\1.\2"),
    (re.compile(r"^downsample_conv$"), r"downsample.0"),
    (re.compile(r"^downsample_bn$"), r"downsample.1"),
    (re.compile(r"^(scale|shift)_(\d+)$"), r"\1.\2"),
    (re.compile(r"^idx_pred_norm$"), r"idx_pred_layer.0"),
    (re.compile(r"^idx_pred_head$"), r"idx_pred_layer.1"),
]

_LEAF_RENAMES = {
    "kernel": "weight",
    "scale": "weight",
    "embedding": "embedding.weight",   # VectorQuantizer nn.Embedding
    "embed": "embed.weight",           # GumbelQuantizer nn.Embedding
    "bias": "bias",
    "in_proj_kernel": "in_proj_weight",
    "in_proj_bias": "in_proj_bias",
    "relative_position_bias_table": "relative_position_bias_table",
    "mean": "running_mean",
    "var": "running_var",
}


def _map_module_name(name: str, context: Tuple[str, ...]) -> str:
    # our SWTransformerBlock names its self-attention `attn1`; the reference
    # encoder block attribute is `attn` (rstt_layers.py:271) while the cross
    # block keeps attn1/attn2 (:376-387)
    if name == "attn1" and "cross" not in context:
        return "attn"
    # the Fuse-SFT ResBlock names its 1x1 shortcut `conv_out`
    # (reference pgtformer_arch.py:419) vs. TDResnetBlock's `nin_shortcut`
    if name == "nin_shortcut" and "encode_enc" in context:
        return "conv_out"
    for pat, repl in _MODULE_RENAMES:
        if pat.match(name):
            return pat.sub(repl, name)
    return name


def flax_path_to_torch_key(col: str, path: Tuple[str, ...]) -> str:
    """Translate a flax variable path into the reference state_dict key."""
    *mods, leaf = path
    if col == "codebook":
        # quantizer variables are flat: codebooks_{i}_{weight|cluster_size_ema|embed_ema}
        m = re.match(r"^codebooks_(\d+)_(weight|cluster_size_ema|embed_ema)$", leaf)
        if not m:
            raise KeyError(f"unrecognized codebook leaf {leaf!r}")
        torch_mods = [_map_module_name(p, tuple(mods)) for p in mods]
        return ".".join(torch_mods + [f"codebooks.{m.group(1)}", m.group(2)])
    torch_mods = [_map_module_name(p, tuple(mods)) for p in mods]
    torch_leaf = _LEAF_RENAMES.get(leaf, leaf)
    return ".".join(torch_mods + [torch_leaf])


def _to_flax_leaf(leaf_name: str, value: np.ndarray,
                  target_shape: Tuple[int, ...]) -> np.ndarray:
    v = np.asarray(value)
    if leaf_name == "kernel":
        if v.ndim == 4:                      # conv OIHW -> HWIO
            v = v.transpose(2, 3, 1, 0)
        elif v.ndim == 2:                    # linear (O,I) -> (I,O)
            v = v.T
    elif leaf_name == "in_proj_kernel":
        v = v.T                              # (3C, C) -> (C, 3C)
    if v.shape != tuple(target_shape):
        raise ValueError(
            f"shape mismatch for {leaf_name}: torch {v.shape} vs flax {tuple(target_shape)}")
    return v


def port_torch_state_dict(variables: Mapping[str, Any],
                          state_dict: Mapping[str, np.ndarray],
                          prefix: str = "",
                          strict: bool = True) -> Dict[str, Any]:
    """Fill `variables` (as produced by model.init) from a torch state_dict.

    Returns the new variable dict.  With `strict`, raises on any missing
    target leaf; always ignores extra torch keys (e.g. buffers like
    `relative_position_index` we recompute statically).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    new_vars = unfreeze(variables)
    missing = []
    used = set()
    for col, tree in new_vars.items():
        flat = traverse_util.flatten_dict(tree)
        for path, target in flat.items():
            key = prefix + flax_path_to_torch_key(col, tuple(str(p) for p in path))
            if key not in sd and ".attn." in key:
                # our SWTransformerBlock always names its self-attention
                # `attn1`; the reference's encoder block uses `attn` but the
                # decoder (cross) block keeps `attn1`
                alt = key.replace(".attn.", ".attn1.")
                if alt in sd:
                    key = alt
            if key not in sd:
                missing.append((col, path, key))
                continue
            leaf = str(path[-1])
            if col == "codebook":
                v = sd[key]
                if v.shape != target.shape:
                    raise ValueError(f"{key}: {v.shape} vs {target.shape}")
            else:
                v = _to_flax_leaf(leaf, sd[key], target.shape)
            flat[path] = jnp.asarray(v, dtype=target.dtype)
            used.add(key)
        new_vars[col] = traverse_util.unflatten_dict(flat)
    if strict and missing:
        lines = "\n".join(f"  [{c}] {'/'.join(map(str, p))} <- {k}"
                          for c, p, k in missing[:40])
        raise KeyError(f"{len(missing)} variables missing in torch checkpoint:\n{lines}")
    return new_vars


def _to_torch_leaf(leaf_name: str, value) -> np.ndarray:
    """Inverse of _to_flax_leaf (flax layout -> torch layout)."""
    v = np.asarray(value)
    if leaf_name == "kernel":
        if v.ndim == 4:                      # conv HWIO -> OIHW
            v = v.transpose(3, 2, 0, 1)
        elif v.ndim == 2:                    # linear (I,O) -> (O,I)
            v = v.T
    elif leaf_name == "in_proj_kernel":
        v = v.T                              # (C, 3C) -> (3C, C)
    return v


def export_torch_state_dict(variables: Mapping[str, Any],
                            prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of port_torch_state_dict: emit a reference-format state_dict
    (numpy values) from our variable trees — the `push_to_hub` analog
    (reference tdcrqvae3_arch.py:711 PyTorchModelHubMixin).  Buffers the
    reference recomputes from geometry (relative_position_index, attn
    masks) are deliberately not emitted."""
    sd: Dict[str, np.ndarray] = {}
    for col, tree in variables.items():
        flat = traverse_util.flatten_dict(tree)
        for path, val in flat.items():
            key = prefix + flax_path_to_torch_key(
                col, tuple(str(p) for p in path))
            sd[key] = _to_torch_leaf(str(path[-1]), val)
    return sd


def save_reference_checkpoint(variables: Mapping[str, Any], path: str,
                              param_key: str | None = "params_ema") -> None:
    """Write variables as a reference-consumable checkpoint: BasicSR-style
    .pth ({param_key: state_dict}) or .safetensors (flat)."""
    sd = export_torch_state_dict(variables)
    if path.endswith(".safetensors"):
        from safetensors.numpy import save_file
        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
        return
    import torch
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
           for k, v in sd.items()}
    torch.save({param_key: tsd} if param_key else tsd, path)


def port_subtree(variables: Mapping[str, Any], subtree: str,
                 state_dict: Mapping[str, np.ndarray],
                 strict: bool = True) -> Dict[str, Any]:
    """Port a torch state_dict into one submodule's variables.

    E.g. load a standalone BiSeNet face-parsing checkpoint (the reference's
    commented-out `weights/facelib/faceparse/79999.pth` path,
    pgtformer_arch.py:513-516) into `conditionnet`:

        variables = port_subtree(variables, "conditionnet", bisenet_sd)
    """
    sub = {col: tree[subtree] for col, tree in variables.items()
           if isinstance(tree, Mapping) and subtree in tree}
    ported = port_torch_state_dict(sub, state_dict,
                                   prefix="", strict=strict)
    new_vars = unfreeze(variables)
    for col, tree in ported.items():
        new_vars[col][subtree] = tree
    return new_vars


def from_pretrained(repo_or_path: str, cfg=None, dtype=None,
                    param_key: str | None = "params_ema"):
    """Build a PGTFormer and fill it from a reference-format checkpoint.

    `repo_or_path` may be a local .pth/.safetensors file, a local directory
    containing `pytorch_model.bin`/`model.safetensors`, or a HF Hub repo id
    (e.g. `kepeng/pgtformer-base` — the reference's release channel,
    inference.py:118; requires network access).

    Returns (model, variables).
    """
    import os
    import jax
    import jax.numpy as jnp
    from pgtformer_tpu.config import RELEASE_PGTFORMER
    from pgtformer_tpu.models.pgtformer import PGTFormer

    cfg = cfg or RELEASE_PGTFORMER
    dtype = dtype or jnp.bfloat16

    path = repo_or_path
    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
    elif not os.path.exists(path):
        from huggingface_hub import hf_hub_download
        try:
            path = hf_hub_download(repo_or_path, "model.safetensors")
        except Exception:
            path = hf_hub_download(repo_or_path, "pytorch_model.bin")

    sd = load_torch_checkpoint(path, param_key=param_key)
    model = PGTFormer(cfg, dtype=dtype)
    res = cfg.vqvae.ddconfig.resolution
    x = jnp.zeros((1, cfg.vqvae.tf, res, res, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, w=1.0))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    variables = port_torch_state_dict(zeros, sd)
    return model, variables


def load_torch_checkpoint(path: str, param_key: str | None = "params_ema"):
    """Load a .pth/.safetensors checkpoint into a numpy state_dict."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if param_key and isinstance(obj, dict) and param_key in obj:
        obj = obj[param_key]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def push_to_hub(variables: Mapping[str, Any], repo_id: str,
                staging_dir: str | None = None, cfg=None,
                dry_run: bool = False, private: bool = True) -> str:
    """Publish variables as a reference-consumable HF Hub model repo
    (the `push_to_hub` analog of the reference's PyTorchModelHubMixin,
    tdcrqvae3_arch.py:711).

    Stages `pytorch_model.bin` (flat state_dict, exactly what the mixin's
    `from_pretrained` loads — inference.py:118) plus a minimal
    `config.json` into `staging_dir`, then uploads the folder.  With
    ``dry_run=True`` (or no network) it stops after staging and returns the
    staged directory — the upload step is `huggingface_hub.upload_folder`,
    nothing framework-specific.
    """
    import json
    import tempfile

    staging_dir = staging_dir or tempfile.mkdtemp(prefix="pgt_hub_")
    os.makedirs(staging_dir, exist_ok=True)
    sd = export_torch_state_dict(variables)
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()},
               os.path.join(staging_dir, "pytorch_model.bin"))
    meta = {"model_type": "PGTFormer", "framework": "pgtformer_tpu"}
    if cfg is not None:
        nd = getattr(cfg, "to_network_g", None)
        meta["network_g"] = nd() if callable(nd) else repr(cfg)
    with open(os.path.join(staging_dir, "config.json"), "w") as f:
        json.dump(meta, f, indent=1)
    if dry_run:
        return staging_dir
    from huggingface_hub import HfApi
    api = HfApi()
    api.create_repo(repo_id, private=private, exist_ok=True)
    api.upload_folder(folder_path=staging_dir, repo_id=repo_id)
    return staging_dir
