"""Checkpointing (SURVEY.md §5: the reference delegates to
``torch.save/load_state_dict`` and adds a pre-hook permuting legacy
RSKC/RSCK weights into KRSC, ``conv.py:632-683``).

Here: dotted-path state dicts over module pytrees, npz save/load, and a
torch-checkpoint importer that accepts all three reference weight layouts
(KRSC, RSKC, RSCK) and normalizes to KRSC.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

from .module import Module, is_array

__all__ = [
    "state_dict",
    "load_state_dict",
    "save_checkpoint",
    "load_checkpoint",
    "convert_torch_weight_layout",
    "load_torch_state_dict",
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(p.name)
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return ".".join(parts)


def state_dict(module: Module) -> Dict[str, np.ndarray]:
    """All array leaves of a module tree keyed by dotted path."""
    flat = jax.tree_util.tree_flatten_with_path(module)[0]
    return {
        _path_str(path): np.asarray(leaf)
        for path, leaf in flat
        if is_array(leaf)
    }


def load_state_dict(module: Module, sd: Dict[str, np.ndarray],
                    strict: bool = True) -> Module:
    """Return a copy of ``module`` with leaves replaced from ``sd``."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(module)
    new_leaves = []
    used = set()
    for path, leaf in flat:
        key = _path_str(path)
        if is_array(leaf) and key in sd:
            arr = jnp.asarray(sd[key]).astype(leaf.dtype)
            assert arr.shape == leaf.shape, (
                f"shape mismatch for {key}: {arr.shape} vs {leaf.shape}")
            new_leaves.append(arr)
            used.add(key)
        else:
            if strict and is_array(leaf):
                raise KeyError(f"missing key in state dict: {key}")
            new_leaves.append(leaf)
    if strict:
        extra = set(sd) - used
        if extra:
            raise KeyError(f"unexpected keys in state dict: {sorted(extra)[:5]}")
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(module), new_leaves)


def save_checkpoint(module: Module, path: Union[str, Path]):
    np.savez(str(path), **state_dict(module))


def load_checkpoint(module: Module, path: Union[str, Path],
                    strict: bool = True) -> Module:
    with np.load(str(path)) as f:
        sd = {k: f[k] for k in f.files}
    return load_state_dict(module, sd, strict=strict)


def convert_torch_weight_layout(w: np.ndarray, layout: str,
                                ndim: int) -> np.ndarray:
    """Normalize a reference conv weight to KRSC.

    Layouts (reference ``constants.py:37-42`` / ``conv.py:648-683``):
    KRSC = [K, *ks, C] (2.2+ default), RSKC = [*ks, K, C] (2.1 default),
    RSCK = [*ks, C, K] (FILTER_HWIO legacy).
    """
    if layout == "KRSC":
        return w
    if layout == "RSKC":
        return np.moveaxis(w, ndim, 0)
    if layout == "RSCK":
        return np.moveaxis(w, ndim + 1, 0)
    raise ValueError(f"unknown layout {layout}")


def load_torch_state_dict(module: Module, torch_sd: Dict,
                          layout: str = "KRSC") -> Module:
    """Import a reference (torch) checkpoint: tensors are converted to
    numpy, conv weights normalized to KRSC, and matched to our dotted
    paths by name tail (``...weight`` / ``...bias`` etc.)."""
    sd = {}
    for k, v in torch_sd.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        sd[k] = arr
    ours = state_dict(module)
    out = {}
    for key, leaf in ours.items():
        if key in sd:
            arr = sd[key]
        else:
            # fall back to suffix matching (container nesting differs)
            cands = [k for k in sd if key.endswith(k) or k.endswith(key)]
            if len(cands) != 1:
                raise KeyError(f"cannot match parameter {key}")
            arr = sd[cands[0]]
        if arr.shape != leaf.shape and key.endswith("weight") and arr.ndim >= 3:
            arr = convert_torch_weight_layout(arr, layout, arr.ndim - 2)
        out[key] = arr
    return load_state_dict(module, out, strict=False)
