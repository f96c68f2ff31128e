"""Torch checkpoint -> Flax parameter conversion for SuperPoint / LightGlue.

The reference loads published torch weights through the lightglue pip
package (neural_matcher.py:47-66). Here the same .pth files are converted
into our Flax trees. Conversion is gated on torch being importable and the
file existing; everything else in the framework works without weights.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def save_params_npz(params: Any, path: str) -> None:
    """Flatten a Flax param tree into a '/'-keyed .npz checkpoint (float16
    storage halves the bundled-checkpoint size; SuperPoint inference is
    insensitive to the cast)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path_keys, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path_keys)
        arr = np.asarray(leaf)
        out[key] = arr.astype(np.float16) if arr.dtype == np.float32 else arr
    np.savez_compressed(path, **out)


def load_params_npz(path: str, template: Any) -> Any:
    """Load a save_params_npz checkpoint back into the template's tree
    structure (keys must match; dtypes restored from the template)."""
    import jax

    with np.load(path) as z:
        stored = {k: z[k] for k in z.files}
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path_keys, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path_keys)
        if key not in stored:
            raise KeyError(f"checkpoint {path} missing parameter {key}")
        arr = stored[key].astype(np.asarray(leaf).dtype)
        if arr.shape != np.asarray(leaf).shape:
            raise ValueError(
                f"checkpoint {path} shape mismatch at {key}: "
                f"{arr.shape} vs {np.asarray(leaf).shape}"
            )
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )


def _load_torch_state(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _conv(sd, name):
    # torch conv: (O, I, kh, kw) -> flax: (kh, kw, I, O)
    return {
        "kernel": np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0)),
        "bias": sd[f"{name}.bias"],
    }


def load_superpoint_torch(path: str, template: Any) -> Any:
    """Map the public SuperPoint checkpoint layer names onto SuperPointNet."""
    sd = _load_torch_state(path)
    names = [
        "conv1a", "conv1b", "conv2a", "conv2b",
        "conv3a", "conv3b", "conv4a", "conv4b",
        "convPa", "convPb", "convDa", "convDb",
    ]
    params = dict(template["params"]) if "params" in template else dict(template)
    out = dict(params)
    for n in names:
        if f"{n}.weight" in sd:
            out[n] = _conv(sd, n)
    return {"params": out}


def _dense(sd, name, transpose=True):
    w = sd[f"{name}.weight"]
    return {
        "kernel": w.T if transpose else w,
        "bias": sd.get(f"{name}.bias", np.zeros(w.shape[0], w.dtype)),
    }


def load_lightglue_torch(path: str, template: Any) -> Any:
    """Best-effort mapping of the public LightGlue checkpoint.

    The public checkpoint's module paths (transformers.{i}.self_attn /
    cross_attn, input_proj, log_assignment) are mapped onto LightGlueNet's
    layer{i} names. Heads whose shapes disagree with the template are left
    at their initialized values (and reported), so partially compatible
    checkpoints still load.
    """
    sd = _load_torch_state(path)
    params = dict(template["params"])
    skipped = []

    def try_set(dst: Dict, key: str, value: Dict):
        if key in dst and all(
            dst[key][k].shape == v.shape for k, v in value.items() if k in dst[key]
        ):
            dst[key] = value
        else:
            skipped.append(key)

    if "input_proj.weight" in sd:
        try_set(params, "input_proj", _dense(sd, "input_proj"))

    n_layers = len([k for k in params if k.startswith("layer")])
    for i in range(n_layers):
        lname = f"layer{i}"
        if lname not in params:
            continue
        layer = dict(params[lname])
        for ours, theirs in [
            ("self_attn0", f"transformers.{i}.self_attn"),
            ("self_attn1", f"transformers.{i}.self_attn"),
            ("cross_attn0", f"transformers.{i}.cross_attn"),
            ("cross_attn1", f"transformers.{i}.cross_attn"),
        ]:
            if f"{theirs}.Wqkv.weight" in sd and ours in layer:
                Wqkv = sd[f"{theirs}.Wqkv.weight"]
                bqkv = sd.get(f"{theirs}.Wqkv.bias")
                d = Wqkv.shape[0] // 3
                sub = dict(layer[ours])
                for j, nm in enumerate(["to_q", "to_k", "to_v"]):
                    blk = {
                        "kernel": Wqkv[j * d : (j + 1) * d].T,
                        "bias": (bqkv[j * d : (j + 1) * d] if bqkv is not None
                                 else np.zeros(d, Wqkv.dtype)),
                    }
                    if nm in sub and sub[nm]["kernel"].shape == blk["kernel"].shape:
                        sub[nm] = blk
                if f"{theirs}.out_proj.weight" in sd and "to_out" in sub:
                    blk = _dense(sd, f"{theirs}.out_proj")
                    if sub["to_out"]["kernel"].shape == blk["kernel"].shape:
                        sub["to_out"] = blk
                layer[ours] = sub
        params[lname] = layer

    if skipped:
        print(f"[weights] lightglue: left {len(skipped)} heads at init: {skipped[:5]}...")
    return {"params": params}
