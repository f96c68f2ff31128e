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


def load_superpoint_torch(path: str, template: Any, strict: bool = True) -> Any:
    """Map the public SuperPoint checkpoint layer names onto SuperPointNet.

    strict (default): every expected conv must be present with the
    template's shape — a renamed layout (e.g. 'module.'-prefixed
    DataParallel keys) raises instead of silently returning random-init
    params that only fail as mysteriously bad matches downstream.
    """
    sd = _load_torch_state(path)
    names = [
        "conv1a", "conv1b", "conv2a", "conv2b",
        "conv3a", "conv3b", "conv4a", "conv4b",
        "convPa", "convPb", "convDa", "convDb",
    ]
    params = dict(template["params"]) if "params" in template else dict(template)
    out = dict(params)
    for n in names:
        if f"{n}.weight" not in sd:
            if strict:
                raise KeyError(
                    f"SuperPoint checkpoint {path} missing {n}.weight "
                    f"(found keys like {sorted(sd)[:3]}...)"
                )
            continue
        conv = _conv(sd, n)
        if strict and n in out:
            for leaf in ("kernel", "bias"):
                want = np.asarray(out[n][leaf]).shape
                got = conv[leaf].shape
                if want != got:
                    raise ValueError(
                        f"SuperPoint checkpoint {path} shape mismatch at "
                        f"{n}.{leaf}: {got} vs {want}"
                    )
        out[n] = conv
    return {"params": out}


def _dense(sd, name, transpose=True):
    w = sd[f"{name}.weight"]
    return {
        "kernel": w.T if transpose else w,
        "bias": sd.get(f"{name}.bias", np.zeros(w.shape[0], w.dtype)),
    }


def _rotary_perm(dh: int) -> np.ndarray:
    """Head-dim permutation translating the official interleaved rotary
    pairing ((2i, 2i+1)) into our half-split pairing ((i, i+dh/2)).

    Our apply_rotary pairs x[i] with x[i+dh/2] and uses cos/sin of
    frequency i for both; the official rotate_half pairs x[2i] with
    x[2i+1] under frequency i. Permuting the q/k projection OUTPUT rows by
    new[i] = old[2i], new[i+dh/2] = old[2i+1] makes the two formulations
    produce identical attention logits (q.k is invariant to a shared
    permutation), so converted weights run bit-equivalently.
    """
    return np.concatenate([np.arange(0, dh, 2), np.arange(1, dh, 2)])


def _headed(w: np.ndarray, heads: int, perm: np.ndarray | None) -> np.ndarray:
    """(d_out, d_in) torch Linear weight -> flax kernel (d_in, d_out),
    optionally permuting the per-head output rows for the rotary layout."""
    if perm is None:
        return w.T
    d_out = w.shape[0]
    dh = d_out // heads
    return w.reshape(heads, dh, -1)[:, perm].reshape(d_out, -1).T


def _headed_bias(b: np.ndarray, heads: int, perm: np.ndarray | None) -> np.ndarray:
    if perm is None:
        return b
    dh = b.shape[0] // heads
    return b.reshape(heads, dh)[:, perm].reshape(-1)


def load_lightglue_torch(path: str, template: Any, strict: bool = True) -> Any:
    """Map the public LightGlue checkpoint (cvg/LightGlue) onto LightGlueNet.

    Handles the official layouts exactly (replacing the reference's use of
    the lightglue pip package, neural_matcher.py:47-66):
      - `transformers.{i}.self_attn.Wqkv`: fused projection whose output is
        laid out (heads, head_dim, 3) interleaved — NOT [q|k|v] blocks,
      - `transformers.{i}.cross_attn.to_qk/to_v/to_out`: one shared qk
        projection consumed by both directions,
      - shared per-layer weights applied to both images (mapped onto both
        of our *0/*1 modules),
      - `posenc.Wr`: learnable Fourier rotary frequencies (row permutation
        applied to q/k so our half-split rotary matches the official
        interleaved pairing, see _rotary_perm),
      - `log_assignment.{last}`: final_proj + matchability,
      - missing `input_proj` (Identity when input_dim == descriptor_dim)
        synthesized as the identity matrix,
      - legacy `self_attn.{i}.*` key names renamed to `transformers.{i}.*`.

    strict=True (default) raises KeyError/ValueError if any head LightGlueNet
    consumes is absent or shape-mismatched — a silent partial load cannot
    happen. Checkpoint keys our static-depth inference deliberately ignores
    (token_confidence.*, the per-layer log_assignment heads below the last,
    buffers) are skipped without error.
    """
    sd = _load_torch_state(path)
    # legacy key names (pre-2023.09 checkpoints)
    renamed = {}
    for k, v in sd.items():
        import re

        k2 = re.sub(r"^self_attn\.(\d+)\.", r"transformers.\1.self_attn.", k)
        k2 = re.sub(r"^cross_attn\.(\d+)\.", r"transformers.\1.cross_attn.", k2)
        renamed[k2] = v
    sd = renamed

    params = dict(template["params"])
    n_layers = len([k for k in params if k.startswith("layer")])

    def take(key):
        if key not in sd:
            raise KeyError(f"lightglue checkpoint {path} missing {key}")
        return sd[key]

    def shaped(arr, like, key):
        like = np.asarray(like)
        if arr.shape != like.shape:
            raise ValueError(
                f"lightglue checkpoint {path} shape mismatch at {key}: "
                f"{arr.shape} vs {like.shape}"
            )
        return arr.astype(like.dtype)

    def assign(dst: Dict, name: str, kernel, bias, key: str):
        dst[name] = {
            "kernel": shaped(kernel, dst[name]["kernel"], key + ".kernel"),
            "bias": shaped(bias, dst[name]["bias"], key + ".bias"),
        }

    try:
        out = dict(params)
        dim = np.asarray(params["final_proj"]["kernel"]).shape[0]
        dh2 = np.asarray(params["rotary_freqs"]).shape[1]
        heads = dim // (2 * dh2)
        perm = _rotary_perm(2 * dh2)

        # positional encoding
        out["rotary_freqs"] = shaped(
            take("posenc.Wr.weight").T, params["rotary_freqs"], "rotary_freqs"
        )

        # input projection: Identity in the public SuperPoint config
        if "input_proj.weight" in sd:
            assign(out, "input_proj", take("input_proj.weight").T,
                   take("input_proj.bias"), "input_proj")
        else:
            assign(
                out, "input_proj",
                np.eye(dim, dtype=np.float32),
                np.zeros(dim, np.float32),
                "input_proj(identity)",
            )

        for i in range(n_layers):
            layer = dict(out[f"layer{i}"])
            sp = f"transformers.{i}.self_attn"
            cp = f"transformers.{i}.cross_attn"

            # fused Wqkv, official layout (heads, head_dim, 3)
            Wqkv = take(f"{sp}.Wqkv.weight")  # (3d, d)
            bqkv = take(f"{sp}.Wqkv.bias")
            Wh = Wqkv.reshape(heads, -1, 3, Wqkv.shape[1])  # (H, dh, 3, d)
            bh = bqkv.reshape(heads, -1, 3)  # (H, dh, 3)
            qkv = {}
            for t, nm in enumerate(["to_q", "to_k", "to_v"]):
                p = perm if nm in ("to_q", "to_k") else None
                w_t = Wh[:, :, t, :].reshape(heads * Wh.shape[1], -1)
                b_t = bh[:, :, t].reshape(-1)
                qkv[nm] = (_headed(w_t, heads, p), _headed_bias(b_t, heads, p))
            for side in ("self_attn0", "self_attn1"):
                sub = dict(layer[side])
                for nm, (w_t, b_t) in qkv.items():
                    assign(sub, nm, w_t, b_t, f"{sp}.Wqkv[{nm}]")
                assign(sub, "to_out", take(f"{sp}.out_proj.weight").T,
                       take(f"{sp}.out_proj.bias"), f"{sp}.out_proj")
                layer[side] = sub

            # cross attention: shared to_qk feeds both q and k (no rotary,
            # so no permutation is needed or applied)
            for side in ("cross_attn0", "cross_attn1"):
                sub = dict(layer[side])
                assign(sub, "to_q", take(f"{cp}.to_qk.weight").T,
                       take(f"{cp}.to_qk.bias"), f"{cp}.to_qk")
                assign(sub, "to_k", take(f"{cp}.to_qk.weight").T,
                       take(f"{cp}.to_qk.bias"), f"{cp}.to_qk")
                assign(sub, "to_v", take(f"{cp}.to_v.weight").T,
                       take(f"{cp}.to_v.bias"), f"{cp}.to_v")
                assign(sub, "to_out", take(f"{cp}.to_out.weight").T,
                       take(f"{cp}.to_out.bias"), f"{cp}.to_out")
                layer[side] = sub

            # residual FFNs: Sequential(Linear, LayerNorm, GELU, Linear)
            for ours, theirs in [
                ("self_upd0", sp), ("self_upd1", sp),
                ("cross_upd0", cp), ("cross_upd1", cp),
            ]:
                sub = dict(layer[ours])
                assign(sub, "ffn1", take(f"{theirs}.ffn.0.weight").T,
                       take(f"{theirs}.ffn.0.bias"), f"{theirs}.ffn.0")
                sub["ln"] = {
                    "scale": shaped(take(f"{theirs}.ffn.1.weight"),
                                    sub["ln"]["scale"], f"{theirs}.ffn.1.weight"),
                    "bias": shaped(take(f"{theirs}.ffn.1.bias"),
                                   sub["ln"]["bias"], f"{theirs}.ffn.1.bias"),
                }
                assign(sub, "ffn2", take(f"{theirs}.ffn.3.weight").T,
                       take(f"{theirs}.ffn.3.bias"), f"{theirs}.ffn.3")
                layer[ours] = sub

            out[f"layer{i}"] = layer

        # assignment head: the last layer's (earlier ones serve the official
        # early-exit, which our static-depth inference removes by design)
        la = f"log_assignment.{n_layers - 1}"
        assign(out, "final_proj", take(f"{la}.final_proj.weight").T,
               take(f"{la}.final_proj.bias"), f"{la}.final_proj")
        assign(out, "matchability", take(f"{la}.matchability.weight").T,
               take(f"{la}.matchability.bias"), f"{la}.matchability")
    except (KeyError, ValueError):
        if strict:
            raise
        return {"params": params}

    return {"params": out}
