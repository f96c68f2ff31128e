"""Torch checkpoint conversion proof (VERDICT r1 #3).

Builds synthetic torch state dicts with the EXACT public layer names and
layouts (cvg/LightGlue + magicleap SuperPoint, the models the reference
loads at neural_matcher.py:47-66), converts them, and asserts:
  1. strict load completes with zero skipped heads,
  2. the Flax forward pass is numerically identical to a torch reference
     implementation of the official blocks (fused interleaved Wqkv,
     rotate_half rotary, shared cross to_qk, Sequential ffn, log-double-
     softmax assignment),
  3. silent partial loads are impossible (missing/mismatched keys raise).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from recon3d_tpu.neural.lightglue import LightGlueNet  # noqa: E402
from recon3d_tpu.neural.superpoint import SuperPointNet  # noqa: E402
from recon3d_tpu.neural.weights import (  # noqa: E402
    load_lightglue_torch,
    load_superpoint_torch,
)

D, HEADS, LAYERS = 256, 4, 9
DH = D // HEADS


def make_lightglue_state_dict(seed=0, layers=LAYERS, legacy_names=False):
    """Synthetic state dict with the public checkpoint's names/shapes."""
    gen = torch.Generator().manual_seed(seed)

    # small weight scale keeps activations O(1) through 9 residual layers;
    # a trained checkpoint is similarly tame, and exploding activations
    # would amplify f32 noise above any meaningful parity tolerance
    def r(*shape):
        return torch.randn(*shape, generator=gen) * 0.05

    sd = {"posenc.Wr.weight": r(DH // 2, 2)}
    for i in range(layers):
        sp = (f"self_attn.{i}" if legacy_names else f"transformers.{i}.self_attn")
        cp = (f"cross_attn.{i}" if legacy_names else f"transformers.{i}.cross_attn")
        sd[f"{sp}.Wqkv.weight"] = r(3 * D, D)
        sd[f"{sp}.Wqkv.bias"] = r(3 * D)
        sd[f"{sp}.out_proj.weight"] = r(D, D)
        sd[f"{sp}.out_proj.bias"] = r(D)
        sd[f"{cp}.to_qk.weight"] = r(D, D)
        sd[f"{cp}.to_qk.bias"] = r(D)
        sd[f"{cp}.to_v.weight"] = r(D, D)
        sd[f"{cp}.to_v.bias"] = r(D)
        sd[f"{cp}.to_out.weight"] = r(D, D)
        sd[f"{cp}.to_out.bias"] = r(D)
        for p in (sp, cp):
            sd[f"{p}.ffn.0.weight"] = r(2 * D, 2 * D)
            sd[f"{p}.ffn.0.bias"] = r(2 * D)
            sd[f"{p}.ffn.1.weight"] = 1.0 + 0.1 * r(2 * D)
            sd[f"{p}.ffn.1.bias"] = 0.1 * r(2 * D)
            sd[f"{p}.ffn.3.weight"] = r(D, 2 * D)
            sd[f"{p}.ffn.3.bias"] = r(D)
    for i in range(layers):
        sd[f"log_assignment.{i}.final_proj.weight"] = r(D, D)
        sd[f"log_assignment.{i}.final_proj.bias"] = r(D)
        sd[f"log_assignment.{i}.matchability.weight"] = r(1, D)
        sd[f"log_assignment.{i}.matchability.bias"] = r(1)
    for i in range(layers - 1):  # early-exit heads, deliberately unused
        sd[f"token_confidence.{i}.token.0.weight"] = r(1, D)
        sd[f"token_confidence.{i}.token.0.bias"] = r(1)
    return sd


def torch_lightglue_reference(sd, desc0, desc1, xy0, xy1, layers=LAYERS):
    """Official LightGlue forward (lightglue/lightglue.py) from a state dict:
    interleaved (heads, head_dim, 3) Wqkv layout, rotate_half rotary with
    repeat_interleave(2) Fourier encoding, shared cross to_qk, per-side ffn."""

    def lin(x, name):
        return x @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]

    Wr = sd["posenc.Wr.weight"]

    def posenc(xy):
        proj = xy @ Wr.T
        emb = torch.stack([torch.cos(proj), torch.sin(proj)], 0)
        return emb.repeat_interleave(2, dim=-1)  # (2, N, DH)

    def rotate_half(x):
        x = x.unflatten(-1, (-1, 2))
        x1, x2 = x.unbind(dim=-1)
        return torch.stack((-x2, x1), dim=-1).flatten(start_dim=-2)

    def apply_rot(enc, t):
        return t * enc[0] + rotate_half(t) * enc[1]

    def ffn(y, p):
        y = lin(y, f"{p}.ffn.0")
        y = F.layer_norm(
            y, (y.shape[-1],), sd[f"{p}.ffn.1.weight"], sd[f"{p}.ffn.1.bias"]
        )
        return lin(F.gelu(y), f"{p}.ffn.3")

    def self_block(x, enc, p):
        qkv = lin(x, f"{p}.Wqkv")
        qkv = qkv.unflatten(-1, (HEADS, DH, 3)).permute(1, 0, 2, 3)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        q, k = apply_rot(enc, q), apply_rot(enc, k)
        attn = torch.softmax(q @ k.transpose(-1, -2) / DH**0.5, dim=-1)
        msg = lin((attn @ v).permute(1, 0, 2).reshape(-1, D), f"{p}.out_proj")
        return x + ffn(torch.cat([x, msg], -1), p)

    def split(t):
        return t.unflatten(-1, (HEADS, DH)).permute(1, 0, 2)

    def cross_block(x0, x1, p):
        s = DH**-0.5
        qk0, qk1 = split(lin(x0, f"{p}.to_qk")), split(lin(x1, f"{p}.to_qk"))
        v0, v1 = split(lin(x0, f"{p}.to_v")), split(lin(x1, f"{p}.to_v"))
        sim = (qk0 * s**0.5) @ (qk1 * s**0.5).transpose(-1, -2)
        m0 = torch.softmax(sim, dim=-1) @ v1
        m1 = torch.softmax(sim.transpose(-2, -1), dim=-1) @ v0
        m0 = lin(m0.permute(1, 0, 2).reshape(-1, D), f"{p}.to_out")
        m1 = lin(m1.permute(1, 0, 2).reshape(-1, D), f"{p}.to_out")
        return (
            x0 + ffn(torch.cat([x0, m0], -1), p),
            x1 + ffn(torch.cat([x1, m1], -1), p),
        )

    x0, x1 = desc0, desc1
    enc0, enc1 = posenc(xy0), posenc(xy1)
    for i in range(layers):
        x0 = self_block(x0, enc0, f"transformers.{i}.self_attn")
        x1 = self_block(x1, enc1, f"transformers.{i}.self_attn")
        x0, x1 = cross_block(x0, x1, f"transformers.{i}.cross_attn")
    la = f"log_assignment.{layers - 1}"
    f0 = lin(x0, f"{la}.final_proj") / D**0.25
    f1 = lin(x1, f"{la}.final_proj") / D**0.25
    sim = f0 @ f1.T
    z0 = lin(x0, f"{la}.matchability")[:, 0]
    z1 = lin(x1, f"{la}.matchability")[:, 0]
    scores = (
        torch.log_softmax(sim, 1)
        + torch.log_softmax(sim, 0)
        + F.logsigmoid(z0)[:, None]
        + F.logsigmoid(z1)[None, :]
    )
    return scores, torch.sigmoid(z0), torch.sigmoid(z1)


@pytest.fixture(scope="module")
def lg_setup(tmp_path_factory):
    sd = make_lightglue_state_dict()
    path = tmp_path_factory.mktemp("w") / "lg.pth"
    torch.save(sd, path)
    net = LightGlueNet(dim=D, num_heads=HEADS, num_layers=LAYERS)
    k = 32
    template = net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((k, D)), jnp.zeros((k, D)),
        jnp.zeros((k, 2)), jnp.zeros((k, 2)),
        jnp.ones(k, bool), jnp.ones(k, bool),
    )
    return sd, str(path), net, template


def test_lightglue_conversion_forward_parity(lg_setup):
    sd, path, net, template = lg_setup
    params = load_lightglue_torch(path, template, strict=True)

    gen = torch.Generator().manual_seed(7)
    N0, N1 = 48, 56
    desc0 = torch.nn.functional.normalize(torch.randn(N0, D, generator=gen), dim=-1)
    desc1 = torch.nn.functional.normalize(torch.randn(N1, D, generator=gen), dim=-1)
    xy0 = torch.rand(N0, 2, generator=gen) * 2 - 1
    xy1 = torch.rand(N1, 2, generator=gen) * 2 - 1

    ref_scores, ref_m0, ref_m1 = torch_lightglue_reference(sd, desc0, desc1, xy0, xy1)

    log_assign, m0, m1 = net.apply(
        params,
        jnp.asarray(desc0.numpy()), jnp.asarray(desc1.numpy()),
        jnp.asarray(xy0.numpy()), jnp.asarray(xy1.numpy()),
        jnp.ones(N0, bool), jnp.ones(N1, bool),
    )
    np.testing.assert_allclose(
        np.asarray(log_assign), ref_scores.numpy(), atol=2e-3,
        err_msg="converted LightGlue forward differs from torch reference",
    )
    np.testing.assert_allclose(np.asarray(m0), ref_m0.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m1), ref_m1.numpy(), atol=1e-4)


def test_lightglue_conversion_legacy_key_names(lg_setup, tmp_path):
    _, _, net, template = lg_setup
    sd = make_lightglue_state_dict(legacy_names=True)
    path = tmp_path / "lg_legacy.pth"
    torch.save(sd, path)
    params = load_lightglue_torch(str(path), template, strict=True)
    # spot-check one converted head: cross to_v of layer 3
    got = np.asarray(params["params"]["layer3"]["cross_attn0"]["to_v"]["kernel"])
    np.testing.assert_allclose(
        got, sd["cross_attn.3.to_v.weight"].numpy().T, atol=1e-6
    )


def test_lightglue_strict_load_refuses_partial(lg_setup, tmp_path):
    _, _, net, template = lg_setup
    sd = make_lightglue_state_dict()
    del sd["transformers.4.cross_attn.to_v.weight"]
    p1 = tmp_path / "missing.pth"
    torch.save(sd, p1)
    with pytest.raises(KeyError, match="to_v"):
        load_lightglue_torch(str(p1), template, strict=True)

    sd = make_lightglue_state_dict()
    sd["log_assignment.8.final_proj.weight"] = torch.randn(D, D // 2)
    p2 = tmp_path / "badshape.pth"
    torch.save(sd, p2)
    with pytest.raises(ValueError, match="final_proj"):
        load_lightglue_torch(str(p2), template, strict=True)


def torch_superpoint_reference(sd, img):
    """Official SuperPoint forward (magicleap superpoint.py) from a state
    dict: VGG encoder with 2x2 max-pools, 65-ch detector, 256-d descriptor."""

    def conv(x, name, relu=True, pad=1):
        x = F.conv2d(x, sd[f"{name}.weight"], sd[f"{name}.bias"], padding=pad)
        return F.relu(x) if relu else x

    x = img[None, None]  # (1, 1, H, W)
    x = conv(conv(x, "conv1a"), "conv1b")
    x = F.max_pool2d(x, 2, 2)
    x = conv(conv(x, "conv2a"), "conv2b")
    x = F.max_pool2d(x, 2, 2)
    x = conv(conv(x, "conv3a"), "conv3b")
    x = F.max_pool2d(x, 2, 2)
    x = conv(conv(x, "conv4a"), "conv4b")
    logits = conv(conv(x, "convPa"), "convPb", relu=False, pad=0)
    desc = conv(conv(x, "convDa"), "convDb", relu=False, pad=0)
    desc = F.normalize(desc, p=2, dim=1)
    return logits[0].permute(1, 2, 0), desc[0].permute(1, 2, 0)


def test_superpoint_conversion_forward_parity(tmp_path):
    gen = torch.Generator().manual_seed(1)
    chans = {
        "conv1a": (64, 1), "conv1b": (64, 64),
        "conv2a": (64, 64), "conv2b": (64, 64),
        "conv3a": (128, 64), "conv3b": (128, 128),
        "conv4a": (128, 128), "conv4b": (128, 128),
        "convPa": (256, 128), "convDa": (256, 128),
    }
    sd = {}
    for name, (o, i) in chans.items():
        sd[f"{name}.weight"] = torch.randn(o, i, 3, 3, generator=gen) * 0.1
        sd[f"{name}.bias"] = torch.randn(o, generator=gen) * 0.1
    sd["convPb.weight"] = torch.randn(65, 256, 1, 1, generator=gen) * 0.1
    sd["convPb.bias"] = torch.randn(65, generator=gen) * 0.1
    sd["convDb.weight"] = torch.randn(256, 256, 1, 1, generator=gen) * 0.1
    sd["convDb.bias"] = torch.randn(256, generator=gen) * 0.1
    path = tmp_path / "sp.pth"
    torch.save(sd, path)

    model = SuperPointNet()
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    params = load_superpoint_torch(str(path), template)

    img = torch.rand(64, 96, generator=gen)
    ref_logits, ref_desc = torch_superpoint_reference(sd, img)
    logits, desc = model.apply(params, jnp.asarray(img.numpy())[None, ..., None])
    # logits reach ~1e2 magnitude with these synthetic weights; 1e-3
    # absolute is f32 accumulation noise, any layout error would be O(1)
    np.testing.assert_allclose(
        np.asarray(logits[0]), ref_logits.numpy(), atol=1e-3,
        err_msg="converted SuperPoint logits differ from torch reference",
    )
    np.testing.assert_allclose(np.asarray(desc[0]), ref_desc.numpy(), atol=1e-3)
