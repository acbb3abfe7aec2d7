"""Numerical forward parity: flax BaseNet2 vs a torch replica of the
reference topology (models.py:97-152) with transplanted weights.

This pins conv padding, residual adds, floor-mode average pooling, the
spectral branch, l2 normalisation and the classifier — any topology or
layout mistake shows up as a numeric mismatch, not just a shape match.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from cmlpl_tpu.models import BaseNet2


def _torch_forward(params, xp_nchw, x, w):
    """The reference BaseNet2 forward in torch ops, weights taken from the
    flax params (flax conv kernels are (H, W, in, out); dense (in, out))."""

    def conv_w(name):
        k = np.asarray(params[name]["kernel"])  # (H, W, in, out)
        return torch.tensor(k.transpose(3, 2, 0, 1))

    def conv_b(name):
        return torch.tensor(np.asarray(params[name]["bias"]))

    t = torch.tensor(xp_nchw)
    t = F.conv2d(t, conv_w("conv0"), conv_b("conv0"))
    res = t
    t = F.conv2d(t, conv_w("conv1"), conv_b("conv1"), padding=1)
    t = F.relu(t + res)
    t = F.avg_pool2d(t, 2, 2)
    res = t
    t = F.conv2d(t, conv_w("conv2"), conv_b("conv2"), padding=1)
    t = F.relu(t + res)
    t = F.avg_pool2d(t, 2, 2)
    # torch flattens (C, H, W); build the same (H, W, C) order as flax so
    # the classifier rows line up
    t = t.permute(0, 2, 3, 1).reshape(t.shape[0], -1)

    wk = torch.tensor(np.asarray(params["feat_spe"]["kernel"]))  # (in, out)
    wb = torch.tensor(np.asarray(params["feat_spe"]["bias"]))
    y = F.relu(torch.tensor(x) @ wk + wb)

    z = torch.cat([t, y], dim=1)
    feat = y / y.pow(2).sum(1, keepdim=True).pow(0.5)

    ck = torch.tensor(np.asarray(params["classifier"]["kernel"]))
    cb = torch.tensor(np.asarray(params["classifier"]["bias"]))
    logits = z @ ck + cb
    return logits.numpy(), feat.numpy()


def test_basenet2_matches_torch_replica(rng):
    w, n_pc, bands, ncls = 20, 12, 103, 9
    model = BaseNet2(num_features=bands, dropout=0.0, num_classes=ncls,
                     n_pc=n_pc)
    xp = rng.normal(size=(4, w, w, n_pc)).astype(np.float32)
    x = rng.normal(size=(4, bands)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(xp),
                        jnp.asarray(x), train=False)["params"]

    got_logits, got_feat = model.apply({"params": params},
                                       jnp.asarray(xp), jnp.asarray(x),
                                       train=False)
    want_logits, want_feat = _torch_forward(
        params, xp.transpose(0, 3, 1, 2), x, w)

    np.testing.assert_allclose(np.asarray(got_logits), want_logits,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_feat), want_feat,
                               rtol=1e-4, atol=1e-5)
