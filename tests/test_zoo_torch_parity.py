"""Zoo fidelity pins: hand-computed parameter counts + torch-transplant
forward parity for DBDA and SSFTT.

Round 1 only shape-tested the comparison zoo; a silent topology
divergence (e.g. a dense-block growth width) would have passed CI.
The counts below are derived layer by layer from the reference
definitions (conpared_models.py:128-190 SSFTT, :719-1077 DBDA x2,
:1110-1163 SSRN, :1165-1290 FDSSC), counting only forward-participating
parameters (the reference's DBDA carries unused modules — shared_mlp,
conv25, pooling stubs — whose params never receive gradients; they are
intentionally not reproduced).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

pytestmark = pytest.mark.slow  # torch-transplant forward-parity oracles (VERDICT r3 item 5)

from cmlpl_tpu.models.zoo import build_model
from cmlpl_tpu.registry import get_dataset


def _count(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def _conv3d(cout, cin, k):          # weights + bias
    return cout * cin * int(np.prod(k)) + cout


def _linear(cout, cin):
    return cout * cin + cout


def _expected_ssftt(ncls=9, dim=64, tokens=4, mlp=8):
    """conpared_models.py:128-190 + the ViT v1 helpers (:23-112)."""
    return (_conv3d(8, 1, (3, 3, 3))            # conv3d_features
            + 2 * 8                             # BatchNorm3d(8) affine
            + _conv3d(64, 24, (3, 3))           # conv2d_features
            + 2 * 64                            # BatchNorm2d(64) affine
            + tokens * 64 + 64 * dim            # token_wA / token_wV
            + (tokens + 1) * dim + dim          # pos_embedding + cls_token
            + 2 * dim + _linear(3 * dim, dim)   # LN + to_qkv
            + _linear(dim, dim)                 # attention out proj (nn1)
            + 2 * dim                           # LN before MLP
            + _linear(mlp, dim) + _linear(dim, mlp)   # MLP_Block
            + _linear(ncls, dim))               # head


def _expected_dbda_trunk(band):
    """Shared DBDA trunk (:903-1077 forward-participating layers)."""
    k3d = int(np.floor((band - 6) / 2))
    pam = 2 * _linear(60 // 8, 60) + _linear(60, 60) + 1   # q/k/v + gamma
    return (_conv3d(24, 1, (1, 1, 7))                      # conv11
            + 2 * (24 + 48 + 72 + 96)                      # bn11..bn14
            + _conv3d(24, 24, (1, 1, 7))                   # conv12
            + _conv3d(24, 48, (1, 1, 7))                   # conv13
            + _conv3d(24, 72, (1, 1, 7))                   # conv14
            + _conv3d(60, 96, (1, 1, k3d))                 # conv15
            + _conv3d(24, 1, (1, 1, band))                 # conv21
            + 2 * (24 + 36 + 48)                           # bn21..bn23
            + _conv3d(12, 24, (3, 3, 1))                   # conv22
            + _conv3d(12, 36, (3, 3, 1))                   # conv23
            + _conv3d(12, 48, (3, 3, 1))                   # conv24
            + 1                                            # CAM gamma
            + pam)


def _expected_ssrn(band, ncls=9):
    """conpared_models.py:1110-1163."""
    k3d = int(np.ceil((band - 6) / 2))
    res_spec = 2 * (_conv3d(24, 24, (1, 1, 7)) + 2 * 24)   # conv+bn x2
    res_spat = 2 * (_conv3d(24, 24, (3, 3, 1)) + 2 * 24)
    return (_conv3d(24, 1, (1, 1, 7)) + 2 * 24             # stem conv+bn
            + 2 * res_spec                                 # res1, res2
            + _conv3d(128, 24, (1, 1, k3d)) + 2 * 128      # conv2+bn2
            + _conv3d(24, 1, (3, 3, 128)) + 2 * 24         # conv3+bn3
            + 2 * res_spat                                 # res3, res4
            + _linear(ncls, 24))


def _expected_fdssc(band, ncls=9):
    """conpared_models.py:1165-1290; 8 PReLU slopes (bn4 uses ReLU)."""
    k3d = int(np.ceil((band - 6) / 2))
    dense = (_conv3d(12, 24, (1, 1, 7)) + _conv3d(12, 36, (1, 1, 7))
             + _conv3d(12, 48, (1, 1, 7)))
    return (_conv3d(24, 1, (1, 1, 7)) + 2 * 24             # conv1+bn1
            + dense + 2 * (36 + 48 + 60)                   # spectral block
            + _conv3d(200, 60, (1, 1, k3d))                # conv5
            + 2 * 1                                        # bn5 (1 channel)
            + _conv3d(24, 1, (1, 1, 200)) + 2 * 24         # conv6+bn6
            + dense + 2 * (36 + 48 + 60)                   # spatial block
            + _linear(ncls, 60)
            + 8)                                           # PReLU slopes


@pytest.mark.parametrize("name,w,n_pc,expected", [
    ("ssftt", 13, 5, _expected_ssftt()),
    ("dbda", 9, 103, _expected_dbda_trunk(103) + _linear(9, 120)),
    ("dbda_feature", 9, 103,
     _expected_dbda_trunk(103) + _linear(64, 120) + _linear(64, 64)
     + _linear(32, 64) + _linear(9, 32)),
    ("ssrn", 7, 103, _expected_ssrn(103)),
    ("fdssc", 9, 103, _expected_fdssc(103)),
])
def test_zoo_param_counts_pin_topology(name, w, n_pc, expected):
    spec = get_dataset(1)  # PaviaU: 103 bands, 9 classes
    model, entry = build_model(name, spec, n_pc)
    variables = model.init(jax.random.key(0), jnp.zeros((1, w, w, n_pc)),
                           train=False)
    assert _count(variables["params"]) == expected, name


# --------------------------------------------------------------------- #
# torch forward-parity transplants
# --------------------------------------------------------------------- #

def _t(a):
    return torch.tensor(np.asarray(a))


def _conv3d_w(flax_kernel):
    """flax (kh, kw, kd, Cin, Cout) -> torch (Cout, Cin, kh, kw, kd)."""
    return torch.nn.Parameter(_t(flax_kernel).permute(4, 3, 0, 1, 2)
                              .contiguous())


class TorchDBDA(torch.nn.Module):
    """Reference DBDA (shadowing def, conpared_models.py:903-1077),
    forward-participating layers only.  Input NCHW (B, band, H, W)."""

    def __init__(self, band, ncls):
        super().__init__()
        k3d = int(np.floor((band - 6) / 2))
        c3 = torch.nn.Conv3d
        self.conv11 = c3(1, 24, (1, 1, 7), stride=(1, 1, 2))
        self.conv12 = c3(24, 24, (1, 1, 7), padding=(0, 0, 3))
        self.conv13 = c3(48, 24, (1, 1, 7), padding=(0, 0, 3))
        self.conv14 = c3(72, 24, (1, 1, 7), padding=(0, 0, 3))
        self.conv15 = c3(96, 60, (1, 1, k3d))
        self.conv21 = c3(1, 24, (1, 1, band))
        self.conv22 = c3(24, 12, (3, 3, 1), padding=(1, 1, 0))
        self.conv23 = c3(36, 12, (3, 3, 1), padding=(1, 1, 0))
        self.conv24 = c3(48, 12, (3, 3, 1), padding=(1, 1, 0))
        for i, ch in zip(range(11, 15), [24, 48, 72, 96]):
            setattr(self, f"bn{i}",
                    torch.nn.BatchNorm3d(ch, eps=0.001, momentum=0.1))
        for i, ch in zip(range(21, 24), [24, 36, 48]):
            setattr(self, f"bn{i}",
                    torch.nn.BatchNorm3d(ch, eps=0.001, momentum=0.1))
        self.q = torch.nn.Conv2d(60, 7, 1)
        self.k = torch.nn.Conv2d(60, 7, 1)
        self.v = torch.nn.Conv2d(60, 60, 1)
        self.gamma_pam = torch.nn.Parameter(torch.zeros(1))
        self.gamma_cam = torch.nn.Parameter(torch.zeros(1))
        self.fc = torch.nn.Linear(120, ncls)

    def load_flax(self, params):
        trunk = params["trunk"]
        for name in ["conv11", "conv12", "conv13", "conv14", "conv15",
                     "conv21", "conv22", "conv23", "conv24"]:
            layer = getattr(self, name)
            layer.weight = _conv3d_w(trunk[name]["kernel"])
            layer.bias = torch.nn.Parameter(_t(trunk[name]["bias"]))
        for name in ["bn11", "bn12", "bn13", "bn14", "bn21", "bn22",
                     "bn23"]:
            layer = getattr(self, name)
            layer.weight = torch.nn.Parameter(_t(trunk[name]["scale"]))
            layer.bias = torch.nn.Parameter(_t(trunk[name]["bias"]))
        pam = trunk["attention_spatial"]
        for tname, fname in [("q", "query_conv"), ("k", "key_conv"),
                             ("v", "value_conv")]:
            layer = getattr(self, tname)
            kern = _t(pam[fname]["kernel"])  # (1, 1, Cin, Cout)
            layer.weight = torch.nn.Parameter(
                kern.permute(3, 2, 0, 1).contiguous())
            layer.bias = torch.nn.Parameter(_t(pam[fname]["bias"]))
        self.gamma_pam = torch.nn.Parameter(_t(pam["gamma"]))
        self.gamma_cam = torch.nn.Parameter(
            _t(trunk["attention_spectral"]["gamma"]))
        self.fc.weight = torch.nn.Parameter(
            _t(params["full_connection"]["kernel"]).T.contiguous())
        self.fc.bias = torch.nn.Parameter(
            _t(params["full_connection"]["bias"]))

    def _cam(self, x):  # (B, C, H, W, D)
        b, c = x.shape[:2]
        flat = x.reshape(b, c, -1)
        energy = torch.bmm(flat, flat.transpose(1, 2))
        energy = energy.max(-1, keepdim=True).values.expand_as(energy) \
            - energy
        attn = torch.softmax(energy, dim=-1)
        out = torch.bmm(attn, flat).view_as(x)
        return self.gamma_cam * out + x

    def _pam(self, x):  # (B, C, H, W, 1)
        b, c, h, w, _ = x.shape
        x2 = x.reshape(b, c, h, w)
        q = self.q(x2).view(b, -1, h * w).permute(0, 2, 1)
        k = self.k(x2).view(b, -1, h * w)
        attn = torch.softmax(torch.bmm(q, k), dim=-1)
        v = self.v(x2).view(b, -1, h * w)
        out = torch.bmm(v, attn.permute(0, 2, 1)).view(b, c, h, w)
        return (self.gamma_pam * out + x2).reshape(b, c, h, w, 1)

    def forward(self, x):  # (B, band, H, W)
        b, c, h, w = x.shape
        x = x.permute(0, 2, 3, 1).reshape(b, 1, h, w, c)
        x11 = self.conv11(x)
        x12 = self.conv12(F.relu(self.bn11(x11)))
        x13 = torch.cat([x11, x12], 1)
        x13 = self.conv13(F.relu(self.bn12(x13)))
        x14 = torch.cat([x11, x12, x13], 1)
        x14 = self.conv14(F.relu(self.bn13(x14)))
        x15 = torch.cat([x11, x12, x13, x14], 1)
        x16 = self.conv15(F.relu(self.bn14(x15)))
        x1 = self._cam(x16) * x16

        x21 = self.conv21(x)
        x22 = self.conv22(F.relu(self.bn21(x21)))
        x23 = torch.cat([x21, x22], 1)
        x23 = self.conv23(F.relu(self.bn22(x23)))
        x24 = torch.cat([x21, x22, x23], 1)
        x24 = self.conv24(F.relu(self.bn23(x24)))
        x25 = torch.cat([x21, x22, x23, x24], 1)
        x2 = self._pam(x25) * x25

        p1 = x1.mean(dim=(2, 3, 4))
        p2 = x2.mean(dim=(2, 3, 4))
        return self.fc(torch.cat([p1, p2], 1))


def test_dbda_forward_matches_torch(rng):
    spec = get_dataset(1)
    model, _ = build_model("dbda", spec, 103)
    xp = rng.normal(size=(3, 9, 9, 103)).astype(np.float32)
    variables = model.init(jax.random.key(3), jnp.asarray(xp), train=False)
    want = np.asarray(model.apply(variables, jnp.asarray(xp), train=False))

    net = TorchDBDA(103, 9)
    net.load_flax(jax.device_get(variables["params"]))
    net.eval()
    with torch.no_grad():
        got = net(_t(xp).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TorchSSFTT(torch.nn.Module):
    """Reference SSFTTnet (conpared_models.py:128-190) with the 1-layer
    ViT (:23-112).  Input (B, n_pc, w, w)."""

    def __init__(self, ncls=9, tokens=4, dim=64, heads=8, mlp=8):
        super().__init__()
        self.heads, self.dim = heads, dim
        self.conv3d = torch.nn.Conv3d(1, 8, 3)
        self.bn3d = torch.nn.BatchNorm3d(8)
        self.conv2d = torch.nn.Conv2d(24, 64, 3)
        self.bn2d = torch.nn.BatchNorm2d(64)
        self.token_wA = torch.nn.Parameter(torch.zeros(1, tokens, 64))
        self.token_wV = torch.nn.Parameter(torch.zeros(1, 64, dim))
        self.pos = torch.nn.Parameter(torch.zeros(1, tokens + 1, dim))
        self.cls = torch.nn.Parameter(torch.zeros(1, 1, dim))
        self.ln1 = torch.nn.LayerNorm(dim)
        self.to_qkv = torch.nn.Linear(dim, dim * 3)
        self.attn_out = torch.nn.Linear(dim, dim)
        self.ln2 = torch.nn.LayerNorm(dim)
        self.mlp1 = torch.nn.Linear(dim, mlp)
        self.mlp2 = torch.nn.Linear(mlp, dim)
        self.head = torch.nn.Linear(dim, ncls)

    def load_flax(self, params, d_prime):
        self.conv3d.weight = _conv3d_w(params["conv3d"]["kernel"])
        self.conv3d.bias = torch.nn.Parameter(_t(params["conv3d"]["bias"]))
        # flax merges (D', 8) d-major into 2-D channels; the reference
        # merges (8, D') c-major — permute the conv2d input channels
        k2 = _t(params["conv2d"]["kernel"]).permute(3, 2, 0, 1)  # (64,24,3,3)
        perm = [(m % 8) * d_prime + (m // 8) for m in range(8 * d_prime)]
        inv = np.argsort(perm)
        self.conv2d.weight = torch.nn.Parameter(k2[:, inv].contiguous())
        self.conv2d.bias = torch.nn.Parameter(_t(params["conv2d"]["bias"]))
        for tname, fname in [("bn3d", "bn3d"), ("bn2d", "bn2d")]:
            layer = getattr(self, tname)
            layer.weight = torch.nn.Parameter(_t(params[fname]["scale"]))
            layer.bias = torch.nn.Parameter(_t(params[fname]["bias"]))
        self.token_wA = torch.nn.Parameter(_t(params["token_wA"]))
        self.token_wV = torch.nn.Parameter(_t(params["token_wV"]))
        self.pos = torch.nn.Parameter(_t(params["pos_embedding"]))
        self.cls = torch.nn.Parameter(_t(params["cls_token"]))
        tr = params["transformer"]

        def lin(dst, kernel, bias):
            dst.weight = torch.nn.Parameter(_t(kernel).T.contiguous())
            dst.bias = torch.nn.Parameter(_t(bias))

        lin(self.to_qkv, tr["attn_0"]["to_qkv"]["kernel"],
            tr["attn_0"]["to_qkv"]["bias"])
        lin(self.attn_out, tr["attn_0"]["nn1"]["kernel"],
            tr["attn_0"]["nn1"]["bias"])
        lin(self.mlp1, tr["mlp_0"]["Dense_0"]["kernel"],
            tr["mlp_0"]["Dense_0"]["bias"])
        lin(self.mlp2, tr["mlp_0"]["Dense_1"]["kernel"],
            tr["mlp_0"]["Dense_1"]["bias"])
        for tname, fname in [("ln1", "ln_attn_0"), ("ln2", "ln_mlp_0")]:
            layer = getattr(self, tname)
            layer.weight = torch.nn.Parameter(_t(tr[fname]["scale"]))
            layer.bias = torch.nn.Parameter(_t(tr[fname]["bias"]))
        lin(self.head, params["head"]["kernel"], params["head"]["bias"])

    def forward(self, x):  # (B, n_pc, w, w)
        b = x.shape[0]
        x = F.relu(self.bn3d(self.conv3d(x[:, None])))  # (B,8,D',H',W')
        bb, c8, dp, hp, wp = x.shape
        x = x.reshape(bb, c8 * dp, hp, wp)              # c-major merge
        x = F.relu(self.bn2d(self.conv2d(x)))
        tok = x.flatten(2).transpose(1, 2)              # (B, n, 64)

        A = torch.einsum("bnc,blc->bnl", tok, self.token_wA.expand(b, -1,
                                                                   -1))
        A = torch.softmax(A.transpose(1, 2), dim=-1)    # (B, L, n)
        VV = torch.einsum("bnc,bcd->bnd", tok, self.token_wV.expand(
            b, -1, -1))
        T = torch.einsum("bln,bnd->bld", A, VV)
        z = torch.cat([self.cls.expand(b, -1, -1), T], 1) + self.pos

        h = self.ln1(z)
        qkv = self.to_qkv(h).chunk(3, dim=-1)
        hd = self.dim // self.heads

        def split(t):
            return t.reshape(b, -1, self.heads, hd).transpose(1, 2)

        q, k, v = map(split, qkv)
        dots = torch.einsum("bhid,bhjd->bhij", q, k) * self.dim ** -0.5
        out = torch.einsum("bhij,bhjd->bhid", torch.softmax(dots, -1), v)
        out = out.transpose(1, 2).reshape(b, -1, self.dim)
        z = z + self.attn_out(out)
        z = z + self.mlp2(F.gelu(self.mlp1(self.ln2(z))))
        return self.head(z[:, 0])


def test_ssftt_forward_matches_torch(rng):
    spec = get_dataset(1)
    model, _ = build_model("ssftt", spec, 5)
    xp = rng.normal(size=(3, 13, 13, 5)).astype(np.float32)
    variables = model.init(jax.random.key(7), jnp.asarray(xp), train=False)
    want = np.asarray(model.apply(variables, jnp.asarray(xp), train=False))

    net = TorchSSFTT()
    net.load_flax(jax.device_get(variables["params"]), d_prime=3)
    net.eval()
    with torch.no_grad():
        got = net(_t(xp).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------- #
# SSRN / FDSSC torch transplants.  BN statistics, BN affine params and
# PReLU slopes are RANDOMISED before the comparison: at init flax/torch
# BN is the identity on non-negative inputs, which hides activation-
# ordering divergences (this suite caught a missing post-bn1 ReLU in the
# SSRN residual block that way).
# --------------------------------------------------------------------- #


def _randomize_bn(params, stats, rng):
    """Randomise every BN (scale/bias + running mean/var) and PReLU slope
    in-place; returns the mutated (params, stats)."""

    def walk(p, s):
        for key, val in p.items():
            sub_s = s.get(key) if isinstance(s, dict) else None
            if isinstance(val, dict):
                if "scale" in val and isinstance(sub_s, dict) \
                        and "mean" in sub_s:
                    n = val["scale"].shape
                    val["scale"] = rng.uniform(0.5, 1.5, n).astype("f")
                    val["bias"] = rng.normal(0, 0.5, n).astype("f")
                    sub_s["mean"] = rng.normal(0, 0.5, n).astype("f")
                    sub_s["var"] = rng.uniform(0.5, 1.5, n).astype("f")
                else:
                    walk(val, sub_s if isinstance(sub_s, dict) else {})
            elif key == "negative_slope":
                val2 = rng.uniform(0.05, 0.45, np.shape(val)).astype("f")
                p[key] = val2

    walk(params, stats)
    return params, stats


def _load_bn(torch_bn, params_bn, stats_bn):
    torch_bn.weight = torch.nn.Parameter(_t(params_bn["scale"]))
    torch_bn.bias = torch.nn.Parameter(_t(params_bn["bias"]))
    torch_bn.running_mean = _t(stats_bn["mean"]).clone()
    torch_bn.running_var = _t(stats_bn["var"]).clone()


def _load_conv3d(torch_conv, params_conv):
    torch_conv.weight = _conv3d_w(params_conv["kernel"])
    torch_conv.bias = torch.nn.Parameter(_t(params_conv["bias"]))


class TorchSSRNResidual(torch.nn.Module):
    """conpared_models.py:1086-1108 (no 1x1 shortcut, as used by SSRN)."""

    def __init__(self, ch, kernel, padding):
        super().__init__()
        self.conv1 = torch.nn.Conv3d(ch, ch, kernel, padding=padding)
        self.conv2 = torch.nn.Conv3d(ch, ch, kernel, padding=padding)
        self.bn1 = torch.nn.BatchNorm3d(ch)
        self.bn2 = torch.nn.BatchNorm3d(ch)

    def load_flax(self, p, s):
        _load_conv3d(self.conv1, p["conv1"])
        _load_conv3d(self.conv2, p["conv2"])
        _load_bn(self.bn1, p["bn1"], s["bn1"])
        _load_bn(self.bn2, p["bn2"], s["bn2"])

    def forward(self, x):
        # reference: conv1 is Sequential(Conv3d, ReLU); then relu(bn1(.))
        y = F.relu(self.bn1(F.relu(self.conv1(x))))
        y = self.bn2(self.conv2(y))
        return F.relu(y + x)


class TorchSSRN(torch.nn.Module):
    """conpared_models.py:1110-1163.  Input (B, band, w, w)."""

    def __init__(self, band, ncls, head_in):
        super().__init__()
        k3d = int(np.ceil((band - 6) / 2))
        self.conv1 = torch.nn.Conv3d(1, 24, (1, 1, 7), stride=(1, 1, 2))
        self.bn1 = torch.nn.BatchNorm3d(24, eps=0.001)
        self.res1 = TorchSSRNResidual(24, (1, 1, 7), (0, 0, 3))
        self.res2 = TorchSSRNResidual(24, (1, 1, 7), (0, 0, 3))
        self.conv2 = torch.nn.Conv3d(24, 128, (1, 1, k3d))
        self.bn2 = torch.nn.BatchNorm3d(128, eps=0.001)
        self.conv3 = torch.nn.Conv3d(1, 24, (3, 3, 128))
        self.bn3 = torch.nn.BatchNorm3d(24, eps=0.001)
        self.res3 = TorchSSRNResidual(24, (3, 3, 1), (1, 1, 0))
        self.res4 = TorchSSRNResidual(24, (3, 3, 1), (1, 1, 0))
        self.fc = torch.nn.Linear(head_in, ncls)

    def load_flax(self, p, s):
        for name in ["conv1", "conv2", "conv3"]:
            _load_conv3d(getattr(self, name), p[name])
        for name in ["bn1", "bn2", "bn3"]:
            _load_bn(getattr(self, name), p[name], s[name])
        for i in range(1, 5):
            getattr(self, f"res{i}").load_flax(p[f"res{i}"], s[f"res{i}"])
        self.fc.weight = torch.nn.Parameter(_t(p["head"]["kernel"]).T
                                            .contiguous())
        self.fc.bias = torch.nn.Parameter(_t(p["head"]["bias"]))

    def forward(self, x):
        x = x.unsqueeze(1).permute(0, 1, 3, 4, 2)   # (B,1,w,w,band)
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.res2(self.res1(x))
        x = F.relu(self.bn2(self.conv2(x)))
        x = x.permute(0, 4, 2, 3, 1)                # (B,1,w,w,128)
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.res4(self.res3(x))
        x = F.avg_pool3d(x, (5, 5, 1))
        return self.fc(x.reshape(x.shape[0], -1))


def test_ssrn_forward_matches_torch(rng):
    spec = get_dataset(1)
    model, _ = build_model("ssrn", spec, 103)
    xp = rng.normal(size=(3, 7, 7, 103)).astype(np.float32)
    variables = jax.device_get(
        model.init(jax.random.key(5), jnp.asarray(xp), train=False))
    params, stats = _randomize_bn(variables["params"],
                                  variables["batch_stats"], rng)
    want = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(xp),
        train=False))

    net = TorchSSRN(103, 9, head_in=24)
    net.load_flax(params, stats)
    net.eval()
    with torch.no_grad():
        got = net(_t(xp).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TorchFDSSC(torch.nn.Module):
    """conpared_models.py:1165-1290.  Input (B, band, w, w); dropout off
    (eval)."""

    def __init__(self, band, ncls):
        super().__init__()
        k3d = int(np.ceil((band - 6) / 2))
        c3 = torch.nn.Conv3d
        self.conv1 = c3(1, 24, (1, 1, 7), stride=(1, 1, 2))
        self.conv2 = c3(24, 12, (1, 1, 7), padding=(0, 0, 3))
        self.conv3 = c3(36, 12, (1, 1, 7), padding=(0, 0, 3))
        self.conv4 = c3(48, 12, (1, 1, 7), padding=(0, 0, 3))
        self.conv5 = c3(60, 200, (1, 1, k3d))
        self.conv6 = c3(1, 24, (1, 1, 200))
        self.conv7 = c3(24, 12, (1, 1, 7), padding=(0, 0, 3))
        self.conv8 = c3(36, 12, (1, 1, 7), padding=(0, 0, 3))
        self.conv9 = c3(48, 12, (1, 1, 7), padding=(0, 0, 3))
        chans = {1: 24, 2: 36, 3: 48, 4: 60, 5: 1, 6: 24, 7: 36, 8: 48,
                 9: 60}
        for i, ch in chans.items():
            setattr(self, f"bn{i}",
                    torch.nn.BatchNorm3d(ch, eps=0.001))
            if i != 4:
                setattr(self, f"prelu{i}", torch.nn.PReLU())

    def load_flax(self, p, s):
        for i in range(1, 10):
            _load_conv3d(getattr(self, f"conv{i}"), p[f"conv{i}"])
            _load_bn(getattr(self, f"bn{i}"), p[f"b{i}_bn"], s[f"b{i}_bn"])
            if i != 4:
                pr = getattr(self, f"prelu{i}")
                pr.weight = torch.nn.Parameter(
                    _t(p[f"b{i}_prelu"]["negative_slope"]).reshape(1))
        self.fc = torch.nn.Linear(60, 9)
        self.fc.weight = torch.nn.Parameter(_t(p["head"]["kernel"]).T
                                            .contiguous())
        self.fc.bias = torch.nn.Parameter(_t(p["head"]["bias"]))

    def forward(self, x):
        x = x.unsqueeze(1).permute(0, 1, 3, 4, 2)   # (B,1,w,w,band)
        x1 = self.conv1(x)
        x2 = self.conv2(self.prelu1(self.bn1(x1)))
        x3 = torch.cat([x1, x2], 1)
        x3 = self.conv3(self.prelu2(self.bn2(x3)))
        x4 = torch.cat([x1, x2, x3], 1)
        x4 = self.conv4(self.prelu3(self.bn3(x4)))
        x5 = torch.cat([x1, x2, x3, x4], 1)
        x6 = self.conv5(F.relu(self.bn4(x5)))
        x6 = x6.permute(0, 4, 2, 3, 1)
        x7 = self.conv6(self.prelu5(self.bn5(x6)))
        x8 = self.conv7(self.prelu6(self.bn6(x7)))
        x9 = torch.cat([x7, x8], 1)
        x9 = self.conv8(self.prelu7(self.bn7(x9)))
        x10 = torch.cat([x7, x8, x9], 1)
        x10 = self.conv9(self.prelu8(self.bn8(x10)))
        x10 = torch.cat([x7, x8, x9, x10], 1)
        x10 = self.prelu9(self.bn9(x10))
        pooled = x10.mean(dim=(2, 3, 4))
        return self.fc(pooled)


def test_fdssc_forward_matches_torch(rng):
    spec = get_dataset(1)
    model, _ = build_model("fdssc", spec, 103)
    xp = rng.normal(size=(3, 9, 9, 103)).astype(np.float32)
    variables = jax.device_get(
        model.init(jax.random.key(6), jnp.asarray(xp), train=False))
    params, stats = _randomize_bn(variables["params"],
                                  variables["batch_stats"], rng)
    want = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(xp),
        train=False))

    net = TorchFDSSC(103, 9)
    net.load_flax(params, stats)
    net.eval()
    with torch.no_grad():
        got = net(_t(xp).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# --------------------------------------------------------------------- #
# MSViT (multi-scale dual-attention ViT, conpared_models.py:1078-1512)
# --------------------------------------------------------------------- #


def _expected_msvit(ncls=9, ch=30, dim=64, heads=4, dim_head=64,
                    image=8, patch_sizes=(2, 4)):
    """Forward-participating params only (the reference also carries a
    dead cls_token per SubNet and never-used spatial/spectral BatchNorms
    inside Attention, conpared_models.py:1404-1408,1460; its fusion
    `weight` is a plain ones tensor — ours is the learnable equivalent,
    +len(patch_sizes) params)."""
    inner = heads * dim_head
    ourfe = 3 * (_linear(ch, ch) + 2 * ch) \
        + (ch * 3 * ch * 9 + ch) + 2 * ch
    conv4 = _linear(dim, ch)
    ff = ((9 * dim + dim) + (_linear(256, dim))        # dw depth+point
          + 2 * 256                                    # bn
          + _linear(512, 256) + _linear(dim, 512))     # pw1, pw2
    per_tr = (dim * inner * 3                          # to_qkv (no bias)
              + (9 * heads * heads + heads)            # spatial_conv
              + 10                                     # spectral_conv
              + _linear(dim, inner)                    # to_out
              + 4 * dim                                # ln_attn + ln_ff
              + ff)
    total = ourfe + conv4 + len(patch_sizes)           # + branch_weight
    for ps in patch_sizes:
        n = (int((image - ps) / ps) + 1) ** 2
        total += (ps * ps * dim + dim                  # depthwise embed
                  + (n + 1) * dim                      # pos_embedding
                  + per_tr
                  + n * 3 * n                          # to_qkv_spec
                  + 2 * n * dim + _linear(ncls, n * dim))  # head LN+Dense
    return total


def test_msvit_param_count_pins_topology():
    spec = get_dataset(1)
    model, _ = build_model("msvit", spec, 30)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 30)),
                           train=False)
    assert _count(variables["params"]) == _expected_msvit()


def _conv2d_w(flax_kernel):
    """flax (kh, kw, Cin_per_group, Cout) -> torch (Cout, Cin/g, kh, kw)."""
    return torch.nn.Parameter(_t(flax_kernel).permute(3, 2, 0, 1)
                              .contiguous())


def _load_conv2d(torch_conv, p):
    torch_conv.weight = _conv2d_w(p["kernel"])
    torch_conv.bias = torch.nn.Parameter(_t(p["bias"]))


def _load_bn2d(torch_bn, p, s):
    _load_bn(torch_bn, p, s)


def _load_lin(dst, p):
    dst.weight = torch.nn.Parameter(_t(p["kernel"]).T.contiguous())
    if "bias" in p:
        dst.bias = torch.nn.Parameter(_t(p["bias"]))


class TorchMSViT(torch.nn.Module):
    """Reference multi-branch ViT (conpared_models.py:1470-1512),
    forward-participating layers, depth=1, uniform (softmaxed-ones)
    branch fusion.  Input (B, ch, 8, 8)."""

    def __init__(self, ncls=9, ch=30, dim=64, heads=4, dim_head=64,
                 image=8, patch_sizes=(2, 4)):
        super().__init__()
        self.heads, self.dim_head = heads, dim_head
        self.patch_sizes = patch_sizes
        c2 = torch.nn.Conv2d
        self.c1 = c2(ch, ch, 1)
        self.c2 = c2(ch, ch, 1)
        self.c3 = c2(ch, ch, 1)
        self.out_conv = c2(3 * ch, ch, 3, padding=1)
        for name in ["c1", "c2", "c3", "out"]:
            setattr(self, f"{name}_bn", torch.nn.BatchNorm2d(ch))
        self.conv4 = c2(ch, dim, 1)
        inner = heads * dim_head
        for bi, ps in enumerate(patch_sizes):
            n = (int((image - ps) / ps) + 1) ** 2
            setattr(self, f"embed_{bi}",
                    c2(dim, dim, ps, stride=ps, groups=dim))
            setattr(self, f"pos_{bi}",
                    torch.nn.Parameter(torch.zeros(1, n + 1, dim)))
            setattr(self, f"ln_attn_{bi}", torch.nn.LayerNorm(dim))
            setattr(self, f"to_qkv_{bi}",
                    torch.nn.Linear(dim, inner * 3, bias=False))
            setattr(self, f"spatial_conv_{bi}",
                    c2(heads, heads, 3, padding=1))
            setattr(self, f"to_out_{bi}", torch.nn.Linear(inner, dim))
            setattr(self, f"to_qkv_spec_{bi}",
                    torch.nn.Linear(n, 3 * n, bias=False))
            setattr(self, f"spectral_conv_{bi}", c2(1, 1, 3, padding=1))
            setattr(self, f"ln_ff_{bi}", torch.nn.LayerNorm(dim))
            setattr(self, f"dw_{bi}", c2(dim, dim, 3, padding=1,
                                         groups=dim))
            setattr(self, f"dwp_{bi}", c2(dim, 256, 1))
            setattr(self, f"ffbn_{bi}", torch.nn.BatchNorm2d(256))
            setattr(self, f"pw1_{bi}", c2(256, 512, 1))
            setattr(self, f"pw2_{bi}", c2(512, dim, 1))
            setattr(self, f"head_ln_{bi}", torch.nn.LayerNorm(n * dim))
            setattr(self, f"head_{bi}", torch.nn.Linear(n * dim, ncls))

    def load_flax(self, p, s):
        fe_p, fe_s = p["ournet"], s["ournet"]
        for name in ["c1", "c2", "c3"]:
            _load_conv2d(getattr(self, name), fe_p[f"{name}_conv"])
            _load_bn2d(getattr(self, f"{name}_bn"), fe_p[f"{name}_bn"],
                       fe_s[f"{name}_bn"])
        _load_conv2d(self.out_conv, fe_p["out_conv"])
        _load_bn2d(self.out_bn, fe_p["out_bn"], fe_s["out_bn"])
        _load_conv2d(self.conv4, p["conv4"])
        for bi in range(len(self.patch_sizes)):
            tr_p = p[f"transformer_{bi}"]
            tr_s = s[f"transformer_{bi}"]
            _load_conv2d(getattr(self, f"embed_{bi}"),
                         p[f"embed_{bi}"]["depth_conv"])
            setattr(self, f"pos_{bi}",
                    torch.nn.Parameter(_t(p[f"pos_embedding_{bi}"])))
            for ln in [f"ln_attn_", f"ln_ff_"]:
                layer = getattr(self, f"{ln}{bi}")
                layer.weight = torch.nn.Parameter(
                    _t(tr_p[f"{ln}0"]["scale"]))
                layer.bias = torch.nn.Parameter(_t(tr_p[f"{ln}0"]["bias"]))
            at = tr_p["attn_0"]
            _load_lin(getattr(self, f"to_qkv_{bi}"), at["to_qkv"])
            _load_conv2d(getattr(self, f"spatial_conv_{bi}"),
                         at["spatial_conv"])
            _load_lin(getattr(self, f"to_out_{bi}"), at["to_out"])
            _load_lin(getattr(self, f"to_qkv_spec_{bi}"),
                      at["to_qkv_spec"])
            _load_conv2d(getattr(self, f"spectral_conv_{bi}"),
                         at["spectral_conv"])
            ff = tr_p["ff_0"]
            _load_conv2d(getattr(self, f"dw_{bi}"),
                         ff["dw"]["depth_conv"])
            _load_conv2d(getattr(self, f"dwp_{bi}"), ff["dw"]["point_conv"])
            _load_bn2d(getattr(self, f"ffbn_{bi}"), ff["bn"],
                       tr_s["ff_0"]["bn"])
            _load_conv2d(getattr(self, f"pw1_{bi}"), ff["pw1"])
            _load_conv2d(getattr(self, f"pw2_{bi}"), ff["pw2"])
            hl = getattr(self, f"head_ln_{bi}")
            hl.weight = torch.nn.Parameter(_t(p[f"LayerNorm_{bi}"]["scale"]))
            hl.bias = torch.nn.Parameter(_t(p[f"LayerNorm_{bi}"]["bias"]))
            _load_lin(getattr(self, f"head_{bi}"), p[f"Dense_{bi}"])

    def _attention(self, x, bi):
        from einops import rearrange

        b, n, d = x.shape
        qkv = getattr(self, f"to_qkv_{bi}")(x).chunk(3, dim=-1)
        q, k, v = map(lambda t: rearrange(t, "b n (h d) -> b h n d",
                                          h=self.heads), qkv)
        dots = torch.matmul(q, k.transpose(-1, -2)) * self.dim_head ** -0.5
        attn = torch.softmax(dots, dim=-1)
        attn = getattr(self, f"spatial_conv_{bi}")(attn)
        out = torch.matmul(attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        output = getattr(self, f"to_out_{bi}")(out)

        xt = x.transpose(-2, -1)
        qs, ks, _ = getattr(self, f"to_qkv_spec_{bi}")(xt).chunk(3, dim=-1)
        dots_s = torch.matmul(qs, ks.transpose(-1, -2)) \
            * self.dim_head ** -0.5
        attn_s = torch.softmax(dots_s, dim=-1)[:, None]
        attn_s = getattr(self, f"spectral_conv_{bi}")(attn_s).squeeze(1)
        return torch.matmul(output, attn_s)

    def _ff(self, x, bi):
        from einops import rearrange

        b, n, c = x.shape
        w = int(np.sqrt(n))
        h = rearrange(x, "b (w h) c -> b c w h", w=w, h=w)
        h = getattr(self, f"dwp_{bi}")(getattr(self, f"dw_{bi}")(h))
        h = getattr(self, f"ffbn_{bi}")(h)
        h = F.gelu(getattr(self, f"pw1_{bi}")(h))
        h = F.gelu(getattr(self, f"pw2_{bi}")(h))
        return x + rearrange(h, "b c w h -> b (w h) c")

    def forward(self, img):
        from einops import rearrange

        img = F.relu(self.c1_bn(self.c1(img)))
        out2 = F.relu(self.c2_bn(self.c2(img)))
        out3 = F.relu(self.c3_bn(self.c3(out2)))
        img = F.relu(self.out_bn(self.out_conv(
            torch.cat([img, out2, out3], 1))))
        img = F.avg_pool2d(img, 3, stride=1, padding=1,
                           count_include_pad=True)
        img = self.conv4(img)

        logits = []
        for bi in range(len(self.patch_sizes)):
            emb = getattr(self, f"embed_{bi}")(img)
            tokens = rearrange(emb, "b c w h -> b (h w) c")
            n = tokens.shape[1]
            tokens = tokens + getattr(self, f"pos_{bi}")[:, :n]
            x = self._attention(getattr(self, f"ln_attn_{bi}")(tokens),
                                bi) + tokens
            x = self._ff(getattr(self, f"ln_ff_{bi}")(x), bi) + x
            flat = x.flatten(start_dim=1)
            logits.append(getattr(self, f"head_{bi}")(
                getattr(self, f"head_ln_{bi}")(flat)))
        w = torch.softmax(torch.ones(len(logits)), 0)
        return sum(wi * lg for wi, lg in zip(w, logits))


def test_msvit_forward_matches_torch(rng):
    spec = get_dataset(1)
    model, _ = build_model("msvit", spec, 30)
    xp = rng.normal(size=(3, 8, 8, 30)).astype(np.float32)
    variables = jax.device_get(
        model.init(jax.random.key(9), jnp.asarray(xp), train=False))
    params, stats = _randomize_bn(variables["params"],
                                  variables["batch_stats"], rng)
    # zero-init pos embeddings / convs leave subgraphs invisible —
    # randomise the leaf params that flax initialises to zeros
    for bi in range(2):
        params[f"pos_embedding_{bi}"] = rng.normal(
            0, 0.3, params[f"pos_embedding_{bi}"].shape).astype("f")
    want = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(xp),
        train=False))

    net = TorchMSViT()
    net.load_flax(params, stats)
    net.eval()
    with torch.no_grad():
        got = net(_t(xp).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# --------------------------------------------------------------------- #
# BaseNet1 / zoo BaseNet2 transplants (conpared_models.py:192-247,
# :391-458).  No BN; the flax models flatten conv maps (H, W, C) — the
# transplants permute before .view to compare the same function.
# --------------------------------------------------------------------- #


class _TorchDualStem(torch.nn.Module):
    def __init__(self, n_pc):
        super().__init__()
        self.conv0 = torch.nn.Conv2d(n_pc, 64, 1)
        self.conv1 = torch.nn.Conv2d(64, 64, 3, padding=1)
        self.conv2 = torch.nn.Conv2d(64, 64, 3, padding=1)
        self.feat_spe = torch.nn.Linear(103, 1024)

    def load_stem(self, p):
        for name in ["conv0", "conv1", "conv2"]:
            _load_conv2d(getattr(self, name), p[name])
        _load_lin(self.feat_spe, p["feat_spe"])

    def stem(self, x, y):
        x = self.conv0(x)
        x = F.avg_pool2d(F.relu(self.conv1(x) + x), 2)
        x = F.avg_pool2d(F.relu(self.conv2(x) + x), 2)
        x = x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)
        return x, F.relu(self.feat_spe(y))


class TorchBaseNet1(_TorchDualStem):
    def __init__(self):
        super().__init__(5)
        self.feat_ss = torch.nn.Linear(2048, 256)
        self.classifier = torch.nn.Linear(256, 9)

    def load_flax(self, p):
        self.load_stem(p)
        _load_lin(self.feat_ss, p["feat_ss"])
        _load_lin(self.classifier, p["classifier"])

    def forward(self, x, y):
        x, y = self.stem(x, y)
        x_re = self.feat_ss(torch.cat([x, y], 1))
        return self.classifier(F.relu(x_re)), x_re


class TorchBaseNet2Zoo(_TorchDualStem):
    def __init__(self):
        super().__init__(60)
        self.feat_ss = torch.nn.Linear(1024, 256)
        self.feat_ss2 = torch.nn.Linear(256, 64)
        self.classifier = torch.nn.Linear(2624, 9)

    def load_flax(self, p):
        self.load_stem(p)
        for name in ["feat_ss", "feat_ss2", "classifier"]:
            _load_lin(getattr(self, name), p[name])

    def forward(self, x, y):
        x, y = self.stem(x, y)
        z = torch.cat([x, y], 1)
        f = self.feat_ss2(F.relu(self.feat_ss(y)))
        f = f / f.pow(2).sum(1, keepdim=True).sqrt()
        return self.classifier(z), f


@pytest.mark.parametrize("name,w,n_pc,torch_cls", [
    ("basenet1", 16, 5, TorchBaseNet1),
    ("basenet2_zoo", 20, 60, TorchBaseNet2Zoo),
])
def test_dual_branch_zoo_matches_torch(name, w, n_pc, torch_cls, rng):
    spec = get_dataset(1)
    model, _ = build_model(name, spec, n_pc)
    xp = rng.normal(size=(3, w, w, n_pc)).astype(np.float32)
    x = rng.normal(size=(3, 103)).astype(np.float32)
    variables = model.init(jax.random.key(11), jnp.asarray(xp),
                           jnp.asarray(x), train=False)
    want_l, want_f = model.apply(variables, jnp.asarray(xp),
                                 jnp.asarray(x), train=False)

    net = torch_cls()
    net.load_flax(jax.device_get(variables["params"]))
    net.eval()
    with torch.no_grad():
        got_l, got_f = net(_t(xp).permute(0, 3, 1, 2), _t(x))
    np.testing.assert_allclose(got_l.numpy(), np.asarray(want_l),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_f.numpy(), np.asarray(want_f),
                               rtol=1e-4, atol=1e-5)
