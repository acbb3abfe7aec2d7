"""Whole-step CCT parity against a torch oracle (trian_CCT.py:170-244).

Transplants CCTNet + the three linear heads into torch, runs the
reference's exact step — CE + 4-way softmax JS consistency, ONE backward,
TWO Adam steps over overlapping encoder parameter sets
(trian_CCT.py:161-162, :221-223; the encoder receives both moment-state
updates) — and compares losses AND updated params over two steps, so the
second step exercises accumulated Adam moments through the double update.
"""

import numpy as np
import jax
import torch
import torch.nn.functional as F

from cmlpl_tpu.data.patches import gather_patches
from cmlpl_tpu.train import CMLPLConfig, CCTTrainer


class TorchCCTNet(torch.nn.Module):
    """The reference CCT_Net stem (models.py:229-287) returning the 2624-d
    joint feature.  The reference's feat_ss + decoder branch is computed
    and discarded (models.py:285) — its params get grad None, so torch
    Adam skips them; omitted here (matches CCTNet(with_decoder=False))."""

    def __init__(self, n_pc, bands):
        super().__init__()
        self.conv0 = torch.nn.Conv2d(n_pc, 64, 1)
        self.conv1 = torch.nn.Conv2d(64, 64, 3, padding=1)
        self.conv2 = torch.nn.Conv2d(64, 64, 3, padding=1)
        self.feat_spe = torch.nn.Linear(bands, 1024)

    def load_flax(self, params):
        for name in ["conv0", "conv1", "conv2"]:
            layer = getattr(self, name)
            k = np.asarray(params[name]["kernel"])
            layer.weight = torch.nn.Parameter(
                torch.tensor(k.transpose(3, 2, 0, 1)))
            layer.bias = torch.nn.Parameter(
                torch.tensor(np.asarray(params[name]["bias"])))
        self.feat_spe.weight = torch.nn.Parameter(torch.tensor(
            np.asarray(params["feat_spe"]["kernel"]).T))
        self.feat_spe.bias = torch.nn.Parameter(torch.tensor(
            np.asarray(params["feat_spe"]["bias"])))

    def forward(self, xp_nchw, x):
        t = self.conv0(xp_nchw)
        res = t
        t = F.relu(self.conv1(t) + res)
        t = F.avg_pool2d(t, 2, 2)
        res = t
        t = F.relu(self.conv2(t) + res)
        t = F.avg_pool2d(t, 2, 2)
        # match the flax (H, W, C) flatten order
        t = t.permute(0, 2, 3, 1).reshape(t.shape[0], -1)
        y = F.relu(self.feat_spe(x))
        return torch.cat([t, y], 1)


def torch_js_loss(inputs, targets, epsilon=1e-5):
    """trian_CCT.py:76-84 verbatim."""
    m = (F.softmax(inputs, dim=1) + targets) * 0.5
    kl1 = F.kl_div(F.log_softmax(inputs, dim=1), m, reduction="mean")
    kl2 = F.kl_div(torch.log(targets + epsilon), m, reduction="mean")
    return (kl1 + kl2) * 0.5


def torch_reference_step(enc, heads, opt_base, opt_aug, batch):
    """trian_CCT.py:170-223 with noise off: one backward, two Adam steps."""
    dec_base, dec1, dec2 = heads
    xp_l, x_l, y, xp_u, x_u = [torch.tensor(a) for a in batch]
    bt = xp_l.shape[0]

    opt_base.zero_grad()
    opt_aug.zero_grad()
    fea_all = enc(torch.cat([xp_l, xp_u]), torch.cat([x_l, x_u]))
    fea_lab, fea_un = fea_all[:bt], fea_all[bt:]

    lab_out = dec_base(fea_lab)
    cls = F.cross_entropy(lab_out, y)

    origin_out = dec_base(fea_un)
    aug_out1 = dec1(fea_un)   # feature noise disabled (noise=0)
    aug_out2 = dec2(fea_un)
    ori_t = F.softmax(origin_out.detach(), dim=1)
    t1 = F.softmax(aug_out1.detach(), dim=1)
    t2 = F.softmax(aug_out2.detach(), dim=1)

    total = (cls + torch_js_loss(origin_out, t1)
             + torch_js_loss(origin_out, t2)
             + torch_js_loss(aug_out1, ori_t)
             + torch_js_loss(aug_out2, ori_t))
    total.backward()
    opt_base.step()
    opt_aug.step()
    return {"cls_loss": cls.item(), "total_loss": total.item()}


def test_cct_full_step_matches_torch_oracle(tiny_scene, tiny_splits):
    scene = tiny_scene
    cfg = CMLPLConfig(num_classes=9, num_features=103, n_pc=scene.n_pc,
                      patch_size=scene.patch_size, labeled_batch=8,
                      unlabeled_batch=8, num_unlabel=32, num_epochs=2,
                      noise=0.0, dropout=0.0)
    trainer = CCTTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))

    params = jax.device_get(state.params)
    enc = TorchCCTNet(scene.n_pc, 103)
    enc.load_flax(params["encoder"])
    heads = []
    for key in ["dec_base", "dec1", "dec2"]:
        h = torch.nn.Linear(2624, 9)
        h.weight = torch.nn.Parameter(torch.tensor(
            np.asarray(params[key]["fc"]["kernel"]).T))
        h.bias = torch.nn.Parameter(torch.tensor(
            np.asarray(params[key]["fc"]["bias"])))
        heads.append(h)
    # trian_CCT.py:161-162: overlapping param sets, one Adam each
    opt_base = torch.optim.Adam(
        list(enc.parameters()) + list(heads[0].parameters()), lr=cfg.lr)
    opt_aug = torch.optim.Adam(
        list(enc.parameters()) + list(heads[1].parameters())
        + list(heads[2].parameters()), lr=cfg.lr)

    li = tiny_splits.train[:8].astype(np.int32)
    ly = (scene.labels[li] - 1).astype(np.int32)
    ui = tiny_splits.unlabeled[:8].astype(np.int32)
    xp_l = np.asarray(gather_patches(scene.padded_pca, li,
                                     cols=scene.cols, w=scene.patch_size))
    xp_u = np.asarray(gather_patches(scene.padded_pca, ui,
                                     cols=scene.cols, w=scene.patch_size))
    x_l = np.asarray(scene.spectra)[li]
    x_u = np.asarray(scene.spectra)[ui]
    batch = (xp_l.transpose(0, 3, 1, 2), x_l, ly.astype(np.int64),
             xp_u.transpose(0, 3, 1, 2), x_u)

    for step_i in range(2):
        want = torch_reference_step(enc, heads, opt_base, opt_aug, batch)
        state, got = trainer.train_step(state, scene, li, ly, ui)
        for k in ["cls_loss", "total_loss"]:
            np.testing.assert_allclose(
                float(got[k]), want[k], rtol=2e-3, atol=2e-4,
                err_msg=f"step {step_i} {k}")

    # updated params agree after two steps: the encoder saw FOUR Adam
    # updates (two per step), each head two
    new = jax.device_get(state.params)
    np.testing.assert_allclose(
        np.asarray(new["encoder"]["feat_spe"]["kernel"]).T,
        enc.feat_spe.weight.detach().numpy(), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(new["encoder"]["conv1"]["bias"]),
        enc.conv1.bias.detach().numpy(), rtol=5e-3, atol=5e-4)
    for key, h in zip(["dec_base", "dec1", "dec2"], heads):
        np.testing.assert_allclose(
            np.asarray(new[key]["fc"]["kernel"]).T,
            h.weight.detach().numpy(), rtol=5e-3, atol=5e-4,
            err_msg=key)
        np.testing.assert_allclose(
            np.asarray(new[key]["fc"]["bias"]),
            h.bias.detach().numpy(), rtol=5e-3, atol=5e-4, err_msg=key)
