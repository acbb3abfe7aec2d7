"""Whole-step CMLPL parity against a torch oracle.

Transplants both networks' weights into torch replicas, feeds the SAME
noised inputs (noise/dropout disabled in the jit step by configuration;
the oracle receives the gathered arrays), runs the reference's exact
step math (train.py:146-272) including both Adam updates, and compares
loss terms AND updated parameters.  Two steps are taken so the second
exercises the warm path (queue memory smoothing).

This is the end-to-end numerical pin for the CMLPL objective: any drift
in the loss composition, gradient flow (detach structure) or optimizer
shows up here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from cmlpl_tpu.data.patches import gather_patches
from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer


class TorchBaseNet2(torch.nn.Module):
    """The reference BaseNet2 topology (models.py:97-152)."""

    def __init__(self, n_pc, bands, ncls):
        super().__init__()
        self.conv0 = torch.nn.Conv2d(n_pc, 64, 1)
        self.conv1 = torch.nn.Conv2d(64, 64, 3, padding=1)
        self.conv2 = torch.nn.Conv2d(64, 64, 3, padding=1)
        self.feat_spe = torch.nn.Linear(bands, 1024)
        self.classifier = torch.nn.Linear(2624, ncls)

    def load_flax(self, params):
        def conv_w(name):
            k = np.asarray(params[name]["kernel"])
            return torch.nn.Parameter(torch.tensor(k.transpose(3, 2, 0, 1)))

        for name in ["conv0", "conv1", "conv2"]:
            layer = getattr(self, name)
            layer.weight = conv_w(name)
            layer.bias = torch.nn.Parameter(
                torch.tensor(np.asarray(params[name]["bias"])))
        for name in ["feat_spe", "classifier"]:
            layer = getattr(self, name)
            layer.weight = torch.nn.Parameter(torch.tensor(
                np.asarray(params[name]["kernel"]).T))
            layer.bias = torch.nn.Parameter(torch.tensor(
                np.asarray(params[name]["bias"])))

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
        z = torch.cat([t, y], 1)
        feat = y / y.pow(2).sum(1, keepdim=True).pow(0.5)
        return self.classifier(z), feat


def torch_reference_step(nets, opts, queues, batch, cfg, warm, adap):
    """train.py:149-272 with noise/dropout off, intended queue pointers."""
    (net_b, net_e) = nets
    (opt_b, opt_e) = opts
    (qw_f, qw_p, qw_ptr), (qs_f, qs_p, qs_ptr) = queues
    xp_l, x_l, y, xp_u, x_u = [torch.tensor(a) for a in batch]
    bt, btu = xp_l.shape[0], xp_u.shape[0]
    n = bt + btu
    T, alpha = cfg.temperature, cfg.alpha

    opt_b.zero_grad()
    opt_e.zero_grad()
    logits_b, feat_b = net_b(torch.cat([xp_l, xp_u]), torch.cat([x_l, x_u]))
    logits_e, feat_e = net_e(torch.cat([xp_l, xp_u]), torch.cat([x_l, x_u]))
    lab_b, un_b = logits_b[:bt], logits_b[bt:]
    flab_b, xs = feat_b[:bt], feat_b[bt:]
    lab_e, un_e = logits_e[:bt], logits_e[bt:]
    flab_e, xw = feat_e[:bt], feat_e[bt:]

    cls_b = F.cross_entropy(lab_b, y)
    cls_e = F.cross_entropy(lab_e, y)

    with torch.no_grad():
        probs = torch.softmax(un_e.detach(), 1)
        probs1 = torch.softmax(un_b.detach(), 1)
        probs_orig, probs_orig1 = probs.clone(), probs1.clone()
        if warm:
            A = torch.exp(xw.detach() @ qw_f.t() / T)
            A = A / A.sum(1, keepdim=True)
            probs = alpha * probs + (1 - alpha) * A @ qw_p
            A1 = torch.exp(xs.detach() @ qs_f.t() / T)
            A1 = A1 / A1.sum(1, keepdim=True)
            probs1 = alpha * probs1 + (1 - alpha) * A1 @ qs_p
        mask = (probs.max(1).values >= adap).float()
        masks = (probs1.max(1).values >= adap).float()
        onehot = torch.zeros(bt, probs.shape[1]).scatter(
            1, y.view(-1, 1), 1)
        feats_w = torch.cat([xw.detach(), flab_b.detach()])
        probs_w = torch.cat([probs_orig, onehot])
        feats_s = torch.cat([xs.detach(), flab_e.detach()])
        probs_s = torch.cat([probs_orig1, onehot])
        size = qw_f.shape[0]
        idx = (qw_ptr + torch.arange(n)) % size
        qw_f[idx], qw_p[idx] = feats_w, probs_w
        qs_f[idx], qs_p[idx] = feats_s, probs_s
        new_ptr = (qw_ptr + n) % size

    con_b = (-(F.log_softmax(un_b, 1) * probs).sum(1) * mask).mean()
    con_e = (-(F.log_softmax(un_e, 1) * probs1).sum(1) * masks).mean()

    q0 = probs1 @ probs.t()
    q0.fill_diagonal_(1)
    qm = q0 * (q0 >= 0.8).float()
    qm = qm / qm.sum(1, keepdim=True)
    qn = (1 - q0) * (q0 <= 0.3).float()
    qn = qn / (qn.sum(1, keepdim=True) + 1e-8)

    sim = torch.exp(xs @ xw.detach().t() / T)
    simp = sim / sim.sum(1, keepdim=True)
    contrast_b = (-(torch.log(simp) * qm).sum(1)).mean() + \
        ((torch.log(simp + 1) * qn).sum(1)).mean()
    sim1 = torch.exp(xs.detach() @ xw.t() / T)
    simp1 = sim1 / sim1.sum(1, keepdim=True)
    contrast_e = (-(torch.log(simp1) * qm).sum(1)).mean() + \
        ((torch.log(simp1 + 1) * qn).sum(1)).mean()

    total_b = cls_b + 0.5 * contrast_b + 4 * con_b
    total_b.backward(retain_graph=True)
    opt_b.step()
    total_e = cls_e + 0.5 * contrast_e + 4 * con_e
    total_e.backward()
    opt_e.step()
    return {"cls_loss": cls_b.item(), "con_loss": con_b.item(),
            "loss_contrast": contrast_b.item(),
            "total_loss": total_b.item()}, new_ptr


def test_cmlpl_full_step_matches_torch_oracle(tiny_scene, tiny_splits,
                                              rng):
    scene = tiny_scene
    cfg = CMLPLConfig(num_classes=9, num_features=103, n_pc=scene.n_pc,
                      patch_size=scene.patch_size, labeled_batch=8,
                      unlabeled_batch=8, num_unlabel=32, num_epochs=2,
                      noise=0.0, dropout=0.0, thr=0.0, queue_batch=0)
    trainer = CMLPLTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))

    # torch replicas with transplanted weights + matching Adam
    nets = []
    opts = []
    for params in [state.net_b.params, state.net_e.params]:
        net = TorchBaseNet2(scene.n_pc, 103, 9)
        net.load_flax(jax.device_get(params))
        nets.append(net)
        opts.append(torch.optim.Adam(net.parameters(), lr=cfg.lr))
    queues = tuple(
        (torch.zeros(cfg.queue_size, 1024), torch.zeros(cfg.queue_size, 9),
         0) for _ in range(2))

    li = tiny_splits.train[:8].astype(np.int32)
    ly = (scene.labels[li] - 1).astype(np.int32)
    ui = tiny_splits.unlabeled[:8].astype(np.int32)

    xp_l = np.asarray(gather_patches(scene.padded_pca, jnp.asarray(li),
                                     cols=scene.cols, w=scene.patch_size))
    xp_u = np.asarray(gather_patches(scene.padded_pca, jnp.asarray(ui),
                                     cols=scene.cols, w=scene.patch_size))
    x_l = np.asarray(scene.spectra)[li]
    x_u = np.asarray(scene.spectra)[ui]
    batch = (xp_l.transpose(0, 3, 1, 2), x_l, ly.astype(np.int64),
             xp_u.transpose(0, 3, 1, 2), x_u)

    ptrs = [0, 0]
    for step_i, (epoch, warm) in enumerate([(0, False), (1, True)]):
        adap = float(np.exp(-0.5 * (epoch / cfg.num_epochs) ** 2)) * cfg.thr
        want, new_ptr = torch_reference_step(
            nets, opts, ((queues[0][0], queues[0][1], ptrs[0]),
                         (queues[1][0], queues[1][1], ptrs[1])),
            batch, cfg, warm, adap)
        ptrs = [new_ptr, new_ptr]
        state, got = trainer.train_step(state, scene, li, ly, ui,
                                        epoch=epoch, batch_index=0)
        for k in ["cls_loss", "con_loss", "loss_contrast", "total_loss"]:
            np.testing.assert_allclose(
                float(got[k]), want[k], rtol=2e-3, atol=2e-4,
                err_msg=f"step {step_i} {k}")

    # parameters agree after two full optimisation steps
    for name, torch_net in [("net_b", nets[0]), ("net_e", nets[1])]:
        params = jax.device_get(getattr(state, name).params)
        np.testing.assert_allclose(
            np.asarray(params["feat_spe"]["kernel"]).T,
            nets[0 if name == "net_b" else 1].feat_spe.weight
            .detach().numpy(),
            rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(params["classifier"]["bias"]),
            torch_net.classifier.bias.detach().numpy(),
            rtol=5e-3, atol=5e-4)
