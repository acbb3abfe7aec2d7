"""Whole-RUN CMLPL parity: the single fused multi-epoch dispatch vs the
torch oracle replayed step by step.

tests/test_full_step_torch_parity.py pins two individual steps; this pins
the ENTIRE ``train_run`` scan — 3 epochs x 4 steps in ONE XLA dispatch —
against the reference's exact loop (train.py:146-272 via the same torch
oracle), covering what only a multi-epoch run exercises:

- the per-epoch adaptive-threshold decay (train.py:147-148),
- the cold->warm queue transition INSIDE epoch 0 (batch > queue_batch)
  and the always-warm later epochs (train.py:212),
- queue pointer wraparound (12 steps x 16 rows > queue_size 80),
- cross-step/epoch state threading through the nested lax.scan.

Noise/dropout are disabled so both sides see identical inputs; every
step's loss terms and the final Adam-updated parameters must agree.
"""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # multi-minute transplant oracle (VERDICT r3 item 5)
import jax.numpy as jnp
import torch

from cmlpl_tpu.data import SemiSupervisedSampler
from cmlpl_tpu.data.patches import gather_patches
from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer
from cmlpl_tpu.train.driver import stack_schedule

from test_full_step_torch_parity import TorchBaseNet2, torch_reference_step


def test_cmlpl_whole_run_matches_torch_oracle(tiny_scene, tiny_splits):
    scene = tiny_scene
    cfg = CMLPLConfig(num_classes=9, num_features=103, n_pc=scene.n_pc,
                      patch_size=scene.patch_size, labeled_batch=8,
                      unlabeled_batch=8, num_unlabel=32, num_epochs=3,
                      noise=0.0, dropout=0.0, thr=1.0, queue_batch=1)
    trainer = CMLPLTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))

    # two identical samplers: one consumed by train_run's schedule
    # pre-draw, one replayed for the torch oracle
    sam_a = SemiSupervisedSampler(tiny_splits, scene.labels, 8, 8,
                                  num_unlabel=32, seed=1088)
    sam_b = SemiSupervisedSampler(tiny_splits, scene.labels, 8, 8,
                                  num_unlabel=32, seed=1088)
    li, ly, ui = stack_schedule(sam_a, cfg.num_epochs)
    n_epochs, n_batches = li.shape[:2]
    assert (n_epochs, n_batches) == (3, 4)

    # ---- torch replay ------------------------------------------------ #
    nets, opts = [], []
    for params in [state.net_b.params, state.net_e.params]:
        net = TorchBaseNet2(scene.n_pc, 103, 9)
        net.load_flax(jax.device_get(params))
        nets.append(net)
        opts.append(torch.optim.Adam(net.parameters(), lr=cfg.lr))
    queues = tuple(
        (torch.zeros(cfg.queue_size, 1024), torch.zeros(cfg.queue_size, 9),
         0) for _ in range(2))

    def host_batch(idx_l, y_l, idx_u):
        xp_l = np.asarray(gather_patches(
            scene.padded_pca, jnp.asarray(idx_l), cols=scene.cols,
            w=scene.patch_size))
        xp_u = np.asarray(gather_patches(
            scene.padded_pca, jnp.asarray(idx_u), cols=scene.cols,
            w=scene.patch_size))
        x_l = np.asarray(scene.spectra)[idx_l]
        x_u = np.asarray(scene.spectra)[idx_u]
        return (xp_l.transpose(0, 3, 1, 2), x_l, y_l.astype(np.int64),
                xp_u.transpose(0, 3, 1, 2), x_u)

    want = []
    ptrs = [0, 0]
    for e, (le, ye, ue) in enumerate(zip(li, ly, ui)):
        adap = float(np.exp(-0.5 * (e / cfg.num_epochs) ** 2)) * cfg.thr
        for b, (idx_l, y_l, idx_u) in enumerate(zip(le, ye, ue)):
            warm = bool(e > 0 or b > cfg.queue_batch)
            metrics, new_ptr = torch_reference_step(
                nets, opts, ((queues[0][0], queues[0][1], ptrs[0]),
                             (queues[1][0], queues[1][1], ptrs[1])),
                host_batch(idx_l, y_l, idx_u), cfg, warm, adap)
            ptrs = [new_ptr, new_ptr]
            want.append(metrics)

    # ---- ONE fused dispatch ------------------------------------------ #
    state, got = trainer.train_run(state, scene, sam_b)
    got = {k: np.asarray(v).reshape(n_epochs * n_batches)
           for k, v in got.items()}

    for step_i, metrics in enumerate(want):
        for key in ["cls_loss", "con_loss", "loss_contrast", "total_loss"]:
            np.testing.assert_allclose(
                got[key][step_i], metrics[key], rtol=5e-3, atol=5e-4,
                err_msg=f"step {step_i} {key}")

    # final parameters agree after 12 Adam steps on both nets
    for name, net in [("net_b", nets[0]), ("net_e", nets[1])]:
        params = jax.device_get(getattr(state, name).params)
        np.testing.assert_allclose(
            np.asarray(params["feat_spe"]["kernel"]).T,
            net.feat_spe.weight.detach().numpy(), rtol=1e-2, atol=1e-3,
            err_msg=f"{name} feat_spe")
        np.testing.assert_allclose(
            np.asarray(params["classifier"]["bias"]),
            net.classifier.bias.detach().numpy(), rtol=1e-2, atol=1e-3,
            err_msg=f"{name} classifier bias")


def _host_batch(scene, idx_l, y_l, idx_u):
    xp_l = np.asarray(gather_patches(scene.padded_pca, jnp.asarray(idx_l),
                                     cols=scene.cols, w=scene.patch_size))
    xp_u = np.asarray(gather_patches(scene.padded_pca, jnp.asarray(idx_u),
                                     cols=scene.cols, w=scene.patch_size))
    return (xp_l.transpose(0, 3, 1, 2), np.asarray(scene.spectra)[idx_l],
            y_l.astype(np.int64), xp_u.transpose(0, 3, 1, 2),
            np.asarray(scene.spectra)[idx_u])


def test_cps_whole_run_matches_torch_oracle(tiny_scene, tiny_splits):
    """CPS: one fused 2-epoch dispatch vs trian_CPS.py:181-250 replayed."""
    import torch.nn.functional as F

    from cmlpl_tpu.train import CPSTrainer

    scene = tiny_scene
    cfg = CMLPLConfig(num_classes=9, num_features=103, n_pc=scene.n_pc,
                      patch_size=scene.patch_size, labeled_batch=8,
                      unlabeled_batch=8, num_unlabel=32, num_epochs=2,
                      noise=0.0, dropout=0.0)
    trainer = CPSTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))

    nets, opts = [], []
    for params in [state.net_b.params, state.net_e.params]:
        net = TorchBaseNet2(scene.n_pc, 103, 9)
        net.load_flax(jax.device_get(params))
        nets.append(net)
        opts.append(torch.optim.Adam(net.parameters(), lr=cfg.lr))

    sam_a = SemiSupervisedSampler(tiny_splits, scene.labels, 8, 8,
                                  num_unlabel=32, seed=1088)
    sam_b = SemiSupervisedSampler(tiny_splits, scene.labels, 8, 8,
                                  num_unlabel=32, seed=1088)
    li, ly, ui = stack_schedule(sam_a, cfg.num_epochs)

    want = []
    for le, ye, ue in zip(li, ly, ui):
        for idx_l, y_l, idx_u in zip(le, ye, ue):
            xp_l, x_l, y, xp_u, x_u = [
                torch.tensor(a) for a in _host_batch(scene, idx_l, y_l,
                                                     idx_u)]
            for o in opts:
                o.zero_grad()
            logits_b, _ = nets[0](torch.cat([xp_l, xp_u]),
                                  torch.cat([x_l, x_u]))
            logits_e, _ = nets[1](torch.cat([xp_l, xp_u]),
                                  torch.cat([x_l, x_u]))
            cls_b = F.cross_entropy(logits_b[:8], y)
            cls_e = F.cross_entropy(logits_e[:8], y)
            cross_b = F.cross_entropy(logits_b[8:],
                                      logits_e[8:].argmax(1).detach())
            cross_e = F.cross_entropy(logits_e[8:],
                                      logits_b[8:].argmax(1).detach())
            total_b = cls_b + 0.1 * cross_b
            total_b.backward(retain_graph=True)
            opts[0].step()
            (cls_e + 0.1 * cross_e).backward()
            opts[1].step()
            want.append({"cls_loss": cls_b.item(),
                         "con_loss": cross_b.item(),
                         "total_loss": total_b.item()})

    state, got = trainer.train_run(state, scene, sam_b)
    got = {k: np.asarray(v).reshape(len(want)) for k, v in got.items()}
    for i, m in enumerate(want):
        for key in m:
            np.testing.assert_allclose(got[key][i], m[key], rtol=5e-3,
                                       atol=5e-4,
                                       err_msg=f"step {i} {key}")
    params = jax.device_get(state.net_b.params)
    np.testing.assert_allclose(
        np.asarray(params["feat_spe"]["kernel"]).T,
        nets[0].feat_spe.weight.detach().numpy(), rtol=1e-2, atol=1e-3)


def test_cct_whole_run_matches_torch_oracle(tiny_scene, tiny_splits):
    """CCT: one fused 2-epoch dispatch vs trian_CCT.py:170-223 replayed
    (incl. the two overlapping Adam optimisers, both stepped per step)."""
    from cmlpl_tpu.train import CCTTrainer
    from test_cct_torch_parity import (TorchCCTNet,
                                       torch_reference_step as cct_step)

    scene = tiny_scene
    cfg = CMLPLConfig(num_classes=9, num_features=103, n_pc=scene.n_pc,
                      patch_size=scene.patch_size, labeled_batch=8,
                      unlabeled_batch=8, num_unlabel=32, num_epochs=2,
                      noise=0.0, dropout=0.0)
    trainer = CCTTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))

    params0 = jax.device_get(state.params)
    enc = TorchCCTNet(scene.n_pc, 103)
    enc.load_flax(params0["encoder"])
    heads = []
    for key in ["dec_base", "dec1", "dec2"]:
        h = torch.nn.Linear(2624, 9)
        h.weight = torch.nn.Parameter(torch.tensor(
            np.asarray(params0[key]["fc"]["kernel"]).T))
        h.bias = torch.nn.Parameter(torch.tensor(
            np.asarray(params0[key]["fc"]["bias"])))
        heads.append(h)
    opt_base = torch.optim.Adam(
        list(enc.parameters()) + list(heads[0].parameters()), lr=cfg.lr)
    opt_aug = torch.optim.Adam(
        list(enc.parameters()) + list(heads[1].parameters())
        + list(heads[2].parameters()), lr=cfg.lr)

    sam_a = SemiSupervisedSampler(tiny_splits, scene.labels, 8, 8,
                                  num_unlabel=32, seed=1088)
    sam_b = SemiSupervisedSampler(tiny_splits, scene.labels, 8, 8,
                                  num_unlabel=32, seed=1088)
    li, ly, ui = stack_schedule(sam_a, cfg.num_epochs)

    want = []
    for le, ye, ue in zip(li, ly, ui):
        for idx_l, y_l, idx_u in zip(le, ye, ue):
            want.append(cct_step(enc, heads, opt_base, opt_aug,
                                 _host_batch(scene, idx_l, y_l, idx_u)))

    state, got = trainer.train_run(state, scene, sam_b)
    got = {k: np.asarray(v).reshape(len(want)) for k, v in got.items()}
    for i, m in enumerate(want):
        for key in ["cls_loss", "total_loss"]:
            np.testing.assert_allclose(got[key][i], m[key], rtol=5e-3,
                                       atol=5e-4,
                                       err_msg=f"step {i} {key}")
    params = jax.device_get(state.params)
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["feat_spe"]["kernel"]).T,
        enc.feat_spe.weight.detach().numpy(), rtol=1e-2, atol=1e-3)
