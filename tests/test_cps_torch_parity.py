"""Whole-step CPS parity against a torch oracle (trian_CPS.py:181-250):
CE + 0.1 x hard-pseudo-label cross supervision, both Adam updates."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from cmlpl_tpu.data.patches import gather_patches
from cmlpl_tpu.train import CMLPLConfig, CPSTrainer
from tests.test_full_step_torch_parity import TorchBaseNet2


def test_cps_full_step_matches_torch_oracle(tiny_scene, tiny_splits):
    scene = tiny_scene
    cfg = CMLPLConfig(num_classes=9, num_features=103, n_pc=scene.n_pc,
                      patch_size=scene.patch_size, labeled_batch=8,
                      unlabeled_batch=8, num_unlabel=32, num_epochs=1,
                      noise=0.0, dropout=0.0)
    trainer = CPSTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))

    nets, opts = [], []
    for params in [state.net_b.params, state.net_e.params]:
        net = TorchBaseNet2(scene.n_pc, 103, 9)
        net.load_flax(jax.device_get(params))
        nets.append(net)
        opts.append(torch.optim.Adam(net.parameters(), lr=cfg.lr))

    li = tiny_splits.train[:8].astype(np.int32)
    ly = (scene.labels[li] - 1).astype(np.int32)
    ui = tiny_splits.unlabeled[:8].astype(np.int32)
    xp_l = np.asarray(gather_patches(scene.padded_pca, jnp.asarray(li),
                                     cols=scene.cols, w=scene.patch_size))
    xp_u = np.asarray(gather_patches(scene.padded_pca, jnp.asarray(ui),
                                     cols=scene.cols, w=scene.patch_size))
    x_l = np.asarray(scene.spectra)[li]
    x_u = np.asarray(scene.spectra)[ui]

    # torch oracle step (trian_CPS.py:234-250)
    xp_all = torch.tensor(np.concatenate([xp_l, xp_u]).transpose(0, 3, 1, 2))
    x_all = torch.tensor(np.concatenate([x_l, x_u]))
    y = torch.tensor(ly.astype(np.int64))
    for o in opts:
        o.zero_grad()
    logits_b, _ = nets[0](xp_all, x_all)
    logits_e, _ = nets[1](xp_all, x_all)
    lab_b, un_b = logits_b[:8], logits_b[8:]
    lab_e, un_e = logits_e[:8], logits_e[8:]
    cls_b = F.cross_entropy(lab_b, y)
    cls_e = F.cross_entropy(lab_e, y)
    cross_b = F.cross_entropy(un_b, un_e.argmax(1).detach())
    cross_e = F.cross_entropy(un_e, un_b.argmax(1).detach())
    total_b = cls_b + 0.1 * cross_b
    total_b.backward(retain_graph=True)
    opts[0].step()
    total_e = cls_e + 0.1 * cross_e
    total_e.backward()
    opts[1].step()

    new_state, got = trainer.train_step(state, scene, li, ly, ui)
    np.testing.assert_allclose(float(got["cls_loss"]), cls_b.item(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(got["con_loss"]), cross_b.item(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(got["total_loss"]), total_b.item(),
                               rtol=2e-3, atol=2e-4)

    params = jax.device_get(new_state.net_b.params)
    np.testing.assert_allclose(
        np.asarray(params["feat_spe"]["kernel"]).T,
        nets[0].feat_spe.weight.detach().numpy(), rtol=5e-3, atol=5e-4)
