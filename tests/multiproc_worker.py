"""Subprocess worker for the multi-process (pod-path) test.

Launched twice by tests/test_multiprocess.py with
JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID set and 4
virtual CPU devices per process; joins the 2-process cluster via the
SAME entry point the CLIs' --multihost flag uses
(core.mesh.initialize_multihost), runs one train step of each
semi-supervised algorithm on the GLOBAL 8-device mesh, and prints the
metrics as one JSON line for the parent to compare against the
single-process values.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cmlpl_tpu.core.mesh import create_mesh, initialize_multihost


def main():
    n = initialize_multihost()
    assert n == 2, n
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np

    from cmlpl_tpu.data import (SemiSupervisedSampler, generate_splits,
                                prepare_scene, synthetic_scene)
    from cmlpl_tpu.train import (CCTTrainer, CMLPLConfig, CMLPLTrainer,
                                 CPSTrainer)

    cube, gt = synthetic_scene(0, rows=32, cols=24)
    scene = prepare_scene(0, cube=cube, gt=gt, patch_size=20, n_pc=8)
    splits = generate_splits(scene.labels, num_label=5)
    bs = 16
    cfg = CMLPLConfig(num_classes=9, num_features=103, n_pc=8,
                      patch_size=20, labeled_batch=bs, unlabeled_batch=bs,
                      num_unlabel=64, num_epochs=1)
    mesh = create_mesh()  # all 8 GLOBAL devices across both processes
    sam = SemiSupervisedSampler(splits, scene.labels, bs, bs,
                                num_unlabel=64)
    li, ly, ui = next(iter(sam.epoch()))

    out = {}
    for name, cls, kw in [("cmlpl", CMLPLTrainer,
                           dict(epoch=1, batch_index=0)),
                          ("cps", CPSTrainer, {}),
                          ("cct", CCTTrainer, {})]:
        t = cls(cfg, mesh=mesh, donate=False)
        s = t.init_state(jax.random.key(0))
        _, m = t.train_step(s, scene, li, ly, ui, **kw)
        out[name] = {k: float(np.asarray(jax.device_get(v)))
                     for k, v in m.items()}

    # the production path: the ENTIRE fused train_run over the pod mesh
    from cmlpl_tpu.models.zoo import build_model
    from cmlpl_tpu.registry import get_dataset
    from cmlpl_tpu.train.supervised import SupervisedTrainer

    model, zentry = build_model("basenet2", get_dataset(0), scene.n_pc)
    ts = SupervisedTrainer(model, zentry, patch_size=scene.patch_size,
                           n_pc=scene.n_pc, num_features=103, mesh=mesh,
                           donate=False)
    ss = ts.init_state(jax.random.key(0))
    _, ms = ts.train_step(ss, scene, li, ly)
    out["supervised"] = {k: float(np.asarray(jax.device_get(v))) for k, v in ms.items()}

    t = CMLPLTrainer(cfg, mesh=mesh, donate=False)
    s = t.init_state(jax.random.key(0))
    sam2 = SemiSupervisedSampler(splits, scene.labels, bs, bs,
                                 num_unlabel=64)
    _, mm = t.train_run(s, scene, sam2)
    out["cmlpl_run_last"] = {
        k: float(np.asarray(jax.device_get(v)).ravel()[-1])
        for k, v in mm.items()}

    # pod checkpoint/restore round-trip (orbax coordinates the write;
    # PRNG keys stored as raw key data — utils/checkpoint.py)
    from cmlpl_tpu.utils.checkpoint import (restore_checkpoint,
                                            save_checkpoint)

    s2, _ = t.train_step(s, scene, li, ly, ui, epoch=1, batch_index=0)
    save_checkpoint("./ckpt", s2)
    template = jax.device_get(t.init_state(jax.random.key(1)))
    restored = restore_checkpoint("./ckpt", template)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(s2.net_b.params["feat_spe"]["kernel"])),
        np.asarray(restored.net_b.params["feat_spe"]["kernel"]))
    out["checkpoint_roundtrip"] = True

    # global-mesh pod inference: each host classifies its strip of the
    # tile grid, strips allgathered back — compare vs a local predictor
    from cmlpl_tpu.eval import ScenePredictor

    model = t.model

    def apply_b(p, xp, x):
        return model.apply({"params": p}, xp, x, train=False)[0]

    global_pred = ScenePredictor(apply_b, patch_size=20,
                                 cols=scene.cols, tile=32,
                                 mesh=mesh)(s2.net_b.params, scene)
    local_mesh = create_mesh(jax.local_devices())
    params_host = jax.device_get(s2.net_b.params)
    local_pred = ScenePredictor(apply_b, patch_size=20, cols=scene.cols,
                                tile=32, mesh=local_mesh)(params_host,
                                                          scene)
    np.testing.assert_array_equal(np.asarray(global_pred),
                                  np.asarray(local_pred))
    out["global_mesh_inference"] = True
    print("METRICS " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
