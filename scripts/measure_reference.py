"""Measure the reference CMLPL training loop (torch) vs ours on ONE host.

VERDICT r1 item 10: bench.py's `vs_baseline` denominator was an estimate of
the reference's GPU throughput.  This script replaces guesswork with a
measured, same-hardware comparison:

  1. the reference's exact step math (train.py:146-272 — dual BaseNet2
     forward, queue smoothing, contrastive graph, two backwards, two Adam
     steps, per-step Gaussian-noise generation as at train.py:157-184),
     executed by the torch oracle that the whole-step parity test pins
     (tests/test_full_step_torch_parity.py), on torch CPU;
  2. our fused jitted train_step at the identical configuration, on JAX CPU
     (forced in-process — same host, same cores, same DRAM).

Both run at the reference configuration: 128 labeled + 128 unlabeled
patches of 60x20x20 + 103-band spectra per step (train.py:355-380).

Output: ONE JSON line with both measured patches/s and their ratio, plus
the documented derivation of the reference-GPU estimate that bench.py uses
as its `vs_baseline` denominator.

Scope note: both sides measure the optimisation step only (batch tensors
pre-staged on host); the reference's DataLoader and the 18.5 GiB
materialised patch tensor (hyper_tools.py:226-243) are excluded, which is
GENEROUS to the reference.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

# same-host comparison: force JAX onto CPU before any backend initialises
# (the image's sitecustomize otherwise registers the axon TPU backend)
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import torch  # noqa: E402

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))
from test_full_step_torch_parity import (  # noqa: E402
    TorchBaseNet2,
    torch_reference_step,
)

from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer  # noqa: E402

# Reference-GPU derivation (documented; numbers below are measured here):
# the step is ~61 GFLOP (two BaseNet2 fwd+bwd on 256 patches: conv0 1x1
# 60->64 @20x20 + two 3x3 64->64 convs + 103->1024 + 2624->9 linears
# ~= 40 MFLOP/patch fwd, x256 patches x2 nets x3 for fwd+bwd).  On the
# torch-1.8/cu111-era GPU implied by requirements.txt (V100/2080-class,
# ~4-5 TFLOP/s sustained on convs this small), compute is ~13-15 ms/step;
# the loop adds >=10 host->device copies and 5 .item() syncs per step
# (train.py:157-184, 274-278), bounding latency near ~25 ms/step
# => ~40 steps/s x 256 patches ~= 10,000 patches/s.
REF_GPU_PPS_DERIVATION = (
    "61 GFLOP/step @ ~4.5 TFLOP/s sustained (+>=10 H2D copies, 5 .item() "
    "syncs/step) => ~25 ms/step => ~40 steps/s x 256 = ~10k patches/s"
)


def measure_torch(cfg: CMLPLConfig, steps: int, seed: int = 0) -> float:
    torch.manual_seed(seed)
    nets = [TorchBaseNet2(cfg.n_pc, cfg.num_features, cfg.num_classes)
            for _ in range(2)]
    opts = [torch.optim.Adam(n.parameters(), lr=cfg.lr) for n in nets]
    queues = tuple(
        (torch.zeros(cfg.queue_size, 1024),
         torch.zeros(cfg.queue_size, cfg.num_classes), 0)
        for _ in range(2))

    bt, btu = cfg.labeled_batch, cfg.unlabeled_batch
    rng = np.random.default_rng(seed)
    xp_l = rng.standard_normal((bt, cfg.n_pc, cfg.patch_size,
                                cfg.patch_size)).astype(np.float32)
    x_l = rng.standard_normal((bt, cfg.num_features)).astype(np.float32)
    y = rng.integers(0, cfg.num_classes, bt).astype(np.int64)
    xp_u = rng.standard_normal((btu, cfg.n_pc, cfg.patch_size,
                                cfg.patch_size)).astype(np.float32)
    x_u = rng.standard_normal((btu, cfg.num_features)).astype(np.float32)

    def one_step(warm: bool):
        # the reference regenerates Gaussian noise for every input view
        # each step (train.py:157-184) — that cost belongs in the measure
        noised = (
            xp_l + (torch.randn(*xp_l.shape) * cfg.noise).numpy(),
            x_l + (torch.randn(*x_l.shape) * cfg.noise).numpy(),
            y,
            xp_u + (torch.randn(*xp_u.shape) * cfg.noise).numpy(),
            x_u + (torch.randn(*x_u.shape) * cfg.noise).numpy(),
        )
        torch_reference_step(nets, opts, queues_state[0], noised, cfg,
                             warm, adap=0.5)

    queues_state = [((queues[0][0], queues[0][1], 0),
                     (queues[1][0], queues[1][1], 0))]
    one_step(warm=False)  # warmup (also fills the queues)
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step(warm=True)
    dt = time.perf_counter() - t0
    return steps * (bt + btu) / dt


def measure_ours(cfg: CMLPLConfig, steps: int) -> float:
    from cmlpl_tpu.data import (SemiSupervisedSampler, generate_splits,
                                prepare_scene, synthetic_scene)

    cube, gt = synthetic_scene(1, rows=64, cols=48)
    scene = prepare_scene(1, cube=cube, gt=gt, patch_size=cfg.patch_size,
                          n_pc=cfg.n_pc)
    splits = generate_splits(scene.labels, num_label=20)
    sampler = SemiSupervisedSampler(splits, scene.labels,
                                    cfg.labeled_batch, cfg.unlabeled_batch,
                                    num_unlabel=cfg.num_unlabel)
    trainer = CMLPLTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))
    li, ly, ui = next(iter(sampler.epoch()))

    # warmup/compile, then time per-step dispatches (CPU: no tunnel, the
    # per-dispatch overhead is microseconds; no scan fusion needed here)
    state, m = trainer.train_step(state, scene, li, ly, ui, epoch=1,
                                  batch_index=0)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = trainer.train_step(state, scene, li, ly, ui, epoch=1,
                                      batch_index=i)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    return steps * (cfg.labeled_batch + cfg.unlabeled_batch) / dt


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=5)
    args = p.parse_args()

    cfg = CMLPLConfig(num_classes=9, num_features=103)
    ref_pps = measure_torch(cfg, args.steps)
    ours_pps = measure_ours(cfg, args.steps)
    print(json.dumps({
        "metric": "same_host_cpu_patches_per_sec",
        "ref_torch_cpu_pps": round(ref_pps, 1),
        "ours_jax_cpu_pps": round(ours_pps, 1),
        "same_host_speedup": round(ours_pps / ref_pps, 2),
        "steps": args.steps,
        "ref_gpu_pps_est": 10_000.0,
        "ref_gpu_pps_derivation": REF_GPU_PPS_DERIVATION,
    }))


if __name__ == "__main__":
    main()
