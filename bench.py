"""Headline benchmark: CMLPL training throughput on a PaviaU-shaped scene.

Runs the full semi-supervised CMLPL train step (dual BaseNet2, queues,
contrastive graph, both optimizer updates fused in one jit) at the reference
configuration (128 labeled + 128 unlabeled patches of 60x20x20 per step,
train.py:355-380) on whatever accelerator JAX_PLATFORMS selects (the real
TPU chip under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is a documented, FLOP-derived estimate of the reference's GPU
throughput — 61 GFLOP/step at ~4.5 TFLOP/s sustained plus >=10 per-step
host->device copies and 5 .item() syncs (train.py:157-184,274-278)
=> ~25 ms/step => ~40 steps/s x 256 patches ≈ 10,000 patches/s.  The
estimate is anchored by a measured same-host run of the reference's exact
torch step (scripts/measure_reference.py, via the parity-test torch
oracle): REF_CPU_PPS_MEASURED on this image's 1-vCPU host, recorded
2026-08-16.  The driver target is >= 10x the GPU estimate.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

from cmlpl_tpu.utils.cache import enable_compile_cache

# Mosaic remote compiles dominate cold bench wall time (~12 min cold vs
# ~3 min warm); when a relay window opens, recompiling is time not
# measuring.  Backends that can't serialize executables skip the cache.
enable_compile_cache()

REF_GPU_PATCHES_PER_SEC_EST = 10_000.0
# measured by scripts/measure_reference.py on this image (torch CPU,
# reference step math via the whole-step-parity torch oracle; three runs
# 2026-08-16 gave 121.5 / 152.5 / 129.5 patches/s — mean below).  Same
# script also measured our jitted step on JAX CPU, same host: 82-99
# patches/s (XLA CPU conv codegen trails oneDNN; not the target hardware).
REF_CPU_PPS_MEASURED = 134.5
BASELINE_DERIVATION = (
    "ref GPU est: 61 GFLOP/step @ ~4.5 TFLOP/s sustained + >=10 H2D "
    "copies + 5 .item() syncs/step => ~25 ms/step => ~10k patches/s; "
    "measured anchor: reference torch step on this host's CPU = "
    f"{REF_CPU_PPS_MEASURED} patches/s (scripts/measure_reference.py)")

# PaviaU dims (registry dataID 1): 610 x 340 x 103, 9 classes
ROWS, COLS = 610, 340

# v5e peak: 197 TFLOP/s bf16 MXU (f32 matmuls run below that; training
# defaults to f32 for reference numerics, so peak_fraction is an upper
# bound on how compute-bound we could possibly be)
V5E_PEAK_TFLOPS_BF16 = 197.0


def flops_per_step(cfg) -> float:
    """Analytic FLOP count of one CMLPL step (the roofline numerator).

    Two BaseNet2 fwd+bwd on (labeled+unlabeled) patches (models.py:97-152
    topology: 1x1 conv 60->64 @wxw, 3x3 conv @wxw, 3x3 conv @(w/2)^2,
    bands->1024 linear, 2624->classes linear; bwd ~= 2x fwd) plus the
    queue-smoothing and contrastive-graph matmuls (train.py:213-219,
    246-258)."""
    w = cfg.patch_size
    b = cfg.labeled_batch + cfg.unlabeled_batch
    bu = cfg.unlabeled_batch
    conv0 = 2 * cfg.n_pc * 64 * w * w
    conv1 = 2 * (9 * 64) * 64 * w * w
    conv2 = 2 * (9 * 64) * 64 * (w // 2) ** 2
    feat = 2 * cfg.num_features * cfg.feat_dim
    cls = 2 * 2624 * cfg.num_classes
    fwd = conv0 + conv1 + conv2 + feat + cls
    nets = 2 * 3 * fwd * b                      # 2 nets, fwd + 2x for bwd
    queue = 2 * (2 * bu * cfg.queue_size * cfg.feat_dim
                 + 2 * bu * cfg.queue_size * cfg.num_classes)
    graph = 3 * 2 * bu * bu * cfg.feat_dim      # sim, sim1 (+grad reuse)
    return float(nets + queue + graph)


def hbm_bytes_per_step(cfg) -> float:
    """Approximate HBM traffic of one step (the roofline denominator):
    patch gather reads from the padded cube, the 8 Gaussian-noise view
    writes+reads (train.py:157-184), params + Adam moments read/write
    (~2.8 M params x (read grad-compute + 3x optimizer state traffic)),
    and queue reads for the smoothing matmuls."""
    w = cfg.patch_size
    b = cfg.labeled_batch + cfg.unlabeled_batch
    patch = b * cfg.n_pc * w * w * 4            # gather output
    views = 4 * patch * 2                       # 4 noised copies, w+r
    n_params = 2 * (64 * cfg.n_pc + 2 * 9 * 64 * 64
                    + cfg.num_features * cfg.feat_dim
                    + 2624 * cfg.num_classes)
    params = n_params * 4 * 6                   # p, g, m, v read+write
    queue = 2 * cfg.queue_size * (cfg.feat_dim + cfg.num_classes) * 4 * 2
    return float(patch + views + params + queue)


LAST_RESULT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "docs", "bench_last.json")


def _tunnel_preflight() -> None:
    """Fail fast with a parseable JSON line when the TPU tunnel's relay
    is down, instead of hanging in the plugin's claim-retry loop forever
    (utils/tunnel.py; outage observed 2026-08-18).

    The failure line carries the most recent successfully-banked result
    (docs/bench_last.json, written by every green run) as ``last_known``
    — value stays null because nothing was measured NOW, but a relay
    outage at capture time no longer erases the round's real number."""
    from cmlpl_tpu.utils.tunnel import relay_address, relay_reachable

    if not relay_reachable():
        host, port = relay_address()
        payload = {
            "metric": "cmlpl_train_patches_per_sec_per_chip",
            "value": None, "unit": "patches/s/chip", "vs_baseline": None,
            "error": f"axon pool-service relay ({host}:{port}) is "
                     "unreachable — TPU tunnel down; see CLAUDE.md "
                     "round-3e outage record"}
        try:
            with open(LAST_RESULT_PATH) as f:
                payload["last_known"] = json.load(f)
        except (OSError, json.JSONDecodeError):
            pass
        print(json.dumps(payload))
        raise SystemExit(1)


def _bank_result(result: dict) -> None:
    """Persist the full result of a green run for the preflight above."""
    result = dict(result, measured_utc=time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()))
    tmp = LAST_RESULT_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(result, f, indent=1)
    os.replace(tmp, LAST_RESULT_PATH)


def main() -> None:
    _tunnel_preflight()
    from cmlpl_tpu.core.mesh import create_mesh
    from cmlpl_tpu.data import (
        SemiSupervisedSampler,
        generate_splits,
        prepare_scene,
        synthetic_scene,
    )
    from cmlpl_tpu.eval import ScenePredictor
    from cmlpl_tpu.registry import get_dataset
    from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer

    spec = get_dataset(1)  # PaviaU constants
    cube, gt = synthetic_scene(spec, rows=ROWS, cols=COLS)
    scene = prepare_scene(spec, cube=cube, gt=gt, patch_size=20, n_pc=60)
    splits = generate_splits(scene.labels, num_label=5)

    # pool gather: pre-gather the ~10,045-pixel training pool once per
    # dispatch; numerically IDENTICAL to the per-step xla gather (pinned
    # by tests/test_pallas.py) and measured +22.6% throughput
    # (scripts/ab_gather.py r3: 2.373 -> 1.935 s fused run).
    # bfloat16 compute (+8.7% on top of pool): adopted for the headline
    # after the reference-in-the-loop knob study (docs/knob_stack.json)
    # measured OA neutral-or-better vs the reference's own code for all
    # three algorithms on the hard scene (CMLPL +4.85, CPS +1.70, CCT
    # -1.02 within band); trainer DEFAULTS stay f32 reference numerics.
    # The f32 run time is also measured below (extra.train_f32_sec).
    cfg = CMLPLConfig(num_classes=spec.num_classes,
                      num_features=spec.num_bands, gather_impl="pool",
                      compute_dtype="bfloat16")
    cfg_f32 = CMLPLConfig(num_classes=spec.num_classes,
                          num_features=spec.num_bands, gather_impl="pool")
    sampler = SemiSupervisedSampler(splits, scene.labels,
                                    cfg.labeled_batch, cfg.unlabeled_batch,
                                    num_unlabel=cfg.num_unlabel)
    mesh = create_mesh()
    trainer = CMLPLTrainer(cfg, mesh=mesh)
    # rbg PRNG: +32% throughput over threefry for the 8 Gaussian noise
    # views per step; the noise distribution (what the algorithm sees) is
    # identical, and all training math stays float32
    state = trainer.init_state(jax.random.key(0, impl="rbg"))

    def sync(metrics):
        # under the axon remote-TPU tunnel, block_until_ready returns at
        # enqueue time; a device->host fetch is the only honest barrier
        return float(np.asarray(metrics["acc"]).ravel()[-1])

    # warmup: compile the fused whole-run (the ENTIRE 20-epoch schedule,
    # 1,560 steps, is one dispatch)
    state, metrics = trainer.train_run(state, scene, sampler)
    sync(metrics)

    # >= 3 timed in-process repeats: cross-process variance is ±8% on the
    # tunneled chip, so single measurements make round-over-round deltas
    # uninterpretable; min is the headline (least-noise estimate), mean
    # and all repeats are recorded
    steps = cfg.num_epochs * (cfg.num_unlabel // cfg.labeled_batch)
    repeats = []
    final_acc = 0.0
    for r in range(3):
        state = trainer.init_state(jax.random.key(1 + r, impl="rbg"))
        t0 = time.perf_counter()
        state, metrics = trainer.train_run(state, scene, sampler)
        final_acc = sync(metrics)
        repeats.append(time.perf_counter() - t0)
    dt = min(repeats)

    # the f32 reference-numerics configuration, same process (only
    # interleaved in-process timings are decision-grade on this chip)
    trainer_f32 = CMLPLTrainer(cfg_f32, mesh=mesh)
    state_f32 = trainer_f32.init_state(jax.random.key(0, impl="rbg"))
    state_f32, m_f32 = trainer_f32.train_run(state_f32, scene, sampler)
    sync(m_f32)  # compile
    repeats_f32 = []
    for r in range(3):
        state_f32 = trainer_f32.init_state(jax.random.key(1 + r,
                                                          impl="rbg"))
        t0 = time.perf_counter()
        state_f32, m_f32 = trainer_f32.train_run(state_f32, scene,
                                                 sampler)
        sync(m_f32)
        repeats_f32.append(time.perf_counter() - t0)
    steps_per_sec = steps / dt
    patches_per_sec = steps_per_sec * (cfg.labeled_batch
                                       + cfg.unlabeled_batch)
    n_chips = jax.device_count()
    pps_per_chip = patches_per_sec / n_chips

    # roofline: how far from the hardware ceiling, and what binds
    fstep = flops_per_step(cfg)
    achieved_tflops = fstep * steps_per_sec / 1e12 / n_chips
    hbm_gbps = hbm_bytes_per_step(cfg) * steps_per_sec / 1e9 / n_chips

    # full-scene inference latency (207,400 pixels), target < 5 s
    model = trainer.model

    def apply_b(params, xp, x):
        return model.apply({"params": params}, xp, x, train=False)[0]

    predictor = ScenePredictor(apply_b, patch_size=20, cols=scene.cols,
                               tile=4096, mesh=mesh)
    predictor(state.net_b.params, scene)  # compile
    t0 = time.perf_counter()
    pred = predictor(state.net_b.params, scene)
    scene_sec = time.perf_counter() - t0
    assert pred.shape[0] == ROWS * COLS

    # opt-in bf16 shift-cube gather (measured 1.48x faster scene maps,
    # identical predictions on this scene — docs/BENCHMARKS.md)
    pred_bf16 = ScenePredictor(apply_b, patch_size=20, cols=scene.cols,
                               tile=4096, mesh=mesh, gather="pallas_bf16")
    pred_bf16(state.net_b.params, scene)  # compile
    t0 = time.perf_counter()
    pb = pred_bf16(state.net_b.params, scene)
    scene_bf16_sec = time.perf_counter() - t0
    bf16_agree = float(np.mean(pb == pred))

    result = {
        "metric": "cmlpl_train_patches_per_sec_per_chip",
        "value": round(pps_per_chip, 1),
        "unit": "patches/s/chip",
        "vs_baseline": round(pps_per_chip / REF_GPU_PATCHES_PER_SEC_EST, 3),
        "extra": {
            "steps_per_sec": round(steps_per_sec, 2),
            "full_20epoch_train_sec": round(dt, 3),
            "train_sec_repeats": [round(r, 3) for r in repeats],
            "train_sec_mean": round(float(np.mean(repeats)), 3),
            "train_config": "pool gather + rbg PRNG + bfloat16 compute "
                            "(OA-validated vs the reference's own code, "
                            "docs/knob_stack.json; trainer defaults stay "
                            "f32)",
            "train_f32_sec": round(min(repeats_f32), 3),
            "train_f32_sec_repeats": [round(r, 3) for r in repeats_f32],
            "train_f32_patches_per_sec_per_chip": round(
                steps * (cfg.labeled_batch + cfg.unlabeled_batch)
                / min(repeats_f32) / n_chips, 1),
            "roofline": {
                "flops_per_step": round(fstep / 1e9, 2),
                "flops_unit": "GFLOP/step (analytic, bench.flops_per_step)",
                "achieved_tflops_per_chip": round(achieved_tflops, 2),
                "v5e_peak_tflops_bf16": V5E_PEAK_TFLOPS_BF16,
                "peak_fraction": round(
                    achieved_tflops / V5E_PEAK_TFLOPS_BF16, 4),
                "hbm_gb_per_sec_est": round(hbm_gbps, 1),
                "bound": (
                    "conv-dominated, not data-movement-bound: the r3 "
                    "pool gather cut the gather share ~30% -> ~11%; the "
                    "r3 trace puts 49% of device time in the conv "
                    "fwd/bwd at modest MXU utilisation (20x20 spatial, "
                    "64 channels), 18% in elementwise noise/queue/Adam "
                    "fusions (docs/BENCHMARKS.md r3 profile).  Headline "
                    "runs bf16 compute (saves HBM/layout bytes; XLA:TPU "
                    "already does bf16 multiplies + f32 accum for f32 "
                    "inputs — the precision-semantics check)"),
            },
            "full_scene_paviau_sec": round(scene_sec, 3),
            "full_scene_paviau_bf16_gather_sec": round(scene_bf16_sec, 3),
            "bf16_gather_prediction_agreement": round(bf16_agree, 5),
            "full_scene_target_sec": 5.0,
            "final_train_acc": round(final_acc, 4),
            "n_chips": n_chips,
            "timed_steps": steps,
            "baseline": {
                "ref_gpu_pps_est": REF_GPU_PATCHES_PER_SEC_EST,
                "ref_cpu_pps_measured": REF_CPU_PPS_MEASURED,
                "vs_measured_cpu_ref": round(
                    pps_per_chip / REF_CPU_PPS_MEASURED, 1),
                "derivation": BASELINE_DERIVATION,
            },
        },
    }
    _bank_result(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
