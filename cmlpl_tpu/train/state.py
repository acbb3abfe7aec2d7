"""Training state containers + hyperparameter config.

Defaults mirror the reference argparse (``train.py:355-380``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import optax

from cmlpl_tpu.objectives.queue import QueueState


@dataclasses.dataclass(frozen=True)
class CMLPLConfig:
    num_classes: int = 9
    num_features: int = 103
    n_pc: int = 60
    patch_size: int = 20

    # labeled pixels drawn per class by the split recipe (train.py:357,
    # sample_generation.py:52-63); num_label * num_classes bounds the
    # labeled uniques a pre-gathered pool can contain
    num_label: int = 5

    labeled_batch: int = 128       # train.py:361
    unlabeled_batch: int = 128     # train.py:362
    val_batch: int = 512           # train.py:363
    lr: float = 5e-4               # train.py:365
    num_epochs: int = 20           # train.py:366
    num_unlabel: int = 10000       # train.py:368
    thr: float = 1.0               # train.py:369
    alpha: float = 0.95            # train.py:371
    queue_batch: int = 17          # train.py:372
    temperature: float = 0.3       # train.py:374
    dropout: float = 0.8           # train.py:377
    noise: float = 0.5             # train.py:378
    # loss weights (train.py:266, :270)
    w_contrast: float = 0.5
    w_consistency: float = 4.0
    # queue size = 5 * labeled_batch * 2 (train.py:138)
    feat_dim: int = 1024
    seed: int = 1088
    # performance knobs (defaults preserve reference numerics)
    compute_dtype: str = "float32"   # "bfloat16" for MXU-native compute
    # dtype of the gathered patches / spectra / Gaussian-noise views at
    # the dispatch boundary:
    #   "compute"  (default) store them in the compute dtype — under
    #              compute_dtype="bfloat16" the patch pool, the per-step
    #              row takes, and the 8 noise views live in bf16, halving
    #              their HBM traffic.  The values the convs see are the
    #              same precision class either way (the f32-input path
    #              casts to bf16 inside each layer); only the rounding
    #              point moves.  No-op when compute_dtype="float32".
    #   "float32"  keep inputs/views f32 (the pre-r3c behaviour of the
    #              bf16 knob — kept for A/B).
    input_dtype: str = "compute"
    rng_impl: str = "threefry2x32"   # "rbg" is much faster on TPU
    # Gaussian input-view knobs (ops/noise.py; both change the realised
    # random stream like rng_impl, so default-off pending the OA study):
    #   noise_impl   "normal" (reference distribution) | "binom16"
    #                (standardised Binomial(16,1/2) via population_count
    #                — no erfinv)
    #   noise_fused  draw each net's labeled||unlabeled view with ONE
    #                key over the concatenated tensor (4 RNG kernels
    #                instead of 8; same element distribution and
    #                cross-view independence)
    noise_impl: str = "normal"
    noise_fused: bool = False
    # training patch-gather implementation:
    #   "auto"        (default) resolve at trainer construction: "pool"
    #                 when the trainer supports it and the pool fits the
    #                 HBM budget (ops/patch_gather.resolve_gather_impl),
    #                 else "xla".  Both resolutions are numerically
    #                 identical, so the reference-numerics default is
    #                 preserved.
    #   "xla"         vmapped dynamic_slice (reference numerics, zero
    #                 extra HBM)
    #   "pallas"      Pallas DMA gather, f32 cube lane-padded 60->128 ch
    #                 (moves 2.1x the bytes; measured slower — kept for A/B)
    #   "pallas_bf16" Pallas DMA gather from a bf16 cube (halves DMA bytes;
    #                 patches upcast to f32 after the gather, so all
    #                 training math stays f32 — only the patch INPUT
    #                 precision changes)
    #   "pool"        (CMLPL/CPS/CCT trainers) bulk-gather the unique
    #                 training pool once per dispatch (~10,045 patches ~
    #                 0.97 GB HBM at the reference schedule); in-scan
    #                 gathers become contiguous row takes.  Numerically
    #                 identical to "xla" (same patch values, same math);
    #                 +22.6% measured (docs/BENCHMARKS.md).
    gather_impl: str = "auto"
    # Stack the two networks' forwards into ONE set of batched kernels
    # (jax.vmap over a net axis: each conv/matmul runs once at 2x batch
    # instead of twice).  Numerically identical to the unstacked path
    # (same params, same inputs, same dropout keys per net) — perf knob
    # only; A/B'd in scripts/ab_gather.py --stack_nets.
    stack_nets: bool = False
    # opt-in objectives the reference imports but never invokes
    # (loss_helper.py, models.py:14-39, the missing `regularizer` module):
    # "" | "memobank" (U2PL InfoNCE, net E teaches net B) | "mmd"
    # (labeled/unlabeled feature MMD per net) | "ntxent" (SimCLR across
    # the two nets' views)
    extra_loss: str = ""
    extra_weight: float = 0.1
    memobank_size: int = 256
    # opt-in patch augmentations (hsi_loader.py:58-107, dead in the
    # reference): any of "flip", "rot90", "radiation", "mixture"
    augment: tuple = ()

    @property
    def queue_size(self) -> int:
        return 5 * self.labeled_batch * 2


class NetState(NamedTuple):
    params: Any
    opt_state: optax.OptState


class CMLPLTrainState(NamedTuple):
    net_b: NetState          # "Base"  (train.py:118)
    net_e: NetState          # "Base1" (train.py:122)
    queue_w: QueueState      # smooths net E's probs (train.py:139-141)
    queue_s: QueueState      # smooths net B's probs (train.py:142-145)
    rng: jax.Array
    step: jax.Array
    bank: Any = ()           # MemoBankState when extra_loss="memobank"
