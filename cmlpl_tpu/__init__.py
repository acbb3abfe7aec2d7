"""cmlpl_tpu — a TPU-native JAX framework for semi-supervised hyperspectral
image classification, with the full capabilities of the CMLPL reference
(Contrastive Mutual Learning with Pseudo-Label Smoothing, IEEE TIM 2024).

Subsystems
----------
- :mod:`cmlpl_tpu.registry`    single source of truth for dataset constants
  (replaces the five duplicated if/elif chains in the reference,
  e.g. ``train.py:75-90``, ``hyper_tools.py:250-276``).
- :mod:`cmlpl_tpu.data`        .mat ingestion, PCA/normalisation, symmetric
  padding, **on-the-fly patch gather** (the reference materialises an
  ~18.5 GiB patch tensor, ``hyper_tools.py:226-243``; we gather patches from
  the HBM-resident padded cube inside jit), split generation byte-identical
  to the reference seeds (``sample_generation.py:48-65``).
- :mod:`cmlpl_tpu.models`      flax modules: BaseNet2 / CCT_Net / decoder /
  linear heads plus the comparison zoo (SSFTT, DBDA, SSRN, FDSSC,
  multi-scale ViT, PAM/CAM).
- :mod:`cmlpl_tpu.objectives`  CE, pseudo-label memory smoothing with a
  functional FIFO queue, adaptive confidence masking, mutual-learning
  consistency, contrastive pseudo-label-graph loss, CPS, JS, NT-Xent, MMD,
  U2PL memory-bank loss, OHEM/RCE.
- :mod:`cmlpl_tpu.train`       fused jit train steps (both networks'
  gradients in one XLA graph), data-parallel over a ``jax.sharding.Mesh``.
- :mod:`cmlpl_tpu.eval`        sharded full-scene inference, OA/AA/Kappa,
  class-map rendering, CSV reports.
- :mod:`cmlpl_tpu.ops`         Pallas TPU kernels for the hot paths.
- :mod:`cmlpl_tpu.utils`       orbax checkpointing, profiling, logging.
"""

__version__ = "0.1.0"
