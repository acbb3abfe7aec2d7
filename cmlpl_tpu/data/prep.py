"""Scene preparation: normalisation, PCA, and the prepared-scene container.

Numerics follow the reference exactly so splits and accuracy are comparable:

- ``feature_normalize`` reproduces ``featureNormalize`` (z-score over pixels
  per band, or min-max; ``tools/hyper_tools.py:8-22``).
- ``pca_norm`` reproduces ``PCANorm`` (``tools/hyper_tools.py:25-32``):
  covariance of centered pixels, ``np.linalg.svd``, project onto the first
  ``n_pc`` components.  It runs on host NumPy — the covariance is at most
  204x204, and byte-identical PCA features remove one source of divergence
  (SVD sign ambiguity across backends).

The big difference vs the reference: **no patch tensor is materialised.**
``PreparedScene`` keeps the symmetric-padded PCA cube (~170 MB for PaviaU at
60 components) and the z-scored full-band spectra resident in device HBM;
patches are gathered on the fly inside jit (see ``patches.gather_patches``).
The reference instead writes an ~18.5 GiB ``XP.npy``
(``hyper_tools.py:226-243``, ``sample_generation.py:68``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cmlpl_tpu.data.io import load_scene
from cmlpl_tpu.data.patches import pad_symmetric, patch_pad_width
from cmlpl_tpu.registry import DatasetSpec, get_dataset


def feature_normalize(X: np.ndarray, kind: int = 1) -> np.ndarray:
    """kind==1: per-column z-score; kind==2: per-column min-max."""
    if kind == 1:
        mu = np.mean(X, 0)
        Xc = X - mu
        return Xc / np.std(Xc, 0)
    if kind == 2:
        lo, hi = np.min(X, 0), np.max(X, 0)
        return (X - lo) / (hi - lo)
    raise ValueError(f"unknown normalization kind {kind}")


def pca_norm(X: np.ndarray, n_pc: int) -> np.ndarray:
    """Project pixels onto the first ``n_pc`` principal components.

    Matches the reference: SVD of the (N-1)-normalised covariance of the
    centered pixel matrix, projection onto the leading left singular
    vectors (``hyper_tools.py:25-32``).
    """
    mu = np.mean(X, 0)
    Xc = X - mu
    sigma = np.cov(Xc.T)
    U, _, _ = np.linalg.svd(sigma)
    return np.dot(Xc, U[:, :n_pc])


@dataclasses.dataclass
class PreparedScene:
    """Device-resident prepared scene.

    Attributes:
      spec: dataset constants.
      padded_pca: (rows + 2*hw, cols + 2*hw, n_pc) float32 in HBM — the
        symmetric-padded, z-scored PCA cube patches are gathered from.
      spectra: (rows*cols, bands) float32 in HBM — z-scored full spectra.
      labels: (rows*cols,) int32 host array, 0 = unlabeled background
        (1-based classes, as in the raw ground truth).
      patch_size: spatial patch width w.
      n_pc: number of PCA components (patch channel count).
    """

    spec: DatasetSpec
    padded_pca: jax.Array
    spectra: jax.Array
    labels: np.ndarray
    patch_size: int
    n_pc: int

    @property
    def rows(self) -> int:
        return self.spec.rows

    @property
    def cols(self) -> int:
        return self.spec.cols

    @property
    def num_pixels(self) -> int:
        return self.spec.num_pixels


def prepare_scene(data_id, root: str = "./dataset", patch_size: int = 20,
                  n_pc: int = 60,
                  cube: Optional[np.ndarray] = None,
                  gt: Optional[np.ndarray] = None,
                  dtype=jnp.float32) -> PreparedScene:
    """Full prep pipeline (reference ``SampleGen``, hyper_tools.py:246-297):
    load cube -> PCA(n_pc) + z-score -> symmetric pad (patch source);
    z-score raw spectra; flatten labels.  Defaults w=20, n_PC=60 match
    ``sample_generation.py:79-80``.
    """
    spec = get_dataset(data_id)
    if cube is None or gt is None:
        cube, gt = load_scene(spec, root)
    rows, cols, bands = cube.shape
    if (rows, cols) != (spec.rows, spec.cols):
        # synthetic scenes may be smaller than the registered dims
        spec = dataclasses.replace(spec, rows=rows, cols=cols)

    flat = cube.reshape(rows * cols, bands)
    x_pca = feature_normalize(pca_norm(flat, n_pc), 1)
    x_pca = x_pca.reshape(rows, cols, n_pc).astype(np.float32)
    spectra = feature_normalize(flat, 1).astype(np.float32)

    hw = patch_pad_width(patch_size)
    padded = pad_symmetric(x_pca, hw)

    return PreparedScene(
        spec=spec,
        padded_pca=jnp.asarray(padded, dtype=dtype),
        spectra=jnp.asarray(spectra, dtype=dtype),
        labels=np.asarray(gt).reshape(-1).astype(np.int32),
        patch_size=patch_size,
        n_pc=n_pc,
    )
