"""Full-scene inference — the reference's "serve" path, TPU-native.

The reference's ``test_whole`` (hyper_tools.py:416-437) loops 406 batches
with a host round-trip and an O(n^2) ``np.append`` per batch.  Here the
entire scene is classified in **one jit call**: pixel indices are tiled,
``lax.map`` scans the tiles (bounding VMEM/HBM working set), each tile
gathers its patches from the HBM-resident padded cube, runs the forward
pass and argmaxes on device; one final (K,) int32 transfer returns the map.

Multi-chip: the tile dimension is sharded over the mesh's ``data`` axis, so
each chip classifies an interleaved strip of the scene (the Houston scene's
664,845 pixels are the scale axis here — see SURVEY §5).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmlpl_tpu.data.prep import PreparedScene


class ScenePredictor:
    """Classifies every pixel of a prepared scene.

    ``apply_fn(params, xp, x) -> logits`` abstracts the model so the same
    predictor serves BaseNet2 (logits head), CCT (encoder + linear head) and
    the zoo backbones.
    """

    def __init__(self, apply_fn: Callable, *, patch_size: int, cols: int,
                 tile: int = 4096, mesh: Optional[Mesh] = None):
        self.apply_fn = apply_fn
        self.patch_size = patch_size
        self.cols = cols
        self.tile = tile
        self.mesh = mesh
        self._predict = self._build()

    def _build(self):
        w = self.patch_size
        cols = self.cols
        apply_fn = self.apply_fn

        def predict(params, padded, spectra, idx_tiles):
            def one_tile(idx):
                r = idx // cols
                c = idx % cols

                def slice_one(ri, ci):
                    return lax.dynamic_slice(
                        padded, (ri, ci, 0), (w, w, padded.shape[-1]))

                xp = jax.vmap(slice_one)(r, c)
                x = jnp.take(spectra, idx, axis=0)
                logits = apply_fn(params, xp, x)
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)

            return lax.map(one_tile, idx_tiles)

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            tiles_sh = NamedSharding(self.mesh, P(None, "data"))
            return jax.jit(predict,
                           in_shardings=(repl, repl, repl, tiles_sh),
                           out_shardings=tiles_sh)
        return jax.jit(predict)

    def __call__(self, params, scene: PreparedScene) -> np.ndarray:
        """Returns 0-based predicted class ids for all rows*cols pixels."""
        k = scene.num_pixels
        n_dev = 1 if self.mesh is None else self.mesh.devices.size
        tile = self.tile
        # pad K so tiles divide evenly and each tile splits across devices
        per_tile = tile
        padded_k = -(-k // (per_tile * n_dev)) * (per_tile * n_dev)
        idx = np.arange(padded_k, dtype=np.int32)
        idx[k:] = 0  # padding pixels classify pixel 0; discarded below
        idx_tiles = idx.reshape(-1, per_tile)
        preds = self._predict(params, scene.padded_pca, scene.spectra,
                              jnp.asarray(idx_tiles))
        return np.asarray(jax.device_get(preds)).reshape(-1)[:k]
