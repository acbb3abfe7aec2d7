"""Comparison-model zoo registry + remaining zoo modules.

Maps model names to constructors and input signatures so the generic
supervised trainer / evaluator can drive any backbone
(reference ``tools/conpared_models.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from cmlpl_tpu.models.attention import CAMModule, PAMModule  # noqa: F401
from cmlpl_tpu.models.basenet import BaseNet1, BaseNet2
from cmlpl_tpu.models.common import avg_pool2, l2_normalize, tconv, tdense
from cmlpl_tpu.models.dbda import DBDA, DBDAFeature
from cmlpl_tpu.models.fdssc import FDSSC
from cmlpl_tpu.models.msvit import MultiScaleViT
from cmlpl_tpu.models.ssftt import SSFTTnet
from cmlpl_tpu.models.ssrn import SSRN


class BaseNet2Zoo(nn.Module):
    """The zoo variant of BaseNet2 (conpared_models.py:391-458): feature
    head off the spectral path via feat_ss -> feat_ss2 -> l2norm (64-d),
    classifier on the 2624-d concat.  (Its PAM_Module is constructed but
    bypassed in the reference forward, :415,434 — not created here.)"""

    num_features: int = 103
    dropout: float = 0.0
    num_classes: int = 9
    n_pc: int = 60

    @nn.compact
    def __call__(self, xp, x, *, train: bool = False):
        h = tconv(64, (1, 1), self.n_pc, name="conv0")(xp)
        res = h
        h = tconv(64, (3, 3), 64, padding=1, name="conv1")(h)
        h = nn.relu(h + res)
        h = avg_pool2(h)
        res = h
        h = tconv(64, (3, 3), 64, padding=1, name="conv2")(h)
        h = nn.relu(h + res)
        h = avg_pool2(h)
        h = h.reshape(h.shape[0], -1)

        y = tdense(1024, self.num_features, name="feat_spe")(x)
        y = nn.relu(y)
        z = jnp.concatenate([h, y], axis=1)

        f = tdense(256, 1024, name="feat_ss")(y)
        f = nn.relu(f)
        f = tdense(64, 256, name="feat_ss2")(f)
        feat = l2_normalize(f)

        if self.dropout > 0:
            z = nn.Dropout(self.dropout, deterministic=not train)(z)
        logits = tdense(self.num_classes, z.shape[-1], name="classifier")(z)
        return logits, feat


def weight_ema(base_params, ema_params, alpha: float):
    """EMA teacher update: E = B*(1-alpha) + E*alpha over every leaf
    (reference WeightEMA_BN, models.py:155-164)."""
    return jax.tree_util.tree_map(
        lambda b, e: b * (1.0 - alpha) + e * alpha, base_params, ema_params)


def spa_randomization(x: jax.Array, rng: jax.Array, eps: float = 1e-5):
    """Spatial style randomisation (models.py:166-191): re-normalise each
    sample's (H, W) statistics and swap mean/var across a shuffled batch.
    x: (B, H, W, C).  Returns (x', idx_swap)."""
    b = x.shape[0]
    flat = x.reshape(b, -1, x.shape[-1])
    mean = jnp.mean(flat, axis=1, keepdims=True)
    var = jnp.var(flat, axis=1, keepdims=True)
    normed = (flat - mean) / jnp.sqrt(var + eps)
    idx = jax.random.permutation(rng, b)
    out = normed * jnp.sqrt(var[idx] + eps) + mean[idx]
    return out.reshape(x.shape), idx


def spe_randomization(x: jax.Array, idx_swap: jax.Array,
                      eps: float = 1e-5):
    """Spectral style randomisation (models.py:196-224, unlabeled branch):
    per-sample feature stats re-applied after swapping samples."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    normed = (x - mean) / jnp.sqrt(var + eps)
    swapped = jax.lax.stop_gradient(normed[idx_swap])
    return swapped * jnp.sqrt(var + eps) + mean


@dataclasses.dataclass(frozen=True)
class ZooEntry:
    build: Callable[..., nn.Module]
    inputs: str            # "dual" (patch+spectrum) | "patch"
    returns_feature: bool  # (logits, feature) vs logits
    default_patch: int     # typical patch size
    default_n_pc: int      # typical channel count (-1 = full bands)


def _zoo() -> dict[str, ZooEntry]:
    return {
        "basenet1": ZooEntry(
            lambda spec, n_pc, **kw: BaseNet1(
                num_features=spec.num_bands, num_classes=spec.num_classes,
                n_pc=n_pc, **kw),
            "dual", True, 20, 5),
        "basenet2": ZooEntry(
            lambda spec, n_pc, **kw: BaseNet2(
                num_features=spec.num_bands, num_classes=spec.num_classes,
                n_pc=n_pc, **kw),
            "dual", True, 20, 60),
        "basenet2_zoo": ZooEntry(
            lambda spec, n_pc, **kw: BaseNet2Zoo(
                num_features=spec.num_bands, num_classes=spec.num_classes,
                n_pc=n_pc, **kw),
            "dual", True, 20, 60),
        "ssftt": ZooEntry(
            lambda spec, n_pc, **kw: SSFTTnet(
                num_classes=spec.num_classes, **kw),
            "patch", False, 13, 5),
        "dbda": ZooEntry(
            lambda spec, n_pc, **kw: DBDA(
                band=spec.num_bands, num_classes=spec.num_classes, **kw),
            "patch", False, 9, -1),
        "dbda_feature": ZooEntry(
            lambda spec, n_pc, **kw: DBDAFeature(
                band=spec.num_bands, num_classes=spec.num_classes, **kw),
            "patch", True, 9, -1),
        "ssrn": ZooEntry(
            lambda spec, n_pc, **kw: SSRN(
                band=spec.num_bands, num_classes=spec.num_classes, **kw),
            "patch", False, 7, -1),
        "fdssc": ZooEntry(
            lambda spec, n_pc, **kw: FDSSC(
                band=spec.num_bands, num_classes=spec.num_classes, **kw),
            "patch", False, 9, -1),
        "msvit": ZooEntry(
            lambda spec, n_pc, **kw: MultiScaleViT(
                image_size=kw.pop("image_size", 8),
                patch_sizes=kw.pop("patch_sizes", (2, 4)),
                num_classes=spec.num_classes,
                dim=kw.pop("dim", 64), depth=kw.pop("depth", 1),
                heads=kw.pop("heads", 4), channels=n_pc, **kw),
            "patch", False, 8, 30),
    }


ZOO = _zoo()


def build_model(name: str, spec, n_pc: int, **kw):
    """Construct a zoo model by name; returns (module, entry)."""
    entry = ZOO[name.lower()]
    n_pc = spec.num_bands if n_pc in (-1, None) else n_pc
    return entry.build(spec, n_pc, **kw), entry
