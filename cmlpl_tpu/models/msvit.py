"""Multi-scale ViT with dual spatial-spectral attention (reference
``tools/conpared_models.py:1078-1512``).

Components: conv feature extractor ``OurFE`` (:1299-1328), depthwise-conv
patch embedding per patch size (:1453-1463), attention mixing spatial MHSA
(3x3 conv applied to the attention maps, :1417) with spectral attention
over transposed tokens (:1422-1429), conv FeedForward (:1341-1360), and a
softmax-weighted fusion of the per-branch classification heads
(:1506-1511).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


def mish(x):
    """x * tanh(softplus(x)) (conpared_models.py:1078-1083)."""
    return x * jnp.tanh(nn.softplus(x))


class DepthwiseConv(nn.Module):
    """DEPTHWISECONV (conpared_models.py:1363-1385): depthwise conv,
    optionally followed by a pointwise conv."""

    in_ch: int
    out_ch: int
    kernel_size: int = 1
    padding: int = 0
    strides: int = 1
    is_fe: bool = False

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        pad = ((self.padding, self.padding), (self.padding, self.padding))
        x = nn.Conv(self.in_ch, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides), padding=pad,
                    feature_group_count=self.in_ch, name="depth_conv")(x)
        if self.is_fe:
            return x
        return nn.Conv(self.out_ch, (1, 1), name="point_conv")(x)


class OurFE(nn.Module):
    """Conv feature extractor (conpared_models.py:1299-1328)."""

    channel: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def block(h, name):
            h = nn.Conv(self.channel, (1, 1), name=f"{name}_conv")(h)
            h = nn.BatchNorm(use_running_average=not train,
                             name=f"{name}_bn")(h)
            return nn.relu(h)

        out1 = block(x, "c1")
        out2 = block(out1, "c2")
        out3 = block(out2, "c3")
        h = jnp.concatenate([out1, out2, out3], axis=-1)
        h = nn.Conv(self.channel, (3, 3), padding=((1, 1), (1, 1)),
                    name="out_conv")(h)
        h = nn.BatchNorm(use_running_average=not train, name="out_bn")(h)
        return nn.relu(h)


class DualAttention(nn.Module):
    """Spatial MHSA with conv-refined attention maps + spectral attention
    over transposed tokens (conpared_models.py:1388-1429)."""

    dim: int
    heads: int = 4
    dim_head: int = 64
    dropout: float = 0.0
    num_patches: int = 25

    @nn.compact
    def __call__(self, x, *, train: bool = False):  # (B, n, dim)
        b, n, d = x.shape
        inner = self.dim_head * self.heads
        scale = self.dim_head ** -0.5

        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, n, self.heads, self.dim_head
                             ).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = nn.softmax(dots, axis=-1)
        # 3x3 conv over the (n, n) attention maps, heads as channels
        attn = attn.transpose(0, 2, 3, 1)  # (B, n, n, heads)
        attn = nn.Conv(self.heads, (3, 3), padding=((1, 1), (1, 1)),
                       name="spatial_conv")(attn)
        attn = attn.transpose(0, 3, 1, 2)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        if project_out:
            out = nn.Dense(self.dim, name="to_out")(out)
            out = nn.Dropout(self.dropout, deterministic=not train)(out)

        # spectral attention: tokens transposed, qkv over the token axis
        xt = x.transpose(0, 2, 1)  # (B, dim, n)
        qkv_s = nn.Dense(self.num_patches * 3, use_bias=False,
                         name="to_qkv_spec")(xt)
        qs, ks, _ = jnp.split(qkv_s, 3, axis=-1)  # (B, dim, n)
        dots_s = jnp.einsum("bdn,ben->bde", qs, ks,
                            preferred_element_type=jnp.float32) * scale
        attn_s = nn.softmax(dots_s, axis=-1)       # (B, dim, dim)
        attn_s = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                         name="spectral_conv")(attn_s[..., None])[..., 0]
        return jnp.einsum("bnd,bde->bne", out, attn_s)


class ConvFeedForward(nn.Module):
    """FeedForward (conpared_models.py:1341-1360): depthwise conv + BN +
    two pointwise convs with GELU, residual inside."""

    dim: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):  # (B, n, dim)
        b, n, d = x.shape
        w = int(math.sqrt(n))
        h = x.transpose(0, 2, 1).reshape(b, d, w, w).transpose(0, 2, 3, 1)
        h = DepthwiseConv(d, 256, kernel_size=3, padding=1,
                          name="dw")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn")(h)
        h = nn.Conv(512, (1, 1), name="pw1")(h)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU is exact erf
        h = nn.Conv(d, (1, 1), name="pw2")(h)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU is exact erf
        h = h.transpose(0, 3, 1, 2).reshape(b, d, n).transpose(0, 2, 1)
        return x + h


class MSTransformer(nn.Module):
    """PreNorm transformer stack returning all layer outputs
    (conpared_models.py:1432-1450)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    dropout: float = 0.0
    num_patches: int = 25

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        outputs = []
        for i in range(self.depth):
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln_attn_{i}")(x)
            x = DualAttention(self.dim, self.heads, self.dim_head,
                              self.dropout, self.num_patches,
                              name=f"attn_{i}")(h, train=train) + x
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln_ff_{i}")(x)
            x = ConvFeedForward(self.dim, name=f"ff_{i}")(h, train=train) + x
            outputs.append(x)
        return x, outputs


def get_num_patches(image_size: int, patch_size: int) -> int:
    """(conpared_models.py:1466-1467)"""
    return int((image_size - patch_size) / patch_size) + 1


class MultiScaleViT(nn.Module):
    """The zoo's multi-branch ViT (conpared_models.py:1470-1512).

    Input: (B, w, w, channels) patch.  Each patch size gets its own SubNet
    (depthwise patch embed + transformer) and head; heads are fused with a
    softmax over learnable branch weights (the reference initialises them
    to ones, making the fusion uniform).
    """

    image_size: int
    patch_sizes: Sequence[int]
    num_classes: int
    dim: int
    depth: int
    heads: int
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, xp, *, train: bool = False):
        img = OurFE(self.channels, name="ournet")(xp, train=train)
        img = nn.avg_pool(img, (3, 3), strides=(1, 1),
                          padding=((1, 1), (1, 1)))
        img = nn.Conv(self.dim, (1, 1), name="conv4")(img)

        branch_logits = []
        for bi, ps in enumerate(self.patch_sizes):
            n_patches = get_num_patches(self.image_size, ps) ** 2
            h = DepthwiseConv(self.dim, self.dim, kernel_size=ps,
                              strides=ps, is_fe=True,
                              name=f"embed_{bi}")(img)
            b, hh, ww, d = h.shape
            # the reference flattens the patch grid TRANSPOSED:
            # Rearrange('b c w h -> b (h w) c') at conpared_models.py:1458
            # makes the last spatial dim the outer token index.  The order
            # matters: the 3x3 conv over attention maps and the flattened
            # mlp_head are token-order-sensitive.
            tokens = h.transpose(0, 2, 1, 3).reshape(b, hh * ww, d)
            pos = self.param(f"pos_embedding_{bi}", nn.initializers.zeros,
                             (1, n_patches + 1, self.dim))
            tokens = tokens + pos[:, : tokens.shape[1]]
            tokens = nn.Dropout(self.emb_dropout,
                                deterministic=not train)(tokens)
            _, outputs = MSTransformer(
                self.dim, self.depth, self.heads, self.dim_head,
                self.dropout, n_patches, name=f"transformer_{bi}")(
                    tokens, train=train)
            res = outputs[-1].reshape(b, -1)
            logits = nn.Sequential([
                nn.LayerNorm(epsilon=1e-5),
                nn.Dense(self.num_classes),
            ], name=f"mlp_head_{bi}")(res)
            branch_logits.append(logits)

        weight = self.param("branch_weight", nn.initializers.ones,
                            (len(self.patch_sizes),))
        weight = nn.softmax(weight, axis=0)
        out = sum(w * lg for w, lg in zip(weight, branch_logits))
        return out
