"""SSFTTnet — Spectral-Spatial Former (reference
``tools/conpared_models.py:128-190``) and its single-layer ViT transformer
(``:23-112``).

Pipeline: Conv3d(1->8, k=3) over (spectral, H, W) -> merge (8 x D') as 2-D
channels -> Conv2d(->64, k=3) -> learned tokenization via token_wA /
token_wV einsums (conpared_models.py:174-180) -> 1-layer transformer ->
classification off the cls token.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cmlpl_tpu.models.common import tdense


class ViTAttention(nn.Module):
    """MHSA with fused qkv (conpared_models.py:57-95).  Note the reference
    scales by dim**-0.5 (full dim, not per-head)."""

    dim: int
    heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, n, d = x.shape
        scale = self.dim ** -0.5
        qkv = tdense(self.dim * 3, self.dim, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = d // self.heads

        def heads_split(t):
            return t.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = map(heads_split, (q, k, v))
        dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        out = tdense(self.dim, self.dim, name="nn1")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class ViTMLP(nn.Module):
    """MLP_Block (conpared_models.py:42-54)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = tdense(self.hidden_dim, self.dim)(x)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU is exact erf
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = tdense(self.dim, self.hidden_dim)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h


class ViTTransformer(nn.Module):
    """Residual(LayerNorm(Attention)) + Residual(LayerNorm(MLP)) stack
    (conpared_models.py:98-112)."""

    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i in range(self.depth):
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln_attn_{i}")(x)
            x = x + ViTAttention(self.dim, self.heads, self.dropout,
                                 name=f"attn_{i}")(h, train=train)
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln_mlp_{i}")(x)
            x = x + ViTMLP(self.dim, self.mlp_dim, self.dropout,
                           name=f"mlp_{i}")(h, train=train)
        return x


class SSFTTnet(nn.Module):
    """Input: (B, w, w, n_pc) PCA patch, NHWC.  The reference feeds
    (B, n_pc, w, w) and reshapes to NCDHW with depth = n_pc
    (conpared_models.py:168); the conv3d runs over (spectral, H, W).
    ``8 * (n_pc - 2)`` must equal 24, i.e. n_pc = 5, matching the base-model
    prep (SampleGen_for_base with small n_PC)."""

    num_classes: int = 9
    num_tokens: int = 4
    dim: int = 64
    depth: int = 1
    heads: int = 8
    mlp_dim: int = 8
    dropout: float = 0.1
    emb_dropout: float = 0.1

    @nn.compact
    def __call__(self, xp, *, train: bool = False):
        b, w, _, n_pc = xp.shape
        # NCDHW (B,1,D,H,W) -> NDHWC (B, D, H, W, 1) with D = spectral
        x = xp.transpose(0, 3, 1, 2)[..., None]
        x = nn.Conv(8, (3, 3, 3), padding="VALID", name="conv3d")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn3d")(x)
        x = nn.relu(x)
        # merge (channels=8, depth=D-2) -> 2-D channels (b c h w y ->
        # b (c h) w y in the reference's NCDHW; here D and 8 both trail)
        bb, d2, h2, w2, c8 = x.shape
        x = x.transpose(0, 2, 3, 1, 4).reshape(bb, h2, w2, d2 * c8)
        x = nn.Conv(64, (3, 3), padding="VALID", name="conv2d")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn2d")(x)
        x = nn.relu(x)

        tokens = x.reshape(bb, -1, 64)                  # (B, n, 64)
        wa = self.param("token_wA", nn.initializers.xavier_normal(),
                        (1, self.num_tokens, 64))
        wv = self.param("token_wV", nn.initializers.xavier_normal(),
                        (1, 64, self.dim))
        A = jnp.einsum("bnc,lc->bnl", tokens, wa[0])    # (B, n, L)
        A = nn.softmax(A.transpose(0, 2, 1), axis=-1)   # (B, L, n)
        VV = jnp.einsum("bnc,cd->bnd", tokens, wv[0])   # (B, n, dim)
        T = jnp.einsum("bln,bnd->bld", A, VV)           # (B, L, dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.dim))
        pos = self.param("pos_embedding",
                         nn.initializers.normal(stddev=0.02),
                         (1, self.num_tokens + 1, self.dim))
        z = jnp.concatenate(
            [jnp.broadcast_to(cls, (bb, 1, self.dim)), T], axis=1) + pos
        z = nn.Dropout(self.emb_dropout, deterministic=not train)(z)
        z = ViTTransformer(self.dim, self.depth, self.heads, self.mlp_dim,
                           self.dropout, name="transformer")(z, train=train)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.xavier_uniform(),
                        bias_init=nn.initializers.normal(stddev=1e-6),
                        name="head")(z[:, 0])
