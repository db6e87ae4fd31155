"""MaskFormer-style transformer head (Flax).

Equivalents of the reference utils/transformer_util.py: an order-adjusted
decoder layer (cross-attention then self-attention then MLP, each pre-normed
with residuals) and a head holding K learned query embeddings.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ogc_tpu.nn.layers import MLP


class TransformerDecoderLayer(nn.Module):
    """Cross-Attention + Self-Attention decoder layer.

    Reference: TransformerDecoderLayer (utils/transformer_util.py:5-59).
    """

    embed_dim: int = 256
    n_head: int = 8
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, slot, point_feats, pos_enc=None):
        """
        :param slot: (B, K, C); :param point_feats: (B, N, C).
        :param pos_enc: optional (B, N, C) added to attention keys only.
        :return: (B, K, C).
        """
        # Cross-attention: queries = slots, keys/values = point features.
        slot1 = nn.LayerNorm()(slot)
        keys = point_feats + pos_enc if pos_enc is not None else point_feats
        slot1 = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=self.embed_dim,
            out_features=self.embed_dim,
        )(inputs_q=slot1, inputs_k=keys, inputs_v=point_feats)
        slot = slot + slot1

        # Self-attention among slots.
        slot2 = nn.LayerNorm()(slot)
        slot2 = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=self.embed_dim,
            out_features=self.embed_dim,
        )(inputs_q=slot2, inputs_k=slot2, inputs_v=slot2)
        slot = slot + slot2

        slot = slot + MLP(self.hidden_dim, self.embed_dim)(nn.LayerNorm()(slot))
        return slot


class MaskFormerHead(nn.Module):
    """K learned queries refined by transformer decoder layers.

    Reference: MaskFormerHead (utils/transformer_util.py:62-121).
    """

    n_slot: int
    input_dim: int = 256
    n_transformer_layer: int = 2
    transformer_embed_dim: int = 256
    transformer_n_head: int = 8
    transformer_hidden_dim: int = 256
    input_pos_enc: bool = False

    @nn.compact
    def __call__(self, point_feats, point_pos):
        """
        :param point_feats: (B, N, C_in); :param point_pos: (B, N, 3).
        :return: slots (B, K, D).
        """
        B = point_feats.shape[0]
        query = nn.Embed(
            self.n_slot,
            self.transformer_embed_dim,
            embedding_init=nn.initializers.normal(1.0),  # torch nn.Embedding init
            name="query",
        )
        slot = jnp.broadcast_to(
            query(jnp.arange(self.n_slot))[None],
            (B, self.n_slot, self.transformer_embed_dim),
        )

        inputs = MLP(self.transformer_embed_dim, self.transformer_embed_dim)(
            point_feats
        )
        inputs = nn.LayerNorm()(inputs)
        pos_enc = (
            nn.Dense(self.transformer_embed_dim)(point_pos)
            if self.input_pos_enc
            else None
        )

        for _ in range(self.n_transformer_layer):
            slot = TransformerDecoderLayer(
                embed_dim=self.transformer_embed_dim,
                n_head=self.transformer_n_head,
                hidden_dim=self.transformer_hidden_dim,
            )(slot, inputs, pos_enc)
        return slot
