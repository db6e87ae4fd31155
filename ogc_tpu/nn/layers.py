"""Generic NN building blocks (Flax), channels-last.

Equivalents of the reference's utils/nn_util.py: Conv1d/Conv2d with
kernel_size 1 are per-point Dense layers; SharedMLP is a stack of
Dense+Norm+ReLU applied over the trailing channel axis.  GroupNorm follows
the reference's BN_CONFIG dispatch (utils/nn_util.py:33-42).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# Torch kaiming_normal_ (fan_in, gain sqrt(2), untruncated) — the init used by
# all reference convs (utils/nn_util.py:90, 101).
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

NormSpec = Optional[Mapping[str, Any]]

# Compute dtype for the pointwise-MLP stacks (params stay f32).  bf16 roughly
# halves the HBM traffic of the bandwidth-bound grouped MLPs; normalization
# statistics are always taken in f32.  Toggle with set_compute_dtype.
_COMPUTE_DTYPE = None  # None = float32


def set_compute_dtype(dtype) -> None:
    """Set the activation dtype for MLP stacks (None or jnp.bfloat16)."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    return _COMPUTE_DTYPE


def make_norm(norm: NormSpec, name: Optional[str] = None):
    """Instantiate a norm layer from a reference-style spec dict.

    Reference: get_norm_layer (utils/nn_util.py:33-42).  Supported:
      None                                    -> identity
      {"class": "GroupNorm", "num_groups": G} -> GroupNorm over channels
      {"class": "BatchNorm"}                  -> BatchNorm (batch_stats col.)
    `name`: explicit module name (setup()-created instances are otherwise
    named by attribute, breaking param-path compatibility).
    """
    if norm is None:
        return None
    cls = norm["class"]
    if cls == "GroupNorm":
        # bf16 compute mode: reshape-free GroupStatsNorm (param-path
        # compatible — explicitly named GroupNorm_0 to match flax's
        # auto-name).  flax's grouped (B, ..., G, C/G) reshape on the big
        # gathered tensors forces TPU layout copies + 5-D reshapes costing
        # ~2.5 ms per seg forward (trace r5); the stats-matmul variant
        # reduces in the native layout.  Equivalence pinned by
        # tests/test_layers.py.  f32 mode keeps flax GroupNorm — the
        # reference-exact float path (grad-parity tests pin it).
        if _COMPUTE_DTYPE == jnp.bfloat16:
            return GroupStatsNorm(
                num_groups=norm["num_groups"], epsilon=1e-5,
                name=name or "GroupNorm_0",
            )
        return nn.GroupNorm(
            num_groups=norm["num_groups"], epsilon=1e-5,
            dtype=_COMPUTE_DTYPE, name=name,
        )
    if cls == "BatchNorm":
        return nn.BatchNorm(
            use_running_average=norm.get("use_running_average", False),
            momentum=norm.get("momentum", 0.9),
            epsilon=1e-5,
            dtype=_COMPUTE_DTYPE, name=name,
        )
    raise KeyError(f"Unrecognized norm class: {cls}")


class GroupStatsNorm(nn.Module):
    """GroupNorm with reshape-free statistics, param-compatible with
    nn.GroupNorm (scale/bias of shape (C,)).

    flax's GroupNorm reshapes (B, ..., C) to (B, ..., G, C/G) for its
    reductions — on TPU that 5-D view of a freshly GATHERED tensor forces
    layout copies + sublane-splitting reshapes that cost more than the norm
    itself (seg trace r4: ~2.5 ms of copies/reshapes per SA stage).  Here
    per-channel sums reduce over the position axes in the native layout and
    a tiny (C, G) 0/1 matmul pools them into group statistics; the
    normalization is pure elementwise.  Math identical to flax's
    use_fast_variance path (mean of squares minus squared mean, f32).
    """

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        """`return_params`: create/return the (scale, bias) affine without
        normalizing — used by the merged multi-scale MSG chain, which pools
        several scales' norms into one pass over the concatenated channels
        (see pointnet2.SAModuleMSG) but keeps per-scale parameter ownership
        here."""
        C = x.shape[-1]
        G = self.num_groups
        assert C % G == 0, (C, G)
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if return_params:
            return scale, bias

        # (C, G) group-assignment matrix (static 0/1).
        assign = jnp.asarray(
            (jnp.arange(C) // (C // G))[:, None]
            == jnp.arange(G)[None, :],
            jnp.float32,
        )
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))
        s1 = jnp.sum(xf, axis=axes)          # (B, C)
        s2 = jnp.sum(xf * xf, axis=axes)     # (B, C)
        n = 1
        for a in axes:
            n *= x.shape[a]
        n *= C // G
        gmean = (s1 @ assign) / n            # (B, G)
        gms = (s2 @ assign) / n
        gvar = jnp.maximum(gms - gmean**2, 0.0)
        k = jax.lax.rsqrt(gvar + self.epsilon)
        # Broadcast back to channels.
        kc = (k @ assign.T)                  # (B, C)
        mc = (gmean @ assign.T)
        dt = x.dtype
        expand = (slice(None),) + (None,) * len(axes) + (slice(None),)
        y = (x - mc[expand].astype(dt)) * kc[expand].astype(dt)
        return y * scale.astype(dt) + bias.astype(dt)


def merged_group_stats_norm(x, affines, blocks, epsilon: float = 1e-5):
    """Several independent per-channel-block GroupNorms in ONE pass.

    The multi-scale MSG chain concatenates every scale's channels into one
    tensor; each scale's GroupNorm must see only its own block.  A
    block-diagonal group-assignment matrix generalizes GroupStatsNorm's
    (C, G) pooling matmul to all scales at once — one s1/s2 reduction over
    the big tensor instead of one per scale (and one layout for the whole
    chain).  Math per block is identical to GroupStatsNorm == nn.GroupNorm
    (tests/test_layers.py).

    :param x: (B, ..., sum C_b).
    :param affines: per-block (scale, bias) pairs, shapes (C_b,).
    :param blocks: per-block (C_b, num_groups_b).
    """
    import numpy as np

    C = x.shape[-1]
    assert C == sum(c for c, _ in blocks), (C, blocks)
    g_total = sum(g for _, g in blocks)
    assign = np.zeros((C, g_total), np.float32)
    n_vec = np.zeros((g_total,), np.float32)
    spatial = 1
    for a in range(1, x.ndim - 1):
        spatial *= x.shape[a]
    c_off = g_off = 0
    for c, g in blocks:
        assert c % g == 0, (c, g)
        per = c // g
        for j in range(g):
            assign[c_off + j * per : c_off + (j + 1) * per, g_off + j] = 1.0
        n_vec[g_off : g_off + g] = per * spatial
        c_off += c
        g_off += g
    assign = jnp.asarray(assign)
    n_vec = jnp.asarray(n_vec)
    scale = jnp.concatenate([s for s, _ in affines])
    bias = jnp.concatenate([b for _, b in affines])

    xf = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim - 1))
    s1 = jnp.sum(xf, axis=axes)          # (B, C)
    s2 = jnp.sum(xf * xf, axis=axes)
    gmean = (s1 @ assign) / n_vec        # (B, G_total)
    gms = (s2 @ assign) / n_vec
    gvar = jnp.maximum(gms - gmean**2, 0.0)
    k = jax.lax.rsqrt(gvar + epsilon)
    kc = k @ assign.T                    # (B, C)
    mc = gmean @ assign.T
    dt = x.dtype
    expand = (slice(None),) + (None,) * len(axes) + (slice(None),)
    y = (x - mc[expand].astype(dt)) * kc[expand].astype(dt)
    return y * scale.astype(dt) + bias.astype(dt)


class PointwiseConv(nn.Module):
    """Dense + optional norm + optional activation on the channel axis.

    Equivalent of the reference Conv1d/Conv2d(kernel=1) units
    (utils/nn_util.py:45-107): bias only when no norm follows.
    """

    features: int
    norm: NormSpec = None
    act: bool = True

    @nn.compact
    def __call__(self, x, split=None):
        """`split`: optional (raw, center_in) replacing x — computes
        Dense(raw) - Dense(center_in)[..., None, :] by linearity (only valid
        for bias-free layers, i.e. when a norm follows; see
        flowstep3d._NormedConvStack for the rationale and numerics).  Runs
        in f32 with HIGH matmul precision — raw xyz columns carry
        scene-scale magnitudes."""
        if split is not None:
            assert self.norm is not None  # bias-free, else b would cancel
            import jax

            raw, center_in = split
            d = nn.Dense(
                self.features, use_bias=False, kernel_init=kaiming_normal,
                dtype=None, precision=jax.lax.Precision.HIGH,
            )
            x = d(raw) - d(center_in)[..., None, :]
            if _COMPUTE_DTYPE is not None:
                x = x.astype(_COMPUTE_DTYPE)
        else:
            x = nn.Dense(
                self.features,
                use_bias=self.norm is None,
                kernel_init=kaiming_normal,
                dtype=_COMPUTE_DTYPE,
            )(x)
        norm_layer = make_norm(self.norm)
        if norm_layer is not None:
            # The norm's own dtype mirrors the compute dtype (stats in f32
            # internally); no f32 upcast of the full activation tensor.
            x = norm_layer(x)
        if self.act:
            x = nn.relu(x)
        return x


class SharedMLP(nn.Module):
    """Stack of pointwise conv units; every layer has norm + ReLU.

    Reference: SharedMLP (utils/nn_util.py:151-168).
    :param channels: output dims per layer (reference's mlp[1:] — input dim is
        inferred).
    """

    channels: Sequence[int]
    norm: NormSpec = None

    @nn.compact
    def __call__(self, x, split_first=None):
        """`split_first`: optional (raw, center_in) for the first layer
        (see PointwiseConv.split)."""
        for i, c in enumerate(self.channels):
            if i == 0 and split_first is not None:
                x = PointwiseConv(c, norm=self.norm, act=True)(
                    None, split=split_first
                )
            else:
                x = PointwiseConv(c, norm=self.norm, act=True)(x)
        return x


def raw_split_inputs(xyz, new_xyz, features, idx):
    """(raw, center_in) pair for the raw-gather split first Dense (see
    PointwiseConv.split / flowstep3d._NormedConvStack): one fused gather of
    [xyz || features] rows plus the per-point center correction input
    [center || zeros].  Shared by FlowSAModule and the GRU's convz/convr."""
    from ogc_tpu import ops

    raw = ops.group(jnp.concatenate([xyz, features], axis=-1), idx)
    center_in = jnp.concatenate(
        [
            new_xyz,
            jnp.zeros(
                new_xyz.shape[:2] + (features.shape[-1],), new_xyz.dtype
            ),
        ],
        axis=-1,
    )
    return raw, center_in


class MLP(nn.Module):
    """Linear -> ReLU -> Linear (the transformer feed-forward / input MLP
    shape used in utils/transformer_util.py:24-28, 79-83)."""

    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim)(x)
