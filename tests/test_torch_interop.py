"""Checkpoint interop tests: map synthesized torch-layout state dicts into
the flax trees and verify numerics against independent numpy implementations
of the torch semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import flax.linen as nn

from ogc_tpu.models.segnet import MaskFormer3D
from ogc_tpu.models.flownet import FlowStep3D
from ogc_tpu.utils import torch_interop as TI


def np_torch_mha(x_q, x_kv, in_w, in_b, out_w, out_b, n_head):
    """Numpy re-implementation of torch nn.MultiheadAttention forward
    (batch_first) for verification."""
    E = x_q.shape[-1]
    hd = E // n_head
    q = x_q @ in_w[:E].T + in_b[:E]
    k = x_kv @ in_w[E:2 * E].T + in_b[E:2 * E]
    v = x_kv @ in_w[2 * E:].T + in_b[2 * E:]

    def split(a):  # (B, N, E) -> (B, H, N, hd)
        B, N, _ = a.shape
        return a.reshape(B, N, n_head, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    attn = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(hd)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    out = attn @ vh  # (B, H, Nq, hd)
    out = out.transpose(0, 2, 1, 3).reshape(x_q.shape[0], x_q.shape[1], E)
    return out @ out_w.T + out_b


def test_mha_mapping_matches_torch_semantics():
    rng = np.random.RandomState(0)
    E, H, Nq, Nk, B = 32, 4, 5, 11, 2
    in_w = rng.randn(3 * E, E).astype(np.float32) * 0.1
    in_b = rng.randn(3 * E).astype(np.float32) * 0.1
    out_w = rng.randn(E, E).astype(np.float32) * 0.1
    out_b = rng.randn(E).astype(np.float32) * 0.1

    mha = nn.MultiHeadDotProductAttention(num_heads=H, qkv_features=E,
                                          out_features=E)
    xq = rng.randn(B, Nq, E).astype(np.float32)
    xkv = rng.randn(B, Nk, E).astype(np.float32)
    params = mha.init(jax.random.PRNGKey(0), inputs_q=jnp.asarray(xq),
                      inputs_k=jnp.asarray(xkv), inputs_v=jnp.asarray(xkv))
    tree = jax.tree_util.tree_map(np.asarray, params)
    state = {
        "attn.in_proj_weight": in_w,
        "attn.in_proj_bias": in_b,
        "attn.out_proj.weight": out_w,
        "attn.out_proj.bias": out_b,
    }
    TI._map_mha(state, "attn", tree, ["params"], H)

    got = np.asarray(
        mha.apply(tree, inputs_q=jnp.asarray(xq), inputs_k=jnp.asarray(xkv),
                  inputs_v=jnp.asarray(xkv))
    )
    want = np_torch_mha(xq, xkv, in_w, in_b, out_w, out_b, H)
    np.testing.assert_allclose(got, want, atol=2e-5)


def _inverse_conv(kernel):
    """flax Dense kernel (C_in, C_out) -> torch conv weight (C_out, C_in, 1, 1)."""
    return np.asarray(kernel).T[..., None, None]


def synthesize_segnet_state(params, rng, n_layer):
    """Build a torch-layout state dict whose values are random but whose
    SHAPES are derived (by inverse transforms) from the flax tree."""
    p = params["params"]
    state = {}

    def rnd(shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    def conv_entries(prefix, node, gn=True):
        j = 0
        while f"PointwiseConv_{j}" in node:
            leaf = node[f"PointwiseConv_{j}"]
            cin, cout = np.shape(leaf["Dense_0"]["kernel"])
            state[f"{prefix}.layer{j}.conv.weight"] = rnd((cout, cin, 1, 1))
            if gn:
                state[f"{prefix}.layer{j}.normlayer.gn.weight"] = rnd((cout,))
                state[f"{prefix}.layer{j}.normlayer.gn.bias"] = rnd((cout,))
            j += 1

    i = 0
    while f"sa{i}" in p:
        s = 0
        while f"SharedMLP_{s}" in p[f"sa{i}"]:
            conv_entries(f"SA_modules.{i}.mlps.{s}", p[f"sa{i}"][f"SharedMLP_{s}"])
            s += 1
        i += 1
    i = 0
    while f"fp{i}" in p:
        conv_entries(f"FP_modules.{i}.mlp", p[f"fp{i}"]["SharedMLP_0"])
        i += 1

    mf = p["mf_head"]
    K, E = np.shape(mf["query"]["embedding"])
    state["MF_head.query.weight"] = rnd((K, E))
    cin = np.shape(mf["MLP_0"]["Dense_0"]["kernel"])[0]
    state["MF_head.mlp_input.0.weight"] = rnd((E, cin))
    state["MF_head.mlp_input.0.bias"] = rnd((E,))
    state["MF_head.mlp_input.2.weight"] = rnd((E, E))
    state["MF_head.mlp_input.2.bias"] = rnd((E,))
    state["MF_head.norm_input.weight"] = rnd((E,))
    state["MF_head.norm_input.bias"] = rnd((E,))
    for l in range(n_layer):
        tl = f"MF_head.transformer_layers.{l}"
        for name in ("norm_slot1", "norm_slot2", "norm_pre_ff"):
            state[f"{tl}.{name}.weight"] = rnd((E,))
            state[f"{tl}.{name}.bias"] = rnd((E,))
        for attn in ("cross_attn", "self_attn"):
            state[f"{tl}.{attn}.in_proj_weight"] = rnd((3 * E, E))
            state[f"{tl}.{attn}.in_proj_bias"] = rnd((3 * E,))
            state[f"{tl}.{attn}.out_proj.weight"] = rnd((E, E))
            state[f"{tl}.{attn}.out_proj.bias"] = rnd((E,))
        state[f"{tl}.mlp.0.weight"] = rnd((E, E))
        state[f"{tl}.mlp.0.bias"] = rnd((E,))
        state[f"{tl}.mlp.2.weight"] = rnd((E, E))
        state[f"{tl}.mlp.2.bias"] = rnd((E,))

    state["object_mlp.0.conv.weight"] = _inverse_conv(
        rnd(np.shape(p["object_mlp0"]["Dense_0"]["kernel"]))
    )
    cout = np.shape(p["object_mlp0"]["GroupNorm_0"]["scale"])[0]
    state["object_mlp.0.normlayer.gn.weight"] = rnd((cout,))
    state["object_mlp.0.normlayer.gn.bias"] = rnd((cout,))
    state["object_mlp.1.conv.weight"] = _inverse_conv(
        rnd(np.shape(p["object_mlp1"]["Dense_0"]["kernel"]))
    )
    state["object_mlp.1.conv.bias"] = rnd(
        np.shape(p["object_mlp1"]["Dense_0"]["bias"])
    )
    return state


def test_segnet_full_mapping_runs_and_sticks():
    model = MaskFormer3D(n_slot=4, n_point=64, arch="sapien",
                         n_transformer_layer=1, transformer_embed_dim=64)
    pc = jnp.zeros((1, 64, 3))
    params = model.init(jax.random.PRNGKey(0), pc, pc)
    rng = np.random.RandomState(1)
    state = synthesize_segnet_state(
        jax.tree_util.tree_map(np.asarray, params), rng, n_layer=1
    )
    mapped = TI.segnet_params_from_torch(state, params, n_transformer_layer=1)

    # Specific leaves must carry the (transformed) torch values.
    got = mapped["params"]["mf_head"]["query"]["embedding"]
    np.testing.assert_allclose(got, state["MF_head.query.weight"])
    got = mapped["params"]["sa0"]["SharedMLP_0"]["PointwiseConv_0"]["Dense_0"]["kernel"]
    np.testing.assert_allclose(
        got, state["SA_modules.0.mlps.0.layer0.conv.weight"][:, :, 0, 0].T
    )

    rng2 = np.random.RandomState(2)
    x = jnp.asarray(rng2.rand(1, 64, 3).astype(np.float32))
    mask = model.apply(mapped, x, x)
    assert np.isfinite(np.asarray(mask)).all()


def test_flownet_mapping_runs_and_sticks():
    model = FlowStep3D(npoint=64, arch="sapien")
    pc = jnp.zeros((1, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), pc, pc, pc, pc, 2)
    tree = jax.tree_util.tree_map(np.asarray, variables)
    rng = np.random.RandomState(3)

    state = {}

    def rnd(shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    for torch_prefix, flax_name, has_norm in TI._FLOW_SA_MAP:
        if flax_name not in tree["params"]:
            continue
        stack = tree["params"][flax_name]["_NormedConvStack_0"]
        j = 0
        while f"Dense_{j}" in stack:
            cin, cout = np.shape(stack[f"Dense_{j}"]["kernel"])
            state[f"{torch_prefix}.mlp_convs.{j}.weight"] = rnd((cout, cin, 1, 1))
            if has_norm:
                state[f"{torch_prefix}.mlp_bns.{j}.weight"] = rnd((cout,))
                state[f"{torch_prefix}.mlp_bns.{j}.bias"] = rnd((cout,))
                state[f"{torch_prefix}.mlp_bns.{j}.running_mean"] = rnd((cout,))
                state[f"{torch_prefix}.mlp_bns.{j}.running_var"] = np.abs(
                    rnd((cout,))
                ) + 1.0
            j += 1
    for torch_prefix, flax_name in TI._FLOW_FC_MAP:
        cin, cout = np.shape(tree["params"][flax_name]["kernel"])
        state[f"{torch_prefix}.weight"] = rnd((cout, cin))
        state[f"{torch_prefix}.bias"] = rnd((cout,))
    state["global_corr_layer.epsilon"] = rnd((1,))

    mapped = TI.flownet_variables_from_torch(state, variables)
    got = mapped["batch_stats"]["enc_loc_sa1"]["_NormedConvStack_0"][
        "SchedulableBatchNorm_0"]["mean"]
    np.testing.assert_allclose(
        got, state["encoder_loc.sa1.mlp_bns.0.running_mean"]
    )
    np.testing.assert_allclose(
        np.asarray(mapped["params"]["epsilon"]),
        state["global_corr_layer.epsilon"],
    )

    rng2 = np.random.RandomState(4)
    x = jnp.asarray(rng2.rand(1, 64, 3).astype(np.float32))
    flows = model.apply(mapped, x, x, x, x, 2, train=False)
    assert np.isfinite(np.asarray(flows[-1])).all()
