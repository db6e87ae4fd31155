"""Map reference PyTorch checkpoints onto the flax parameter trees.

This is the numeric-parity mechanism (BASELINE.md): load the reference's
released .pth.tar / Lightning checkpoints (converted to npz by
tools/torch_ckpt_to_npz.py — torch must not be imported into a JAX process
here), remap every tensor into the MaskFormer3D / FlowStep3D flax trees, and
evaluate both stacks on identical inputs.

Layout conventions translated:
  conv1x1 weight (C_out, C_in, 1, 1)  -> Dense kernel (C_in, C_out)
  linear weight (out, in)             -> Dense kernel (in, out)
  GroupNorm/LayerNorm weight/bias     -> scale/bias
  BatchNorm running_mean/var          -> batch_stats mean/var
  MHA packed in_proj (3E, E)          -> query/key/value kernels (E, H, hd)
  MHA out_proj (E, E)                 -> out kernel (H, hd, E)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def load_npz_state(path: str) -> Dict[str, np.ndarray]:
    data = np.load(path)
    return {k: data[k] for k in data.files}


def _set(tree: Dict, path, value, expect_shape=True):
    """Assign value at a nested path, asserting the leaf exists and shapes
    match (catches mapping drift immediately)."""
    node = tree
    for p in path[:-1]:
        node = node[p]
    leaf = node[path[-1]]
    value = np.asarray(value)
    if expect_shape and tuple(np.shape(leaf)) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: "
            f"{np.shape(leaf)} vs {value.shape}"
        )
    node[path[-1]] = value.astype(np.asarray(leaf).dtype)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """(C_out, C_in, 1, 1) or (C_out, C_in, 1) -> (C_in, C_out)."""
    w = np.asarray(w)
    while w.ndim > 2:
        w = w[..., 0]
    return w.T


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.asarray(w).T


def _map_mha(state, prefix, tree, path, n_head):
    """Torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    in_w = state[f"{prefix}.in_proj_weight"]
    in_b = state[f"{prefix}.in_proj_bias"]
    E = in_w.shape[1]
    hd = E // n_head
    q_w, k_w, v_w = in_w[:E], in_w[E : 2 * E], in_w[2 * E :]
    q_b, k_b, v_b = in_b[:E], in_b[E : 2 * E], in_b[2 * E :]
    for name, w, b in (("query", q_w, q_b), ("key", k_w, k_b),
                       ("value", v_w, v_b)):
        _set(tree, path + [name, "kernel"], w.T.reshape(E, n_head, hd))
        _set(tree, path + [name, "bias"], b.reshape(n_head, hd))
    out_w = state[f"{prefix}.out_proj.weight"]
    out_b = state[f"{prefix}.out_proj.bias"]
    _set(tree, path + ["out", "kernel"], out_w.T.reshape(n_head, hd, E))
    _set(tree, path + ["out", "bias"], out_b)


def _map_shared_mlp(state, prefix, tree, path, n_layers):
    """Reference SharedMLP (Conv2d k=1 + GroupNorm per layer,
    utils/nn_util.py:151-168) -> SharedMLP/PointwiseConv_j."""
    for j in range(n_layers):
        _set(
            tree,
            path + [f"PointwiseConv_{j}", "Dense_0", "kernel"],
            _conv_kernel(state[f"{prefix}.layer{j}.conv.weight"]),
        )
        _set(
            tree,
            path + [f"PointwiseConv_{j}", "GroupNorm_0", "scale"],
            state[f"{prefix}.layer{j}.normlayer.gn.weight"],
        )
        _set(
            tree,
            path + [f"PointwiseConv_{j}", "GroupNorm_0", "bias"],
            state[f"{prefix}.layer{j}.normlayer.gn.bias"],
        )


def segnet_params_from_torch(
    state: Mapping[str, np.ndarray],
    params: Dict[str, Any],
    n_transformer_layer: int = 2,
    n_head: int = 8,
) -> Dict[str, Any]:
    """Fill a MaskFormer3D flax param tree from the reference state dict
    (models/segnet_*.py key space).  Returns a new tree (same treedef)."""
    import jax

    tree = jax.tree_util.tree_map(np.asarray, params)
    p = tree["params"] if "params" in tree else tree

    # SA modules: SA_modules.{i}.mlps.{s}.layer{j}.
    i = 0
    while f"SA_modules.{i}.mlps.0.layer0.conv.weight" in state:
        s = 0
        while f"SA_modules.{i}.mlps.{s}.layer0.conv.weight" in state:
            n_layers = 0
            while f"SA_modules.{i}.mlps.{s}.layer{n_layers}.conv.weight" in state:
                n_layers += 1
            _map_shared_mlp(
                state, f"SA_modules.{i}.mlps.{s}",
                p, [f"sa{i}", f"SharedMLP_{s}"], n_layers,
            )
            s += 1
        i += 1

    # FP modules: FP_modules.{i}.mlp.layer{j} (index order matches fp{i}).
    i = 0
    while f"FP_modules.{i}.mlp.layer0.conv.weight" in state:
        n_layers = 0
        while f"FP_modules.{i}.mlp.layer{n_layers}.conv.weight" in state:
            n_layers += 1
        _map_shared_mlp(
            state, f"FP_modules.{i}.mlp", p, [f"fp{i}", "SharedMLP_0"], n_layers
        )
        i += 1

    # MaskFormer head.
    mf = ["mf_head"]
    _set(p, mf + ["query", "embedding"], state["MF_head.query.weight"])
    _set(p, mf + ["MLP_0", "Dense_0", "kernel"],
         _linear_kernel(state["MF_head.mlp_input.0.weight"]))
    _set(p, mf + ["MLP_0", "Dense_0", "bias"], state["MF_head.mlp_input.0.bias"])
    _set(p, mf + ["MLP_0", "Dense_1", "kernel"],
         _linear_kernel(state["MF_head.mlp_input.2.weight"]))
    _set(p, mf + ["MLP_0", "Dense_1", "bias"], state["MF_head.mlp_input.2.bias"])
    _set(p, mf + ["LayerNorm_0", "scale"], state["MF_head.norm_input.weight"])
    _set(p, mf + ["LayerNorm_0", "bias"], state["MF_head.norm_input.bias"])
    if "MF_head.input_pos_enc.weight" in state:
        _set(p, mf + ["Dense_0", "kernel"],
             _linear_kernel(state["MF_head.input_pos_enc.weight"]))
        _set(p, mf + ["Dense_0", "bias"], state["MF_head.input_pos_enc.bias"])

    for l in range(n_transformer_layer):
        tl = f"MF_head.transformer_layers.{l}"
        dst = mf + [f"TransformerDecoderLayer_{l}"]
        for ln_idx, ln_name in ((0, "norm_slot1"), (1, "norm_slot2"),
                                (2, "norm_pre_ff")):
            _set(p, dst + [f"LayerNorm_{ln_idx}", "scale"],
                 state[f"{tl}.{ln_name}.weight"])
            _set(p, dst + [f"LayerNorm_{ln_idx}", "bias"],
                 state[f"{tl}.{ln_name}.bias"])
        _map_mha(state, f"{tl}.cross_attn", p,
                 dst + ["MultiHeadDotProductAttention_0"], n_head)
        _map_mha(state, f"{tl}.self_attn", p,
                 dst + ["MultiHeadDotProductAttention_1"], n_head)
        _set(p, dst + ["MLP_0", "Dense_0", "kernel"],
             _linear_kernel(state[f"{tl}.mlp.0.weight"]))
        _set(p, dst + ["MLP_0", "Dense_0", "bias"], state[f"{tl}.mlp.0.bias"])
        _set(p, dst + ["MLP_0", "Dense_1", "kernel"],
             _linear_kernel(state[f"{tl}.mlp.2.weight"]))
        _set(p, dst + ["MLP_0", "Dense_1", "bias"], state[f"{tl}.mlp.2.bias"])

    # Object MLP: conv1d(embed, gn) + conv1d(64, bias, no act).
    _set(p, ["object_mlp0", "Dense_0", "kernel"],
         _conv_kernel(state["object_mlp.0.conv.weight"]))
    _set(p, ["object_mlp0", "GroupNorm_0", "scale"],
         state["object_mlp.0.normlayer.gn.weight"])
    _set(p, ["object_mlp0", "GroupNorm_0", "bias"],
         state["object_mlp.0.normlayer.gn.bias"])
    _set(p, ["object_mlp1", "Dense_0", "kernel"],
         _conv_kernel(state["object_mlp.1.conv.weight"]))
    _set(p, ["object_mlp1", "Dense_0", "bias"], state["object_mlp.1.conv.bias"])

    return tree


# ---------------------------------------------------------------------------
# FlowStep3D
# ---------------------------------------------------------------------------

# torch module prefix -> flax module name (models/flownet_*.py key space).
_FLOW_SA_MAP = [
    ("encoder_loc.sa1", "enc_loc_sa1", True),
    ("encoder_loc.sa2", "enc_loc_sa2", True),
    ("encoder_glob.sa1", "enc_glob_sa1", True),
    ("encoder_glob.sa2", "enc_glob_sa2", True),
    ("encoder_glob.sa3", "enc_glob_sa3", True),
    ("global_corr_layer.sa1", "corr_sa1", True),
    ("global_corr_layer.sa2", "corr_sa2", True),
    ("h0_net.sa1", "h0_sa1", True),
    ("h0_net.sa2", "h0_sa2", False),  # use_act=False: bns unused
    ("flow0_regressor.sa1", "flow0_sa1", True),
    ("flow_regressor.sa1", "flow_sa1", True),
    ("flow_regressor.sa2", "flow_sa2", True),
    ("gru.convz", "gru_convz", False),
    ("gru.convr", "gru_convr", False),
    ("gru.convq", "gru_convq", False),
    ("flow_conv1", "flow_conv1", True),
    ("flow_conv2", "flow_conv2", True),
    ("local_corr_layer", "local_corr", True),
]

_FLOW_FC_MAP = [
    ("flow0_regressor.fc", "flow0_fc"),
    ("flow_regressor.fc", "flow_fc"),
]


def flownet_variables_from_torch(
    state: Mapping[str, np.ndarray], variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Fill a FlowStep3D flax variables dict ({'params', 'batch_stats'})
    from the reference state dict."""
    import jax

    tree = jax.tree_util.tree_map(np.asarray, variables)
    p = tree["params"]
    bs = tree["batch_stats"]

    for torch_prefix, flax_name, has_norm in _FLOW_SA_MAP:
        if f"{torch_prefix}.mlp_convs.0.weight" not in state:
            continue  # module absent in this arch variant
        j = 0
        while f"{torch_prefix}.mlp_convs.{j}.weight" in state:
            _set(
                p,
                [flax_name, "_NormedConvStack_0", f"Dense_{j}", "kernel"],
                _conv_kernel(state[f"{torch_prefix}.mlp_convs.{j}.weight"]),
            )
            if has_norm:
                bn = f"{torch_prefix}.mlp_bns.{j}"
                norm_name = f"SchedulableBatchNorm_{j}"
                if f"{bn}.running_mean" in state:
                    _set(p, [flax_name, "_NormedConvStack_0", norm_name,
                             "scale"], state[f"{bn}.weight"])
                    _set(p, [flax_name, "_NormedConvStack_0", norm_name,
                             "bias"], state[f"{bn}.bias"])
                    _set(bs, [flax_name, "_NormedConvStack_0", norm_name,
                              "mean"], state[f"{bn}.running_mean"])
                    _set(bs, [flax_name, "_NormedConvStack_0", norm_name,
                              "var"], state[f"{bn}.running_var"])
                else:  # InstanceNorm (affine only)
                    _set(p, [flax_name, "_NormedConvStack_0",
                             f"InstanceNorm_{j}", "scale"],
                         state[f"{bn}.weight"])
                    _set(p, [flax_name, "_NormedConvStack_0",
                             f"InstanceNorm_{j}", "bias"],
                         state[f"{bn}.bias"])
            j += 1

    for torch_prefix, flax_name in _FLOW_FC_MAP:
        _set(p, [flax_name, "kernel"],
             _linear_kernel(state[f"{torch_prefix}.weight"]))
        _set(p, [flax_name, "bias"], state[f"{torch_prefix}.bias"])

    _set(p, ["epsilon"], state["global_corr_layer.epsilon"])
    return tree
