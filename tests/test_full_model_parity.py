"""Executed full-model numeric parity against the UNMODIFIED reference.

Generates forward goldens by running the reference PyTorch models on CPU
(tools/torch_golden_gen.py in a subprocess — torch and JAX must not share a
process) with tools/pointnet2_cpu_shim standing in for the CUDA extension,
then maps the state dict into the flax models and compares outputs.

This executes the BASELINE.md parity procedure end-to-end on random
weights; released checkpoints go through the identical path
(tools/torch_ckpt_to_npz.py -> segnet_params_from_torch /
flownet_variables_from_torch).  Skips when /root/reference is absent.
"""

import os.path as osp
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not osp.isdir(REF), reason="reference repo not available"
)


def _gen(model, out):
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "torch_golden_gen.py"),
         model, out, "--ref_root", REF],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    if r.returncode != 0:
        pytest.skip(f"golden generation failed: {r.stderr[-800:]}")


@pytest.fixture(scope="module")
def exact_neighbors():
    from ogc_tpu import ops

    ops.set_exact_neighbors(True)
    yield
    ops.set_exact_neighbors(False)


def test_segnet_full_forward_parity(tmp_path_factory, exact_neighbors):
    out = str(tmp_path_factory.mktemp("golden") / "segnet.npz")
    _gen("segnet", out)
    z = np.load(out)
    state = {k[2:]: z[k] for k in z.files if k.startswith("w/")}

    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.utils.torch_interop import segnet_params_from_torch

    pc = jnp.asarray(z["pc"])
    model = MaskFormer3D(n_slot=8, n_point=512, arch="sapien",
                         n_transformer_layer=2, transformer_embed_dim=128)
    params = segnet_params_from_torch(
        state, model.init(jax.random.PRNGKey(0), pc, pc)
    )
    mask = np.asarray(model.apply(params, pc, pc))
    np.testing.assert_allclose(mask, z["mask"], atol=2e-4)
    assert (mask.argmax(-1) == z["mask"].argmax(-1)).mean() == 1.0


def test_flownet_full_forward_parity(tmp_path_factory, exact_neighbors):
    out = str(tmp_path_factory.mktemp("golden") / "flownet.npz")
    _gen("flownet", out)
    z = np.load(out)
    state = {k[2:]: z[k] for k in z.files if k.startswith("w/")}

    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.utils.torch_interop import flownet_variables_from_torch

    pc1, pc2 = jnp.asarray(z["pc1"]), jnp.asarray(z["pc2"])
    model = FlowStep3D(npoint=512, arch="sapien", loc_flow_nn=8,
                       loc_flow_rad=0.1, k_decay_fact=1.0)
    variables = flownet_variables_from_torch(
        state, model.init(jax.random.PRNGKey(0), pc1, pc2, pc1, pc2, 2)
    )
    flows = model.apply(variables, pc1, pc2, pc1, pc2, 4, train=False)
    for i in range(int(z["n_flows"])):
        np.testing.assert_allclose(
            np.asarray(flows[i]), z[f"flow{i}"], atol=2e-5,
            err_msg=f"refinement iter {i}",
        )
