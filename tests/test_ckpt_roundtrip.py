"""File-level checkpoint interop roundtrip (VERDICT r3 #5).

The reference writes .pth.tar blobs via checkpoint_state/save_checkpoint
(utils/pytorch_util.py:84-100) and its released FlowStep3D weights ship as
Lightning {'state_dict': {'model.<k>': v}} blobs (test_flow_kittisf.py:
42-44).  This test exercises the ENTIRE consumer chain on files those
exact writers produced:

  reference writer (.pth.tar / .ckpt, torch subprocess)
    -> tools/torch_ckpt_to_npz.py (torch subprocess)
    -> utils.torch_interop.load_npz_state -> *_from_torch mapping
    -> flax forward == the reference forward golden from the same weights.

Only the Dropbox download itself remains untested (no egress; BASELINE.md
runbook).  Torch never enters this process (CLAUDE.md deadlock).
"""

import os.path as osp
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not osp.isdir(REF), reason="reference repo not available"
)


def _run(argv):
    r = subprocess.run(
        [sys.executable] + argv, capture_output=True, text=True,
        timeout=600, cwd=REPO,
    )
    if r.returncode != 0:
        pytest.skip(f"torch subprocess failed: {r.stderr[-800:]}")
    return r


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ref_ckpts")
    _run([osp.join(REPO, "tools", "torch_ckpt_write.py"), str(d),
          "--ref_root", REF])
    return d


@pytest.fixture(scope="module")
def exact_neighbors():
    from ogc_tpu import ops

    ops.set_exact_neighbors(True)
    yield
    ops.set_exact_neighbors(False)


def test_pth_tar_roundtrip_segnet(ckpt_dir, tmp_path, exact_neighbors):
    """best.pth.tar ({'model_state': state_dict}, auto-detected) -> npz ->
    flax params -> forward equals the reference golden."""
    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.utils.torch_interop import (
        load_npz_state, segnet_params_from_torch,
    )

    npz = str(tmp_path / "seg.npz")
    _run([osp.join(REPO, "tools", "torch_ckpt_to_npz.py"),
          str(ckpt_dir / "best.pth.tar"), npz])
    state = load_npz_state(npz)
    z = np.load(ckpt_dir / "segnet_golden.npz")

    pc = jnp.asarray(z["pc"])
    model = MaskFormer3D(n_slot=8, n_point=512, arch="sapien",
                         n_transformer_layer=2, transformer_embed_dim=128)
    params = segnet_params_from_torch(
        state, model.init(jax.random.PRNGKey(0), pc, pc)
    )
    mask = np.asarray(model.apply(params, pc, pc))
    np.testing.assert_allclose(mask, z["mask"], atol=2e-4)
    assert (mask.argmax(-1) == z["mask"].argmax(-1)).mean() == 1.0


def test_lightning_ckpt_roundtrip_flownet(ckpt_dir, tmp_path,
                                          exact_neighbors):
    """Lightning blob -> --strip_prefix 6 (the reference's k[6:]) -> npz ->
    flax variables -> all refinement iterations equal the golden."""
    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.utils.torch_interop import (
        flownet_variables_from_torch, load_npz_state,
    )

    npz = str(tmp_path / "flow.npz")
    _run([osp.join(REPO, "tools", "torch_ckpt_to_npz.py"),
          str(ckpt_dir / "flow_lightning.ckpt"), npz,
          "--strip_prefix", "6"])
    state = load_npz_state(npz)
    assert not any(k.startswith("model.") for k in state)  # prefix gone
    z = np.load(ckpt_dir / "flownet_golden.npz")

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


def test_pth_tar_current_equals_best(ckpt_dir, tmp_path):
    """save_checkpoint(is_best=True) writes identical current/best blobs —
    both convert to identical arrays (guards the shutil.copyfile path)."""
    a, b = str(tmp_path / "cur.npz"), str(tmp_path / "best.npz")
    _run([osp.join(REPO, "tools", "torch_ckpt_to_npz.py"),
          str(ckpt_dir / "current.pth.tar"), a])
    _run([osp.join(REPO, "tools", "torch_ckpt_to_npz.py"),
          str(ckpt_dir / "best.pth.tar"), b])
    za, zb = np.load(a), np.load(b)
    assert sorted(za.files) == sorted(zb.files)
    for k in za.files:
        np.testing.assert_array_equal(za[k], zb[k])


def test_import_tool_to_eval_loader(ckpt_dir, tmp_path, exact_neighbors):
    """tools/import_torch_ckpt.py -> utils.checkpoint.load_checkpoint (the
    eval CLIs' loader): the imported framework checkpoint restores into a
    fresh init tree and reproduces the reference forward golden — the full
    runbook steps 2-4 on a reference-written .pth.tar."""
    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.utils.checkpoint import load_checkpoint

    npz = str(tmp_path / "seg.npz")
    _run([osp.join(REPO, "tools", "torch_ckpt_to_npz.py"),
          str(ckpt_dir / "best.pth.tar"), npz])
    out = str(tmp_path / "imported" / "best")
    (tmp_path / "imported").mkdir()
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "import_torch_ckpt.py"),
         "segnet", npz, out, "--arch", "sapien", "--n_point", "512",
         "--n_slot", "8"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={**__import__("os").environ, "OGC_PLATFORM": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-800:]

    z = np.load(ckpt_dir / "segnet_golden.npz")
    pc = jnp.asarray(z["pc"])
    model = MaskFormer3D(n_slot=8, n_point=512, arch="sapien",
                         n_transformer_layer=2, transformer_embed_dim=128)
    params = model.init(jax.random.PRNGKey(0), pc, pc)
    params = load_checkpoint(out, params)
    mask = np.asarray(model.apply(params, pc, pc))
    np.testing.assert_allclose(mask, z["mask"], atol=2e-4)
