"""The parity-gate CLI executes end-to-end: reference .pth → conversion →
whole-image square protocol → tolerance verdict (BASELINE.md row 1 command,
exercised with a random-init reference checkpoint since no trained .pth nor
egress exists in CI)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/Uformer_ProbSparse"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def pth_and_data(tmp_path_factory):
    from tests.test_torch_parity import _stub_timm
    import sys

    _stub_timm()
    sys.path.insert(0, REF)
    import My_model

    torch.manual_seed(0)
    m = My_model.Uformer(img_size=32, embed_dim=8, win_size=8,
                         token_projection="linear", token_mlp="leff",
                         drop_path_rate=0.0)
    root = tmp_path_factory.mktemp("gate")
    pth = root / "ref.pth"
    torch.save({"epoch": 1, "state_dict": m.state_dict()}, str(pth))

    from dehaze_tpu.data.images import save_img

    rng = np.random.default_rng(0)
    os.makedirs(root / "test" / "gt")
    os.makedirs(root / "test" / "hazy")
    for i in range(2):
        g = rng.uniform(size=(48, 48, 3)).astype(np.float32)
        save_img(str(root / "test" / "gt" / f"{i}.png"), g)
        save_img(str(root / "test" / "hazy" / f"{i}.png"),
                 np.clip(g * 0.7 + 0.2, 0, 1))
    return str(pth), str(root / "test")


def test_parity_gate_pass_and_fail(pth_and_data, capsys):
    from dehaze_tpu.cli.parity_gate import main

    pth, data = pth_and_data
    common = ["--ref_ckpt", pth, "--input_dir", data, "--attention", "full",
              "--embed_dim", "8", "--train_ps", "32", "--dtype", "float32"]
    # wide tolerance: must pass (and prints the measured PSNR)
    assert main(common + ["--expected_psnr", "0", "--tol", "1e9"]) == 0
    measured = float(
        capsys.readouterr().out.strip().splitlines()[-1].split()[1])
    # exact expectation at tight tolerance: parity OK
    assert main(common + ["--expected_psnr", f"{measured:.4f}",
                          "--tol", "0.05"]) == 0
    # wrong expectation: parity FAIL with rc 1
    assert main(common + ["--expected_psnr", f"{measured + 5:.4f}",
                          "--tol", "0.05"]) == 1
