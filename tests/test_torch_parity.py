"""End-to-end numerical parity against the reference PyTorch model.

Runs the reference's own `My_model.py` Uformer (W-MSA variant — fully
deterministic, unlike ProbSparse whose torch.randint sampling can't be
aligned with JAX RNG; ProbSparse parity is proven at the op level in
test_probsparse.py) as an oracle on CPU, converts its random-init weights
with `utils.convert_torch`, and asserts the dehaze_tpu forward matches.

This exercises: weight conversion (Linear/Conv/ConvTranspose/LN/dwconv/qkv
fusion), InputProj/OutputProj, window partition + shift + SW mask, rel-pos
bias gather, LeFF, down/upsampling, skip concat, global residual.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/Uformer_ProbSparse"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


def _stub_timm():
    """Minimal timm.models.layers stub so the reference module imports."""
    if "timm" in sys.modules:
        return
    import torch.nn as nn

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-mode identity is all the test needs
            if not self.training or not self.drop_prob:
                return x
            keep = 1 - self.drop_prob
            mask = torch.rand(x.shape[0], *([1] * (x.ndim - 1))) < keep
            return x * mask / keep

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


@pytest.fixture(scope="module")
def ref_model():
    _stub_timm()
    sys.path.insert(0, REF)
    import My_model  # noqa: E402  (reference W-MSA variant, run as oracle)

    torch.manual_seed(0)
    m = My_model.Uformer(img_size=32, embed_dim=8, win_size=8,
                         token_projection="linear", token_mlp="leff",
                         drop_path_rate=0.0)
    m.eval()
    return m


def test_full_model_parity_vs_reference_torch(ref_model):
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.models.uformer import Uformer
    from dehaze_tpu.utils.convert_torch import convert_uformer_state_dict

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        yt = ref_model(xt).numpy().transpose(0, 2, 3, 1)

    params = convert_uformer_state_dict(ref_model.state_dict(),
                                        attention="full")
    cfg = ModelConfig(img_size=32, embed_dim=8, attention="full",
                      dtype=jnp.float32, drop_path_rate=0.0)
    model = Uformer(cfg)
    key = jax.random.PRNGKey(0)
    yj = np.asarray(
        jax.jit(lambda p, x: model.apply({"params": p}, x))(params,
                                                            jnp.asarray(x))
    )
    assert yj.shape == yt.shape
    np.testing.assert_allclose(yj, yt, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("projection,se", [
    ("conv", False), ("linear_concat", False), ("linear", True),
])
def test_projection_variants_parity_vs_reference_torch(projection, se):
    """ConvProjection / LinearProjection_Concat_kv / SELayer parity against
    the reference's own W-MSA model (`My_model.py:241-331,422,515`)."""
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.models.uformer import Uformer
    from dehaze_tpu.utils.convert_torch import convert_uformer_state_dict

    _stub_timm()
    sys.path.insert(0, REF)
    import My_model

    torch.manual_seed(2)
    m = My_model.Uformer(img_size=32, embed_dim=8, win_size=8,
                         token_projection=projection, token_mlp="leff",
                         se_layer=se, drop_path_rate=0.0)
    m.eval()
    # ConvProjection passes `bias=True` positionally into Conv2d's `dilation`
    # slot (`My_model.py:252-254`); older torch coerced True→1, this version
    # rejects bool tuples. Normalize to the dilation the reference intends.
    for mod in m.modules():
        if isinstance(mod, torch.nn.Conv2d) and mod.dilation == (True, True):
            mod.dilation = (1, 1)

    rng = np.random.default_rng(3)
    x = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        yt = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(
            0, 2, 3, 1)

    params = convert_uformer_state_dict(
        m.state_dict(), attention="full", token_projection=projection,
        se_layer=se)
    cfg = ModelConfig(img_size=32, embed_dim=8, attention="full",
                      token_projection=projection, se_layer=se,
                      dtype=jnp.float32, drop_path_rate=0.0)
    yj = np.asarray(jax.jit(
        lambda p, x: Uformer(cfg).apply({"params": p}, x)
    )(params, jnp.asarray(x)))
    np.testing.assert_allclose(yj, yt, rtol=2e-4, atol=2e-4)


def _ref_wrap_pad(x: np.ndarray, L: int) -> np.ndarray:
    """The reference's exact canvas fill (`test_long_GPU.py:79-91`): zeros,
    frame top-left, right columns wrapped from the left, bottom rows copied
    from the ALREADY-PADDED canvas (so the corner quirk is included)."""
    B, H, W, C = x.shape
    big = np.zeros((B, L, L, C), x.dtype)
    L_H, L_W = L - H, L - W
    big[:, :H, :W] = x
    big[:, :H, W:W + L_W] = x[:, :, :L_W]
    big[:, H:H + L_H, :] = big[:, :L_H, :]
    return big


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["wmsa", "probsparse"])
def test_whole_image_geometry_parity(variant, monkeypatch):
    """Full-geometry parity (VERDICT r2 #2): the published wrap-pad protocol
    at a 384² canvas — 48×48 stage-0 window grid (>1 window row), shifted
    SW seams, the bumped-canvas rule (W=256, an exact ps multiple, still
    pads to 384, `test_long_GPU.py:84`), and the pre-padded-rows corner
    quirk — against the reference's own torch models at embed_dim 8:
    `My_model.py` (W-MSA) deterministic, `My_model_1.py` (ProbSparse
    flagship) with pinned key sampling on both sides."""
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.infer.tiled import make_whole_image_fn
    from dehaze_tpu.models.uformer import Uformer
    from dehaze_tpu.ops import probsparse as PS
    from dehaze_tpu.utils.convert_torch import convert_uformer_state_dict

    h, w, ps = 250, 256, 128
    L = 384  # (max(h, w) // ps + 1) * ps — bump applies though w % ps == 0
    rng = np.random.default_rng(11)
    x = rng.uniform(size=(1, h, w, 3)).astype(np.float32)

    from dehaze_tpu.cli.baseline_probe import _stub_modules

    _stub_modules(REF)
    torch.manual_seed(5)
    if variant == "wmsa":
        import My_model

        m = My_model.Uformer(img_size=128, embed_dim=8, win_size=8,
                             token_projection="linear", token_mlp="leff",
                             drop_path_rate=0.0)
        attention = "full"
    else:
        import My_model_1

        m = My_model_1.Uformer(img_size=128, embed_dim=8, win_size=8,
                               token_projection="linear", token_mlp="leff",
                               drop_path_rate=0.0)
        attention = "probsparse"
        # pin the ProbSparse key sampling identically on both sides: every
        # window has N = win² = 64 tokens at every stage, so one [64, u]
        # table covers all blocks (`attn.py:91` torch.randint)
        u = PS.probsparse_u(64)
        fixed_idx = rng.integers(0, 64, size=(64, u))
        monkeypatch.setattr(
            torch, "randint",
            lambda high, size, **kw: torch.from_numpy(
                fixed_idx[:size[0], :size[1]].copy()))
        monkeypatch.setattr(
            PS, "sample_indices",
            lambda key, l_q, l_k, u_part: jnp.asarray(
                fixed_idx[:l_q, :u_part].astype(np.int32)))
    m.eval()

    with torch.no_grad():
        canvas_t = torch.from_numpy(
            _ref_wrap_pad(x, L).transpose(0, 3, 1, 2))
        yt = m(canvas_t).numpy().transpose(0, 2, 3, 1)[:, :h, :w, :]
    yt = np.clip(yt, 0.0, 1.0)  # `test_long_GPU.py:94`

    params = convert_uformer_state_dict(m.state_dict(), attention=attention)
    cfg = ModelConfig(img_size=128, embed_dim=8, attention=attention,
                      dtype=jnp.float32, drop_path_rate=0.0)
    model = Uformer(cfg)
    key = jax.random.PRNGKey(0)

    def apply_fn(img):
        return model.apply({"params": params}, img, train=False,
                           rngs={"sample": key})

    run = make_whole_image_fn(apply_fn, h, w, ps=ps, square=True)
    yj = np.asarray(run(jnp.asarray(x)))
    assert yj.shape == yt.shape
    np.testing.assert_allclose(yj, yt, rtol=2e-4, atol=2e-4)


def test_converted_param_tree_matches_init_structure(ref_model):
    """Converted tree has exactly the structure/shapes Uformer initializes."""
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.models.uformer import Uformer
    from dehaze_tpu.utils.convert_torch import convert_uformer_state_dict

    params = convert_uformer_state_dict(ref_model.state_dict(),
                                        attention="full")
    cfg = ModelConfig(img_size=32, embed_dim=8, attention="full",
                      dtype=jnp.float32)
    model = Uformer(cfg)
    key = jax.random.PRNGKey(0)
    init = jax.jit(
        lambda: model.init({"params": key, "sample": key},
                           jnp.zeros((1, 32, 32, 3)))
    )()["params"]
    flat_a = jax.tree_util.tree_flatten_with_path(init)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(params)[0]
    paths_a = {jax.tree_util.keystr(p): v.shape for p, v in flat_a}
    paths_b = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in flat_b}
    assert paths_a == paths_b


def test_probsparse_converter_numerical_parity(ref_model):
    """ProbSparse variant: run the reference ProbAttention (torch.randint
    monkeypatched to fixed indices) against our probsparse path with the same
    sample indices and converted AttentionLayer weights."""
    import jax.numpy as jnp

    sys.path.insert(0, REF)
    from ProbSparse.attn import AttentionLayer  # reference module, oracle

    from dehaze_tpu.ops import probsparse as PS
    from dehaze_tpu.utils.convert_torch import _lin

    torch.manual_seed(1)
    C, H = 16, 2
    layer = AttentionLayer(C, H).eval()

    rng = np.random.default_rng(0)
    N, B_ = 16, 3
    x = rng.normal(size=(B_, N, C)).astype(np.float32) * 0.3
    bias = rng.normal(size=(H, N, N)).astype(np.float32) * 0.1
    u_part = PS.probsparse_u(N)
    fixed_idx = rng.integers(0, N, size=(N, u_part))

    real_randint = torch.randint
    try:
        torch.randint = lambda high, size, **kw: torch.from_numpy(
            fixed_idx[: size[0], : size[1]].copy())
        with torch.no_grad():
            yt, _ = layer(torch.from_numpy(x), torch.from_numpy(x),
                          torch.from_numpy(x), torch.from_numpy(bias), None)
        yt = yt.numpy()
    finally:
        torch.randint = real_randint

    sd = layer.state_dict()
    wq = _lin(sd, "query_projection")
    wk = _lin(sd, "key_projection")
    wv = _lin(sd, "value_projection")
    wo = _lin(sd, "out_projection")

    xj = jnp.asarray(x)
    q = (xj @ wq["kernel"] + wq["bias"]).reshape(B_, N, H, C // H)
    k = (xj @ wk["kernel"] + wk["bias"]).reshape(B_, N, H, C // H)
    v = (xj @ wv["kernel"] + wv["bias"]).reshape(B_, N, H, C // H)
    out = PS.probsparse_attention(
        q, k, v, sample_idx=jnp.asarray(fixed_idx.astype(np.int32)),
        rel_pos_bias=jnp.asarray(bias), layout="bnhd")
    yj = np.asarray(out.reshape(B_, N, C) @ wo["kernel"] + wo["bias"])
    np.testing.assert_allclose(yj, yt, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# FFA-Net: full-model parity vs the reference torch FFA
# ---------------------------------------------------------------------------

FFA_REF = ("/root/reference/FFA_how-do-vits-work-transformer/"
           "FFA_model/models/FFA.py")


@pytest.mark.skipif(not os.path.isfile(FFA_REF),
                    reason="reference FFA model not mounted")
def test_ffa_full_model_parity_vs_reference_torch():
    """Reference `FFA.py:73-110` forward (gps=3, blocks=2) as oracle; weights
    converted with `convert_ffa_state_dict`; asserts ≤2e-4 agreement.

    Exercises: pre conv, Block conv-relu(+x)-conv → CA → PA → +x, Group tail
    conv + residual, the 3-way fusion `w.view(-1, gps, dim)` channel-major
    reshape (FFA.py:105-107), final PALayer, post convs, global residual.
    """
    import importlib.util

    import jax
    import jax.numpy as jnp

    from dehaze_tpu.models.ffa import FFA
    from dehaze_tpu.utils.convert_torch import convert_ffa_state_dict

    spec = importlib.util.spec_from_file_location("ref_ffa_model", FFA_REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    ref = mod.FFA(gps=3, blocks=2)
    ref.eval()

    rng = np.random.default_rng(1)
    x = rng.uniform(size=(2, 24, 24, 3)).astype(np.float32)
    with torch.no_grad():
        yt = (ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
              .numpy().transpose(0, 2, 3, 1))

    params = convert_ffa_state_dict(ref.state_dict(), blocks=2)
    model = FFA(blocks=2)
    yj = np.asarray(
        jax.jit(lambda p, v: model.apply({"params": p}, v))(
            params, jnp.asarray(x))
    )
    assert yj.shape == yt.shape
    np.testing.assert_allclose(yj, yt, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not os.path.isfile(FFA_REF),
                    reason="reference FFA model not mounted")
def test_test_long_ffa_pth_end_to_end(tmp_path):
    """Drive `cli.test_long --arch ffa` on a reference-format .pth and check
    the saved outputs against the torch oracle (normalize → forward → clip,
    `FFA_model/test.py:49-60`) to PNG quantization tolerance.

    Covers in one pass: convert_ffa_state_dict (DataParallel prefixes,
    {'model': ...} wrapper), the hazy-only normalization wiring, and the
    native-resolution (no canvas) FFA eval protocol.
    """
    import importlib.util
    import subprocess
    import cv2

    from dehaze_tpu.data.images import load_img

    spec = importlib.util.spec_from_file_location("ref_ffa_model", FFA_REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(1)
    ref = mod.FFA(gps=3, blocks=1)
    ref.eval()

    data = tmp_path / "test"
    (data / "gt").mkdir(parents=True)
    (data / "hazy").mkdir()
    rng = np.random.default_rng(3)
    for i in range(2):
        for sub in ("gt", "hazy"):
            img = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(data / sub / f"{i}.png"), img)

    sd = {"module." + k: v for k, v in ref.state_dict().items()}
    pth = str(tmp_path / "ffa.pth")
    torch.save({"model": sd, "step": 1}, pth)

    out_dir = tmp_path / "res"
    cmd = [sys.executable, "-m", "dehaze_tpu.cli.test_long",
           "--arch", "ffa", "--ffa_blocks", "1", "--dtype", "float32",
           "--input_dir", str(data), "--weights", pth,
           "--result_dir", str(out_dir)]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=560,
                       env={**os.environ, "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": os.path.dirname(os.path.dirname(
                                os.path.abspath(__file__)))})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PSNR" in r.stdout

    mean = torch.tensor([0.64, 0.60, 0.58]).view(1, 3, 1, 1)
    std = torch.tensor([0.14, 0.15, 0.152]).view(1, 3, 1, 1)
    for i in range(2):
        hazy = load_img(str(data / "hazy" / f"{i}.png"))  # RGB [0,1] f32
        xt = torch.from_numpy(hazy.transpose(2, 0, 1))[None]
        with torch.no_grad():
            yt = ref((xt - mean) / std).clamp(0, 1).numpy()[0]
        got = load_img(str(out_dir / f"{i}.png"))
        np.testing.assert_allclose(got, yt.transpose(1, 2, 0), atol=2 / 255)


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["wmsa", "probsparse"])
def test_anyres_mask_parity_vs_reference_torch(variant, monkeypatch):
    """Any-resolution protocol oracle (`test_in_any_resolution.py:67-109`):
    expand2square to a 128² canvas with a centered 100×120 image, forward
    with the `1-mask` padding mask, crop the valid region — against the
    reference's own torch models (W-MSA deterministic; ProbSparse with
    pinned key sampling). Exercises the per-stage nearest-resize mask
    windowing and the not-shifted-mask quirk end-to-end.
    """
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.infer.anyres import make_anyres_fn
    from dehaze_tpu.models.uformer import Uformer
    from dehaze_tpu.ops import probsparse as PS
    from dehaze_tpu.utils.convert_torch import convert_uformer_state_dict

    h, w = 100, 120  # -> X = 128 canvas, centered with odd margins
    rng = np.random.default_rng(21)
    x = rng.uniform(size=(1, h, w, 3)).astype(np.float32)

    from dehaze_tpu.cli.baseline_probe import _stub_modules

    _stub_modules(REF)
    torch.manual_seed(9)
    if variant == "wmsa":
        import My_model

        m = My_model.Uformer(img_size=128, embed_dim=8, win_size=8,
                             token_projection="linear", token_mlp="leff",
                             drop_path_rate=0.0)
        attention = "full"
    else:
        import My_model_1

        m = My_model_1.Uformer(img_size=128, embed_dim=8, win_size=8,
                               token_projection="linear", token_mlp="leff",
                               drop_path_rate=0.0)
        attention = "probsparse"
        u = PS.probsparse_u(64)
        fixed_idx = rng.integers(0, 64, size=(64, u))
        monkeypatch.setattr(
            torch, "randint",
            lambda high, size, **kw: torch.from_numpy(
                fixed_idx[:size[0], :size[1]].copy()))
        monkeypatch.setattr(
            PS, "sample_indices",
            lambda key, l_q, l_k, u_part: jnp.asarray(
                fixed_idx[:l_q, :u_part].astype(np.int32)))
    m.eval()

    # reference expand2square (`test_in_any_resolution.py:67-80`)
    X = 128
    r0, c0 = (X - h) // 2, (X - w) // 2
    canvas_t = np.zeros((1, 3, X, X), np.float32)
    canvas_t[:, :, r0:r0 + h, c0:c0 + w] = x.transpose(0, 3, 1, 2)
    mask_t = np.zeros((1, 1, X, X), np.float32)
    mask_t[:, :, r0:r0 + h, c0:c0 + w] = 1.0
    with torch.no_grad():
        yt = m(torch.from_numpy(canvas_t),
               torch.from_numpy(1.0 - mask_t)).numpy()
    yt = yt[:, :, r0:r0 + h, c0:c0 + w].transpose(0, 2, 3, 1)
    yt = np.clip(yt, 0.0, 1.0)  # make_anyres_fn clips its crop

    params = convert_uformer_state_dict(m.state_dict(), attention=attention)
    cfg = ModelConfig(img_size=128, embed_dim=8, attention=attention,
                      dtype=jnp.float32, drop_path_rate=0.0)
    model = Uformer(cfg)
    key = jax.random.PRNGKey(0)

    def apply_fn(img, pad):
        return model.apply({"params": params}, img, train=False,
                           pad_mask=pad, rngs={"sample": key})

    run = make_anyres_fn(apply_fn, h, w, factor=128)
    yj = np.asarray(run(jnp.asarray(x)))
    assert yj.shape == yt.shape
    np.testing.assert_allclose(yj, yt, rtol=2e-4, atol=2e-4)


def test_unet_full_model_parity_vs_reference_torch():
    """Reference UNet (`My_model_1.py:48-115`, arch='UNet' via
    `utils/model_utils.py:84-88`) as oracle; weights converted with
    `convert_unet_state_dict`; ≤2e-4 agreement. Exercises ConvBlock
    (conv-lrelu-conv-lrelu + 1x1 shortcut), stride-2 pool convs,
    ConvTranspose ups, skip concats, global residual."""
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.models.unet import UNet
    from dehaze_tpu.utils.convert_torch import convert_unet_state_dict

    from dehaze_tpu.cli.baseline_probe import _stub_modules

    _stub_modules(REF)
    import My_model_1

    torch.manual_seed(3)
    ref = My_model_1.UNet(dim=8)
    ref.eval()

    rng = np.random.default_rng(7)
    x = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        yt = (ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
              .numpy().transpose(0, 2, 3, 1))

    params = convert_unet_state_dict(ref.state_dict())
    model = UNet(dim=8)
    yj = np.asarray(
        jax.jit(lambda p, v: model.apply({"params": p}, v))(
            params, jnp.asarray(x))
    )
    assert yj.shape == yt.shape
    np.testing.assert_allclose(yj, yt, rtol=2e-4, atol=2e-4)


def test_one_step_gradient_parity_vs_reference_torch(ref_model):
    """Training-dynamics parity (VERDICT r4 next #6): same converted
    weights, same batch, the reference's own loss stack — parameter
    GRADIENTS must agree, not just forwards.

    Reference stack: clamp to [0,1] (`My_train.py:230`) + CharbonnierLoss
    eps 1e-3 (`losses.py:41-52`, `My_train.py:233-234`). Charbonnier-only:
    the CR loss needs pretrained VGG19 weights (unobtainable offline) and
    its random-VGG fallback can't be bit-aligned across frameworks; CR's
    forward math is oracle-tested in test_losses.py. The torch gradient
    state_dict is mapped through the SAME converter as the weights (the
    torch→flax transforms are linear — transposes/reshapes/qkv concat — so
    they apply to gradients identically), giving a leaf-for-leaf tree
    comparison at ≤2e-4 relative."""
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.models.uformer import Uformer
    from dehaze_tpu.ops.losses import charbonnier_loss
    from dehaze_tpu.utils.convert_torch import convert_uformer_state_dict

    sys.path.insert(0, REF)
    import losses as ref_losses

    rng = np.random.default_rng(42)
    clean = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    hazy = np.clip(clean + rng.normal(0, 0.08, clean.shape), 0, 1).astype(
        np.float32)

    # ---- torch backward ---------------------------------------------------
    ref_model.zero_grad(set_to_none=True)
    xt = torch.from_numpy(hazy.transpose(0, 3, 1, 2))
    ct = torch.from_numpy(clean.transpose(0, 3, 1, 2))
    restored = torch.clamp(ref_model(xt), 0.0, 1.0)
    loss_t = ref_losses.CharbonnierLoss()(restored, ct)
    loss_t.backward()
    grad_sd = {}
    for k, v in ref_model.state_dict().items():
        grad_sd[k] = v  # buffers/missing-grad params: placeholder values
    for k, p in ref_model.named_parameters():
        grad_sd[k] = (p.grad.detach().clone() if p.grad is not None
                      else torch.zeros_like(p))
    g_ref = convert_uformer_state_dict(grad_sd, attention="full")

    # ---- jax grad on the converted weights --------------------------------
    params = convert_uformer_state_dict(ref_model.state_dict(),
                                        attention="full")
    cfg = ModelConfig(img_size=32, embed_dim=8, attention="full",
                      dtype=jnp.float32, drop_path_rate=0.0)
    model = Uformer(cfg)

    def loss_fn(p, hz, cl):
        y = model.apply({"params": p}, hz)
        y = jnp.clip(y, 0.0, 1.0)
        return charbonnier_loss(y, cl, 1e-3)

    import jax as _jax

    loss_j, g_jax = _jax.jit(_jax.value_and_grad(loss_fn))(
        params, jnp.asarray(hazy), jnp.asarray(clean))

    assert float(loss_j) == pytest.approx(float(loss_t.item()), rel=1e-5)
    ref_leaves = jax.tree.leaves_with_path(g_ref)
    jax_leaves = dict(jax.tree.leaves_with_path(g_jax))
    assert len(ref_leaves) == len(jax_leaves)
    checked = 0
    for path, vref in ref_leaves:
        vj = np.asarray(jax_leaves[path])
        vr = np.asarray(vref)
        scale = max(np.abs(vr).max(), 1e-8)
        np.testing.assert_allclose(
            vj, vr, rtol=2e-4, atol=2e-4 * scale,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}")
        checked += 1
    assert checked > 100  # the full ~500-leaf tree was compared
