"""VGG feature extractor: structure, slice boundaries, and .npz conversion
verified numerically against a torch VGG19 features stack (the CR loss's
slice indices — My_CR.py:65-74 — are a known 0.01-dB-level parity trap)."""

import numpy as np
import pytest

from dehaze_tpu.models import vgg as V


def test_feature_shapes_and_slices():
    import jax
    import jax.numpy as jnp

    m = V.make_cr_vgg()
    params = V.init_vgg_params(m, seed=0, image_hw=32)
    feats = m.apply(params, jnp.zeros((1, 32, 32, 3)))
    # relu1_1, relu2_1, relu3_1, relu4_1, conv5_2 channel widths & strides
    assert [f.shape for f in feats] == [
        (1, 32, 32, 64), (1, 16, 16, 128), (1, 8, 8, 256), (1, 4, 4, 512),
        (1, 2, 2, 512)]

    m16 = V.make_perceptual_vgg()
    params16 = V.init_vgg_params(m16, seed=0, image_hw=32)
    feats16 = m16.apply(params16, jnp.zeros((1, 32, 32, 3)))
    # relu1_2, relu2_2, relu3_3
    assert [f.shape for f in feats16] == [
        (1, 32, 32, 64), (1, 16, 16, 128), (1, 8, 8, 256)]


def test_npz_conversion_matches_torch_vgg19():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    import torch.nn as nn

    from dehaze_tpu.cli.convert_vgg import convert

    # torchvision vgg19.features layout, built from the same spec
    layers = []
    in_ch = 3
    for l in V._VGG19_LAYERS:
        if l == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, l, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            in_ch = l
    torch.manual_seed(0)
    features = nn.Sequential(*layers).eval()
    for p in features.parameters():
        with torch.no_grad():
            p.normal_(0, 0.05)

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        torch_feats = []
        h = t
        boundaries = {e for _, e in V.VGG19_CR_SLICES}
        for i, layer in enumerate(features):
            h = layer(h)
            if (i + 1) in boundaries:
                torch_feats.append(h.numpy().transpose(0, 2, 3, 1))

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        pth = os.path.join(d, "f.pth")
        npz = os.path.join(d, "f.npz")
        torch.save(features.state_dict(), pth)
        n = convert(pth, npz)
        assert n == 32  # 16 convs x (weight, bias)
        m = V.make_cr_vgg()
        params = V.load_params_npz(m, npz)
        feats = m.apply(params, jnp.asarray(x))

    assert len(feats) == len(torch_feats) == 5
    for a, b in zip(feats, torch_feats):
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-4, atol=2e-4)
