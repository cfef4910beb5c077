"""Oracle parity for the classification zoo vs the reference's own torch code.

Builds each reference model from `/root/reference/how-do-vits-work-transformer`
(their registry `models/__init__.py:26-334` where the name is registered,
the module factory otherwise), converts its random-init weights with the
generic `convert_zoo_state_dict`, and asserts the dehaze_tpu.zoo forward
matches on the same input. The converter's bijection check means a naming
or shape drift in ANY family fails loudly here.

BN running stats are made non-trivial by one torch train-mode forward before
conversion, so the stats path (batch_stats collection) is exercised too.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/how-do-vits-work-transformer"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_models():
    # models/__init__.py imports requests/tqdm (for checkpoint downloads we
    # never trigger); stub them if absent so the import stays hermetic.
    for name in ("requests", "tqdm"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                mod = types.ModuleType(name)
                mod.tqdm = lambda *a, **k: None
                sys.modules[name] = mod
    sys.path.insert(0, REF)
    import models  # noqa: E402  (the reference zoo package, used as oracle)

    return models


def _torch_forward(model, x_nchw, warm_bn=True):
    with torch.no_grad():
        if warm_bn:  # make running stats non-trivial (momentum update)
            model.train()
            model(x_nchw)
        model.eval()
        return model(x_nchw).numpy()


def _flax_forward(name, variables, x_nhwc, **kw):
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.zoo import get_model

    m = get_model(name, num_classes=10, **kw)
    return np.asarray(jax.jit(
        lambda v, x: m.apply(v, x, train=False))(
            variables, jnp.asarray(x_nhwc)))


def _convert(ref_model, name, x, **kw):
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.utils.convert_torch import convert_zoo_state_dict
    from dehaze_tpu.zoo import get_model

    m = get_model(name, num_classes=10, **kw)
    k = jax.random.PRNGKey(0)
    variables = m.init({"params": k, "dropout": k, "droppath": k},
                       jnp.asarray(x), train=False)
    return convert_zoo_state_dict(ref_model.state_dict(),
                                  jax.device_get(variables))


# name → (registered_in_ref_registry, block_kwargs, slow)
CASES = {
    "resnet_dnn_18": (True, {}, False),
    "resnet_dnn_50": (True, {}, True),
    "resnet_dnn_smoothing_18": (True, {}, False),
    "preresnet_dnn_18": (True, {}, False),
    "preresnet_dnn_50": (True, {}, True),
    "seresnet_dnn_18": (True, {}, False),
    "cbamresnet_dnn_18": (True, {}, False),
    "resnext_dnn_50": (True, {}, True),
    "wideresnet_dnn_50": (True, {}, True),
    "vgg_dnn_11": (True, {}, True),
    "prevgg_dnn_11": (True, {}, True),
    "alexnet_dnn": (True, {}, False),
    "vit_ti": (True, {"image_size": 32, "patch_size": 4}, False),
    "pit_ti": (True, {"image_size": 32}, False),
    "mixer_ti": (True, {"image_size": 32, "patch_size": 8}, False),
    "swin_t": (False, {"window_size": 2, "pools": (2, 2, 2, 2)}, False),
    "convit_ti": (False, {"image_size": 32, "patch_size": 4, "padding": 1},
                  False),
    "alternet_18": (False, {"window_size": 4}, False),
    "mobilenet": (False, {}, False),
}

FAST = [n for n, (_, _, s) in CASES.items() if not s]
SLOW = [n for n, (_, _, s) in CASES.items() if s]


def _build_ref(ref_models, name, kw):
    registered, block_kwargs, _ = CASES[name]
    torch.manual_seed(7)
    if registered:
        return ref_models.get_model(name, num_classes=10, stem=False,
                                    verbose=False, **block_kwargs)
    if name == "swin_t":
        import models.swin as ref_swin
        return ref_swin.swin_t(10, **block_kwargs)
    if name == "convit_ti":
        import models.convit as ref_convit
        return ref_convit.tiny(10, **block_kwargs)
    if name == "alternet_18":
        import models.alternet as ref_alternet
        return ref_alternet.dnn_18(10, stem=False, **block_kwargs)
    if name == "mobilenet":
        import models.mobilenet as ref_mobilenet
        return ref_mobilenet.dnn(10, stem=False)
    raise AssertionError(name)


def _run_case(ref_models, name):
    _, kw, _ = CASES[name]
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 32, 32), dtype=np.float32) * 0.5
    ref = _build_ref(ref_models, name, kw)
    y_ref = _torch_forward(ref, torch.from_numpy(x))
    variables = _convert(ref, name, x.transpose(0, 2, 3, 1), **kw)
    y = _flax_forward(name, variables, x.transpose(0, 2, 3, 1), **kw)
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=2e-4,
                               err_msg=name)


@pytest.mark.parametrize("name", FAST)
def test_zoo_parity(ref_models, name):
    _run_case(ref_models, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", SLOW)
def test_zoo_parity_slow(ref_models, name):
    _run_case(ref_models, name)


def test_mcdo_conversion_bijection(ref_models):
    """MC dropout is always-stochastic (F.dropout default training=True,
    `resnet_mcdo_block.py:44`) so numeric parity is undefined; the converter
    bijection check still proves the parameter trees correspond 1:1, and the
    flax model must produce different outputs under different dropout rngs."""
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.zoo import get_model

    torch.manual_seed(7)
    ref = ref_models.get_model("resnet_mcdo_18", num_classes=10, stem=False,
                               verbose=False)
    x = np.random.default_rng(0).standard_normal(
        (2, 32, 32, 3), dtype=np.float32)
    variables = _convert(ref, "resnet_mcdo_18", x)

    m = get_model("resnet_mcdo_18", num_classes=10)
    y1 = m.apply(variables, jnp.asarray(x), train=False,
                 rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = m.apply(variables, jnp.asarray(x), train=False,
                 rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-6


def test_ensemble_parity(ref_models):
    """`Ensemble` (`ensemble.py:17-21`): log Σ softmax of member logits."""
    import jax.numpy as jnp

    from dehaze_tpu.zoo.transformers import ensemble_logits

    logits = [np.random.default_rng(i).standard_normal(
        (4, 10), dtype=np.float32) for i in range(3)]
    xs = torch.stack([torch.from_numpy(l) for l in logits])
    xs = xs - torch.logsumexp(xs, dim=-1, keepdim=True)
    want = torch.logsumexp(xs, dim=0).numpy()
    got = np.asarray(ensemble_logits([jnp.asarray(l) for l in logits]))
    np.testing.assert_allclose(got, want, atol=1e-5)
