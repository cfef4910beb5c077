"""Zoo harness tests: calibration metrics vs the reference's own ops/tests.py
(oracle), torch-scheduler timeline oracle, mixup soft targets, trainer
convergence + DP equality, adversarial attacks, fourier analysis.
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


def _stub_for_ref_tests():
    """Stub the externals `ops/tests.py` imports: torchvision.transforms
    (only ToTensor for plot_to_image) and timm.loss (real formulas)."""
    import torch.nn as nn
    import torch.nn.functional as F

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")

        class ToTensor:
            def __call__(self, img):
                return torch.from_numpy(
                    np.asarray(img, dtype=np.float32) / 255.0)

        tr.ToTensor = ToTensor
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr

    if "timm.loss" not in sys.modules:
        timm = sys.modules.get("timm", types.ModuleType("timm"))
        loss = types.ModuleType("timm.loss")

        class SoftTargetCrossEntropy(nn.Module):
            def forward(self, x, target):
                return torch.mean(
                    torch.sum(-target * F.log_softmax(x, dim=-1), dim=-1))

        class LabelSmoothingCrossEntropy(nn.Module):
            def __init__(self, smoothing=0.1):
                super().__init__()
                self.smoothing = smoothing

            def forward(self, x, target):
                logp = F.log_softmax(x, dim=-1)
                nll = -logp.gather(-1, target.unsqueeze(1)).squeeze(1)
                return ((1 - self.smoothing) * nll
                        - self.smoothing * logp.mean(-1)).mean()

        loss.SoftTargetCrossEntropy = SoftTargetCrossEntropy
        loss.LabelSmoothingCrossEntropy = LabelSmoothingCrossEntropy
        timm.loss = loss
        sys.modules["timm"] = timm
        sys.modules["timm.loss"] = loss


@pytest.fixture(scope="module")
def ref_tests():
    _stub_for_ref_tests()
    sys.path.insert(0, REF)
    import ops.tests as rt  # noqa: E402  (reference calibration harness)

    return rt


def test_metric_primitives_vs_reference(ref_tests):
    """cm/gacc/miou/unconfidence/frequency/ece/ecse/brier/topk equal the
    reference functions on random predictions."""
    from dehaze_tpu.zoo import evaluate as ze

    rng = np.random.default_rng(0)
    n, c = 500, 10
    ys = rng.integers(0, c, n)
    logits = rng.standard_normal((n, c))
    p = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)

    for lo, hi in [(0.0, 1.0), (0.2, 0.9), (0.0, 0.3)]:
        np.testing.assert_array_equal(
            ze.cm(ys, p, lo, hi), ref_tests.cm(ys, p, lo, hi))
    m = ze.cm(ys, p, 0.0, 0.7)
    assert ze.gacc(m) == ref_tests.gacc(m)
    assert ze.miou(m) == ref_tests.miou(m)
    np.testing.assert_allclose(ze.ious(m), ref_tests.ious(m))
    np.testing.assert_allclose(ze.caccs(m), ref_tests.caccs(m))
    m2 = ze.cm(ys, p, 0.7, 1.0)
    assert ze.unconfidence(m2, m) == ref_tests.unconfidence(m2, m)
    assert ze.frequency(m2, m) == ref_tests.frequency(m2, m)
    np.testing.assert_allclose(ze.brier(ys, p), ref_tests.brier(ys, p))
    np.testing.assert_array_equal(ze.topk(ys, p), ref_tests.topk(ys, p))
    cb = [10, 40, 100, 30, 20, 5, 1, 0, 2, 9]
    ab = list(rng.random(10))
    fb = list(rng.random(10))
    np.testing.assert_allclose(ze.ece(cb, ab, fb), ref_tests.ece(cb, ab, fb))
    np.testing.assert_allclose(ze.ecse(cb, ab, fb),
                               ref_tests.ecse(cb, ab, fb))


@pytest.mark.slow
def test_full_harness_vs_reference(ref_tests):
    """End-to-end: the reference's tests.test() on its own alexnet vs our
    zeval.test() on the converted model — same data, same metric values."""
    import jax

    sys.path.insert(0, REF)
    import models.alexnet as ref_alexnet

    from dehaze_tpu.utils.convert_torch import convert_zoo_state_dict
    from dehaze_tpu.zoo import evaluate as ze
    from dehaze_tpu.zoo import get_model

    torch.manual_seed(0)
    tm = ref_alexnet.dnn(num_classes=10, stem=False)
    tm.eval()

    rng = np.random.default_rng(1)
    batches = []
    for i in range(3):
        x = rng.standard_normal((32, 3, 32, 32), dtype=np.float32) * 0.5
        y = rng.integers(0, 10, 32).astype(np.int64)
        batches.append((x, y))

    ref_dataset = [(torch.from_numpy(x), torch.from_numpy(y))
                   for x, y in batches]
    *ref_metrics, _fig = ref_tests.test(tm, 1, ref_dataset, verbose=False,
                                        gpu=False)

    m = get_model("alexnet_dnn", num_classes=10)
    k = jax.random.PRNGKey(0)
    template = m.init({"params": k, "dropout": k},
                      np.zeros((1, 32, 32, 3), np.float32), train=False)
    variables = convert_zoo_state_dict(tm.state_dict(),
                                       jax.device_get(template))
    ours = ze.test(m, variables,
                   [(x.transpose(0, 2, 3, 1), y) for x, y in batches])

    np.testing.assert_allclose(ours[0], ref_metrics[0], atol=1e-4)   # nll
    np.testing.assert_allclose(ours[3], ref_metrics[3], atol=1e-6)   # accs
    np.testing.assert_allclose(ours[4], ref_metrics[4], atol=1e-6)   # uncs
    np.testing.assert_allclose(ours[5], ref_metrics[5], atol=1e-6)   # ious
    np.testing.assert_allclose(ours[7], ref_metrics[7], atol=1e-6)   # top5
    np.testing.assert_allclose(ours[8], ref_metrics[8], atol=1e-5)   # brier
    np.testing.assert_allclose(ours[12], ref_metrics[12], atol=1e-6)  # ece
    np.testing.assert_allclose(ours[13], ref_metrics[13], atol=1e-6)  # ecse


def test_schedules_vs_torch():
    """make_schedule reproduces the torch scheduler timeline (per-epoch
    scheduler.step() + per-iteration warmup) exactly."""
    import torch.optim as optim

    from dehaze_tpu.zoo.train import make_schedule

    base, spe, warm_e = 0.1, 5, 2

    for name, kw, make_torch in [
        ("StepLR", {"step_size": 3, "gamma": 0.5},
         lambda o: optim.lr_scheduler.StepLR(o, step_size=3, gamma=0.5)),
        ("MultiStepLR", {"milestones": [2, 5], "gamma": 0.1},
         lambda o: optim.lr_scheduler.MultiStepLR(o, milestones=[2, 5],
                                                  gamma=0.1)),
        ("CosineAnnealingLR", {"T_max": 10, "eta_min": 1e-4},
         lambda o: optim.lr_scheduler.CosineAnnealingLR(o, T_max=10,
                                                        eta_min=1e-4)),
        ("CosineAnnealingWarmRestarts", {"T_0": 4, "T_mult": 2},
         lambda o: optim.lr_scheduler.CosineAnnealingWarmRestarts(
             o, T_0=4, T_mult=2)),
    ]:
        sched = make_schedule(base, spe, warm_e, name, **kw)
        opt = optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
        tsched = make_torch(opt)
        # warmup phase: lr = base * i / warmup_steps at iteration i
        for i in range(warm_e * spe):
            want = base * i / (warm_e * spe)
            got = float(sched(i))
            assert abs(got - want) < 1e-7, (name, i)  # f32 schedule math
        # main phase: epoch e uses torch lr after e scheduler.step()s
        for e in range(12):
            want = opt.param_groups[0]["lr"]
            for i in range(spe):
                got = float(sched(warm_e * spe + e * spe + i))
                assert abs(got - want) < 1e-6, (name, e, i, got, want)
            tsched.step()


def test_mixup_cutmix_targets():
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.zoo.data import mixup_cutmix, one_hot_smooth

    x = jnp.asarray(np.random.default_rng(0).random((8, 16, 16, 3),
                                                    dtype=np.float32))
    y = jnp.asarray(np.arange(8) % 4)
    for seed in range(4):
        xm, t = mixup_cutmix(jax.random.PRNGKey(seed), x, y, 10,
                             smoothing=0.1)
        t = np.asarray(t)
        np.testing.assert_allclose(t.sum(-1), 1.0, atol=1e-5)
        assert xm.shape == x.shape
    # smoothing-only one-hot
    t = np.asarray(one_hot_smooth(y, 10, 0.1))
    np.testing.assert_allclose(t.sum(-1), 1.0, atol=1e-6)
    assert abs(t.max() - (1 - 0.1 + 0.01)) < 1e-6


def test_trainer_converges_and_dp_matches():
    """2 epochs on separable synthetic data improves accuracy; the same
    training with the batch sharded over the 8-device mesh reproduces the
    single-device parameters (XLA psum DP; BN stats are global either way)."""
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.parallel.mesh import make_mesh
    from dehaze_tpu.zoo import data as zdata
    from dehaze_tpu.zoo import evaluate as zeval
    from dehaze_tpu.zoo import get_model
    from dehaze_tpu.zoo.train import ZooTrainer

    from dehaze_tpu.zoo.convnets import ResNetZoo

    (xtr, ytr), (xte, yte), nc, _ = zdata.get_dataset("synthetic",
                                                      n_synth=128)
    model = ResNetZoo(num_blocks=(1, 1, 1, 1))  # BN-bearing, small

    def run(mesh, epochs, optimizer="Adam", lr=1e-3):
        tr = ZooTrainer(model, num_classes=nc, optimizer_name=optimizer,
                        lr=lr,
                        scheduler={"name": "CosineAnnealingLR", "T_max": 50},
                        steps_per_epoch=2, smoothing=0.1, augment=False,
                        mesh=mesh, seed=0)
        tr.init(xtr[:64])
        losses = []
        for e in range(epochs):
            loss, *_ = tr.train_epoch(
                zdata.batches(xtr, ytr, 64, shuffle=True, seed=e))
            losses.append(loss)
        return tr, losses

    t1, losses = run(None, 5)
    assert losses[-1] < 0.7 * losses[0], f"loss not decreasing: {losses}"
    metrics = zeval.test(model, t1.variables, zdata.batches(xte, yte, 64))
    assert metrics[3][0] > 0.2, f"below 2x chance: acc={metrics[3][0]}"

    # DP equality with SGD (updates linear in grads, so the only difference
    # is psum reduction-order fp noise; Adam's 1/sqrt(v) would amplify it)
    t8, _ = run(make_mesh(8), 2, optimizer="SGD", lr=0.01)
    t1, _ = run(None, 2, optimizer="SGD", lr=0.01)
    flat1 = jax.tree_util.tree_leaves(t1.params)
    flat8 = jax.tree_util.tree_leaves(t8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    s1 = jax.tree_util.tree_leaves(t1.batch_stats)
    s8 = jax.tree_util.tree_leaves(t8.batch_stats)
    for a, b in zip(s1, s8):  # BN stats are GLOBAL-batch under DP too
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_adversarial_attacks():
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.zoo import adversarial as adv
    from dehaze_tpu.zoo import get_model
    from dehaze_tpu.zoo.train import soft_ce

    m = get_model("alexnet_dnn", num_classes=10)
    k = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).random((8, 32, 32, 3),
                                                    dtype=np.float32))
    y = jnp.asarray(np.arange(8) % 10)
    v = m.init({"params": k, "dropout": k}, x, train=False)

    def loss_of(xs):
        logits = m.apply(v, xs, train=False)
        return float(soft_ce(logits, jax.nn.one_hot(y, 10)))

    clean = loss_of(x)
    x_fgsm, _ = adv.fgsm(m, v, x, y, eps=0.03)
    assert loss_of(x_fgsm) > clean
    assert float(jnp.max(jnp.abs(x_fgsm - x))) <= 0.03 + 1e-6
    x_pgd, _ = adv.pgd(m, v, x, y, eps=0.03, alpha=0.01, steps=3)
    assert loss_of(x_pgd) > clean
    assert float(jnp.max(jnp.abs(x_pgd - x))) <= 0.03 + 1e-6
    x_rnd, _ = adv.random_attack(x, y, eps=0.03, rng=k)
    assert x_rnd.shape == x.shape
    # FreqAttack: band-passed perturbation stays a perturbation of x
    x_fa, _ = adv.freq_attack(lambda a, b: adv.fgsm(m, v, a, b, eps=0.03),
                              x, y, f=1.5)
    assert x_fa.shape == x.shape
    assert float(jnp.max(jnp.abs(x_fa - x))) < 1.0


def test_fourier_and_variance():
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.zoo import get_model
    from dehaze_tpu.zoo.fourier import (collect_latents, fourier_latents,
                                        high_freq_deltas, variance_latents)

    m = get_model("vit_ti", num_classes=10, image_size=32, patch_size=8)
    k = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3),
                                                    dtype=np.float32))
    v = m.init({"params": k, "dropout": k}, x, train=False)
    latents = collect_latents(m, v, x)
    assert len(latents) == 1 + 2 * 12  # embedding + (attn, mlp) per block
    fl = fourier_latents(latents)
    for d in fl:
        assert d[0] == 0.0  # Δ relative to lowest frequency
    assert high_freq_deltas(latents).shape == (len(latents),)
    var = variance_latents(latents)
    assert var.shape == (len(latents),) and np.all(var >= 0)

    # variance matches the notebook's torch formula (unbiased spatial var)
    lat = latents[1]
    t = torch.from_numpy(lat[:, 1:].reshape(2, 4, 4, -1).transpose(
        0, 3, 1, 2).copy())
    want = t.var(dim=[-1, -2]).mean(dim=[0, 1]).item()
    np.testing.assert_allclose(var[1], want, rtol=1e-5)


def test_perturbation_metrics():
    import jax

    from dehaze_tpu.zoo import evaluate as zeval
    from dehaze_tpu.zoo import get_model

    m = get_model("alexnet_dnn", num_classes=10)
    k = jax.random.PRNGKey(0)
    x = np.random.default_rng(0).random((4, 6, 32, 32, 3)).astype(np.float32)
    v = m.init({"params": k, "dropout": k}, x[0], train=False)
    cons, cec = zeval.test_perturbation(m, v, [x[:2], x[2:]])
    assert 0.0 <= cons <= 1.0
    assert np.isfinite(cec)


def test_nll_finite_with_zero_nontarget_probs(ref_tests):
    """A hard-zero probability in a NON-target class must not nan the NLL
    (torch CE gathers only target-weighted entries; naive t*logp gives
    numpy 0*(-inf)=nan). Oracle: torch CrossEntropyLoss(log p, ys)."""
    from dehaze_tpu.zoo.evaluate import _nll

    p = np.array([[0.0, 0.25, 0.75],
                  [0.5, 0.5, 0.0]], dtype=np.float64)
    ys = np.array([2, 0])
    got = _nll(p, ys, None, 0.0)
    assert np.isfinite(got)
    want = float(torch.nn.CrossEntropyLoss()(
        torch.log(torch.from_numpy(p)), torch.from_numpy(ys)))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # target-class zero prob -> +inf, same as torch
    ys_inf = np.array([0, 2])
    got_inf = _nll(p, ys_inf, None, 0.0)
    want_inf = float(torch.nn.CrossEntropyLoss()(
        torch.log(torch.from_numpy(p)), torch.from_numpy(ys_inf)))
    assert np.isposinf(got_inf) and np.isposinf(want_inf)


def test_predict_fn_weights_passed_not_baked():
    """make_predict_fn must pass `variables` as a jit ARGUMENT: closing over
    a (numpy) weight tree bakes it into the lowered HLO as literal
    constants — a 128M-param VGG became a ~515 MB compile payload, over the
    TPU relay's upload cap (HTTP 413 on remote_compile). The lowered text
    must stay orders of magnitude below the weight bytes."""
    import flax.linen as nn
    from dehaze_tpu.zoo import evaluate as zeval

    import jax

    class Big(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(4096)(x.reshape((x.shape[0], -1)))

    model = Big()
    x = np.zeros((2, 16, 16, 3), np.float32)
    variables = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(0), x))  # ~12 MB f32
    nbytes = sum(a.nbytes for a in jax.tree.leaves(variables))
    assert nbytes > 10e6

    fn = zeval.make_predict_fn(model, variables)
    rng = jax.random.PRNGKey(1)
    text = fn._jitted.lower(variables, x, rng).as_text()
    assert len(text) < nbytes / 100, (
        f"lowered HLO is {len(text)} bytes for {nbytes} weight bytes — "
        f"weights are being baked into the program")
    # and it still computes
    out = np.asarray(fn(x, rng))
    assert out.shape == (2, 4096) and np.isfinite(out).all()


def test_synthetic_dataset_honors_image_size():
    """`--image_size` must size the synthetic data too (Swin's reference
    geometry only divides at 224; a 224 model on 32^2 data crashes)."""
    from dehaze_tpu.zoo.data import get_dataset

    (xtr, _), (xte, _), nc, _ = get_dataset("synthetic", n_synth=4,
                                            synth_size=64)
    assert xtr.shape[1:] == (64, 64, 3) and xte.shape[1:] == (64, 64, 3)
