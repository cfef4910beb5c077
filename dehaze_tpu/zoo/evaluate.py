"""Calibration test harness (SURVEY #37, `ops/tests.py`).

Reimplements the reference's uncertainty/calibration evaluation exactly:
NLL on log-of-mean-softmax re-log-softmaxed (the reference feeds
`torch.log(ys_pred)` back into CrossEntropyLoss, `tests.py:92`), cutoff
confusion matrices, accuracy/unconfidence/mIoU/frequency per cutoff, top-5,
Brier, 10-bin confidence histogram, ECE and signed ECE (`ecse`), plus the
confidence-histogram + reliability-diagram figure. Metric functions are
pure NumPy with the reference's signatures so they are oracle-testable
against `ops/tests.py` directly.

MC-dropout models average `n_ff` stochastic forward passes (`tests.py:83`);
pass a `rng` for their dropout sampling.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dehaze_tpu.ops.meters import AverageMeter
from dehaze_tpu.utils.transfer import wait


# --------------------------------------------------------------------------
# metric primitives — standard calibration formulas. Signatures (and the
# reference's exact epsilon/edge-case conventions: 1e-7 guards, confidence
# interval (min, max], zero rows → 0) follow `ops/tests.py:261-366` so the
# oracle tests in tests/test_zoo_harness.py can compare value-for-value;
# the implementations are this repo's own vectorized forms.
# --------------------------------------------------------------------------

def brier(ys, ys_pred):
    """Per-sample Brier score Σ_c (1[y=c] − p_c)²."""
    return np.square(np.eye(ys_pred.shape[1])[ys] - ys_pred).sum(axis=1)


def topk(ys, ys_pred, k=5):
    """1[y ∈ top-k(p)] per sample (argpartition — no full sort needed)."""
    idx = np.argpartition(ys_pred, -k, axis=1)[:, -k:]
    return (idx == np.reshape(ys, (-1, 1))).any(axis=1)


def cm(ys, ys_pred, filter_min=0.0, filter_max=1.0):
    """Confusion matrix over predictions whose confidence ∈ (min, max]."""
    num_classes = ys_pred.shape[1]
    confidence = np.amax(ys_pred, axis=1)
    pred = np.argmax(ys_pred, axis=1)
    keep = ((confidence > filter_min) & (confidence <= filter_max)
            & (ys >= 0) & (ys < num_classes))
    mat = np.zeros((num_classes, num_classes), np.int64)
    np.add.at(mat, (ys[keep], pred[keep]), 1)
    return mat


def ious(mat):
    """Per-class IoU: diag / (row + col − diag); 0 where the union is empty."""
    mat = np.asarray(mat, dtype=float)
    inter = np.diag(mat)
    union = mat.sum(axis=0) + mat.sum(axis=1) - inter
    return np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)


def miou(mat):
    """Mean IoU over classes that appear in the ground truth."""
    present = np.asarray(mat).sum(axis=1) > 0
    return float(ious(mat)[present].mean()) if present.any() else 0.0


def gacc(mat):
    """Global accuracy trace/total (p(accurate | kept by the cm filter))."""
    total = float(np.sum(mat))
    return float(np.trace(mat) / total) if total > 0 else 0.0


def caccs(mat):
    """Per-class accuracies diag/row (1e-7-guarded), 0 for empty rows."""
    mat = np.asarray(mat, dtype=float)
    row = mat.sum(axis=1)
    return list(np.where(row > 0, np.diag(mat) / (row + 1e-7), 0.0))


def unconfidence(cm_certain, cm_uncertain):
    """p(unconfident | inaccurate)."""
    def misses(m):
        return float(np.sum(m)) - float(np.trace(m))

    return misses(cm_uncertain) / (misses(cm_certain)
                                   + misses(cm_uncertain) + 1e-7)


def frequency(cm_certain, cm_uncertain):
    """Fraction of samples the confidence cutoff keeps."""
    n_cert = float(np.sum(cm_certain))
    return n_cert / (n_cert + float(np.sum(cm_uncertain)) + 1e-7)


def _bin_weighted_gap(count_bin, acc_bin, conf_bin, signed: bool) -> float:
    """Count-weighted (conf − acc) over histogram bins: |·| → ECE, raw → ECE±."""
    count = np.asarray(count_bin, dtype=float)
    gap = np.asarray(conf_bin, dtype=float) - np.asarray(acc_bin, dtype=float)
    freq = np.nan_to_num(count / (count.sum() + 1e-7))
    return float(np.sum((gap if signed else np.abs(gap)) * freq))


def ece(count_bin, acc_bin, conf_bin):
    """Expected calibration error."""
    return _bin_weighted_gap(count_bin, acc_bin, conf_bin, signed=False)


def ecse(count_bin, acc_bin, conf_bin):
    """Signed ECE ("ECE±")."""
    return _bin_weighted_gap(count_bin, acc_bin, conf_bin, signed=True)


# --------------------------------------------------------------------------
# harness
# --------------------------------------------------------------------------

def _nll(ys_pred: np.ndarray, ys, ys_soft: Optional[np.ndarray],
         smoothing: float) -> float:
    """The reference's double-softmax NLL: CrossEntropyLoss(log(p̂), target)
    == -Σ t · log_softmax(log p̂) (`tests.py:71-92`).

    Zero-probability handling follows torch CE: only target-weighted entries
    contribute, so a p̂_c == 0 in a NON-target class never produces nan
    (naive `t * logp` would: numpy 0 · (-inf) = nan). A zero prob in the
    target class gives +inf, exactly like torch.
    """
    with np.errstate(divide="ignore"):
        logp = np.log(ys_pred)
    logp = logp - logp.max(axis=1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(axis=1, keepdims=True))
    c = ys_pred.shape[1]
    if ys_soft is not None and ys_soft.ndim > 1:
        t = ys_soft
    elif smoothing > 0.0:
        t = np.eye(c)[ys] * (1 - smoothing) + smoothing / c
    else:
        t = np.eye(c)[ys]
    with np.errstate(invalid="ignore"):
        weighted = np.where(t > 0, t * logp, 0.0)
    return float(np.mean(-np.sum(weighted, axis=1)))


def make_predict_fn(model, variables, n_ff: int = 1):
    """jitted mean-of-softmax over n_ff forward passes (`tests.py:83-84`).

    `variables` is a jit ARGUMENT, not a closure: closed-over trees are
    baked into the lowered HLO as constants, which bloats the serialized
    program by the full weight bytes (a 128M-param VGG = a ~515 MB compile
    payload — over this environment's relay upload cap, HTTP 413) and
    recompiles on every new checkpoint. As an argument the weights stay
    device buffers referenced by handle."""

    @jax.jit
    def predict(vs, x, rng):
        def one(key):
            return jax.nn.softmax(model.apply(
                vs, x, train=False, rngs={"dropout": key}), axis=-1)

        keys = jax.random.split(rng, n_ff)
        return jnp.mean(jax.vmap(one)(keys), axis=0)

    fn = lambda x, rng: predict(variables, x, rng)
    fn._jitted = predict  # introspection hook for the no-baked-weights test
    return fn


def test(model, variables, dataset: Iterable[Tuple[np.ndarray, np.ndarray]],
         n_ff: int = 1, transform: Optional[Callable] = None,
         smoothing: float = 0.0, cutoffs=(0.0, 0.9),
         bins=np.linspace(0.0, 1.0, 11), verbose: bool = False,
         period: int = 10, rng=None, fig_path: Optional[str] = None):
    """≙ `ops/tests.test` (`tests.py:19-149`). Returns the same metric tuple
    (nll, cutoffs, cms, accs, uncs, ious, freqs, top5, brier, count_bin,
    acc_bin, conf_bin, ece, ecse); writes the confidence-histogram +
    reliability-diagram figure to fig_path if given."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    predict = None
    num_classes = None

    cms_groups = None
    cms_bin = None
    conf_acc_bin = None
    nll_meter = AverageMeter("nll")
    brier_meter = AverageMeter("brier")
    topk_meter = AverageMeter("top5")
    metrics = None

    for step, (xs, ys) in enumerate(dataset):
        rng, kt, kp = jax.random.split(rng, 3)
        ys_soft = None
        if transform is not None:
            xs, ys_soft = transform(kt, jnp.asarray(xs), jnp.asarray(ys))
            ys = np.argmax(np.asarray(ys_soft), axis=-1)  # `tests.py:74`
            ys_soft = np.asarray(ys_soft)
        if predict is None:
            predict = make_predict_fn(model, variables, n_ff)
        p = np.asarray(predict(jnp.asarray(xs), kp))
        ys = np.asarray(ys)
        if num_classes is None:
            num_classes = p.shape[-1]
            shape = [num_classes, num_classes]
            cms_groups = [[np.zeros(shape), np.zeros(shape)]
                          for _ in cutoffs]
            cms_bin = [np.zeros(shape) for _ in range(len(bins) - 1)]
            conf_acc_bin = [0.0 for _ in range(len(bins) - 1)]

        nll_meter.update(_nll(p, ys, ys_soft, smoothing))
        topk_meter.update(topk(ys, p))
        brier_meter.update(brier(ys, p))

        for cutoff, group in zip(cutoffs, cms_groups):
            group[0] += cm(ys, p, filter_min=cutoff)
            group[1] += cm(ys, p, filter_max=cutoff)
        confidence = np.amax(p, axis=1)
        for i, (lo, hi) in enumerate(zip(bins, bins[1:])):
            cms_bin[i] += cm(ys, p, filter_min=lo, filter_max=hi)
            cond = np.logical_and(confidence >= lo, confidence < hi)
            conf_acc_bin[i] += np.sum(confidence[cond])

        accs = [gacc(c) for c, _ in cms_groups]
        iou_vals = [miou(c) for c, _ in cms_groups]
        uncs = [unconfidence(c, u) for c, u in cms_groups]
        freqs = [frequency(c, u) for c, u in cms_groups]
        count_bin = [np.sum(c) for c in cms_bin]
        acc_bin = [gacc(c) for c in cms_bin]
        conf_bin = [ca / (cnt + 1e-7)
                    for cnt, ca in zip(count_bin, conf_acc_bin)]
        metrics = (nll_meter.avg, tuple(cutoffs), cms_groups, accs, uncs,
                   iou_vals, freqs, topk_meter.avg, brier_meter.avg,
                   count_bin, acc_bin, conf_bin,
                   ece(count_bin, acc_bin, conf_bin),
                   ecse(count_bin, acc_bin, conf_bin))
        if verbose and (step + 1) % period == 0:
            print(f"{step + 1} Steps, {repr_metrics(metrics)}")

    if fig_path is not None and metrics is not None:
        save_calibration_figure(metrics, fig_path)
    return metrics


def repr_metrics(metrics) -> str:
    """≙ `tests.py:152-173`."""
    (nll_value, cutoffs, _, accs, uncs, iou_vals, freqs, topk_value,
     brier_value, _, _, _, ece_value, ecse_value) = metrics
    reprs = [
        ("NLL: %.4f" % nll_value) if nll_value > 0.01
        else ("NLL: %.4e" % nll_value),
        "Cutoffs: " + ", ".join("%.1f %%" % (c * 100) for c in cutoffs),
        "Accs: " + ", ".join("%.3f %%" % (a * 100) for a in accs),
        "Uncs: " + ", ".join("%.3f %%" % (u * 100) for u in uncs),
        "IoUs: " + ", ".join("%.3f %%" % (i * 100) for i in iou_vals),
        "Freqs: " + ", ".join("%.3f %%" % (f * 100) for f in freqs),
        "Top-5: " + "%.3f %%" % (topk_value * 100),
        "Brier: " + "%.3f" % brier_value,
        "ECE: " + "%.3f %%" % (ece_value * 100),
        "ECE±: " + "%.3f %%" % (ecse_value * 100),
    ]
    return ", ".join(reprs)


def save_calibration_figure(metrics, path: str):
    """Confidence histogram + reliability diagram (`tests.py:141-147,
    370-402`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    count_bin, acc_bin = metrics[9], metrics[10]
    centers = np.linspace(0.05, 0.95, 10)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    freq = np.array(count_bin) / (sum(count_bin) + 1e-7)
    axes[0].bar(centers * 100, freq * 100, width=10, color="tab:green",
                edgecolor="black", alpha=0.8)
    axes[0].set(xlim=(0, 100), ylim=(0, 100), xlabel="Confidence (%)",
                ylabel="Frequency (%)")
    guides = np.linspace(0.0, 1.0, 11)
    axes[1].plot(guides * 100, guides * 100, linestyle=(0, (1, 1)),
                 color="black")
    axes[1].bar(centers * 100, np.array(acc_bin) * 100, width=10,
                color="tab:red", edgecolor="black", alpha=0.8)
    axes[1].set(xlim=(0, 100), ylim=(0, 100), xlabel="Confidence (%)",
                ylabel="Accuracy (%)")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def test_prediction_time(model, variables, input_size=(1, 32, 32, 3),
                         n: int = 100, n_ff: int = 1,
                         rng=None, chunk: int = 10) -> AverageMeter:
    """≙ `tests.test_prediction_time` (`tests.py:206-223`): wall-clock per
    mean-of-softmax prediction at `input_size` (NHWC here). Device-synced via
    utils.transfer.wait (a REAL sync — block_until_ready is a no-op on the
    axon relay); one warmup excludes compile. Prints and returns the
    meter (avg/std in seconds like the reference's).

    `chunk` forwards are dispatched per wait() and the elapsed time divided:
    on the relay each wait() is a full scalar-fetch round-trip (~40 ms),
    which would otherwise dominate small-model per-forward times (ADVICE r4
    #5; the reference's cuda.synchronize has no such cost). Execution is
    in-order, so syncing the last output syncs the whole chunk. The meter's
    std therefore reflects across-chunk variation, not per-forward."""
    import time

    rng = jax.random.PRNGKey(0) if rng is None else rng
    predict = make_predict_fn(model, variables, n_ff)
    meter = AverageMeter("predict_times", "%.3f")
    x0 = jax.random.uniform(rng, input_size)
    wait(predict(x0, rng))
    for base in range(0, n, chunk):
        m = min(chunk, n - base)
        keys = [jax.random.fold_in(rng, base + j) for j in range(m)]
        xs = [jax.random.uniform(k, input_size) for k in keys]
        wait(xs[-1])  # inputs staged before the clock starts
        t = time.time()
        out = None
        for x, k in zip(xs, keys):
            out = predict(x, k)
        wait(out)
        per = (time.time() - t) / m
        for _ in range(m):
            meter.update(per)
    print("Time: %.3f±%.3f ms" % (meter.avg * 1e3, meter.std * 1e3))
    return meter


def save_lists(metrics_dir: str, metrics_list):
    """≙ `tests.save_lists` (`tests.py:226-230`): raw csv rows."""
    import csv

    with open(metrics_dir, "w", newline="") as csvfile:
        writer = csv.writer(csvfile)
        for metrics in metrics_list:
            writer.writerow(metrics)


def save_metrics(metrics_dir: str, metrics_list):
    """≙ `tests.save_metrics` (`tests.py:233-258`): each row is
    [*keys, <metric tuple from test()>]; flattens to
    [*keys, nll, *cutoffs, *accs, *uncs, *ious, *freqs, top5, brier,
    ece, ecse] (the cms and histogram bins are dropped, like the
    reference)."""
    metrics_acc = []
    for metrics in metrics_list:
        (*keys, nll_value, cutoffs, _cms, accs, uncs, iou_vals, freqs,
         topk_value, brier_value, _count_bin, _acc_bin, _conf_bin,
         ece_value, ecse_value) = metrics
        metrics_acc.append([
            *keys, nll_value, *cutoffs, *accs, *uncs, *iou_vals, *freqs,
            topk_value, brier_value, ece_value, ecse_value,
        ])
    save_lists(metrics_dir, metrics_acc)


def test_perturbation(model, variables,
                      sequences: Iterable[np.ndarray], n_ff: int = 1,
                      rng=None) -> Tuple[float, float]:
    """≙ `tests.test_perturbation` (`tests.py:177-207`): mean prediction
    consistency and cross-entropy consistency (CEC) over CIFAR-10-P
    perturbation sequences [B, T, H, W, C] (NHWC here)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    cons_meter = AverageMeter("cons")
    cec_meter = AverageMeter("cec")
    predict = None
    for xs in sequences:
        b, t = xs.shape[0], xs.shape[1]
        flat = jnp.asarray(xs.reshape((-1,) + xs.shape[2:]))
        if predict is None:
            predict = make_predict_fn(model, variables, n_ff)
        rng, k = jax.random.split(rng)
        p = np.asarray(predict(flat, k)).reshape(b, t, -1)
        idx = np.argmax(p, axis=-1)
        cons = np.mean((idx[:, 1:] == idx[:, :-1]).astype(np.float32),
                       axis=-1)
        cons_meter.update(cons)
        cec = -np.mean(p[:, 1:] * np.log(p[:, :-1] + 0.0), axis=-1)
        cec_meter.update(cec)
    return cons_meter.avg, cec_meter.avg
