"""Classification-zoo harness CLI (SURVEY #36-40).

Subcommands ≙ the reference's notebook/driver surface
(`how-do-vits-work-transformer/`):

    train         ≙ ops/trains.train + classification.ipynb
    eval          ≙ ops/tests.test calibration harness (+ CIFAR-C via
                    --ctype/--intensity ≙ robustness.ipynb / ops/cifarc.py)
    perturbation  ≙ ops/tests.test_perturbation on CIFAR-10-P
    attack        ≙ ops/adversarial.py (FGSM/PGD/Random [+ --freq band])
    fourier       ≙ fourier_analysis.ipynb + featuremap_variance.ipynb

Accepts the reference's YAML config schema (`configs/cifar10_vit.yaml`:
dataset/train/val/model/optim sections) via --config; flags override.

    python -m dehaze_tpu.cli.zoo train --name vit_ti --dataset synthetic \
        --epochs 2 --batch_size 32 --image_size 32 --patch_size 4 --out /tmp/z
    python -m dehaze_tpu.cli.zoo eval --name vit_ti --ckpt /tmp/z/best.msgpack ...
"""

import argparse
import json
import os

import numpy as np


def _model_kwargs(args, sample_x=None):
    kw = {}
    for k in ("image_size", "patch_size", "window_size", "sd", "padding",
              "stride"):
        v = getattr(args, k, None)
        if v is not None:
            kw[k] = v
    # the transformer families carry the reference's 224 default image_size
    # (`vit.py:52`, etc.); pos-embed tables are sized from that attribute,
    # so without --image_size the model must follow the loaded data's
    # geometry (CIFAR/synthetic are 32², ImageNet eval 224²)
    if sample_x is not None:
        kw.setdefault("image_size", int(sample_x.shape[-3]))
    return kw


def _build(args, num_classes, sample_x=None):
    import jax.numpy as jnp

    from dehaze_tpu.zoo import get_model

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    return get_model(args.name, num_classes=num_classes, stem=args.stem,
                     dtype=dtype, **_model_kwargs(args, sample_x))


def _load_variables(args, model, sample_x, ckpt=None):
    import jax

    from dehaze_tpu.train.checkpoint import load_checkpoint

    k = jax.random.PRNGKey(0)
    template = model.init({"params": k, "dropout": k, "droppath": k},
                          sample_x[:1], train=False)
    ckpt = ckpt or args.ckpt
    if ckpt:
        _, variables, _, _ = load_checkpoint(ckpt, template)
        return variables
    print("[zoo] no --ckpt given: using random init")
    return template


class _EnsembleApply:
    """Adapter exposing a deep ensemble through the single-model `.apply`
    contract `evaluate.make_predict_fn` expects: `variables` is the STACKED
    member pytree (leading axis M), the forward vmaps the shared module
    over it and combines members with the reference's log-sum-exp rule
    (`models/ensemble.py:18-22`; softmax downstream yields the normalized
    ensemble predictive distribution)."""

    def __init__(self, model):
        self.model = model

    def apply(self, stacked_vars, x, **kw):
        import jax

        from dehaze_tpu.zoo.ensemble import combine_logits

        fwd = lambda v: self.model.apply(v, x, **kw)
        return combine_logits(jax.vmap(fwd)(stacked_vars))


def _apply_config(args, parser):
    """Overlay the reference YAML schema (configs/cifar10_vit.yaml) under
    explicit CLI flags (flags win when not at their parser default)."""
    if not args.config:
        return args
    import yaml

    with open(args.config) as f:
        cfg = yaml.safe_load(f) or {}
    defaults = {a.dest: a.default for a in parser._actions}

    def take(dest, value):
        if value is not None and getattr(args, dest, None) == defaults.get(dest):
            setattr(args, dest, value)

    ds, tr = cfg.get("dataset", {}), cfg.get("train", {})
    opt, mb = cfg.get("optim", {}), cfg.get("model", {}).get("block", {})
    take("dataset", ds.get("name"))
    take("root", ds.get("root"))
    take("epochs", tr.get("epochs"))
    take("warmup_epochs", tr.get("warmup_epochs"))
    take("batch_size", tr.get("batch_size"))
    take("max_norm", tr.get("max_norm"))
    take("smoothing", tr.get("smoothing"))
    if tr.get("mixup") is not None and not getattr(args, "no_mixup", False):
        args.mixup_cfg = {
            "mixup_alpha": tr["mixup"].get("mixup_alpha", 1.0),
            "cutmix_alpha": tr["mixup"].get("cutmix_alpha", 0.8),
            "prob": tr["mixup"].get("prob", 1.0),
        }
    take("optimizer", opt.get("name"))
    take("lr", opt.get("lr"))
    take("weight_decay", opt.get("weight_decay"))
    if opt.get("scheduler"):
        args.scheduler_cfg = dict(opt["scheduler"])
    take("stem", cfg.get("model", {}).get("stem"))
    for k in ("image_size", "patch_size", "sd", "window_size"):
        take(k, mb.get(k))
    take("n_ff", cfg.get("val", {}).get("n_ff"))
    return args


def _common(p):
    p.add_argument("--name", required=True, help="registry model name")
    p.add_argument("--dataset", default="synthetic",
                   help="cifar10|cifar100|synthetic")
    p.add_argument("--root", default="./data")
    p.add_argument("--config", default=None, help="reference-schema YAML")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--stem", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--n_ff", type=int, default=1,
                   help="MC forward passes (mcdo models)")
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--patch_size", type=int, default=None)
    p.add_argument("--window_size", type=int, default=None)
    p.add_argument("--padding", type=int, default=None)
    p.add_argument("--stride", type=int, default=None)
    p.add_argument("--sd", type=float, default=None)
    p.add_argument("--n_synth", type=int, default=512)
    return p


def cmd_train(args, parser):
    import jax

    from dehaze_tpu.train.checkpoint import save_checkpoint
    from dehaze_tpu.zoo import data as zdata
    from dehaze_tpu.zoo import evaluate as zeval
    from dehaze_tpu.zoo.train import ZooTrainer

    args = _apply_config(args, parser)
    (xtr, ytr), (xte, yte), nc, _ = zdata.get_dataset(
        args.dataset, args.root, n_synth=args.n_synth,
        synth_size=args.image_size)
    model = _build(args, nc, xtr)
    steps_per_epoch = max(1, len(xtr) // args.batch_size)
    mesh = None
    if args.data_axis > 1:
        from dehaze_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.data_axis)
    mixup_cfg = getattr(args, "mixup_cfg", None)
    if mixup_cfg is None and args.mixup and not args.no_mixup:
        mixup_cfg = {"mixup_alpha": 1.0, "cutmix_alpha": 0.8, "prob": 1.0}
    trainer = ZooTrainer(
        model, num_classes=nc, optimizer_name=args.optimizer, lr=args.lr,
        weight_decay=args.weight_decay,
        scheduler=getattr(args, "scheduler_cfg", None),
        warmup_epochs=args.warmup_epochs, steps_per_epoch=steps_per_epoch,
        smoothing=args.smoothing, mixup=mixup_cfg,
        max_norm=args.max_norm, augment=not args.no_augment, mesh=mesh,
        seed=args.seed)
    trainer.init(xtr[:args.batch_size])

    os.makedirs(args.out, exist_ok=True)
    best_acc = -1.0
    for epoch in range(args.warmup_epochs + args.epochs):
        it = zdata.batches(xtr, ytr, args.batch_size, shuffle=True,
                           seed=args.seed + epoch)
        loss, nll, l1, l2 = trainer.train_epoch(it)
        phase = "Warmup epoch" if epoch < args.warmup_epochs else "Epoch"
        print(f"{phase}: {epoch}, Loss: {loss:.4f}, lr: {trainer.lr():.3e}, "
              f"l1: {l1:.1f}, l2: {l2:.2f}")
        metrics = zeval.test(
            model, trainer.variables,
            zdata.batches(xte, yte, args.batch_size), n_ff=args.n_ff)
        acc = metrics[3][0]
        print(f"  val: {zeval.repr_metrics(metrics)}")
        save_checkpoint(os.path.join(args.out, f"epoch_{epoch}.msgpack"),
                        epoch, trainer.variables,
                        extra={"acc": acc, "loss": loss})
        if acc > best_acc:
            best_acc = acc
            save_checkpoint(os.path.join(args.out, "best.msgpack"), epoch,
                            trainer.variables, extra={"acc": acc})
    print(f"best acc: {best_acc:.4f}")


def cmd_eval(args, parser):
    from dehaze_tpu.zoo import data as zdata
    from dehaze_tpu.zoo import evaluate as zeval

    args = _apply_config(args, parser)
    if args.dataset == "imagenet":
        # folder-streamed (ops/datasets.py:110-139 / ops/imagenetc.py)
        size = args.image_size or 224
        if args.ctype:
            folder = os.path.join(args.root, "imagenetc", args.ctype,
                                  str(args.intensity))
            it = zdata.imagenet_c_batches(args.ctype, args.intensity,
                                          args.batch_size, root=args.root,
                                          size=size)
        else:
            folder = os.path.join(args.root, "imagenet", "val")
            it = zdata.imagenet_batches(args.batch_size, root=args.root,
                                        size=size)
        classes, _ = zdata._list_image_folder(folder)
        nc = len(classes)
        first = next(iter(it))
        model = _build(args, nc, first[0])
        variables = _load_variables(args, model, first[0])

        def chain():
            yield first
            yield from it

        batch_iter = chain()
    else:
        if args.ctype:
            nc = 100 if "100" in args.dataset else 10
            x, y = zdata.load_cifar_c(args.root, args.ctype, args.intensity,
                                      "cifar100" if nc == 100 else "cifar10")
        else:
            _, (x, y), nc, _ = zdata.get_dataset(
                args.dataset, args.root, n_synth=args.n_synth,
                synth_size=args.image_size)
        model = _build(args, nc, x)
        variables = _load_variables(args, model, x[: args.batch_size])
        batch_iter = zdata.batches(x, y, args.batch_size)
    if getattr(args, "ensemble", None):
        from dehaze_tpu.zoo.ensemble import stack_variables

        sample = first[0] if args.dataset == "imagenet" else x[:1]
        members = [variables] + [
            _load_variables(args, model, sample, ckpt=ck)
            for ck in args.ensemble]
        variables = stack_variables(members)
        model = _EnsembleApply(model)
        print(f"[zoo] deep ensemble of {len(members)} members")
    metrics = zeval.test(model, variables, batch_iter,
                         n_ff=args.n_ff, fig_path=args.fig)
    print(zeval.repr_metrics(metrics))
    if args.metrics_csv:
        key = args.ctype or args.dataset
        zeval.save_metrics(args.metrics_csv, [[key, *metrics]])
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"nll": metrics[0], "acc": metrics[3][0],
                       "acc90": metrics[3][1], "top5": metrics[7],
                       "brier": metrics[8], "ece": metrics[12],
                       "ecse": metrics[13]}, f)


def cmd_perturbation(args, parser):
    from dehaze_tpu.zoo import data as zdata
    from dehaze_tpu.zoo import evaluate as zeval

    x = zdata.load_cifar_p(args.root, args.ptype)
    nc = 10
    model = _build(args, nc, x[0])
    variables = _load_variables(args, model, x[0])
    seqs = (x[i:i + args.batch_size] for i in range(0, len(x),
                                                    args.batch_size))
    cons, cec = zeval.test_perturbation(model, variables, seqs,
                                        n_ff=args.n_ff)
    print(f"ptype: {args.ptype}, consistency: {cons:.4f}, CEC: {cec:.4f}")


def cmd_attack(args, parser):
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.zoo import adversarial as adv
    from dehaze_tpu.zoo import data as zdata

    _, (x, y), nc, _ = zdata.get_dataset(
        args.dataset, args.root, n_synth=args.n_synth,
        synth_size=args.image_size)
    x, y = x[: args.n_examples], y[: args.n_examples]
    model = _build(args, nc, x)
    variables = _load_variables(args, model, x[: args.batch_size])
    rng = jax.random.PRNGKey(args.seed)

    def acc_of(xs):
        logits = model.apply(variables, jnp.asarray(xs), train=False,
                             rngs={"dropout": rng})
        return float(np.mean(np.argmax(np.asarray(logits), -1) == y))

    if args.method == "fgsm":
        x_adv, _ = adv.fgsm(model, variables, jnp.asarray(x),
                            jnp.asarray(y), eps=args.eps, n_ff=args.n_ff,
                            rng=rng)
    elif args.method == "pgd":
        x_adv, _ = adv.pgd(model, variables, jnp.asarray(x), jnp.asarray(y),
                           eps=args.eps, alpha=args.alpha, steps=args.steps,
                           n_ff=args.n_ff, rng=rng)
    elif args.method == "random":
        x_adv, _ = adv.random_attack(jnp.asarray(x), jnp.asarray(y),
                                     eps=args.eps, rng=rng)
    else:
        raise SystemExit(f"unknown method {args.method}")
    if args.freq is not None:
        x_adv = jnp.asarray(x) + adv.freq_mask(
            x_adv - jnp.asarray(x), args.freq)
    clean, attacked = acc_of(x), acc_of(np.asarray(x_adv))
    print(f"method: {args.method}, eps: {args.eps}, clean acc: {clean:.4f}, "
          f"adv acc: {attacked:.4f}")


def cmd_fourier(args, parser):
    from dehaze_tpu.zoo import data as zdata
    from dehaze_tpu.zoo import fourier as zf

    _, (x, y), nc, _ = zdata.get_dataset(
        args.dataset, args.root, n_synth=args.n_synth,
        synth_size=args.image_size)
    model = _build(args, nc, x)
    variables = _load_variables(args, model, x[: args.batch_size])
    latents = zf.collect_latents(model, variables, x[: args.batch_size])
    deltas = zf.fourier_latents(latents)
    variances = zf.variance_latents(latents)
    os.makedirs(args.out, exist_ok=True)
    zf.save_fourier_plot(deltas, os.path.join(args.out, "fourier.png"),
                         title=args.name)
    zf.save_variance_plot(variances, os.path.join(args.out, "variance.png"),
                          title=args.name)
    np.savetxt(os.path.join(args.out, "highfreq_delta.csv"),
               zf.high_freq_deltas(latents), delimiter=",")
    np.savetxt(os.path.join(args.out, "variance.csv"), variances,
               delimiter=",")
    print(f"{len(latents)} latents -> {args.out}/fourier.png, variance.png")
    print("highfreq_delta:", np.round(zf.high_freq_deltas(latents), 3))


def cmd_predtime(args, parser):
    """≙ `tests.test_prediction_time` + `models.stats`/`count_parameters`
    (`tests.py:206-223`, `models/__init__.py:397-423`)."""
    from dehaze_tpu.zoo import checkpoint as zckpt
    from dehaze_tpu.zoo import data as zdata
    from dehaze_tpu.zoo import evaluate as zeval

    _, (x, _y), nc, _ = zdata.get_dataset(
        args.dataset, args.root, n_synth=args.n_synth,
        synth_size=args.image_size)
    model = _build(args, nc, x)
    variables = _load_variables(args, model, x[: args.batch_size])
    size = (args.batch_size,) + x.shape[1:]
    zckpt.stats(model, variables, x[:1], name=args.name)
    meter = zeval.test_prediction_time(model, variables, input_size=size,
                                       n=args.n, n_ff=args.n_ff)
    imgs_per_s = args.batch_size / meter.avg
    print(f"throughput: {imgs_per_s:.1f} img/s at batch {args.batch_size}")


def build_parsers():
    """Top-level parser + per-subcommand parsers (the latter are needed by
    `_apply_config` to know each flag's default). Exposed for tests that
    ingest the reference's own `configs/*.yaml`."""
    top = argparse.ArgumentParser(description="classification zoo harness")
    sub = top.add_subparsers(dest="cmd", required=True)

    pt = _common(sub.add_parser("train"))
    pt.add_argument("--epochs", type=int, default=1)
    pt.add_argument("--warmup_epochs", type=int, default=0)
    pt.add_argument("--optimizer", default="SGD")
    pt.add_argument("--lr", type=float, default=0.1)
    pt.add_argument("--weight_decay", type=float, default=0.0)
    pt.add_argument("--max_norm", type=float, default=None)
    pt.add_argument("--smoothing", type=float, default=0.0)
    pt.add_argument("--mixup", action="store_true", default=False,
                    help="enable mixup/cutmix with the config defaults")
    pt.add_argument("--no_mixup", action="store_true", default=False)
    pt.add_argument("--no_augment", action="store_true", default=False)
    pt.add_argument("--data_axis", type=int, default=1,
                    help="shard the batch over N devices (DP)")
    pt.add_argument("--seed", type=int, default=0)
    pt.add_argument("--out", default="zoo_ckpts")

    pe = _common(sub.add_parser("eval"))
    pe.add_argument("--ctype", default=None, help="CIFAR-C corruption type")
    pe.add_argument("--intensity", type=int, default=1)
    pe.add_argument("--fig", default=None, help="reliability-diagram path")
    pe.add_argument("--ensemble", nargs="+", default=None, metavar="CKPT",
                    help="additional member checkpoints: evaluate the deep "
                         "ensemble of --ckpt + these (homogeneous, vmapped "
                         "stacked-params fast path)")
    pe.add_argument("--json_out", default=None)
    pe.add_argument("--metrics_csv", default=None,
                    help="flattened metric row CSV (≙ tests.save_metrics)")

    pp = _common(sub.add_parser("perturbation"))
    pp.add_argument("--ptype", default="gaussian_noise")

    pa = _common(sub.add_parser("attack"))
    pa.add_argument("--method", default="fgsm",
                    choices=["fgsm", "pgd", "random"])
    pa.add_argument("--eps", type=float, default=0.007)
    pa.add_argument("--alpha", type=float, default=2 / 255)
    pa.add_argument("--steps", type=int, default=40)
    pa.add_argument("--freq", type=float, default=None,
                    help="band-pass the perturbation at this frequency")
    pa.add_argument("--n_examples", type=int, default=128)
    pa.add_argument("--seed", type=int, default=0)

    pf = _common(sub.add_parser("fourier"))
    pf.add_argument("--out", default="zoo_fourier")

    pd = _common(sub.add_parser("predtime"))
    pd.add_argument("--n", type=int, default=100,
                    help="timed predictions (tests.py:206 n=100)")

    return top, {"train": pt, "eval": pe, "perturbation": pp, "attack": pa,
                 "fourier": pf, "predtime": pd}


def main():
    top, parsers = build_parsers()
    args = top.parse_args()
    {"train": cmd_train, "eval": cmd_eval, "perturbation": cmd_perturbation,
     "attack": cmd_attack, "fourier": cmd_fourier,
     "predtime": cmd_predtime}[args.cmd](args, parsers[args.cmd])


if __name__ == "__main__":
    main()
