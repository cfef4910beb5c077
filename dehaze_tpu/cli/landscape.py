"""Loss-landscape sweep (≙ `My_losslandscape.py` / `FFA_losslandscape.py`).

    python -m dehaze_tpu.cli.landscape --weights .../model_best.msgpack \
        --train_dir .../train_patches --n 21 --out_csv landscape.csv
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from dehaze_tpu.cli.common import (add_common_args, build_model_and_params,
                                    config_from_args)
from dehaze_tpu.data.augment import mixup
from dehaze_tpu.data.pipeline import PairedFolder, train_batches
from dehaze_tpu.models import vgg as vgg_mod
from dehaze_tpu.ops import landscape as LS
from dehaze_tpu.ops import losses as L


def main():
    p = add_common_args(argparse.ArgumentParser(description="loss landscape"))
    p.add_argument("--weights", required=True)
    p.add_argument("--n", type=int, default=21)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--out_csv", default="losslandscape.csv")
    p.add_argument("--out_plot", default="losslandscape.jpg")
    p.add_argument("--max_batches", type=int, default=0,
                   help="cap eval batches per point (0 = full train set, "
                        "matching the reference's 441 full-set evals)")
    p.add_argument("--use_mixup", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="the reference sweeps apply MixUp during the loss "
                        "eval (My_losslandscape.py:193); --no-use_mixup "
                        "disables it for a transform-free sweep")
    p.add_argument("--perloss", action="store_true",
                   help="FFA only: add 0.04×VGG16-perceptual to the L1 "
                        "landscape loss (FFA_.../ops/My_tests.py:86-89)")
    p.add_argument("--no_normalize", action="store_true",
                   help="FFA only: skip the hazy-input Normalize(mean,std) "
                        "the reference's FFA loader applies "
                        "(FFA_model/data_utils.py:79); same flag as "
                        "ffa_train")
    p.add_argument("--points_per_batch", type=int, default=1,
                   help="evaluate P grid points per dispatch by vmapping "
                        "the loss over P perturbed parameter sets — a "
                        "TPU-native batching of the sweep (the reference "
                        "evaluates its 441 points serially); P× params in "
                        "HBM and P× the eval batch, so size to the chip")
    p.add_argument("--shard", default=None,
                   help="'i/n': process every n-th grid point with offset i "
                        "(points are independent; run n processes/hosts and "
                        "merge with --merge)")
    p.add_argument("--merge", default=None, metavar="GLOB",
                   help="skip the sweep: union shard CSVs matching GLOB "
                        "(e.g. 'landscape_*.csv') and plot them "
                        "(≙ the reference crash-merge tool, text.py:18-40)")
    args = p.parse_args()
    cfg = config_from_args(args)

    if args.merge:
        rows = LS.merge_landscape_csvs(args.merge)
        LS.plot_landscape(rows, args.out_plot)
        print(f"merged {args.merge} -> {len(rows)} points -> {args.out_plot}")
        return

    model, variables, key = build_model_and_params(cfg, args.weights,
                                                   cfg.data.train_ps)
    params = variables["params"]

    is_ffa = cfg.model.arch == "ffa"

    use_cr = cfg.loss.w_contrast > 0 and not is_ffa
    vgg = None
    vgg_params = None
    if use_cr:
        vgg = vgg_mod.make_cr_vgg(dtype=cfg.model.dtype)
    elif is_ffa and args.perloss:
        vgg = vgg_mod.make_perceptual_vgg(dtype=cfg.model.dtype)
    if vgg is not None:
        if cfg.loss.vgg_weights:
            vgg_params = vgg_mod.load_params_npz(vgg, cfg.loss.vgg_weights)
        else:
            vgg_mod.warn_random_vgg("landscape loss")
            vgg_params = vgg_mod.init_vgg_params(vgg)

    def batch_loss_impl(p, clean, hazy, k):
        # uint8 batches normalize on device (≤1 ulp vs float32 shipping;
        # 4× fewer relay bytes — a full-fidelity 441-pt sweep re-iterates
        # the train set ~56×, which in float32 is ~110 GB of h→d transfer
        # and, on this leaky transport, ~110 GB of host RSS)
        from dehaze_tpu.train.trainer import u8_norm

        clean, hazy = u8_norm(clean), u8_norm(hazy)
        if args.use_mixup:
            clean, hazy = mixup(k, clean, hazy, cfg.data.mixup_beta)
        if is_ffa and not args.no_normalize:
            # the reference's FFA loader normalizes the hazy input
            # (FFA_model/data_utils.py:79); normalize-then-mixup and
            # mixup-then-normalize commute (both affine/convex)
            from dehaze_tpu.train.ffa_trainer import normalize_hazy

            hazy = normalize_hazy(hazy)
        restored = model.apply({"params": p}, hazy, train=False,
                               rngs={"sample": k})
        restored = jnp.clip(restored, 0.0, 1.0)
        if is_ffa:
            # FFA landscape loss: L1, plus 0.04×VGG16-perceptual under
            # --perloss — matching `FFA_.../ops/My_tests.py:86-89`.
            loss = jnp.mean(jnp.abs(restored - clean))
            if args.perloss:
                feats = lambda im: vgg.apply(vgg_params, im)
                loss = loss + 0.04 * L.perceptual_loss_from_features(
                    feats(restored), feats(clean))
            return loss
        loss = cfg.loss.w_charbonnier * L.charbonnier_loss(
            restored, clean, cfg.loss.charbonnier_eps)
        if use_cr:
            feats = lambda im: vgg.apply(vgg_params, im)
            l_cr, _, _ = L.contrast_loss_from_features(
                feats(restored), feats(clean), feats(hazy),
                weights=cfg.loss.contrast_weights,
                ablation=cfg.loss.contrast_ablation)
            loss = loss + cfg.loss.w_contrast * l_cr
        return loss

    shard_stack = None
    if args.data_axis and args.data_axis > 1:
        # Landscape points are independent models: shard the stacked
        # parameter axis over the mesh and each chip sweeps its own
        # points — no collectives, linear scaling (the TPU-mesh form of
        # the reference's run-N-processes-and-merge-CSVs flow).
        # shard_map (not GSPMD) because the partitioner cannot split
        # vmapped grouped convs (FFA's PA/CA layers) on the vmap axis;
        # with an explicit per-device map every op stays point-local.
        if args.points_per_batch <= 1:
            raise SystemExit("--data_axis needs --points_per_batch > 1")
        if args.points_per_batch % args.data_axis:
            raise SystemExit(
                f"--points_per_batch {args.points_per_batch} not divisible "
                f"by --data_axis {args.data_axis}")
        from jax import shard_map
        from jax.sharding import PartitionSpec as PS
        from dehaze_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                              replicated)

        mesh = make_mesh(args.data_axis)
        point_sh = batch_sharding(mesh)   # P('data') on the stacked axis
        repl_sh = replicated(mesh)
        batch_loss = jax.jit(shard_map(
            jax.vmap(batch_loss_impl, in_axes=(0, None, None, None)),
            mesh=mesh,
            in_specs=(PS("data"), PS(), PS(), PS()),
            out_specs=PS("data"), check_vma=False))

        def shard_stack(p_stack, arrs):
            return (jax.device_put(p_stack, point_sh),
                    [jax.device_put(a, repl_sh) for a in arrs])
    elif args.points_per_batch > 1:
        # P grid points per dispatch: vmap over the perturbed-parameter
        # axis (data and MixUp key broadcast, so every point sees the
        # identical eval stream — same semantics as the serial path).
        batch_loss = jax.jit(
            jax.vmap(batch_loss_impl, in_axes=(0, None, None, None)))
    else:
        batch_loss = jax.jit(batch_loss_impl)

    folder = PairedFolder(cfg.data.train_dir)

    def loss_on_dataset(p):
        k = jax.random.PRNGKey(1)
        losses = []
        it = train_batches(folder, batch_size=cfg.data.batch_size,
                           patch_size=cfg.data.train_ps, seed=cfg.train.seed,
                           epoch=0, num_workers=cfg.data.num_workers,
                           u8=cfg.data.u8_transfer)
        for i, (clean, hazy) in enumerate(it):
            if args.max_batches and i >= args.max_batches:
                break
            k, sub = jax.random.split(k)
            clean, hazy = jnp.asarray(clean), jnp.asarray(hazy)
            if shard_stack is not None:
                p, (clean, hazy, sub) = shard_stack(p, [clean, hazy, sub])
            losses.append(batch_loss(p, clean, hazy, sub))
        if not losses:
            raise SystemExit(
                f"no eval batches from --train_dir {cfg.data.train_dir!r} "
                f"(empty dataset, or batch_size {cfg.data.batch_size} > "
                f"image count)")
        # scalar path -> float; stacked path -> [P] vector
        return np.mean(np.stack([np.asarray(l) for l in losses]), axis=0)

    point_filter = None
    if args.shard:
        i, nshards = (int(s) for s in args.shard.split("/"))
        point_filter = lambda idx: idx % nshards == i

    rows = LS.get_loss_landscape(
        params, loss_on_dataset,
        kws=["pos_embed", "relative_position"],  # My_losslandscape.py:198
        n=args.n, scale=args.scale, seed=cfg.train.seed,
        csv_path=args.out_csv, verbose=True, point_filter=point_filter,
        points_per_batch=args.points_per_batch,
    )
    all_rows = LS.load_landscape_csv(args.out_csv) if args.out_csv else rows
    LS.plot_landscape(all_rows, args.out_plot)
    print(f"{len(all_rows)} points -> {args.out_csv}, {args.out_plot}")


if __name__ == "__main__":
    main()
