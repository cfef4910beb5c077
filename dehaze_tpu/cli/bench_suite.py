"""Extended benchmark suite (beyond the driver-facing bench.py single line).

Measures, on the current backend:
- whole-image forward (the published 1664² protocol) — jnp and pallas paths
- patch forward (batch 32 × 128², the training shape)
- full training step (fwd+bwd+optimizer, Charbonnier loss)

    python -m dehaze_tpu.cli.bench_suite [--modes fwd_whole,fwd_patch,train]
        [--pallas] [--profile /tmp/trace]

`--profile` wraps the timed region in jax.profiler.trace (the reference's
analog was torchstat + wall-clock prints; SURVEY §5 tracing).
"""

import argparse
import contextlib
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from dehaze_tpu.config import Config, LossConfig, ModelConfig, replace
from dehaze_tpu.infer.tiled import make_native_image_fn, make_whole_image_fn
from dehaze_tpu.models.uformer import Uformer
from dehaze_tpu.utils.transfer import wait


def timeit(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        wait(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    wait(out)  # block_until_ready is a NO-OP on the axon relay (jax 0.9)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modes", default="fwd_whole,fwd_patch,train")
    p.add_argument("--arch", default="uformer", choices=["uformer", "ffa"])
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--fast_gelu", action="store_true")
    p.add_argument("--embed_dim", type=int, default=32)
    p.add_argument("--profile", default=None)
    p.add_argument("--whole_hw", default="1200x1600")
    p.add_argument("--whole_batch", type=int, default=1,
                   help="frames per dispatch in fwd_whole (amortizes the "
                        "fixed per-dispatch overhead — ~12%% of the FFA "
                        "frame time, DESIGN.md)")
    p.add_argument("--train_batches", default="32",
                   help="comma list of per-step batch sizes for the train "
                        "mode (batch-scaling curve, e.g. 32,64,128)")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient-accumulation microbatches per step in the "
                        "train mode")
    p.add_argument("--ffa_blocks", type=int, default=19)
    p.add_argument("--ffa_crop", type=int, default=240,
                   help="FFA train-mode crop size (reference recipe 240)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize LeWin blocks in the train mode "
                        "(per-chip b64/b128 fit in HBM)")
    args = p.parse_args()
    modes = args.modes.split(",")

    cfg = ModelConfig(arch=args.arch, img_size=128, embed_dim=args.embed_dim,
                      ffa_blocks=args.ffa_blocks, dtype=jnp.bfloat16,
                      use_pallas=args.pallas, fast_gelu=args.fast_gelu,
                      remat=args.remat)
    from dehaze_tpu.models import get_arch

    model = get_arch(cfg)
    key = jax.random.PRNGKey(0)
    probe = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init({"params": key, "sample": key}, probe)
    )()

    def apply_fn(x):
        return model.apply(variables, x, train=False, rngs={"sample": key})

    prof = (jax.profiler.trace(args.profile) if args.profile
            else contextlib.nullcontext())
    results = []
    with prof:
        if "fwd_whole" in modes:
            h, w = (int(s) for s in args.whole_hw.split("x"))
            if args.arch == "ffa":
                # FFA protocol is a raw-resolution forward, no canvas
                # (FFA_model/test.py:49-60)
                run = make_native_image_fn(apply_fn)
                canvas = "native"
            else:
                run = make_whole_image_fn(apply_fn, h, w, 128)
                canvas = "square"
            img = jnp.asarray(np.random.default_rng(0).uniform(
                size=(args.whole_batch, h, w, 3)).astype(np.float32))
            dt = timeit(run, img)
            results.append({"mode": "fwd_whole", "sec": round(dt, 4),
                            "mpix_s": round(args.whole_batch * h * w / 1e6
                                            / dt, 3),
                            "batch": args.whole_batch,
                            "canvas": canvas, "pallas": args.pallas})
        if "fwd_patch" in modes:
            xb = jnp.asarray(np.random.default_rng(0).uniform(
                size=(32, 128, 128, 3)).astype(np.float32))
            fn = jax.jit(apply_fn)
            dt = timeit(fn, xb)
            results.append({"mode": "fwd_patch_b32", "sec": round(dt, 4),
                            "img_s": round(32 / dt, 2), "pallas": args.pallas})
        if "train" in modes and args.arch == "ffa":
            # FFA recipe step (main.py: L1, Adam 1e-4, bs 2 x 240²)
            from dehaze_tpu.train.ffa_trainer import FFATrainer

            ftrainer = FFATrainer(blocks=args.ffa_blocks,
                                  total_steps=100_000)
            for b in (int(s) for s in args.train_batches.split(",")):
                clean = np.random.default_rng(0).uniform(
                    size=(b, args.ffa_crop, args.ffa_crop, 3)
                ).astype(np.float32)
                hazy = np.clip(clean + 0.1, 0, 1).astype(np.float32)
                fstate = ftrainer.init_state(jax.random.PRNGKey(1), clean[:1])
                for _ in range(2):
                    fstate, _ = ftrainer.train_step(fstate, clean, hazy)
                wait(fstate.params)
                t0 = time.perf_counter()
                iters = 5
                for _ in range(iters):
                    fstate, _ = ftrainer.train_step(fstate, clean, hazy)
                wait(fstate.params)
                dt = (time.perf_counter() - t0) / iters
                results.append({"mode": f"ffa_train_step_b{b}",
                                "sec": round(dt, 4),
                                "img_s": round(b / dt, 2),
                                "crop": args.ffa_crop})
        elif "train" in modes:
            from dehaze_tpu.train.trainer import Trainer

            tcfg = replace(Config(), model=cfg, loss=LossConfig(w_contrast=0.0))
            trainer = Trainer(tcfg, steps_per_epoch=100)
            rng = jax.random.PRNGKey(2)
            for b in (int(s) for s in args.train_batches.split(",")):
                clean = np.random.default_rng(0).uniform(
                    size=(b, 128, 128, 3)).astype(np.float32)
                hazy = np.clip(clean + 0.1, 0, 1).astype(np.float32)
                state = trainer.init_state(jax.random.PRNGKey(1), clean[:1])

                def step(s):
                    s, _ = trainer.train_step(s, clean, hazy, rng,
                                              use_mixup=True,
                                              accum_steps=args.accum_steps)
                    return s

                for _ in range(2):
                    state = step(state)
                wait(state.params)
                t0 = time.perf_counter()
                iters = 5
                for _ in range(iters):
                    state = step(state)
                wait(state.params)
                dt = (time.perf_counter() - t0) / iters
                results.append({"mode": f"train_step_b{b}",
                                "sec": round(dt, 4),
                                "img_s": round(b / dt, 2),
                                "accum_steps": args.accum_steps,
                                "pallas": args.pallas})

    for r in results:
        r["device"] = str(jax.devices()[0])
        print(json.dumps(r))

    if args.profile:
        # op-level attribution of the captured trace (utils.xprof) — the
        # workflow that found the round-2 layout wins (DESIGN.md)
        try:
            from dehaze_tpu.utils.xprof import summarize

            lines, _ = summarize(args.profile, steps=1)
            print("\n".join(lines))
        except Exception as e:  # tf not present, corrupt .xplane.pb, ...
            # Benchmarks already printed; degrade rather than crash.
            print(f"[profile summary unavailable: {e}]")


if __name__ == "__main__":
    main()
