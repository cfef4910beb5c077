"""Training-curve plots from structured run logs.

The reference eyeballs training progress from stdout and hand-builds its
figures in notebooks (`My_train.py:214-224` prints, README.md curves); here
every trainer writes `{stamp}.jsonl` event logs (`utils/logging.py`), and
this CLI turns one run directory — including a RESUMED run spread across
many trainer processes, e.g. the bounded-RSS supervisor's segments — into
the convergence artifacts: PSNR/SSIM vs epoch, train loss vs epoch, and the
ops panels (img/s, host RSS) that the endurance/campaign analyses in
DESIGN.md rely on.

    python -m dehaze_tpu.cli.curves --log_dir LOG/uformer_campaign \
        --out curves.png [--csv curves.csv]

Merging rule: events from later segments win on (kind, epoch, iter) key —
a resume that re-runs a partial epoch supersedes the crashed segment's
events, matching what the checkpoint timeline actually kept.
"""

import argparse
import glob
import json
import os


def load_events(log_dir: str):
    """Merge all *.jsonl segments; later segments win on duplicate keys."""
    paths = sorted(glob.glob(os.path.join(log_dir, "*.jsonl")))
    if not paths:
        raise SystemExit(f"no .jsonl run logs under {log_dir}")
    merged = {}
    for path in paths:  # sorted stamps = chronological segments
        with open(path) as f:
            for ln in f:
                try:
                    d = json.loads(ln)
                except json.JSONDecodeError:
                    continue  # torn tail line from a killed writer
                key = (d.get("kind"), d.get("epoch"), d.get("iter"))
                merged[key] = d
    events = sorted(merged.values(),
                    key=lambda d: (d.get("epoch", 0), d.get("iter", 0)))
    return events, len(paths)


def series(events):
    epochs = [d for d in events if d["kind"] == "epoch"]
    evals = [d for d in events if d["kind"] == "eval"]
    best_eval = {}
    for d in evals:  # best PSNR eval within each epoch
        e = d["epoch"]
        if e not in best_eval or d["psnr"] > best_eval[e]["psnr"]:
            best_eval[e] = d
    return epochs, [best_eval[e] for e in sorted(best_eval)]


def main():
    p = argparse.ArgumentParser(description="training curves from run logs")
    p.add_argument("--log_dir", required=True,
                   help="trainer log dir holding {stamp}.jsonl segments")
    p.add_argument("--out", default="curves.png")
    p.add_argument("--csv", default=None,
                   help="also write the merged per-epoch table")
    args = p.parse_args()

    events, n_segments = load_events(args.log_dir)
    epochs, evals = series(events)
    if not epochs and not evals:
        raise SystemExit("run logs contain no epoch/eval events")

    if args.csv:
        import csv

        ev_by_epoch = {d["epoch"]: d for d in evals}
        with open(args.csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["epoch", "loss", "img_per_s", "rss_gb", "psnr", "ssim"])
            for d in epochs:
                ev = ev_by_epoch.get(d["epoch"], {})
                w.writerow([d["epoch"], d["loss"], d.get("img_per_s", ""),
                            d.get("rss_gb", ""), ev.get("psnr", ""),
                            ev.get("ssim", "")])

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(11, 7), constrained_layout=True)
    ee = [d["epoch"] for d in evals]
    axes[0, 0].plot(ee, [d["psnr"] for d in evals], "-o", ms=2.5)
    axes[0, 0].set(title="val PSNR (best eval per epoch)", xlabel="epoch",
                   ylabel="dB")
    ax2 = axes[0, 0].twinx()
    ax2.plot(ee, [d["ssim"] for d in evals], color="tab:orange", alpha=0.5)
    ax2.set_ylabel("SSIM", color="tab:orange")
    te = [d["epoch"] for d in epochs]
    axes[0, 1].semilogy(te, [d["loss"] for d in epochs])
    axes[0, 1].set(title="train loss", xlabel="epoch")
    axes[1, 0].plot(te, [d.get("img_per_s") for d in epochs])
    axes[1, 0].set(title="throughput", xlabel="epoch", ylabel="img/s")
    axes[1, 1].plot(te, [d.get("rss_gb") for d in epochs])
    axes[1, 1].set(title="host RSS (per segment)", xlabel="epoch",
                   ylabel="GB")
    fig.suptitle(f"{os.path.basename(os.path.normpath(args.log_dir))} — "
                 f"{len(te)} epochs across {n_segments} segments")
    fig.savefig(args.out, dpi=110)
    best = max(evals, key=lambda d: d["psnr"]) if evals else None
    print(f"{len(te)} epochs, {len(ee)} eval points, {n_segments} segments"
          + (f"; best PSNR {best['psnr']:.4f} dB @ epoch {best['epoch']}"
             if best else ""))
    print(f"wrote {args.out}" + (f" and {args.csv}" if args.csv else ""))


if __name__ == "__main__":
    main()
