"""Params-only checkpoint archive (trajectory feedstock under bounded disk).

The reference keeps EVERY epoch's full checkpoint on disk and its
trajectory notebook consumes the whole series (`My_train.py:330-333`,
`My_Trajectories in polar coordinates.py`). Here `--keep_ckpts` bounds the
full {params, opt_state} files to a sliding window (247 MB each at the
flagship shape); this tool shadows each epoch file into a params-only copy
(~1/3 the bytes — Adam carries two moment trees) BEFORE the trainer prunes
it, so `cli.trajectory` still sees the complete epoch series.

    python -m dehaze_tpu.cli.archive_params --models_dir LOG/models \
        --out_dir LOG/traj [--watch 60]

One-shot by default; `--watch N` polls every N seconds until interrupted
(run it beside a long campaign). Pure msgpack repack: no device, no model
code, safe next to a live trainer (epoch files appear via atomic rename).
"""

import argparse
import glob
import os
import re
import time

from flax import serialization


def archive_once(models_dir: str, out_dir: str) -> int:
    """Shadow new epoch_model_*.msgpack files as params-only; return count."""
    os.makedirs(out_dir, exist_ok=True)
    new = 0
    for path in sorted(glob.glob(os.path.join(models_dir, "epoch_model_*.msgpack"))):
        name = os.path.basename(path)
        if not re.fullmatch(r"epoch_model_\d+\.msgpack", name):
            continue
        dst = os.path.join(out_dir, name)
        if os.path.exists(dst):
            continue
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        slim = {
            "epoch": payload["epoch"],
            "params": payload["params"],
            "opt_state": b"",
            "extra": payload.get("extra", "{}"),
        }
        tmp = dst + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.msgpack_serialize(slim))
        os.replace(tmp, dst)
        new += 1
    return new


def main():
    p = argparse.ArgumentParser(description="params-only checkpoint archive")
    p.add_argument("--models_dir", required=True,
                   help="trainer output dir holding epoch_model_{e}.msgpack")
    p.add_argument("--out_dir", required=True,
                   help="archive dir (params-only copies, same filenames)")
    p.add_argument("--watch", type=int, default=0,
                   help="poll every N seconds (0 = one-shot)")
    args = p.parse_args()

    while True:
        n = archive_once(args.models_dir, args.out_dir)
        total = len(glob.glob(os.path.join(args.out_dir, "epoch_model_*.msgpack")))
        print(f"archived {n} new ({total} total)", flush=True)
        if not args.watch:
            break
        time.sleep(args.watch)


if __name__ == "__main__":
    main()
