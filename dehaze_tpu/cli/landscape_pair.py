"""ViT-vs-FFA loss-landscape comparison figure (≙ README.md:165-209).

The reference's headline landscape artifact is not either surface alone
but the COMPARISON: the improved ViT model's basin is flatter than
FFA-Net's around each model's optimum (after Park & Kim, "How Do Vision
Transformers Work?", arXiv:2202.06709). The reference assembles it by
hand from two `losslandscape.ipynb` runs; here it is one command over
the two sweep CSVs that `cli.landscape` writes:

    python -m dehaze_tpu.cli.landscape_pair vit.csv ffa.csv \
        --labels ViT FFA --out compare.jpg

Prints one JSON line of per-model flatness stats (see
`ops.landscape.landscape_stats`) so the figure's claim is also a number.
"""

import argparse
import json

from dehaze_tpu.ops import landscape as LS


def main():
    p = argparse.ArgumentParser(description="landscape comparison figure")
    p.add_argument("csv_a", help="first sweep CSV (e.g. the ViT model's)")
    p.add_argument("csv_b", help="second sweep CSV (e.g. FFA-Net's)")
    p.add_argument("--labels", nargs=2, default=("ViT", "FFA"))
    p.add_argument("--out", default="landscape_compare.jpg")
    p.add_argument("--title", default="loss landscape comparison")
    args = p.parse_args()

    rows_a = LS.load_landscape_csv(args.csv_a)
    rows_b = LS.load_landscape_csv(args.csv_b)
    LS.plot_landscape_pair(rows_a, rows_b, args.out, labels=args.labels,
                           title=args.title)
    stats = {
        args.labels[0]: LS.landscape_stats(rows_a),
        args.labels[1]: LS.landscape_stats(rows_b),
    }
    a, b = (stats[l]["mean_rel_rise"] for l in args.labels)
    stats["flatter"] = args.labels[0] if a < b else args.labels[1]
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
