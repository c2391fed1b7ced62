"""Split the combined live_sweep.csv into per-space cr_<Space>_<sub>.csv
files (the reference filename convention compare.py/analyze.py key on),
skipping spaces with incomplete grids unless --partial."""
import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

import pandas as pd

SUBSAMPLING = {"ICaCb": "411", "ICtCp": "411"}  # rest 4:2:0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv", help="combined sweep csv")
    ap.add_argument("-o", "--outdir", default="results/sweep")
    ap.add_argument("--expect-rows", type=int, default=9135,
                    help="rows of a complete per-space grid "
                         "(315 combos x 29 LIVE images)")
    ap.add_argument("--partial", action="store_true",
                    help="also write spaces with incomplete grids")
    args = ap.parse_args()
    df = pd.read_csv(args.csv)
    os.makedirs(args.outdir, exist_ok=True)
    for space, g in df.groupby("color_space"):
        sub = SUBSAMPLING.get(space, "420")
        complete = len(g) >= args.expect_rows
        if not complete and not args.partial:
            print(f"skip {space}: {len(g)} rows (incomplete)")
            continue
        path = os.path.join(args.outdir, f"cr_{space}_{sub}.csv")
        g.to_csv(path, index=False)
        print(f"{path}: {len(g)} rows{'' if complete else ' (PARTIAL)'}")


if __name__ == "__main__":
    main()
